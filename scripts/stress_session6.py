"""Scale stress for the session-6 operators: SemDeDup on a 200k x 64
synthetic embedding corpus (hash-seeded, deterministic), CDC chunking
+ HLL + phrase-index search over a 320k-page-scale document corpus.

Checks the 100-TB posture, not just wall time: SemDeDup's driver
traffic stays n_seeds rows, cluster partitions hold c^2 pairwise work
under the max_cluster_rows guard; CDC is stateless; HLL state is m
registers per key.

Usage: python scripts/stress_session6.py [n_vecs] [n_docs] [num_cpus]
"""

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 320_000
    num_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import numpy as np
    import pyarrow as pa
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    # --- synthetic embeddings: 32 latent clusters + hash-seeded noise,
    # deterministic per vec_id (no RNG state shipped anywhere)
    def make_vecs(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("vec_id"))
        out = []
        for v in ids:
            v = int(v)
            src_id = v - 1 if (v % 10 == 0 and v > 0) else v
            rng = np.random.default_rng(src_id)
            base = np.zeros(64)
            base[src_id % 32] = 10.0
            vec = base + rng.normal(0, 1, 64)
            if src_id != v:     # every 10th row: a near-dup of v-1
                vec += np.random.default_rng(v).normal(0, 0.01, 64)
            out.append(vec.astype(np.float32))
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "embedding": pa.array(
                             [x.tolist() for x in out],
                             pa.list_(pa.float32()))})

    from tabbyray.ops.dedup import semdedup
    vecs = (rd.range(n_vecs)
            .map_batches(lambda t: pa.table(
                {"vec_id": t.column("id")}), batch_format="pyarrow")
            .map_batches(make_vecs, batch_format="pyarrow",
                         batch_size=4096))
    t0 = time.monotonic()
    kept = semdedup(vecs, n_seeds=64, tau=0.9,
                    max_cluster_rows=50_000)
    nk = kept.count()
    dt = time.monotonic() - t0
    print(f"semdedup: {n_vecs} x 64 vecs, 64 seeds -> {nk} kept "
          f"in {dt:.1f}s ({n_vecs / dt:,.0f} vec/s)")

    # --- document corpus at 320k-page scale (deterministic text)
    words = ("the fast key order sort table scan merge part window small "
             "hash join agg batch stream spark value row data slow filter "
             "customer line column group query vector big a").split()

    def make_docs(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("id"))
        texts = []
        for d in ids:
            h = int(hashlib.md5(str(int(d)).encode()).hexdigest()[:8], 16)
            n = 80 + h % 80
            texts.append(" ".join(
                words[(h + 7 * i) % len(words)] for i in range(n)))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string()),
                         "lang": pa.array(
                             [f"l{int(d) % 5}" for d in ids], pa.string())})

    docs = rd.range(n_docs).map_batches(make_docs, batch_format="pyarrow",
                                        batch_size=4096)
    docs = docs.materialize()   # generate once, reuse across the 3 ops

    from tabbyray.ops.dedup import cdc_dup_chunks
    t0 = time.monotonic()
    nd = cdc_dup_chunks(docs).count()
    dt = time.monotonic() - t0
    print(f"cdc_dup_chunks: {n_docs} docs -> {nd} dup chunks "
          f"in {dt:.1f}s ({n_docs / dt:,.0f} docs/s)")

    from tabbyray.ops.sketch import hll_distinct
    t0 = time.monotonic()
    est = hll_distinct(docs.select_columns(["lang", "doc_id"]),
                       "lang", "doc_id", p=10).to_pandas()
    dt = time.monotonic() - t0
    err = (est["est_distinct"] / (n_docs / 5) - 1).abs().max()
    print(f"hll p=10: 5 keys x {n_docs // 5} distinct in {dt:.1f}s, "
          f"max rel err {err:.3f}")
    assert err < 0.12, "HLL p=10 should be within ~3.3%*3 sigma"

    from tabbyray.ops.text import phrase_match_postings, positional_postings
    t0 = time.monotonic()
    post = positional_postings(docs, terms={"sort", "hash"})
    # the generator steps 7 words per position over a 30-word list, so
    # "sort" (idx 4) is always followed by "hash" (idx 11)
    nm = phrase_match_postings(post, ["sort", "hash"]).count()
    dt = time.monotonic() - t0
    print(f"phrase via index: {nm} matching docs in {dt:.1f}s "
          f"({n_docs / dt:,.0f} docs/s)")
    ray.shutdown()


if __name__ == "__main__":
    main()

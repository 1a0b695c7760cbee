"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale notes (100 TB design):

* exact dedup groups on a 16-byte md5 fingerprint, never on the full
  text — the shuffle moves hashes, not documents;
* MinHash-LSH is the standard shingle -> signature -> band -> bucket
  groupby plan; signatures are computed per batch (vectorized numpy),
  buckets shuffle only (band_id, band_hash, doc_id) triples;
* candidate verification DEFAULTS to the shuffle-join path: candidate
  pairs stay a Dataset end-to-end, the candidate doc set is reduced
  and semi-joined distributedly, and exact Jaccard comes out of two
  co-partitioned joins plus partitioned aggregates — nothing
  corpus-sized ever lands on the driver. ``verify="broadcast"`` keeps
  the small-corpus shortcut (explicitly opt-in);
* hot shingles/bands (stopword runs) are the skew risk: cap posting
  lists at ``max_posting`` (dropped buckets are reported, not silent).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .relational import _resolve_partitions

_WS = re.compile(r"\s+")


def _norm_text(x: str) -> str:
    return _WS.sub(" ", (x or "")).strip()


def _shingles(text: str, n: int = 3) -> set[str]:
    toks = _norm_text(text).split(" ")
    if len(toks) < n:
        # short docs collapse to ONE whole-text shingle — including the
        # empty doc, whose shingle is "" (mirrors the SQL oracle's CASE
        # branch: two empty docs are jaccard-1.0 duplicates)
        return {" ".join(toks)}
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
                           num_partitions: "int | None" = None) -> rd.Dataset:
    """Keep only the first (min doc_id) row per distinct text.

    ONE hash shuffle on the md5 fingerprint: a batch-local keep-first
    combiner prunes in-batch dups, the fp-hash partitioning co-locates
    every surviving copy of a text, and an in-partition keep-first
    finishes. No corpus-sized state anywhere — this is the web-scale
    exact-dedup plan (the winners set of a 10^12-doc corpus cannot be
    broadcast)."""
    num_partitions = _resolve_partitions(num_partitions)
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

_EMPTY_PAIRS = {"doc_a": pa.int64(), "doc_b": pa.int64(),
                "jaccard": pa.float64()}


def _pair_schema(keep_cols: list[str]) -> pa.Schema:
    types = {"jaccard": pa.float64(), "cosine": pa.float64(),
             "containment": pa.float64()}
    return pa.schema([(c, types.get(c, pa.int64())) for c in keep_cols])


def _dedup_pairs(pairs: rd.Dataset, keep_cols: list[str],
                 key_cols: tuple[str, str] = ("doc_a", "doc_b"),
                 num_partitions: "int | None" = None) -> rd.Dataset:
    """Global pair dedup as ONE hash-partitioned shuffle — replaces
    driver-side ``to_pandas().drop_duplicates()``. Cross-band
    duplicates of a pair land in the same partition by construction."""
    num_partitions = _resolve_partitions(num_partitions)
    from .relational import typed_groupby_map

    ka, kb = key_cols

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_part"] = ((df[ka] * 1_000_003 + df[kb])
                       % num_partitions).astype("int64")
        return df

    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=[ka, kb])[keep_cols]

    return typed_groupby_map(
        pairs.map_batches(add_part, batch_format="pandas"), "_part", dd,
        _pair_schema(keep_cols))


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(docs: rd.Dataset, num_perm: int = 64, shingle_n: int = 3,
                       seed: int = 42) -> rd.Dataset:
    """doc_id, sig (fixed-size uint64 list): vectorized per-batch
    (a*x + b) mod p permutation hashing over md5 shingle hashes.

    The shingle hash is the low 8 md5 digest bytes little-endian —
    exactly DuckDB's ``md5_number_lower`` — and the permutation
    arithmetic wraps mod 2**64 (numpy uint64 semantics), so the whole
    signature is reproducible in SQL (see the minhash_signatures
    oracle in ``__ray_entry__.py``)."""
    a, b = _minhash_params(num_perm, seed)

    def f(t: pa.Table) -> pa.Table:
        # batch-level distinct-shingle digest cache: md5 runs once per
        # DISTINCT shingle in the batch (shingles repeat heavily across
        # near-duplicate docs — the very corpora this operator targets),
        # and the permutation matrix is computed ONCE for the distinct
        # set instead of per doc
        texts = t.column("text").to_pylist()
        uniq: dict[str, int] = {}
        doc_idx = []
        for text in texts:
            doc_idx.append(np.fromiter(
                (uniq.setdefault(s, len(uniq))
                 for s in _shingles(text, shingle_n)),
                dtype=np.int64))
        if uniq:
            x = np.fromiter(
                (int.from_bytes(hashlib.md5(s.encode()).digest()[8:],
                                "little") for s in uniq),
                dtype=np.uint64, count=len(uniq))
            # permuted hashes for the DISTINCT set only, stored row-major
            # (n_distinct, num_perm) so each doc's min is a contiguous
            # row-gather; per-doc temporaries stay cache-sized
            H = ((np.outer(a, x) + b[:, None]) % _MERSENNE).T.copy()
            sig_m = np.stack([H[ix].min(axis=0) for ix in doc_idx]) \
                if doc_idx else np.empty((0, num_perm), np.uint64)
        else:
            sig_m = np.empty((0, num_perm), np.uint64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sig_m.reshape(-1), pa.uint64()), num_perm)})

    return docs.map_batches(f, batch_format="pyarrow")


BROADCAST_VERIFY_MAX_DOCS = 100_000


def minhash_lsh_pairs(docs: rd.Dataset, num_perm: int = 64, bands: int = 16,
                      shingle_n: int = 3, threshold: float = 0.5,
                      seed: int = 42, max_posting: int = 200,
                      verify: str = "auto") -> rd.Dataset:
    """Candidate pairs via banded LSH, verified with EXACT Jaccard.

    signature -> (band_id, band_hash, doc_id) rows -> groupby band
    bucket -> pairs -> exact-verify >= threshold. Returns
    (doc_a, doc_b, jaccard), doc_a < doc_b.

    ``verify``: "shuffle" (the web-scale path) verifies via
    co-partitioned exchanges with candidates kept as a Dataset
    end-to-end (``_verify_pairs_shuffle``); "broadcast" holds every
    doc's shingle set in one driver-built map — right only while the
    corpus fits a worker, but free of the ~3 fixed sort barriers the
    shuffle path pays (those dominate wall time at small scale and
    vanish at large). "auto" (default) picks broadcast up to
    ``BROADCAST_VERIFY_MAX_DOCS`` rows, shuffle above. Both paths are
    output-identical (tested).
    """
    if verify == "auto":
        verify = ("broadcast" if docs.count() <= BROADCAST_VERIFY_MAX_DOCS
                  else "shuffle")
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(docs, num_perm, shingle_n, seed)

    def to_bands(t: pa.Table) -> pa.Table:
        # fully vectorized banding: the fixed-size-list sig column is a
        # zero-copy (n_docs, num_perm) uint64 view; reshape to
        # (n_docs, bands, rows_per_band) and fold each band with a
        # polynomial rolling hash (uint64 wrap). Bucketing is
        # equality-based, so the hash only needs to separate unequal
        # chunks — collisions are caught by the exact-Jaccard verify.
        n = t.num_rows
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "band_id": pa.array([], pa.int32()),
                             "band_hash": pa.array([], pa.int64())})
        sig_col = t.column("sig").combine_chunks()
        S = np.asarray(sig_col.flatten()).reshape(n, bands, rows_per_band)
        h = np.full((n, bands), 1469598103934665603, np.uint64)  # FNV offset
        prime = np.uint64(1099511628211)
        for j in range(rows_per_band):
            h = h * prime + S[:, :, j]
        band_hash = (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        doc_ids = np.asarray(t.column("doc_id").combine_chunks(),
                             dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(np.repeat(doc_ids, bands), pa.int64()),
            "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n),
                                pa.int32()),
            "band_hash": pa.array(band_hash.reshape(-1), pa.int64())})

    band_rows = sigs.map_batches(to_bands, batch_format="pyarrow")

    def add_part(df: pd.DataFrame, P: int = 64) -> pd.DataFrame:
        df = df.copy()
        df["part"] = ((df["band_hash"] * 31 + df["band_id"]) % P).astype("int64")
        return df

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized within the hash partition: self-merge on the bucket
        # key; posting lists above max_posting are dropped (skew guard)
        sizes = g.groupby(["band_id", "band_hash"])["doc_id"].transform("size")
        n_dropped = int((sizes > max_posting).sum())
        if n_dropped:
            # no silent caps: record what the skew guard dropped
            print(f"[minhash_lsh_pairs] skew cap: dropped {n_dropped} "
                  f"postings in buckets > {max_posting} "
                  "(pairs can still surface via other bands)")
        g = g[sizes <= max_posting]
        m = g.merge(g, on=["band_id", "band_hash"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = m[["doc_id_x", "doc_id_y"]].drop_duplicates()
        return out.rename(columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"})

    from .relational import typed_groupby_map
    # per-bucket-partition distinct pairs; duplicates of a pair across
    # BAND partitions remain — the shuffle verify dedups them inside its
    # doc_id co-partition (identical melt rows land together), saving a
    # whole pair-partitioned dedup shuffle
    cand = typed_groupby_map(
        band_rows.map_batches(add_part, batch_format="pandas"), "part",
        bucket_pairs, _pair_schema(["doc_a", "doc_b"]))

    if verify == "shuffle":
        return _verify_pairs_shuffle(docs, cand, shingle_n, threshold)
    return _verify_pairs_broadcast(docs, cand, shingle_n, threshold)


def _verify_pairs_broadcast(docs: rd.Dataset, cand: rd.Dataset,
                            shingle_n: int, threshold: float) -> rd.Dataset:
    """Exact-Jaccard verification against driver-built shingle sets —
    right only while the corpus fits the driver (callers size-gate on
    ``BROADCAST_VERIFY_MAX_DOCS``), but free of the sort barriers the
    shuffle verify pays, which dominate wall time at small scale."""
    cand_df = cand.to_pandas().drop_duplicates(subset=["doc_a", "doc_b"])
    if len(cand_df) == 0:
        return rd.from_arrow(pa.table(
            {k: pa.array([], t) for k, t in _EMPTY_PAIRS.items()}))
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
    # typed construction: an all-filtered result would otherwise build
    # float64 doc id columns (pandas' empty-list default) — and an
    # empty pandas frame loses its schema entirely through Ray's
    # to_pandas, so the empty case goes through the typed Arrow table
    if not out_a:
        return rd.from_arrow(pa.table(
            {k: pa.array([], t) for k, t in _EMPTY_PAIRS.items()}))
    return rd.from_pandas(pd.DataFrame(
        {"doc_a": pd.Series(out_a, dtype="int64"),
         "doc_b": pd.Series(out_b, dtype="int64"),
         "jaccard": pd.Series(out_j, dtype="float64")}))


def _verify_pairs_shuffle(docs: rd.Dataset, cand: rd.Dataset,
                          shingle_n: int, threshold: float,
                          num_partitions: "int | None" = None) -> rd.Dataset:
    """Exact-Jaccard verification, fully distributed (the default).

    TWO shuffles. (1) Melt candidate pairs to (doc_id, doc_a, doc_b)
    membership rows, union them with the (doc_id, text) stream and
    co-partition on ``hash(doc_id)``; inside each partition only docs
    that appear in a membership row get their distinct shingles
    exploded, and a vectorized merge emits (doc_a, doc_b, shingle)
    rows. (2) A pair-partitioned count: rows per (pair, shingle) —
    total = size_a + size_b, rows seen twice = intersection; jaccard =
    inter / (total - inter). Candidates and memberships stay Datasets;
    both exchanges are hash-partitioned; shingles of non-candidate
    docs never leave their partition. (At web scale, pre-filtering the
    docs stream with a broadcast Bloom filter of candidate ids before
    shuffle (1) cuts the text volume shipped; the plan is otherwise
    size-bounded by candidate volume.)"""
    num_partitions = _resolve_partitions(num_partitions)
    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        half = pa.table({"doc_id": t.column("doc_a").cast(pa.int64()),
                         "doc_a": t.column("doc_a"),
                         "doc_b": t.column("doc_b"),
                         "text": pa.nulls(n, pa.string()),
                         "_side": pa.array(np.zeros(n, dtype=np.int8))})
        other = half.set_column(0, "doc_id", t.column("doc_b").cast(pa.int64()))
        return pa.concat_tables([half, other])

    def doc_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"doc_id": t.column("doc_id").cast(pa.int64()),
                         "doc_a": pa.nulls(n, pa.int64()),
                         "doc_b": pa.nulls(n, pa.int64()),
                         "text": t.column("text"),
                         "_side": pa.array(np.ones(n, dtype=np.int8))})

    both = cand.map_batches(melt, batch_format="pyarrow").union(
        docs.select_columns(["doc_id", "text"])
        .map_batches(doc_rows, batch_format="pyarrow"))

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_part"] = (pd.util.hash_pandas_object(df["doc_id"], index=False)
                       % num_partitions).astype("int64")
        return df

    def copart(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                              "doc_b": pd.Series(dtype="int64"),
                              "shingle": pd.Series(dtype="object")})
        pairs = g[g["_side"] == 0]
        if pairs.empty:
            return empty
        pairs = pairs[["doc_id", "doc_a", "doc_b"]].astype(
            {"doc_a": "int64", "doc_b": "int64"}).drop_duplicates()
        need = set(pairs["doc_id"])
        texts = g[(g["_side"] == 1) & g["doc_id"].isin(need)]
        ids, shs = [], []
        for doc_id, text in zip(texts["doc_id"], texts["text"]):
            for s in _shingles(text, shingle_n):
                ids.append(doc_id)
                shs.append(s)
        sh_df = pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                              "shingle": pd.Series(shs, dtype="object")})
        m = pairs.merge(sh_df, on="doc_id")
        return m[["doc_a", "doc_b", "shingle"]]

    from .relational import typed_groupby_map
    pair_shingles = typed_groupby_map(
        both.map_batches(add_part, batch_format="pandas"), "_part", copart,
        pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                   ("shingle", pa.string())]))

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["doc_a", "doc_b", "shingle"], as_index=False).size()
        g = g.rename(columns={"size": "cnt"})
        g["cnt"] = g["cnt"].astype("int64")
        g["_part"] = ((g["doc_a"] * 1_000_003 + g["doc_b"])
                      % num_partitions).astype("int64")
        return g

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["doc_a", "doc_b", "shingle"], as_index=False)["cnt"].sum()
        out = c.assign(is2=(c["cnt"] == 2).astype("int64")).groupby(
            ["doc_a", "doc_b"], as_index=False).agg(
            total=("cnt", "sum"), inter=("is2", "sum"))
        union = (out["total"] - out["inter"]).clip(lower=1)
        out["jaccard"] = out["inter"] / union
        out = out[out["jaccard"] >= threshold]
        return out[["doc_a", "doc_b", "jaccard"]]

    return typed_groupby_map(
        pair_shingles.map_batches(count_partial, batch_format="pandas"),
        "_part", stats, _pair_schema(["doc_a", "doc_b", "jaccard"]))


# -------------------------------------------------------------------------
# SimHash
# -------------------------------------------------------------------------

def simhash_values(docs: rd.Dataset, bits: int = 64) -> rd.Dataset:
    """doc_id, simhash (uint64): token-frequency-weighted SimHash.

    Vectorized kernel: each batch hashes its DISTINCT tokens once
    (md5's first 8 bytes == the ``int(hexdigest[:16], 16)`` value the
    SQL oracle reproduces), expands them to a ±1 bit matrix in one
    ``np.unpackbits`` (byte-reversal maps little-endian bit order onto
    integer bit i), and each doc's accumulator is one token-count ×
    bit-matrix product — no per-token per-bit Python loop. Semantics
    identical to the scalar definition: bit i set iff
    Σ_tokens (±1 for bit i of md5(token)) > 0."""
    if bits > 64:
        raise ValueError("bits must be <= 64")

    def f(t: pa.Table) -> pa.Table:
        token_lists = [_norm_text(text).split(" ")
                       for text in t.column("text").to_pylist()]
        vocab: dict[str, int] = {}
        for toks in token_lists:
            for tk in toks:
                if tk not in vocab:
                    vocab[tk] = len(vocab)
        buf = bytearray(8 * len(vocab))
        for tk, idx in vocab.items():
            # first 8 digest bytes, byte-reversed: unpackbits(little)
            # column i is then bit i of the big-endian 64-bit integer
            buf[idx * 8:(idx + 1) * 8] = hashlib.md5(tk.encode()).digest()[7::-1]
        if vocab:
            bitmat = np.unpackbits(
                np.frombuffer(bytes(buf), np.uint8).reshape(-1, 8),
                axis=1, bitorder="little")[:, :bits]
            pm = bitmat.astype(np.int64) * 2 - 1          # (V, bits) ±1
        else:
            pm = np.zeros((0, bits), dtype=np.int64)
        w = np.uint64(1) << np.arange(bits, dtype=np.uint64)
        out = np.empty(len(token_lists), dtype=np.uint64)
        for j, toks in enumerate(token_lists):
            idx = np.fromiter((vocab[tk] for tk in toks), np.int64,
                              len(toks))
            uidx, cnt = np.unique(idx, return_counts=True)
            acc = cnt @ pm[uidx]                          # (bits,)
            out[j] = w[acc > 0].sum()
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

    from .relational import typed_groupby_map
    pairs = typed_groupby_map(
        sims.map_batches(to_bands, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pandas"), "part", bucket_pairs,
        _pair_schema(["doc_a", "doc_b", "hamming"]))
    # cross-band dedup is one more hash-partitioned shuffle, not a
    # driver-side drop_duplicates
    return _dedup_pairs(pairs, keep_cols=["doc_a", "doc_b", "hamming"])


# -------------------------------------------------------------------------
# n-gram Jaccard (exact, all qualifying pairs)
# -------------------------------------------------------------------------

def ngram_jaccard_pairs(docs: rd.Dataset, n: int = 3,
                        threshold: float = 0.5) -> rd.Dataset:
    """All pairs with DISTINCT-n-gram Jaccard >= threshold.

    TWO shuffles, no driver-side state. Explode distinct shingles with
    each doc's shingle-set SIZE riding along on every row (sizes are
    per-doc constants, so they need no aggregate or join of their own);
    shuffle 1 partitions by ``hash(shingle)`` so each posting list is
    wholly local and a vectorized self-merge emits per-partition pair
    partials (inter, n_a, n_b); shuffle 2 partitions by pair and sums
    intersections (sizes are constants per doc — merged with ``first``).
    Mirrors the DuckDB oracle's shingle self-join exactly.
    """
    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["doc_a", "doc_b"], as_index=False).agg(
            inter=("inter", "sum"), n_a=("n_a", "first"),
            n_b=("n_b", "first"))
        union = (out["n_a"] + out["n_b"] - out["inter"]).clip(lower=1)
        out["jaccard"] = out["inter"] / union
        out = out[out["jaccard"] >= threshold]
        return out[["doc_a", "doc_b", "jaccard"]]

    return _ngram_pair_reduce(docs, n, finalize, "jaccard")


def ngram_containment_pairs(docs: rd.Dataset, n: int = 3,
                            threshold: float = 0.8) -> rd.Dataset:
    """All pairs with DISTINCT-n-gram CONTAINMENT >= threshold:
    ``containment = |A ∩ B| / min(|A|, |B|)`` — the asymmetric
    near-SUBSET signal (a quoted or truncated copy of a long doc has
    low Jaccard but containment ~1).  Same two-shuffle posting-list
    plan as :func:`ngram_jaccard_pairs`; only the finisher differs."""
    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["doc_a", "doc_b"], as_index=False).agg(
            inter=("inter", "sum"), n_a=("n_a", "first"),
            n_b=("n_b", "first"))
        denom = out[["n_a", "n_b"]].min(axis=1).clip(lower=1)
        out["containment"] = out["inter"] / denom
        out = out[out["containment"] >= threshold]
        return out[["doc_a", "doc_b", "containment"]]

    return _ngram_pair_reduce(docs, n, finalize, "containment")


def _ngram_pair_reduce(docs: rd.Dataset, n: int, finalize,
                       value_col: str) -> rd.Dataset:
    """Shared posting-list pair plan for the n-gram pair metrics."""
    def explode(t: pa.Table) -> pa.Table:
        ids, shs, ns = [], [], []
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            sh = _shingles(text, n)
            for s in sh:
                ids.append(doc_id)
                shs.append(s)
                ns.append(len(sh))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "shingle": pa.array(shs, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    shingle_rows = docs.map_batches(explode, batch_format="pyarrow")

    # pair intersection partials: partition by hash(shingle) so each
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
        out = m.groupby(["doc_id_x", "doc_id_y"], as_index=False).agg(
            inter=("shingle", "size"), n_a=("n_x", "first"),
            n_b=("n_y", "first"))
        out["inter"] = out["inter"].astype("int64")
        return out.rename(columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"})

    from .relational import typed_groupby_map
    partials = typed_groupby_map(
        shingle_rows.map_batches(add_part, batch_format="pandas"), "part",
        pair_counts, _pair_schema(["doc_a", "doc_b", "inter", "n_a", "n_b"]))

    def add_pair_part(df: pd.DataFrame, P: int = 32) -> pd.DataFrame:
        df = df.copy()
        df["_part"] = ((df["doc_a"] * 1_000_003 + df["doc_b"]) % P).astype("int64")
        return df

    return typed_groupby_map(
        partials.map_batches(add_pair_part, batch_format="pandas"), "_part",
        finalize, _pair_schema(["doc_a", "doc_b", value_col]))


def novelty_ratio(docs: rd.Dataset, n: int = 3,
                  num_partitions: "int | None" = None) -> rd.Dataset:
    """Per-document corpus-novelty signal for incremental ingestion:
    ``(doc_id, n_shingles, n_novel, novelty)`` where ``novelty`` is the
    share of the doc's DISTINCT n-gram shingles whose globally FIRST
    occurrence (min doc_id — arrival order) is this document.  Late
    recrawls / boilerplate copies score near 0, genuinely new content
    near 1 — the streaming-dedup admission metric computed in batch.

    Plan: distinct-shingle explode (same ``_shingles`` contract as the
    Jaccard family) -> first-seen per shingle via one shingle-hash
    grouped argmin (state: one row per distinct shingle, partitioned)
    -> shingle-hash join back -> per-doc count aggregate.  Two key
    exchanges + one join; nothing corpus-sized on the driver."""
    import pyarrow.compute as pc

    from .relational import grouped_argmax, hash_aggregate, hash_join

    def explode(t: pa.Table) -> pa.Table:
        ids, shs = [], []
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            for s in _shingles(text, n):
                ids.append(doc_id)
                shs.append(s)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "shingle": pa.array(shs, pa.string())})

    rows = docs.map_batches(explode,
                            batch_format="pyarrow").materialize()

    def neg(t: pa.Table) -> pa.Table:
        return t.append_column("_negid",
                               pc.multiply(t.column("doc_id"), -1))

    first_seen = grouped_argmax(
        rows.map_batches(neg, batch_format="pyarrow"),
        key="shingle", order_col="_negid", tie_col="doc_id",
        out_cols=["shingle", "doc_id"],
        num_partitions=num_partitions).map_batches(
            lambda t: pa.table({"shingle": t.column("shingle"),
                                "first_doc": t.column("doc_id")}),
            batch_format="pyarrow")

    joined = hash_join(
        rows, first_seen, on="shingle", num_partitions=num_partitions,
        left_schema=pa.schema([("doc_id", pa.int64()),
                               ("shingle", pa.string())]),
        right_schema=pa.schema([("shingle", pa.string()),
                                ("first_doc", pa.int64())]))

    def flags(t: pa.Table) -> pa.Table:
        nov = pc.cast(pc.equal(t.column("first_doc"),
                               t.column("doc_id")), pa.int64())
        return pa.table({"doc_id": t.column("doc_id"),
                         "one": pa.array([1] * t.num_rows, pa.int64()),
                         "nov": nov})

    agg = hash_aggregate(
        joined.map_batches(flags, batch_format="pyarrow"),
        keys=["doc_id"], sum_cols={"one": "n_shingles",
                                   "nov": "n_novel"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("doc_id", pa.int64()),
                              ("n_shingles", pa.int64()),
                              ("n_novel", pa.int64())]))

    def finish(t: pa.Table) -> pa.Table:
        r = pc.round(pc.divide(
            pc.cast(t.column("n_novel"), pa.float64()),
            pc.cast(t.column("n_shingles"), pa.float64())), ndigits=9)
        return t.append_column("novelty", r)

    return agg.map_batches(finish, batch_format="pyarrow")


# -------------------------------------------------------------------------
# embedding cosine near-dup (exact)
# -------------------------------------------------------------------------

def embedding_neardup_pairs(embs: rd.Dataset, threshold: float = 0.9,
                            mode: str = "auto",
                            exact_max_rows: int = 200_000,
                            n_tables: int = 6, n_planes: int = 12,
                            seed: int = 42,
                            max_bucket: int = 2000) -> rd.Dataset:
    """Cosine near-dup pairs (vec_a < vec_b, cos >= threshold).

    ``mode="exact"``: all-pairs via a broadcast normalized matrix — one
    numpy matmul per batch; exact, but the matrix must fit a worker.
    ``mode="lsh"``: the 100-TB path — ``n_tables`` independent
    random-hyperplane bucketings; vectors shuffle to (table, bucket)
    partitions, each bucket verifies pairwise locally (capped at
    ``max_bucket``, dropped buckets reported via log), cross-table
    dedup is one more hash-partitioned shuffle. Approximate (recall
    grows with n_tables / falls with n_planes); no corpus-sized state
    anywhere. ``mode="auto"`` (default) picks exact up to
    ``exact_max_rows`` rows, LSH above.
    """
    if mode == "auto":
        mode = "exact" if embs.count() <= exact_max_rows else "lsh"
    if mode == "lsh":
        return _embedding_neardup_lsh(embs, threshold, n_tables, n_planes,
                                      seed, max_bucket)
    df = embs.select_columns(["vec_id", "embedding"]).to_pandas()
    ids = df["vec_id"].to_numpy()
    M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    ref = ray.put((ids, M))

    def f(t: pa.Table) -> pa.Table:
        from .simsearch import to_matrix
        all_ids, all_m = ray.get(ref)
        pos = {v: i for i, v in enumerate(all_ids)}
        vids = t.column("vec_id").to_pylist()
        # non-inplace: to_matrix may hand back a read-only zero-copy view
        rows = to_matrix(t, "embedding")
        rows = rows / np.linalg.norm(rows, axis=1, keepdims=True)
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


def _embedding_neardup_lsh(embs: rd.Dataset, threshold: float,
                           n_tables: int, n_planes: int, seed: int,
                           max_bucket: int,
                           num_partitions: "int | None" = None) -> rd.Dataset:
    """LSH-bucketed near-dup: vectors travel to their (table, bucket)
    partitions; verification is a per-bucket pairwise matmul. The only
    replication is x n_tables on the embedding column; nothing is ever
    collected to the driver."""
    num_partitions = _resolve_partitions(num_partitions)
    def to_buckets(t: pa.Table) -> pa.Table:
        from .simsearch import to_matrix
        M = to_matrix(t, "embedding")
        dim = M.shape[1]
        rng = np.random.RandomState(seed)
        out_tid, out_bucket, out_vid, out_emb = [], [], [], []
        vids = t.column("vec_id").to_pylist()
        embd = t.column("embedding").to_pylist()
        for tid in range(n_tables):
            planes = rng.randn(dim, n_planes)   # deterministic sequence
            bits = (M @ planes) > 0
            buckets = (bits * (1 << np.arange(n_planes))).sum(axis=1)
            out_tid.extend([tid] * len(vids))
            out_bucket.extend(int(x) for x in buckets)
            out_vid.extend(vids)
            out_emb.extend(embd)
        emb_type = t.schema.field("embedding").type
        return pa.table({"table_id": pa.array(out_tid, pa.int32()),
                         "bucket": pa.array(out_bucket, pa.int64()),
                         "vec_id": pa.array(out_vid, pa.int64()),
                         "embedding": pa.array(out_emb, emb_type)})

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_part"] = ((df["bucket"] * 131 + df["table_id"])
                       % num_partitions).astype("int64")
        return df

    def bucket_verify(g: pd.DataFrame) -> pd.DataFrame:
        out_a: list[int] = []
        out_b: list[int] = []
        out_s: list[float] = []
        for (_tid, _bkt), grp in g.groupby(["table_id", "bucket"]):
            if len(grp) < 2:
                continue
            if len(grp) > max_bucket:
                # no silent caps: report the skew-guard drop
                print(f"[embedding_neardup_lsh] skew cap: skipped bucket "
                      f"({_tid},{_bkt}) with {len(grp)} members "
                      f"> max_bucket={max_bucket}")
                continue
            vids = grp["vec_id"].to_numpy()
            M = np.stack([np.asarray(e, dtype=np.float64)
                          for e in grp["embedding"]])
            M /= np.linalg.norm(M, axis=1, keepdims=True)
            sims = M @ M.T
            ii, jj = np.where(np.triu(sims >= threshold, k=1))
            for i, j in zip(ii, jj):
                a, b = int(vids[i]), int(vids[j])
                if a > b:
                    a, b = b, a
                if a != b:
                    out_a.append(a)
                    out_b.append(b)
                    out_s.append(float(sims[i, j]))
        return pd.DataFrame({"vec_a": pd.Series(out_a, dtype="int64"),
                             "vec_b": pd.Series(out_b, dtype="int64"),
                             "cosine": pd.Series(out_s, dtype="float64")})

    from .relational import typed_groupby_map
    pairs = typed_groupby_map(
        embs.select_columns(["vec_id", "embedding"])
        .map_batches(to_buckets, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pandas"), "_part", bucket_verify,
        _pair_schema(["vec_a", "vec_b", "cosine"]))
    return _dedup_pairs(pairs, keep_cols=["vec_a", "vec_b", "cosine"],
                        key_cols=("vec_a", "vec_b"))


def span_dedup(docs: rd.Dataset, width: int = 8) -> rd.Dataset:
    """Corpus-wide exact SPAN dedup — the chunk-granular approximation
    of exact-substring dedup (Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better"): cut every doc into
    non-overlapping ``width``-token chunks, keep the globally FIRST
    occurrence of each distinct chunk (min (doc_id, chunk_id)), and
    reassemble each doc from its surviving chunks. Docs whose every
    chunk was seen earlier vanish entirely (C4-style boilerplate
    removal).

    Plan: stateless explode -> ONE groupby(chunk) shuffle picking the
    keep-first winner inside each group -> ONE groupby(doc_id) shuffle
    reassembling in chunk order. No driver materialization, no
    broadcast; both shuffles move each chunk exactly once. Output
    (doc_id, dedup_text, n_kept).
    """
    from .relational import typed_groupby_map
    from .text import _WS

    def explode(t: pa.Table) -> pa.Table:
        ids, cids, chunks = [], [], []
        for doc_id, x in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            toks = _WS.sub(" ", (x or "")).strip().split(" ")
            for i in range((len(toks) + width - 1) // width):
                ids.append(doc_id)
                cids.append(i)
                chunks.append(" ".join(toks[i * width:(i + 1) * width]))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "chunk_id": pa.array(cids, pa.int64()),
                         "chunk": pa.array(chunks, pa.string())})

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["doc_id", "chunk_id"], kind="stable").head(1)

    chunk_schema = pa.schema([("doc_id", pa.int64()),
                              ("chunk_id", pa.int64()),
                              ("chunk", pa.string())])
    kept = typed_groupby_map(
        docs.map_batches(explode, batch_format="pyarrow"),
        "chunk", keep_first, chunk_schema)

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("chunk_id", kind="stable")
        return pd.DataFrame({"doc_id": [g["doc_id"].iloc[0]],
                             "dedup_text": [" ".join(g["chunk"])],
                             "n_kept": [len(g)]})

    return typed_groupby_map(
        kept, "doc_id", reassemble,
        pa.schema([("doc_id", pa.int64()), ("dedup_text", pa.string()),
                   ("n_kept", pa.int64())]))


# ---------------------------------------------------------------------------
# Corpus-level line dedup (the CCNet preprocessing step)
# ---------------------------------------------------------------------------

def line_dedup_lines(docs: rd.Dataset, id_col: str = "doc_id",
                     text_col: str = "text", sep: str = "\n",
                     num_partitions: "int | None" = None) -> rd.Dataset:
    """Corpus-wide keep-first line dedup, line granularity: split every
    document on ``sep`` and keep each distinct line's FIRST occurrence
    by (doc_id asc, line_no asc) — the CCNet boilerplate-removal rule
    (duplicated nav/footer lines survive only where first seen; a line
    repeated WITHIN one document also dedups). Output: one row per
    surviving line, (line, doc_id, line_no) with 0-based line_no.

    Plan: vectorized Arrow explode (split_pattern + list offsets — no
    per-row Python), then ONE line-hash exchange via grouped_argmax
    whose combiner keeps a batch-local first occurrence per line, so
    the shuffle ships at most one row per (line, batch). The
    ``neg_doc`` order column maps keep-first onto the top-1-by-
    (order desc, tie asc) primitive."""
    from .web import _explode_positions
    from .relational import grouped_argmax
    import pyarrow.compute as pc

    def explode(t: pa.Table) -> pa.Table:
        schema = pa.schema([("line", pa.string()),
                            ("doc_id", pa.int64()),
                            ("line_no", pa.int64()),
                            ("neg_doc", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        txt = pc.cast(t.column(text_col), pa.string()).combine_chunks()
        sp = pc.split_pattern(txt, sep)
        flat, parents, pos = _explode_positions(sp)
        ids = pc.take(pc.cast(t.column(id_col), pa.int64()), parents)
        return pa.table({"line": flat, "doc_id": ids,
                         "line_no": pa.array(pos, pa.int64()),
                         "neg_doc": pc.negate(ids)})

    lines = docs.map_batches(explode, batch_format="pyarrow")
    won = grouped_argmax(lines, key="line", order_col="neg_doc",
                         tie_col="line_no",
                         out_cols=["line", "doc_id", "line_no"],
                         num_partitions=num_partitions)
    return won.select_columns(["line", "doc_id", "line_no"])


def line_dedup(docs: rd.Dataset, id_col: str = "doc_id",
               text_col: str = "text", sep: str = "\n",
               num_partitions: "int | None" = None) -> rd.Dataset:
    """Document-level result of corpus-wide line dedup: each document
    reassembled from its SURVIVING lines in original order. Documents
    whose every line was first seen elsewhere disappear (the CCNet
    empty-doc drop). Output: (doc_id, text, n_kept).

    Plan: ``line_dedup_lines`` (one line-hash exchange) + one doc-hash
    exchange whose in-partition finish is a vectorized sort +
    groupby-join — two shuffles total, both on hashes/ids, with the
    reassembled text produced inside the partition (never the
    driver)."""
    from .relational import _resolve_partitions as _rp, typed_groupby_map

    won = line_dedup_lines(docs, id_col=id_col, text_col=text_col,
                           sep=sep, num_partitions=num_partitions)
    num_partitions = _rp(num_partitions)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_part"] = (df["doc_id"] % num_partitions).astype("int64")
        return df

    out_schema = pa.schema([(id_col, pa.int64()), (text_col, pa.string()),
                            ("n_kept", pa.int64())])

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "line_no"], kind="stable")
        agg = g.groupby("doc_id", sort=True)["line"].agg(
            [(text_col, sep.join), ("n_kept", "size")]).reset_index()
        agg["n_kept"] = agg["n_kept"].astype("int64")
        return agg.rename(columns={"doc_id": id_col})

    return typed_groupby_map(
        won.map_batches(part, batch_format="pandas"),
        "_part", reassemble, out_schema)


def doc_line_dedup(docs: rd.Dataset, id_col: str = "doc_id",
                   text_col: str = "text",
                   sep: str = "\n") -> rd.Dataset:
    """WITHIN-document line dedup (the Gopher/RefinedWeb in-doc
    repetition cleanup, cousin of corpus-wide ``line_dedup``): each
    document keeps the FIRST occurrence of every distinct line, in
    original order. Purely per-row — a stateless zero-shuffle
    map_batches; the whole transform is one vectorized explode +
    drop_duplicates + rejoin per batch, no exchange at any scale.
    Output: (id_col, text_col, n_kept, n_dropped)."""
    import pyarrow.compute as pc

    from .web import _explode_positions

    out_schema = pa.schema([(id_col, pa.int64()), (text_col, pa.string()),
                            ("n_kept", pa.int64()),
                            ("n_dropped", pa.int64())])

    def dedup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        txt = pc.cast(t.column(text_col), pa.string()).combine_chunks()
        sp = pc.split_pattern(txt, sep)
        flat, parents, pos = _explode_positions(sp)
        df = pd.DataFrame({
            "_p": parents, "line": flat.to_pandas(), "pos": pos})
        kept = df.drop_duplicates(["_p", "line"], keep="first")
        agg = kept.groupby("_p", sort=True)["line"].agg(
            [(text_col, sep.join), ("n_kept", "size")])
        total = df.groupby("_p", sort=True).size()
        ids = pc.cast(t.column(id_col), pa.int64()).to_pandas()
        return pa.table({
            id_col: pa.array(ids.iloc[agg.index].to_numpy(), pa.int64()),
            text_col: pa.array(agg[text_col].to_numpy(), pa.string()),
            "n_kept": pa.array(agg["n_kept"].to_numpy(), pa.int64()),
            "n_dropped": pa.array(
                (total.loc[agg.index] - agg["n_kept"]).to_numpy(),
                pa.int64())})

    return docs.map_batches(dedup, batch_format="pyarrow")


# -------------------------------------------------------------------------
# SemDeDup: embedding-cluster semantic dedup (Abbas et al. 2023,
# arXiv:2303.09540 — public paper; method: k-means the embeddings,
# prune near-duplicates within each cluster so the pairwise cost is
# O(sum c_i^2), not O(N^2))
# -------------------------------------------------------------------------

def semdedup_assign(embs: rd.Dataset, n_seeds: int = 8,
                    id_col: str = "vec_id",
                    emb_col: str = "embedding") -> rd.Dataset:
    """Deterministic cluster assignment: seeds are the ``n_seeds``
    LOWEST-id embeddings (found via a bounded two-stage bottom-k — per
    batch partial, one merge block, ``n_seeds`` rows ever reach the
    driver), broadcast once; each batch assigns rows to the seed with
    the highest cosine (rounded to 9 dp; ties -> lowest seed id). Zero
    iterations on purpose: assignment is reproducible in plain SQL, so
    the whole dedup chain is oracle-checkable, and at scale it is one
    broadcast matmul per batch. (Swap in ``simsearch.kmeans_centroids``
    seeds for quality-over-auditability.)

    Output: ``(id_col, cluster:int64, sim:float64)``.
    """
    def bottomk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        order = np.argsort(np.asarray(t.column(id_col)))[:n_seeds]
        return t.take(order)

    seed_rows = (embs.select_columns([id_col, emb_col])
                 .map_batches(bottomk, batch_format="pyarrow")
                 .repartition(1)
                 .map_batches(bottomk, batch_format="pyarrow")
                 .take(n_seeds))
    seed_rows.sort(key=lambda r: r[id_col])
    sids = np.array([r[id_col] for r in seed_rows], dtype=np.int64)
    S = _unit_rows(np.stack([np.asarray(r[emb_col], dtype=np.float64)
                             for r in seed_rows]), "semdedup seeds")
    ref = ray.put((sids, S))

    def assign(t: pa.Table) -> pa.Table:
        from .simsearch import to_matrix
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        seed_ids, seed_m = ray.get(ref)
        rows = _unit_rows(to_matrix(t, emb_col), "semdedup_assign")
        sims = np.round(rows @ seed_m.T, 9)
        best = np.argmax(sims, axis=1)          # first max = lowest sid
        return pa.table({
            id_col: pa.array(np.asarray(t.column(id_col)), pa.int64()),
            "cluster": pa.array(seed_ids[best], pa.int64()),
            "sim": pa.array(sims[np.arange(len(best)), best],
                            pa.float64()),
        })

    return embs.map_batches(assign, batch_format="pyarrow")


def semdedup(embs: rd.Dataset, n_seeds: int = 8, tau: float = 0.7,
             id_col: str = "vec_id", emb_col: str = "embedding",
             max_cluster_rows: int = 100_000) -> rd.Dataset:
    """SemDeDup pruning: within each cluster, DROP any row that has an
    earlier (lower-id) cluster-mate with cosine >= ``tau`` (rounded to
    9 dp) — the anchor-by-id variant of the paper's keep-one-per-
    duplicate-group, chosen because it is order-free (no sequential
    scan) and exactly reproducible by a SQL self-join.

    Plan: assignment (broadcast matmul per batch) -> ONE hash exchange
    on cluster -> per-cluster vectorized pairwise (normalized matmul;
    upper-triangle mask). Pairwise state is c^2 for a c-row cluster:
    clusters above ``max_cluster_rows`` raise actionably (raise
    ``n_seeds`` — the paper's production setting is k ~ N/10k — or
    pre-shard by LSH band via ``embedding_neardup_pairs``).

    Output: the KEPT rows ``(id_col, cluster:int64)``.
    """
    from .relational import typed_groupby_map

    asg = semdedup_assign(embs, n_seeds, id_col, emb_col)
    joined = _attach_embeddings(asg, embs, id_col, emb_col)
    out_schema = pa.schema([(id_col, pa.int64()),
                            ("cluster", pa.int64())])

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) > max_cluster_rows:
            raise ValueError(
                f"semdedup cluster {int(df['cluster'].iloc[0])} holds "
                f"{len(df)} rows > max_cluster_rows={max_cluster_rows}; "
                "raise n_seeds (target c ~ N/n_seeds) or pre-shard")
        df = df.sort_values(id_col, kind="stable")
        M = _unit_rows(np.array(df[emb_col].tolist(), dtype=np.float64),
                       "semdedup prune")
        sims = np.round(M @ M.T, 9)
        # drop row j if any i<j has sims[i,j] >= tau
        dup = (np.triu(sims >= tau, k=1)).any(axis=0)
        return df.loc[~dup, [id_col, "cluster"]]

    return typed_groupby_map(joined, "cluster", prune, out_schema)


def _unit_rows(M: np.ndarray, what: str) -> np.ndarray:
    """L2-normalize rows, raising loudly on zero-norm vectors: an
    all-zero embedding would otherwise propagate NaN cosines through
    argmax/threshold comparisons silently (NaN >= tau is False, so a
    degenerate row could never be pruned or detected)."""
    n = np.linalg.norm(M, axis=1, keepdims=True)
    if M.size and not np.all(n > 0):
        # ~(n > 0) also catches NaN/Inf norms (NaN comparisons are
        # False), so non-finite embeddings fail with the same message
        # instead of an IndexError on an empty zero-match
        bad = int(np.flatnonzero(~(n.ravel() > 0))[0])
        raise ValueError(
            f"{what}: zero-norm or non-finite embedding at row {bad} — "
            "cosine is undefined; drop or re-embed degenerate vectors "
            "first (see embedding_norms for the audit pass)")
    return M / n


def _attach_embeddings(asg: rd.Dataset, embs: rd.Dataset, id_col: str,
                       emb_col: str) -> rd.Dataset:
    """Co-partitioned re-attach of the embedding column to the
    assignment rows (hash exchange on id). The embedding never rides
    through the assignment shuffle twice."""
    from .relational import hash_join
    return hash_join(asg, embs.select_columns([id_col, emb_col]),
                     on=id_col, how="inner")


# -------------------------------------------------------------------------
# Content-defined chunking (Rabin-style CDC; cf. LBFS Muthitacharoen et
# al. 2001 / FastCDC Xia et al. 2016 — public papers). Boundary rule
# here is the windowed-fingerprint form: split AFTER character i when
# the md5-high-64 of the trailing W-char window has its low k bits
# zero. Stateless per position (no min/max clamps), so insertions only
# reshape chunks near the edit — the CDC property — and every boundary
# decision is independently SQL-reproducible. The kernel is vectorized
# md5-exact: numpy windowing + distinct-window collapse + cached md5
# per DISTINCT window (see _CDCChunker), so no per-char Python loop
# remains while the boundary rule and oracle stay byte-identical.
# -------------------------------------------------------------------------

class _CDCChunker:
    """Actor-pool CDC stage, vectorized boundary kernel.

    The boundary rule stays md5-exact (oracle-pinned), but the per-char
    Python loop is gone: each doc's character windows are materialized
    as one numpy (n-W+1, W) uint32 codepoint matrix (utf-32 view of the
    text — char-correct for any Unicode), collapsed with ``np.unique``
    to DISTINCT windows, and only cache-miss distinct windows pay an
    md5. The boundary bit vector is then one vectorized gather; span
    starts/ends come from the nonzero positions. Natural text re-uses
    short windows heavily, so distinct windows per doc ≪ positions and
    the persistent across-batch cache (state in ``__init__``, the
    actor-pool pattern; bounded, dropped wholesale when full) makes
    repeats across documents free. A second bounded cache memoizes
    chunk digests — duplicate-rich corpora (the CDC use case) repeat
    chunks by construction. Output rows are byte-identical to
    ``_split_one_scalar`` (property-tested) and to the SQL oracle."""

    # below this many DISTINCT windows the corpus is cache-resident and
    # the per-window dict probe beats the per-doc np.unique sort (the
    # vectorized path pays ~2.5x on e.g. templated/synthetic corpora
    # with a tiny window universe; real web text sits far above this)
    SMALL_UNIVERSE = 4096
    # let the vectorized path warm the cache before judging universe size
    WARMUP_DOCS = 64

    def __init__(self, window: int, mask_bits: int, id_col: str,
                 text_col: str, cache_max: int = 2_000_000):
        self.window = window
        self.mask = (1 << mask_bits) - 1
        self.id_col = id_col
        self.text_col = text_col
        self.cache_max = cache_max
        self._cache: "dict[bytes, bool]" = {}    # utf-32 window -> boundary?
        self._chunk_cache: "dict[str, str]" = {}  # chunk text -> md5 hex
        self._docs_seen = 0

    def _split_one_scalar(self, text: str) -> "list[tuple[int, int]]":
        """Reference kernel (the pre-vectorization per-char loop), kept
        as the in-repo cross-check for the numpy path."""
        n, window = len(text), self.window
        mask = self.mask
        bounds = []
        for i in range(window, n + 1):          # i = 1-based window end
            w = text[i - window:i]
            if (int(hashlib.md5(w.encode("utf-8"))
                    .hexdigest()[:16], 16) & mask) == 0:
                bounds.append(i)
        spans, s = [], 0
        for e in bounds:
            spans.append((s, e))
            s = e
        if n - s > 0:
            spans.append((s, n))
        return spans

    def _split_one(self, text: str) -> "list[tuple[int, int]]":
        """Adaptive dispatch: vectorized distinct-window collapse by
        default; once the warmed cache shows a SMALL window universe
        (cache-resident corpus), the per-window dict probe is cheaper
        than the per-doc sort and takes over. Both paths share the
        utf-32-keyed cache and are byte-identical (property-tested)."""
        self._docs_seen += 1
        if (self._docs_seen > self.WARMUP_DOCS
                and len(self._cache) < self.SMALL_UNIVERSE):
            return self._split_one_probe(text)
        return self._split_one_vec(text)

    def _split_one_probe(self, text: str) -> "list[tuple[int, int]]":
        n, window = len(text), self.window
        if n < window:
            return [(0, n)] if n else []
        enc = text.encode("utf-32-le")
        cache, mask = self._cache, self.mask
        bounds = []
        for i in range(window, n + 1):
            w = enc[4 * (i - window):4 * i]
            hit = cache.get(w)
            if hit is None:
                s = w.decode("utf-32-le")
                hit = (int(hashlib.md5(s.encode("utf-8"))
                           .hexdigest()[:16], 16) & mask) == 0
                if len(cache) >= self.cache_max:
                    cache.clear()
                cache[w] = hit
            if hit:
                bounds.append(i)
        spans, s = [], 0
        for e in bounds:
            spans.append((s, e))
            s = e
        if n - s > 0:
            spans.append((s, n))
        return spans

    def _split_one_vec(self, text: str) -> "list[tuple[int, int]]":
        n, window = len(text), self.window
        if n < window:
            return [(0, n)] if n else []
        codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
        wins = np.lib.stride_tricks.sliding_window_view(codes, window)
        keys = np.ascontiguousarray(wins).view(f"V{4 * window}").ravel()
        uniq, inv = np.unique(keys, return_inverse=True)
        hits_u = np.empty(len(uniq), dtype=bool)
        cache, mask = self._cache, self.mask
        for j in range(len(uniq)):
            b = uniq[j].tobytes()
            hit = cache.get(b)
            if hit is None:
                w = b.decode("utf-32-le")
                hit = (int(hashlib.md5(w.encode("utf-8"))
                           .hexdigest()[:16], 16) & mask) == 0
                if len(cache) >= self.cache_max:
                    cache.clear()
                cache[b] = hit
            hits_u[j] = hit
        bounds = np.flatnonzero(hits_u[inv]) + window   # 1-based ends
        if not len(bounds):
            return [(0, n)]
        starts = np.concatenate(([0], bounds[:-1]))
        spans = list(zip(starts.tolist(), bounds.tolist()))
        if n - spans[-1][1] > 0:
            spans.append((spans[-1][1], n))
        return spans

    def __call__(self, t: pa.Table) -> pa.Table:
        id_col = self.id_col
        chunk_cache, cache_max = self._chunk_cache, self.cache_max
        ids, idxs, starts, lens, digests = [], [], [], [], []
        for doc_id, text in zip(t.column(id_col).to_pylist(),
                                t.column(self.text_col).to_pylist()):
            for ci, (s, e) in enumerate(self._split_one(text or "")):
                ids.append(doc_id)
                idxs.append(ci)
                starts.append(s + 1)
                lens.append(e - s)
                chunk = text[s:e]
                # cache only short chunks (the dedup-heavy common case);
                # a boundary-free doc is ONE whole-text chunk and caching
                # those would key multi-KB strings — unbounded bytes
                # under the entry-count cap
                if len(chunk) <= 1024:
                    d = chunk_cache.get(chunk)
                    if d is None:
                        d = hashlib.md5(chunk.encode("utf-8")).hexdigest()
                        if len(chunk_cache) >= cache_max:
                            chunk_cache.clear()
                        chunk_cache[chunk] = d
                else:
                    d = hashlib.md5(chunk.encode("utf-8")).hexdigest()
                digests.append(d)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "chunk_idx": pa.array(idxs, pa.int64()),
            "start": pa.array(starts, pa.int64()),
            "len": pa.array(lens, pa.int64()),
            "chunk_md5": pa.array(digests, pa.string()),
        })


def cdc_chunks(docs: rd.Dataset, window: int = 8, mask_bits: int = 5,
               id_col: str = "doc_id", text_col: str = "text",
               concurrency=(1, 8)) -> rd.Dataset:
    """Explode each doc into content-defined chunks. Actor-pool
    map_batches (per-worker window-digest cache) — zero shuffles.
    Output: (id_col, chunk_idx, start: 1-based char offset, len,
    chunk_md5). Docs shorter than ``window`` (or with no boundary)
    yield one whole-doc chunk; empty docs yield none."""
    return docs.map_batches(
        _CDCChunker, fn_constructor_args=(window, mask_bits, id_col,
                                          text_col),
        batch_format="pyarrow", concurrency=concurrency)


def cdc_dup_chunks(docs: rd.Dataset, window: int = 8, mask_bits: int = 5,
                   id_col: str = "doc_id", text_col: str = "text",
                   min_occ: int = 2) -> rd.Dataset:
    """Cross-doc chunk dedup ledger: chunks occurring >= ``min_occ``
    times corpus-wide, with occurrence and distinct-doc counts — the
    storage-dedup bookkeeping step. Combiner-first: each batch
    pre-aggregates to one (chunk_md5, doc) row, the ONE exchange is
    keyed ``hash(chunk_md5) % P`` (P partitions regardless of chunk
    cardinality — grouping on raw chunk_md5 would pay Ray's per-group
    map_groups overhead once per distinct chunk, which dominated at
    ~45k chunks), and each partition finishes with one vectorized
    pandas groupby. Chunk text never moves."""
    from .relational import _resolve_partitions, typed_groupby_map

    chunks = cdc_chunks(docs, window, mask_bits, id_col, text_col)
    num_partitions = _resolve_partitions(None)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["chunk_md5", id_col], as_index=False).agg(
            cnt=("len", "size"), len=("len", "first"))
        h = pd.util.hash_pandas_object(g["chunk_md5"], index=False)
        g["part"] = (h % num_partitions).astype("int64")
        return g

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("chunk_md5").agg(
            n_occ=("cnt", "sum"),
            n_docs=(id_col, "nunique"),
            chunk_len=("len", "first"))
        out = out[out["n_occ"] >= min_occ].reset_index()
        for c in ("n_occ", "n_docs", "chunk_len"):
            out[c] = out[c].astype("int64")
        return out

    partials = (chunks.select_columns(["chunk_md5", id_col, "len"])
                .map_batches(partial, batch_format="pandas"))
    return typed_groupby_map(
        partials, "part", finish,
        out_schema=pa.schema([("chunk_md5", pa.string()),
                              ("n_occ", pa.int64()),
                              ("n_docs", pa.int64()),
                              ("chunk_len", pa.int64())]))


def ngram_jaccard_prefix(docs: rd.Dataset, n: int = 3,
                         threshold: float = 0.5,
                         verify: str = "shuffle") -> rd.Dataset:
    """Prefix-filtered exact Jaccard pair join (PPJoin family — Xiao et
    al. WWW'08, Bayardo et al. WWW'07; public papers). Output-identical
    to :func:`ngram_jaccard_pairs` (same oracle), but candidate pairs
    come only from PREFIX posting lists: each doc's distinct shingles
    are put in a global order (md5 — stateless, no df table to
    broadcast) and only the first floor((1-t)|s|)+1 participate in the
    self-merge. Any pair with Jaccard >= t must collide inside both
    prefixes, so nothing is lost; hot shingles deep in documents never
    build posting lists. A length filter (min|s| >= t*max|s|) prunes
    further before verification.

    Plan: prefix self-merge (one shingle-hash exchange) -> pair-hash
    candidate dedup -> TWO verify joins (attach A's full shingle set,
    composite-key inner join against B's) -> per-pair intersection
    aggregate. All exchanges are key-hash partitioned; no driver state.

    ``verify``: "shuffle" (default — the web-scale path above) keeps
    every stage distributed; "broadcast" swaps the 3 verify exchanges
    for the driver-built shingle-set check (the minhash precedent —
    right only while the corpus fits the driver); "auto" gates on
    ``BROADCAST_VERIFY_MAX_DOCS``. All modes output-identical (tested).
    """
    import hashlib as _hl

    from .relational import hash_join, typed_groupby_map

    def explode(t: pa.Table) -> pa.Table:
        # batch-level distinct-shingle digest table (the minhash_signatures
        # pattern): md5 runs once per DISTINCT shingle in the batch, the
        # (digest, shingle) global order becomes an integer rank, and each
        # doc's prefix ordering is an integer argsort over its rank
        # vector. ids/n/pref columns are pure repeat/arange algebra —
        # no per-row Python loop remains.
        texts = t.column("text").to_pylist()
        uniq: dict[str, int] = {}
        doc_idx = []
        for text in texts:
            doc_idx.append(np.fromiter(
                (uniq.setdefault(s, len(uniq)) for s in _shingles(text, n)),
                dtype=np.int64))
        if not uniq:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "shingle": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "pref": pa.array([], pa.int64())})
        sh_arr = np.array(list(uniq), dtype=object)
        dig = np.fromiter((_hl.md5(s.encode()).hexdigest() for s in uniq),
                          dtype=object, count=len(uniq))
        order = np.lexsort((sh_arr, dig))      # (digest, shingle) order
        rank = np.empty(len(uniq), np.int64)
        rank[order] = np.arange(len(uniq))
        counts = np.fromiter((len(ix) for ix in doc_idx), np.int64,
                             count=len(doc_idx))
        flat = np.concatenate(
            [ix[np.argsort(rank[ix], kind="stable")] for ix in doc_idx])
        plens = ((1.0 - threshold) * counts).astype(np.int64) + 1
        offsets = np.cumsum(counts) - counts
        pos = np.arange(len(flat)) - np.repeat(offsets, counts)
        return pa.table({
            "doc_id": pa.array(
                np.repeat(t.column("doc_id").to_numpy(), counts)),
            "shingle": pa.array(sh_arr[flat].tolist(), pa.string()),
            "n": pa.array(np.repeat(counts, counts)),
            "pref": pa.array(
                (pos < np.repeat(plens, counts)).astype(np.int64))})

    # the shingle explode feeds THREE consumers (candidate generation
    # and both verify sides) — materialize once instead of recomputing
    # the explode per branch (object store spills at scale; recompute
    # would triple the upstream read), and bound the block count: the
    # downstream sort-groupbys/joins keep the INPUT block grain, so
    # tiny-block inputs would pay per-task scheduling at every one of
    # the 5 exchanges (the ops/graph._coalesced lesson)
    from .relational import auto_partitions
    from .graph import _coalesced
    rows = _coalesced(docs.map_batches(explode, batch_format="pyarrow"),
                      auto_partitions())

    def add_part(df: pd.DataFrame, P: int = 64) -> pd.DataFrame:
        df = df[df["pref"] == 1].copy()
        df["part"] = (pd.util.hash_pandas_object(df["shingle"], index=False)
                      % P).astype("int64")
        return df

    def cand(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="shingle")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        lo = m[["n_x", "n_y"]].min(axis=1)
        hi = m[["n_x", "n_y"]].max(axis=1)
        m = m[lo >= threshold * hi]            # length filter
        out = (m[["doc_id_x", "doc_id_y", "n_x", "n_y"]]
               .drop_duplicates(["doc_id_x", "doc_id_y"]))
        return out.rename(columns={"doc_id_x": "doc_a",
                                   "doc_id_y": "doc_b",
                                   "n_x": "n_a", "n_y": "n_b"})

    cand_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                             ("n_a", pa.int64()), ("n_b", pa.int64())])
    cands = typed_groupby_map(
        rows.map_batches(add_part, batch_format="pandas"), "part", cand,
        cand_schema)

    def add_pair_part(df: pd.DataFrame, P: int = 32) -> pd.DataFrame:
        df = df.copy()
        df["_part"] = ((df["doc_a"] * 1_000_003 + df["doc_b"]) % P
                       ).astype("int64")
        return df

    cands = typed_groupby_map(
        cands.map_batches(add_pair_part, batch_format="pandas"), "_part",
        lambda g: g.drop_duplicates(["doc_a", "doc_b"])[
            ["doc_a", "doc_b", "n_a", "n_b"]],
        cand_schema)

    if verify == "auto":
        verify = ("broadcast" if docs.count() <= BROADCAST_VERIFY_MAX_DOCS
                  else "shuffle")
    if verify == "broadcast":
        return _verify_pairs_broadcast(docs, cands, n, threshold)

    # verify: attach A's full shingle set, then composite-key inner
    # join against B's rows — surviving rows ARE the intersection
    a_rows = rows.map_batches(
        lambda t: pa.table({"doc_a": t.column("doc_id"),
                            "shingle": t.column("shingle")}),
        batch_format="pyarrow")
    b_rows = rows.map_batches(
        lambda t: pa.table({"doc_b": t.column("doc_id"),
                            "shingle": t.column("shingle")}),
        batch_format="pyarrow")
    j1 = hash_join(
        cands, a_rows, on="doc_a",
        left_schema=cand_schema,
        right_schema=pa.schema([("doc_a", pa.int64()),
                                ("shingle", pa.string())]))
    j2 = hash_join(
        j1, b_rows, on=["doc_b", "shingle"],
        left_schema=pa.schema(list(cand_schema)
                              + [("shingle", pa.string())]),
        right_schema=pa.schema([("doc_b", pa.int64()),
                                ("shingle", pa.string())]))

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["doc_a", "doc_b"], as_index=False).agg(
            inter=("shingle", "size"), n_a=("n_a", "first"),
            n_b=("n_b", "first"))
        union = (out["n_a"] + out["n_b"] - out["inter"]).clip(lower=1)
        out["jaccard"] = out["inter"] / union
        out = out[out["jaccard"] >= threshold]
        return out[["doc_a", "doc_b", "jaccard"]]

    return typed_groupby_map(
        j2.map_batches(add_pair_part, batch_format="pandas"), "_part",
        finalize, _pair_schema(["doc_a", "doc_b", "jaccard"]))


def source_overlap_matrix(docs: rd.Dataset, n: int = 3,
                          key_col: str = "source",
                          text_col: str = "text") -> rd.Dataset:
    """Cross-source contamination matrix: for every pair of sources,
    how many DISTINCT n-gram shingles they share — the governance view
    behind 'which corpora leak into which'. Shingles co-partition by
    hash, so the global (shingle, source) distinct and the per-shingle
    source-pair expansion are both partition-local (pair fan-out is
    bounded by the SOURCE domain, not the corpus); one tiny pair
    aggregate finishes. Output: (src_a, src_b, shared_shingles),
    src_a < src_b."""
    from .relational import typed_groupby_map

    def explode(t: pa.Table) -> pa.Table:
        keys, shs = [], []
        for key, text in zip(t.column(key_col).to_pylist(),
                             t.column(text_col).to_pylist()):
            for s in _shingles(text or "", n):
                keys.append(key)
                shs.append(s)
        return pa.table({key_col: pa.array(keys, pa.string()),
                         "shingle": pa.array(shs, pa.string())})

    def add_part(df: pd.DataFrame, P: int = 64) -> pd.DataFrame:
        df = df.drop_duplicates([key_col, "shingle"])
        df = df.assign(part=(pd.util.hash_pandas_object(
            df["shingle"], index=False) % P).astype("int64"))
        return df

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([key_col, "shingle"])
        m = g.merge(g, on="shingle")
        m = m[m[f"{key_col}_x"] < m[f"{key_col}_y"]]
        out = m.groupby([f"{key_col}_x", f"{key_col}_y"],
                        as_index=False).agg(shared=("shingle", "size"))
        return out.rename(columns={f"{key_col}_x": "src_a",
                                   f"{key_col}_y": "src_b"})

    partials = typed_groupby_map(
        docs.map_batches(explode, batch_format="pyarrow")
            .map_batches(add_part, batch_format="pandas"),
        "part", pairs,
        pa.schema([("src_a", pa.string()), ("src_b", pa.string()),
                   ("shared", pa.int64())]))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["src_a", "src_b"], as_index=False).agg(
            shared_shingles=("shared", "sum"))
        out["shared_shingles"] = out["shared_shingles"].astype("int64")
        return out

    def pair_part(df: pd.DataFrame, P: int = 8) -> pd.DataFrame:
        df = df.copy()
        df["_part"] = (pd.util.hash_pandas_object(
            df["src_a"], index=False) % P).astype("int64")
        return df

    return typed_groupby_map(
        partials.map_batches(pair_part, batch_format="pandas"), "_part",
        finish,
        pa.schema([("src_a", pa.string()), ("src_b", pa.string()),
                   ("shared_shingles", pa.int64())]))

"""Sketch / bounded-state summaries: KMV distinct count, exact
two-pass frequent items.

At 100 TB an exact per-key COUNT(DISTINCT) over a high-cardinality
value domain (e.g. distinct tokens per language) shuffles every
distinct pair; a bottom-k sketch caps the exchange at k rows per
(key, batch) and merges exactly (the bottom-k set is a semilattice:
merge = union + re-truncate), so the distributed result is identical
to a single-node pass regardless of partitioning.

The estimator is the standard KMV one (Bar-Yossef et al. 2002,
"Counting distinct elements in a data stream"): with h_k the k-th
smallest 64-bit hash, est = (k-1) * 2^64 / h_k; when fewer than k
distinct hashes exist the sketch IS the exact distinct set and the
exact count is returned. The hash is the first 16 hex chars of md5
(DuckDB ``('0x' || substr(md5(v), 1, 16))::UBIGINT``) so an
independent SQL engine recomputes the estimate bit-for-bit — every
arithmetic step below mirrors the oracle's left-to-right double
expression.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .relational import typed_groupby_map

_SCALE = 18446744073709551616.0   # 2**64, exact in double


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:16], 16)


def kmv_distinct(ds: rd.Dataset, key: str, value_col: str, k: int = 64,
                 key_type: "pa.DataType | None" = None) -> rd.Dataset:
    """Per-key approximate COUNT(DISTINCT value) via a bottom-k sketch.

    Plan: each batch dedupes (key, value), hashes the values and keeps
    the <= k smallest hashes per key (combiner) — the ONE groupby
    shuffle then moves at most k rows per (key, batch), never the
    value domain. The finish merges the per-batch sketches (unique +
    truncate) and evaluates the estimator. Output: (key,
    est_distinct: double).
    """
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[key, value_col]].drop_duplicates()
        d = d.assign(h=np.fromiter((_h64(v) for v in d[value_col]),
                                   dtype=np.uint64, count=len(d)))
        d = d[[key, "h"]].drop_duplicates()
        return (d.sort_values("h", kind="stable")
                .groupby(key, as_index=False).head(k))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for kv, grp in g.groupby(key, sort=True):
            hs = np.unique(grp["h"].to_numpy())   # sorted unique merge
            if len(hs) < k:
                est = float(len(hs))
            else:
                # (k-1) * 2^64 is exact in double; one IEEE division —
                # identical to the oracle's
                # (k-1) * 18446744073709551616.0 / CAST(h_k AS DOUBLE)
                est = (k - 1) * _SCALE / float(hs[k - 1])
            out.append({key: kv, "est_distinct": est})
        return pd.DataFrame(out, columns=[key, "est_distinct"])

    partials = ds.map_batches(partial, batch_format="pandas")
    return typed_groupby_map(
        partials, key, final,
        pa.schema([(key, key_type or pa.string()),
                   ("est_distinct", pa.float64())]))


_TOTAL = "\x00__total__"   # sentinel key for the corpus-total row


def value_cms(ds: rd.Dataset, value_col: str, width: int = 8192,
              depth: int = 4) -> rd.Dataset:
    """Count-min sketch over an arbitrary value column (the generic
    form of ``cms_sketch``, which tokenizes text). Per-batch Counter →
    (d, b, c) cells combiner → small groupby; the exchange moves <=
    depth*width rows per batch regardless of the value domain."""
    from collections import Counter

    from .relational import partial_agg_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[value_col].astype(str).value_counts()
        cells: Counter = Counter()
        for v, n in vc.items():
            for d in range(depth):
                cells[(d, _cms_bucket(d, v, width))] += int(n)
        ks = list(cells.keys())
        return pd.DataFrame({"d": [k[0] for k in ks],
                             "b": [k[1] for k in ks],
                             "c": [cells[k] for k in ks]})

    return partial_agg_sum(
        ds.map_batches(partial, batch_format="pandas"),
        ["d", "b"], {"c": "c"})


def frequent_values(ds: rd.Dataset, value_col: str, theta: float,
                    prefilter: str = "cms", width: int = 8192,
                    depth: int = 4) -> rd.Dataset:
    """EXACT theta-frequent values (count >= theta * total) with
    bounded per-worker state — the classic heavy-hitters plan
    (Misra-Gries / SpaceSaving family; here per-batch exact counts
    give the same superset guarantee with vectorized kernels).

    Candidates: each batch keeps values whose BATCH frequency is
    >= theta — at most 1/theta survivors per batch, so per-worker
    state is bounded regardless of the value domain. The union over
    batches is a superset of every globally theta-frequent value
    (weighted-average argument: global ratio >= theta implies batch
    ratio >= theta in at least one batch).

    ``prefilter="cms"`` (default): that union still grows with BATCH
    COUNT (at millions of batches the driver-collected candidate set
    is unbounded — VERDICT r2 item 3), so a count-min sketch is built
    first (one pass, <= depth*width rows driver state; its d=0 row sums
    to the EXACT corpus total) and broadcast; each batch drops local
    survivors whose CMS estimate < theta*total BEFORE the union. CMS
    error is one-sided (est >= true), so no true heavy hitter is ever
    dropped — the final output is identical to ``prefilter="none"``;
    driver candidate state becomes O(width*depth + true-ish heavies).

    Exact recount: per batch, count ONLY candidate values plus the
    batch total (sentinel row); a combiner + small groupby sums them,
    and the final theta*total filter runs over the candidate-sized
    result. Output (value, n) with n the EXACT global count — never an
    approximation.
    """
    import ray

    cms_ref = None
    if prefilter == "cms":
        cells = value_cms(ds, value_col, width, depth).to_pandas()
        total_est = int(cells.loc[cells["d"] == 0, "c"].sum())
        lut = {(int(d), int(b)): int(c)
               for d, b, c in zip(cells["d"], cells["b"], cells["c"])}
        cms_ref = ray.put((lut, total_est))
    elif prefilter != "none":
        raise ValueError(f"unknown prefilter {prefilter!r}")

    def cand(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[value_col].value_counts()
        keep = vc[vc >= theta * len(df)].index.astype(str)
        if cms_ref is not None:
            lut, total = ray.get(cms_ref)
            keep = [v for v in keep
                    if min(lut.get((d, _cms_bucket(d, v, width)), 0)
                           for d in range(depth)) >= theta * total]
        return pd.DataFrame({"value": pd.Series(keep, dtype="object")})

    cands = ds.map_batches(cand, batch_format="pandas")
    ref = ray.put(frozenset(cands.unique("value")))

    def recount(df: pd.DataFrame) -> pd.DataFrame:
        cs = ray.get(ref)
        s = df[value_col]
        vc = s[s.isin(cs)].value_counts()
        return pd.DataFrame({
            "value": list(vc.index.astype(str)) + [_TOTAL],
            "n": list(vc.values) + [len(df)]})

    from .relational import partial_agg_sum
    sums = partial_agg_sum(
        ds.map_batches(recount, batch_format="pandas"),
        "value", {"n": "n"}).to_pandas()
    tot_rows = sums.loc[sums["value"] == _TOTAL, "n"]
    total = int(tot_rows.iloc[0]) if len(tot_rows) else 0
    out = sums[(sums["value"] != _TOTAL) & (sums["n"] >= theta * total)]
    return rd.from_arrow(pa.Table.from_pandas(
        out.reset_index(drop=True),
        schema=pa.schema([("value", pa.string()), ("n", pa.int64())]),
        preserve_index=False))


def _cms_bucket(d: int, term: str, width: int) -> int:
    """Row-d CMS bucket: low 8 md5 bytes of "d:term" (little-endian,
    == DuckDB ``md5_number_lower(CAST(d AS VARCHAR) || ':' || term)``)
    mod width."""
    h = int.from_bytes(
        hashlib.md5(f"{d}:{term}".encode()).digest()[8:], "little")
    return h % width


def cms_sketch(docs: rd.Dataset, width: int = 1024,
               depth: int = 4) -> rd.Dataset:
    """Count-min sketch of corpus term frequencies (Cormode &
    Muthukrishnan 2005) as a distributed aggregate. Counters are SUMS,
    so per-batch partial sketches merge exactly by addition — the one
    groupby exchange moves <= depth*width rows per batch regardless of
    vocabulary size, the bounded-state answer to "count a 10^9-term
    vocabulary without shuffling it". Output: (d, b, c) counter cells
    (cells never touched stay absent == zero)."""
    from collections import Counter

    from .relational import partial_agg_sum
    from .text import _WS

    def partial(t: pa.Table) -> pa.Table:
        tc: Counter = Counter()
        for text in t.column("text").to_pylist():
            tc.update(_WS.sub(" ", (text or "")).strip().split(" "))
        cells: Counter = Counter()
        for term, n in tc.items():
            for d in range(depth):
                cells[(d, _cms_bucket(d, term, width))] += n
        ks = list(cells.keys())
        return pa.table({
            "d": pa.array([k[0] for k in ks], pa.int64()),
            "b": pa.array([k[1] for k in ks], pa.int64()),
            "c": pa.array([cells[k] for k in ks], pa.int64())})

    return partial_agg_sum(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["d", "b"], {"c": "c"})


def cms_frequent_estimates(docs: rd.Dataset, width: int = 1024,
                           depth: int = 4, min_count: int = 100,
                           num_partitions: "int | None" = None) -> rd.Dataset:
    """CMS point queries over the corpus's own frequent terms: build
    the sketch distributed, broadcast its depth*width cells ONCE, and
    evaluate est(term) = min_d cells[d][h_d(term)] for every term whose
    exact count >= min_count (the deterministic query set). est >= true
    count always (one-sided error); integer sums and md5 bucketing are
    reproduced verbatim by the SQL oracle. Output: (term, cms_count)."""
    import ray

    from .text import corpus_term_counts

    cells = cms_sketch(docs, width, depth).to_pandas()
    lut = {(int(d), int(b)): int(c)
           for d, b, c in zip(cells["d"], cells["b"], cells["c"])}
    ref = ray.put(lut)

    def est(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        out_t, out_e = [], []
        for term, n in zip(t.column("term").to_pylist(),
                           t.column("n").to_pylist()):
            if n < min_count:
                continue
            out_t.append(term)
            out_e.append(min(m.get((d, _cms_bucket(d, term, width)), 0)
                             for d in range(depth)))
        return pa.table({"term": pa.array(out_t, pa.string()),
                         "cms_count": pa.array(out_e, pa.int64())})

    return (corpus_term_counts(docs, num_partitions)
            .map_batches(est, batch_format="pyarrow"))


# -------------------------------------------------------------------------
# HyperLogLog (Flajolet-Fusy-Gandouet-Meunier 2007, public paper) —
# per-key approximate COUNT(DISTINCT) at m-register state per key
# -------------------------------------------------------------------------

def hll_distinct(ds: rd.Dataset, key: str, value_col: str, p: int = 6,
                 key_type: "pa.DataType | None" = None) -> rd.Dataset:
    """Per-key HLL distinct estimate.

    Hash = md5-high-64 of ``str(value)`` (the ``_h64`` convention the
    KMV sketch shares with its SQL oracle); bucket = top ``p`` bits;
    rank = leading zeros of the low ``64-p`` bits + 1. The register
    merge is max() — order-free — and the harmonic sum is computed as
    an EXACT integer (sum of 2^(rbits+1-M) over all m registers)
    before one float division, so the estimate is bit-for-bit
    reproducible in SQL (no float-accumulation order sensitivity).
    Small-range correction (linear counting) applies below 2.5m when
    empty registers remain; the 64-bit large-range correction is
    unreachable at any realistic cardinality and is omitted.

    Plan: per-batch (key, bucket) -> max-rank partial (<= m rows per
    key per batch — the value domain never moves), ONE groupby
    exchange, per-key finish. State per key is m registers anywhere.
    Output: (key, est_distinct: double).
    """
    import math

    m = 1 << p
    rbits = 64 - p
    low_mask = (1 << rbits) - 1
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1.0 + 1.079 / m))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[key, value_col]].drop_duplicates()
        regs: dict = {}
        for kv, v in zip(d[key], d[value_col]):
            h = _h64(str(v))
            bucket = h >> rbits
            rem = h & low_mask
            rank = rbits - rem.bit_length() + 1
            cur = regs.get((kv, bucket), 0)
            if rank > cur:
                regs[(kv, bucket)] = rank
        if not regs:
            return pd.DataFrame({key: pd.Series([], dtype=d[key].dtype),
                                 "bucket": pd.Series([], dtype="int64"),
                                 "r": pd.Series([], dtype="int64")})
        ks, bs, rs = zip(*((kv, b, r) for (kv, b), r in regs.items()))
        return pd.DataFrame({key: list(ks), "bucket": bs, "r": rs})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out_k, out_e = [], []
        for kv, grp in g.groupby(key, sort=True):
            mr = grp.groupby("bucket")["r"].max()
            nb = len(mr)
            s = int(sum(1 << (rbits + 1 - int(r)) for r in mr))
            s += (m - nb) * (1 << (rbits + 1))
            est = alpha * m * m * 2.0 ** (rbits + 1) / float(s)
            zeros = m - nb
            if est <= 2.5 * m and zeros > 0:
                est = m * math.log(m / zeros)
            out_k.append(kv)
            out_e.append(est)
        return pd.DataFrame({key: out_k, "est_distinct": out_e})

    kt = key_type or pa.string()
    partials = ds.map_batches(
        lambda t: pa.Table.from_pandas(partial(t.to_pandas()),
                                       preserve_index=False),
        batch_format="pyarrow")
    return typed_groupby_map(
        partials, key, final,
        out_schema=pa.schema([(key, kt), ("est_distinct", pa.float64())]))


def cms_join_size(left: rd.Dataset, left_col: str, right: rd.Dataset,
                  right_col: str, width: int = 8192,
                  depth: int = 4) -> pa.Table:
    """Equi-join cardinality estimate from two count-min sketches
    (Cormode & Muthukrishnan 2005 §4.2, public paper): |A join B| is
    estimated by min over rows d of the bucket-wise dot product
    sum_b cmsA[d,b]*cmsB[d,b] — an OVERestimate that tightens as width
    grows, never an underestimate. The planner-side trick: both inputs
    reduce to depth*width counters via per-batch combiners, the dot is
    one co-partitioned (d,b) join plus a depth-row aggregate — the
    tables themselves never join. Integer-exact, so the estimate is
    bit-for-bit SQL-reproducible. Returns a 1-row table
    (est_join_size: int64)."""
    from .relational import hash_join, partial_agg_sum

    a = value_cms(left.select_columns([left_col])
                  .map_batches(lambda t: t.rename_columns(["v"]),
                               batch_format="pyarrow"),
                  "v", width, depth)
    b = value_cms(right.select_columns([right_col])
                  .map_batches(lambda t: t.rename_columns(["v"]),
                               batch_format="pyarrow"),
                  "v", width, depth)
    b = b.map_batches(lambda t: t.rename_columns(["d", "b", "c2"]),
                      batch_format="pyarrow")
    j = hash_join(
        a, b, on=["d", "b"],
        left_schema=pa.schema([("d", pa.int64()), ("b", pa.int64()),
                               ("c", pa.int64())]),
        right_schema=pa.schema([("d", pa.int64()), ("b", pa.int64()),
                                ("c2", pa.int64())]))

    def dot(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "d": t.column("d"),
            "prod": pc.multiply(pc.cast(t.column("c"), pa.int64()),
                                pc.cast(t.column("c2"), pa.int64()))})

    dots = partial_agg_sum(j.map_batches(dot, batch_format="pyarrow"),
                           "d", {"prod": "dot"}).to_pandas()   # depth rows
    # a depth row with NO overlapping buckets is absent from the inner
    # join — its true dot product is 0, so the min over depth is 0
    # (Cormode-Muthukrishnan's estimator would return 0 on disjoint
    # keys); without this, min() over only the surviving rows could
    # report a positive size for a provably-empty join
    est = int(dots["dot"].min()) if len(dots) == depth else 0
    return pa.table({"est_join_size": pa.array([est], pa.int64())})

"""Deterministic sampling / split operators for training-data prep.

Split assignment must be a pure function of the record id — never of
row order, block boundaries, or worker count — so that (a) re-runs and
resumed runs agree, (b) the same doc lands in the same split when the
corpus is re-sharded, and (c) an independent system (the DuckDB
oracle) can recompute the assignment. The bucket hash is the low 8
md5 digest bytes of ``str(id)`` little-endian — exactly DuckDB's
``md5_number_lower(CAST(id AS VARCHAR))``.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data as rd


def _bucket(val, n_buckets: int) -> int:
    h = hashlib.md5(str(val).encode()).digest()
    return int.from_bytes(h[8:], "little") % n_buckets


def hash_split(ds: rd.Dataset, id_col: str,
               splits: list[tuple[str, int]] | None = None,
               n_buckets: int = 100) -> rd.Dataset:
    """Append a ``split`` column by hashing ``id_col`` into
    ``n_buckets`` buckets and mapping contiguous bucket ranges to named
    splits. Default: 80/10/10 train/val/test. Stateless map — no
    shuffle, no sampling state, reproducible in SQL."""
    splits = splits or [("train", 80), ("val", 10), ("test", 10)]
    if sum(w for _, w in splits) != n_buckets:
        raise ValueError("split weights must sum to n_buckets")
    bounds = []
    lo = 0
    for name, w in splits:
        bounds.append((name, lo, lo + w))
        lo += w

    def f(t: pa.Table) -> pa.Table:
        out = []
        for v in t.column(id_col).to_pylist():
            b = _bucket(v, n_buckets)
            out.append(next(n for n, a, z in bounds if a <= b < z))
        return t.append_column("split", pa.array(out, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_sample(ds: rd.Dataset, id_col: str, stratum_col: str,
                      rates: dict[str, float], default: float = 0.0,
                      n_buckets: int = 10_000) -> rd.Dataset:
    """Per-stratum deterministic sampling rates (class rebalancing /
    language up-down-sampling for training mixes). Keep a row iff its
    id-hash bucket falls below ``rates[stratum] * n_buckets``; strata
    absent from ``rates`` use ``default``. Stateless map — no shuffle,
    no global pass over the stratum histogram; the assignment is a pure
    function of the id so re-runs, re-shards and the SQL oracle agree."""
    cuts = {s: int(r * n_buckets) for s, r in rates.items()}
    default_cut = int(default * n_buckets)

    def f(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        strata = t.column(stratum_col).to_pylist()
        mask = pa.array([_bucket(v, n_buckets) < cuts.get(s, default_cut)
                         for v, s in zip(ids, strata)])
        return t.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


def hash_sample(ds: rd.Dataset, id_col: str, frac: float,
                n_buckets: int = 10_000) -> rd.Dataset:
    """Deterministic ~frac sample: keep rows whose id-hash bucket falls
    below frac * n_buckets. Unlike ``Dataset.random_sample`` the
    selection is stable across runs, shard counts and engines."""
    cut = int(frac * n_buckets)

    def f(t: pa.Table) -> pa.Table:
        mask = pa.array([_bucket(v, n_buckets) < cut
                         for v in t.column(id_col).to_pylist()])
        return t.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


def _hash64(val) -> int:
    """Full 64-bit id hash (low 8 md5 digest bytes, little-endian) —
    the un-bucketed value of DuckDB ``md5_number_lower(CAST(id AS
    VARCHAR))``, used where the ORDER over hashes matters."""
    return int.from_bytes(hashlib.md5(str(val).encode()).digest()[8:],
                          "little")


def per_group_sample(ds: rd.Dataset, group_col: str, id_col: str, k: int,
                     schema: "pa.Schema") -> rd.Dataset:
    """Deterministic uniform k-per-group sample: rank rows inside each
    group by (id-hash, id) and keep the k smallest — the distributed
    equivalent of per-key reservoir sampling, but a pure function of
    the ids (reshard/rerun-stable, SQL-reproducible as
    ``row_number() OVER (PARTITION BY g ORDER BY md5_number_lower(id),
    id) <= k``).

    Plan: per-batch local top-k per group (combiner) so the ONE
    groupby shuffle moves at most k rows per (group, batch); the
    finish re-ranks the k*batches survivors per group. ``schema`` =
    the input schema (pass it explicitly — probing a lazy upstream
    would execute it twice)."""
    import numpy as np

    from .relational import typed_groupby_map

    def local(df: "pd.DataFrame") -> "pd.DataFrame":
        h = np.fromiter((_hash64(v) for v in df[id_col]),
                        dtype=np.uint64, count=len(df))
        return (df.assign(_h=h)
                .sort_values(["_h", id_col], kind="stable")
                .groupby(group_col, as_index=False, sort=False).head(k))

    def final(g: "pd.DataFrame") -> "pd.DataFrame":
        return (g.sort_values(["_h", id_col], kind="stable").head(k)
                .drop(columns=["_h"]))

    partials = ds.map_batches(local, batch_format="pandas")
    return typed_groupby_map(partials, group_col, final, schema)


def temperature_sample(ds: rd.Dataset, stratum_col: str, id_col: str,
                       alpha: float = 0.5,
                       n_buckets: int = 10_000) -> rd.Dataset:
    """Temperature-based mixture resampling (the multilingual /
    multi-source training-mix flattener, e.g. mBERT/XLM-R exponent
    smoothing): downsample each stratum so the kept mix follows
    p_s^alpha. Keep rate per stratum = (n_min / n_s)^(1-alpha) — 1.0
    for the rarest stratum, < 1 for dominant ones.

    Pass 1 aggregates stratum counts (combiner + tiny groupby -> one
    row per stratum on the driver). Pass 2 is a stateless id-hash
    filter: keep iff bucket(id) < rate * n_buckets, compared in FLOAT
    (no integer truncation) so an SQL engine reproduces the boundary.
    For the default alpha = 0.5 the rate is sqrt(n_min/n_s): IEEE sqrt
    is correctly rounded, making the cut bit-for-bit SQL-reproducible;
    other alphas go through pow (last-ulp parity not guaranteed)."""
    import math

    from .relational import partial_agg_sum

    def ones(t: pa.Table) -> pa.Table:
        import numpy as np
        return pa.table({stratum_col: t.column(stratum_col),
                         "one": pa.array(np.ones(t.num_rows,
                                                 dtype=np.int64))})

    counts = partial_agg_sum(
        ds.select_columns([stratum_col]).map_batches(
            ones, batch_format="pyarrow"),
        stratum_col, {"one": "n"}).to_pandas()
    n_min = int(counts["n"].min())
    rates = {}
    for s, n in zip(counts[stratum_col], counts["n"]):
        q = n_min / float(n)
        rates[s] = math.sqrt(q) if alpha == 0.5 else q ** (1.0 - alpha)

    def f(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        strata = t.column(stratum_col).to_pylist()
        mask = pa.array([_bucket(v, n_buckets) < rates[s] * n_buckets
                         for v, s in zip(ids, strata)])
        return t.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


def global_hash_shuffle(ds: rd.Dataset, id_col: str,
                        n_buckets: int = 8192,
                        id_type: "pa.DataType | None" = None
                        ) -> rd.Dataset:
    """Deterministic global training-order shuffle: assign every row
    its rank in (id-hash, id) order — the reproducible corpus
    shuffle a training run needs (same order on re-run, re-shard, or
    resume; SQL ``row_number() OVER (ORDER BY md5_number_lower(id),
    id) - 1``).

    Distributed rank without a global sort-limit: the top bits of the
    hash give an ORDER-PRESERVING bucket (h sorted <=> (bucket, h)
    sorted), and hashes are uniform so buckets are balanced with no
    sampling/range-boundary step. Per-bucket counts (combiner) -> tiny
    prefix-sum on the driver -> broadcast -> per-bucket local sort +
    offset. The only exchange is the bucket groupby. Output (id,
    shuffle_rank); ``id_type`` declares the id column's Arrow type
    (default int64)."""
    import numpy as np
    import ray

    from .relational import partial_agg_sum, typed_groupby_map

    shift = 64 - (n_buckets - 1).bit_length()

    def hashed(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        h = np.fromiter((_hash64(v) for v in ids), dtype=np.uint64,
                        count=len(ids))
        return pa.table({id_col: t.column(id_col),
                         "_h": pa.array(h, pa.uint64()),
                         "_bucket": pa.array(
                             (h >> shift).astype(np.int64), pa.int64()),
                         "_one": pa.array(np.ones(len(ids), np.int64))})

    hds = ds.select_columns([id_col]).map_batches(
        hashed, batch_format="pyarrow")
    counts = partial_agg_sum(hds, "_bucket", {"_one": "n"}).to_pandas()
    counts = counts.sort_values("_bucket")
    prefix = dict(zip(counts["_bucket"],
                      counts["n"].cumsum() - counts["n"]))
    ref = ray.put(prefix)

    def rank(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd
        offs = ray.get(ref)
        g = g.sort_values(["_h", id_col], kind="stable")
        start = int(offs[g["_bucket"].iloc[0]])
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "shuffle_rank": np.arange(start, start + len(g),
                                      dtype=np.int64)})

    return typed_groupby_map(
        hds, "_bucket", rank,
        pa.schema([(id_col, id_type or pa.int64()),
                   ("shuffle_rank", pa.int64())]))


def weighted_sample_k(ds: rd.Dataset, id_col: str, weight_col: str,
                      k: int) -> rd.Dataset:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis
    & Spirakis 2006, algorithm A-ES): each row gets
    ``skey = u ** (1/w)`` with ``u`` a pure md5 function of the id
    (never of row order), and the k LARGEST keys are exactly a
    w-weighted sample without replacement — the importance-weighted
    data-selection step of a training-mix pipeline.

    Distributed as the ``top_n`` plan: per-block top-k prune, then a
    tiny sort+limit over <= k rows per block — no global sort, no
    sampling state. Reproducible in SQL: u = (CAST(md5_number_lower(id)
    AS DOUBLE) + 1.0) / 2^64 and pow evaluate the same IEEE expression
    in DuckDB. Ties (measure-zero) break by id asc. Output:
    (id, weight, skey)."""
    import numpy as np

    from .relational import top_n

    def add_key(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        w = np.asarray(t.column(weight_col).to_pylist(), dtype=np.float64)
        if len(w) and (not np.isfinite(w).all() or (w <= 0).any()):
            # A-ES requires w > 0: u**(1/w) with w<0 outranks every valid
            # row (u^negative > 1) and w=0 leans on IEEE inf semantics
            bad = w[~(np.isfinite(w) & (w > 0))][:3]
            raise ValueError(
                f"weighted_sample_k: weight_col {weight_col!r} must be "
                f"finite and > 0 (saw {bad.tolist()}); filter or clamp "
                "non-positive weights upstream")
        h = np.array([int.from_bytes(
            hashlib.md5(str(v).encode()).digest()[8:], "little")
            for v in ids], dtype=np.uint64)
        u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
        skey = u ** (1.0 / w)
        return pa.table({id_col: t.column(id_col),
                         weight_col: t.column(weight_col),
                         "skey": pa.array(skey, pa.float64())})

    return top_n(ds.map_batches(add_key, batch_format="pyarrow"),
                 ["skey", id_col], [False, True], k)


# -------------------------------------------------------------------------
# Training-mixture apportionment (static data mixing: fixed per-source
# target proportions, largest-remainder rounding, deterministic
# hash-ordered selection — the corpus-mixing step in front of
# tokenize/pack)
# -------------------------------------------------------------------------

def mixture_quotas(counts: "dict[str, int]", weights: "dict[str, float]",
                   total: int) -> "dict[str, int]":
    """Largest-remainder apportionment of ``total`` rows across keys
    proportional to ``weights``, capped at each key's availability.
    Ties on the fractional part break by key ascending. Pure driver
    math over one row per key."""
    keys = sorted(weights)
    W = float(sum(weights[k] for k in keys))
    quota = {k: weights[k] * total / W for k in keys}
    base = {k: int(quota[k]) for k in keys}
    rem = total - sum(base.values())
    by_frac = sorted(keys, key=lambda k: (-(quota[k] - base[k]), k))
    for k in by_frac[:rem]:
        base[k] += 1
    return {k: min(base[k], counts.get(k, 0)) for k in keys}


def mixture_sample(ds: rd.Dataset, key_col: str, weights: "dict[str, float]",
                   total: int, id_col: str) -> rd.Dataset:
    """Select ~``total`` rows matching the target mixture: per-key
    quotas via ``mixture_quotas`` (needs only one count row per key on
    the driver — a combiner aggregate, never the data), then each
    key's quota filled by the deterministic hash order
    (md5(str(id)), id) — the ``doc_hash_sample`` convention, so the
    selection is stable under any partitioning and reproducible in
    SQL. One key exchange. Keys short on rows keep what they have (no
    redistribution; the shortfall is visible in the output counts)."""
    import hashlib

    from .relational import partial_agg_sum, typed_groupby_map

    def ones(t: pa.Table) -> pa.Table:
        return pa.table({key_col: t.column(key_col),
                         "one": pa.nulls(t.num_rows,
                                         pa.int64()).fill_null(1)})

    cnt = partial_agg_sum(
        ds.select_columns([key_col]).map_batches(ones,
                                                 batch_format="pyarrow"),
        key_col, {"one": "n"}).to_pandas()
    counts = dict(zip(cnt[key_col], cnt["n"].astype(int)))
    quotas = mixture_quotas(counts, weights, total)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        k = quotas.get(g[key_col].iloc[0], 0)
        if not k:
            return g.iloc[0:0][[id_col, key_col]]
        h = g[id_col].map(lambda v: hashlib.md5(
            str(v).encode()).hexdigest())
        g = g.assign(_h=h).sort_values(["_h", id_col], kind="stable")
        return g.head(k)[[id_col, key_col]]

    return typed_groupby_map(
        ds.select_columns([id_col, key_col]), key_col, pick,
        out_schema=pa.schema([(id_col, pa.int64()),
                              (key_col, pa.string())]))

"""Relational helpers: grouped argmax (the distributed generalization of
the reference's per-cell winner selection C8), partial-aggregate
groupby (combiner-before-shuffle), normalized-key canonicalization
counts, and time-bucketed aggregation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..normalize import normalize_entry


def auto_partitions(min_p: int = 16, per_cpu: int = 2,
                    cap: int = 4096) -> int:
    """Default partition count for the explicit hash exchanges
    (hash_join / hash_aggregate / grouped_* / annotate_stage):
    ``per_cpu`` tasks per CLUSTER CPU (pipelining headroom over
    stragglers), floored at ``min_p`` and capped at ``cap``. Derived
    from ``ray.cluster_resources()`` at call time — on a 256-node
    cluster the same pipeline code auto-widens its exchanges instead
    of funneling through a constant sized for one box. Callers can
    always pass an explicit ``num_partitions`` to override."""
    cpus = 0
    try:
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    if cpus <= 0:
        import os
        cpus = os.cpu_count() or 8
    return max(min_p, min(cap, per_cpu * cpus))


def _resolve_partitions(num_partitions: "int | None") -> int:
    return num_partitions if num_partitions else auto_partitions()


def _arrow_type(t) -> "pa.DataType":
    """Normalize a Ray Schema type entry to an Arrow DataType. Ray
    reports numpy dtypes for pandas-block datasets; object columns are
    strings in every caller here."""
    if isinstance(t, pa.DataType):
        return t
    dt = np.dtype(t)
    if dt == np.dtype(object):
        return pa.string()
    return pa.from_numpy_dtype(dt)


def _nullable_dtype(t: "pa.DataType"):
    # NULLABLE pandas dtypes: input columns may carry genuine nulls
    # (e.g. union-padded parquet), which numpy int/bool astype cannot
    # represent; the typed output schema converts them back to arrow
    # nulls at the end
    if pa.types.is_integer(t):
        return str(t).capitalize().replace("Uint", "UInt")   # Int64 etc.
    if pa.types.is_boolean(t):
        return "boolean"
    return t.to_pandas_dtype()


def _pad_filler(n: int, dtype: "pa.DataType") -> pa.Array:
    """Cross-side filler column for the tagged-union join shape.

    Integer/bool columns are padded with ZEROS, not nulls: the merge
    UDF splits rows by ``_side`` and reads only each side's OWN columns,
    so the filler value is never observed — but a null-carrying int64
    column that takes ANY pandas round-trip inside Ray's sort/groupby
    machinery widens to float64 and silently rounds values above 2^53
    (63-bit hash ids, snowflake keys). Zero-padding keeps every int
    column null-free end-to-end, so any internal conversion is exact.
    Float/string/other types are lossless under pandas nulls and keep
    null padding."""
    if pa.types.is_boolean(dtype):
        return pa.array(np.zeros(n, dtype=bool))
    if pa.types.is_integer(dtype):
        return pa.array(np.zeros(n, dtype=np.int64)).cast(dtype)
    return pa.nulls(n, dtype)


_NULLABLE_INT_MAP = {
    pa.int8(): pd.Int8Dtype(), pa.int16(): pd.Int16Dtype(),
    pa.int32(): pd.Int32Dtype(), pa.int64(): pd.Int64Dtype(),
    pa.uint8(): pd.UInt8Dtype(), pa.uint16(): pd.UInt16Dtype(),
    pa.uint32(): pd.UInt32Dtype(), pa.uint64(): pd.UInt64Dtype(),
}


def typed_groupby_map(ds: rd.Dataset, key, fn, out_schema: "pa.Schema",
                      exact_ints: bool = False, **map_kwargs) -> rd.Dataset:
    """``groupby(key).map_groups`` with a pandas UDF and a TYPED output.

    Ray's pandas block builder finalizes an all-empty partition to a
    column-less ``pd.DataFrame()`` — a schema-less block that trips the
    streaming executor's schema checks downstream ("PandasBlockSchema
    (names=[])" warnings) and is a schema-inference hazard. Running the
    group stage in Arrow format and casting the UDF's frame to an
    explicit schema keeps every block, including empty ones, typed.

    ``exact_ints=True`` converts integer columns to pandas NULLABLE int
    dtypes instead of the default conversion, which widens null-carrying
    int columns to float64 and silently ROUNDS values above 2^53 — fatal
    for 63-bit hash ids / snowflake keys flowing through a null-padded
    union (the hash_join shape). Opt-in because plain-numpy UDFs are the
    norm everywhere else.
    """
    def wrapper(t: pa.Table) -> pa.Table:
        if exact_ints:
            out = fn(t.to_pandas(types_mapper=_NULLABLE_INT_MAP.get))
        else:
            out = fn(t.to_pandas())
        result = pa.Table.from_pandas(out[out_schema.names], schema=out_schema,
                                      preserve_index=False)
        # strip the embedded pandas metadata: it would make downstream
        # to_pandas() resurrect nullable extension dtypes (Int64Dtype
        # etc.) instead of the plain numpy dtypes every other path emits
        return result.replace_schema_metadata(None)

    return ds.groupby(key).map_groups(wrapper, batch_format="pyarrow",
                                      **map_kwargs)


def grouped_argmax(ds: rd.Dataset, key: str, order_col: str, tie_col: str,
                   out_cols: list[str],
                   num_partitions: "int | None" = None) -> rd.Dataset:
    """Top-1 row per key by (order_col desc, tie_col asc) — deterministic
    tie-break, like C8's insertion-order rule but made order-insensitive
    for distributed execution (SURVEY.md §7.4 item 3).

    Partitioned plan: each batch keeps its local top-1 per key
    (combiner — the shuffle moves one row per (key, batch)), the
    exchange partitions on ``hash(key) % P``, and one vectorized sort +
    drop_duplicates finishes each partition. Ray's native per-group
    ``map_groups`` pays per-group overhead that dominates at high key
    cardinality (measured ~10s vs ~1s at 1.5k keys / 100k rows)."""
    carry = list(dict.fromkeys([key, order_col, tie_col] + out_cols))
    num_partitions = _resolve_partitions(num_partitions)

    def local_top1(df: pd.DataFrame) -> pd.DataFrame:
        g = (df[carry].sort_values([order_col, tie_col],
                                   ascending=[False, True], kind="stable")
             .drop_duplicates(key))
        h = pd.util.hash_pandas_object(g[key], index=False)
        return g.assign(_part=(h % num_partitions).astype("int64"))

    def final_top1(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values([order_col, tie_col],
                              ascending=[False, True], kind="stable")
                .drop_duplicates(key))[out_cols]

    return (ds.map_batches(local_top1, batch_format="pandas")
            .groupby("_part").map_groups(final_top1, batch_format="pandas"))


def partial_agg_sum(ds: rd.Dataset, key: "str | list[str]",
                    sum_cols: dict[str, str],
                    count_alias: str | None = None) -> rd.Dataset:
    """groupby(key) with per-batch pre-aggregation: each batch combines
    locally first, so the shuffle moves one row per (key, batch) instead
    of every input row (SURVEY.md §2.6 / ray_guide 'Aggregation at
    scale'). ``sum_cols``: {input_col: output_alias}; ``key`` may be a
    single column or a composite key list."""
    from ray.data.aggregate import Sum

    keys = [key] if isinstance(key, str) else list(key)
    in_cols = list(sum_cols)

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(keys + in_cols).to_pandas()
        agg = {c: "sum" for c in in_cols}
        g = df.groupby(keys, as_index=False).agg(agg)
        if count_alias:
            g[count_alias] = df.groupby(keys, as_index=False).size()["size"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    aggs = [Sum(c, alias_name=alias) for c, alias in sum_cols.items()]
    if count_alias:
        aggs.append(Sum(count_alias, alias_name=count_alias))
    return partials.groupby(key).aggregate(*aggs)


def normalized_key_counts(ds: rd.Dataset, col: str, id_col: str) -> rd.Dataset:
    """Canonicalization-style groupby: normalize ``col`` with the M1
    parity function, count members and keep min(id) representative."""
    from ray.data.aggregate import Count, Min

    def add_norm(t: pa.Table) -> pa.Table:
        vals = [normalize_entry(v) for v in t.column(col).to_pylist()]
        return pa.table({"norm_key": pa.array(vals, pa.string()),
                         id_col: t.column(id_col)})

    return (ds.map_batches(add_norm, batch_format="pyarrow")
            .groupby("norm_key")
            .aggregate(Min(id_col, alias_name="rep_id"),
                       Count(alias_name="n_members")))


def hash_aggregate(ds: rd.Dataset, keys: list[str], sum_cols: dict[str, str],
                   count_alias: str | None = None,
                   num_partitions: "int | None" = None,
                   out_schema: "pa.Schema | None" = None) -> rd.Dataset:
    """Explicit partitioned hash-aggregate for HIGH-cardinality keys.

    Ray's native sort-based ``groupby().aggregate`` pays per-group
    overhead, which dominates when #groups ~ #rows; this plan instead
    (1) pre-aggregates each batch with a vectorized pandas groupby
    (combiner), (2) shuffles on ``part = hash(keys) % P`` so the wide
    exchange has P partitions regardless of key cardinality, and
    (3) finishes each partition with one vectorized pandas groupby.
    Deterministic (pd.util.hash_pandas_object with the fixed default
    hash key). This is the guide's 'explicit partitioned hash join'
    shape applied to aggregation.
    """
    in_cols = list(sum_cols)
    num_partitions = _resolve_partitions(num_partitions)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, as_index=False)[in_cols].sum()
        if count_alias:
            g[count_alias] = df.groupby(keys, as_index=False).size()["size"].astype("int64")
        h = pd.util.hash_pandas_object(g[keys].astype(str).agg("|".join, axis=1),
                                       index=False)
        g["part"] = (h % num_partitions).astype("int64")
        return g

    def final(g: pd.DataFrame) -> pd.DataFrame:
        agg_cols = in_cols + ([count_alias] if count_alias else [])
        out = g.groupby(keys, as_index=False)[agg_cols].sum()
        return out.rename(columns=sum_cols)

    partials = ds.map_batches(partial, batch_format="pandas")
    if out_schema is not None:
        return typed_groupby_map(partials, "part", final, out_schema)
    return partials.groupby("part").map_groups(final, batch_format="pandas")


def hash_min(ds: rd.Dataset, keys: list[str], min_cols: dict[str, str],
             num_partitions: "int | None" = None,
             out_schema: "pa.Schema | None" = None) -> rd.Dataset:
    """:func:`hash_aggregate` with MIN combining instead of SUM — the
    same combiner-backed two-level plan (per-batch local min, one
    ``hash(keys) % P`` exchange, per-partition final min), so the
    shuffle moves one row per (key, batch). Used by iterative
    closure/shortest-path shapes where per-round dedup is min-depth,
    not a count. ``min_cols``: {input_col: output_alias}."""
    in_cols = list(min_cols)
    num_partitions = _resolve_partitions(num_partitions)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, as_index=False)[in_cols].min()
        h = pd.util.hash_pandas_object(
            g[keys].astype(str).agg("|".join, axis=1), index=False)
        g["part"] = (h % num_partitions).astype("int64")
        return g

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(keys, as_index=False)[in_cols].min()
        return out.rename(columns=min_cols)

    partials = ds.map_batches(partial, batch_format="pandas")
    if out_schema is not None:
        return typed_groupby_map(partials, "part", final, out_schema)
    return partials.groupby("part").map_groups(final, batch_format="pandas")


def hash_join(left: rd.Dataset, right: rd.Dataset,
              on: "str | list[str]",
              how: str = "inner", num_partitions: "int | None" = None,
              left_schema=None, right_schema=None,
              skew_threshold: "int | None" = None,
              skew_salt: int = 8) -> rd.Dataset:
    """Co-partitioned hash join of two Datasets on one key column or a
    COMPOSITE key (``on`` a list; the partition hash combines all key
    columns row-wise).

    Plan: tag each side, pad both to the union schema (typed nulls),
    union the streams, ONE shuffle on ``hash(key) % P``, then a
    vectorized pandas merge inside each partition. This is the explicit
    distributed-join shape — no driver materialization, no fixed
    aggregator-actor pool (Ray's native ``Dataset.join`` hash-shuffle
    spawns one, measured slower at small/medium scale on this plan).
    Non-key column names must be disjoint. ``how``: inner | left |
    outer (full) | semi | anti (semi/anti emit LEFT columns only — the
    big-big existence filter; for a SMALL right side use
    ``broadcast_filter_join`` and skip the shuffle entirely).

    Pass ``left_schema``/``right_schema`` (pyarrow.Schema) whenever the
    input is a lazy transformed dataset: without them ``ds.schema()``
    must EXECUTE the upstream plan to infer types (and any upstream
    shuffle runs twice — once for the probe, once for real).

    **Hot-key handling** (the ``canonicalize.py`` salting pattern
    generalized to joins): with ``skew_threshold=N`` set, a distributed
    key-count pre-pass finds keys whose total row count exceeds N; each
    hot key's LEFT rows are salted across ``skew_salt`` sub-partitions
    and its RIGHT rows replicated into every sub-partition, so no merge
    task ever holds a hot key's full left side. Supported for
    inner/left/semi/anti (full outer would emit one null-left row per
    replica for an unmatched right row — raises). Costs one extra pass
    (the padded union is materialized to avoid re-running upstream
    stages); leave unset for known-balanced keys.
    """
    import pyarrow as pa

    num_partitions = _resolve_partitions(num_partitions)
    if skew_threshold is not None and how == "outer":
        raise ValueError("skew_threshold is not supported for how='outer': "
                         "replicated right rows cannot express full-outer "
                         "right-null semantics; pre-split the hot keys or "
                         "use how='left' + an anti-join for the right rest")

    def _names_types(ds, given):
        if given is not None:
            return list(given.names), {n: given.field(n).type for n in given.names}
        s = ds.schema()
        return list(s.names), {n: _arrow_type(t) for n, t in zip(s.names, s.types)}

    on_cols = [on] if isinstance(on, str) else list(on)
    l_names, l_types = _names_types(left, left_schema)
    r_names, r_types = _names_types(right, right_schema)
    l_other = [n for n in l_names if n not in on_cols]
    r_other = [n for n in r_names if n not in on_cols]
    if how in ("semi", "anti"):
        # existence checks need only the right KEYS; don't ship payload
        # columns through the shuffle, and dedupe keys batch-locally
        # (combiner) so the exchange moves distinct keys per batch
        right = right.select_columns(on_cols).map_batches(
            lambda t: t.group_by(on_cols).aggregate([]),
            batch_format="pyarrow")
        r_other = []

    overlap = set(l_other) & set(r_other)
    if overlap:
        raise ValueError(f"hash_join column overlap: {sorted(overlap)}")
    fields = ([pa.field(c, l_types[c]) for c in on_cols]
              + [pa.field(n, l_types[n]) for n in l_other]
              + [pa.field(n, r_types[n]) for n in r_other]
              + [pa.field("_side", pa.int8())])
    schema = pa.schema(fields)
    # dtype restore maps: arrow->pandas conversion of null-padded int
    # columns widens to float64/object; cast back (nullable) after the
    # side split so the merge keys/values keep exact integer semantics
    l_dtypes = {n: _nullable_dtype(l_types[n]) for n in l_other}
    r_dtypes = {n: _nullable_dtype(r_types[n]) for n in r_other}

    def pad(side: int, own: list[str]):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            arrays = []
            for fld in schema:
                if fld.name == "_side":
                    arrays.append(pa.array(np.full(n, side, dtype=np.int8)))
                elif fld.name in on_cols or fld.name in own:
                    arrays.append(t.column(fld.name).cast(fld.type))
                else:
                    arrays.append(_pad_filler(n, fld.type))
            return pa.Table.from_arrays(arrays, schema=schema)
        return f

    both = (left.map_batches(pad(0, l_other), batch_format="pyarrow")
            .union(right.map_batches(pad(1, r_other), batch_format="pyarrow")))

    hot_ref = None
    if skew_threshold is not None:
        import ray

        # one extra pass over the (materialized) union: per-batch key
        # counts -> distributed merge -> the driver collects ONLY the
        # keys above the threshold (bounded by the hot-key count)
        both = both.materialize()

        def key_counts(t: pa.Table) -> pa.Table:
            g = t.select(on_cols).group_by(on_cols).aggregate(
                [([], "count_all")])
            names = [n if n != "count_all" else "n" for n in g.column_names]
            return g.rename_columns(names)

        def only_hot(t: pa.Table, th=skew_threshold) -> pa.Table:
            import pyarrow.compute as pc
            return t.filter(pc.greater(t["n"], th))

        hot_rows = (hash_aggregate(
            both.map_batches(key_counts, batch_format="pyarrow"),
            on_cols, {"n": "n"}, num_partitions=num_partitions)
            .map_batches(only_hot, batch_format="pyarrow").take_all())
        if len(hot_rows) > 100_000:
            raise ValueError(
                f"hash_join: {len(hot_rows)} keys exceed "
                f"skew_threshold={skew_threshold}; that is not skew — "
                "raise the threshold or repartition wider")
        if hot_rows:
            hot_index = {
                (r[on_cols[0]] if len(on_cols) == 1
                 else tuple(r[c] for c in on_cols)): i
                for i, r in enumerate(hot_rows)}
            hot_ref = ray.put(hot_index)

    # _part is computed in ARROW format: only the (null-free) key
    # columns are converted to pandas for the deterministic hash, so
    # union-padded int columns never pass through the lossy default
    # int-with-nulls -> float64 conversion (exact for ids > 2^53)
    def add_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_part", pa.array([], pa.int64()))
        keys_pd = t.select(on_cols).to_pandas()
        keys = keys_pd[on_cols[0]] if len(on_cols) == 1 else keys_pd
        part = (pd.util.hash_pandas_object(keys, index=False)
                % num_partitions).astype("int64").to_numpy()
        if hot_ref is None:
            return t.append_column("_part", pa.array(part, pa.int64()))
        import ray
        hot_index = ray.get(hot_ref)
        kv = (keys_pd[on_cols[0]] if len(on_cols) == 1
              else pd.Series(list(zip(*(keys_pd[c] for c in on_cols))),
                             index=keys_pd.index))
        hid = kv.map(hot_index)
        is_hot = hid.notna().to_numpy()
        if not is_hot.any():
            return t.append_column("_part", pa.array(part, pa.int64()))
        part = part.copy()
        base = (num_partitions
                + hid.fillna(0).astype("int64").to_numpy() * skew_salt)
        side = t.column("_side").to_numpy(zero_copy_only=False)
        left_hot = is_hot & (side == 0)
        right_hot = is_hot & (side == 1)
        # LEFT rows: spread across the key's salt sub-partitions (which
        # salt a row lands on is irrelevant to the output set)
        n_lh = int(left_hot.sum())
        if n_lh:
            part[left_hot] = (
                base[left_hot] + np.arange(n_lh, dtype=np.int64) % skew_salt)
        # RIGHT rows: replicate into every salt sub-partition
        n_rh = int(right_hot.sum())
        if not n_rh:
            return t.append_column("_part", pa.array(part, pa.int64()))
        keep_idx = np.nonzero(~right_hot)[0]
        rep_idx = np.repeat(np.nonzero(right_hot)[0], skew_salt)
        out = t.take(pa.array(np.concatenate([keep_idx, rep_idx]),
                              pa.int64()))
        rep_part = (np.repeat(base[right_hot], skew_salt)
                    + np.tile(np.arange(skew_salt, dtype=np.int64), n_rh))
        return out.append_column(
            "_part", pa.array(np.concatenate([part[keep_idx], rep_part]),
                              pa.int64()))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lhs = g[g["_side"] == 0][on_cols + l_other]
        rhs = g[g["_side"] == 1][on_cols + r_other]
        if l_dtypes:
            lhs = lhs.astype(l_dtypes)
        if how in ("semi", "anti"):
            if len(on_cols) == 1:
                keep = lhs[on_cols[0]].isin(rhs[on_cols[0]].unique())
            else:
                m = lhs.merge(rhs[on_cols].drop_duplicates(), on=on_cols,
                              how="left", indicator="_m")
                keep = (m["_m"] == "both").to_numpy()
            return lhs[keep if how == "semi" else ~keep]
        if r_dtypes and how in ("inner", "outer"):
            rhs = rhs.astype(r_dtypes)
        return lhs.merge(rhs, on=on_cols, how=how)

    if how in ("semi", "anti"):
        out_schema = pa.schema(
            [pa.field(c, l_types[c]) for c in on_cols]
            + [pa.field(n, l_types[n]) for n in l_other])
    else:
        out_schema = pa.schema(
            [pa.field(c, l_types[c]) for c in on_cols]
            + [pa.field(n, l_types[n]) for n in l_other]
            + [pa.field(n, r_types[n]) for n in r_other])
    return typed_groupby_map(
        both.map_batches(add_part, batch_format="pyarrow"), "_part", merge,
        out_schema, exact_ints=True)


def asof_join(left: rd.Dataset, right: rd.Dataset, on: str,
              left_ts: str, right_ts: str,
              num_partitions: "int | None" = None,
              left_schema=None, right_schema=None) -> rd.Dataset:
    """As-of join: for each left row, the LATEST right row of the same
    key with ``right_ts <= left_ts`` (inner: unmatched left rows drop).
    Matches DuckDB ``ASOF JOIN ... ON l.key = r.key AND l.ts >= r.ts``.

    Plan: the same tagged-union single co-partitioned shuffle as
    ``hash_join``; inside each key partition the right side is deduped
    per (key, ts) (keep the max of each payload column — deterministic
    under duplicate timestamps, mirrored in the oracle) and a vectorized
    ``pd.merge_asof(by=key)`` does the backward search. The shuffle is
    the only exchange; the time search never leaves the partition.
    """
    num_partitions = _resolve_partitions(num_partitions)

    def _names_types(ds, given):
        if given is not None:
            return list(given.names), {n: given.field(n).type for n in given.names}
        s = ds.schema()
        return list(s.names), {n: _arrow_type(t) for n, t in zip(s.names, s.types)}

    l_names, l_types = _names_types(left, left_schema)
    r_names, r_types = _names_types(right, right_schema)
    l_other = [n for n in l_names if n != on]
    r_other = [n for n in r_names if n != on]
    overlap = set(l_other) & set(r_other)
    if overlap:
        raise ValueError(f"asof_join column overlap: {sorted(overlap)}")
    r_payload = [n for n in r_other if n != right_ts]

    fields = ([pa.field(on, l_types[on])]
              + [pa.field(n, l_types[n]) for n in l_other]
              + [pa.field(n, r_types[n]) for n in r_other]
              + [pa.field("_side", pa.int8())])
    schema = pa.schema(fields)

    def pad(side: int, own: list[str]):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            arrays = []
            for fld in schema:
                if fld.name == "_side":
                    arrays.append(pa.array(np.full(n, side, dtype=np.int8)))
                elif fld.name == on or fld.name in own:
                    arrays.append(t.column(fld.name).cast(fld.type))
                else:
                    arrays.append(_pad_filler(n, fld.type))
            return pa.Table.from_arrays(arrays, schema=schema)
        return f

    both = (left.map_batches(pad(0, l_other), batch_format="pyarrow")
            .union(right.map_batches(pad(1, r_other), batch_format="pyarrow")))

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_part"] = (pd.util.hash_pandas_object(df[on], index=False)
                       % num_partitions).astype("int64")
        return df

    def _pd_dtype(t: "pa.DataType"):
        try:
            return np.dtype(t.to_pandas_dtype())
        except Exception:
            return np.dtype(object)

    l_cols = [on, left_ts] + [c for c in l_other if c != left_ts]
    r_cols = [on, right_ts] + r_payload
    l_dtypes = {c: _pd_dtype(l_types[c]) for c in l_cols}
    r_dtypes = {c: _pd_dtype(r_types[c]) for c in r_cols}

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # a partition holding only ONE side arrives with the other
        # side's all-null columns degraded to object dtype (pandas
        # block path); each side's OWN columns are non-null by
        # construction, so casting back to the declared types is safe
        lhs = g[g["_side"] == 0][l_cols].astype(l_dtypes)
        rhs = g[g["_side"] == 1][r_cols].astype(r_dtypes)
        # dedupe right per (key, ts): keep max payload (deterministic)
        rhs = rhs.groupby([on, right_ts], as_index=False).max()
        lhs = lhs.sort_values(left_ts, kind="stable")
        rhs = rhs.sort_values(right_ts, kind="stable")
        m = pd.merge_asof(lhs, rhs, left_on=left_ts, right_on=right_ts,
                          by=on, direction="backward")
        return m[m[right_ts].notna()]   # inner semantics

    out_schema = pa.schema(
        [pa.field(on, l_types[on]), pa.field(left_ts, l_types[left_ts])]
        + [pa.field(n, l_types[n]) for n in l_other if n != left_ts]
        + [pa.field(right_ts, r_types[right_ts])]
        + [pa.field(n, r_types[n]) for n in r_payload])
    return typed_groupby_map(
        both.map_batches(add_part, batch_format="pandas"), "_part", merge,
        out_schema)


def range_join_broadcast(left: rd.Dataset, value_col: str,
                         bands: "pd.DataFrame",
                         lo_col: str = "lo", hi_col: str = "hi",
                         band_cols: list[str] | None = None,
                         out_schema=None) -> rd.Dataset:
    """Interval (range) join of a big fact stream against a SMALL bands
    table: emit one output row per (left row, band) with
    ``lo <= value <= hi``. Bands may overlap (a row can match several).

    The bands side is broadcast once (``ray.put``) — the correct plan
    for dimension-sized interval tables; each batch does a vectorized
    interval containment (two ``np.searchsorted`` probes against the
    sorted endpoint arrays when bands are disjoint, a dense mask
    otherwise — band count is small by contract). No shuffle. For
    interval tables that exceed a worker use ``range_join_bucketed``
    (both sides co-partition on a coarse value bucket; same output,
    one shuffle).
    """
    import ray

    bands = bands.reset_index(drop=True)
    band_cols = band_cols or [c for c in bands.columns
                              if c not in (lo_col, hi_col)]
    ref = ray.put((bands[lo_col].to_numpy(), bands[hi_col].to_numpy(),
                   {c: bands[c].to_numpy() for c in band_cols}))

    def f(t: pa.Table) -> pa.Table:
        import ray as _ray
        los, his, payload = _ray.get(ref)
        vals = np.asarray(t.column(value_col).to_pylist(), dtype=np.float64)
        # dense containment mask: (n_rows, n_bands) — bands are few
        hit = (vals[:, None] >= los[None, :]) & (vals[:, None] <= his[None, :])
        rows, bidx = np.where(hit)
        out = {name: t.column(name).take(pa.array(rows, pa.int64()))
               for name in t.column_names}
        out[lo_col] = pa.array(los[bidx])
        out[hi_col] = pa.array(his[bidx])
        for c, arr in payload.items():
            out[c] = pa.array(arr[bidx])
        return pa.table(out)

    return left.map_batches(f, batch_format="pyarrow")


def range_join_bucketed(left: rd.Dataset, value_col: str, bands,
                        lo_col: str = "lo", hi_col: str = "hi",
                        band_cols: list[str] | None = None,
                        bucket_width: float | None = None,
                        num_partitions: "int | None" = None,
                        left_schema=None) -> rd.Dataset:
    """Interval (range) join WITHOUT broadcasting the bands — the scale
    path ``range_join_broadcast`` documents for interval tables that
    exceed a worker: both sides co-partition on a coarse value bucket
    (width defaults to the widest band) and containment is verified
    in-partition. A band explodes to every bucket it overlaps
    (amplification <= band_width/bucket_width + 1 <= 2 at the default
    width); a point value lives in exactly ONE bucket, so every
    qualifying (row, band) pair meets exactly once — no post-join
    dedup. ONE shuffle; nothing is collected to the driver. Same
    output relation as the broadcast plan (tested identical; shared
    SQL oracle). ``bands``: pd.DataFrame or Dataset with lo/hi
    (float) + payload columns."""
    import numpy as np

    num_partitions = _resolve_partitions(num_partitions)

    def _names_types(ds, given):
        if given is not None:
            return list(given.names), {n: given.field(n).type
                                       for n in given.names}
        s = ds.schema()
        return list(s.names), {n: _arrow_type(t)
                               for n, t in zip(s.names, s.types)}

    if isinstance(bands, rd.Dataset):
        bands_ds = bands
        b_names, b_all_types = _names_types(bands_ds, None)
        band_cols = band_cols or [c for c in b_names
                                  if c not in (lo_col, hi_col)]
        b_types = {c: b_all_types[c] for c in band_cols}
        if bucket_width is None:
            # distributed max band width — the bands table never
            # lands on the driver in this mode
            from ray.data.aggregate import Max

            def widths(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc
                w = pc.subtract(
                    pc.cast(t.column(hi_col), pa.float64()),
                    pc.cast(t.column(lo_col), pa.float64()))
                return pa.table({"w": w})

            bucket_width = float(
                bands_ds.map_batches(widths, batch_format="pyarrow")
                .aggregate(Max("w"))["max(w)"])
    else:
        bands = bands.reset_index(drop=True)
        band_cols = band_cols or [c for c in bands.columns
                                  if c not in (lo_col, hi_col)]
        b_types = {c: _arrow_type(bands[c].dtype) for c in band_cols}
        if bucket_width is None:
            bucket_width = float((bands[hi_col] - bands[lo_col]).max())
        bands_ds = rd.from_pandas(bands)
    if not bucket_width > 0:
        bucket_width = 1.0

    l_names, l_types = _names_types(left, left_schema)
    overlap = (set(l_names) & (set(band_cols) | {lo_col, hi_col}))
    if overlap:
        raise ValueError(f"range_join column overlap: {sorted(overlap)}")
    fields = ([pa.field(n, l_types[n]) for n in l_names]
              + [pa.field(lo_col, pa.float64()),
                 pa.field(hi_col, pa.float64())]
              + [pa.field(c, b_types[c]) for c in band_cols]
              + [pa.field("_side", pa.int8()),
                 pa.field("_bucket", pa.int64())])
    schema = pa.schema(fields)

    def pad_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        v = t.column(value_col).to_numpy().astype(np.float64)
        bucket = np.floor(v / bucket_width).astype(np.int64)
        arrays = []
        for fld in schema:
            if fld.name == "_side":
                arrays.append(pa.array(np.zeros(n, dtype=np.int8)))
            elif fld.name == "_bucket":
                arrays.append(pa.array(bucket))
            elif fld.name in l_names:
                arrays.append(t.column(fld.name).cast(fld.type))
            else:
                arrays.append(_pad_filler(n, fld.type))
        return pa.Table.from_arrays(arrays, schema=schema)

    def pad_bands(t: pa.Table) -> pa.Table:
        los = t.column(lo_col).to_numpy().astype(np.float64)
        his = t.column(hi_col).to_numpy().astype(np.float64)
        bad = ~(np.isfinite(los) & np.isfinite(his) & (his >= los))
        if bad.any():
            # fail clearly instead of np.repeat's opaque 'negative
            # dimensions' (hi < lo) or silently poisoned buckets (NaN)
            i = int(np.argmax(bad))
            raise ValueError(
                f"range_join_bucketed: invalid band [{los[i]!r}, "
                f"{his[i]!r}] — bands need finite {lo_col} <= {hi_col}")
        b0 = np.floor(los / bucket_width).astype(np.int64)
        b1 = np.floor(his / bucket_width).astype(np.int64)
        reps = (b1 - b0 + 1)
        idx = np.repeat(np.arange(len(los)), reps)
        # bucket sequence per band: b0[i] .. b1[i]
        offs = np.concatenate([np.arange(r) for r in reps]) if len(reps)             else np.empty(0, np.int64)
        buckets = b0[idx] + offs
        n = len(idx)
        take = pa.array(idx, pa.int64())
        arrays = []
        for fld in schema:
            if fld.name == "_side":
                arrays.append(pa.array(np.ones(n, dtype=np.int8)))
            elif fld.name == "_bucket":
                arrays.append(pa.array(buckets, pa.int64()))
            elif fld.name == lo_col:
                arrays.append(pa.array(los[idx], pa.float64()))
            elif fld.name == hi_col:
                arrays.append(pa.array(his[idx], pa.float64()))
            elif fld.name in band_cols:
                arrays.append(t.column(fld.name).take(take).cast(fld.type))
            else:
                arrays.append(_pad_filler(n, fld.type))
        return pa.Table.from_arrays(arrays, schema=schema)

    both = (left.map_batches(pad_left, batch_format="pyarrow")
            .union(bands_ds.map_batches(pad_bands, batch_format="pyarrow")))

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_part"] = (df["_bucket"] % num_partitions).astype("int64")
        return df

    def _pd_dtype(t: "pa.DataType"):
        try:
            return np.dtype(t.to_pandas_dtype())
        except Exception:
            return np.dtype(object)

    l_dtypes = {c: _pd_dtype(l_types[c]) for c in l_names}
    r_cols = [lo_col, hi_col] + band_cols
    r_dtypes = {lo_col: np.dtype(np.float64), hi_col: np.dtype(np.float64),
                **{c: _pd_dtype(b_types[c]) for c in band_cols}}

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # one-sided partitions degrade absent columns to object dtype;
        # each side's own columns are non-null, so the cast is safe
        lhs = g[g["_side"] == 0][l_names + ["_bucket"]].astype(l_dtypes)
        rhs = g[g["_side"] == 1][r_cols + ["_bucket"]].astype(r_dtypes)
        m = lhs.merge(rhs, on="_bucket")
        m = m[(m[value_col] >= m[lo_col]) & (m[value_col] <= m[hi_col])]
        return m[l_names + r_cols]

    out_schema = pa.schema(
        [pa.field(n, l_types[n]) for n in l_names]
        + [pa.field(lo_col, pa.float64()), pa.field(hi_col, pa.float64())]
        + [pa.field(c, b_types[c]) for c in band_cols])
    return typed_groupby_map(
        both.map_batches(add_part, batch_format="pandas"), "_part", merge,
        out_schema)


def hourly_user_agg(events: rd.Dataset) -> rd.Dataset:
    """Per (user_id, hour bucket): event count + value sum — the
    batch-engine rendering of a tumbling window (ray_guide
    'Streaming-shaped workloads')."""
    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["user_id", "ts", "value"]].copy()
        df["hour"] = df["ts"].dt.floor("h")
        return df.drop(columns=["ts"])

    bucketed = events.map_batches(add_bucket, batch_format="pandas")
    # (user_id, hour) is near-unique per event -> high-cardinality key ->
    # partitioned hash aggregate, not the per-group native plan
    return hash_aggregate(bucketed, ["user_id", "hour"],
                          {"value": "sum_value"}, count_alias="n_events",
                          out_schema=pa.schema([
                              ("user_id", pa.int64()),
                              ("hour", pa.timestamp("us")),
                              ("sum_value", pa.float64()),
                              ("n_events", pa.int64())]))


def top_n(ds: rd.Dataset, sort_cols: list[str], ascending: list[bool],
          n: int) -> rd.Dataset:
    """Scale-safe global top-N: per-block prune to n rows first, then
    sort+limit over the <= n * num_blocks survivors. The all-to-all
    sort never sees the full dataset — at 100 TB the pruned stream is
    n rows per block regardless of input size. ``sort_cols`` must give
    a total order (include a unique tie-break column)."""
    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(sort_cols, ascending=ascending,
                              kind="stable").head(n)

    pruned = ds.map_batches(local, batch_format="pandas")
    return pruned.sort(sort_cols,
                       descending=[not a for a in ascending]).limit(n)


def distinct_count(ds: rd.Dataset, key: str, value_col: str,
                   alias: str = "n_distinct",
                   key_type: "pa.DataType | None" = None,
                   num_partitions: "int | None" = None) -> rd.Dataset:
    """Exact COUNT(DISTINCT value) per key: batch-local (key, value)
    dedup combiner -> ONE shuffle partitioned on hash(key, value) ->
    in-partition dedup + per-key partial counts -> tiny final groupby
    over (key, partition) partials. The wide exchange moves distinct
    pairs only; the final aggregate sees P rows per key."""
    from ray.data.aggregate import Sum

    num_partitions = _resolve_partitions(num_partitions)

    def local_dedup(df: pd.DataFrame) -> pd.DataFrame:
        g = df[[key, value_col]].drop_duplicates()
        h = pd.util.hash_pandas_object(
            g[key].astype(str) + "|" + g[value_col].astype(str), index=False)
        g = g.assign(part=(h % num_partitions).astype("int64"))
        return g

    def part_count(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates([key, value_col])
        out = d.groupby(key, as_index=False).size()
        return out.rename(columns={"size": alias})

    # key_type is passed explicitly rather than read from ds.schema():
    # schema() on a lazy dataset executes the upstream plan (see the
    # hash_join note above)
    partials = typed_groupby_map(
        ds.map_batches(local_dedup, batch_format="pandas"), "part",
        part_count,
        pa.schema([(key, key_type or pa.string()), (alias, pa.int64())]))
    return partials.groupby(key).aggregate(Sum(alias, alias_name=alias))


def _is_float_dtype(ds: rd.Dataset, col: str,
                    dtype: "pa.DataType | None" = None) -> bool:
    """``dtype`` short-circuits the probe: ``ds.schema()`` on a lazy
    transformed dataset EXECUTES the upstream plan just to learn the
    dtype (the same double-execution hash_join's docstring warns
    about) — callers that know the column type pass it explicitly."""
    if dtype is not None:
        return pa.types.is_floating(dtype)
    s = ds.schema()
    t = dict(zip(s.names, s.types))[col]
    return pa.types.is_floating(_arrow_type(t))


def binned_quantiles(ds: rd.Dataset, col: str, qs: list[float],
                     n_bins: int = 8192) -> pd.DataFrame:
    """Approximate quantiles for CONTINUOUS value domains with BOUNDED
    state — the scale path where the exact distinct-value histogram
    would be ~N rows. Two streaming passes: (1) a global min/max
    aggregate; (2) a fixed-width ``n_bins`` histogram (per-batch
    bincount combiner, one tiny groupby — driver state is n_bins rows,
    never the value domain). Quantile positions interpolate uniformly
    inside their bin.

    Error bound: the true quantile_cont value lies in the hit bin (or
    its neighbor at a bin-boundary rank), so
    ``|est − exact| ≤ 2·(max−min)/n_bins`` — asserted in tests. For a
    KLL/t-digest-style rank guarantee, raise n_bins; 8192 doubles cost
    64 KiB per batch partial. When EXACT continuous quantiles are
    required, use ``exact_quantiles_multipass`` (bounded state, ~3
    refinement scans at 10^12 rows)."""
    from ray.data.aggregate import Max, Min, Sum

    mm = ds.aggregate(Min(col), Max(col))
    lo, hi = float(mm[f"min({col})"]), float(mm[f"max({col})"])
    if hi == lo:
        return pd.DataFrame([{"q": float(q), "value": lo} for q in qs])
    width = (hi - lo) / n_bins

    def binify(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy().astype(np.float64)
        b = np.minimum(((v - lo) / width).astype(np.int64), n_bins - 1)
        cnt = np.bincount(b, minlength=n_bins)
        nz = np.nonzero(cnt)[0]
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "n": pa.array(cnt[nz], pa.int64())})

    hist = (ds.map_batches(binify, batch_format="pyarrow")
            .groupby("bin").aggregate(Sum("n", alias_name="n")).to_pandas()
            .sort_values("bin").reset_index(drop=True))
    total = int(hist["n"].sum())
    cum = hist["n"].cumsum().to_numpy()
    bins = hist["bin"].to_numpy()
    counts = hist["n"].to_numpy()
    out = []
    for q in qs:
        h = q * (total - 1)
        i = int(np.searchsorted(cum, np.floor(h) + 1))
        c_before = int(cum[i - 1]) if i > 0 else 0
        frac = min(1.0, max(0.0, (h - c_before) / counts[i]))
        out.append({"q": float(q),
                    "value": lo + width * (float(bins[i]) + frac)})
    return pd.DataFrame(out)


def exact_quantiles(ds: rd.Dataset, col: str, qs: list[float],
                    mode: str = "auto",
                    n_bins: int = 8192,
                    col_dtype: "pa.DataType | None" = None) -> pd.DataFrame:
    """Exact linear-interpolated quantiles (SQL ``quantile_cont``
    semantics) of an integer-ish column via a distributed histogram:
    per-batch value_counts combiner -> groupby(value) sum -> the tiny
    (distinct-value, count) histogram comes to the driver and the
    quantile positions q*(n-1) are interpolated there. Assumes the
    column's DISTINCT-value cardinality is bounded (lengths, counts,
    scores), which holds even at 100 TB row counts; the full column is
    never collected.

    ``mode="auto"`` keeps this exact path for bounded domains (integer
    dtypes) and routes CONTINUOUS (floating) columns — where distinct
    ≈ N and the exact histogram is a scale-killer — to the bounded
    ``binned_quantiles`` sketch. ``mode="exact"``/``"binned"`` force.
    Pass ``col_dtype`` when ``ds`` is a lazy transform: the auto probe
    otherwise runs ``ds.schema()``, executing the upstream plan twice."""
    if mode == "auto":
        mode = "binned" if _is_float_dtype(ds, col, col_dtype) else "exact"
    if mode == "binned":
        return binned_quantiles(ds, col, qs, n_bins=n_bins)
    if mode != "exact":
        raise ValueError(f"unknown mode {mode!r}")
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        vc = pc.value_counts(t.column(col).combine_chunks())
        return pa.table({col: vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(col).aggregate(Sum("n", alias_name="n")).to_pandas()
            .sort_values(col).reset_index(drop=True))
    total = int(hist["n"].sum())
    cum = hist["n"].cumsum().to_numpy()
    vals = hist[col].to_numpy()

    def value_at(idx: int) -> float:
        return float(vals[np.searchsorted(cum, idx + 1)])

    out = []
    for q in qs:
        h = q * (total - 1)
        lo, frac = int(np.floor(h)), h - np.floor(h)
        v = value_at(lo)
        if frac > 0:
            # DuckDB's quantile_cont lerp form lo*(1-frac) + hi*frac —
            # last-ulp parity matters at 1e7+ magnitudes (9-dec rounding)
            v = v * (1 - frac) + frac * value_at(lo + 1)
        out.append({"q": float(q), "value": v})
    return pd.DataFrame(out)


def broadcast_filter_join(ds: rd.Dataset, col: str, keys,
                          mode: str = "anti") -> rd.Dataset:
    """Semi/anti join against a SMALL key set (blocklist / allowlist):
    the keys are ``ray.put`` once and every task applies a vectorized
    ``pc.is_in`` mask — no shuffle, no per-batch reshipping. ``keys``
    may be a list or a Dataset with column ``col`` (materialized to the
    driver first — by assumption the small side fits; use hash_join
    for a big-big anti join)."""
    import pyarrow.compute as pc

    if isinstance(keys, rd.Dataset):
        df = keys.select_columns([col]).to_pandas()
        # an all-empty Dataset materializes with no columns at all
        keys = df[col].tolist() if col in df.columns else []
    if not keys:
        # empty blocklist/allowlist: an anti join keeps everything, a
        # semi join keeps nothing (and pa.array([]) is null-typed,
        # which pc.is_in rejects against a typed column)
        return ds if mode == "anti" else ds.limit(0)
    ref = ray.put(pa.array(sorted(set(keys))))

    def f(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t.column(col), value_set=ray.get(ref))
        if mode == "anti":
            mask = pc.invert(mask)
        return t.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


def pivot_counts(ds: rd.Dataset, key: str, pivot_col: str,
                 categories: list[str], key_type: "pa.DataType | None" = None,
                 num_partitions: "int | None" = None) -> rd.Dataset:
    """Wide per-key counts: one output column per category of
    ``pivot_col`` (the long->wide pivot of a feature table). The
    category set is fixed and small by assumption; each batch emits a
    per-key partial count vector (combiner), then the partitioned
    hash-aggregate sums them — the shuffle moves one row per
    (key, batch), and the finish is one vectorized pandas groupby per
    partition (Ray's native sort aggregate measured ~100x slower on
    the same partials at 1.5k keys)."""
    cols = [f"n_{c}" for c in categories]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(key, as_index=False).size()[[key]]
        for c in categories:
            n = (df[df[pivot_col] == c].groupby(key).size()
                 .reindex(out[key]).fillna(0).astype("int64"))
            out[f"n_{c}"] = n.to_numpy()
        return out

    partials = ds.map_batches(partial, batch_format="pandas")
    schema = pa.schema([(key, key_type or pa.int64())]
                       + [(c, pa.int64()) for c in cols])
    return hash_aggregate(partials, [key], {c: c for c in cols},
                          num_partitions=num_partitions, out_schema=schema)


def grouped_binned_quantiles(ds: rd.Dataset, group: str, col: str,
                             qs: list[float],
                             n_bins: int = 8192) -> pd.DataFrame:
    """Per-group ``binned_quantiles``: pass 1 aggregates per-group
    min/max (one row per group), pass 2 builds per-(group, bin) fixed
    -width histograms — driver state is <= groups x n_bins rows of
    counts, independent of the value domain. Same
    ``<= 2·(max−min)/n_bins`` per-group error bound as the global
    sketch. Returns (group, q, value) rows."""
    import ray
    from ray.data.aggregate import Max, Min, Sum

    mm = (ds.groupby(group)
          .aggregate(Min(col, alias_name="lo"), Max(col, alias_name="hi"))
          .to_pandas())
    ranges = {g: (float(l), float(h))
              for g, l, h in zip(mm[group], mm["lo"], mm["hi"])}
    ref = ray.put(ranges)

    def binify(df: pd.DataFrame) -> pd.DataFrame:
        rg = ray.get(ref)
        los = df[group].map(lambda g: rg[g][0]).to_numpy(np.float64)
        his = df[group].map(lambda g: rg[g][1]).to_numpy(np.float64)
        v = df[col].to_numpy(np.float64)
        width = np.maximum(his - los, 1e-300) / n_bins
        b = np.minimum(((v - los) / width).astype(np.int64), n_bins - 1)
        out = pd.DataFrame({group: df[group], "bin": b})
        g2 = out.groupby([group, "bin"], as_index=False).size()
        g2["n"] = g2["size"].astype("int64")
        return g2[[group, "bin", "n"]]

    hist = (ds.map_batches(binify, batch_format="pandas")
            .groupby([group, "bin"]).aggregate(Sum("n", alias_name="n"))
            .to_pandas())
    out = []
    for gval, h in hist.groupby(group):
        lo, hi = ranges[gval]
        if hi == lo:
            out.extend({group: gval, "q": float(q), "value": lo}
                       for q in qs)
            continue
        width = (hi - lo) / n_bins
        h = h.sort_values("bin")
        cum = h["n"].cumsum().to_numpy()
        bins = h["bin"].to_numpy()
        counts = h["n"].to_numpy()
        total = int(cum[-1])
        for q in qs:
            pos = q * (total - 1)
            i = int(np.searchsorted(cum, np.floor(pos) + 1))
            c_before = int(cum[i - 1]) if i > 0 else 0
            frac = min(1.0, max(0.0, (pos - c_before) / counts[i]))
            out.append({group: gval, "q": float(q),
                        "value": lo + width * (float(bins[i]) + frac)})
    return pd.DataFrame(out).sort_values([group, "q"]).reset_index(drop=True)


def grouped_quantiles(ds: rd.Dataset, group: str, col: str,
                      qs: list[float], mode: str = "auto",
                      n_bins: int = 8192,
                      col_dtype: "pa.DataType | None" = None) -> pd.DataFrame:
    """Exact per-group quantile_cont quantiles via one distributed
    (group, value)-histogram; interpolation happens on the driver over
    the tiny histogram (distinct-value cardinality bounded, group
    cardinality small). Returns (group, q, value) rows.

    ``mode="auto"``: integer columns keep this exact path; CONTINUOUS
    (floating) columns route to ``grouped_binned_quantiles`` (bounded
    per-group sketch) — the exact histogram over a continuous domain
    is ~N driver rows at web scale. ``col_dtype``: see exact_quantiles."""
    if mode == "auto":
        mode = "binned" if _is_float_dtype(ds, col, col_dtype) else "exact"
    if mode == "binned":
        return grouped_binned_quantiles(ds, group, col, qs, n_bins=n_bins)
    if mode != "exact":
        raise ValueError(f"unknown mode {mode!r}")
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([group, col], as_index=False).size()
        g["n"] = g["size"].astype("int64")
        return g[[group, col, "n"]]

    hist = (ds.map_batches(partial, batch_format="pandas")
            .groupby([group, col]).aggregate(Sum("n", alias_name="n"))
            .to_pandas())
    out = []
    for gval, h in hist.groupby(group):
        h = h.sort_values(col)
        cum = h["n"].cumsum().to_numpy()
        vals = h[col].to_numpy()
        total = int(cum[-1])

        def value_at(idx: int) -> float:
            return float(vals[np.searchsorted(cum, idx + 1)])

        for q in qs:
            pos = q * (total - 1)
            lo, frac = int(np.floor(pos)), pos - np.floor(pos)
            v = value_at(lo)
            if frac > 0:
                # DuckDB's lerp form (see exact_quantiles)
                v = v * (1 - frac) + frac * value_at(lo + 1)
            out.append({group: gval, "q": float(q), "value": v})
    return pd.DataFrame(out).sort_values([group, "q"]).reset_index(drop=True)


def grouped_moments(ds: rd.Dataset, key: str, value_col: str,
                    key_type: "pa.DataType | None" = None,
                    num_partitions: "int | None" = None) -> rd.Dataset:
    """Per-key count / sum / mean / population variance in one combiner
    pass — the distributed one-pass variance: only sufficient
    statistics (n, Σv, Σv²) travel through the shuffle, never rows.

    The value column must be integral: the sums accumulate EXACTLY in
    int64 (the combiner merge is associative with zero float error;
    caller guarantees Σv² < 2⁶³), and mean/var are then evaluated from
    the exact sums with the same closed-form double expression the SQL
    oracle uses (s/n, s2/n − (s/n)²) — bit-identical results under any
    partitioning. Output: (key, n, sum_v, mean_v, var_v)."""
    import numpy as np
    import pyarrow.compute as pc

    def prep(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column(value_col), pa.int64())
        return pa.table({key: t.column(key), "_v": v,
                         "_v2": pc.multiply(v, v)})

    kt = key_type or pa.string()
    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"), keys=[key],
        sum_cols={"_v": "sum_v", "_v2": "sum_v2"}, count_alias="n",
        num_partitions=num_partitions,
        out_schema=pa.schema([(key, kt), ("sum_v", pa.int64()),
                              ("sum_v2", pa.int64()), ("n", pa.int64())]))

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy().astype(np.float64)
        s = t.column("sum_v").to_numpy().astype(np.float64)
        s2 = t.column("sum_v2").to_numpy().astype(np.float64)
        mean = s / n
        var = s2 / n - mean * mean
        return pa.table({key: t.column(key), "n": t.column("n"),
                         "sum_v": t.column("sum_v"),
                         "mean_v": pa.array(mean, pa.float64()),
                         "var_v": pa.array(var, pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def zscore_normalize(ds: rd.Dataset, key: str, value_col: str,
                     out_cols: list[str],
                     key_type: "pa.DataType | None" = None,
                     num_partitions: "int | None" = None,
                     mode: str = "auto",
                     broadcast_max_keys: int = 5_000_000,
                     ds_schema: "pa.Schema | None" = None) -> rd.Dataset:
    """Per-key z-score normalization. Moments come from
    ``grouped_moments``' exact integer sums, so
    ``z = (v − mean) / sqrt(var)`` evaluates the identical IEEE
    expression as the SQL oracle (sqrt and the arithmetic ops are
    correctly rounded on both sides); z = 0 where var == 0.

    Two plans behind a distributed key-count auto-switch:

    - ``broadcast`` (#groups <= broadcast_max_keys — lang/domain/source
      strata): aggregate → ``ray.put`` scalars → stateless vectorized
      map; no per-row shuffle.
    - ``join`` (key cardinality beyond driver RAM, e.g. per-user): the
      moments table stays a Dataset and ``hash_join``s back onto the
      rows on a key co-partition; the per-batch finish computes the
      same IEEE expression. One extra shuffle, zero driver state."""
    import numpy as np
    import ray

    moments = grouped_moments(ds, key, value_col, key_type,
                              num_partitions).materialize()
    if mode == "auto":
        mode = ("broadcast" if moments.count() <= broadcast_max_keys
                else "join")

    if mode == "broadcast":
        m = moments.to_pandas()
        std = np.sqrt(m["var_v"].to_numpy())
        lookup = {k: (mu, sd)
                  for k, mu, sd in zip(m[key], m["mean_v"], std)}
        ref = ray.put(lookup)

        def f(t: pa.Table) -> pa.Table:
            lk = ray.get(ref)
            keys = t.column(key).to_pylist()
            n = len(keys)
            v = t.column(value_col).to_numpy().astype(np.float64)
            mu = np.fromiter((lk[k][0] for k in keys), np.float64, n)
            sd = np.fromiter((lk[k][1] for k in keys), np.float64, n)
            zero = sd == 0.0
            z = (v - mu) / np.where(zero, 1.0, sd)
            z[zero] = 0.0
            cols = {c: t.column(c) for c in out_cols}
            cols["z"] = pa.array(z, pa.float64())
            return pa.table(cols)

        return ds.map_batches(f, batch_format="pyarrow")

    if mode != "join":
        raise ValueError(f"unknown mode {mode!r}")

    kt = key_type or pa.string()
    carry = list(dict.fromkeys(out_cols + [value_col]))
    if ds_schema is not None:
        left_schema = pa.schema([(n, ds_schema.field(n).type)
                                 for n in [key] + [c for c in carry
                                                   if c != key]])
        rows = ds.select_columns(list(dict.fromkeys([key] + carry)))
    else:
        rows = ds.select_columns(list(dict.fromkeys([key] + carry)))
        left_schema = None
    joined = hash_join(
        rows, moments.select_columns([key, "mean_v", "var_v"]),
        on=key, num_partitions=num_partitions, left_schema=left_schema,
        right_schema=pa.schema([(key, kt), ("mean_v", pa.float64()),
                                ("var_v", pa.float64())]))

    def finish(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy().astype(np.float64)
        mu = t.column("mean_v").to_numpy().astype(np.float64)
        sd = np.sqrt(t.column("var_v").to_numpy().astype(np.float64))
        zero = sd == 0.0
        z = (v - mu) / np.where(zero, 1.0, sd)
        z[zero] = 0.0
        cols = {c: t.column(c) for c in out_cols}
        cols["z"] = pa.array(z, pa.float64())
        return pa.table(cols)

    return joined.map_batches(finish, batch_format="pyarrow")


def grouped_topk(ds: rd.Dataset, key: str, order_col: str, tie_col: str,
                 out_cols: list[str], k: int,
                 num_partitions: "int | None" = None) -> rd.Dataset:
    """Top-k rows per key by (order_col desc, tie_col asc) — the k > 1
    generalization of ``grouped_argmax``, same combiner plan: each
    batch keeps at most k rows per key locally, the exchange moves
    ≤ k·(keys per batch) rows on a ``hash(key) % P`` partition, and one
    vectorized sort + head(k) finishes each partition. Equivalent to
    SQL ``row_number() OVER (PARTITION BY key ORDER BY order DESC,
    tie ASC) <= k``."""
    carry = list(dict.fromkeys([key, order_col, tie_col] + out_cols))
    num_partitions = _resolve_partitions(num_partitions)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        g = (df[carry].sort_values([order_col, tie_col],
                                   ascending=[False, True], kind="stable")
             .groupby(key, as_index=False, sort=False).head(k))
        h = pd.util.hash_pandas_object(g[key], index=False)
        return g.assign(_part=(h % num_partitions).astype("int64"))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values([order_col, tie_col],
                              ascending=[False, True], kind="stable")
                .groupby(key, as_index=False, sort=False)
                .head(k))[out_cols]

    return (ds.map_batches(local, batch_format="pandas")
            .groupby("_part").map_groups(final, batch_format="pandas"))


def binned_percentile_rank(ds: rd.Dataset, value_col: str,
                           out_cols: list[str],
                           n_bins: int = 8192) -> rd.Dataset:
    """Approximate per-row percentile rank for CONTINUOUS domains with
    bounded state: the ``binned_quantiles`` fixed-width histogram is
    broadcast (n_bins cumulative counts, never the value domain) and
    each row ranks as (count below its bin + uniform within-bin
    share) / (N−1). Rank error is bounded by the largest single bin's
    share, ``max_bin_count / (N−1)`` — computable from the histogram
    itself and asserted against the exact ranks in tests. Output:
    out_cols + pr."""
    import ray
    from ray.data.aggregate import Max, Min, Sum

    mm = ds.aggregate(Min(value_col), Max(value_col))
    lo, hi = float(mm[f"min({value_col})"]), float(mm[f"max({value_col})"])
    span = hi - lo
    width = (span / n_bins) if span > 0 else 1.0

    def binify(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy().astype(np.float64)
        b = np.minimum(((v - lo) / width).astype(np.int64), n_bins - 1)
        cnt = np.bincount(b, minlength=n_bins)
        nz = np.nonzero(cnt)[0]
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "n": pa.array(cnt[nz], pa.int64())})

    hist = (ds.map_batches(binify, batch_format="pyarrow")
            .groupby("bin").aggregate(Sum("n", alias_name="n")).to_pandas()
            .sort_values("bin").reset_index(drop=True))
    total = int(hist["n"].sum())
    full = np.zeros(n_bins, dtype=np.int64)
    full[hist["bin"].to_numpy()] = hist["n"].to_numpy()
    below = np.concatenate(([0], np.cumsum(full)[:-1]))
    ref = ray.put((below, full))

    def rank(t: pa.Table) -> pa.Table:
        less, counts = ray.get(ref)
        x = t.column(value_col).to_numpy().astype(np.float64)
        b = np.minimum(((x - lo) / width).astype(np.int64), n_bins - 1)
        within = np.clip((x - (lo + b * width)) / width, 0.0, 1.0)
        est = less[b] + within * counts[b]
        pr = est / (total - 1) if total > 1 else np.zeros(len(x))
        cols = {c: t.column(c) for c in out_cols}
        cols["pr"] = pa.array(pr, pa.float64())
        return pa.table(cols)

    return ds.map_batches(rank, batch_format="pyarrow")


def percentile_rank(ds: rd.Dataset, value_col: str,
                    out_cols: list[str], mode: str = "exact",
                    n_bins: int = 8192,
                    col_dtype: "pa.DataType | None" = None) -> rd.Dataset:
    """Per-row global percentile rank — SQL ``percent_rank() OVER
    (ORDER BY value)`` = (#rows strictly smaller) / (N − 1) — WITHOUT a
    global sort: the same bounded-cardinality distributed histogram as
    ``exact_quantiles`` (per-batch value_counts combiner -> one tiny
    groupby) is cumulated on the driver and broadcast once, then
    ranking is a stateless vectorized ``searchsorted`` pass. Both sides
    evaluate the identical n_less / (N−1) double division. Output:
    out_cols + pr.

    ``mode="binned"`` (or ``"auto"`` on a floating column) switches to
    ``binned_percentile_rank`` — the bounded-state sketch for
    continuous domains where distinct ≈ N. Default stays ``exact``:
    rank output feeds hash-checked oracles, so the approximation is
    opt-in. ``col_dtype``: see exact_quantiles."""
    if mode == "auto":
        mode = "binned" if _is_float_dtype(ds, value_col, col_dtype) else "exact"
    if mode == "binned":
        return binned_percentile_rank(ds, value_col, out_cols,
                                      n_bins=n_bins)
    if mode != "exact":
        raise ValueError(f"unknown mode {mode!r}")
    import ray
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        vc = pc.value_counts(t.column(value_col).combine_chunks())
        return pa.table({value_col: vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(value_col).aggregate(Sum("n", alias_name="n"))
            .to_pandas().sort_values(value_col).reset_index(drop=True))
    total = int(hist["n"].sum())
    vals = hist[value_col].to_numpy()
    n_less = np.concatenate(([0], hist["n"].cumsum().to_numpy()[:-1]))
    ref = ray.put((vals, n_less, total))

    def rank(t: pa.Table) -> pa.Table:
        v, less, n = ray.get(ref)
        x = t.column(value_col).to_numpy()
        nl = less[np.searchsorted(v, x)].astype(np.float64)
        pr = nl / (n - 1) if n > 1 else np.zeros(len(x))
        cols = {c: t.column(c) for c in out_cols}
        cols["pr"] = pa.array(pr, pa.float64())
        return pa.table(cols)

    return ds.map_batches(rank, batch_format="pyarrow")


def bloom_filter_join(ds: rd.Dataset, col: str, keys: rd.Dataset,
                      key_col: str, m_bits: int = 1 << 20,
                      k_hashes: int = 4) -> rd.Dataset:
    """Semi-join via a Bloom filter: membership when a full key set is
    too large to broadcast as a hash set but its m-bit signature is
    not — the classic bounded-memory pre-filter for joins at 100 TB
    (false-positive rows would survive; choose m so the expected FP
    count is << 1, and follow with an exact co-partitioned hash_join
    when exactness is required).

    The build side is a DISTRIBUTED OR-aggregate: each block folds its
    keys into a packed m/8-byte bitmap (AggregateFn accumulate), and
    bitmaps merge pairwise with np.bitwise_or — a semilattice, so the
    result is partition-order independent. The probe side tests all k
    bits in one vectorized pass. Hashes are md5("i:key") % m, i.e.
    deterministic and engine-reproducible."""
    import hashlib

    import ray
    from ray.data.aggregate import AggregateFn

    def _bits(vals) -> np.ndarray:
        bm = np.zeros(m_bits // 8, dtype=np.uint8)
        for v in vals:
            for i in range(k_hashes):
                h = int.from_bytes(
                    hashlib.md5(f"{i}:{v}".encode()).digest()[8:],
                    "little") % m_bits
                bm[h >> 3] |= 1 << (h & 7)
        return bm

    def _block_keys(block):
        # AggregateFn hands over whatever block format the upstream
        # produced (Arrow table or pandas frame)
        if isinstance(block, pa.Table):
            return block.column(key_col).to_pylist()
        return list(block[key_col])

    agg = AggregateFn(
        init=lambda _: np.zeros(m_bits // 8, dtype=np.uint8),
        accumulate_block=lambda bm, block: np.bitwise_or(
            bm, _bits(_block_keys(block))),
        merge=np.bitwise_or,
        name="bloom")
    bitmap = keys.aggregate(agg)["bloom"]
    ref = ray.put(bitmap)

    def probe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        bm = ray.get(ref)
        keep = []
        for v in t.column(col).to_pylist():
            hit = True
            for i in range(k_hashes):
                h = int.from_bytes(
                    hashlib.md5(f"{i}:{v}".encode()).digest()[8:],
                    "little") % m_bits
                if not (bm[h >> 3] >> (h & 7)) & 1:
                    hit = False
                    break
            keep.append(hit)
        return t.filter(pa.array(keep))

    return ds.map_batches(probe, batch_format="pyarrow")


def melt(ds: rd.Dataset, id_cols: list[str], value_cols: list[str],
         var_name: str = "metric",
         value_name: str = "value") -> rd.Dataset:
    """Wide → long unpivot (the inverse of ``pivot_counts``) as a
    stateless per-batch flat map — no exchange; row count multiplies
    by len(value_cols). Values are cast to double so heterogeneous
    metric columns share one value column (SQL ``UNPIVOT``
    semantics)."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        out = df.melt(id_vars=id_cols, value_vars=value_cols,
                      var_name=var_name, value_name=value_name)
        out[value_name] = out[value_name].astype("float64")
        return out

    return ds.map_batches(f, batch_format="pandas")


def grouped_linreg(ds: rd.Dataset, key: str, x_col: str, y_col: str,
                   key_type: "pa.DataType | None" = None,
                   num_partitions: "int | None" = None) -> rd.Dataset:
    """Per-key simple linear regression (and Pearson r) via distributed
    sufficient statistics — the same exact-integer-sums trick as
    ``grouped_moments`` extended to covariance: only (n, Σx, Σy, Σxy,
    Σx², Σy²) cross the shuffle, accumulated EXACTLY in int64, and the
    closed-form slope/intercept/r are evaluated from the exact sums
    with the identical double expression the SQL oracle uses —
    bit-identical under any partitioning. Integral x/y required.
    Output: (key, n, slope, intercept, r)."""
    import numpy as np
    import pyarrow.compute as pc

    def prep(t: pa.Table) -> pa.Table:
        x = pc.cast(t.column(x_col), pa.int64())
        y = pc.cast(t.column(y_col), pa.int64())
        return pa.table({key: t.column(key), "_x": x, "_y": y,
                         "_xy": pc.multiply(x, y),
                         "_xx": pc.multiply(x, x),
                         "_yy": pc.multiply(y, y)})

    kt = key_type or pa.string()
    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"), keys=[key],
        sum_cols={"_x": "sx", "_y": "sy", "_xy": "sxy",
                  "_xx": "sxx", "_yy": "syy"},
        count_alias="n", num_partitions=num_partitions,
        out_schema=pa.schema([(key, kt), ("sx", pa.int64()),
                              ("sy", pa.int64()), ("sxy", pa.int64()),
                              ("sxx", pa.int64()), ("syy", pa.int64()),
                              ("n", pa.int64())]))

    def finish(t: pa.Table) -> pa.Table:
        f = np.float64
        n = t.column("n").to_numpy().astype(f)
        sx = t.column("sx").to_numpy().astype(f)
        sy = t.column("sy").to_numpy().astype(f)
        sxy = t.column("sxy").to_numpy().astype(f)
        sxx = t.column("sxx").to_numpy().astype(f)
        syy = t.column("syy").to_numpy().astype(f)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        r = (n * sxy - sx * sy) / (np.sqrt(n * sxx - sx * sx)
                                   * np.sqrt(n * syy - sy * sy))
        return pa.table({key: t.column(key), "n": t.column("n"),
                         "slope": pa.array(slope, pa.float64()),
                         "intercept": pa.array(intercept, pa.float64()),
                         "r": pa.array(r, pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def broadcast_hash_join(large: rd.Dataset, small: rd.Dataset, on: str,
                        small_cols: "list[str] | None" = None,
                        how: str = "inner",
                        max_small_rows: int = 5_000_000) -> rd.Dataset:
    """Map-side (broadcast) hash join — the standard plan when one side
    is dimension-sized: the small side is collected and ``ray.put``
    ONCE, then every large-side batch merges against it in a stateless
    vectorized pass. ZERO exchanges (vs ``hash_join``'s co-partitioned
    shuffle), so the large side streams straight through. Raises if
    the small side exceeds ``max_small_rows`` — switch to
    ``hash_join`` then. Duplicate small-side keys fan out with normal
    join multiplicity. ``how``: inner | left (left = keep unmatched
    large rows with nulls)."""
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    # count BEFORE collecting: the guard must fire without ever
    # materializing an over-sized side on the driver
    mat = small.materialize()
    n_small = mat.count()
    if n_small > max_small_rows:
        raise ValueError(
            f"small side has {n_small} rows > max_small_rows="
            f"{max_small_rows}; use hash_join for a shuffle join")
    sm = mat.to_pandas()
    if small_cols is not None:
        sm = sm[small_cols]
    ref = ray.put(sm)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return df.merge(ray.get(ref), on=on, how=how)

    return large.map_batches(f, batch_format="pandas")


def json_int_key_counts(ds: rd.Dataset, col: str,
                        key: str) -> rd.Dataset:
    """Semi-structured ETL: parse a JSON string column, extract one
    integer field, and count rows per value — parse + Counter combiner
    per batch (JSON decode is inherently per-record; the combiner
    keeps the exchange at one row per (value, batch)), then the small
    groupby. Rows whose JSON lacks the key (or is malformed) are
    skipped. Output: (key value as ``k``, n)."""
    import json

    from collections import Counter

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t.column(col).to_pylist():
            try:
                v = json.loads(s).get(key)
            except (TypeError, ValueError):
                continue
            if v is not None:
                c[int(v)] += 1
        ks = list(c.keys())
        return pa.table({"k": pa.array(ks, pa.int64()),
                         "one": pa.array([c[x] for x in ks], pa.int64())})

    return partial_agg_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        "k", {"one": "n"})


def winsorize(ds: rd.Dataset, col: str, out_cols: list[str],
              lo_q: float = 0.05, hi_q: float = 0.95,
              mode: str = "auto", n_bins: int = 8192) -> rd.Dataset:
    """Quantile winsorization (outlier clipping): values clamp to the
    [lo_q, hi_q] quantile_cont bounds — the tail-trimming step of a
    feature-normalization pipeline. The aggregate → broadcast-scalars →
    vectorized-map pattern: the two bounds come from ``exact_quantiles``
    (exact histogram for bounded/int domains; the binned sketch for
    continuous, per ``mode``), then one stateless clip pass. Output:
    out_cols + ``clipped`` (double — quantile bounds interpolate).
    Both engines evaluate the same LEAST/GREATEST clamp on the same
    bounds, so the oracle reproduces it exactly."""
    q = exact_quantiles(ds, col, [lo_q, hi_q], mode=mode, n_bins=n_bins)
    lo = float(q.loc[q["q"] == lo_q, "value"].iloc[0])
    hi = float(q.loc[q["q"] == hi_q, "value"].iloc[0])

    def clip(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy().astype(np.float64)
        cols = {c: t.column(c) for c in out_cols}
        cols["clipped"] = pa.array(np.minimum(np.maximum(v, lo), hi),
                                   pa.float64())
        return pa.table(cols)

    return ds.map_batches(clip, batch_format="pyarrow")


def exact_quantiles_multipass(ds: rd.Dataset, col: str, qs: list[float],
                              n_bins: int = 4096,
                              collect_cap: int = 100_000,
                              max_passes: int = 8) -> pd.DataFrame:
    """EXACT quantile_cont over a CONTINUOUS column with BOUNDED state —
    the multi-pass histogram-refinement (bisection) plan that upgrades
    ``binned_quantiles`` from approximate to exact:

    each needed order statistic starts as a rank inside the global
    [min, max] interval; every pass histograms only the ACTIVE
    intervals (one ``map_batches`` for all of them — per-batch state is
    ``intervals × n_bins`` counts plus per-bin min/max), narrows each
    rank to the bin containing it, and terminates a rank early when its
    bin holds ONE distinct value (point mass) or when the interval
    population fits ``collect_cap`` (the survivors are filtered out and
    the order statistic is read exactly). Interval mass shrinks ~n_bins×
    per pass, so 10^12 rows need ~3 passes at the defaults; nothing
    driver-side ever exceeds collect_cap + intervals × n_bins.

    Returns (q, value) with DuckDB's ``lo·(1−frac) + hi·frac``
    interpolation between the two exact neighboring order statistics —
    hash-identical to ``quantile_cont`` on raw doubles."""
    import ray
    from ray.data.aggregate import Count, Max, Min, Sum

    stats = ds.aggregate(Count(), Min(col), Max(col))
    total = int(stats["count()"])
    gmin, gmax = float(stats[f"min({col})"]), float(stats[f"max({col})"])
    if total == 0:
        return pd.DataFrame(columns=["q", "value"])

    # ranks needed (0-based order statistics)
    need: dict[int, float] = {}
    for q in qs:
        h = q * (total - 1)
        lo_r = int(np.floor(h))
        need[lo_r] = None
        if h > lo_r:
            need[lo_r + 1] = None
    # state per rank: (lo, hi, rank_within, n_in_interval) — interval is
    # CLOSED [lo, hi]; values == hi live in the last bin
    state = {r: [gmin, gmax, r, total] for r in need}
    resolved: dict[int, float] = {}

    for _ in range(max_passes):
        active = {r: s for r, s in state.items()
                  if r not in resolved and s[3] > collect_cap
                  and s[0] < s[1]}
        if not active:
            break
        iv = sorted({(s[0], s[1]) for s in active.values()})
        iv_arr = np.array(iv, dtype=np.float64)     # (I, 2)
        ref = ray.put(iv_arr)

        def hist(t: pa.Table) -> pa.Table:
            ivs = ray.get(ref)
            v = t.column(col).to_numpy().astype(np.float64)
            iids, bins_, ns, vmins, vmaxs = [], [], [], [], []
            for i, (lo, hi) in enumerate(ivs):
                m = v[(v >= lo) & (v <= hi)]
                if len(m) == 0:
                    continue
                w = (hi - lo) / n_bins
                b = np.minimum(((m - lo) / w).astype(np.int64), n_bins - 1)
                order = np.argsort(b, kind="stable")
                bs, starts = np.unique(b[order], return_index=True)
                ms = m[order]
                for j, bb in enumerate(bs):
                    seg = ms[starts[j]: starts[j + 1] if j + 1 < len(bs)
                             else len(ms)]
                    iids.append(i)
                    bins_.append(int(bb))
                    ns.append(len(seg))
                    vmins.append(float(seg.min()))
                    vmaxs.append(float(seg.max()))
            return pa.table({"iid": pa.array(iids, pa.int64()),
                             "bin": pa.array(bins_, pa.int64()),
                             "n": pa.array(ns, pa.int64()),
                             "vmin": pa.array(vmins, pa.float64()),
                             "vmax": pa.array(vmaxs, pa.float64())})

        agg = (ds.map_batches(hist, batch_format="pyarrow")
               .groupby(["iid", "bin"])
               .aggregate(Sum("n", alias_name="n"),
                          Min("vmin", alias_name="vmin"),
                          Max("vmax", alias_name="vmax"))
               .to_pandas().sort_values(["iid", "bin"]))

        for r, s in active.items():
            lo, hi, rw, _ = s
            i = iv.index((lo, hi))
            h = agg[agg["iid"] == i]
            cum = h["n"].cumsum().to_numpy()
            j = int(np.searchsorted(cum, rw + 1))
            row = h.iloc[j]
            before = int(cum[j - 1]) if j > 0 else 0
            if row["vmin"] == row["vmax"]:          # point mass: exact
                resolved[r] = float(row["vmin"])
                continue
            state[r] = [float(row["vmin"]), float(row["vmax"]),
                        rw - before, int(row["n"])]

    # collect phase: remaining ranks' intervals are tiny — filter & sort
    pending = {r: s for r, s in state.items() if r not in resolved}
    oversize = {r: s[3] for r, s in pending.items() if s[3] > collect_cap}
    if oversize:
        # never silently violate the bounded-state guarantee: refinement
        # exhausted max_passes with a too-populous interval (pathological
        # point-mass-adjacent distributions) — fail with the knobs named
        raise RuntimeError(
            f"exact_quantiles_multipass: {len(oversize)} interval(s) still "
            f"hold > collect_cap={collect_cap} rows after "
            f"max_passes={max_passes} refinement passes "
            f"(worst: {max(oversize.values())} rows); raise max_passes, "
            "n_bins or collect_cap")
    if pending:
        ivs = sorted({(s[0], s[1]) for s in pending.values()})
        ref2 = ray.put(np.array(ivs, dtype=np.float64))

        def grab(t: pa.Table) -> pa.Table:
            arr = ray.get(ref2)
            v = t.column(col).to_numpy().astype(np.float64)
            iids, vals = [], []
            for i, (lo, hi) in enumerate(arr):
                m = v[(v >= lo) & (v <= hi)]
                iids.extend([i] * len(m))
                vals.extend(m.tolist())
            return pa.table({"iid": pa.array(iids, pa.int64()),
                             "v": pa.array(vals, pa.float64())})

        got = ds.map_batches(grab, batch_format="pyarrow").to_pandas()
        for r, (lo, hi, rw, _n) in pending.items():
            i = ivs.index((lo, hi))
            vals = np.sort(got[got["iid"] == i]["v"].to_numpy())
            resolved[r] = float(vals[rw])

    out = []
    for q in qs:
        h = q * (total - 1)
        lo_r = int(np.floor(h))
        frac = h - lo_r
        v = resolved[lo_r]
        if frac > 0:
            # DuckDB's lerp form (see exact_quantiles)
            v = v * (1 - frac) + frac * resolved[lo_r + 1]
        out.append({"q": float(q), "value": v})
    return pd.DataFrame(out)


def set_delta(old: rd.Dataset, new: rd.Dataset, key_cols: list[str],
              num_partitions: "int | None" = None) -> rd.Dataset:
    """SET difference/intersection status between two snapshots of a
    keyed relation: one row per DISTINCT key tuple present in either
    side, with status 'added' (new only), 'removed' (old only) or
    'kept' (both) — the incremental-maintenance primitive (for a KG:
    which (subj, pred, obj) triples a re-crawl added/retired; for a
    crawl: which URLs appeared/vanished between snapshots).

    Plan: each side dedups through one combiner-backed marker
    aggregate (the shuffle moves distinct tuples per batch), then ONE
    co-partitioned FULL OUTER join on the composite key and a
    stateless status map. No driver state; two snapshot scans total."""
    num_partitions = _resolve_partitions(num_partitions)

    def marked(tag: str):
        def f(t: pa.Table) -> pa.Table:
            cols = {c: t.column(c) for c in key_cols}
            cols[tag] = pa.array([1] * t.num_rows, pa.int64())
            return pa.table(cols)
        return f

    def side(ds: rd.Dataset, tag: str) -> rd.Dataset:
        schema = pa.schema([(c, pa.string()) for c in key_cols]
                           + [(tag, pa.int64())])
        return hash_aggregate(
            ds.map_batches(marked(tag), batch_format="pyarrow"),
            keys=key_cols, sum_cols={tag: tag},
            num_partitions=num_partitions,
            out_schema=schema).map_batches(
                lambda t: pa.Table.from_arrays(
                    [t.column(c) for c in key_cols]
                    + [pa.array([1] * t.num_rows, pa.int64())],
                    names=key_cols + [tag]),
                batch_format="pyarrow")

    o = side(old, "_o")
    n = side(new, "_n")
    j = hash_join(
        o, n, on=list(key_cols), how="outer",
        left_schema=pa.schema([(c, pa.string()) for c in key_cols]
                              + [("_o", pa.int64())]),
        right_schema=pa.schema([(c, pa.string()) for c in key_cols]
                               + [("_n", pa.int64())]),
        num_partitions=num_partitions)

    def status(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        has_o = pc.is_valid(t.column("_o"))
        has_n = pc.is_valid(t.column("_n"))
        st = pc.if_else(pc.and_(has_o, has_n), "kept",
                        pc.if_else(has_n, "added", "removed"))
        cols = {c: t.column(c) for c in key_cols}
        cols["status"] = st
        return pa.table(cols)

    return j.map_batches(status, batch_format="pyarrow")


def interval_overlap_join(left: rd.Dataset, right: rd.Dataset,
                          lo_col: str = "lo", hi_col: str = "hi",
                          suffixes: tuple = ("_a", "_b"),
                          bucket_width: "float | None" = None,
                          num_partitions: "int | None" = None,
                          left_schema=None,
                          right_schema=None) -> rd.Dataset:
    """Interval-x-interval OVERLAP join: one output row per pair of
    intervals with ``[lo_a, hi_a] ∩ [lo_b, hi_b] != ∅`` (closed
    endpoints: ``lo_a <= hi_b AND lo_b <= hi_a``).  The
    session-vs-incident / capture-window alignment shape that
    ``range_join`` (point-in-band) can't express.

    Plan: both sides explode each interval to every coarse bucket it
    overlaps (``bucket_width`` defaults to the WIDEST interval on
    either side, so amplification <= 2 per row), ONE bucket-hash
    exchange co-locates candidates, and an in-partition vectorized
    merge applies the overlap predicate.  A qualifying pair shares
    every bucket both intervals span — it is emitted ONLY in the
    bucket containing ``max(lo_a, lo_b)`` (the overlap start), which
    both intervals provably cover, so no post-join dedup exchange is
    needed.  All columns come back suffixed.

    Scale notes: amplification for an interval of width W is
    ``W/bucket_width + 1`` — a few giant intervals with a small width
    knob explode; leave ``bucket_width`` at the default (auto = widest
    interval) unless the width histogram is known.  A bucket holding
    k_a x k_b candidates does k_a*k_b comparisons — dense overlap
    regions are inherently quadratic in OUTPUT, not in the plan."""
    import numpy as np

    num_partitions = _resolve_partitions(num_partitions)

    def _names_types(ds, given):
        if given is not None:
            return list(given.names), {n: given.field(n).type
                                       for n in given.names}
        s = ds.schema()
        return list(s.names), {n: _arrow_type(t)
                               for n, t in zip(s.names, s.types)}

    l_names, l_types = _names_types(left, left_schema)
    r_names, r_types = _names_types(right, right_schema)

    if bucket_width is None:
        from ray.data.aggregate import Max

        def widths(t: pa.Table, out: str) -> pa.Table:
            lo = t.column(lo_col).to_numpy().astype(np.float64)
            hi = t.column(hi_col).to_numpy().astype(np.float64)
            bad = ~(np.isfinite(lo) & np.isfinite(hi) & (hi >= lo))
            if bad.any():
                i = int(np.argmax(bad))
                raise ValueError(
                    f"interval_overlap_join: invalid interval "
                    f"[{lo[i]!r}, {hi[i]!r}] — need finite "
                    f"{lo_col} <= {hi_col}")
            return pa.table({out: pa.array(hi - lo, pa.float64())})

        w_l = left.map_batches(lambda t: widths(t, "w"),
                               batch_format="pyarrow").max("w")
        w_r = right.map_batches(lambda t: widths(t, "w"),
                                batch_format="pyarrow").max("w")
        bucket_width = max(float(w_l), float(w_r), 1e-9)

    a_cols = [c + suffixes[0] for c in l_names]
    b_cols = [c + suffixes[1] for c in r_names]
    # both exploded streams share ONE padded arrow schema (the
    # hash_join union pattern): the other side's columns ride as
    # typed nulls, so the union never NaN-degrades integer ids
    pad_schema = pa.schema(
        [("_bucket", pa.int64()), ("_part", pa.int64())]
        + [(c + suffixes[0], l_types[c]) for c in l_names]
        + [(c + suffixes[1], r_types[c]) for c in r_names]
        + [("_side", pa.int8())])

    def explode(side: int, names: list[str], sfx: str):
        def f(t: pa.Table) -> pa.Table:
            lo = t.column(lo_col).to_numpy().astype(np.float64)
            hi = t.column(hi_col).to_numpy().astype(np.float64)
            b0 = np.floor(lo / bucket_width).astype(np.int64)
            b1 = np.floor(hi / bucket_width).astype(np.int64)
            reps = (b1 - b0 + 1).astype(np.int64)
            idx = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                            reps)
            bucket = np.concatenate(
                [np.arange(a, b + 1, dtype=np.int64)
                 for a, b in zip(b0, b1)]) if t.num_rows else \
                np.empty(0, np.int64)
            taken = t.take(pa.array(idx))
            n = len(bucket)
            own = {c + sfx: taken.column(c).cast(
                pad_schema.field(c + sfx).type) for c in names}
            arrays = []
            for fld in pad_schema:
                if fld.name == "_bucket":
                    arrays.append(pa.array(bucket, pa.int64()))
                elif fld.name == "_part":
                    arrays.append(pa.array(bucket % num_partitions,
                                           pa.int64()))
                elif fld.name == "_side":
                    arrays.append(pa.array(
                        np.full(n, side, dtype=np.int8)))
                elif fld.name in own:
                    arrays.append(own[fld.name])
                else:
                    arrays.append(_pad_filler(n, fld.type))
            return pa.Table.from_arrays(arrays, schema=pad_schema)
        return f

    la, ha = lo_col + suffixes[0], hi_col + suffixes[0]
    lb, hb = lo_col + suffixes[1], hi_col + suffixes[1]
    out_cols = a_cols + b_cols
    out_schema = pa.schema(
        [(c + suffixes[0], l_types[c]) for c in l_names]
        + [(c + suffixes[1], r_types[c]) for c in r_names])
    l_dtypes = {c + suffixes[0]: _nullable_dtype(l_types[c])
                for c in l_names}
    r_dtypes = {c + suffixes[1]: _nullable_dtype(r_types[c])
                for c in r_names}

    def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0][["_bucket"] + a_cols].astype(l_dtypes)
        rg = g[g["_side"] == 1][["_bucket"] + b_cols].astype(r_dtypes)
        m = lg.merge(rg, on="_bucket")
        if m.empty:
            return pd.DataFrame(columns=out_cols)
        keep = ((m[la] <= m[hb]) & (m[lb] <= m[ha])
                & (np.floor(
                    np.maximum(m[la].to_numpy(np.float64),
                               m[lb].to_numpy(np.float64))
                    / bucket_width).astype("int64")
                   == m["_bucket"]))
        return m[keep.to_numpy(dtype=bool)][out_cols]

    both = (left.map_batches(explode(0, l_names, suffixes[0]),
                             batch_format="pyarrow")
            .union(right.map_batches(explode(1, r_names, suffixes[1]),
                                     batch_format="pyarrow")))
    return typed_groupby_map(both, "_part", bucket_merge, out_schema)

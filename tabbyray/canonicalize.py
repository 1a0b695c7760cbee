"""Canonicalization — the skew-critical second shuffle (north rule).

Unifies subject nodes of the emitted triples by normalized surface
form: all subject URIs whose local names normalize to the same key
(`tabbyray.normalize.normalize_entry` — the same M1 parity function,
`components/CanonicalTableAnnotator.php:121-137`) are rewritten to one
canonical representative (the most frequent URI; ties broken
lexicographically for determinism).

Head-entity skew (country/year-like subjects, BASELINE.json) is handled
with a salted two-phase aggregate, and EVERY phase is distributed — no
single-task reducer and no driver materialization anywhere:

1. **partial** — inside ``map_batches`` each batch pre-aggregates
   ``(norm_key, subj) -> count`` (combiner), then tags each partial row
   with ``salt = hash(subj) % S``;
2. **phase 1** — ``groupby(norm_key, salt, subj)`` native vectorized
   Sum: merges partials so no single reducer sees all partial rows of a
   hot key (a hot key contributes one row per batch otherwise);
3. **phase 2** — explicit hash partition on ``norm_key`` (P bounded
   partitions), one vectorized pandas argmax per partition picks each
   key's representative. Output is a distributed mapping Dataset at
   distinct-subject scale.

The rewrite pass then joins the mapping back onto the triples:
*broadcast* (``ray.put`` once, dictionary-encoded lookup per batch)
while the mapping fits a worker, else a *co-partitioned shuffle join*
on the normalized key (``ops.relational.hash_join``) — two passes, one
for ``subj`` and one for entity ``obj``. ``mode="auto"`` picks by
mapping row count. Both paths are output-identical (tested).
"""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .ops.relational import _resolve_partitions

from .normalize import normalize_entry, strip_uri_prefix

DEFAULT_SALT = 16
# above this many distinct norm keys the winners map stops being
# broadcast and the rewrite becomes a shuffle join (each entry is a
# short URI pair; 5M entries ~ a few hundred MB of Python dict)
BROADCAST_MAX_KEYS = 5_000_000


def _partial_counts(batch: pa.Table, num_salt: int) -> pa.Table:
    """Per-batch combiner: (norm_key, subj) -> count, salted. Counting
    is a vectorized Arrow ``value_counts``; the regex-heavy
    normalization runs once per DISTINCT subject only — head-entity
    skew makes subjects highly repetitive."""
    import pyarrow.compute as pc
    vc = pc.value_counts(batch.column("subj").combine_chunks())
    subjs = vc.field("values").to_pylist()
    cnts = vc.field("counts").to_pylist()
    keys = [normalize_entry(strip_uri_prefix(s)) for s in subjs]
    salts = [zlib.crc32(s.encode()) % num_salt for s in subjs]
    return pa.table({"norm_key": keys, "subj": subjs, "cnt": cnts,
                     "salt": pa.array(salts, pa.int32())})


def canonical_map(triples: rd.Dataset, num_salt: int = DEFAULT_SALT,
                  num_partitions: "int | None" = None) -> rd.Dataset:
    """norm_key -> (canonical_subj, support) mapping as a DISTRIBUTED
    Dataset (distinct-subject scale).

    Phase 1 is a native grouped aggregate (vectorized sort-based Sum)
    over the salted key — no per-group Python, no reducer hotspot.
    Phase 2 re-partitions the (small) phase-1 output by
    ``hash(norm_key) % P`` and resolves every key of a partition with
    ONE vectorized pandas argmax — distributed, bounded task count, no
    ``repartition(1)`` funnel."""
    num_partitions = _resolve_partitions(num_partitions)
    from ray.data.aggregate import Sum

    partial = triples.map_batches(
        lambda t, n=num_salt: _partial_counts(t, n), batch_format="pyarrow")
    # ONE salted shuffle: unique (norm_key, salt, subj) rows out — no
    # reducer sees more than ~1/num_salt of a hot key's partials.
    phase1 = partial.groupby(["norm_key", "salt", "subj"]).aggregate(
        Sum("cnt", alias_name="cnt"))

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_part"] = (pd.util.hash_pandas_object(df["norm_key"], index=False)
                       % num_partitions).astype("int64")
        return df

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        # all salt splits of every norm_key of this partition are here:
        # merge them, then argmax (cnt desc, subj asc) per key — all
        # vectorized.
        m = df.groupby(["norm_key", "subj"], as_index=False)["cnt"].sum()
        m = m.sort_values(["cnt", "subj"], ascending=[False, True], kind="stable")
        best = m.drop_duplicates(subset=["norm_key"], keep="first")
        tot = m.groupby("norm_key", as_index=False)["cnt"].sum()
        out = best[["norm_key", "subj"]].merge(tot, on="norm_key")
        return out.rename(columns={"subj": "canonical_subj", "cnt": "support"})

    from .ops.relational import typed_groupby_map
    return typed_groupby_map(
        phase1.map_batches(add_part, batch_format="pandas"), "_part", resolve,
        pa.schema([("norm_key", pa.string()), ("canonical_subj", pa.string()),
                   ("support", pa.int64())]))


def _norm_key_column(col) -> pa.Array:
    """Vectorized norm-key of a URI column: dictionary-encode so the
    Python normalization runs once per DISTINCT uri, then a take."""
    import pyarrow.compute as pc
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = pc.dictionary_encode(col)
    keys = pa.array([normalize_entry(strip_uri_prefix(u))
                     for u in d.dictionary.to_pylist()], pa.string())
    return keys.take(d.indices)


def _rewrite_broadcast(triples: rd.Dataset, lookup_ref) -> rd.Dataset:
    def rewrite(batch: pa.Table) -> pa.Table:
        # stateless task; ray.get of the broadcast ref hits the local
        # object store after the first batch on a worker. Columns are
        # dictionary-encoded so the python mapping runs once per
        # DISTINCT uri; the row-level rewrite is a vectorized take.
        import pyarrow.compute as pc
        lk = ray.get(lookup_ref)

        def canon(u: str) -> str:
            return lk.get(normalize_entry(strip_uri_prefix(u)), u)

        def as_array(col) -> pa.Array:
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if isinstance(col, pa.ChunkedArray):   # older pyarrow keeps chunked
                col = col.chunk(0) if col.num_chunks else pa.array([], col.type)
            return col

        def map_column(col) -> pa.Array:
            d = pc.dictionary_encode(as_array(col))
            mapped = pa.array([canon(u) for u in d.dictionary.to_pylist()],
                              pa.string())
            return mapped.take(d.indices)

        new_s = map_column(batch.column("subj"))
        mapped_o = map_column(batch.column("obj"))
        lit = as_array(batch.column("obj_is_literal"))
        new_o = pc.if_else(lit, as_array(batch.column("obj")), mapped_o)
        return (batch
                .set_column(batch.column_names.index("subj"), "subj", new_s)
                .set_column(batch.column_names.index("obj"), "obj", new_o))

    return triples.map_batches(rewrite, batch_format="pyarrow")


def _rewrite_join(triples: rd.Dataset, mapping: rd.Dataset,
                  num_partitions: "int | None" = None) -> rd.Dataset:
    """Scale path: rewrite subj then entity-obj via two co-partitioned
    LEFT joins against the winners dataset — nothing corpus-sized ever
    leaves the distributed plan."""
    import pyarrow.compute as pc

    from .ops.relational import hash_join

    win = mapping.select_columns(["norm_key", "canonical_subj"])
    win_schema = pa.schema([("norm_key", pa.string()),
                            ("canonical_subj", pa.string())])
    # triples is a read/materialized dataset at every call site, so this
    # schema probe is metadata-cheap; the join sides derived from lazy
    # transforms get their schemas passed explicitly below
    from .ops.relational import _arrow_type
    ts = triples.schema()
    base = pa.schema([(n, _arrow_type(t)) for n, t in zip(ts.names, ts.types)])
    keyed = base.append(pa.field("norm_key", pa.string()))

    def add_subj_key(t: pa.Table) -> pa.Table:
        return t.append_column("norm_key", _norm_key_column(t.column("subj")))

    def apply_subj(t: pa.Table) -> pa.Table:
        won = t.column("canonical_subj")
        subj = pc.if_else(pc.is_valid(won), won, t.column("subj"))
        t = t.drop_columns(["norm_key", "canonical_subj"])
        return t.set_column(t.column_names.index("subj"), "subj",
                            subj.combine_chunks().cast(pa.string()))

    step1 = hash_join(
        triples.map_batches(add_subj_key, batch_format="pyarrow"),
        win, on="norm_key", how="left", num_partitions=num_partitions,
        left_schema=keyed, right_schema=win_schema,
    ).map_batches(apply_subj, batch_format="pyarrow")

    def add_obj_key(t: pa.Table) -> pa.Table:
        # literal objects get an empty key (no winner has key "" clash
        # risk: the join result is masked by obj_is_literal anyway)
        key = _norm_key_column(t.column("obj"))
        return t.append_column("norm_key", key)

    def apply_obj(t: pa.Table) -> pa.Table:
        won = t.column("canonical_subj")
        lit = t.column("obj_is_literal")
        use_win = pc.and_(pc.is_valid(won), pc.invert(lit))
        obj = pc.if_else(use_win, won, t.column("obj"))
        t = t.drop_columns(["norm_key", "canonical_subj"])
        return t.set_column(t.column_names.index("obj"), "obj",
                            obj.combine_chunks().cast(pa.string()))

    return hash_join(
        step1.map_batches(add_obj_key, batch_format="pyarrow"),
        win, on="norm_key", how="left", num_partitions=num_partitions,
        left_schema=keyed, right_schema=win_schema,
    ).map_batches(apply_obj, batch_format="pyarrow")


def rewrite_with_mapping(triples: rd.Dataset, mapping: rd.Dataset,
                         mode: str = "auto",
                         broadcast_max_keys: int = BROADCAST_MAX_KEYS) -> rd.Dataset:
    """The rewrite half of canonicalization, reusable against a
    PRECOMPUTED (materialized) mapping — the resumable CLI computes the
    mapping once, commits it with a manifest, then rewrites shard by
    shard (tabbyray.lineage.run_canonicalize_resumable)."""
    if mode == "auto":
        mode = "broadcast" if mapping.count() <= broadcast_max_keys else "join"
    if mode == "join":
        return _rewrite_join(triples, mapping)
    mdf = mapping.to_pandas()
    lookup_ref = ray.put(dict(zip(mdf["norm_key"], mdf["canonical_subj"])))
    return _rewrite_broadcast(triples, lookup_ref)


def canonicalize_triples(triples: rd.Dataset, num_salt: int = DEFAULT_SALT,
                         mode: str = "auto",
                         broadcast_max_keys: int = BROADCAST_MAX_KEYS) -> rd.Dataset:
    """Rewrite ``subj`` (and entity ``obj``) to canonical representatives.

    ``mode``: "broadcast" ships the winners map once via ``ray.put``
    (right while distinct-subject count fits a worker); "join" runs the
    co-partitioned shuffle-join rewrite (the 100-TB path, where the
    distinct-subject table is itself large); "auto" (default) picks by
    the mapping's row count. Both paths are output-identical.
    """
    mapping = canonical_map(triples, num_salt).materialize()
    return rewrite_with_mapping(triples, mapping, mode, broadcast_max_keys)

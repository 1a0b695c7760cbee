"""Canonicalization — the skew-critical second shuffle (north rule).

Unifies subject nodes of the emitted triples by normalized surface
form: all subject URIs whose local names normalize to the same key
(`tabbyray.normalize.normalize_entry` — the same M1 parity function,
`components/CanonicalTableAnnotator.php:121-137`) are rewritten to one
canonical representative (the most frequent URI; ties broken
lexicographically for determinism).

Head-entity skew (country/year-like subjects, BASELINE.json) is handled
with a salted two-phase aggregate:

1. **partial** — inside ``map_batches`` each batch pre-aggregates
   ``(norm_key, subj) -> count`` (combiner), then tags each partial row
   with ``salt = hash(subj) % S``;
2. **phase 1** — ``groupby(norm_key, salt)``: merges partials so no
   single reducer sees all rows of a hot key;
3. **phase 2** — ``groupby(norm_key)`` over the <= S rows per key to
   pick the representative.

The winners map is small (distinct-subject scale, not triple scale) and
is broadcast via ``ray.put`` for the final rewrite pass. The salted
plan is output-identical to the unsalted plan (tested on the F6 skew
fixture).
"""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .normalize import normalize_entry, strip_uri_prefix

DEFAULT_SALT = 16


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


def canonical_map(triples: rd.Dataset, num_salt: int = DEFAULT_SALT) -> rd.Dataset:
    """norm_key -> canonical_subj mapping as a (small) Dataset.

    Both merge phases are NATIVE grouped aggregates (vectorized
    sort-based Sum) — no per-group Python. The salted phase-1 key
    ``(norm_key, salt, subj)`` bounds any reducer's share of a hot key;
    phase 2 runs over <= num_salt rows per (key, subj). The final
    representative pick is a vectorized per-batch argmax after the
    phase-2 shuffle has co-located each norm_key."""
    from ray.data.aggregate import Sum

    partial = triples.map_batches(
        lambda t, n=num_salt: _partial_counts(t, n), batch_format="pyarrow")
    # ONE salted shuffle: unique (norm_key, salt, subj) rows out — no
    # reducer sees more than ~1/num_salt of a hot key's partials.
    phase1 = partial.groupby(["norm_key", "salt", "subj"]).aggregate(
        Sum("cnt", alias_name="cnt"))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        # phase 2 over the dimension-sized (distinct-subject-scale)
        # phase-1 output, coalesced into one block: merge salt splits,
        # then argmax (cnt desc, subj asc) per norm_key — vectorized.
        m = df.groupby(["norm_key", "subj"], as_index=False)["cnt"].sum()
        m = m.sort_values(["cnt", "subj"], ascending=[False, True], kind="stable")
        best = m.drop_duplicates(subset=["norm_key"], keep="first")
        tot = m.groupby("norm_key", as_index=False)["cnt"].sum()
        out = best[["norm_key", "subj"]].merge(tot, on="norm_key")
        return out.rename(columns={"subj": "canonical_subj", "cnt": "support"})

    return phase1.repartition(1).map_batches(resolve, batch_format="pandas")


def canonicalize_triples(triples: rd.Dataset, num_salt: int = DEFAULT_SALT) -> rd.Dataset:
    """Rewrite ``subj`` (and entity ``obj``) to canonical representatives.

    The mapping is materialized (it is distinct-entity-sized, orders of
    magnitude smaller than the triples) and broadcast once.
    """
    mapping = canonical_map(triples, num_salt).to_pandas()
    lookup = dict(zip(mapping["norm_key"], mapping["canonical_subj"]))
    lookup_ref = ray.put(lookup)

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

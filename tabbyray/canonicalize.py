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
    """Per-batch combiner: (norm_key, subj) -> count, salted."""
    subs = batch.column("subj").to_pylist()
    counts: dict[tuple[str, str], int] = {}
    for s in subs:
        k = normalize_entry(strip_uri_prefix(s))
        counts[(k, s)] = counts.get((k, s), 0) + 1
    keys, subjs, cnts, salts = [], [], [], []
    for (k, s), c in counts.items():
        keys.append(k)
        subjs.append(s)
        cnts.append(c)
        salts.append(zlib.crc32(s.encode()) % num_salt)
    return pa.table({"norm_key": keys, "subj": subjs, "cnt": cnts,
                     "salt": pa.array(salts, pa.int32())})


def _merge_group(g: pd.DataFrame) -> pd.DataFrame:
    out = g.groupby(["norm_key", "subj"], as_index=False)["cnt"].sum()
    return out


def _pick_representative(g: pd.DataFrame) -> pd.DataFrame:
    g = g.groupby(["norm_key", "subj"], as_index=False)["cnt"].sum()
    g = g.sort_values(["cnt", "subj"], ascending=[False, True], kind="stable")
    top = g.iloc[0]
    return pd.DataFrame({"norm_key": [top["norm_key"]],
                         "canonical_subj": [top["subj"]],
                         "support": [int(g["cnt"].sum())]})


def canonical_map(triples: rd.Dataset, num_salt: int = DEFAULT_SALT) -> rd.Dataset:
    """norm_key -> canonical_subj mapping as a (small) Dataset."""
    partial = triples.map_batches(
        lambda t, n=num_salt: _partial_counts(t, n), batch_format="pyarrow")
    phase1 = partial.groupby(["norm_key", "salt"]).map_groups(
        _merge_group, batch_format="pandas")
    phase2 = phase1.groupby("norm_key").map_groups(
        _pick_representative, batch_format="pandas")
    return phase2


def canonicalize_triples(triples: rd.Dataset, num_salt: int = DEFAULT_SALT) -> rd.Dataset:
    """Rewrite ``subj`` (and entity ``obj``) to canonical representatives.

    The mapping is materialized (it is distinct-entity-sized, orders of
    magnitude smaller than the triples) and broadcast once.
    """
    mapping = canonical_map(triples, num_salt).to_pandas()
    lookup = dict(zip(mapping["norm_key"], mapping["canonical_subj"]))
    lookup_ref = ray.put(lookup)

    class Rewrite:
        def __init__(self, ref):
            self.lookup = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            subs = batch.column("subj").to_pylist()
            objs = batch.column("obj").to_pylist()
            lits = batch.column("obj_is_literal").to_pylist()
            new_s = [self.lookup.get(normalize_entry(strip_uri_prefix(s)), s) for s in subs]
            new_o = [o if lit else self.lookup.get(normalize_entry(strip_uri_prefix(o)), o)
                     for o, lit in zip(objs, lits)]
            return (batch
                    .set_column(batch.column_names.index("subj"), "subj", pa.array(new_s, pa.string()))
                    .set_column(batch.column_names.index("obj"), "obj", pa.array(new_o, pa.string())))

    return triples.map_batches(Rewrite, fn_constructor_kwargs={"ref": lookup_ref},
                               batch_format="pyarrow", concurrency=(1, 8))

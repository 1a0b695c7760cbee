"""KG schema-profiling operators over (subj, pred, obj) triple streams.

After extraction + canonicalization a KG-construction pipeline needs to
*induce* schema facts from the triple stream itself — the reference
hard-codes its ontology (components/CanonicalTableAnnotator.php
ONTOLOGY_CLASSES / relationship lookup, :382-415), but at corpus scale
the cardinality/inverse/path structure must be measured, not assumed.
These operators profile exactly that:

* ``predicate_cardinality`` — per predicate: distinct-pair count,
  subject/object fan-out, functional / inverse-functional shares and a
  1:1 / 1:N / N:1 / N:M class. Plan: one distinct-triple exchange
  (count combiner), two fan-out aggregates (pred,subj) / (pred,obj),
  two per-pred rollups, one co-partitioned join. Every exchange is a
  combiner-backed hash aggregate — the hot predicate (99% of a real KG
  can be one predicate) ships per-batch partials, never rows.
* ``inverse_predicates`` — candidate inverse pairs (p, q) by the
  Jaccard of edge-set(p) against REVERSED edge-set(q): one distinct
  exchange, one composite-key (a, b) co-partitioned self-join, one
  (p, q) count aggregate, two tiny per-pred-count joins. p == q rows
  report the predicate's own symmetry share under the same formula.
  Self-loops (subj == obj) are excluded — a loop trivially matches its
  own reverse and would inflate every symmetry score.
* ``path2_profile`` — 2-hop predicate-path profile: for every chain
  (s)-[p1]->(m)-[p2]->(o), per (p1, p2) the path-instance count and
  the distinct (s, o) endpoint-pair count. Plan: one distinct
  exchange, ONE mid-node co-partitioned self-join, one
  (p1, p2, s, o) combiner aggregate, one small per-(p1, p2) rollup.
  The mid-node join is the classic skew point (a hub entity fans out
  quadratically) — pass ``skew_threshold`` through to ``hash_join``
  when profiling a corpus-scale KG.

All outputs quantize float shares/scores to 9 dp (the repo-wide
float-tie rule) with the SAME arithmetic expression the DuckDB oracles
use, so hash checks cannot drift on summation order.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from .relational import hash_aggregate, hash_join, partial_agg_sum

_SPO = ("subj", "pred", "obj")


def _distinct_triples(triples: rd.Dataset,
                      subj_col: str = "subj", pred_col: str = "pred",
                      obj_col: str = "obj",
                      drop_loops: bool = False,
                      num_partitions: "int | None" = None) -> rd.Dataset:
    """Distinct (subj, pred, obj) rows via one combiner-backed hash
    aggregate (the count column is dropped). Optionally removes
    self-loops before the distinct."""
    import pyarrow.compute as pc

    def base(t: pa.Table) -> pa.Table:
        out = pa.table({
            "subj": pc.cast(t.column(subj_col), pa.string()),
            "pred": pc.cast(t.column(pred_col), pa.string()),
            "obj": pc.cast(t.column(obj_col), pa.string()),
            "one": pa.array([1] * t.num_rows, pa.int64())})
        if drop_loops:
            out = out.filter(pc.not_equal(out.column("subj"),
                                          out.column("obj")))
        return out

    agg = hash_aggregate(
        triples.map_batches(base, batch_format="pyarrow"),
        keys=list(_SPO), sum_cols={"one": "_n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("subj", pa.string()),
                              ("pred", pa.string()),
                              ("obj", pa.string()),
                              ("_n", pa.int64())]))
    return agg.drop_columns(["_n"])


def predicate_cardinality(triples: rd.Dataset,
                          subj_col: str = "subj", pred_col: str = "pred",
                          obj_col: str = "obj",
                          num_partitions: "int | None" = None
                          ) -> rd.Dataset:
    """Per-predicate cardinality profile over DISTINCT triples.

    Output one row per predicate: ``n_pairs`` (distinct subj/obj
    pairs), ``n_subjects`` / ``n_objects`` (distinct), ``n_multi_subj``
    (subjects with >1 object), ``n_multi_obj`` (objects with >1
    subject), ``functional_share`` = (n_subjects - n_multi_subj) /
    n_subjects, ``inv_functional_share`` analogously, and
    ``cardinality`` in {'1:1','1:N','N:1','N:M'} read subject-side :
    object-side — 'N:' when some object is shared by several subjects,
    ':N' when some subject fans out to several objects."""
    import numpy as np
    import pyarrow.compute as pc

    e = _distinct_triples(triples, subj_col, pred_col, obj_col,
                          num_partitions=num_partitions).materialize()

    def fan(ds: rd.Dataset, key2: str) -> rd.Dataset:
        def one(t: pa.Table) -> pa.Table:
            return t.append_column("one",
                                   pa.array([1] * t.num_rows, pa.int64()))
        return hash_aggregate(
            ds.map_batches(one, batch_format="pyarrow"),
            keys=["pred", key2], sum_cols={"one": "n_fan"},
            num_partitions=num_partitions,
            out_schema=pa.schema([("pred", pa.string()),
                                  (key2, pa.string()),
                                  ("n_fan", pa.int64())]))

    def roll(ds: rd.Dataset, n_alias: str, multi_alias: str,
             pairs_alias: "str | None") -> rd.Dataset:
        def ind(t: pa.Table) -> pa.Table:
            n = t.column("n_fan")
            cols = {"pred": t.column("pred"),
                    "one": pa.array([1] * t.num_rows, pa.int64()),
                    "multi": pc.cast(pc.greater(n, 1), pa.int64())}
            if pairs_alias:
                cols["n_fan"] = n
            return pa.table(cols)
        sums = {"one": n_alias, "multi": multi_alias}
        if pairs_alias:
            sums["n_fan"] = pairs_alias
        return partial_agg_sum(
            ds.map_batches(ind, batch_format="pyarrow"), "pred", sums)

    subj_side = roll(fan(e, "subj"), "n_subjects", "n_multi_subj",
                     "n_pairs")
    obj_side = roll(fan(e, "obj"), "n_objects", "n_multi_obj", None)

    j = hash_join(
        subj_side, obj_side, on="pred",
        left_schema=pa.schema([("pred", pa.string()),
                               ("n_subjects", pa.int64()),
                               ("n_multi_subj", pa.int64()),
                               ("n_pairs", pa.int64())]),
        right_schema=pa.schema([("pred", pa.string()),
                                ("n_objects", pa.int64()),
                                ("n_multi_obj", pa.int64())]),
        num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        ns = t.column("n_subjects").to_numpy(zero_copy_only=False)
        ms = t.column("n_multi_subj").to_numpy(zero_copy_only=False)
        no = t.column("n_objects").to_numpy(zero_copy_only=False)
        mo = t.column("n_multi_obj").to_numpy(zero_copy_only=False)
        func = np.round((ns - ms) * 1.0 / ns, 9)
        inv = np.round((no - mo) * 1.0 / no, 9)
        card = np.select(
            [(mo > 0) & (ms > 0), mo > 0, ms > 0],
            ["N:M", "N:1", "1:N"], default="1:1").astype(object)
        return pa.table({
            "pred": t.column("pred"),
            "n_pairs": t.column("n_pairs"),
            "n_subjects": t.column("n_subjects"),
            "n_objects": t.column("n_objects"),
            "n_multi_subj": t.column("n_multi_subj"),
            "n_multi_obj": t.column("n_multi_obj"),
            "functional_share": pa.array(func, pa.float64()),
            "inv_functional_share": pa.array(inv, pa.float64()),
            "cardinality": pa.array(list(card), pa.string())})

    return j.map_batches(finish, batch_format="pyarrow")


def inverse_predicates(triples: rd.Dataset,
                       subj_col: str = "subj", pred_col: str = "pred",
                       obj_col: str = "obj",
                       min_common: int = 1,
                       num_partitions: "int | None" = None
                       ) -> rd.Dataset:
    """Inverse-predicate candidates: per ordered predicate pair (p, q),
    ``n_common`` = |edges(p) ∩ reversed(edges(q))| over distinct
    loop-free edges, per-pred sizes and ``jaccard`` = n_common /
    (n_p + n_q - n_common), rounded 9 dp. Rows with p == q measure the
    predicate's own symmetry. Only pairs with n_common >= min_common
    are emitted (the zero-intersection cross product never
    materializes anywhere)."""
    import numpy as np

    e = _distinct_triples(triples, subj_col, pred_col, obj_col,
                          drop_loops=True,
                          num_partitions=num_partitions).materialize()

    fwd = e.map_batches(
        lambda t: pa.table({"a": t.column("subj"), "b": t.column("obj"),
                            "p": t.column("pred")}),
        batch_format="pyarrow")
    rev = e.map_batches(
        lambda t: pa.table({"a": t.column("obj"), "b": t.column("subj"),
                            "q": t.column("pred")}),
        batch_format="pyarrow")

    pair_schema = pa.schema([("a", pa.string()), ("b", pa.string())])
    j = hash_join(
        fwd, rev, on=["a", "b"],
        left_schema=pair_schema.append(pa.field("p", pa.string())),
        right_schema=pair_schema.append(pa.field("q", pa.string())),
        num_partitions=num_partitions)

    def one(t: pa.Table) -> pa.Table:
        return pa.table({"p": t.column("p"), "q": t.column("q"),
                         "one": pa.array([1] * t.num_rows, pa.int64())})

    common = hash_aggregate(
        j.map_batches(one, batch_format="pyarrow"),
        keys=["p", "q"], sum_cols={"one": "n_common"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("p", pa.string()), ("q", pa.string()),
                              ("n_common", pa.int64())]))

    def pcount(t: pa.Table) -> pa.Table:
        return pa.table({"pred": t.column("pred"),
                         "one": pa.array([1] * t.num_rows, pa.int64())})

    counts = partial_agg_sum(
        e.map_batches(pcount, batch_format="pyarrow"), "pred",
        {"one": "n"})

    np_side = counts.map_batches(
        lambda t: pa.table({"p": t.column("pred"), "n_p": t.column("n")}),
        batch_format="pyarrow")
    nq_side = counts.map_batches(
        lambda t: pa.table({"q": t.column("pred"), "n_q": t.column("n")}),
        batch_format="pyarrow")

    j1 = hash_join(
        common, np_side, on="p",
        left_schema=pa.schema([("p", pa.string()), ("q", pa.string()),
                               ("n_common", pa.int64())]),
        right_schema=pa.schema([("p", pa.string()),
                                ("n_p", pa.int64())]),
        num_partitions=num_partitions)
    j2 = hash_join(
        j1, nq_side, on="q",
        left_schema=pa.schema([("p", pa.string()), ("q", pa.string()),
                               ("n_common", pa.int64()),
                               ("n_p", pa.int64())]),
        right_schema=pa.schema([("q", pa.string()),
                                ("n_q", pa.int64())]),
        num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.filter(pc.greater_equal(t.column("n_common"),
                                      min_common))
        nc = t.column("n_common").to_numpy(zero_copy_only=False)
        n_p = t.column("n_p").to_numpy(zero_copy_only=False)
        n_q = t.column("n_q").to_numpy(zero_copy_only=False)
        jac = np.round(nc * 1.0 / (n_p + n_q - nc), 9) if len(nc) \
            else np.zeros(0)
        return pa.table({
            "p": t.column("p"), "q": t.column("q"),
            "n_common": t.column("n_common"),
            "n_p": t.column("n_p"), "n_q": t.column("n_q"),
            "jaccard": pa.array(jac, pa.float64())})

    return j2.map_batches(finish, batch_format="pyarrow")


def path2_profile(triples: rd.Dataset,
                  subj_col: str = "subj", pred_col: str = "pred",
                  obj_col: str = "obj",
                  num_partitions: "int | None" = None,
                  skew_threshold: "int | None" = None) -> rd.Dataset:
    """2-hop predicate-path profile over distinct edges: per (p1, p2),
    ``n_paths`` = count of chains (s)-[p1]->(m)-[p2]->(o) and
    ``n_pairs`` = distinct (s, o) endpoint pairs. ``skew_threshold``
    forwards to the mid-node self-join (hub entities are the skew
    risk)."""
    e = _distinct_triples(triples, subj_col, pred_col, obj_col,
                          num_partitions=num_partitions).materialize()

    left = e.map_batches(
        lambda t: pa.table({"m": t.column("obj"), "s": t.column("subj"),
                            "p1": t.column("pred")}),
        batch_format="pyarrow")
    right = e.map_batches(
        lambda t: pa.table({"m": t.column("subj"), "o": t.column("obj"),
                            "p2": t.column("pred")}),
        batch_format="pyarrow")

    j = hash_join(
        left, right, on="m",
        left_schema=pa.schema([("m", pa.string()), ("s", pa.string()),
                               ("p1", pa.string())]),
        right_schema=pa.schema([("m", pa.string()), ("o", pa.string()),
                                ("p2", pa.string())]),
        num_partitions=num_partitions, skew_threshold=skew_threshold)

    def one(t: pa.Table) -> pa.Table:
        return pa.table({"p1": t.column("p1"), "p2": t.column("p2"),
                         "s": t.column("s"), "o": t.column("o"),
                         "one": pa.array([1] * t.num_rows, pa.int64())})

    per_pair = hash_aggregate(
        j.map_batches(one, batch_format="pyarrow"),
        keys=["p1", "p2", "s", "o"], sum_cols={"one": "n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("p1", pa.string()), ("p2", pa.string()),
                              ("s", pa.string()), ("o", pa.string()),
                              ("n", pa.int64())]))

    def ind(t: pa.Table) -> pa.Table:
        return pa.table({"p1": t.column("p1"), "p2": t.column("p2"),
                         "n": t.column("n"),
                         "one": pa.array([1] * t.num_rows, pa.int64())})

    return partial_agg_sum(
        per_pair.map_batches(ind, batch_format="pyarrow"),
        ["p1", "p2"], {"n": "n_paths", "one": "n_pairs"})

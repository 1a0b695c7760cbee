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


# Lexical-datatype classes in PRECEDENCE ORDER: a form is assigned the
# FIRST matching class. The regexes are RE2-compatible and evaluated
# with full-string anchoring on both engines (pyarrow match with ^$,
# DuckDB regexp_full_match), so the oracle CASE chain is bit-identical.
DATATYPE_RULES: list[tuple[str, str]] = [
    ("uri", r"https?://\S+"),
    ("boolean", r"true|false"),
    ("date", r"[0-9]{4}-[0-9]{2}-[0-9]{2}"),
    ("integer", r"[+-]?[0-9]+"),
    ("decimal", r"[+-]?[0-9]+\.[0-9]+"),
]


def classify_datatypes(obj: pa.Array) -> pa.Array:
    """Vectorized first-match lexical-datatype classification of a
    string array ('string' when nothing matches — incl. empty/null)."""
    import numpy as np
    import pyarrow.compute as pc

    obj = pc.fill_null(pc.cast(obj, pa.string()), "")
    out = np.full(len(obj), "string", dtype=object)
    unassigned = np.ones(len(obj), dtype=bool)
    for name, pat in DATATYPE_RULES:
        m = pc.match_substring_regex(obj, f"^(?:{pat})$").to_numpy(
            zero_copy_only=False)
        hit = unassigned & m
        out[hit] = name
        unassigned &= ~m
    return pa.array(out, pa.string())


def datatype_profile(triples: rd.Dataset,
                     pred_col: str = "pred", obj_col: str = "obj",
                     num_partitions: "int | None" = None) -> rd.Dataset:
    """Per-predicate OBJECT lexical-datatype profile — the schema-
    induction step that decides whether an extracted property is
    numeric / temporal / a link (the reference hard-codes xsd types
    per ontology property; at corpus scale the datatype must be
    measured from the raw lexical forms). Counts every observed form
    (no distinct — a profile of the stream as extracted).

    Output: (pred, datatype, n, share) with share = n * 1.0 / per-pred
    total, quantized 9 dp with the same expression the oracle uses.
    Plan: one vectorized regex classify + ONE (pred, datatype)
    combiner aggregate; the per-pred totals roll up from the (small)
    profile itself — no second pass over the stream."""
    import numpy as np
    import pyarrow.compute as pc

    def base(t: pa.Table) -> pa.Table:
        return pa.table({
            "pred": pc.cast(t.column(pred_col), pa.string()),
            "datatype": classify_datatypes(
                t.column(obj_col).combine_chunks()),
            "one": pa.array([1] * t.num_rows, pa.int64())})

    prof = hash_aggregate(
        triples.map_batches(base, batch_format="pyarrow"),
        keys=["pred", "datatype"], sum_cols={"one": "n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("pred", pa.string()),
                              ("datatype", pa.string()),
                              ("n", pa.int64())])).materialize()

    tot = partial_agg_sum(prof, "pred", {"n": "total"})
    j = hash_join(
        prof, tot, on="pred",
        left_schema=pa.schema([("pred", pa.string()),
                               ("datatype", pa.string()),
                               ("n", pa.int64())]),
        right_schema=pa.schema([("pred", pa.string()),
                                ("total", pa.int64())]),
        num_partitions=num_partitions)

    def share(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        total = t.column("total").to_numpy(zero_copy_only=False)
        s = np.round(n * 1.0 / total, 9)
        return pa.table({"pred": t.column("pred"),
                         "datatype": t.column("datatype"),
                         "n": t.column("n"),
                         "share": pa.array(s, pa.float64())})

    return j.map_batches(share, batch_format="pyarrow")


RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"


def type_closure(triples: rd.Dataset,
                 max_depth: int = 6,
                 type_pred: str = RDF_TYPE,
                 subclass_pred: str = RDFS_SUBCLASS,
                 mode: str = "auto",
                 broadcast_max_classes: int = 2_000_000,
                 num_partitions: "int | None" = None) -> rd.Dataset:
    """RDFS type entailment (rdfs9 + rdfs11) over a mixed triple
    stream: every entity gets its asserted classes PLUS all
    superclasses reachable through ``subclass_pred`` chains of up to
    ``max_depth`` hops. Output: (entity, class, depth) where depth is
    the MINIMUM hop count (0 = asserted), one row per distinct
    (entity, class).

    Two plans, oracle-identical:

    - ``broadcast`` — the real-ontology shape: the class hierarchy is
      tiny next to the instance stream (10^4-10^6 classes vs 10^12
      typed entities). The distinct subclass edge set is counted
      BEFORE collecting (gated by ``broadcast_max_classes``), a
      driver-side BFS produces the min-depth ancestor closure, and the
      closure dict ships once via ray.put; the type stream explodes
      per batch with zero joins. One combiner-backed min-aggregate
      dedupes (entity, class) across an entity's multiple asserted
      types.
    - ``join`` — no driver state: ``max_depth`` rounds of frontier
      hash_join over the subclass edges build the closure as a
      Dataset (min-depth combined each round by :func:`hash_min`),
      then ONE co-partitioned join against the type stream + the same
      final min-aggregate.

    The fixed round count keeps both engines' arithmetic identical;
    cycles in the hierarchy are tolerated (min-depth caps growth) but
    depths then read "shortest path", not "DAG level"."""
    import pyarrow.compute as pc

    from .relational import hash_min

    def split(pred: str, s_name: str, o_name: str):
        def f(t: pa.Table) -> pa.Table:
            keep = pc.equal(pc.cast(t.column("pred"), pa.string()), pred)
            ft = t.filter(keep)
            return pa.table({
                s_name: pc.cast(ft.column("subj"), pa.string()),
                o_name: pc.cast(ft.column("obj"), pa.string()),
                "one": pa.array([1] * ft.num_rows, pa.int64())})
        return f

    sc = hash_aggregate(
        triples.map_batches(split(subclass_pred, "sub", "sup"),
                            batch_format="pyarrow"),
        keys=["sub", "sup"], sum_cols={"one": "_n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("sub", pa.string()), ("sup", pa.string()),
                              ("_n", pa.int64())])
    ).drop_columns(["_n"]).materialize()
    n_sc = sc.count()

    types = triples.map_batches(split(type_pred, "entity", "cls"),
                                batch_format="pyarrow") \
        .drop_columns(["one"])

    out_schema = pa.schema([("entity", pa.string()),
                            ("cls", pa.string()),
                            ("depth", pa.int64())])

    if mode == "broadcast" or (mode == "auto"
                               and n_sc <= broadcast_max_classes):
        import ray

        edges: dict[str, list[str]] = {}
        for r in sc.take_all():
            edges.setdefault(r["sub"], []).append(r["sup"])
        closure: dict[str, list[tuple[str, int]]] = {}
        for start in edges:
            best = {start: 0}
            frontier = [start]
            for d in range(1, max_depth + 1):
                nxt = []
                for c in frontier:
                    for p in edges.get(c, ()):
                        if p not in best or best[p] > d:
                            best[p] = d
                            nxt.append(p)
                if not nxt:
                    break
                frontier = nxt
            closure[start] = [(a, d) for a, d in best.items() if d > 0]
        # ship the closure once as a flat Arrow table; each batch does
        # ONE vectorized pandas merge (asserted cls -> all ancestors),
        # no per-row Python.
        cl_tbl = pa.table({
            "cls": pa.array([c for c, anc in closure.items()
                             for _ in anc], pa.string()),
            "_anc": pa.array([a for anc in closure.values()
                              for a, _ in anc], pa.string()),
            "_d": pa.array([d for anc in closure.values()
                            for _, d in anc], pa.int64())})
        ref = ray.put(cl_tbl)

        def explode(t: pa.Table) -> pa.Table:
            import pandas as pd
            cl = ray.get(ref).to_pandas()
            df = t.select(["entity", "cls"]).to_pandas()
            inh = df.merge(cl, on="cls", how="inner")
            inh = pd.DataFrame({"entity": inh["entity"],
                                "cls": inh["_anc"],
                                "depth": inh["_d"]})
            df["depth"] = 0
            out = pd.concat([df, inh], ignore_index=True)
            return pa.Table.from_pandas(
                out, preserve_index=False).cast(
                pa.schema([("entity", pa.string()),
                           ("cls", pa.string()),
                           ("depth", pa.int64())]))

        exploded = types.map_batches(explode, batch_format="pyarrow")
        return hash_min(exploded, ["entity", "cls"], {"depth": "depth"},
                        num_partitions=num_partitions,
                        out_schema=out_schema)

    if mode not in ("join", "auto"):
        raise ValueError(f"unknown mode {mode!r}")

    # distributed closure: anc_k holds min-depth ancestors at <= k hops
    sc_schema = pa.schema([("sub", pa.string()), ("sup", pa.string())])
    closure_ds = sc.map_batches(
        lambda t: pa.table({"sub": t.column("sub"),
                            "anc": t.column("sup"),
                            "depth": pa.array([1] * t.num_rows,
                                              pa.int64())}),
        batch_format="pyarrow").materialize()
    anc_schema = pa.schema([("sub", pa.string()), ("anc", pa.string()),
                            ("depth", pa.int64())])
    frontier = closure_ds
    for _ in range(1, max_depth):
        step = hash_join(
            frontier.map_batches(
                lambda t: pa.table({"hop": t.column("anc"),
                                    "sub": t.column("sub"),
                                    "depth": t.column("depth")}),
                batch_format="pyarrow"),
            sc.map_batches(
                lambda t: pa.table({"hop": t.column("sub"),
                                    "anc": t.column("sup")}),
                batch_format="pyarrow"),
            on="hop",
            left_schema=pa.schema([("hop", pa.string()),
                                   ("sub", pa.string()),
                                   ("depth", pa.int64())]),
            right_schema=pa.schema([("hop", pa.string()),
                                    ("anc", pa.string())]),
            num_partitions=num_partitions)
        step = step.map_batches(
            lambda t: pa.table({
                "sub": t.column("sub"), "anc": t.column("anc"),
                "depth": pc.add(t.column("depth"),
                                pa.scalar(1, pa.int64()))}),
            batch_format="pyarrow")
        if step.count() == 0:
            break
        frontier = hash_min(step, ["sub", "anc"], {"depth": "depth"},
                            num_partitions=num_partitions,
                            out_schema=anc_schema).materialize()
        closure_ds = closure_ds.union(frontier)
    closure_min = hash_min(closure_ds, ["sub", "anc"],
                           {"depth": "depth"},
                           num_partitions=num_partitions,
                           out_schema=anc_schema)

    inherited = hash_join(
        types.map_batches(
            lambda t: pa.table({"cls": t.column("cls"),
                                "entity": t.column("entity")}),
            batch_format="pyarrow"),
        closure_min.map_batches(
            lambda t: pa.table({"cls": t.column("sub"),
                                "anc": t.column("anc"),
                                "depth": t.column("depth")}),
            batch_format="pyarrow"),
        on="cls",
        left_schema=pa.schema([("cls", pa.string()),
                               ("entity", pa.string())]),
        right_schema=pa.schema([("cls", pa.string()),
                                ("anc", pa.string()),
                                ("depth", pa.int64())]),
        num_partitions=num_partitions)
    inherited = inherited.map_batches(
        lambda t: pa.table({"entity": t.column("entity"),
                            "cls": t.column("anc"),
                            "depth": t.column("depth")}),
        batch_format="pyarrow")
    asserted = types.map_batches(
        lambda t: pa.table({"entity": t.column("entity"),
                            "cls": t.column("cls"),
                            "depth": pa.array([0] * t.num_rows,
                                              pa.int64())}),
        batch_format="pyarrow")
    return hash_min(asserted.union(inherited), ["entity", "cls"],
                    {"depth": "depth"},
                    num_partitions=num_partitions, out_schema=out_schema)


def bgp_match(triples: rd.Dataset,
              patterns: "list[tuple[str, str, str]]",
              project: "list[str] | None" = None,
              num_partitions: "int | None" = None) -> rd.Dataset:
    """SPARQL-style basic-graph-pattern matching over a (subj, pred,
    obj) stream: each pattern is (s, p, o) with ``p`` a constant
    predicate URI and ``s`` / ``o`` either a ``?var`` or a constant.
    Triple SET semantics (each pattern's edge set is distinct-ed
    first, the standard RDF-graph reading); the result is the bag of
    variable bindings from joining the patterns left to right.

    Plan: per pattern one pred-pruned scan + distinct; patterns join
    via co-partitioned :func:`hash_join` on ALL shared variables
    (composite keys) — the classic worst-case-optimal-join territory
    is out of scope, so each pattern must share >= 1 variable with the
    accumulated bindings (raises otherwise: an unconstrained cross
    product is never what a KG query means at corpus scale). A
    same-variable pattern (?x p ?x) becomes an in-scan filter.

    ``project`` selects the output variables (default: all, in first-
    appearance order)."""
    import pyarrow.compute as pc

    def scan(s: str, p: str, o: str) -> tuple[rd.Dataset, list[str]]:
        s_var = s.startswith("?")
        o_var = o.startswith("?")

        def f(t: pa.Table) -> pa.Table:
            keep = pc.equal(pc.cast(t.column("pred"), pa.string()), p)
            ft = t.filter(keep)
            subj = pc.cast(ft.column("subj"), pa.string())
            obj = pc.cast(ft.column("obj"), pa.string())
            mask = None
            if not s_var:
                mask = pc.equal(subj, s)
            if not o_var:
                m2 = pc.equal(obj, o)
                mask = m2 if mask is None else pc.and_(mask, m2)
            if s_var and o_var and s == o:
                mask = pc.equal(subj, obj)
            if mask is not None:
                ft = pa.table({"subj": subj, "obj": obj}).filter(mask)
            else:
                ft = pa.table({"subj": subj, "obj": obj})
            cols: dict[str, pa.Array] = {}
            if s_var:
                cols[s[1:]] = ft.column("subj")
            if o_var and not (s_var and s == o):
                cols[o[1:]] = ft.column("obj")
            if not cols:
                raise ValueError(f"pattern ({s}, {p}, {o}) binds no "
                                 "variable")
            cols["one"] = pa.array([1] * ft.num_rows, pa.int64())
            return pa.table(cols)

        out_vars = []
        if s_var:
            out_vars.append(s[1:])
        if o_var and s != o:
            out_vars.append(o[1:])
        ds = triples.map_batches(f, batch_format="pyarrow")
        ded = hash_aggregate(ds, keys=out_vars, sum_cols={"one": "_n"},
                             num_partitions=num_partitions,
                             out_schema=pa.schema(
                                 [(v, pa.string()) for v in out_vars]
                                 + [("_n", pa.int64())]))
        return ded.drop_columns(["_n"]), out_vars

    if not patterns:
        raise ValueError("bgp_match: empty pattern list")
    acc, bound = scan(*patterns[0])
    for pat in patterns[1:]:
        side, side_vars = scan(*pat)
        shared = [v for v in side_vars if v in bound]
        if not shared:
            raise ValueError(
                f"pattern {pat} shares no variable with {bound} — "
                "reorder the BGP or add a linking pattern")
        acc = hash_join(
            acc, side, on=shared,
            left_schema=pa.schema([(v, pa.string()) for v in bound]),
            right_schema=pa.schema([(v, pa.string())
                                    for v in side_vars]),
            num_partitions=num_partitions)
        bound = bound + [v for v in side_vars if v not in bound]
    if project:
        missing = [v for v in project if v not in bound]
        if missing:
            raise ValueError(f"unbound projection vars: {missing}")
        acc = acc.select_columns(project)
    return acc

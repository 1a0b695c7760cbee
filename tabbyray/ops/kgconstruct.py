"""KG-construction ops past schema profiling: literal typing,
domain/range induction, owl:sameAs closure, constraint validation and
embedding-training negative sampling.

The reference pipeline mints triples with hard-coded ontology
properties and datatypes (components/CanonicalTableAnnotator.php:
382-415) and never reconciles co-referent URIs beyond exact string
identity; a corpus-scale KG build needs the statistical versions:
datatypes induced from the lexical forms, domain/range measured from
the typed instance stream, identity resolved through sameAs chains,
and constraint violations surfaced instead of silently kept. All ops
here are Dataset -> Dataset, combiner-first, with bounded driver
state.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from .kgprofile import RDF_TYPE, classify_datatypes, datatype_profile
from .relational import (grouped_argmax, hash_aggregate, hash_join,
                         partial_agg_sum)

OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"


def _distinct_triples(triples: rd.Dataset, keep, drop,
                      cols=("subj", "pred", "obj"),
                      num_partitions: "int | None" = None) -> rd.Dataset:
    """Distinct (subj, pred, obj) restricted by predicate: ``keep`` a
    set of predicates to retain (None = all), ``drop`` a set to
    exclude. One combiner-backed exchange."""
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        p = pc.cast(t.column("pred"), pa.string())
        mask = None
        if keep is not None:
            mask = pc.is_in(p, value_set=pa.array(sorted(keep)))
        if drop:
            m2 = pc.invert(pc.is_in(p, value_set=pa.array(sorted(drop))))
            mask = m2 if mask is None else pc.and_(mask, m2)
        ft = t.filter(mask) if mask is not None else t
        out = {c: pc.cast(ft.column(s), pa.string())
               for s, c in zip(("subj", "pred", "obj"), cols)}
        out["one"] = pa.array([1] * ft.num_rows, pa.int64())
        return pa.table(out)

    ded = hash_aggregate(
        triples.map_batches(f, batch_format="pyarrow"),
        keys=list(cols), sum_cols={"one": "_n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([(c, pa.string()) for c in cols]
                             + [("_n", pa.int64())]))
    return ded.drop_columns(["_n"])


def typed_literals(triples: rd.Dataset,
                   num_partitions: "int | None" = None) -> rd.Dataset:
    """Literal typing pass: induce each predicate's MAJORITY lexical
    datatype from the stream (:func:`datatype_profile`), then stamp
    every triple with the predicate's datatype, its own row-level
    class, a ``conforms`` flag, and the parsed double ``value_num``
    for conforming integer/decimal forms (null otherwise) — the
    typed-column materialization a downstream query engine needs.

    Winner rule: max count, tie-break datatype name asc (one
    :func:`grouped_argmax` over the tiny per-pred profile). One
    co-partitioned join stamps the winner back; no driver state.
    Oracle = the same regex CASE chain + QUALIFY row_number +
    CAST(obj AS DOUBLE)."""
    import pyarrow.compute as pc

    prof = datatype_profile(triples, num_partitions=num_partitions)
    win = grouped_argmax(prof, key="pred", order_col="n",
                         tie_col="datatype",
                         out_cols=["pred", "datatype"],
                         num_partitions=num_partitions)
    win = win.map_batches(
        lambda t: pa.table({"pred": t.column("pred"),
                            "pred_datatype": t.column("datatype")}),
        batch_format="pyarrow")

    def classify(t: pa.Table) -> pa.Table:
        obj = pc.cast(t.column("obj"), pa.string())
        return pa.table({
            "subj": pc.cast(t.column("subj"), pa.string()),
            "pred": pc.cast(t.column("pred"), pa.string()),
            "obj": obj,
            "row_datatype": classify_datatypes(obj.combine_chunks())})

    rows = triples.map_batches(classify, batch_format="pyarrow")
    j = hash_join(
        rows, win, on="pred", num_partitions=num_partitions,
        left_schema=pa.schema([("subj", pa.string()),
                               ("pred", pa.string()),
                               ("obj", pa.string()),
                               ("row_datatype", pa.string())]),
        right_schema=pa.schema([("pred", pa.string()),
                                ("pred_datatype", pa.string())]))

    def finish(t: pa.Table) -> pa.Table:
        conforms = pc.equal(t.column("row_datatype"),
                            t.column("pred_datatype"))
        numeric = pc.and_(conforms, pc.is_in(
            t.column("pred_datatype"),
            value_set=pa.array(["integer", "decimal"])))
        obj = t.column("obj").to_pandas()
        num = pd.to_numeric(obj.where(numeric.to_pandas()),
                            errors="coerce")
        return pa.table({
            "subj": t.column("subj"), "pred": t.column("pred"),
            "obj": t.column("obj"),
            "pred_datatype": t.column("pred_datatype"),
            "row_datatype": t.column("row_datatype"),
            "conforms": pc.cast(conforms, pa.bool_()),
            "value_num": pa.array(num, pa.float64())})

    return j.map_batches(finish, batch_format="pyarrow")


def domain_range_profile(triples: rd.Dataset,
                         type_pred: str = RDF_TYPE,
                         untyped_label: str = "(untyped)",
                         num_partitions: "int | None" = None
                         ) -> rd.Dataset:
    """rdfs:domain / rdfs:range induction: for every non-type
    predicate, the distribution of the SUBJECT's asserted classes
    (side='domain') and the OBJECT's (side='range') over the distinct
    edge set — multi-typed entities count once per class (bag via the
    join), untyped endpoints bucket under ``untyped_label``. Output:
    (pred, side, cls, n, share) with share per (pred, side), quantized
    9 dp like the oracle.

    Plan: two distinct exchanges (types, edges), two co-partitioned
    LEFT joins (subject side, object side), one (pred, side, cls)
    combiner aggregate + a small rollup join."""
    import pyarrow.compute as pc

    ty = _distinct_triples(triples, keep={type_pred}, drop=None,
                           cols=("ent", "_tp", "cls"),
                           num_partitions=num_partitions) \
        .drop_columns(["_tp"]).materialize()
    e = _distinct_triples(triples, keep=None, drop={type_pred},
                          num_partitions=num_partitions).materialize()

    def side_rows(col: str, side: str) -> rd.Dataset:
        proj = e.map_batches(
            lambda t, c=col: pa.table({"ent": t.column(c),
                                       "pred": t.column("pred")}),
            batch_format="pyarrow")
        j = hash_join(
            proj, ty, on="ent", how="left",
            num_partitions=num_partitions,
            left_schema=pa.schema([("ent", pa.string()),
                                   ("pred", pa.string())]),
            right_schema=pa.schema([("ent", pa.string()),
                                    ("cls", pa.string())]))
        return j.map_batches(
            lambda t, s=side: pa.table({
                "pred": t.column("pred"),
                "side": pa.array([s] * t.num_rows, pa.string()),
                "cls": pc.fill_null(t.column("cls"), untyped_label),
                "one": pa.array([1] * t.num_rows, pa.int64())}),
            batch_format="pyarrow")

    u = side_rows("subj", "domain").union(side_rows("obj", "range"))
    g = hash_aggregate(
        u, keys=["pred", "side", "cls"], sum_cols={"one": "n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("pred", pa.string()),
                              ("side", pa.string()),
                              ("cls", pa.string()),
                              ("n", pa.int64())])).materialize()
    tot = partial_agg_sum(g, ["pred", "side"], {"n": "total"})
    j = hash_join(
        g, tot, on=["pred", "side"], num_partitions=num_partitions,
        left_schema=pa.schema([("pred", pa.string()),
                               ("side", pa.string()),
                               ("cls", pa.string()),
                               ("n", pa.int64())]),
        right_schema=pa.schema([("pred", pa.string()),
                                ("side", pa.string()),
                                ("total", pa.int64())]))

    def share(t: pa.Table) -> pa.Table:
        import numpy as np
        n = t.column("n").to_numpy(zero_copy_only=False)
        total = t.column("total").to_numpy(zero_copy_only=False)
        return pa.table({"pred": t.column("pred"),
                         "side": t.column("side"),
                         "cls": t.column("cls"), "n": t.column("n"),
                         "share": pa.array(np.round(n * 1.0 / total, 9),
                                           pa.float64())})

    return j.map_batches(share, batch_format="pyarrow")


def sameas_closure(triples: rd.Dataset,
                   sameas_pred: str = OWL_SAMEAS,
                   num_partitions: "int | None" = None,
                   components_mode: str = "auto") -> rd.Dataset:
    """owl:sameAs identity resolution applied to a triple stream: the
    sameAs edge subset (undirected, self-loops dropped) is closed into
    connected components (:func:`tabbyray.ops.linkage.string_components`
    — count-gated local union-find / distributed label propagation),
    every remaining triple is rewritten through the canonical member
    (lexicographic min of the component), the sameAs triples
    themselves are dropped, and the rewritten stream is distinct-ed
    (merged aliases collapse duplicate facts). Output: (subj, pred,
    obj), set semantics.

    Plan: one distinct exchange for the sameAs pairs, the components
    rounds, two co-partitioned LEFT joins (subject, object rewrite),
    one final distinct exchange."""
    import pyarrow.compute as pc

    from .linkage import string_components

    sa = _distinct_triples(triples, keep={sameas_pred}, drop=None,
                           cols=("a", "_sp", "b"),
                           num_partitions=num_partitions) \
        .drop_columns(["_sp"])
    sa = sa.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("a"), t.column("b"))),
        batch_format="pyarrow").materialize()

    def node_col(c: str):
        return sa.map_batches(
            lambda t, cc=c: pa.table({"node": t.column(cc)}),
            batch_format="pyarrow")

    nodes = hash_aggregate(
        node_col("a").union(node_col("b")).map_batches(
            lambda t: t.append_column(
                "one", pa.array([1] * t.num_rows, pa.int64())),
            batch_format="pyarrow"),
        keys=["node"], sum_cols={"one": "_n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("node", pa.string()),
                              ("_n", pa.int64())])).drop_columns(["_n"])

    comp = string_components(sa, nodes, edge_cols=("a", "b"),
                             node_col="node", mode=components_mode,
                             num_partitions=num_partitions)
    comp = comp.materialize()   # consumed by both rewrite joins

    rest = triples.map_batches(
        lambda t: (lambda ft: pa.table({
            "subj": pc.cast(ft.column("subj"), pa.string()),
            "pred": pc.cast(ft.column("pred"), pa.string()),
            "obj": pc.cast(ft.column("obj"), pa.string())}))(
            t.filter(pc.not_equal(pc.cast(t.column("pred"), pa.string()),
                                  sameas_pred))),
        batch_format="pyarrow")

    def rewrite(ds: rd.Dataset, col: str, others: list[str]) -> rd.Dataset:
        renamed = ds.map_batches(
            lambda t, c=col: pa.table(
                {"node": t.column(c),
                 **{o: t.column(o) for o in others}}),
            batch_format="pyarrow")
        j = hash_join(
            renamed, comp, on="node", how="left",
            num_partitions=num_partitions,
            left_schema=pa.schema([("node", pa.string())]
                                  + [(o, pa.string()) for o in others]),
            right_schema=pa.schema([("node", pa.string()),
                                    ("component", pa.string())]))
        return j.map_batches(
            lambda t, c=col: pa.table(
                {c: pc.coalesce(t.column("component"), t.column("node")),
                 **{o: t.column(o) for o in others}}),
            batch_format="pyarrow")

    rw = rewrite(rest, "subj", ["pred", "obj"])
    rw = rewrite(rw, "obj", ["subj", "pred"])
    return _distinct_triples(rw, keep=None, drop=None,
                             num_partitions=num_partitions)


def functional_violations(triples: rd.Dataset,
                          functional_preds: "list[str]",
                          num_partitions: "int | None" = None
                          ) -> rd.Dataset:
    """Constraint validation for DECLARED functional predicates (the
    ontology facts the reference hard-codes): emit (subj, pred,
    n_objs) for every subject that asserts more than one DISTINCT
    object for a functional predicate — the rows a curation pass must
    reconcile before load. One distinct exchange + one fan-out
    aggregate + a vectorized filter."""
    import pyarrow.compute as pc

    e = _distinct_triples(triples, keep=set(functional_preds),
                          drop=None, num_partitions=num_partitions)
    g = hash_aggregate(
        e.map_batches(
            lambda t: pa.table({"subj": t.column("subj"),
                                "pred": t.column("pred"),
                                "one": pa.array([1] * t.num_rows,
                                                pa.int64())}),
            batch_format="pyarrow"),
        keys=["subj", "pred"], sum_cols={"one": "n_objs"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("subj", pa.string()),
                              ("pred", pa.string()),
                              ("n_objs", pa.int64())]))
    return g.map_batches(
        lambda t: t.filter(pc.greater(t.column("n_objs"),
                                      pa.scalar(1, pa.int64()))),
        batch_format="pyarrow")


def transe_negatives(triples: rd.Dataset,
                     exclude_preds: "tuple[str, ...]" = (RDF_TYPE,
                                                         OWL_SAMEAS),
                     corrupt: str = "obj",
                     n_buckets: int = 1024,
                     num_partitions: "int | None" = None) -> rd.Dataset:
    """Hash-seeded TransE-style negative sampling: every distinct
    edge gets one corrupted counterpart whose ``corrupt`` endpoint is
    replaced by a pseudo-random entity drawn DETERMINISTICALLY from
    the corpus entity set — md5 of the full triple modulo the entity
    count, looked up by JOIN against the md5-ordered entity ranking
    (:func:`tabbyray.ops.sampling.global_hash_shuffle`), so the entity
    table is never collected anywhere. ``collides`` flags false
    negatives (the draw equals the true endpoint, or the corrupted
    triple exists in the edge set — one composite-key LEFT join).

    Output: (subj, pred, obj, neg_ent, collides). Driver state is the
    ranking's per-bucket prefix-sum (``n_buckets`` rows) and one
    count; everything else is co-partitioned exchanges. Same-on-rerun
    by construction (training reproducibility)."""
    import numpy as np
    import pyarrow.compute as pc

    from .sampling import _hash64

    if corrupt not in ("subj", "obj"):
        raise ValueError(f"corrupt must be 'subj' or 'obj', "
                         f"got {corrupt!r}")

    e = _distinct_triples(triples, keep=None, drop=set(exclude_preds),
                          num_partitions=num_partitions).materialize()

    def ends(c: str):
        return e.map_batches(
            lambda t, cc=c: pa.table({"entity": t.column(cc)}),
            batch_format="pyarrow")

    ents = hash_aggregate(
        ends("subj").union(ends("obj")).map_batches(
            lambda t: t.append_column(
                "one", pa.array([1] * t.num_rows, pa.int64())),
            batch_format="pyarrow"),
        keys=["entity"], sum_cols={"one": "_n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("entity", pa.string()),
                              ("_n", pa.int64())])
    ).drop_columns(["_n"]).materialize()
    n_ents = ents.count()

    from .sampling import global_hash_shuffle
    ranked = global_hash_shuffle(ents, "entity", n_buckets=n_buckets,
                                 id_type=pa.string())
    ranked = ranked.map_batches(
        lambda t: pa.table({"_r": t.column("shuffle_rank"),
                            "neg_ent": t.column("entity")}),
        batch_format="pyarrow")

    def draw(t: pa.Table) -> pa.Table:
        s = t.column("subj").to_pylist()
        p = t.column("pred").to_pylist()
        o = t.column("obj").to_pylist()
        r = np.fromiter(
            (_hash64(f"neg-{corrupt}|{a}|{b}|{c}") % n_ents
             for a, b, c in zip(s, p, o)),
            dtype=np.int64, count=len(s))
        return t.append_column("_r", pa.array(r, pa.int64()))

    drawn = e.map_batches(draw, batch_format="pyarrow")
    neg = hash_join(
        drawn, ranked, on="_r", num_partitions=num_partitions,
        left_schema=pa.schema([("subj", pa.string()),
                               ("pred", pa.string()),
                               ("obj", pa.string()),
                               ("_r", pa.int64())]),
        right_schema=pa.schema([("_r", pa.int64()),
                                ("neg_ent", pa.string())])
    ).drop_columns(["_r"])

    kept = "subj" if corrupt == "obj" else "obj"
    exists_right = e.map_batches(
        lambda t: pa.table({kept: t.column(kept),
                            "pred": t.column("pred"),
                            "neg_ent": t.column(corrupt),
                            "_hit": pa.array([1] * t.num_rows,
                                             pa.int64())}),
        batch_format="pyarrow")
    j = hash_join(
        neg, exists_right, on=[kept, "pred", "neg_ent"], how="left",
        num_partitions=num_partitions,
        left_schema=pa.schema([("subj", pa.string()),
                               ("pred", pa.string()),
                               ("obj", pa.string()),
                               ("neg_ent", pa.string())]),
        right_schema=pa.schema([(kept, pa.string()),
                                ("pred", pa.string()),
                                ("neg_ent", pa.string()),
                                ("_hit", pa.int64())]))

    def finish(t: pa.Table) -> pa.Table:
        same = pc.equal(t.column("neg_ent"), t.column(corrupt))
        hit = pc.is_valid(t.column("_hit"))
        return pa.table({
            "subj": t.column("subj"), "pred": t.column("pred"),
            "obj": t.column("obj"), "neg_ent": t.column("neg_ent"),
            "collides": pc.cast(pc.or_(same, hit), pa.bool_())})

    return j.map_batches(finish, batch_format="pyarrow")


def mine_path_rules(triples: rd.Dataset,
                    exclude_preds: "tuple[str, ...]" = (RDF_TYPE,
                                                        OWL_SAMEAS),
                    min_support: int = 1,
                    num_partitions: "int | None" = None) -> rd.Dataset:
    """AMIE-style closed path-rule mining: for every rule
    ``p1(x,z) AND p2(z,y) => p3(x,y)`` measure support = |distinct
    (x,y) pairs with a p1.p2 path AND a p3 edge| and standard
    confidence = support / n_body (|distinct path pairs|) — the
    schema-enrichment pass a KG-construction pipeline runs to propose
    inference rules the reference hard-codes by hand
    (components/CanonicalTableAnnotator.php:382-415 fixes its relation
    vocabulary a priori; at corpus scale the rules are mined).

    x == y path pairs (cycles) are excluded from both counts. Plan:
    one distinct exchange, ONE mid-node co-partitioned self-join, one
    (p1,p2,x,y) distinct aggregate, one composite (x,y) join against
    the head edges, two small rollups; confidence quantized 9 dp like
    the oracle. Output: (p1, p2, p3, support, n_body, confidence)."""
    import pyarrow.compute as pc

    e = _distinct_triples(triples, keep=None, drop=set(exclude_preds),
                          num_partitions=num_partitions).materialize()

    left = e.map_batches(
        lambda t: pa.table({"x": t.column("subj"),
                            "p1": t.column("pred"),
                            "mid": t.column("obj")}),
        batch_format="pyarrow")
    right = e.map_batches(
        lambda t: pa.table({"mid": t.column("subj"),
                            "p2": t.column("pred"),
                            "y": t.column("obj")}),
        batch_format="pyarrow")
    j = hash_join(
        left, right, on="mid", num_partitions=num_partitions,
        left_schema=pa.schema([("x", pa.string()), ("p1", pa.string()),
                               ("mid", pa.string())]),
        right_schema=pa.schema([("mid", pa.string()),
                                ("p2", pa.string()),
                                ("y", pa.string())]))
    paths = hash_aggregate(
        j.map_batches(
            lambda t: (lambda ft: pa.table({
                "p1": ft.column("p1"), "p2": ft.column("p2"),
                "x": ft.column("x"), "y": ft.column("y"),
                "one": pa.array([1] * ft.num_rows, pa.int64())}))(
                t.filter(pc.not_equal(t.column("x"), t.column("y")))),
            batch_format="pyarrow"),
        keys=["p1", "p2", "x", "y"], sum_cols={"one": "_n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("p1", pa.string()), ("p2", pa.string()),
                              ("x", pa.string()), ("y", pa.string()),
                              ("_n", pa.int64())])
    ).drop_columns(["_n"]).materialize()   # consumed by body + support

    body = partial_agg_sum(
        paths.map_batches(
            lambda t: pa.table({"p1": t.column("p1"),
                                "p2": t.column("p2"),
                                "one": pa.array([1] * t.num_rows,
                                                pa.int64())}),
            batch_format="pyarrow"),
        ["p1", "p2"], {"one": "n_body"})

    heads = e.map_batches(
        lambda t: pa.table({"x": t.column("subj"),
                            "p3": t.column("pred"),
                            "y": t.column("obj")}),
        batch_format="pyarrow")
    hits = hash_join(
        paths, heads, on=["x", "y"], num_partitions=num_partitions,
        left_schema=pa.schema([("p1", pa.string()), ("p2", pa.string()),
                               ("x", pa.string()), ("y", pa.string())]),
        right_schema=pa.schema([("x", pa.string()), ("p3", pa.string()),
                                ("y", pa.string())]))
    support = partial_agg_sum(
        hits.map_batches(
            lambda t: pa.table({"p1": t.column("p1"),
                                "p2": t.column("p2"),
                                "p3": t.column("p3"),
                                "one": pa.array([1] * t.num_rows,
                                                pa.int64())}),
            batch_format="pyarrow"),
        ["p1", "p2", "p3"], {"one": "support"})

    out = hash_join(
        support, body, on=["p1", "p2"], num_partitions=num_partitions,
        left_schema=pa.schema([("p1", pa.string()), ("p2", pa.string()),
                               ("p3", pa.string()),
                               ("support", pa.int64())]),
        right_schema=pa.schema([("p1", pa.string()),
                                ("p2", pa.string()),
                                ("n_body", pa.int64())]))

    def finish(t: pa.Table) -> pa.Table:
        import numpy as np
        t = t.filter(pc.greater_equal(
            t.column("support"), pa.scalar(min_support, pa.int64())))
        s = t.column("support").to_numpy(zero_copy_only=False)
        b = t.column("n_body").to_numpy(zero_copy_only=False)
        return pa.table({
            "p1": t.column("p1"), "p2": t.column("p2"),
            "p3": t.column("p3"), "support": t.column("support"),
            "n_body": t.column("n_body"),
            "confidence": pa.array(np.round(s * 1.0 / b, 9),
                                   pa.float64())})

    return out.map_batches(finish, batch_format="pyarrow")


def class_cooccurrence(triples: rd.Dataset,
                       type_pred: str = RDF_TYPE,
                       num_partitions: "int | None" = None) -> rd.Dataset:
    """Ontology-QA class co-assertion profile: for every UNORDERED
    class pair (cls_a < cls_b) the number of entities asserting BOTH,
    each class's own entity count and the Jaccard overlap — zero
    co-occurrence between frequent classes is the disjointness
    evidence an ontology-repair pass consumes. One distinct exchange,
    one entity-key self-join, one pair aggregate, two small per-class
    rollup joins; jaccard quantized 9 dp."""
    import pyarrow.compute as pc

    ty = _distinct_triples(triples, keep={type_pred}, drop=None,
                           cols=("ent", "_tp", "cls"),
                           num_partitions=num_partitions) \
        .drop_columns(["_tp"]).materialize()

    per_cls = partial_agg_sum(
        ty.map_batches(
            lambda t: pa.table({"cls": t.column("cls"),
                                "one": pa.array([1] * t.num_rows,
                                                pa.int64())}),
            batch_format="pyarrow"),
        "cls", {"one": "n"}).materialize()

    other = ty.map_batches(
        lambda t: pa.table({"ent": t.column("ent"),
                            "cls_b": t.column("cls")}),
        batch_format="pyarrow")
    j = hash_join(
        ty, other, on="ent", num_partitions=num_partitions,
        left_schema=pa.schema([("ent", pa.string()),
                               ("cls", pa.string())]),
        right_schema=pa.schema([("ent", pa.string()),
                                ("cls_b", pa.string())]))
    pairs = partial_agg_sum(
        j.map_batches(
            lambda t: (lambda ft: pa.table({
                "cls_a": ft.column("cls"), "cls_b": ft.column("cls_b"),
                "one": pa.array([1] * ft.num_rows, pa.int64())}))(
                t.filter(pc.less(t.column("cls"), t.column("cls_b")))),
            batch_format="pyarrow"),
        ["cls_a", "cls_b"], {"one": "n_both"})

    def rn(col_in: str, col_out: str):
        return per_cls.map_batches(
            lambda t, ci=col_in, co=col_out: pa.table(
                {ci: t.column("cls"), co: t.column("n")}),
            batch_format="pyarrow")

    j2 = hash_join(
        pairs, rn("cls_a", "n_a"), on="cls_a",
        num_partitions=num_partitions,
        left_schema=pa.schema([("cls_a", pa.string()),
                               ("cls_b", pa.string()),
                               ("n_both", pa.int64())]),
        right_schema=pa.schema([("cls_a", pa.string()),
                                ("n_a", pa.int64())]))
    j3 = hash_join(
        j2, rn("cls_b", "n_b"), on="cls_b",
        num_partitions=num_partitions,
        left_schema=pa.schema([("cls_a", pa.string()),
                               ("cls_b", pa.string()),
                               ("n_both", pa.int64()),
                               ("n_a", pa.int64())]),
        right_schema=pa.schema([("cls_b", pa.string()),
                                ("n_b", pa.int64())]))

    def finish(t: pa.Table) -> pa.Table:
        import numpy as np
        nb = t.column("n_both").to_numpy(zero_copy_only=False)
        na = t.column("n_a").to_numpy(zero_copy_only=False)
        n2 = t.column("n_b").to_numpy(zero_copy_only=False)
        return pa.table({
            "cls_a": t.column("cls_a"), "cls_b": t.column("cls_b"),
            "n_both": t.column("n_both"), "n_a": t.column("n_a"),
            "n_b": t.column("n_b"),
            "jaccard": pa.array(
                np.round(nb * 1.0 / (na + n2 - nb), 9), pa.float64())})

    return j3.map_batches(finish, batch_format="pyarrow")


def entity_fact_summary(triples: rd.Dataset, k: int = 3,
                        exclude_preds: "tuple[str, ...]" = (OWL_SAMEAS,),
                        num_partitions: "int | None" = None
                        ) -> rd.Dataset:
    """Per-entity top-k fact summary ranked by predicate
    informativeness: idf(p) = ln(N_subjects / n_subjects asserting p)
    (quantized 9 dp BEFORE ranking so the order is reproducible across
    engines), rank per subject by (idf desc, pred asc, obj asc), keep
    k — the entity-card selection a KG front-end serves. One distinct
    exchange, one per-pred distinct-subject count, one co-partitioned
    stamp join + ONE combiner top-k exchange (grouped_topk: each batch
    prunes to k per subject locally). N_subjects is the only driver
    scalar."""
    import math

    import pyarrow.compute as pc

    from .relational import distinct_count, grouped_topk

    e = _distinct_triples(triples, keep=None, drop=set(exclude_preds),
                          num_partitions=num_partitions).materialize()

    n_subj = distinct_count(e, "pred", "subj", alias="n_subj",
                            key_type=pa.string()).materialize()
    total = hash_aggregate(
        e.map_batches(
            lambda t: pa.table({"subj": t.column("subj"),
                                "one": pa.array([1] * t.num_rows,
                                                pa.int64())}),
            batch_format="pyarrow"),
        keys=["subj"], sum_cols={"one": "_n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("subj", pa.string()),
                              ("_n", pa.int64())])).count()

    def idf(t: pa.Table) -> pa.Table:
        import numpy as np
        n = t.column("n_subj").to_numpy(zero_copy_only=False)
        return pa.table({
            "pred": t.column("pred"),
            "idf": pa.array(np.round(np.log(total * 1.0 / n), 9),
                            pa.float64())})

    stamped = hash_join(
        e, n_subj.map_batches(idf, batch_format="pyarrow"), on="pred",
        num_partitions=num_partitions,
        left_schema=pa.schema([("subj", pa.string()),
                               ("pred", pa.string()),
                               ("obj", pa.string())]),
        right_schema=pa.schema([("pred", pa.string()),
                                ("idf", pa.float64())]))
    # tie key (pred asc, obj asc) as one string: chr(31) sorts below
    # every URI/literal character in the fixtures
    stamped = stamped.map_batches(
        lambda t: t.append_column(
            "_tie", pc.binary_join_element_wise(
                t.column("pred"), t.column("obj"), "\x1f")),
        batch_format="pyarrow")
    return grouped_topk(stamped, key="subj", order_col="idf",
                        tie_col="_tie",
                        out_cols=["subj", "pred", "obj", "idf"], k=k,
                        num_partitions=num_partitions)


def triple_provenance(triples: rd.Dataset, source_col: str = "url",
                      num_partitions: "int | None" = None) -> rd.Dataset:
    """Provenance rollup for a multi-source triple stream: per
    distinct (subj, pred, obj) the number of DISTINCT sources
    asserting it, the total assertion count (duplicates included —
    extraction multiplicity), and the lexicographic-min source (a
    stable exemplar for audits). The reference keeps no provenance at
    all (commands/SpreadsheetController.php:570-684 emits bare
    annotations); at corpus scale every fact must be auditable back
    to pages. Plan: one (s,p,o,source) combiner distinct that also
    sums raw multiplicity, then one per-triple sum aggregate + one
    per-triple min aggregate + a co-partitioned join — every exchange
    is triple-hash partitioned."""
    from .relational import hash_min

    def proj(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "subj": pc.cast(t.column("subj"), pa.string()),
            "pred": pc.cast(t.column("pred"), pa.string()),
            "obj": pc.cast(t.column("obj"), pa.string()),
            "source": pc.cast(t.column(source_col), pa.string()),
            "one": pa.array([1] * t.num_rows, pa.int64())})

    per_src = hash_aggregate(
        triples.map_batches(proj, batch_format="pyarrow"),
        keys=["subj", "pred", "obj", "source"], sum_cols={"one": "n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("subj", pa.string()),
                              ("pred", pa.string()),
                              ("obj", pa.string()),
                              ("source", pa.string()),
                              ("n", pa.int64())])).materialize()

    sums = hash_aggregate(
        per_src.map_batches(
            lambda t: pa.table({
                "subj": t.column("subj"), "pred": t.column("pred"),
                "obj": t.column("obj"),
                "one": pa.array([1] * t.num_rows, pa.int64()),
                "n": t.column("n")}),
            batch_format="pyarrow"),
        keys=["subj", "pred", "obj"],
        sum_cols={"one": "n_sources", "n": "n_assertions"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("subj", pa.string()),
                              ("pred", pa.string()),
                              ("obj", pa.string()),
                              ("n_sources", pa.int64()),
                              ("n_assertions", pa.int64())]))
    mins = hash_min(
        per_src.select_columns(["subj", "pred", "obj", "source"]),
        keys=["subj", "pred", "obj"],
        min_cols={"source": "first_source"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("subj", pa.string()),
                              ("pred", pa.string()),
                              ("obj", pa.string()),
                              ("first_source", pa.string())]))
    return hash_join(
        sums, mins, on=["subj", "pred", "obj"],
        num_partitions=num_partitions,
        left_schema=pa.schema([("subj", pa.string()),
                               ("pred", pa.string()),
                               ("obj", pa.string()),
                               ("n_sources", pa.int64()),
                               ("n_assertions", pa.int64())]),
        right_schema=pa.schema([("subj", pa.string()),
                                ("pred", pa.string()),
                                ("obj", pa.string()),
                                ("first_source", pa.string())]))


def resolve_conflicts(triples: rd.Dataset, source_col: str = "url",
                      num_partitions: "int | None" = None) -> rd.Dataset:
    """Truth discovery by source voting: per (subj, pred) elect the
    object asserted by the most DISTINCT sources (ties broken by obj
    asc — deterministic), reporting the winner's vote count and how
    many competing objects were seen. The fusion step that turns a
    multi-source extraction stream into one loadable fact per
    functional slot. Plan: one (s,p,o,source) combiner distinct + one
    per-(s,p,o) vote count + ONE grouped-argmax combiner exchange + a
    small per-(s,p) distinct-obj rollup join."""
    import pyarrow.compute as pc

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "subj": pc.cast(t.column("subj"), pa.string()),
            "pred": pc.cast(t.column("pred"), pa.string()),
            "obj": pc.cast(t.column("obj"), pa.string()),
            "source": pc.cast(t.column(source_col), pa.string()),
            "one": pa.array([1] * t.num_rows, pa.int64())})

    votes = hash_aggregate(
        hash_aggregate(
            triples.map_batches(proj, batch_format="pyarrow"),
            keys=["subj", "pred", "obj", "source"],
            sum_cols={"one": "_n"}, num_partitions=num_partitions,
            out_schema=pa.schema([("subj", pa.string()),
                                  ("pred", pa.string()),
                                  ("obj", pa.string()),
                                  ("source", pa.string()),
                                  ("_n", pa.int64())])
        ).map_batches(
            lambda t: pa.table({
                "subj": t.column("subj"), "pred": t.column("pred"),
                "obj": t.column("obj"),
                "one": pa.array([1] * t.num_rows, pa.int64())}),
            batch_format="pyarrow"),
        keys=["subj", "pred", "obj"], sum_cols={"one": "n_sources"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("subj", pa.string()),
                              ("pred", pa.string()),
                              ("obj", pa.string()),
                              ("n_sources", pa.int64())])).materialize()

    # composite (subj, pred) key: \x1f never occurs in URIs
    keyed = votes.map_batches(
        lambda t: t.append_column(
            "_k", pc.binary_join_element_wise(
                t.column("subj"), t.column("pred"), "\x1f")),
        batch_format="pyarrow")
    win = grouped_argmax(keyed, key="_k", order_col="n_sources",
                         tie_col="obj",
                         out_cols=["subj", "pred", "obj", "n_sources"],
                         num_partitions=num_partitions)

    n_objs = partial_agg_sum(
        votes.map_batches(
            lambda t: pa.table({
                "subj": t.column("subj"), "pred": t.column("pred"),
                "one": pa.array([1] * t.num_rows, pa.int64())}),
            batch_format="pyarrow"),
        ["subj", "pred"], {"one": "n_objs"})
    return hash_join(
        win, n_objs, on=["subj", "pred"],
        num_partitions=num_partitions,
        left_schema=pa.schema([("subj", pa.string()),
                               ("pred", pa.string()),
                               ("obj", pa.string()),
                               ("n_sources", pa.int64())]),
        right_schema=pa.schema([("subj", pa.string()),
                                ("pred", pa.string()),
                                ("n_objs", pa.int64())]))


def partition_cut_profile(triples: rd.Dataset,
                          n_parts_list: "tuple[int, ...]" = (8, 64),
                          exclude_preds: "tuple[str, ...]" = (RDF_TYPE,
                                                              OWL_SAMEAS),
                          num_partitions: "int | None" = None
                          ) -> rd.Dataset:
    """Graph-partitioning quality profile for hash-partitioned KG
    storage: for each candidate partition count P, the share of
    distinct edges whose endpoints hash to different buckets
    (md5 % P — every cut edge is one cross-node message in a
    distributed traversal) and the subject-side load balance
    (max bucket edges / ideal). The diagnostic that decides whether
    plain hash partitioning suffices or hub entities need salting.
    Plan: one distinct exchange, one vectorized per-batch hash +
    per-(P, bucket) combiner aggregate, two tiny rollups (one row per
    bucket) — driver state is P rows."""
    import numpy as np
    import pyarrow.compute as pc

    from .sampling import _hash64

    e = _distinct_triples(triples, keep=None, drop=set(exclude_preds),
                          num_partitions=num_partitions)

    def bucketize(t: pa.Table) -> pa.Table:
        schema = pa.schema([("n_parts", pa.int64()),
                            ("bucket", pa.int64()),
                            ("one", pa.int64()), ("cut", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        s = t.column("subj").to_pylist()
        o = t.column("obj").to_pylist()
        uniq = {v: _hash64(v) for v in set(s) | set(o)}
        hs = np.fromiter((uniq[v] for v in s), dtype=np.uint64,
                         count=len(s))
        ho = np.fromiter((uniq[v] for v in o), dtype=np.uint64,
                         count=len(o))
        parts = []
        for p in n_parts_list:
            bs = (hs % p).astype(np.int64)
            bo = (ho % p).astype(np.int64)
            parts.append(pa.table({
                "n_parts": pa.array([int(p)] * len(s), pa.int64()),
                "bucket": pa.array(bs, pa.int64()),
                "one": pa.array([1] * len(s), pa.int64()),
                "cut": pa.array((bs != bo).astype(np.int64),
                                pa.int64())}))
        return pa.concat_tables(parts)

    per_bucket = hash_aggregate(
        e.map_batches(bucketize, batch_format="pyarrow"),
        keys=["n_parts", "bucket"],
        sum_cols={"one": "load", "cut": "n_cut"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("n_parts", pa.int64()),
                              ("bucket", pa.int64()),
                              ("load", pa.int64()),
                              ("n_cut", pa.int64())]))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        g = df.groupby("n_parts", as_index=False).agg(
            n_edges=("load", "sum"), n_cut=("n_cut", "sum"),
            max_bucket_edges=("load", "max"))
        g["cut_share"] = np.round(g["n_cut"] / g["n_edges"], 9)
        g["balance"] = np.round(
            g["max_bucket_edges"] * g["n_parts"] / g["n_edges"], 9)
        return g

    # the per-(P, bucket) table is at most sum(n_parts_list) rows
    from .relational import typed_groupby_map
    out_schema = pa.schema([
        ("n_parts", pa.int64()), ("n_edges", pa.int64()),
        ("n_cut", pa.int64()), ("max_bucket_edges", pa.int64()),
        ("cut_share", pa.float64()), ("balance", pa.float64())])
    return typed_groupby_map(
        per_bucket.map_batches(
            lambda t: t.append_column(
                "_g", pc.cast(pc.multiply(t.column("n_parts"), 0),
                              pa.int64())),
            batch_format="pyarrow"),
        "_g", finish, out_schema)


def namespace_profile(triples: rd.Dataset,
                      num_partitions: "int | None" = None) -> rd.Dataset:
    """URI namespace inventory per triple role — the prefix table a
    serializer (Turtle/RDF-XML) and a vocabulary audit need: namespace
    = the URI up to its LAST '/' or '#' (greedy regex), non-URI values
    bucket as '(literal)'. Counts the raw stream (assertion
    multiplicity, not distinct). One vectorized regex extract + ONE
    (namespace, role) combiner aggregate."""
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        parts = []
        for role in ("subj", "pred", "obj"):
            v = pc.fill_null(pc.cast(t.column(role), pa.string()), "")
            ns = pc.struct_field(
                pc.extract_regex(v, r"^(?P<ns>https?://.*[/#])"), "ns")
            parts.append(pa.table({
                "namespace": pc.fill_null(ns, "(literal)"),
                "role": pa.array([role] * t.num_rows, pa.string()),
                "one": pa.array([1] * t.num_rows, pa.int64())}))
        return pa.concat_tables(parts)

    return hash_aggregate(
        triples.map_batches(f, batch_format="pyarrow"),
        keys=["namespace", "role"], sum_cols={"one": "n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("namespace", pa.string()),
                              ("role", pa.string()),
                              ("n", pa.int64())]))


def canonicalize_numeric_literals(triples: rd.Dataset) -> rd.Dataset:
    """Literal cleaning pass: comma-grouped integers
    (``^[0-9]{1,3}(,[0-9]{3})+$`` — the '1,200' forms typed_literals
    flags as non-conforming) are rewritten to their canonical digit
    string; everything else passes through. Output keeps the raw form
    plus ``obj_canon`` and a ``changed`` flag so a curation diff is
    one filter. Pure map — zero exchanges."""
    import pyarrow.compute as pc

    pat = r"^[0-9]{1,3}(?:,[0-9]{3})+$"

    def f(t: pa.Table) -> pa.Table:
        obj = pc.fill_null(pc.cast(t.column("obj"), pa.string()), "")
        m = pc.match_substring_regex(obj, pat)
        canon = pc.if_else(m, pc.replace_substring(obj, ",", ""), obj)
        return pa.table({
            "subj": pc.cast(t.column("subj"), pa.string()),
            "pred": pc.cast(t.column("pred"), pa.string()),
            "obj": obj, "obj_canon": canon,
            "changed": pc.cast(m, pa.bool_())})

    return triples.map_batches(f, batch_format="pyarrow")


def resolve_latest(triples: rd.Dataset, pages: rd.Dataset,
                   url_col: str = "url", ts_col: str = "warc_ts",
                   num_partitions: "int | None" = None) -> rd.Dataset:
    """Recency-policy truth discovery: per (subj, pred) slot elect the
    object of the LATEST source capture (ties: obj asc), the fusion
    rule for slots that legitimately change over time (population,
    employer) where source voting would keep the stale majority.
    Output: (subj, pred, obj, ts_us, n_objs) — ts_us = the winning
    assertion's capture time as epoch micros (int64 keeps the hash
    comparison engine-neutral).

    Plan: one url co-partitioned join stamps each assertion with its
    capture time + ONE grouped-argmax combiner exchange + a distinct-
    object rollup join."""
    import pyarrow.compute as pc

    ts = pages.map_batches(
        lambda t: pa.table({
            "url": pc.cast(t.column(url_col), pa.string()),
            "ts_us": pc.cast(t.column(ts_col), pa.int64())}),
        batch_format="pyarrow")

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": pc.cast(t.column(url_col), pa.string()),
            "subj": pc.cast(t.column("subj"), pa.string()),
            "pred": pc.cast(t.column("pred"), pa.string()),
            "obj": pc.cast(t.column("obj"), pa.string())})

    stamped = hash_join(
        triples.map_batches(proj, batch_format="pyarrow"), ts,
        on="url", num_partitions=num_partitions,
        left_schema=pa.schema([("url", pa.string()),
                               ("subj", pa.string()),
                               ("pred", pa.string()),
                               ("obj", pa.string())]),
        right_schema=pa.schema([("url", pa.string()),
                                ("ts_us", pa.int64())])).materialize()

    keyed = stamped.map_batches(
        lambda t: t.append_column(
            "_k", pc.binary_join_element_wise(
                t.column("subj"), t.column("pred"), "\x1f")),
        batch_format="pyarrow")
    win = grouped_argmax(keyed, key="_k", order_col="ts_us",
                         tie_col="obj",
                         out_cols=["subj", "pred", "obj", "ts_us"],
                         num_partitions=num_partitions)

    objs = hash_aggregate(
        stamped.map_batches(
            lambda t: pa.table({
                "subj": t.column("subj"), "pred": t.column("pred"),
                "obj": t.column("obj"),
                "one": pa.array([1] * t.num_rows, pa.int64())}),
            batch_format="pyarrow"),
        keys=["subj", "pred", "obj"], sum_cols={"one": "_n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("subj", pa.string()),
                              ("pred", pa.string()),
                              ("obj", pa.string()),
                              ("_n", pa.int64())]))
    n_objs = partial_agg_sum(
        objs.map_batches(
            lambda t: pa.table({
                "subj": t.column("subj"), "pred": t.column("pred"),
                "one": pa.array([1] * t.num_rows, pa.int64())}),
            batch_format="pyarrow"),
        ["subj", "pred"], {"one": "n_objs"})
    return hash_join(
        win, n_objs, on=["subj", "pred"],
        num_partitions=num_partitions,
        left_schema=pa.schema([("subj", pa.string()),
                               ("pred", pa.string()),
                               ("obj", pa.string()),
                               ("ts_us", pa.int64())]),
        right_schema=pa.schema([("subj", pa.string()),
                                ("pred", pa.string()),
                                ("n_objs", pa.int64())]))


def infer_types(triples: rd.Dataset, type_pred: str = RDF_TYPE,
                min_share: float = 0.5,
                untyped_label: str = "(untyped)",
                num_partitions: "int | None" = None) -> rd.Dataset:
    """KG completion by schema statistics: propose rdf:type assertions
    for UNTYPED entities from the induced domain/range profile — if
    >= ``min_share`` of a predicate's typed subjects are Person, an
    untyped subject of that predicate is proposed Person (likewise
    objects via side='range'). Output: one distinct proposal row per
    (ent, cls, pred, side) with the supporting share — a downstream
    curation gate decides acceptance.

    Winner per (pred, side): max n, tie cls asc, among REAL classes
    only; its share is measured against all typed endpoints (untyped
    bucket excluded from the denominator definition used here: share
    column from :func:`domain_range_profile` includes untyped mass, so
    a predicate whose endpoints are mostly untyped proposes nothing
    at min_share=0.5 — deliberately conservative)."""
    import pyarrow.compute as pc

    prof = domain_range_profile(triples, type_pred=type_pred,
                                untyped_label=untyped_label,
                                num_partitions=num_partitions)
    prof = prof.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("cls"),
                                        untyped_label)),
        batch_format="pyarrow")
    keyed = prof.map_batches(
        lambda t: t.append_column(
            "_k", pc.binary_join_element_wise(
                t.column("pred"), t.column("side"), "\x1f")),
        batch_format="pyarrow")
    win = grouped_argmax(keyed, key="_k", order_col="n",
                         tie_col="cls",
                         out_cols=["pred", "side", "cls", "share"],
                         num_partitions=num_partitions)
    win = win.map_batches(
        lambda t: t.filter(pc.greater_equal(
            t.column("share"), pa.scalar(min_share, pa.float64()))),
        batch_format="pyarrow").materialize()

    ty = _distinct_triples(triples, keep={type_pred}, drop=None,
                           cols=("ent", "_tp", "cls"),
                           num_partitions=num_partitions) \
        .drop_columns(["_tp"]).materialize()
    e = _distinct_triples(triples, keep=None, drop={type_pred},
                          num_partitions=num_partitions).materialize()

    def side_props(col: str, side: str) -> rd.Dataset:
        proj = e.map_batches(
            lambda t, c=col: pa.table({"ent": t.column(c),
                                       "pred": t.column("pred")}),
            batch_format="pyarrow")
        j = hash_join(
            proj, ty.map_batches(
                lambda t: pa.table({"ent": t.column("ent"),
                                    "_any": pa.array(
                                        [1] * t.num_rows, pa.int64())}),
                batch_format="pyarrow"),
            on="ent", how="left", num_partitions=num_partitions,
            left_schema=pa.schema([("ent", pa.string()),
                                   ("pred", pa.string())]),
            right_schema=pa.schema([("ent", pa.string()),
                                    ("_any", pa.int64())]))
        untyped = j.map_batches(
            lambda t, s=side: (lambda ft: pa.table({
                "ent": ft.column("ent"), "pred": ft.column("pred"),
                "side": pa.array([s] * ft.num_rows, pa.string())}))(
                t.filter(pc.is_null(t.column("_any")))),
            batch_format="pyarrow")
        wside = win.map_batches(
            lambda t, s=side: (lambda ft: pa.table({
                "pred": ft.column("pred"), "cls": ft.column("cls"),
                "share": ft.column("share")}))(
                t.filter(pc.equal(t.column("side"), s))),
            batch_format="pyarrow")
        return hash_join(
            untyped, wside, on="pred", num_partitions=num_partitions,
            left_schema=pa.schema([("ent", pa.string()),
                                   ("pred", pa.string()),
                                   ("side", pa.string())]),
            right_schema=pa.schema([("pred", pa.string()),
                                    ("cls", pa.string()),
                                    ("share", pa.float64())]))

    u = side_props("subj", "domain").union(side_props("obj", "range"))
    # distinct proposals (an entity with k edges of one pred proposes
    # once); floats are exact copies of one profile row, safe as keys
    dedup = hash_aggregate(
        u.map_batches(
            lambda t: pa.table({
                "ent": t.column("ent"), "cls": t.column("cls"),
                "pred": t.column("pred"), "side": t.column("side"),
                "share": pc.cast(t.column("share"), pa.float64()),
                "one": pa.array([1] * t.num_rows, pa.int64())}),
            batch_format="pyarrow"),
        keys=["ent", "cls", "pred", "side", "share"],
        sum_cols={"one": "_n"}, num_partitions=num_partitions,
        out_schema=pa.schema([("ent", pa.string()),
                              ("cls", pa.string()),
                              ("pred", pa.string()),
                              ("side", pa.string()),
                              ("share", pa.float64()),
                              ("_n", pa.int64())]))
    return dedup.drop_columns(["_n"])


def entity_fact_jaccard(triples: rd.Dataset,
                        exclude_preds: "tuple[str, ...]" = (RDF_TYPE,
                                                            OWL_SAMEAS),
                        min_common: int = 1,
                        max_feature_df: "int | None" = None,
                        num_partitions: "int | None" = None
                        ) -> rd.Dataset:
    """Duplicate-entity detection by FACT overlap (the ER signal
    string similarity can't see): Jaccard between entities' distinct
    (pred, obj) feature sets via the co-citation machinery
    (:func:`tabbyray.ops.graph.outlink_jaccard` — entity = source,
    feature = target). ``max_feature_df`` drops features shared by
    more entities than the cap from pair generation (supernode cut);
    ``min_common`` prunes weak pairs. Output: (ent_a, ent_b,
    n_common, jaccard)."""
    from .graph import outlink_jaccard

    e = _distinct_triples(triples, keep=None, drop=set(exclude_preds),
                          num_partitions=num_partitions)

    def feat(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "src": t.column("subj"),
            "dst": pc.binary_join_element_wise(
                t.column("pred"), t.column("obj"), "\x1f")})

    pairs = outlink_jaccard(
        e.map_batches(feat, batch_format="pyarrow"),
        pair_cols=("src", "dst"),
        max_target_indegree=max_feature_df, min_common=min_common,
        num_partitions=num_partitions)
    return pairs.map_batches(
        lambda t: pa.table({"ent_a": t.column("node_a"),
                            "ent_b": t.column("node_b"),
                            "n_common": t.column("common_targets"),
                            "jaccard": t.column("jaccard")}),
        batch_format="pyarrow")


def fact_lifespan(triples: rd.Dataset, pages: rd.Dataset,
                  url_col: str = "url", ts_col: str = "warc_ts",
                  num_partitions: "int | None" = None) -> rd.Dataset:
    """Temporal validity profile per fact: first / last capture time
    (epoch micros) and assertion count across a recrawled corpus — the
    evidence an incremental KG uses to retire stale facts (a fact not
    re-asserted since its slot's winner moved on gets an end date).
    One url co-partitioned stamp join + ONE min/max/count combiner
    exchange (per-batch pandas groupby partial -> triple-hash
    partition -> final merge)."""
    import pyarrow.compute as pc

    from .relational import _resolve_partitions, typed_groupby_map

    num_partitions = _resolve_partitions(num_partitions)

    ts = pages.map_batches(
        lambda t: pa.table({
            "url": pc.cast(t.column(url_col), pa.string()),
            "ts_us": pc.cast(t.column(ts_col), pa.int64())}),
        batch_format="pyarrow")

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": pc.cast(t.column(url_col), pa.string()),
            "subj": pc.cast(t.column("subj"), pa.string()),
            "pred": pc.cast(t.column("pred"), pa.string()),
            "obj": pc.cast(t.column("obj"), pa.string())})

    stamped = hash_join(
        triples.map_batches(proj, batch_format="pyarrow"), ts,
        on="url", num_partitions=num_partitions,
        left_schema=pa.schema([("url", pa.string()),
                               ("subj", pa.string()),
                               ("pred", pa.string()),
                               ("obj", pa.string())]),
        right_schema=pa.schema([("url", pa.string()),
                                ("ts_us", pa.int64())]))

    keys = ["subj", "pred", "obj"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, as_index=False).agg(
            first_ts_us=("ts_us", "min"), last_ts_us=("ts_us", "max"),
            n_captures=("ts_us", "count"))
        h = pd.util.hash_pandas_object(
            g[keys].agg("\x1f".join, axis=1), index=False)
        return g.assign(_part=(h % num_partitions).astype("int64"))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(keys, as_index=False).agg(
            first_ts_us=("first_ts_us", "min"),
            last_ts_us=("last_ts_us", "max"),
            n_captures=("n_captures", "sum"))

    out_schema = pa.schema([
        ("subj", pa.string()), ("pred", pa.string()),
        ("obj", pa.string()), ("first_ts_us", pa.int64()),
        ("last_ts_us", pa.int64()), ("n_captures", pa.int64())])
    return typed_groupby_map(
        stamped.map_batches(partial, batch_format="pandas"),
        "_part", final, out_schema)


def resolve_conflicts_weighted(triples: rd.Dataset,
                               source_weights: rd.Dataset,
                               source_col: str = "url",
                               weight_col: str = "weight",
                               default_weight: float = 1.0,
                               num_partitions: "int | None" = None
                               ) -> rd.Dataset:
    """Trust-weighted truth discovery: like :func:`resolve_conflicts`
    but each DISTINCT source votes with its trust weight (e.g. a
    TrustRank score per host) instead of 1 — the standard fusion
    upgrade once source reliability is measurable. Winner per (subj,
    pred) = max total weight, quantized 9 dp BEFORE the argmax (ties
    after quantization break obj asc); sources missing from the weight
    table vote ``default_weight``. Output: (subj, pred, obj, weight,
    n_objs).

    Plan: one (s,p,o,source) combiner distinct + one source-key LEFT
    join + one weight-sum aggregate + ONE grouped-argmax combiner
    exchange + a small rollup join."""
    import numpy as np
    import pyarrow.compute as pc

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "subj": pc.cast(t.column("subj"), pa.string()),
            "pred": pc.cast(t.column("pred"), pa.string()),
            "obj": pc.cast(t.column("obj"), pa.string()),
            "source": pc.cast(t.column(source_col), pa.string()),
            "one": pa.array([1] * t.num_rows, pa.int64())})

    per_src = hash_aggregate(
        triples.map_batches(proj, batch_format="pyarrow"),
        keys=["subj", "pred", "obj", "source"],
        sum_cols={"one": "_n"}, num_partitions=num_partitions,
        out_schema=pa.schema([("subj", pa.string()),
                              ("pred", pa.string()),
                              ("obj", pa.string()),
                              ("source", pa.string()),
                              ("_n", pa.int64())])).drop_columns(["_n"])

    w = source_weights.map_batches(
        lambda t: pa.table({
            "source": pc.cast(t.column(source_col), pa.string()),
            "w": pc.cast(t.column(weight_col), pa.float64())}),
        batch_format="pyarrow")
    stamped = hash_join(
        per_src, w, on="source", how="left",
        num_partitions=num_partitions,
        left_schema=pa.schema([("subj", pa.string()),
                               ("pred", pa.string()),
                               ("obj", pa.string()),
                               ("source", pa.string())]),
        right_schema=pa.schema([("source", pa.string()),
                                ("w", pa.float64())]))

    def filled(t: pa.Table) -> pa.Table:
        return pa.table({
            "subj": t.column("subj"), "pred": t.column("pred"),
            "obj": t.column("obj"),
            "w": pc.fill_null(pc.cast(t.column("w"), pa.float64()),
                              default_weight)})

    from .relational import typed_groupby_map
    from .relational import _resolve_partitions
    num_partitions = _resolve_partitions(num_partitions)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["subj", "pred", "obj"],
                       as_index=False)["w"].sum()
        h = pd.util.hash_pandas_object(
            g[["subj", "pred", "obj"]].agg("\x1f".join, axis=1),
            index=False)
        return g.assign(_part=(h % num_partitions).astype("int64"))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["subj", "pred", "obj"],
                        as_index=False)["w"].sum()
        out["w"] = np.round(out["w"], 9)    # quantize BEFORE argmax
        return out

    votes = typed_groupby_map(
        stamped.map_batches(filled, batch_format="pyarrow")
        .map_batches(partial, batch_format="pandas"),
        "_part", final,
        pa.schema([("subj", pa.string()), ("pred", pa.string()),
                   ("obj", pa.string()),
                   ("w", pa.float64())])).materialize()

    keyed = votes.map_batches(
        lambda t: t.append_column(
            "_k", pc.binary_join_element_wise(
                t.column("subj"), t.column("pred"), "\x1f")),
        batch_format="pyarrow")
    win = grouped_argmax(keyed, key="_k", order_col="w",
                         tie_col="obj",
                         out_cols=["subj", "pred", "obj", "w"],
                         num_partitions=num_partitions)
    win = win.map_batches(
        lambda t: t.rename_columns(["subj", "pred", "obj", "weight"]),
        batch_format="pyarrow")

    n_objs = partial_agg_sum(
        votes.map_batches(
            lambda t: pa.table({
                "subj": t.column("subj"), "pred": t.column("pred"),
                "one": pa.array([1] * t.num_rows, pa.int64())}),
            batch_format="pyarrow"),
        ["subj", "pred"], {"one": "n_objs"})
    return hash_join(
        win, n_objs, on=["subj", "pred"],
        num_partitions=num_partitions,
        left_schema=pa.schema([("subj", pa.string()),
                               ("pred", pa.string()),
                               ("obj", pa.string()),
                               ("weight", pa.float64())]),
        right_schema=pa.schema([("subj", pa.string()),
                                ("pred", pa.string()),
                                ("n_objs", pa.int64())]))


def predicate_conflict_rate(triples: rd.Dataset,
                            source_col: str = "url",
                            num_partitions: "int | None" = None
                            ) -> rd.Dataset:
    """Per-predicate curation dashboard: how many (subj, pred) slots
    exist, how many are CONFLICTED (>1 distinct object), and the
    conflict share — the metric that decides which predicates need a
    fusion policy before load. Rolls up the distinct (s, p, o) slot
    stream with two combiner aggregates + one vectorized finish;
    quantized 9 dp."""
    import numpy as np
    import pyarrow.compute as pc

    slots = hash_aggregate(
        triples.map_batches(
            lambda t: pa.table({
                "subj": pc.cast(t.column("subj"), pa.string()),
                "pred": pc.cast(t.column("pred"), pa.string()),
                "obj": pc.cast(t.column("obj"), pa.string()),
                "one": pa.array([1] * t.num_rows, pa.int64())}),
            batch_format="pyarrow"),
        keys=["subj", "pred", "obj"], sum_cols={"one": "_n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("subj", pa.string()),
                              ("pred", pa.string()),
                              ("obj", pa.string()),
                              ("_n", pa.int64())]))
    per_slot = hash_aggregate(
        slots.map_batches(
            lambda t: pa.table({
                "subj": t.column("subj"), "pred": t.column("pred"),
                "one": pa.array([1] * t.num_rows, pa.int64())}),
            batch_format="pyarrow"),
        keys=["subj", "pred"], sum_cols={"one": "n_objs"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("subj", pa.string()),
                              ("pred", pa.string()),
                              ("n_objs", pa.int64())]))
    per_pred = partial_agg_sum(
        per_slot.map_batches(
            lambda t: pa.table({
                "pred": t.column("pred"),
                "one": pa.array([1] * t.num_rows, pa.int64()),
                "conf": pc.cast(pc.greater(
                    t.column("n_objs"), pa.scalar(1, pa.int64())),
                    pa.int64())}),
            batch_format="pyarrow"),
        "pred", {"one": "n_slots", "conf": "n_conflicted"})

    def finish(t: pa.Table) -> pa.Table:
        ns = t.column("n_slots").to_numpy(zero_copy_only=False)
        nc = t.column("n_conflicted").to_numpy(zero_copy_only=False)
        return pa.table({
            "pred": t.column("pred"), "n_slots": t.column("n_slots"),
            "n_conflicted": t.column("n_conflicted"),
            "conflict_share": pa.array(np.round(nc * 1.0 / ns, 9),
                                       pa.float64())})

    return per_pred.map_batches(finish, batch_format="pyarrow")

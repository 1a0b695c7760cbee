"""OWL/RDFS entailment + KG shape validation + structure profiling.

The reference hard-codes its ontology facts (property/datatype tables
in components/CanonicalTableAnnotator.php:382-415) and never applies
schema-level inference; a corpus-scale KG build materializes the cheap
entailments once so every downstream consumer (query, embedding,
dedup) sees the closed graph. All ops are Dataset -> Dataset,
combiner-first, bounded driver state:

* :func:`subproperty_entailment` — rdfs7 through the transitive
  closure of ``rdfs:subPropertyOf`` (schema axioms are catalog-sized:
  closed on the driver behind a count gate, shipped once via ray.put)
* :func:`inverse_symmetric_entailment` — owl:inverseOf mirrors +
  owl:SymmetricProperty mirrors, asserted-beats-entailed provenance
* :func:`transitive_entailment` — per declared owl:TransitiveProperty
  the min-hop reachability closure (bounded frontier-join rounds; the
  instance edges are corpus-sized so NO driver state)
* :func:`characteristic_sets` — per-subject distinct-predicate-set
  profile (the cardinality-estimation statistic of Neumann &
  Moerkotte, "Characteristic Sets", ICDE 2011)
* :func:`ifp_pairs` / :func:`ifp_resolve` — identity inference from
  shared owl:InverseFunctionalProperty values (pairs, then
  component-closed canonical mapping)
* :func:`shacl_validate` — SHACL-lite per-class cardinality shapes
* :func:`fact_intervals` — gaps-and-islands coalescing of a fact's
  capture timestamps into validity intervals
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from .kgconstruct import _distinct_triples
from .kgprofile import RDF_TYPE
from .relational import (_resolve_partitions, hash_aggregate, hash_join,
                         hash_min, typed_groupby_map)

RDFS_SUBPROP = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
OWL_INVERSE = "http://www.w3.org/2002/07/owl#inverseOf"
OWL_SYMMETRIC = "http://www.w3.org/2002/07/owl#SymmetricProperty"
OWL_TRANSITIVE = "http://www.w3.org/2002/07/owl#TransitiveProperty"
OWL_IFP = "http://www.w3.org/2002/07/owl#InverseFunctionalProperty"

_TRIPLE_SCHEMA = pa.schema([("subj", pa.string()), ("pred", pa.string()),
                            ("obj", pa.string())])


def _axiom_collect(ds: rd.Dataset, max_rows: int, what: str):
    """Bounded driver collect of a SCHEMA-level relation: count first,
    raise actionably instead of materializing an unexpectedly huge
    set (ontology axiom tables are 10^2-10^5 rows in any real KG —
    five orders below the instance stream)."""
    ds = ds.materialize()
    n = ds.count()
    if n > max_rows:
        raise ValueError(
            f"{what}: {n} axiom rows exceed the driver gate "
            f"({max_rows}); an axiom set this large is not "
            "schema-shaped — shard the entailment by axiom subset")
    return ds.take_all()


def _origin_finalize(union: rd.Dataset, rank_names: "dict[int, str]",
                     num_partitions: int) -> rd.Dataset:
    """min-rank dedup of (subj, pred, obj, _rk) -> origin label."""
    import pyarrow.compute as pc

    ranked = hash_min(
        union, ["subj", "pred", "obj"], {"_rk": "_rk"},
        num_partitions=num_partitions,
        out_schema=pa.schema(list(_TRIPLE_SCHEMA)
                             + [("_rk", pa.int64())]))
    items = sorted(rank_names.items())
    lut = pa.array([n for _, n in items], pa.string())

    def label(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("_rk"),
                          value_set=pa.array([r for r, _ in items],
                                             pa.int64()))
        return pa.table({"subj": t.column("subj"),
                         "pred": t.column("pred"),
                         "obj": t.column("obj"),
                         "origin": pc.take(lut, idx)})

    return ranked.map_batches(label, batch_format="pyarrow")


def subproperty_entailment(triples: rd.Dataset,
                           subprop_pred: str = RDFS_SUBPROP,
                           axiom_max: int = 1_000_000,
                           num_partitions: "int | None" = None
                           ) -> rd.Dataset:
    """rdfs7 + rdfs5: every fact (s, p, o) entails (s, q, o) for every
    superproperty q reachable from p through ``rdfs:subPropertyOf``
    chains. Output: distinct (subj, pred, obj, origin) with origin =
    'asserted' when the triple exists in the input (beats 'rdfs7').

    Plan: ONE distinct exchange for the axiom edge set (counted before
    a gated collect — subPropertyOf axioms are schema-sized by
    definition), driver BFS closes the chains, the closure table ships
    once via ray.put; each fact batch does one vectorized pandas merge
    (pred -> all superproperties) and the union dedups through one
    min-rank combiner exchange. Zero corpus-sized driver state."""
    import ray

    num_partitions = _resolve_partitions(num_partitions)

    ax = _distinct_triples(triples, keep={subprop_pred}, drop=None,
                           cols=("sub", "_p", "sup"),
                           num_partitions=num_partitions) \
        .drop_columns(["_p"])
    edges: dict[str, list[str]] = {}
    for r in _axiom_collect(ax, axiom_max, "subproperty_entailment"):
        edges.setdefault(r["sub"], []).append(r["sup"])
    closure: list[tuple[str, str]] = []
    for start in edges:
        seen = {start}
        frontier = [start]
        while frontier:
            nxt = []
            for p in frontier:
                for q in edges.get(p, ()):
                    if q not in seen:
                        seen.add(q)
                        nxt.append(q)
                        closure.append((start, q))
            frontier = nxt
    cl_tbl = pa.table({"pred": pa.array([a for a, _ in closure],
                                        pa.string()),
                       "_sup": pa.array([b for _, b in closure],
                                        pa.string())})
    ref = ray.put(cl_tbl)

    facts = _distinct_triples(triples, keep=None, drop={subprop_pred},
                              num_partitions=num_partitions)

    def explode(t: pa.Table) -> pa.Table:
        cl = ray.get(ref).to_pandas()
        df = t.select(["subj", "pred", "obj"]).to_pandas()
        inh = df.merge(cl, on="pred", how="inner")
        inh = pd.DataFrame({"subj": inh["subj"], "pred": inh["_sup"],
                            "obj": inh["obj"]})
        inh["_rk"] = 1
        df["_rk"] = 0
        out = pd.concat([df, inh], ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False).cast(
            pa.schema(list(_TRIPLE_SCHEMA) + [("_rk", pa.int64())]))

    union = facts.map_batches(explode, batch_format="pyarrow")
    return _origin_finalize(union, {0: "asserted", 1: "rdfs7"},
                            num_partitions)


def inverse_symmetric_entailment(triples: rd.Dataset,
                                 inverse_pred: str = OWL_INVERSE,
                                 symmetric_class: str = OWL_SYMMETRIC,
                                 type_pred: str = RDF_TYPE,
                                 axiom_max: int = 1_000_000,
                                 num_partitions: "int | None" = None
                                 ) -> rd.Dataset:
    """owl:inverseOf + owl:SymmetricProperty entailment: for an axiom
    (p owl:inverseOf q), every (s, p, o) entails (o, q, s) and every
    (s, q, o) entails (o, p, s); for a predicate declared
    owl:SymmetricProperty, (s, p, o) entails (o, p, s). Output:
    distinct (subj, pred, obj, origin) with origin in
    {'asserted' (0) < 'owl_inv' (1) < 'owl_sym' (2)} by min-rank (a
    pre-materialized mirror stays 'asserted').

    Axioms are schema-sized: ONE gated collect builds a
    pred -> (mirror_pred, rank) mapping table shipped via ray.put;
    each fact batch mirrors with one vectorized pandas merge. The
    owl:inverseOf axiom rows themselves are excluded from the fact
    stream (declarations about predicates, not instance facts);
    rdf:type declarations pass through as ordinary asserted facts."""
    import ray

    num_partitions = _resolve_partitions(num_partitions)

    inv = _distinct_triples(triples, keep={inverse_pred}, drop=None,
                            cols=("p", "_ip", "q"),
                            num_partitions=num_partitions) \
        .drop_columns(["_ip"])
    mapping: list[tuple[str, str, int]] = []
    for r in _axiom_collect(inv, axiom_max,
                            "inverse_symmetric_entailment[inverseOf]"):
        mapping.append((r["p"], r["q"], 1))
        mapping.append((r["q"], r["p"], 1))

    import pyarrow.compute as pc

    def sym_decls(t: pa.Table) -> pa.Table:
        p = pc.cast(t.column("pred"), pa.string())
        o = pc.cast(t.column("obj"), pa.string())
        keep = pc.and_(pc.equal(p, type_pred),
                       pc.equal(o, symmetric_class))
        ft = t.filter(keep)
        return pa.table({"p": pc.cast(ft.column("subj"), pa.string()),
                         "one": pa.array([1] * ft.num_rows, pa.int64())})

    sym = hash_aggregate(
        triples.map_batches(sym_decls, batch_format="pyarrow"),
        keys=["p"], sum_cols={"one": "_n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("p", pa.string()), ("_n", pa.int64())]))
    for r in _axiom_collect(sym, axiom_max,
                            "inverse_symmetric_entailment[symmetric]"):
        mapping.append((r["p"], r["p"], 2))

    map_tbl = pa.table({
        "pred": pa.array([m[0] for m in mapping], pa.string()),
        "_mp": pa.array([m[1] for m in mapping], pa.string()),
        "_mrk": pa.array([m[2] for m in mapping], pa.int64())})
    ref = ray.put(map_tbl)

    facts = _distinct_triples(triples, keep=None, drop={inverse_pred},
                              num_partitions=num_partitions)

    def mirror(t: pa.Table) -> pa.Table:
        mp = ray.get(ref).to_pandas()
        df = t.select(["subj", "pred", "obj"]).to_pandas()
        m = df.merge(mp, on="pred", how="inner")
        m = pd.DataFrame({"subj": m["obj"], "pred": m["_mp"],
                          "obj": m["subj"], "_rk": m["_mrk"]})
        df["_rk"] = 0
        out = pd.concat([df, m], ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False).cast(
            pa.schema(list(_TRIPLE_SCHEMA) + [("_rk", pa.int64())]))

    union = facts.map_batches(mirror, batch_format="pyarrow")
    return _origin_finalize(
        union, {0: "asserted", 1: "owl_inv", 2: "owl_sym"},
        num_partitions)


def transitive_entailment(triples: rd.Dataset,
                          transitive_class: str = OWL_TRANSITIVE,
                          type_pred: str = RDF_TYPE,
                          max_rounds: int = 8,
                          axiom_max: int = 100_000,
                          num_partitions: "int | None" = None
                          ) -> rd.Dataset:
    """owl:TransitiveProperty closure: for every predicate declared
    transitive, all (s, o) pairs connected by a directed path of its
    edges, with ``depth`` = MINIMUM hop count (1 = asserted edge).
    Output: (subj, pred, obj, depth), one row per distinct pair, only
    the transitive predicates.

    Only the predicate DECLARATIONS touch the driver (gated collect);
    the instance edges stay distributed: ``max_rounds - 1`` frontier
    rounds of composite-key (pred, node) hash_join + a per-round
    min-depth combiner exchange, exactly the
    :func:`tabbyray.ops.kgprofile.type_closure` join plan generalized
    to multiple predicates at once. Rounds are fixed (not
    converge-tested per-pred), so cycles cannot loop — a cyclic
    input yields shortest-path depths truncated at ``max_rounds``."""
    import pyarrow.compute as pc

    num_partitions = _resolve_partitions(num_partitions)

    def decls(t: pa.Table) -> pa.Table:
        p = pc.cast(t.column("pred"), pa.string())
        o = pc.cast(t.column("obj"), pa.string())
        ft = t.filter(pc.and_(pc.equal(p, type_pred),
                              pc.equal(o, transitive_class)))
        return pa.table({"p": pc.cast(ft.column("subj"), pa.string()),
                         "one": pa.array([1] * ft.num_rows, pa.int64())})

    tp = hash_aggregate(
        triples.map_batches(decls, batch_format="pyarrow"),
        keys=["p"], sum_cols={"one": "_n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("p", pa.string()), ("_n", pa.int64())]))
    tpreds = {r["p"] for r in _axiom_collect(
        tp, axiom_max, "transitive_entailment[declarations]")}

    edges = _distinct_triples(triples, keep=tpreds, drop=None,
                              num_partitions=num_partitions)
    out_schema = pa.schema(list(_TRIPLE_SCHEMA) + [("depth", pa.int64())])
    closure = edges.map_batches(
        lambda t: t.append_column(
            "depth", pa.array([1] * t.num_rows, pa.int64())),
        batch_format="pyarrow").materialize()

    frontier = closure
    for _ in range(1, max_rounds):
        step = hash_join(
            frontier.map_batches(
                lambda t: pa.table({"pred": t.column("pred"),
                                    "hop": t.column("obj"),
                                    "subj": t.column("subj"),
                                    "depth": t.column("depth")}),
                batch_format="pyarrow"),
            edges.map_batches(
                lambda t: pa.table({"pred": t.column("pred"),
                                    "hop": t.column("subj"),
                                    "obj": t.column("obj")}),
                batch_format="pyarrow"),
            on=["pred", "hop"],
            left_schema=pa.schema([("pred", pa.string()),
                                   ("hop", pa.string()),
                                   ("subj", pa.string()),
                                   ("depth", pa.int64())]),
            right_schema=pa.schema([("pred", pa.string()),
                                    ("hop", pa.string()),
                                    ("obj", pa.string())]),
            num_partitions=num_partitions)
        step = step.map_batches(
            lambda t: pa.table({
                "subj": t.column("subj"), "pred": t.column("pred"),
                "obj": t.column("obj"),
                "depth": pc.add(t.column("depth"),
                                pa.scalar(1, pa.int64()))}),
            batch_format="pyarrow")
        if step.count() == 0:
            break
        frontier = hash_min(step, ["subj", "pred", "obj"],
                            {"depth": "depth"},
                            num_partitions=num_partitions,
                            out_schema=out_schema).materialize()
        closure = closure.union(frontier)
    return hash_min(closure, ["subj", "pred", "obj"], {"depth": "depth"},
                    num_partitions=num_partitions, out_schema=out_schema)


def characteristic_sets(triples: rd.Dataset,
                        num_partitions: "int | None" = None
                        ) -> rd.Dataset:
    """Characteristic-set profile (Neumann & Moerkotte, ICDE 2011):
    group subjects by their exact set of distinct predicates. Output
    one row per observed set: (cset — '|'-joined sorted predicates,
    n_preds, n_subjects, n_facts — distinct (s,p,o) facts carried by
    subjects in the set). THE statistic a SPARQL cardinality
    estimator / star-join planner is built on.

    Plan: one (s,p,o) distinct exchange -> one (subj, pred) combiner
    count -> one subj-hash exchange with a per-partition vectorized
    sort+join (each subject's predicate list) -> one cset combiner
    aggregate. No driver state; the widest exchange moves one row per
    distinct (subj, pred)."""
    num_partitions = _resolve_partitions(num_partitions)

    facts = _distinct_triples(triples, keep=None, drop=None,
                              num_partitions=num_partitions)
    sp = hash_aggregate(
        facts.map_batches(
            lambda t: pa.table({"subj": t.column("subj"),
                                "pred": t.column("pred"),
                                "one": pa.array([1] * t.num_rows,
                                                pa.int64())}),
            batch_format="pyarrow"),
        keys=["subj", "pred"], sum_cols={"one": "npo"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("subj", pa.string()),
                              ("pred", pa.string()),
                              ("npo", pa.int64())]))

    def part(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["subj"], index=False)
        return df.assign(_part=(h % num_partitions).astype("int64"))

    def per_subject(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["subj", "pred"], kind="stable")
        agg = g.groupby("subj", as_index=False).agg(
            cset=("pred", "|".join), n_preds=("pred", "size"),
            n_facts=("npo", "sum"))
        return agg[["cset", "n_preds", "n_facts"]]

    subj_schema = pa.schema([("cset", pa.string()),
                             ("n_preds", pa.int64()),
                             ("n_facts", pa.int64())])
    per_subj = typed_groupby_map(
        sp.map_batches(part, batch_format="pandas"), "_part",
        per_subject, subj_schema)
    return hash_aggregate(
        per_subj.map_batches(
            lambda t: t.append_column(
                "one", pa.array([1] * t.num_rows, pa.int64())),
            batch_format="pyarrow"),
        keys=["cset", "n_preds"],
        sum_cols={"one": "n_subjects", "n_facts": "n_facts"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("cset", pa.string()),
                              ("n_preds", pa.int64()),
                              ("n_subjects", pa.int64()),
                              ("n_facts", pa.int64())]))


def ifp_pairs(triples: rd.Dataset,
              ifp_class: str = OWL_IFP,
              type_pred: str = RDF_TYPE,
              axiom_max: int = 100_000,
              max_group: int = 10_000,
              num_partitions: "int | None" = None) -> rd.Dataset:
    """Identity-pair inference from owl:InverseFunctionalProperty
    values: two subjects asserting the SAME (ifp predicate, value)
    are the same real-world entity. Output: (a, b, n_shared) with
    a < b lexicographically and n_shared = the number of distinct
    (pred, value) witnesses.

    Plan: the IFP declarations are a gated driver collect; the value
    stream stays distributed — one (s,p,o) distinct exchange, one
    (pred, obj)-hash exchange, per-partition vectorized pair
    generation (each value group emits its sorted member pairs), one
    (a, b) combiner count. ``max_group`` caps a pathological shared
    value (an empty-string email at corpus scale would emit k^2
    pairs): groups above the cap raise actionably rather than
    silently exploding the exchange."""
    import pyarrow.compute as pc

    num_partitions = _resolve_partitions(num_partitions)

    def decls(t: pa.Table) -> pa.Table:
        p = pc.cast(t.column("pred"), pa.string())
        o = pc.cast(t.column("obj"), pa.string())
        ft = t.filter(pc.and_(pc.equal(p, type_pred),
                              pc.equal(o, ifp_class)))
        return pa.table({"p": pc.cast(ft.column("subj"), pa.string()),
                         "one": pa.array([1] * ft.num_rows, pa.int64())})

    dp = hash_aggregate(
        triples.map_batches(decls, batch_format="pyarrow"),
        keys=["p"], sum_cols={"one": "_n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("p", pa.string()), ("_n", pa.int64())]))
    ipreds = {r["p"] for r in _axiom_collect(
        dp, axiom_max, "ifp_pairs[declarations]")}

    vals = _distinct_triples(triples, keep=ipreds, drop=None,
                             num_partitions=num_partitions)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(
            df["pred"] + "\x1f" + df["obj"], index=False)
        return df.assign(_part=(h % num_partitions).astype("int64"))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for (_, _), grp in g.groupby(["pred", "obj"], sort=False):
            members = sorted(grp["subj"].unique())
            k = len(members)
            if k > max_group:
                raise ValueError(
                    f"ifp_pairs: a shared value groups {k} subjects "
                    f"(> max_group={max_group}); blocklist junk "
                    "values (empty strings, placeholders) upstream")
            for i in range(k):
                for j in range(i + 1, k):
                    out_a.append(members[i])
                    out_b.append(members[j])
        return pd.DataFrame({"a": out_a, "b": out_b,
                             "one": [1] * len(out_a)})

    pair_schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                             ("one", pa.int64())])
    p = typed_groupby_map(
        vals.map_batches(part, batch_format="pandas"), "_part",
        pairs, pair_schema)
    return hash_aggregate(
        p, keys=["a", "b"], sum_cols={"one": "n_shared"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("a", pa.string()), ("b", pa.string()),
                              ("n_shared", pa.int64())]))


def ifp_resolve(triples: rd.Dataset,
                ifp_class: str = OWL_IFP,
                components_mode: str = "auto",
                num_partitions: "int | None" = None) -> rd.Dataset:
    """IFP identity RESOLUTION: close :func:`ifp_pairs` into connected
    components (shared-value identity chains merge transitively — a~b
    via one email, b~c via another) and emit (entity, canon) for every
    entity in at least one pair, canon = the lexicographically
    smallest member (the :func:`tabbyray.ops.kgconstruct.sameas_closure`
    canonical rule, so the mapping can feed straight into a sameAs
    rewrite). Components via
    :func:`tabbyray.ops.linkage.string_components` — count-gated local
    union-find / distributed label propagation."""
    from .linkage import string_components

    num_partitions = _resolve_partitions(num_partitions)
    pr = ifp_pairs(triples, ifp_class=ifp_class,
                   num_partitions=num_partitions) \
        .drop_columns(["n_shared"]).materialize()

    def node_col(c: str):
        return pr.map_batches(
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
    comp = string_components(pr, nodes, edge_cols=("a", "b"),
                             node_col="node", mode=components_mode,
                             num_partitions=num_partitions)
    return comp.map_batches(
        lambda t: pa.table({"entity": t.column("node"),
                            "canon": t.column("component")}),
        batch_format="pyarrow")


def shacl_validate(triples: rd.Dataset,
                   shapes: "list[tuple[str, str, int, int | None]]",
                   type_pred: str = RDF_TYPE,
                   num_partitions: "int | None" = None) -> rd.Dataset:
    """SHACL-lite cardinality validation: each shape is
    (target_class, pred, min_count, max_count-or-None); every entity
    asserted to be of ``target_class`` must carry between min_count
    and max_count DISTINCT objects for ``pred``. Output: violations
    only — (entity, cls, pred, n_objs, violation in {'min','max'}).

    The shape list is part of the OPERATOR CONFIG (ships in the task
    closure — ontology shapes are dozens of rows), not data. Plan:
    one type-distinct exchange, one (subj, pred) distinct-object
    combiner count, entities x matching shapes exploded per batch by
    one vectorized pandas merge, one LEFT composite-key join against
    the counts (absent -> 0), one vectorized filter."""
    import pyarrow.compute as pc

    num_partitions = _resolve_partitions(num_partitions)
    shape_df = pd.DataFrame(
        [(c, p, mi, (-1 if mx is None else mx))
         for c, p, mi, mx in shapes],
        columns=["cls", "pred", "_min", "_max"])
    shape_preds = set(shape_df["pred"])

    types = _distinct_triples(triples, keep={type_pred}, drop=None,
                              cols=("entity", "_tp", "cls"),
                              num_partitions=num_partitions) \
        .drop_columns(["_tp"])

    counts = hash_aggregate(
        _distinct_triples(triples, keep=shape_preds, drop=None,
                          num_partitions=num_partitions).map_batches(
            lambda t: pa.table({"entity": t.column("subj"),
                                "pred": t.column("pred"),
                                "one": pa.array([1] * t.num_rows,
                                                pa.int64())}),
            batch_format="pyarrow"),
        keys=["entity", "pred"], sum_cols={"one": "n_objs"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("entity", pa.string()),
                              ("pred", pa.string()),
                              ("n_objs", pa.int64())]))

    def targets(t: pa.Table) -> pa.Table:
        df = t.select(["entity", "cls"]).to_pandas()
        m = df.merge(shape_df, on="cls", how="inner")
        return pa.Table.from_pandas(m, preserve_index=False).cast(
            pa.schema([("entity", pa.string()), ("cls", pa.string()),
                       ("pred", pa.string()), ("_min", pa.int64()),
                       ("_max", pa.int64())]))

    tg = types.map_batches(targets, batch_format="pyarrow")
    j = hash_join(
        tg, counts, on=["entity", "pred"], how="left",
        num_partitions=num_partitions,
        left_schema=pa.schema([("entity", pa.string()),
                               ("cls", pa.string()),
                               ("pred", pa.string()),
                               ("_min", pa.int64()),
                               ("_max", pa.int64())]),
        right_schema=pa.schema([("entity", pa.string()),
                                ("pred", pa.string()),
                                ("n_objs", pa.int64())]))

    def viol(t: pa.Table) -> pa.Table:
        n = pc.coalesce(t.column("n_objs"),
                        pa.scalar(0, pa.int64()))
        n = pc.cast(n, pa.int64())
        under = pc.less(n, t.column("_min"))
        over = pc.and_(pc.greater_equal(t.column("_max"),
                                        pa.scalar(0, pa.int64())),
                       pc.greater(n, t.column("_max")))
        kind = pc.if_else(under, pa.scalar("min", pa.string()),
                          pc.if_else(over, pa.scalar("max", pa.string()),
                                     pa.scalar(None, pa.string())))
        out = pa.table({"entity": t.column("entity"),
                        "cls": t.column("cls"),
                        "pred": t.column("pred"),
                        "n_objs": n, "violation": kind})
        return out.filter(pc.is_valid(kind))

    return j.map_batches(viol, batch_format="pyarrow")


def fact_intervals(triples: rd.Dataset, pages: rd.Dataset,
                   max_gap_us: int,
                   url_col: str = "url", ts_col: str = "warc_ts",
                   num_partitions: "int | None" = None) -> rd.Dataset:
    """Validity-interval coalescing (gaps-and-islands) per fact: a
    fact's capture timestamps across a recrawled corpus are merged
    into maximal runs where consecutive captures are at most
    ``max_gap_us`` apart — the retire/revive signal an incremental KG
    uses where :func:`tabbyray.ops.kgconstruct.fact_lifespan`'s single
    [first, last] span would paper over a retraction window. Output:
    (subj, pred, obj, start_us, end_us, n_captures), one row per
    island.

    One url co-partitioned stamp join + one (s,p,o)-hash exchange;
    islands are computed per partition with vectorized pandas (sort,
    lag-diff, boundary cumsum, one groupby) — every capture of a fact
    lands in one partition, which holds as long as no single fact's
    capture history outgrows a worker (recrawl counts per fact are
    bounded in practice; a hotter fact needs time-bucketed
    pre-coalescing first)."""
    import pyarrow.compute as pc

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
        left_schema=pa.schema([("url", pa.string())]
                              + list(_TRIPLE_SCHEMA)),
        right_schema=pa.schema([("url", pa.string()),
                                ("ts_us", pa.int64())]))

    keys = ["subj", "pred", "obj"]

    def part(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(
            df[keys].agg("\x1f".join, axis=1), index=False)
        return df.assign(_part=(h % num_partitions).astype("int64"))

    def islands(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(keys + ["ts_us"], kind="stable")
        new_fact = (g[keys] != g[keys].shift()).any(axis=1)
        gap = g["ts_us"].diff()
        boundary = new_fact | (gap > max_gap_us)
        g = g.assign(_isl=boundary.cumsum())
        out = g.groupby(keys + ["_isl"], as_index=False).agg(
            start_us=("ts_us", "min"), end_us=("ts_us", "max"),
            n_captures=("ts_us", "count"))
        out["n_captures"] = out["n_captures"].astype("int64")
        return out[keys + ["start_us", "end_us", "n_captures"]]

    out_schema = pa.schema(list(_TRIPLE_SCHEMA)
                           + [("start_us", pa.int64()),
                              ("end_us", pa.int64()),
                              ("n_captures", pa.int64())])
    return typed_groupby_map(
        stamped.map_batches(part, batch_format="pandas"),
        "_part", islands, out_schema)


RDFS_DOMAIN = "http://www.w3.org/2000/01/rdf-schema#domain"
RDFS_RANGE = "http://www.w3.org/2000/01/rdf-schema#range"


def domain_range_entailment(triples: rd.Dataset,
                            domain_pred: str = RDFS_DOMAIN,
                            range_pred: str = RDFS_RANGE,
                            type_pred: str = RDF_TYPE,
                            axiom_max: int = 1_000_000,
                            num_partitions: "int | None" = None
                            ) -> rd.Dataset:
    """rdfs2 + rdfs3 type entailment: a fact (s, p, o) with an axiom
    (p rdfs:domain C) entails (s rdf:type C); with (p rdfs:range C)
    it entails (o rdf:type C). Output: distinct (entity, cls, origin)
    with origin in {'asserted' (0) < 'rdfs2' (1) < 'rdfs3' (2)} by
    min-rank — a type both asserted and inferable stays 'asserted'.

    The axiom tables are schema-sized (two gated collects, shipped
    once via ray.put); the fact stream mirrors per batch with two
    vectorized pandas merges and dedups through one min-rank combiner
    exchange. Range axioms on literal-valued predicates would type
    the literal strings — declare ranges only on object properties
    (garbage in, garbage out, as in any RDFS reasoner)."""
    import pyarrow.compute as pc

    import ray

    num_partitions = _resolve_partitions(num_partitions)

    def axioms(pred_uri: str, what: str) -> pa.Table:
        ax = _distinct_triples(triples, keep={pred_uri}, drop=None,
                               cols=("pred", "_a", "cls"),
                               num_partitions=num_partitions) \
            .drop_columns(["_a"])
        rows = _axiom_collect(ax, axiom_max,
                              f"domain_range_entailment[{what}]")
        return pa.table({
            "pred": pa.array([r["pred"] for r in rows], pa.string()),
            "_cls": pa.array([r["cls"] for r in rows], pa.string())})

    dom_ref = ray.put(axioms(domain_pred, "domain"))
    rng_ref = ray.put(axioms(range_pred, "range"))

    schema = pa.schema([("entity", pa.string()), ("cls", pa.string()),
                        ("_rk", pa.int64())])

    def asserted(t: pa.Table) -> pa.Table:
        p = pc.cast(t.column("pred"), pa.string())
        ft = t.filter(pc.equal(p, type_pred))
        return pa.table({
            "entity": pc.cast(ft.column("subj"), pa.string()),
            "cls": pc.cast(ft.column("obj"), pa.string()),
            "_rk": pa.array([0] * ft.num_rows, pa.int64())})

    def inferred(t: pa.Table) -> pa.Table:
        p = pc.cast(t.column("pred"), pa.string())
        keep = pc.invert(pc.is_in(
            p, value_set=pa.array([type_pred, domain_pred, range_pred])))
        ft = t.filter(keep)
        df = pd.DataFrame({
            "subj": ft.column("subj").to_pandas(),
            "pred": ft.column("pred").to_pandas(),
            "obj": ft.column("obj").to_pandas()})
        dom = df.merge(ray.get(dom_ref).to_pandas(), on="pred",
                       how="inner")
        rng = df.merge(ray.get(rng_ref).to_pandas(), on="pred",
                       how="inner")
        out = pd.concat([
            pd.DataFrame({"entity": dom["subj"], "cls": dom["_cls"],
                          "_rk": 1}),
            pd.DataFrame({"entity": rng["obj"], "cls": rng["_cls"],
                          "_rk": 2})], ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False) \
            .cast(schema)

    union = triples.map_batches(asserted, batch_format="pyarrow") \
        .union(triples.map_batches(inferred, batch_format="pyarrow"))
    ranked = hash_min(union, ["entity", "cls"], {"_rk": "_rk"},
                      num_partitions=num_partitions, out_schema=schema)
    items = [(0, "asserted"), (1, "rdfs2"), (2, "rdfs3")]
    lut = pa.array([n for _, n in items], pa.string())

    def label(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("_rk"),
                          value_set=pa.array([r for r, _ in items],
                                             pa.int64()))
        return pa.table({"entity": t.column("entity"),
                         "cls": t.column("cls"),
                         "origin": pc.take(lut, idx)})

    return ranked.map_batches(label, batch_format="pyarrow")


def apply_path_rules(triples: rd.Dataset,
                     min_confidence: float = 0.25,
                     min_support: int = 2,
                     exclude_preds: "tuple[str, ...] | None" = None,
                     max_rules: int = 100_000,
                     num_partitions: "int | None" = None) -> rd.Dataset:
    """Apply the AMIE-style rules
    :func:`tabbyray.ops.kgconstruct.mine_path_rules` mines back onto
    the graph: for every surviving rule p1(x,z) AND p2(z,y) => p3(x,y)
    with confidence >= ``min_confidence`` and support >=
    ``min_support``, derive the facts (x, p3, y) NOT already asserted
    — the mine-then-apply loop that grows a web-extracted KG beyond
    its source pages. Output: (subj, pred, obj, confidence, n_rules)
    with confidence = the best deriving rule's confidence and n_rules
    = how many distinct rules derive the fact.

    The surviving RULE table is catalog-sized (one gated collect,
    shipped via ray.put); the derivation stays distributed: both edge
    sides pre-filtered to the rule-body predicates, ONE mid-node
    co-partitioned self-join, per-batch vectorized rule merge, one
    (fact, rule) dedup exchange, one fact rollup, one anti-join
    against the asserted edge set. Confidence is quantized to 9 dp by
    the miner on both engines."""
    import pyarrow.compute as pc

    import ray

    from .kgconstruct import mine_path_rules

    num_partitions = _resolve_partitions(num_partitions)
    if exclude_preds is None:
        from .kgconstruct import OWL_SAMEAS
        exclude_preds = (RDF_TYPE, OWL_SAMEAS)

    mined = mine_path_rules(triples, exclude_preds=exclude_preds,
                            min_support=min_support,
                            num_partitions=num_partitions)
    mined = mined.map_batches(
        lambda t: t.filter(pc.greater_equal(
            t.column("confidence"),
            pa.scalar(min_confidence, pa.float64()))),
        batch_format="pyarrow")
    rules = _axiom_collect(mined, max_rules, "apply_path_rules[rules]")
    rules_tbl = pa.table({
        "p1": pa.array([r["p1"] for r in rules], pa.string()),
        "p2": pa.array([r["p2"] for r in rules], pa.string()),
        "p3": pa.array([r["p3"] for r in rules], pa.string()),
        # int64 nano-quantized confidence: exact as a group key in the
        # (fact, rule) dedup exchange (floats group fine in pandas but
        # an int key is bit-stable across engines)
        "_conf_i": pa.array([int(round(r["confidence"] * 1e9))
                             for r in rules], pa.int64())})
    ref = ray.put(rules_tbl)
    p1_set = sorted({r["p1"] for r in rules})
    p2_set = sorted({r["p2"] for r in rules})

    e = _distinct_triples(triples, keep=None, drop=set(exclude_preds),
                          num_partitions=num_partitions).materialize()

    def side(pred_set, s_name, o_name):
        vs = pa.array(pred_set, pa.string())

        def f(t: pa.Table) -> pa.Table:
            ft = t.filter(pc.is_in(t.column("pred"), value_set=vs))
            return pa.table({s_name: ft.column("subj"),
                             "pred": ft.column("pred"),
                             o_name: ft.column("obj")})
        return f

    left = e.map_batches(side(p1_set, "x", "mid"),
                         batch_format="pyarrow").map_batches(
        lambda t: pa.table({"x": t.column("x"),
                            "p1": t.column("pred"),
                            "mid": t.column("mid")}),
        batch_format="pyarrow")
    right = e.map_batches(side(p2_set, "mid", "y"),
                          batch_format="pyarrow").map_batches(
        lambda t: pa.table({"mid": t.column("mid"),
                            "p2": t.column("pred"),
                            "y": t.column("y")}),
        batch_format="pyarrow")
    j = hash_join(
        left, right, on="mid", num_partitions=num_partitions,
        left_schema=pa.schema([("x", pa.string()), ("p1", pa.string()),
                               ("mid", pa.string())]),
        right_schema=pa.schema([("mid", pa.string()),
                                ("p2", pa.string()),
                                ("y", pa.string())]))

    def derive(t: pa.Table) -> pa.Table:
        df = t.select(["x", "p1", "p2", "y"]).to_pandas()
        df = df[df["x"] != df["y"]]
        m = df.merge(ray.get(ref).to_pandas(), on=["p1", "p2"],
                     how="inner")
        out = pd.DataFrame({"subj": m["x"], "pred": m["p3"],
                            "obj": m["y"], "p1": m["p1"],
                            "p2": m["p2"], "_conf_i": m["_conf_i"],
                            "one": 1})
        return pa.Table.from_pandas(out, preserve_index=False).cast(
            pa.schema([("subj", pa.string()), ("pred", pa.string()),
                       ("obj", pa.string()), ("p1", pa.string()),
                       ("p2", pa.string()), ("_conf_i", pa.int64()),
                       ("one", pa.int64())]))

    per_rule = hash_aggregate(
        j.map_batches(derive, batch_format="pyarrow"),
        keys=["subj", "pred", "obj", "p1", "p2", "_conf_i"],
        sum_cols={"one": "_n"}, num_partitions=num_partitions,
        out_schema=pa.schema([("subj", pa.string()),
                              ("pred", pa.string()),
                              ("obj", pa.string()),
                              ("p1", pa.string()),
                              ("p2", pa.string()),
                              ("_conf_i", pa.int64()),
                              ("_n", pa.int64())]))

    def part(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(
            df[["subj", "pred", "obj"]].agg("\x1f".join, axis=1),
            index=False)
        return df.assign(_part=(h % num_partitions).astype("int64"))

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["subj", "pred", "obj"], as_index=False).agg(
            _conf_i=("_conf_i", "max"), n_rules=("_conf_i", "size"))
        out["confidence"] = out.pop("_conf_i") / 1e9
        out["n_rules"] = out["n_rules"].astype("int64")
        return out[["subj", "pred", "obj", "confidence", "n_rules"]]

    fact_schema = pa.schema(list(_TRIPLE_SCHEMA)
                            + [("confidence", pa.float64()),
                               ("n_rules", pa.int64())])
    derived = typed_groupby_map(
        per_rule.map_batches(part, batch_format="pandas"),
        "_part", rollup, fact_schema)
    return hash_join(
        derived, e, on=["subj", "pred", "obj"], how="anti",
        num_partitions=num_partitions,
        left_schema=fact_schema,
        right_schema=pa.schema(list(_TRIPLE_SCHEMA)))


def fp_object_pairs(triples: rd.Dataset,
                    functional_preds: "list[str]",
                    max_group: int = 10_000,
                    num_partitions: "int | None" = None) -> rd.Dataset:
    """Object-identity inference from owl:FunctionalProperty semantics
    (the dual of :func:`ifp_pairs`): a functional predicate maps each
    subject to ONE individual, so two distinct objects asserted for
    the same (subject, functional pred) are entailed to denote the
    same entity — OWL's functionality entailment, which a curation
    pass surfaces either as merge candidates or (closed-world) as the
    conflicts :func:`tabbyray.ops.kgconstruct.functional_violations`
    reports. Output: (a, b, n_shared) with a < b and n_shared = the
    number of distinct (pred, subject) witnesses.

    Same plan as ifp_pairs with the grouping flipped to (pred, subj):
    one distinct exchange, one (pred, subj)-hash exchange with
    per-partition pair generation (skew-capped), one combiner count."""
    num_partitions = _resolve_partitions(num_partitions)

    vals = _distinct_triples(triples, keep=set(functional_preds),
                             drop=None, num_partitions=num_partitions)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(
            df["pred"] + "\x1f" + df["subj"], index=False)
        return df.assign(_part=(h % num_partitions).astype("int64"))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for (_, _), grp in g.groupby(["pred", "subj"], sort=False):
            members = sorted(grp["obj"].unique())
            k = len(members)
            if k > max_group:
                raise ValueError(
                    f"fp_object_pairs: one (pred, subj) slot asserts "
                    f"{k} objects (> max_group={max_group}); resolve "
                    "conflicts upstream before identity inference")
            for i in range(k):
                for j in range(i + 1, k):
                    out_a.append(members[i])
                    out_b.append(members[j])
        return pd.DataFrame({"a": out_a, "b": out_b,
                             "one": [1] * len(out_a)})

    pair_schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                             ("one", pa.int64())])
    p = typed_groupby_map(
        vals.map_batches(part, batch_format="pandas"), "_part",
        pairs, pair_schema)
    return hash_aggregate(
        p, keys=["a", "b"], sum_cols={"one": "n_shared"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("a", pa.string()), ("b", pa.string()),
                              ("n_shared", pa.int64())]))


def retired_facts(triples: rd.Dataset, pages: rd.Dataset,
                  max_gap_us: int,
                  url_col: str = "url", ts_col: str = "warc_ts",
                  num_partitions: "int | None" = None) -> rd.Dataset:
    """Stale-fact detection for incremental KG maintenance: a fact is
    RETIRED when its subject was re-captured at least ``max_gap_us``
    after the fact's own last capture — the page moved on, the fact
    did not come back. Output: (subj, pred, obj, last_seen_us,
    subj_last_capture_us), one row per retired fact.

    One url stamp join, then per-fact last-capture and per-subject
    last-capture from the SAME stamped stream (one min/max combiner
    exchange each), one subj co-partitioned join, one vectorized
    filter. The subject rollup is one row per subject — skew-safe."""
    import pyarrow.compute as pc

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
        left_schema=pa.schema([("url", pa.string())]
                              + list(_TRIPLE_SCHEMA)),
        right_schema=pa.schema([("url", pa.string()),
                                ("ts_us", pa.int64())])).materialize()

    neg = stamped.map_batches(
        lambda t: pa.table({
            "subj": t.column("subj"), "pred": t.column("pred"),
            "obj": t.column("obj"),
            "_neg": pc.negate(t.column("ts_us"))}),
        batch_format="pyarrow")
    fact_last = hash_min(
        neg, ["subj", "pred", "obj"], {"_neg": "_neg"},
        num_partitions=num_partitions,
        out_schema=pa.schema(list(_TRIPLE_SCHEMA)
                             + [("_neg", pa.int64())])).map_batches(
        lambda t: pa.table({
            "subj": t.column("subj"), "pred": t.column("pred"),
            "obj": t.column("obj"),
            "last_seen_us": pc.negate(t.column("_neg"))}),
        batch_format="pyarrow")

    sneg = stamped.map_batches(
        lambda t: pa.table({"subj": t.column("subj"),
                            "_neg": pc.negate(t.column("ts_us"))}),
        batch_format="pyarrow")
    subj_last = hash_min(
        sneg, ["subj"], {"_neg": "_neg"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("subj", pa.string()),
                              ("_neg", pa.int64())])).map_batches(
        lambda t: pa.table({
            "subj": t.column("subj"),
            "subj_last_capture_us": pc.negate(t.column("_neg"))}),
        batch_format="pyarrow")

    j = hash_join(
        fact_last, subj_last, on="subj",
        num_partitions=num_partitions,
        left_schema=pa.schema(list(_TRIPLE_SCHEMA)
                              + [("last_seen_us", pa.int64())]),
        right_schema=pa.schema([("subj", pa.string()),
                                ("subj_last_capture_us", pa.int64())]))
    return j.map_batches(
        lambda t: t.filter(pc.greater(
            pc.subtract(t.column("subj_last_capture_us"),
                        t.column("last_seen_us")),
            pa.scalar(max_gap_us, pa.int64()))),
        batch_format="pyarrow")

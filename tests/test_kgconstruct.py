"""KG-construction ops (tabbyray/ops/kgconstruct.py): hand-computed
literal typing, domain/range induction, sameAs closure, constraint
violations, and negative-sampling invariants on tiny traceable
streams."""

import pandas as pd
import pytest
import ray.data as rd

from tabbyray.ops.kgconstruct import (OWL_SAMEAS, domain_range_profile,
                                      functional_violations,
                                      sameas_closure, transe_negatives,
                                      typed_literals)
from tabbyray.ops.kgprofile import RDF_TYPE


def _tri(rows, nparts=3):
    df = pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    return rd.from_pandas(df).repartition(nparts)


def test_typed_literals_majority_and_cast(ray_session):
    rows = [
        ("s1", "pop", "12"), ("s2", "pop", "34"), ("s3", "pop", "7,0"),
        ("s1", "h", "1.5"), ("s2", "h", "2"),      # tie: decimal wins
        ("s1", "w", "https://a.org/x"), ("s2", "w", "-"),  # tie: string
    ]
    got = (typed_literals(_tri(rows), num_partitions=4)
           .to_pandas().set_index(["pred", "obj"]).sort_index())
    assert got.loc[("pop", "12"), "pred_datatype"] == "integer"
    assert got.loc[("pop", "12"), "conforms"]
    assert got.loc[("pop", "12"), "value_num"] == 12.0
    assert not got.loc[("pop", "7,0"), "conforms"]
    assert pd.isna(got.loc[("pop", "7,0"), "value_num"])
    # 1-1 tie on pred h -> datatype name asc -> decimal
    assert got.loc[("h", "1.5"), "pred_datatype"] == "decimal"
    assert got.loc[("h", "1.5"), "value_num"] == 1.5
    assert not got.loc[("h", "2"), "conforms"]
    assert pd.isna(got.loc[("h", "2"), "value_num"])
    # 1-1 tie on pred w -> 'string' < 'uri'
    assert got.loc[("w", "-"), "pred_datatype"] == "string"
    assert not got.loc[("w", "https://a.org/x"), "conforms"]


def test_domain_range_profile(ray_session):
    rows = [
        ("a", RDF_TYPE, "Person"), ("a", RDF_TYPE, "Agent"),
        ("o", RDF_TYPE, "Org"),
        ("a", "worksFor", "o"), ("b", "worksFor", "o"),
        ("a", "worksFor", "o"),                    # duplicate edge
        ("a", "knows", "b"),
    ]
    got = (domain_range_profile(_tri(rows), num_partitions=4)
           .to_pandas().set_index(["pred", "side", "cls"]).sort_index())
    wf_dom = got.loc[("worksFor", "domain")]
    assert wf_dom.loc["Person", "n"] == 1
    assert wf_dom.loc["Agent", "n"] == 1
    assert wf_dom.loc["(untyped)", "n"] == 1
    assert abs(wf_dom.loc["Person", "share"] - 1 / 3) < 1e-9
    assert got.loc[("worksFor", "range", "Org"), "n"] == 2
    assert got.loc[("worksFor", "range", "Org"), "share"] == 1.0
    assert got.loc[("knows", "domain", "Person"), "share"] == 0.5
    assert got.loc[("knows", "range", "(untyped)"), "share"] == 1.0
    # rdf:type triples are not edges
    assert RDF_TYPE not in got.index.get_level_values("pred")


def test_sameas_closure_chain_rewrite(ray_session):
    rows = [
        ("a1", OWL_SAMEAS, "a"), ("a2", OWL_SAMEAS, "a1"),  # chain
        ("b", OWL_SAMEAS, "c"),
        ("c", OWL_SAMEAS, "c"),                   # self-loop ignored
        ("a1", "knows", "b"), ("a", "knows", "b"),  # merge post-closure
        ("x", "likes", "a2"),
        ("c", "knows", "x"),
    ]
    got = sameas_closure(_tri(rows), num_partitions=4).to_pandas()
    facts = set(map(tuple, got[["subj", "pred", "obj"]].to_numpy()))
    assert facts == {("a", "knows", "b"),
                     ("x", "likes", "a"),
                     ("b", "knows", "x")}


def test_functional_violations(ray_session):
    rows = [
        ("s1", "f", "x"), ("s1", "f", "y"), ("s1", "f", "x"),  # dup obj
        ("s2", "f", "x"),
        ("s1", "g", "x"), ("s1", "g", "y"),   # g not declared
    ]
    got = functional_violations(_tri(rows), ["f"],
                                num_partitions=4).to_pandas()
    assert len(got) == 1
    assert got.iloc[0]["subj"] == "s1"
    assert got.iloc[0]["pred"] == "f"
    assert got.iloc[0]["n_objs"] == 2


def test_transe_negatives_invariants(ray_session):
    rows = [(f"e{i}", "linksTo", f"e{(i * 3 + 1) % 7}") for i in range(7)]
    rows += [("e0", RDF_TYPE, "Thing")]            # excluded pred
    rows += rows[:2]                               # duplicates
    got = transe_negatives(_tri(rows), n_buckets=16,
                           num_partitions=4).to_pandas()
    edges = {(s, p, o) for s, p, o in rows if p == "linksTo"}
    ents = {e for s, _, o in edges for e in (s, o)}
    assert len(got) == len(edges)                  # one neg per edge
    assert set(got["neg_ent"]).issubset(ents)
    for _, r in got.iterrows():
        expect = (r["neg_ent"] == r["obj"]
                  or (r["subj"], r["pred"], r["neg_ent"]) in edges)
        assert bool(r["collides"]) == expect
    # deterministic on rerun
    again = transe_negatives(_tri(rows), n_buckets=16,
                             num_partitions=4).to_pandas()
    key = ["subj", "pred", "obj"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        again.sort_values(key).reset_index(drop=True))


def test_transe_negatives_corrupt_subj(ray_session):
    rows = [(f"e{i}", "linksTo", f"e{(i + 2) % 5}") for i in range(5)]
    got = transe_negatives(_tri(rows), corrupt="subj", n_buckets=16,
                           num_partitions=4).to_pandas()
    edges = set(map(tuple, rows))
    assert len(got) == len(edges)
    for _, r in got.iterrows():
        expect = (r["neg_ent"] == r["subj"]
                  or (r["neg_ent"], r["pred"], r["obj"]) in edges)
        assert bool(r["collides"]) == expect
    with pytest.raises(ValueError):
        transe_negatives(_tri(rows), corrupt="pred")


def test_mine_path_rules(ray_session):
    from tabbyray.ops.kgconstruct import mine_path_rules
    rows = [
        ("a", "p", "b"), ("b", "q", "c"),
        ("a", "p", "b2"), ("b2", "q", "c"),   # 2nd path, same (x,y)
        ("a", "r", "c"), ("a", "t", "c"),     # two head edges
        ("c", "s", "d"),
        ("a", "p", "b"),                      # duplicate
        ("a", RDF_TYPE, "Thing"),             # excluded
    ]
    got = (mine_path_rules(_tri(rows), num_partitions=4)
           .to_pandas().set_index(["p1", "p2", "p3"]).sort_index())
    # bodies: (p,q)->{(a,c)}, (q,s)->{(b,d),(b2,d)}, (r,s)/(t,s)->{(a,d)}
    # only (a,c) has head edges: r and t
    assert set(got.index) == {("p", "q", "r"), ("p", "q", "t")}
    for p3 in ("r", "t"):
        assert got.loc[("p", "q", p3), "support"] == 1
        assert got.loc[("p", "q", p3), "n_body"] == 1
        assert got.loc[("p", "q", p3), "confidence"] == 1.0
    assert mine_path_rules(_tri(rows), min_support=2,
                           num_partitions=4).count() == 0


def test_class_cooccurrence(ray_session):
    from tabbyray.ops.kgconstruct import class_cooccurrence
    rows = [("a", RDF_TYPE, "P"), ("a", RDF_TYPE, "Q"),
            ("b", RDF_TYPE, "P"),
            ("c", RDF_TYPE, "P"), ("c", RDF_TYPE, "Q"),
            ("c", RDF_TYPE, "R"), ("d", RDF_TYPE, "R"),
            ("a", RDF_TYPE, "P"),            # duplicate
            ("a", "knows", "b")]             # not a type triple
    got = (class_cooccurrence(_tri(rows), num_partitions=4)
           .to_pandas().set_index(["cls_a", "cls_b"]).sort_index())
    assert set(got.index) == {("P", "Q"), ("P", "R"), ("Q", "R")}
    assert got.loc[("P", "Q"), "n_both"] == 2
    assert got.loc[("P", "Q"), "n_a"] == 3        # P entities
    assert got.loc[("P", "Q"), "n_b"] == 2
    assert abs(got.loc[("P", "Q"), "jaccard"] - 2 / 3) < 1e-9
    assert abs(got.loc[("P", "R"), "jaccard"] - 0.25) < 1e-9
    assert abs(got.loc[("Q", "R"), "jaccard"] - 1 / 3) < 1e-9


def test_entity_fact_summary(ray_session):
    import math

    from tabbyray.ops.kgconstruct import entity_fact_summary
    rows = [
        ("s1", "common", "x"), ("s1", "rare", "y"), ("s1", "mid", "z"),
        ("s1", "common", "a"),
        ("s2", "common", "x"), ("s2", "mid", "z"),
        ("s3", "common", "q"),
        ("s1", "common", "x"),                # duplicate
        ("s1", OWL_SAMEAS, "s9"),             # excluded
    ]
    got = entity_fact_summary(_tri(rows), k=3,
                              num_partitions=4).to_pandas()
    s1 = got[got["subj"] == "s1"].sort_values(
        ["idf", "pred", "obj"], ascending=[False, True, True])
    # N=3 subjects; idf: rare=ln3, mid=ln1.5, common=0
    assert list(s1[["pred", "obj"]].itertuples(index=False, name=None)) \
        == [("rare", "y"), ("mid", "z"), ("common", "a")]
    assert abs(s1.iloc[0]["idf"] - round(math.log(3), 9)) < 1e-12
    s3 = got[got["subj"] == "s3"]
    assert len(s3) == 1 and s3.iloc[0]["pred"] == "common"
    assert s3.iloc[0]["idf"] == 0.0
    assert len(got) == 3 + 2 + 1


def _tri4(rows, nparts=3):
    df = pd.DataFrame(rows, columns=["subj", "pred", "obj", "url"])
    return rd.from_pandas(df).repartition(nparts)


def test_triple_provenance(ray_session):
    from tabbyray.ops.kgconstruct import triple_provenance
    rows = [
        ("a", "p", "x", "u1"), ("a", "p", "x", "u1"),   # dup assertion
        ("a", "p", "x", "u2"),
        ("a", "p", "y", "u3"),
        ("b", "q", "z", "u2"), ("b", "q", "z", "u4"),
        ("b", "q", "z", "u1"),
    ]
    got = (triple_provenance(_tri4(rows), num_partitions=4)
           .to_pandas().set_index(["subj", "pred", "obj"]).sort_index())
    assert got.loc[("a", "p", "x")].tolist() == [2, 3, "u1"]
    assert got.loc[("a", "p", "y")].tolist() == [1, 1, "u3"]
    assert got.loc[("b", "q", "z")].tolist() == [3, 3, "u1"]


def test_resolve_conflicts(ray_session):
    from tabbyray.ops.kgconstruct import resolve_conflicts
    rows = [
        ("a", "p", "x", "u1"), ("a", "p", "x", "u1"),   # dup source
        ("a", "p", "x", "u2"), ("a", "p", "y", "u3"),
        ("b", "p", "n", "u2"), ("b", "p", "m", "u1"),   # 1-1 tie -> m
        ("c", "q", "z", "u9"), ("c", "q", "z", "u9"),
    ]
    got = (resolve_conflicts(_tri4(rows), num_partitions=4)
           .to_pandas().set_index(["subj", "pred"]).sort_index())
    assert got.loc[("a", "p")].tolist() == ["x", 2, 2]
    assert got.loc[("b", "p")].tolist() == ["m", 1, 2]
    assert got.loc[("c", "q")].tolist() == ["z", 1, 1]


def test_partition_cut_profile(ray_session):
    import numpy as np

    from tabbyray.ops.kgconstruct import partition_cut_profile
    from tabbyray.ops.sampling import _hash64
    rows = [(f"n{i}", "linksTo", f"n{(i * 5 + 2) % 9}") for i in range(9)]
    rows += rows[:3]                                   # duplicates
    rows += [("n0", RDF_TYPE, "Thing")]                # excluded
    got = (partition_cut_profile(_tri(rows), n_parts_list=(4,),
                                 num_partitions=4)
           .to_pandas().set_index("n_parts"))
    edges = {(s, o) for s, p, o in rows if p == "linksTo"}
    bs = np.array([_hash64(s) % 4 for s, _ in edges])
    bo = np.array([_hash64(o) % 4 for _, o in edges])
    assert got.loc[4, "n_edges"] == len(edges)
    assert got.loc[4, "n_cut"] == int((bs != bo).sum())
    loads = np.bincount(bs, minlength=4)
    assert got.loc[4, "max_bucket_edges"] == loads.max()
    assert abs(got.loc[4, "cut_share"]
               - round(float((bs != bo).mean()), 9)) < 1e-12
    assert abs(got.loc[4, "balance"]
               - round(float(loads.max() * 4 / len(edges)), 9)) < 1e-12


def test_namespace_profile(ray_session):
    from tabbyray.ops.kgconstruct import namespace_profile
    rows = [
        ("http://a.org/r/x", "http://a.org/p/q", "http://b.org/r#frag"),
        ("http://a.org/r/y", "http://a.org/p/q", "plain literal"),
        ("http://a.org/r/y", "http://a.org/p/q", ""),
    ]
    got = (namespace_profile(_tri(rows), num_partitions=4)
           .to_pandas().set_index(["namespace", "role"]).sort_index())
    assert got.loc[("http://a.org/r/", "subj"), "n"] == 3
    assert got.loc[("http://a.org/p/", "pred"), "n"] == 3
    assert got.loc[("http://b.org/r#", "obj"), "n"] == 1
    assert got.loc[("(literal)", "obj"), "n"] == 2


def test_canonicalize_numeric_literals(ray_session):
    from tabbyray.ops.kgconstruct import canonicalize_numeric_literals
    rows = [("s", "p", "1,200"), ("s", "p", "12,345,678"),
            ("s", "p", "1200"), ("s", "p", "1,20"),     # bad grouping
            ("s", "p", "a,bcd"), ("s", "p", "")]
    got = (canonicalize_numeric_literals(_tri(rows))
           .to_pandas().set_index("obj"))
    assert got.loc["1,200", "obj_canon"] == "1200"
    assert bool(got.loc["1,200", "changed"])
    assert got.loc["12,345,678", "obj_canon"] == "12345678"
    assert got.loc["1,20", "obj_canon"] == "1,20"
    assert not bool(got.loc["1,20", "changed"])
    assert got.loc["a,bcd", "obj_canon"] == "a,bcd"
    assert got.loc["", "obj_canon"] == ""


def test_resolve_latest(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from tabbyray.ops.kgconstruct import resolve_latest
    tri = _tri4([
        ("a", "p", "x", "u1"), ("a", "p", "y", "u2"),
        ("b", "q", "z", "u3"), ("b", "q", "w", "u3"),  # same-ts tie
        ("a", "p", "x", "u1"),                         # duplicate
    ])
    pages = rd.from_arrow(pa.table({
        "url": pa.array(["u1", "u2", "u3"], pa.string()),
        "warc_ts": pa.array([100, 200, 150],
                            pa.timestamp("us"))})).repartition(2)
    got = (resolve_latest(tri, pages, num_partitions=4)
           .to_pandas().set_index(["subj", "pred"]).sort_index())
    assert got.loc[("a", "p")].tolist() == ["y", 200, 2]
    assert got.loc[("b", "q")].tolist() == ["w", 150, 2]  # obj asc tie


def test_infer_types(ray_session):
    from tabbyray.ops.kgconstruct import infer_types
    rows = [
        ("a", RDF_TYPE, "Person"), ("b", RDF_TYPE, "Person"),
        ("c", RDF_TYPE, "Org"),
        ("a", "wf", "o1"), ("b", "wf", "o2"), ("d", "wf", "o3"),
        ("a", "loc", "c"), ("b", "loc", "e"),
    ]
    got = (infer_types(_tri(rows), min_share=0.5, num_partitions=4)
           .to_pandas().set_index(["ent", "cls"]).sort_index())
    # d untyped, 2/3 of wf subjects are Person -> propose Person
    assert set(got.index) == {("d", "Person"), ("e", "Org")}
    r = got.loc[("d", "Person")]
    assert r["pred"] == "wf" and r["side"] == "domain"
    assert abs(r["share"] - round(2 / 3, 9)) < 1e-12
    r = got.loc[("e", "Org")]
    assert r["pred"] == "loc" and r["side"] == "range"
    assert abs(r["share"] - 0.5) < 1e-12
    # conservative: min_share above the evidence -> nothing proposed
    assert infer_types(_tri(rows), min_share=0.9,
                       num_partitions=4).count() == 0


def test_entity_fact_jaccard(ray_session):
    from tabbyray.ops.kgconstruct import entity_fact_jaccard
    rows = [
        ("s1", "p", "x"), ("s1", "q", "y"), ("s1", "r", "z"),
        ("s2", "p", "x"), ("s2", "q", "y"),
        ("s3", "q", "y"),
        ("s1", "p", "x"),                         # duplicate
        ("s1", RDF_TYPE, "T"),                    # excluded
    ]
    got = (entity_fact_jaccard(_tri(rows), min_common=2,
                               num_partitions=4).to_pandas()
           .set_index(["ent_a", "ent_b"]))
    assert set(got.index) == {("s1", "s2")}
    assert got.loc[("s1", "s2"), "n_common"] == 2
    assert abs(got.loc[("s1", "s2"), "jaccard"] - 2 / 3) < 1e-9
    # supernode cut: (q, y) has df 3 > 2 -> only (p, x) pairs remain;
    # degrees stay measured on the FULL feature sets
    capped = (entity_fact_jaccard(_tri(rows), max_feature_df=2,
                                  num_partitions=4).to_pandas()
              .set_index(["ent_a", "ent_b"]))
    assert set(capped.index) == {("s1", "s2")}
    assert capped.loc[("s1", "s2"), "n_common"] == 1
    assert abs(capped.loc[("s1", "s2"), "jaccard"] - 0.25) < 1e-9


def test_fact_lifespan(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from tabbyray.ops.kgconstruct import fact_lifespan
    tri = _tri4([
        ("a", "p", "x", "u1"), ("a", "p", "x", "u3"),
        ("a", "p", "x", "u1"),                    # re-asserted same page
        ("b", "q", "z", "u2"),
    ])
    pages = rd.from_arrow(pa.table({
        "url": pa.array(["u1", "u2", "u3"], pa.string()),
        "warc_ts": pa.array([100, 200, 150],
                            pa.timestamp("us"))})).repartition(2)
    got = (fact_lifespan(tri, pages, num_partitions=4)
           .to_pandas().set_index(["subj", "pred", "obj"]).sort_index())
    assert got.loc[("a", "p", "x")].tolist() == [100, 150, 3]
    assert got.loc[("b", "q", "z")].tolist() == [200, 200, 1]


def test_resolve_conflicts_weighted(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from tabbyray.ops.kgconstruct import resolve_conflicts_weighted
    tri = _tri4([
        ("a", "p", "x", "u2"), ("a", "p", "x", "u3"),
        ("a", "p", "y", "u1"),          # one trusted source outvotes 2
        ("b", "q", "z", "u2"), ("b", "q", "z", "u2"),   # dup source
    ])
    w = rd.from_arrow(pa.table({
        "url": pa.array(["u1", "u2"], pa.string()),
        "weight": pa.array([3.0, 0.5], pa.float64())})).repartition(2)
    got = (resolve_conflicts_weighted(tri, w, num_partitions=4)
           .to_pandas().set_index(["subj", "pred"]).sort_index())
    # y: 3.0 beats x: 0.5 + default 1.0 = 1.5
    assert got.loc[("a", "p"), "obj"] == "y"
    assert abs(got.loc[("a", "p"), "weight"] - 3.0) < 1e-12
    assert got.loc[("a", "p"), "n_objs"] == 2
    assert got.loc[("b", "q")].tolist() == ["z", 0.5, 1]


def test_predicate_conflict_rate(ray_session):
    from tabbyray.ops.kgconstruct import predicate_conflict_rate
    rows = [
        ("a", "p", "x", "u1"), ("a", "p", "y", "u2"),   # conflicted
        ("b", "p", "z", "u1"),
        ("a", "q", "m", "u1"), ("a", "q", "m", "u3"),   # same obj: not
    ]
    got = (predicate_conflict_rate(_tri4(rows), num_partitions=4)
           .to_pandas().set_index("pred").sort_index())
    assert got.loc["p"].tolist() == [2, 1, 0.5]
    assert got.loc["q"].tolist() == [1, 0, 0.0]

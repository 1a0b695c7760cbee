"""OWL/RDFS entailment + shape-validation ops
(tabbyray/ops/kginfer.py): hand-computed closures on tiny traceable
streams."""

import pandas as pd
import pytest
import ray.data as rd

from tabbyray.ops.kginfer import (OWL_IFP, OWL_INVERSE, OWL_SYMMETRIC,
                                  OWL_TRANSITIVE, RDFS_SUBPROP,
                                  characteristic_sets, fact_intervals,
                                  ifp_pairs, ifp_resolve,
                                  inverse_symmetric_entailment,
                                  shacl_validate, subproperty_entailment,
                                  transitive_entailment)
from tabbyray.ops.kgprofile import RDF_TYPE


def _tri(rows, nparts=3):
    df = pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    return rd.from_pandas(df).repartition(nparts)


def test_subproperty_entailment_chain_and_min_rank(ray_session):
    rows = [
        ("p1", RDFS_SUBPROP, "p2"), ("p2", RDFS_SUBPROP, "p3"),
        ("a", "p1", "b"),
        ("a", "p2", "b"),            # entailed AND asserted -> asserted
        ("c", "p2", "d"),
        ("x", "q", "y"),             # pred outside the hierarchy
        ("a", "p1", "b"),            # duplicate
    ]
    got = (subproperty_entailment(_tri(rows), num_partitions=4)
           .to_pandas().set_index(["subj", "pred", "obj"]).sort_index())
    # a-p1-b asserted; entails p2 (asserted too) and p3 (rdfs7, via
    # the 2-hop chain)
    assert got.loc[("a", "p1", "b"), "origin"] == "asserted"
    assert got.loc[("a", "p2", "b"), "origin"] == "asserted"
    assert got.loc[("a", "p3", "b"), "origin"] == "rdfs7"
    assert got.loc[("c", "p3", "d"), "origin"] == "rdfs7"
    assert got.loc[("x", "q", "y"), "origin"] == "asserted"
    # axiom rows themselves are not facts
    assert ("p1", RDFS_SUBPROP, "p2") not in got.index
    # facts: a-p1-b, a-p2-b, c-p2-d, x-q-y (4) + entailed a-p3-b,
    # c-p3-d (2)
    assert len(got) == 6


def test_inverse_symmetric_entailment(ray_session):
    rows = [
        ("emp", OWL_INVERSE, "wrk"),
        ("frnd", RDF_TYPE, OWL_SYMMETRIC),
        ("o1", "emp", "a"),
        ("a", "wrk", "o1"),          # pre-materialized mirror
        ("o2", "emp", "b"),          # mirror must be entailed
        ("c", "wrk", "o3"),          # reverse direction entails emp
        ("a", "frnd", "b"),
        ("b", "frnd", "a"),          # pre-mirrored
        ("c", "frnd", "d"),          # mirror entailed
    ]
    got = (inverse_symmetric_entailment(_tri(rows), num_partitions=4)
           .to_pandas().set_index(["subj", "pred", "obj"]).sort_index())
    assert got.loc[("a", "wrk", "o1"), "origin"] == "asserted"
    assert got.loc[("b", "wrk", "o2"), "origin"] == "owl_inv"
    assert got.loc[("o3", "emp", "c"), "origin"] == "owl_inv"
    assert got.loc[("b", "frnd", "a"), "origin"] == "asserted"
    assert got.loc[("d", "frnd", "c"), "origin"] == "owl_sym"
    # declaration row passes through as a fact; axiom row dropped
    assert got.loc[("frnd", RDF_TYPE, OWL_SYMMETRIC),
                   "origin"] == "asserted"
    assert ("emp", OWL_INVERSE, "wrk") not in got.index


def test_transitive_entailment_min_depth(ray_session):
    rows = [
        ("anc", RDF_TYPE, OWL_TRANSITIVE),
        ("a", "anc", "b"), ("b", "anc", "c"), ("c", "anc", "d"),
        ("a", "anc", "c"),           # shortcut: a->c depth 1, a->d 2
        ("x", "other", "y"),         # non-transitive pred excluded
        ("a", "anc", "b"),           # duplicate
    ]
    got = (transitive_entailment(_tri(rows), num_partitions=4)
           .to_pandas().set_index(["subj", "obj"])["depth"].sort_index())
    assert got.loc[("a", "b")] == 1
    assert got.loc[("a", "c")] == 1          # shortcut beats 2-hop
    assert got.loc[("a", "d")] == 2          # via the shortcut
    assert got.loc[("b", "d")] == 2
    assert ("x", "y") not in got.index
    assert len(got) == 6                     # ab ac ad bc bd cd


def test_transitive_entailment_round_cap(ray_session):
    # chain of 5 edges, max_rounds=3 -> pairs at depth > 3 not emitted
    rows = [("anc", RDF_TYPE, OWL_TRANSITIVE)]
    rows += [(f"n{i}", "anc", f"n{i+1}") for i in range(5)]
    got = (transitive_entailment(_tri(rows), max_rounds=3,
                                 num_partitions=4)
           .to_pandas())
    assert got["depth"].max() == 3
    assert len(got) == 5 + 4 + 3             # depths 1, 2, 3


def test_characteristic_sets(ray_session):
    rows = [
        ("s1", "p", "x"), ("s1", "q", "y"),
        ("s2", "p", "x"), ("s2", "q", "z"), ("s2", "q", "w"),
        ("s3", "p", "x"),
        ("s1", "p", "x"),            # duplicate fact
    ]
    got = (characteristic_sets(_tri(rows), num_partitions=4)
           .to_pandas().set_index("cset").sort_index())
    assert got.loc["p|q", "n_subjects"] == 2
    assert got.loc["p|q", "n_preds"] == 2
    assert got.loc["p|q", "n_facts"] == 5    # s1: 2 facts, s2: 3
    assert got.loc["p", "n_subjects"] == 1
    assert got.loc["p", "n_facts"] == 1


def test_ifp_pairs_and_resolve(ray_session):
    rows = [
        ("mail", RDF_TYPE, OWL_IFP),
        ("a", "mail", "m1"), ("b", "mail", "m1"),
        ("b", "mail", "m2"), ("c", "mail", "m2"),   # chain a~b~c
        ("d", "mail", "m3"),                        # singleton: no pair
        ("e", "mail", "m4"), ("f", "mail", "m4"),
        ("e", "mail", "m5"), ("f", "mail", "m5"),   # 2 witnesses
        ("a", "other", "m1"),        # non-IFP pred never pairs
        ("z", "other", "m1"),
    ]
    pairs = (ifp_pairs(_tri(rows), num_partitions=4)
             .to_pandas().set_index(["a", "b"])["n_shared"].sort_index())
    assert pairs.loc[("a", "b")] == 1
    assert pairs.loc[("b", "c")] == 1
    assert pairs.loc[("e", "f")] == 2
    assert len(pairs) == 3
    res = (ifp_resolve(_tri(rows), num_partitions=4)
           .to_pandas().set_index("entity")["canon"].sort_index())
    assert res.loc["a"] == "a" and res.loc["b"] == "a"
    assert res.loc["c"] == "a"               # transitively merged
    assert res.loc["e"] == "e" and res.loc["f"] == "e"
    assert "d" not in res.index              # never paired


def test_ifp_pairs_group_cap(ray_session):
    rows = [("mail", RDF_TYPE, OWL_IFP)]
    rows += [(f"s{i}", "mail", "junk") for i in range(5)]
    with pytest.raises(Exception) as ei:
        ifp_pairs(_tri(rows), max_group=3,
                  num_partitions=4).to_pandas()
    assert "max_group" in str(ei.value)


def test_shacl_validate_cardinality(ray_session):
    rows = [
        ("a", RDF_TYPE, "Person"), ("b", RDF_TYPE, "Person"),
        ("c", RDF_TYPE, "Org"),
        ("a", "worksFor", "c"),
        # b has no worksFor -> min violation
        ("c", "locatedIn", "x"), ("c", "locatedIn", "y"),  # max viol
        ("c", "locatedIn", "x"),     # duplicate object not re-counted
    ]
    shapes = [("Person", "worksFor", 1, None),
              ("Org", "locatedIn", 1, 1)]
    got = (shacl_validate(_tri(rows), shapes, num_partitions=4)
           .to_pandas().set_index(["entity", "pred"]).sort_index())
    assert got.loc[("b", "worksFor"), "violation"] == "min"
    assert got.loc[("b", "worksFor"), "n_objs"] == 0
    assert got.loc[("c", "locatedIn"), "violation"] == "max"
    assert got.loc[("c", "locatedIn"), "n_objs"] == 2
    assert len(got) == 2                     # a conforms


def test_fact_intervals_islands(ray_session):
    tri = pd.DataFrame(
        [("u1", "s", "p", "o"), ("u2", "s", "p", "o"),
         ("u3", "s", "p", "o"), ("u4", "s", "p", "o2")],
        columns=["url", "subj", "pred", "obj"])
    pages = pd.DataFrame(
        [("u1", 100), ("u2", 150),          # gap 50 <= 60: one island
         ("u3", 400),                        # gap 250 > 60: new island
         ("u4", 120)],
        columns=["url", "warc_ts"])
    got = (fact_intervals(rd.from_pandas(tri).repartition(2),
                          rd.from_pandas(pages).repartition(2),
                          max_gap_us=60, num_partitions=4)
           .to_pandas().sort_values("start_us").reset_index(drop=True))
    spo = got[got.obj == "o"]
    assert len(spo) == 2
    first, second = spo.iloc[0], spo.iloc[1]
    assert (first.start_us, first.end_us, first.n_captures) == (100, 150, 2)
    assert (second.start_us, second.end_us, second.n_captures) == (400, 400, 1)
    other = got[got.obj == "o2"].iloc[0]
    assert (other.start_us, other.end_us, other.n_captures) == (120, 120, 1)


def test_domain_range_entailment(ray_session):
    from tabbyray.ops.kginfer import (RDFS_DOMAIN, RDFS_RANGE,
                                      domain_range_entailment)
    rows = [
        ("emp", RDFS_DOMAIN, "Org"), ("emp", RDFS_RANGE, "Person"),
        ("o1", "emp", "a"),
        ("o1", RDF_TYPE, "Org"),          # asserted beats rdfs2
        ("o2", "emp", "b"),               # o2 Org inferred, b Person
        ("x", "other", "y"),              # no axiom -> nothing
    ]
    got = (domain_range_entailment(_tri(rows), num_partitions=4)
           .to_pandas().set_index(["entity", "cls"])["origin"]
           .sort_index())
    assert got.loc[("o1", "Org")] == "asserted"
    assert got.loc[("a", "Person")] == "rdfs3"
    assert got.loc[("o2", "Org")] == "rdfs2"
    assert got.loc[("b", "Person")] == "rdfs3"
    assert ("x", "y") not in got.index
    assert len(got) == 4


def test_apply_path_rules_new_facts_only(ray_session):
    from tabbyray.ops.kginfer import apply_path_rules
    # rule p.q => r: 3 body paths, head asserted for 2 -> conf 2/3;
    # the third path derives ONE new fact
    rows = [
        ("a1", "p", "m1"), ("m1", "q", "b1"), ("a1", "r", "b1"),
        ("a2", "p", "m2"), ("m2", "q", "b2"), ("a2", "r", "b2"),
        ("a3", "p", "m3"), ("m3", "q", "b3"),      # head missing
    ]
    got = (apply_path_rules(_tri(rows), min_confidence=0.5,
                            min_support=2, num_partitions=4)
           .to_pandas())
    assert len(got) == 1
    row = got.iloc[0]
    assert (row.subj, row.pred, row.obj) == ("a3", "r", "b3")
    assert abs(row.confidence - round(2 / 3, 9)) < 1e-12
    assert row.n_rules == 1


def test_apply_path_rules_confidence_gate(ray_session):
    from tabbyray.ops.kginfer import apply_path_rules
    rows = [
        ("a1", "p", "m1"), ("m1", "q", "b1"), ("a1", "r", "b1"),
        ("a2", "p", "m2"), ("m2", "q", "b2"), ("a2", "r", "b2"),
        ("a3", "p", "m3"), ("m3", "q", "b3"),
    ]
    got = (apply_path_rules(_tri(rows), min_confidence=0.9,
                            min_support=2, num_partitions=4)
           .to_pandas())
    assert len(got) == 0          # conf 2/3 < 0.9 -> rule gated out


def test_fp_object_pairs(ray_session):
    from tabbyray.ops.kginfer import fp_object_pairs
    rows = [
        ("s1", "loc", "x"), ("s1", "loc", "y"), ("s1", "loc", "x"),
        ("s2", "loc", "x"), ("s2", "loc", "y"),    # second witness
        ("s3", "loc", "z"),                        # single obj: no pair
        ("s1", "other", "x"), ("s1", "other", "w"),  # not functional
    ]
    got = (fp_object_pairs(_tri(rows), ["loc"], num_partitions=4)
           .to_pandas().set_index(["a", "b"])["n_shared"].sort_index())
    assert got.loc[("x", "y")] == 2
    assert len(got) == 1


def test_retired_facts(ray_session):
    from tabbyray.ops.kginfer import retired_facts
    tri = pd.DataFrame(
        [("u1", "s", "p", "old"),                  # only at t=100
         ("u1", "s", "p", "kept"), ("u2", "s", "p", "kept"),
         ("u3", "s2", "q", "solo")],               # subject never recrawled
        columns=["url", "subj", "pred", "obj"])
    pages = pd.DataFrame([("u1", 100), ("u2", 500), ("u3", 100)],
                         columns=["url", "warc_ts"])
    got = (retired_facts(rd.from_pandas(tri).repartition(2),
                         rd.from_pandas(pages).repartition(2),
                         max_gap_us=200, num_partitions=4)
           .to_pandas())
    assert len(got) == 1
    r = got.iloc[0]
    assert (r.subj, r.obj, r.last_seen_us, r.subj_last_capture_us) == \
        ("s", "old", 100, 500)

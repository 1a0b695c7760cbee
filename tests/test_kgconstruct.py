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

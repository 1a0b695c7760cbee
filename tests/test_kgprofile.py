"""KG schema profiling (tabbyray/ops/kgprofile.py): hand-computed
cardinality classes, inverse/symmetry detection, and 2-hop path counts
on a tiny fully-traceable edge list."""

import pandas as pd
import ray.data as rd

from tabbyray.ops.kgprofile import (inverse_predicates, path2_profile,
                                    predicate_cardinality)

# Tiny KG, every fact derivable by hand.  Duplicates on purpose.
_EDGES = [
    # bornIn: functional (each subj one obj), objects shared -> N:1
    ("a", "bornIn", "x"), ("b", "bornIn", "x"), ("c", "bornIn", "y"),
    ("a", "bornIn", "x"),                      # duplicate
    # owns: subject fans out, each object owned once -> 1:N
    ("a", "owns", "p1"), ("a", "owns", "p2"), ("b", "owns", "p3"),
    # likes: both multi -> N:M
    ("a", "likes", "b"), ("a", "likes", "c"), ("b", "likes", "c"),
    ("c", "likes", "c"),                       # self-loop
    # part / whole: exact inverses (2 edges each)
    ("u", "part", "v"), ("w", "part", "v"),
    ("v", "whole", "u"), ("v", "whole", "w"),
    # sym: one mutual pair + one one-way edge
    ("a", "sym", "b"), ("b", "sym", "a"), ("a", "sym", "c"),
]


def _edges_ds():
    df = pd.DataFrame(_EDGES, columns=["subj", "pred", "obj"])
    return rd.from_pandas(df).repartition(3)


def test_predicate_cardinality_classes(ray_session):
    got = (predicate_cardinality(_edges_ds(), num_partitions=4)
           .to_pandas().set_index("pred").sort_index())
    assert got.loc["bornIn", "cardinality"] == "N:1"
    assert got.loc["bornIn", "n_pairs"] == 3          # dup collapsed
    assert got.loc["bornIn", "functional_share"] == 1.0
    assert got.loc["owns", "cardinality"] == "1:N"
    assert got.loc["owns", "inv_functional_share"] == 1.0
    assert got.loc["likes", "cardinality"] == "N:M"
    assert got.loc["part", "cardinality"] == "N:1"    # v shared
    assert got.loc["likes", "n_subjects"] == 3
    assert got.loc["likes", "n_multi_subj"] == 1      # only 'a'


def test_inverse_predicates_detects_pair_and_symmetry(ray_session):
    got = (inverse_predicates(_edges_ds(), num_partitions=4)
           .to_pandas().set_index(["p", "q"]))
    # part vs whole: both edges reversed-match -> jaccard 2/(2+2-2)=1
    assert got.loc[("part", "whole"), "n_common"] == 2
    assert got.loc[("part", "whole"), "jaccard"] == 1.0
    assert got.loc[("whole", "part"), "jaccard"] == 1.0
    # sym self-pair: mutual (a,b)+(b,a) -> n_common=2 of 3 edges
    assert got.loc[("sym", "sym"), "n_common"] == 2
    assert got.loc[("sym", "sym"), "jaccard"] == 2 / (3 + 3 - 2)
    # likes self-loop (c,c) excluded: mutual count stays 0 -> no row
    assert ("likes", "likes") not in got.index


def test_path2_profile_counts(ray_session):
    got = (path2_profile(_edges_ds(), num_partitions=4)
           .to_pandas().set_index(["p1", "p2"]))
    # likes->likes chains (distinct edges, loop kept):
    # a-b-c, a-c-c, b-c-c, c-c-c (via loop), a-b-a? no (b->a not likes)
    assert got.loc[("likes", "likes"), "n_paths"] == 4
    # owns has no outgoing continuation: p1=owns rows absent
    assert not [p for p in got.index if p[0] == "owns"]
    # part->whole: u-v-u, u-v-w, w-v-u, w-v-w
    assert got.loc[("part", "whole"), "n_paths"] == 4
    assert got.loc[("part", "whole"), "n_pairs"] == 4


# ---------------------------------------------------------------- r4 s4

def _tri_ds(rows, nparts=3):
    df = pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    return rd.from_pandas(df).repartition(nparts)


def test_datatype_profile_classes_and_shares(ray_session):
    from tabbyray.ops.kgprofile import datatype_profile
    rows = [
        ("s1", "pop", "1200"), ("s2", "pop", "3,400"),   # int, string
        ("s3", "pop", "-17"), ("s4", "pop", "88"),        # int, int
        ("s1", "h", "1.85"), ("s2", "h", "180"),          # dec, int
        ("s1", "web", "https://x.org/a"),                 # uri
        ("s2", "web", "http://y.org/b?q=1"),              # uri
        ("s3", "web", "www.z.org"),                       # string
        ("s1", "act", "true"), ("s2", "act", "TRUE"),     # bool, string
        ("s1", "f", "2001-05-09"), ("s2", "f", "1999"),   # date, int
        ("s3", "mot", ""),                                # string
    ]
    got = (datatype_profile(_tri_ds(rows), num_partitions=4)
           .to_pandas().set_index(["pred", "datatype"]).sort_index())
    assert got.loc[("pop", "integer"), "n"] == 3
    assert got.loc[("pop", "string"), "n"] == 1
    assert got.loc[("pop", "integer"), "share"] == 0.75
    assert got.loc[("h", "decimal"), "n"] == 1
    assert got.loc[("h", "integer"), "n"] == 1
    assert got.loc[("web", "uri"), "n"] == 2
    assert got.loc[("web", "string"), "n"] == 1
    assert got.loc[("act", "boolean"), "n"] == 1   # TRUE is not true
    assert got.loc[("act", "string"), "n"] == 1
    assert got.loc[("f", "date"), "n"] == 1
    assert got.loc[("f", "integer"), "n"] == 1     # bare year
    assert got.loc[("mot", "string"), "n"] == 1    # empty -> string


_RT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_SC = "http://www.w3.org/2000/01/rdf-schema#subClassOf"

# C3 -> C2 -> C1 -> C0; C3 -> C1 shortcut (min depth to C1 must be 1,
# to C0 must be 2); Cx isolated class.
_TAXO = [
    ("C3", _SC, "C2"), ("C2", _SC, "C1"), ("C1", _SC, "C0"),
    ("C3", _SC, "C1"),                    # shortcut
    ("C3", _SC, "C2"),                    # duplicate edge
    ("e1", _RT, "C3"), ("e2", _RT, "C1"),
    ("e3", _RT, "C3"), ("e3", _RT, "C0"),  # multi-typed entity
    ("e1", _RT, "C3"),                    # duplicate type
]


def test_type_closure_broadcast_min_depth(ray_session):
    from tabbyray.ops.kgprofile import type_closure
    got = (type_closure(_tri_ds(_TAXO), mode="broadcast")
           .to_pandas().set_index(["entity", "cls"])["depth"])
    # e1 asserted C3; ancestors C2(1), C1(1 via shortcut), C0(2)
    assert got.loc[("e1", "C3")] == 0
    assert got.loc[("e1", "C2")] == 1
    assert got.loc[("e1", "C1")] == 1
    assert got.loc[("e1", "C0")] == 2
    # e2 asserted C1 -> C0 at depth 1
    assert got.loc[("e2", "C1")] == 0
    assert got.loc[("e2", "C0")] == 1
    # e3: C0 asserted (0) even though reachable from C3 at depth 2
    assert got.loc[("e3", "C0")] == 0
    assert got.loc[("e3", "C3")] == 0
    assert len(got.loc["e1"]) == 4


def test_type_closure_modes_identical(ray_session):
    from tabbyray.ops.kgprofile import type_closure
    a = (type_closure(_tri_ds(_TAXO), mode="broadcast")
         .to_pandas().sort_values(["entity", "cls"])
         .reset_index(drop=True))
    b = (type_closure(_tri_ds(_TAXO), mode="join", num_partitions=4)
         .to_pandas().sort_values(["entity", "cls"])
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_bgp_match_two_patterns(ray_session):
    from tabbyray.ops.kgprofile import bgp_match
    rows = [
        ("a", "livesIn", "x"), ("b", "livesIn", "x"),
        ("c", "livesIn", "y"),
        ("x", "inCountry", "DE"), ("y", "inCountry", "FR"),
        ("a", "livesIn", "x"),              # duplicate triple
    ]
    got = (bgp_match(_tri_ds(rows),
                     [("?p", "livesIn", "?city"),
                      ("?city", "inCountry", "DE")],
                     project=["p", "city"])
           .to_pandas().sort_values("p").reset_index(drop=True))
    assert list(got["p"]) == ["a", "b"]
    assert set(got["city"]) == {"x"}


def test_bgp_match_constant_and_selfloop(ray_session):
    from tabbyray.ops.kgprofile import bgp_match
    rows = [("a", "knows", "a"), ("a", "knows", "b"),
            ("b", "knows", "b"), ("c", "knows", "a")]
    loop = bgp_match(_tri_ds(rows), [("?x", "knows", "?x")]).to_pandas()
    assert set(loop["x"]) == {"a", "b"}
    const = bgp_match(_tri_ds(rows), [("?x", "knows", "a")]).to_pandas()
    assert set(const["x"]) == {"a", "c"}
    import pytest
    with pytest.raises(ValueError):
        bgp_match(_tri_ds(rows), [("?x", "knows", "?y"),
                                  ("?u", "knows", "?v")])

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

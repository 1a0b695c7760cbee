"""Relational operator correctness vs pandas reference."""

import numpy as np
import pandas as pd


def test_hash_aggregate_matches_pandas(ray_session):
    import ray.data as rd

    from tabbyray.ops.relational import hash_aggregate
    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "k1": rng.randint(0, 500, 5000),
        "k2": rng.choice(list("abcd"), 5000),
        "v": rng.randint(0, 100, 5000).astype("int64"),
    })
    got = (hash_aggregate(rd.from_pandas(df).repartition(8), ["k1", "k2"],
                          {"v": "sum_v"}, count_alias="n")
           .to_pandas().sort_values(["k1", "k2"]).reset_index(drop=True))
    exp = (df.groupby(["k1", "k2"], as_index=False)
           .agg(sum_v=("v", "sum"), n=("v", "size"))
           .sort_values(["k1", "k2"]).reset_index(drop=True))
    exp["n"] = exp["n"].astype("int64")
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_partial_agg_sum_matches_pandas(ray_session):
    import ray.data as rd

    from tabbyray.ops.relational import partial_agg_sum
    df = pd.DataFrame({"k": list("aabbbc"), "x": [1, 2, 3, 4, 5, 6]})
    got = (partial_agg_sum(rd.from_pandas(df).repartition(3), "k",
                           {"x": "sum_x"}, count_alias="n")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert list(got["sum_x"]) == [3, 12, 6]
    assert list(got["n"]) == [2, 3, 1]


def test_normalized_key_counts(ray_session):
    import ray.data as rd

    from tabbyray.ops.relational import normalized_key_counts
    df = pd.DataFrame({"name": ["Big Apple", "big  apple!", "Pear"],
                       "id": [7, 3, 9]})
    got = (normalized_key_counts(rd.from_pandas(df), "name", "id")
           .to_pandas().sort_values("norm_key").reset_index(drop=True))
    assert list(got["norm_key"]) == ["Big_apple", "Pear"]
    assert list(got["rep_id"]) == [3, 9]
    assert list(got["n_members"]) == [2, 1]

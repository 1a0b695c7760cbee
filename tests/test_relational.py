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


def test_sessionize(ray_session):
    import pandas as pd
    import ray.data as rd

    from tabbyray.ops.streaming import sessionize
    ts = pd.to_datetime([
        "2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 01:00",  # u1: 2 sessions
        "2024-01-01 00:05",                                          # u2: 1 session
    ])
    df = pd.DataFrame({"user_id": [1, 1, 1, 2], "event_id": [1, 2, 3, 4],
                       "ts": ts, "value": [1.0, 2.0, 4.0, 8.0]})
    out = (sessionize(rd.from_pandas(df), gap_minutes=30)
           .to_pandas().sort_values(["user_id", "session_id"]).reset_index(drop=True))
    assert list(out["user_id"]) == [1, 1, 2]
    assert list(out["session_id"]) == [1, 2, 1]
    assert list(out["n_events"]) == [2, 1, 1]
    assert list(out["sum_value_cents"]) == [300.0, 400.0, 800.0]


def test_hash_join_matches_pandas(ray_session):
    import ray.data as rd

    from tabbyray.ops.relational import hash_join

    rng = np.random.RandomState(5)
    left = pd.DataFrame({"k": rng.randint(0, 40, 200),
                         "a": rng.randn(200),
                         "s": [f"x{i}" for i in range(200)]})
    right = pd.DataFrame({"k": np.arange(0, 50, 2), "b": np.arange(25) * 10})
    got = (hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k")
           .to_pandas().sort_values(["k", "s"]).reset_index(drop=True))
    want = (left.merge(right, on="k")
            .sort_values(["k", "s"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns], want)
    # left join keeps unmatched rows with null b
    gl = (hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                    how="left").to_pandas())
    assert len(gl) == len(left.merge(right, on="k", how="left"))
    assert gl["b"].isna().sum() == left.merge(right, on="k", how="left")["b"].isna().sum()


def test_asof_join_matches_merge_asof(ray_session):
    import ray.data as rd

    from tabbyray.ops.relational import asof_join

    rng = np.random.RandomState(7)
    base = pd.Timestamp("2025-01-01")
    left = pd.DataFrame({
        "k": rng.randint(0, 10, 300),
        "lts": base + pd.to_timedelta(rng.randint(0, 10_000, 300), unit="m"),
        "lv": np.arange(300),
    })
    right = pd.DataFrame({
        "k": rng.randint(0, 10, 80),
        "rts": base + pd.to_timedelta(rng.randint(0, 10_000, 80), unit="m"),
        "rv": np.arange(80) * 10,
    })
    got = (asof_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                     left_ts="lts", right_ts="rts")
           .to_pandas().sort_values(["k", "lts", "lv"]).reset_index(drop=True))
    rd_ = right.groupby(["k", "rts"], as_index=False).max()
    want = pd.merge_asof(left.sort_values("lts", kind="stable"),
                         rd_.sort_values("rts", kind="stable"),
                         left_on="lts", right_on="rts", by="k",
                         direction="backward")
    want = (want[want["rts"].notna()]
            .sort_values(["k", "lts", "lv"]).reset_index(drop=True)
            .astype({"rv": "int64"}))   # left-join NaNs widened it pre-filter
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_range_join_broadcast(ray_session):
    import ray.data as rd

    from tabbyray.ops.relational import range_join_broadcast

    bands = pd.DataFrame({"band_id": [0, 1],
                          "lo": [0.0, 5.0], "hi": [10.0, 15.0]})
    df = pd.DataFrame({"id": [1, 2, 3, 4],
                       "value": [0.0, 7.0, 10.0, 16.0]})
    out = (range_join_broadcast(rd.from_pandas(df), "value", bands,
                                band_cols=["band_id"])
           .to_pandas().sort_values(["id", "band_id"]).reset_index(drop=True))
    got = set(zip(out["id"], out["band_id"]))
    # boundaries inclusive on both ends; overlaps produce two rows
    assert got == {(1, 0), (2, 0), (2, 1), (3, 0), (3, 1)}

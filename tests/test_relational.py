"""Relational operator correctness vs pandas reference."""

import numpy as np
import pandas as pd
import pytest


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


def test_hash_join_skew_salted_matches_pandas(ray_session):
    """Hot-key guard: a 50%-hot-key fixture joined with skew_threshold
    set must equal the pandas reference (and the unsalted path) for
    every supported ``how``; full outer raises actionably."""
    import ray.data as rd

    from tabbyray.ops.relational import hash_join

    rng = np.random.RandomState(11)
    # 50% of left rows carry ONE key; right has multiple rows for it
    hot = np.full(300, 7)
    cold = rng.randint(100, 160, 300)
    left = pd.DataFrame({"k": np.concatenate([hot, cold]),
                         "a": np.arange(600),
                         "s": [f"x{i}" for i in range(600)]})
    right_keys = np.concatenate([np.full(5, 7), np.arange(100, 150)])
    right = pd.DataFrame({"k": right_keys,
                          "b": np.arange(len(right_keys)) * 10})

    for how in ("inner", "left", "semi", "anti"):
        sort_cols = ["k", "s"] if how in ("semi", "anti") else ["k", "s", "b"]
        got = (hash_join(rd.from_pandas(left).repartition(8),
                         rd.from_pandas(right), on="k", how=how,
                         skew_threshold=50, skew_salt=4)
               .to_pandas().sort_values(sort_cols).reset_index(drop=True))
        plain = (hash_join(rd.from_pandas(left), rd.from_pandas(right),
                           on="k", how=how)
                 .to_pandas().sort_values(sort_cols).reset_index(drop=True))
        pd.testing.assert_frame_equal(got[plain.columns], plain, how)
        if how in ("inner", "left"):
            want = (left.merge(right, on="k", how=how)
                    .sort_values(["k", "s"]).reset_index(drop=True))
            assert len(got) == len(want), how
            assert got["b"].isna().sum() == want["b"].isna().sum(), how

    with pytest.raises(ValueError, match="outer"):
        hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                  how="outer", skew_threshold=50)

    # composite-key variant: the hot key is a (k1, k2) pair
    left2 = pd.DataFrame({"k1": np.concatenate([hot, cold]),
                          "k2": ["z"] * 600, "a": np.arange(600)})
    right2 = pd.DataFrame({"k1": right_keys, "k2": ["z"] * len(right_keys),
                           "b": np.arange(len(right_keys))})
    got2 = (hash_join(rd.from_pandas(left2), rd.from_pandas(right2),
                      on=["k1", "k2"], skew_threshold=50, skew_salt=3)
            .to_pandas().sort_values(["k1", "a", "b"]).reset_index(drop=True))
    want2 = (left2.merge(right2, on=["k1", "k2"])
             .sort_values(["k1", "a", "b"]).reset_index(drop=True))
    assert len(got2) == len(want2)
    assert (got2["b"].to_numpy() == want2["b"].to_numpy()).all()


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


def test_top_n_matches_pandas(ray_session):
    import ray.data as rd

    from tabbyray.ops.relational import top_n

    rng = np.random.RandomState(3)
    df = pd.DataFrame({"id": range(200), "score": rng.randint(0, 50, 200)})
    got = (top_n(rd.from_pandas(df).repartition(8),
                 ["score", "id"], [False, True], 10)
           .to_pandas().reset_index(drop=True))
    want = (df.sort_values(["score", "id"], ascending=[False, True])
            .head(10).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_distinct_count_matches_pandas(ray_session):
    import ray.data as rd

    from tabbyray.ops.relational import distinct_count

    rng = np.random.RandomState(5)
    df = pd.DataFrame({"k": rng.choice(list("abc"), 500),
                       "v": rng.randint(0, 40, 500)})
    got = (distinct_count(rd.from_pandas(df).repartition(6), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = (df.groupby("k")["v"].nunique().reset_index()
            .rename(columns={"v": "n_distinct"}))
    want["n_distinct"] = want["n_distinct"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_exact_quantiles_matches_numpy_linear(ray_session):
    import ray.data as rd

    from tabbyray.ops.relational import exact_quantiles

    rng = np.random.RandomState(9)
    vals = rng.randint(0, 120, 1000)
    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(7)
    got = exact_quantiles(ds, "x", [0.0, 0.25, 0.5, 0.9, 0.99, 1.0])
    for _, row in got.iterrows():
        want = float(np.percentile(vals, row["q"] * 100,
                                   method="linear"))
        assert abs(row["value"] - want) < 1e-9, (row["q"], row["value"], want)


def test_broadcast_filter_join_semi_anti(ray_session):
    import ray.data as rd

    from tabbyray.ops.relational import broadcast_filter_join

    df = pd.DataFrame({"k": list("abcde"), "v": range(5)})
    ds = rd.from_pandas(df)
    anti = broadcast_filter_join(ds, "k", ["b", "d"], mode="anti").to_pandas()
    assert sorted(anti["k"]) == ["a", "c", "e"]
    semi = broadcast_filter_join(ds, "k", ["b", "d"], mode="semi").to_pandas()
    assert sorted(semi["k"]) == ["b", "d"]
    # empty key set: anti keeps everything, semi keeps nothing
    assert broadcast_filter_join(ds, "k", [], mode="anti").count() == 5
    assert broadcast_filter_join(ds, "k", [], mode="semi").count() == 0


def test_hash_split_deterministic_and_resharding_stable(ray_session):
    import ray.data as rd

    from tabbyray.ops.sampling import hash_sample, hash_split

    df = pd.DataFrame({"doc_id": range(1000)})
    a = (hash_split(rd.from_pandas(df), "doc_id").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (hash_split(rd.from_pandas(df).repartition(9), "doc_id").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    # assignment is a pure function of the id: block layout is irrelevant
    pd.testing.assert_frame_equal(a, b)
    frac = a["split"].value_counts(normalize=True)
    assert 0.7 < frac["train"] < 0.9 and frac["test"] < 0.2
    s1 = set(hash_sample(rd.from_pandas(df), "doc_id", 0.2)
             .to_pandas()["doc_id"])
    s2 = set(hash_sample(rd.from_pandas(df).repartition(4), "doc_id", 0.2)
             .to_pandas()["doc_id"])
    assert s1 == s2 and 0.1 < len(s1) / 1000 < 0.3


def test_term_ops_match_pandas(ray_session):
    import ray.data as rd

    from tabbyray.ops.text import term_counts_topk, term_doc_freq

    rng = np.random.RandomState(13)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, rng.randint(3, 25)))
             for _ in range(120)]
    df = pd.DataFrame({"doc_id": range(120), "text": texts})
    ds = rd.from_pandas(df).repartition(5)

    got = term_counts_topk(ds, k=10).to_pandas().reset_index(drop=True)
    from collections import Counter
    c = Counter(w for t in texts for w in t.split(" "))
    want = (pd.DataFrame(sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10],
                         columns=["term", "n"]))
    want["n"] = want["n"].astype("int64")
    pd.testing.assert_frame_equal(got, want)

    got_df = (term_doc_freq(ds, min_df=40).to_pandas()
              .sort_values("term").reset_index(drop=True))
    dfc = Counter(w for t in texts for w in set(t.split(" ")))
    want_df = (pd.DataFrame([(w, n) for w, n in sorted(dfc.items()) if n >= 40],
                            columns=["term", "df"]))
    want_df["df"] = want_df["df"].astype("int64")
    pd.testing.assert_frame_equal(got_df, want_df)


def test_connected_components_and_degrees(ray_session):
    import ray.data as rd

    from tabbyray.ops.graph import connected_components, degree_counts

    pairs = pd.DataFrame({"a": [1, 2, 5], "b": [2, 3, 6]})
    nodes = pd.DataFrame({"node": list(range(1, 9))})
    got = (connected_components(rd.from_pandas(pairs), rd.from_pandas(nodes))
           .to_pandas().sort_values("node").reset_index(drop=True))
    # chain 1-2-3 collapses transitively; 5-6 pairs; 4,7,8 singletons
    assert dict(zip(got["node"], got["component"])) == {
        1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7, 8: 8}

    deg = degree_counts(rd.from_pandas(pairs)).to_pandas()
    assert dict(zip(deg["node"], deg["degree"])) == {1: 1, 2: 2, 3: 1,
                                                     5: 1, 6: 1}


def test_connected_components_no_edges(ray_session):
    import ray.data as rd

    from tabbyray.ops.graph import connected_components

    pairs = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                          "b": pd.Series([], dtype="int64")})
    nodes = pd.DataFrame({"node": [3, 9, 11]})
    got = (connected_components(rd.from_pandas(pairs), rd.from_pandas(nodes))
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert list(got["component"]) == [3, 9, 11]


def test_connected_components_random_vs_union_find(ray_session):
    """Property check on random graphs: hash-min label propagation must
    agree with a straight-line union-find."""
    import ray.data as rd

    from tabbyray.ops.graph import connected_components

    rng = np.random.RandomState(21)
    n = 60
    edges = pd.DataFrame({"a": rng.randint(0, n, 45),
                          "b": rng.randint(0, n, 45)})
    edges = edges[edges.a != edges.b].reset_index(drop=True)
    nodes = pd.DataFrame({"node": range(n)})

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges.a, edges.b):
        parent[find(int(a))] = find(int(b))
    # component id = min member, matching the operator's fixpoint
    members: dict[int, list[int]] = {}
    for v in range(n):
        members.setdefault(find(v), []).append(v)
    want = {v: min(ms) for ms in members.values() for v in ms}

    got = (connected_components(rd.from_pandas(edges),
                                rd.from_pandas(nodes), num_partitions=4)
           .to_pandas())
    assert dict(zip(got["node"], got["component"])) == want


def test_windowed_cumsum_matches_pandas(ray_session):
    import ray.data as rd

    from tabbyray.ops.streaming import round_half_away, windowed_cumsum

    rng = np.random.RandomState(17)
    df = pd.DataFrame({
        "event_id": range(200),
        "user_id": rng.randint(0, 9, 200),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 100000, 200), unit="s"),
        "value": rng.rand(200) * 50,
    })
    got = (windowed_cumsum(rd.from_pandas(df).repartition(5))
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    w = df.sort_values(["user_id", "ts", "event_id"], kind="stable").copy()
    w["cents"] = round_half_away(w["value"] * 100).astype("int64")
    w["cum_value_cents"] = w.groupby("user_id")["cents"].cumsum()
    want = (w[["event_id", "user_id", "cum_value_cents"]]
            .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_pivot_counts_matches_crosstab(ray_session):
    import ray.data as rd

    from tabbyray.ops.relational import pivot_counts

    rng = np.random.RandomState(2)
    cats = ["a", "b", "c"]
    df = pd.DataFrame({"k": rng.randint(0, 6, 300),
                       "c": rng.choice(cats, 300)})
    got = (pivot_counts(rd.from_pandas(df).repartition(4), "k", "c", cats)
           .to_pandas().sort_values("k").reset_index(drop=True))
    ct = pd.crosstab(df["k"], df["c"]).reindex(columns=cats, fill_value=0)
    for c in cats:
        assert list(got[f"n_{c}"]) == list(ct[c].astype("int64"))


def test_grouped_quantiles_matches_numpy(ray_session):
    import ray.data as rd

    from tabbyray.ops.relational import grouped_quantiles

    rng = np.random.RandomState(4)
    df = pd.DataFrame({"g": rng.choice(["x", "y"], 400),
                       "v": rng.randint(0, 80, 400)})
    got = grouped_quantiles(rd.from_pandas(df).repartition(3), "g", "v",
                            [0.25, 0.5, 0.75])
    for _, row in got.iterrows():
        vals = df[df["g"] == row["g"]]["v"].to_numpy()
        want = float(np.percentile(vals, row["q"] * 100, method="linear"))
        assert abs(row["value"] - want) < 1e-9


def test_text_ops_null_robust(ray_session):
    """None text must flow through every text kernel as the empty doc."""
    import ray.data as rd

    from tabbyray.ops.dedup import minhash_signatures, simhash_values
    from tabbyray.ops.text import (
        chunk_documents,
        clean_normalize,
        pii_counts,
        repetition_stats,
    )

    df = pd.DataFrame({"doc_id": [0, 1],
                       "text": pd.array([None, "a real doc here ok"],
                                        dtype="object")})
    ds = rd.from_pandas(df)
    assert list(clean_normalize(ds).to_pandas()["clean_text"])[0] == ""
    assert list(pii_counts(ds).to_pandas()["n_emails"]) == [0, 0]
    assert list(repetition_stats(ds).to_pandas()["n_bigrams"])[0] == 0
    ch = chunk_documents(ds).to_pandas()
    assert len(ch) == 2 and ch[ch.doc_id == 0]["chunk_text"].iloc[0] == ""
    assert len(minhash_signatures(ds).to_pandas()) == 2
    assert len(simhash_values(ds).to_pandas()) == 2


def test_cluster_representatives(ray_session):
    import ray.data as rd
    from tabbyray.ops.graph import cluster_representatives, connected_components

    # components: {1,2,3} (rep 1), {5} (rep 5), {7,8} (rep 7)
    pairs = pd.DataFrame({"a": [1, 2, 7], "b": [2, 3, 8]})
    nodes = pd.DataFrame({"node": [1, 2, 3, 5, 7, 8]})
    meta = pd.DataFrame({"node": [1, 2, 3, 5, 7, 8],
                         "tag": ["a", "b", "c", "d", "e", "f"]})
    comp = connected_components(rd.from_pandas(pairs), rd.from_pandas(nodes),
                                num_partitions=2)
    got = (cluster_representatives(comp, rd.from_pandas(meta),
                                   num_partitions=2)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert list(got["node"]) == [1, 5, 7]
    assert list(got["n_members"]) == [3, 1, 2]
    assert list(got["tag"]) == ["a", "d", "e"]


def test_hash_join_semi_anti(ray_session):
    import ray.data as rd

    from tabbyray.ops.relational import hash_join

    rng = np.random.RandomState(11)
    left = pd.DataFrame({"k": rng.randint(0, 40, 200),
                         "a": rng.randn(200),
                         "s": [f"x{i}" for i in range(200)]})
    # right has duplicate keys + a payload column that must NOT appear
    right = pd.DataFrame({"k": np.repeat(np.arange(0, 50, 2), 3),
                          "junk": np.arange(75)})
    keys = set(right["k"])
    semi = (hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                      how="semi").to_pandas())
    anti = (hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                      how="anti").to_pandas())
    assert sorted(semi.columns) == ["a", "k", "s"]      # left columns only
    assert sorted(anti.columns) == ["a", "k", "s"]
    assert set(semi["s"]) == set(left[left["k"].isin(keys)]["s"])
    assert set(anti["s"]) == set(left[~left["k"].isin(keys)]["s"])
    assert len(semi) + len(anti) == len(left)           # exact partition


def test_stratified_sample_deterministic(ray_session):
    import ray.data as rd

    from tabbyray.ops.sampling import _bucket, stratified_sample

    df = pd.DataFrame({"doc_id": np.arange(3000),
                       "stratum": np.tile(["a", "b", "c"], 1000)})
    rates = {"a": 0.1, "b": 1.0}          # c absent -> default 0.0
    got = (stratified_sample(rd.from_pandas(df), "doc_id", "stratum", rates)
           .to_pandas())
    # exactly the rows whose id-bucket clears the per-stratum cut
    want = df[[_bucket(v, 10_000) < {"a": 1000, "b": 10_000}.get(s, 0)
               for v, s in zip(df["doc_id"], df["stratum"])]]
    assert set(got["doc_id"]) == set(want["doc_id"])
    assert set(got[got["stratum"] == "b"]["doc_id"]) == \
        set(df[df["stratum"] == "b"]["doc_id"])          # rate 1.0 keeps all
    assert (got["stratum"] == "c").sum() == 0            # default 0 drops all
    # stable under resharding
    got2 = (stratified_sample(rd.from_pandas(df).repartition(7), "doc_id",
                              "stratum", rates).to_pandas())
    assert set(got2["doc_id"]) == set(got["doc_id"])


def test_kmv_distinct_exact_below_k_and_estimate_above(ray_session):
    import ray.data as rd

    from tabbyray.ops.sketch import _SCALE, _h64, kmv_distinct

    # below k: the sketch IS the distinct set -> exact count
    small = pd.DataFrame({"g": ["x"] * 40, "v": [f"t{i % 20}" for i in range(40)]})
    out = kmv_distinct(rd.from_pandas(small), "g", "v", k=64).to_pandas()
    assert list(out["g"]) == ["x"] and out["est_distinct"].iloc[0] == 20.0

    # above k: estimator reproduces the single-pass formula exactly,
    # independent of partitioning
    big = pd.DataFrame({"g": ["y"] * 2000,
                        "v": [f"tok{i % 700}" for i in range(2000)]})
    hs = sorted({_h64(v) for v in big["v"]})
    want = 63 * _SCALE / float(hs[63])
    for nparts in (1, 5):
        ds = rd.from_pandas(big).repartition(nparts)
        got = kmv_distinct(ds, "g", "v", k=64).to_pandas()
        assert got["est_distinct"].iloc[0] == want
    # sanity: right order of magnitude (k=64 rel-std is ~1/sqrt(63)≈13%,
    # and this single fixed draw happens to sit ~2.5 sigma high)
    assert abs(want - 700) / 700 < 0.5


def test_frequent_values_exact_and_superset_guarantee(ray_session):
    import ray.data as rd

    from tabbyray.ops.sketch import frequent_values

    rng = np.random.RandomState(3)
    # zipf-ish: a few heavy values + a long tail, spread over partitions
    vals = (["hot"] * 500 + ["warm"] * 120
            + [f"tail{i}" for i in rng.randint(0, 2000, 2000)])
    rng.shuffle(vals)
    df = pd.DataFrame({"v": vals})
    theta = 0.02
    got = (frequent_values(rd.from_pandas(df).repartition(6), "v", theta)
           .to_pandas().sort_values("value").reset_index(drop=True))
    vc = df["v"].value_counts()
    want = vc[vc >= theta * len(df)].sort_index()
    assert list(got["value"]) == list(want.index)
    assert list(got["n"]) == list(want.values)       # EXACT counts


def test_per_group_sample_deterministic(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from tabbyray.ops.sampling import _hash64, per_group_sample

    df = pd.DataFrame({"g": np.repeat(np.arange(20), 30),
                       "id": np.arange(600),
                       "x": np.random.RandomState(0).randn(600)})
    schema = pa.schema([("g", pa.int64()), ("id", pa.int64()),
                        ("x", pa.float64())])
    got = (per_group_sample(rd.from_pandas(df), "g", "id", 4, schema)
           .to_pandas().sort_values(["g", "id"]).reset_index(drop=True))
    want = (df.assign(_h=[_hash64(v) for v in df["id"]])
            .sort_values(["_h", "id"]).groupby("g").head(4)
            .drop(columns="_h").sort_values(["g", "id"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    # stable under resharding
    got2 = (per_group_sample(rd.from_pandas(df).repartition(7), "g", "id",
                             4, schema)
            .to_pandas().sort_values(["g", "id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got2, want)


def test_hash_join_outer(ray_session):
    import ray.data as rd

    from tabbyray.ops.relational import hash_join

    left = pd.DataFrame({"k": [1, 2, 3], "a": [10, 20, 30]})
    right = pd.DataFrame({"k": [2, 3, 4], "b": [200, 300, 400]})
    got = (hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                     how="outer").to_pandas()
           .sort_values("k").reset_index(drop=True))
    assert list(got["k"]) == [1, 2, 3, 4]
    assert got["a"].isna().tolist() == [False, False, False, True]
    assert got["b"].isna().tolist() == [True, False, False, False]
    assert got.loc[1, "a"] == 20 and got.loc[1, "b"] == 200


def test_group_concat_and_interarrival(ray_session):
    import ray.data as rd

    from tabbyray.ops.streaming import event_interarrival, group_concat

    base = pd.Timestamp("2025-01-01")
    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2],
        "event_id": [3, 1, 2, 5, 4],
        "event_type": ["c", "a", "b", "e", "d"],
        "ts": [base + pd.Timedelta(seconds=s)
               for s in [10.5, 0.25, 0.25, 100, 7]],
    })
    seq = (group_concat(rd.from_pandas(ev), "user_id", "event_type",
                        ["ts", "event_id"]).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    # user 1: ties on ts broken by event_id (1 then 2), then event 3
    assert list(seq["seq"]) == ["a,b,c", "d,e"]

    gaps = (event_interarrival(rd.from_pandas(ev)).to_pandas()
            .sort_values(["user_id", "event_id"]).reset_index(drop=True))
    # first event per user dropped; exact integer microseconds
    assert list(gaps["event_id"]) == [2, 3, 5]
    assert list(gaps["gap_us"]) == [0, 10_250_000, 93_000_000]


def test_token_entropy_and_length_histogram(ray_session):
    import ray.data as rd

    from tabbyray.ops.text import length_histogram, token_entropy

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a a a a", "a b c d", "x"],
        "n_chars": [7, 7, 450],
    })
    ent = (token_entropy(rd.from_pandas(docs)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert ent["token_entropy"].iloc[0] == 0.0          # uniform repeat
    assert abs(ent["token_entropy"].iloc[1] - np.log(4)) < 1e-12
    assert ent["token_entropy"].iloc[2] == 0.0          # single token
    assert not np.signbit(ent["token_entropy"].iloc[2])  # +0.0, not -0.0

    hist = (length_histogram(rd.from_pandas(docs), col="n_chars", width=200)
            .to_pandas().sort_values("bin_lo").reset_index(drop=True))
    assert list(hist["bin_lo"]) == [0, 400]
    assert list(hist["n_docs"]) == [2, 1]


def test_span_dedup_keep_first_and_vanishing_doc(ray_session):
    import ray.data as rd

    from tabbyray.ops.dedup import span_dedup

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a b c d e f",          # chunks: "a b c", "d e f"
                 "d e f g h i",          # "d e f" dup -> keeps "g h i"
                 "a b c d e f"],         # all chunks dup -> vanishes
    })
    out = (span_dedup(rd.from_pandas(docs).repartition(3), width=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["doc_id"]) == [0, 1]
    assert list(out["dedup_text"]) == ["a b c d e f", "g h i"]
    assert list(out["n_kept"]) == [2, 1]


def test_temperature_sample_rates(ray_session):
    import math

    import ray.data as rd

    from tabbyray.ops.sampling import _bucket, temperature_sample

    df = pd.DataFrame({
        "doc_id": np.arange(4000),
        "lang": ["en"] * 3600 + ["fr"] * 400,   # 9:1 skew
    })
    got = (temperature_sample(rd.from_pandas(df).repartition(5), "lang",
                              "doc_id", alpha=0.5).to_pandas())
    rate_en = math.sqrt(400 / 3600.0)
    want = df[[_bucket(v, 10_000) < ({"en": rate_en, "fr": 1.0}[s]) * 10_000
               for v, s in zip(df["doc_id"], df["lang"])]]
    assert set(got["doc_id"]) == set(want["doc_id"])
    # rarest stratum keeps everything; dominant one shrinks toward 1/3
    assert (got["lang"] == "fr").sum() == 400
    n_en = (got["lang"] == "en").sum()
    assert abs(n_en - 3600 * rate_en) < 3600 * 0.05


def test_sequence_pack_prefix_sum(ray_session):
    import ray.data as rd

    from tabbyray.ops.text import sequence_pack

    rng = np.random.RandomState(2)
    docs = pd.DataFrame({
        "doc_id": np.arange(500),
        "text": [" ".join(["w"] * n)
                 for n in rng.randint(1, 40, 500)]})
    want_n = docs["text"].str.split(" ").str.len()
    want_off = want_n.cumsum() - want_n
    # small bucket_size forces many buckets + the broadcast prefix path;
    # result must be partition-independent
    for nparts in (1, 6):
        got = (sequence_pack(rd.from_pandas(docs).repartition(nparts),
                             seq_len=64, bucket_size=32)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert list(got["tok_offset"]) == list(want_off)
        assert list(got["seq_id"]) == list(want_off // 64)
        assert list(got["n_tokens"]) == list(want_n)


def test_global_hash_shuffle_rank(ray_session):
    import ray.data as rd

    from tabbyray.ops.sampling import _hash64, global_hash_shuffle

    df = pd.DataFrame({"doc_id": np.arange(1000)})
    want = sorted(df["doc_id"], key=lambda v: (_hash64(v), v))
    # partition-independent and bucket-count-independent
    for nparts, nbuckets in ((1, 64), (7, 64), (7, 16)):
        got = (global_hash_shuffle(rd.from_pandas(df).repartition(nparts),
                                   "doc_id", n_buckets=nbuckets)
               .to_pandas())
        assert len(got) == 1000
        rank = dict(zip(got["doc_id"], got["shuffle_rank"]))
        assert [rank[v] for v in want] == list(range(1000))


def test_packed_sequences(ray_session):
    import ray.data as rd

    from tabbyray.ops.text import packed_sequences

    rng = np.random.RandomState(3)
    docs = pd.DataFrame({
        "doc_id": np.arange(200),
        "text": [" ".join(f"w{i}x{j}" for j in range(n))
                 for i, n in enumerate(rng.randint(1, 50, 200))]})
    toks = [t for s in docs["text"] for t in s.split(" ")]
    want = {s: " ".join(toks[s * 64:(s + 1) * 64])
            for s in range((len(toks) + 63) // 64)}
    # small bucket_size exercises the broadcast prefix-sum path; result
    # must be partition-independent and split docs across boundaries
    for nparts in (1, 6):
        got = (packed_sequences(rd.from_pandas(docs).repartition(nparts),
                                seq_len=64, bucket_size=16)
               .to_pandas().sort_values("seq_id"))
        assert dict(zip(got["seq_id"], got["seq_text"])) == want
        assert (got["n_tokens"]
                == got["seq_text"].str.split(" ").str.len()).all()
    # at least one doc must actually straddle a sequence boundary
    assert len(toks) > 64


def test_grouped_moments_matches_pandas(ray_session):
    import ray.data as rd

    from tabbyray.ops.relational import grouped_moments

    rng = np.random.RandomState(5)
    df = pd.DataFrame({"k": rng.choice(list("abcd"), 3000),
                       "v": rng.randint(0, 1000, 3000)})
    for nparts in (1, 6):
        got = (grouped_moments(rd.from_pandas(df).repartition(nparts),
                               "k", "v")
               .to_pandas().sort_values("k").reset_index(drop=True))
        want = df.groupby("k")["v"]
        assert list(got["n"]) == list(want.count())
        assert list(got["sum_v"]) == list(want.sum())
        assert np.allclose(got["mean_v"], want.mean(), rtol=1e-12)
        assert np.allclose(got["var_v"], want.var(ddof=0), rtol=1e-9)


def test_zscore_normalize(ray_session):
    import ray.data as rd

    from tabbyray.ops.relational import zscore_normalize

    rng = np.random.RandomState(6)
    df = pd.DataFrame({"doc_id": np.arange(2000),
                       "k": rng.choice(["x", "y", "z"], 2000),
                       "v": rng.randint(0, 500, 2000)})
    # constant stratum -> z must be 0, not nan/inf
    df.loc[df["k"] == "z", "v"] = 7
    got = (zscore_normalize(rd.from_pandas(df).repartition(4), "k", "v",
                            out_cols=["doc_id", "k", "v"])
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    g = df.groupby("k")["v"]
    mean, std = g.transform("mean"), g.transform("std", ddof=0)
    want = ((df["v"] - mean) / std.replace(0.0, np.nan)).fillna(0.0)
    assert np.allclose(got["z"], want, rtol=1e-9, atol=1e-12)
    assert (got.loc[got["k"] == "z", "z"] == 0.0).all()


def test_grouped_topk(ray_session):
    import ray.data as rd

    from tabbyray.ops.relational import grouped_topk

    rng = np.random.RandomState(7)
    df = pd.DataFrame({"k": rng.randint(0, 50, 2000),
                       "id": np.arange(2000),
                       # coarse values force ties -> tie_col decides
                       "v": rng.randint(0, 5, 2000).astype("float64")})
    want = (df.sort_values(["v", "id"], ascending=[False, True],
                           kind="stable")
            .groupby("k", sort=False).head(3))
    for nparts in (1, 8):
        got = (grouped_topk(rd.from_pandas(df).repartition(nparts), "k",
                            "v", "id", out_cols=["k", "id", "v"], k=3)
               .to_pandas())
        assert (set(map(tuple, got[["k", "id"]].values))
                == set(map(tuple, want[["k", "id"]].values)))


def test_unigram_logprob_scores(ray_session):
    import math

    import ray.data as rd

    from tabbyray.ops.text import unigram_logprob_scores

    docs = pd.DataFrame({"doc_id": [0, 1, 2],
                         "text": ["a a b", "b c", "a"]})
    got = (unigram_logprob_scores(rd.from_pandas(docs).repartition(2))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # corpus counts: a=3, b=2, c=1, total=6
    p = {"a": 3 / 6, "b": 2 / 6, "c": 1 / 6}
    want = [-(math.log(p["a"]) * 2 + math.log(p["b"])) / 3,
            -(math.log(p["b"]) + math.log(p["c"])) / 2,
            -math.log(p["a"])]
    assert list(got["n_tokens"]) == [3, 2, 1]
    assert np.allclose(got["nll"], want, rtol=1e-12)


def test_cms_sketch_estimates(ray_session):
    import ray.data as rd

    from tabbyray.ops.sketch import cms_frequent_estimates

    rng = np.random.RandomState(8)
    vocab = [f"t{i}" for i in range(200)]
    # zipf-ish frequencies so several terms clear min_count
    texts = [" ".join(rng.choice(vocab, size=50,
                                 p=np.arange(200, 0, -1) / np.arange(
                                     200, 0, -1).sum()))
             for _ in range(400)]
    docs = pd.DataFrame({"doc_id": np.arange(400), "text": texts})
    from collections import Counter
    exact = Counter(t for s in texts for t in s.split(" "))
    want_q = {t for t, n in exact.items() if n >= 100}
    for nparts, width in ((1, 1 << 20), (6, 1 << 20), (6, 256)):
        got = (cms_frequent_estimates(
            rd.from_pandas(docs).repartition(nparts), width=width,
            depth=4, min_count=100).to_pandas())
        assert set(got["term"]) == want_q
        est = dict(zip(got["term"], got["cms_count"]))
        # one-sided error: estimate never undercounts
        assert all(est[t] >= exact[t] for t in want_q)
        if width == 1 << 20:   # huge width -> no collisions -> exact
            assert all(est[t] == exact[t] for t in want_q)


def test_funnel_counts(ray_session):
    import ray.data as rd

    from tabbyray.ops.streaming import funnel_counts

    # user 1: full chain; user 2: B before A (stops at A);
    # user 3: A only; user 4: no A but has B/C (reaches nothing);
    # user 5: A, C, B, C -> full chain via the LATER C
    rows = [
        (1, "A", 1), (1, "B", 2), (1, "C", 3),
        (2, "B", 1), (2, "A", 2),
        (3, "A", 5),
        (4, "B", 1), (4, "C", 2),
        (5, "A", 1), (5, "C", 2), (5, "B", 3), (5, "C", 4),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "tsec"])
    df["ts"] = pd.Timestamp("2026-01-01") + pd.to_timedelta(df["tsec"],
                                                            unit="s")
    for nparts in (1, 4):
        got = (funnel_counts(rd.from_pandas(
                   df[["user_id", "event_type", "ts"]]).repartition(nparts),
                   ["A", "B", "C"])
               .to_pandas().sort_values("step_idx"))
        assert list(got["step"]) == ["A", "B", "C"]
        assert list(got["n_users"]) == [4, 2, 2]


def test_percentile_rank(ray_session):
    import ray.data as rd

    from tabbyray.ops.relational import percentile_rank

    rng = np.random.RandomState(9)
    df = pd.DataFrame({"id": np.arange(3000),
                       "v": rng.randint(0, 80, 3000)})   # heavy ties
    want = (df["v"].rank(method="min") - 1) / (len(df) - 1)
    for nparts in (1, 6):
        got = (percentile_rank(rd.from_pandas(df).repartition(nparts),
                               "v", out_cols=["id", "v"])
               .to_pandas().sort_values("id").reset_index(drop=True))
        assert np.array_equal(got["pr"].to_numpy(), want.to_numpy())


def test_bloom_filter_join(ray_session):
    import ray.data as rd

    from tabbyray.ops.relational import bloom_filter_join

    rng = np.random.RandomState(10)
    big = pd.DataFrame({"k": rng.randint(0, 5000, 20000),
                        "x": np.arange(20000)})
    keys = pd.DataFrame({"kk": np.arange(0, 5000, 7)})   # ~715 keys
    want = set(big[big["k"].isin(set(keys["kk"]))]["x"])
    for nparts in (1, 5):
        got = (bloom_filter_join(
                   rd.from_pandas(big).repartition(3), "k",
                   rd.from_pandas(keys).repartition(nparts), "kk",
                   m_bits=1 << 20, k_hashes=4)
               .to_pandas())
        # m >> k*n -> expected false positives << 1 on this fixture
        assert set(got["x"]) == want


def test_pagerank_matches_dense_iteration(ray_session):
    import ray.data as rd

    from tabbyray.ops.graph import pagerank

    rng = np.random.RandomState(11)
    edges = pd.DataFrame({
        "src": rng.randint(0, 40, 300),
        "dst": rng.randint(40, 70, 300)}).drop_duplicates()
    # reference: dense numpy power iteration with identical semantics
    nodes = np.array(sorted(set(edges["src"]) | set(edges["dst"])))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = edges.groupby("src").size()
    r = np.full(n, 1.0 / n)
    d = 0.85
    for _ in range(3):
        nxt = np.full(n, (1 - d) / n)
        for s, t in edges.itertuples(index=False):
            nxt[idx[t]] += d * r[idx[s]] / outdeg[s]
        r = nxt
    for nparts, mode in ((1, "auto"), (5, "auto"), (5, "join")):
        got = (pagerank(rd.from_pandas(edges).repartition(nparts),
                        n_iter=3, mode=mode)
               .to_pandas().sort_values("node").reset_index(drop=True))
        assert list(got["node"]) == list(nodes)
        assert np.allclose(got["r"], r, rtol=1e-12, atol=1e-15)


def test_inverted_index(ray_session):
    import ray.data as rd

    from tabbyray.ops.text import inverted_index

    docs = pd.DataFrame({
        "doc_id": [3, 1, 2],
        "text": ["x y", "y z", "z y x"]})
    for nparts in (1, 3):
        got = (inverted_index(rd.from_pandas(docs).repartition(nparts),
                              min_df=2)
               .to_pandas().sort_values("term").reset_index(drop=True))
        assert list(got["term"]) == ["x", "y", "z"]
        assert list(got["df"]) == [2, 3, 2]
        assert list(got["doc_ids"]) == ["2,3", "1,2,3", "1,2"]


def test_bigram_counts_topk(ray_session):
    from collections import Counter

    import ray.data as rd

    from tabbyray.ops.text import bigram_counts_topk

    rng = np.random.RandomState(12)
    vocab = list("abcde")
    texts = [" ".join(rng.choice(vocab, 12)) for _ in range(300)]
    docs = pd.DataFrame({"doc_id": np.arange(300), "text": texts})
    exact = Counter(f"{a} {b}" for s in texts
                    for a, b in zip(s.split(" "), s.split(" ")[1:]))
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = (bigram_counts_topk(rd.from_pandas(docs).repartition(4), k=10)
           .to_pandas())
    assert list(map(tuple, got[["bigram", "n"]].values)) == want


def test_weekly_retention(ray_session):
    import ray.data as rd

    from tabbyray.ops.streaming import weekly_retention

    mon = pd.Timestamp("2026-01-05")   # a Monday
    rows = [
        # user 1 active wk0 and wk1; user 2 only wk0 (twice);
        # user 3 wk1 and wk3 (gap -> not retained into wk2)
        (1, mon + pd.Timedelta(days=2)),
        (1, mon + pd.Timedelta(days=8)),
        (2, mon + pd.Timedelta(hours=1)),
        (2, mon + pd.Timedelta(days=3)),
        (3, mon + pd.Timedelta(days=9)),
        (3, mon + pd.Timedelta(days=22)),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    for nparts in (1, 3):
        got = (weekly_retention(rd.from_pandas(df).repartition(nparts))
               .to_pandas().sort_values("week").reset_index(drop=True))
        assert list(got["week"]) == [mon, mon + pd.Timedelta(days=7),
                                     mon + pd.Timedelta(days=21)]
        assert list(got["n_active"]) == [2, 2, 1]
        assert list(got["n_retained"]) == [1, 0, 0]


def test_label_centroids_and_norms(ray_session):
    import ray.data as rd

    from tabbyray.ops.simsearch import embedding_norms, label_centroids

    rng = np.random.RandomState(13)
    d = 6
    emb = pd.DataFrame({
        "vec_id": np.arange(400),
        "label": rng.randint(0, 3, 400).astype("int32"),
        "embedding": [rng.randn(d).astype("float32") for _ in range(400)]})
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    for nparts in (1, 5):
        ds = rd.from_pandas(emb).repartition(nparts)
        got = (label_centroids(ds).to_pandas()
               .sort_values(["label", "dim"]).reset_index(drop=True))
        for lab in (0, 1, 2):
            want = M[emb["label"].to_numpy() == lab].mean(axis=0)
            sub = got[got["label"] == lab]
            assert list(sub["dim"]) == list(range(d))
            assert np.allclose(sub["mean_v"], want, rtol=1e-12)
        gn = (embedding_norms(ds).to_pandas()
              .sort_values("vec_id").reset_index(drop=True))
        assert np.allclose(gn["norm"], np.sqrt((M * M).sum(axis=1)),
                           rtol=1e-12)


def test_melt(ray_session):
    import ray.data as rd

    from tabbyray.ops.relational import melt

    df = pd.DataFrame({"id": [1, 2], "a": [10, 20], "b": [0.5, 1.5]})
    got = (melt(rd.from_pandas(df).repartition(2), ["id"], ["a", "b"])
           .to_pandas().sort_values(["id", "metric"])
           .reset_index(drop=True))
    assert list(got["metric"]) == ["a", "b", "a", "b"]
    assert list(got["value"]) == [10.0, 0.5, 20.0, 1.5]
    assert got["value"].dtype == "float64"


def test_gap_filled_hourly_counts(ray_session):
    import ray.data as rd

    from tabbyray.ops.streaming import gap_filled_hourly_counts

    t0 = pd.Timestamp("2026-03-01 00:10")
    df = pd.DataFrame({
        # hour 0 has x twice, hour 2 has y once; hour 1 is EMPTY
        "ts": [t0, t0 + pd.Timedelta(minutes=5),
               t0 + pd.Timedelta(hours=2)],
        "event_type": ["x", "x", "y"]})
    got = (gap_filled_hourly_counts(rd.from_pandas(df).repartition(2))
           .to_pandas().sort_values(["hour", "event_type"])
           .reset_index(drop=True))
    assert len(got) == 6   # 3 hours x 2 types, empty hour densified
    m = {(h, e): n for h, e, n in got.values}
    h0 = t0.floor("h")
    assert m[(h0, "x")] == 2 and m[(h0, "y")] == 0
    assert m[(h0 + pd.Timedelta(hours=1), "x")] == 0
    assert m[(h0 + pd.Timedelta(hours=2), "y")] == 1


def test_rolling_user_avg(ray_session):
    import ray.data as rd

    from tabbyray.ops.streaming import rolling_user_avg

    base = pd.Timestamp("2026-02-01")
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2],
        "event_id": [10, 11, 12, 13, 20],
        "ts": [base + pd.Timedelta(minutes=i) for i in range(5)],
        "value": [1.0, 2.0, 3.0, 4.0, 10.0]})
    for nparts in (1, 3):
        got = (rolling_user_avg(rd.from_pandas(df).repartition(nparts),
                                window=3)
               .to_pandas().sort_values("event_id")
               .reset_index(drop=True))
        # trailing window of 3 over cents: 100; (100+200)/2; ...
        assert list(got["avg_cents"]) == [100.0, 150.0, 200.0, 300.0,
                                          1000.0]


def test_grouped_linreg(ray_session):
    import ray.data as rd

    from tabbyray.ops.relational import grouped_linreg

    rng = np.random.RandomState(14)
    x = rng.randint(1, 200, 2000)
    noise = rng.randint(-10, 11, 2000)
    df = pd.DataFrame({"k": rng.choice(["a", "b"], 2000),
                       "x": x, "y": 3 * x + 7 + noise})
    for nparts in (1, 6):
        got = (grouped_linreg(rd.from_pandas(df).repartition(nparts),
                              "k", "x", "y")
               .to_pandas().sort_values("k").reset_index(drop=True))
        for _, row in got.iterrows():
            sub = df[df["k"] == row["k"]]
            want = np.polyfit(sub["x"], sub["y"], 1)
            assert abs(row["slope"] - want[0]) < 1e-9
            assert abs(row["intercept"] - want[1]) < 1e-6
            assert abs(row["r"]
                       - np.corrcoef(sub["x"], sub["y"])[0, 1]) < 1e-12


def test_broadcast_hash_join(ray_session):
    import ray.data as rd

    from tabbyray.ops.relational import broadcast_hash_join

    rng = np.random.RandomState(15)
    large = pd.DataFrame({"k": rng.randint(0, 30, 500),
                          "v": np.arange(500)})
    small = pd.DataFrame({"k": np.arange(0, 30, 2),
                          "name": [f"n{i}" for i in range(15)]})
    got = (broadcast_hash_join(rd.from_pandas(large).repartition(4),
                               rd.from_pandas(small), on="k")
           .to_pandas().sort_values(["k", "v"]).reset_index(drop=True))
    want = (large.merge(small, on="k")
            .sort_values(["k", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns], want)
    # left join keeps unmatched rows
    gl = broadcast_hash_join(rd.from_pandas(large), rd.from_pandas(small),
                             on="k", how="left").to_pandas()
    assert len(gl) == len(large)
    assert gl["name"].isna().sum() == (large["k"] % 2 == 1).sum()


def test_incremental_dedup_fps(ray_session):
    import ray.data as rd

    from tabbyray.ops.stateful import incremental_dedup_fps

    rng = np.random.RandomState(16)
    # heavy duplication: 50 distinct texts over 800 docs
    texts = [f"doc body {i}" for i in rng.randint(0, 50, 800)]
    docs = pd.DataFrame({"doc_id": np.arange(800), "text": texts})
    import hashlib
    want = {hashlib.md5(t.encode()).hexdigest() for t in set(texts)}
    for nparts in (1, 7):
        got = (incremental_dedup_fps(
                   rd.from_pandas(docs).repartition(nparts), n_shards=4)
               .to_pandas())
        # exactly one survivor per distinct fingerprint, set-exact
        assert len(got) == len(want)
        assert set(got["fp"]) == want


def test_asof_join_one_sided_partitions(ray_session):
    """Regression: a hash partition holding ONLY right-side rows used
    to degrade the absent left columns to object dtype and crash
    merge_asof (surfaced at sf0.001 where many of the 32 partitions
    have orders but no events)."""
    import ray.data as rd

    from tabbyray.ops.relational import asof_join

    base = pd.Timestamp("2026-01-01")
    # left covers ONE key; right covers many keys -> most partitions
    # are right-only
    left = pd.DataFrame({"k": [5, 5],
                         "lts": [base + pd.Timedelta(minutes=10),
                                 base + pd.Timedelta(minutes=20)],
                         "lv": [1, 2]})
    right = pd.DataFrame({
        "k": np.arange(100),
        "rts": [base] * 100,
        "rv": np.arange(100) * 10})
    got = (asof_join(rd.from_pandas(left), rd.from_pandas(right),
                     on="k", left_ts="lts", right_ts="rts")
           .to_pandas().sort_values("lv").reset_index(drop=True))
    assert list(got["lv"]) == [1, 2]
    assert list(got["rv"]) == [50, 50]


def test_json_int_key_counts(ray_session):
    import ray.data as rd

    from tabbyray.ops.relational import json_int_key_counts

    df = pd.DataFrame({"props": ['{"k": 1}', '{"k": 1}', '{"k": 2}',
                                 '{"x": 9}', 'not json', None]})
    for nparts in (1, 3):
        got = (json_int_key_counts(
                   rd.from_pandas(df).repartition(nparts), "props", "k")
               .to_pandas().sort_values("k").reset_index(drop=True))
        assert list(got["k"]) == [1, 2]
        assert list(got["n"]) == [2, 1]


def test_auto_partitions_sizing(ray_session):
    from tabbyray.ops.relational import auto_partitions, _resolve_partitions

    p = auto_partitions()
    # session has 4 cpus -> floor dominates; never below floor/above cap
    assert p >= 16
    assert auto_partitions(min_p=2, per_cpu=2, cap=4096) == 8   # 2*4 cpus
    assert auto_partitions(min_p=2, per_cpu=2, cap=5) == 5      # cap wins
    assert _resolve_partitions(None) == p
    assert _resolve_partitions(7) == 7                          # explicit wins


def test_binned_quantiles_error_bound(ray_session):
    """Continuous-domain quantile sketch: bounded state, value error
    <= 2*(max-min)/n_bins vs the exact path (VERDICT r2 item 2)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tabbyray.ops.relational import binned_quantiles, exact_quantiles

    rng = np.random.RandomState(5)
    vals = np.concatenate([rng.lognormal(3.0, 1.0, 20_000),
                           rng.uniform(0, 500, 5_000)])
    ds = rd.from_pandas(pd.DataFrame({"v": vals}))
    qs = [0.1, 0.5, 0.9, 0.99]
    exact = exact_quantiles(ds, "v", qs, mode="exact")
    n_bins = 4096
    approx = binned_quantiles(ds, "v", qs, n_bins=n_bins)
    bound = 2 * (vals.max() - vals.min()) / n_bins
    for e, a in zip(exact["value"], approx["value"]):
        assert abs(e - a) <= bound, (e, a, bound)
    # auto mode routes a floating column to the sketch
    auto = exact_quantiles(ds, "v", qs, mode="auto", n_bins=n_bins)
    assert list(auto["value"]) == list(approx["value"])
    # ...and an integer column to the exact path
    ints = rd.from_pandas(pd.DataFrame({"v": rng.randint(0, 50, 10_000)}))
    assert list(exact_quantiles(ints, "v", [0.5], mode="auto")["value"]) \
        == list(exact_quantiles(ints, "v", [0.5], mode="exact")["value"])


def test_grouped_binned_quantiles_error_bound(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tabbyray.ops.relational import (grouped_binned_quantiles,
                                         grouped_quantiles)

    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "g": np.repeat(["a", "b", "c"], 8_000),
        "v": np.concatenate([rng.normal(10, 2, 8_000),
                             rng.exponential(5.0, 8_000),
                             rng.uniform(-3, 3, 8_000)]),
    })
    ds = rd.from_pandas(df)
    qs = [0.25, 0.5, 0.95]
    n_bins = 4096
    exact = grouped_quantiles(ds, "g", "v", qs, mode="exact")
    approx = grouped_binned_quantiles(ds, "g", "v", qs, n_bins=n_bins)
    spans = df.groupby("g")["v"].agg(lambda s: s.max() - s.min())
    m = exact.merge(approx, on=["g", "q"], suffixes=("_e", "_a"))
    for _, r in m.iterrows():
        bound = 2 * spans[r["g"]] / n_bins
        assert abs(r["value_e"] - r["value_a"]) <= bound, dict(r)
    # float column auto-routes to the sketch
    auto = grouped_quantiles(ds, "g", "v", qs, mode="auto", n_bins=n_bins)
    pd.testing.assert_frame_equal(auto, approx)


def test_binned_percentile_rank_error_bound(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tabbyray.ops.relational import percentile_rank

    rng = np.random.RandomState(3)
    n = 20_000
    df = pd.DataFrame({"id": np.arange(n),
                       "v": rng.lognormal(0.0, 1.5, n)})
    ds = rd.from_pandas(df)
    n_bins = 4096
    exact = (percentile_rank(ds, "v", ["id"], mode="exact").to_pandas()
             .sort_values("id").reset_index(drop=True))
    approx = (percentile_rank(ds, "v", ["id"], mode="auto", n_bins=n_bins)
              .to_pandas().sort_values("id").reset_index(drop=True))
    # rank error bounded by the largest bin's share
    lo, hi = df["v"].min(), df["v"].max()
    bins = np.minimum(((df["v"] - lo) / ((hi - lo) / n_bins)).astype(int),
                      n_bins - 1)
    max_bin = int(np.bincount(bins, minlength=n_bins).max())
    bound = max_bin / (n - 1)
    assert np.all(np.abs(exact["pr"] - approx["pr"]) <= bound + 1e-12)


def test_range_join_bucketed_matches_broadcast(ray_session):
    """The no-broadcast interval-join plan must produce the identical
    (row, band) relation as the broadcast plan — including overlapping
    bands, bands spanning multiple buckets (forced small bucket_width),
    and a Dataset-typed bands side (width derived distributedly)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from tabbyray.ops.relational import (range_join_broadcast,
                                         range_join_bucketed)

    bands = pd.DataFrame({
        "band_id": range(7),
        "lo": [float(i * 10) for i in range(7)],
        "hi": [float(i * 10 + 14) for i in range(7)],   # overlapping
    })
    rows = pd.DataFrame({"rid": range(300),
                         "value": [(i * 7.3) % 80 for i in range(300)]})
    ds = rd.from_pandas(rows)
    schema = pa.schema([("rid", pa.int64()), ("value", pa.float64())])

    def norm(d):
        return (d.to_pandas().sort_values(["rid", "band_id"])
                .reset_index(drop=True))

    ref = norm(range_join_broadcast(ds, "value", bands,
                                    band_cols=["band_id"]))
    got = norm(range_join_bucketed(ds, "value", bands,
                                   band_cols=["band_id"],
                                   left_schema=schema))
    pd.testing.assert_frame_equal(ref[got.columns], got)
    # bands spanning many buckets (width 3 << band width 14)
    got_small = norm(range_join_bucketed(ds, "value", bands,
                                         band_cols=["band_id"],
                                         bucket_width=3.0,
                                         left_schema=schema))
    pd.testing.assert_frame_equal(ref[got_small.columns], got_small)
    # bands arriving as a Dataset (distributed width derivation)
    got_ds = norm(range_join_bucketed(ds, "value", rd.from_pandas(bands),
                                      band_cols=["band_id"],
                                      left_schema=schema))
    pd.testing.assert_frame_equal(ref[got_ds.columns], got_ds)


def test_zscore_join_matches_broadcast(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from tabbyray.ops.relational import zscore_normalize

    df = pd.DataFrame({"id": range(200),
                       "g": [("a", "b", "c")[i % 3] for i in range(200)],
                       "v": [(i * 13) % 97 for i in range(200)]})
    ds = rd.from_pandas(df)
    schema = pa.schema([("id", pa.int64()), ("g", pa.string()),
                        ("v", pa.int64())])

    def run(**kw):
        return (zscore_normalize(ds, "g", "v", out_cols=["id", "g", "v"],
                                 **kw).to_pandas()
                .sort_values("id").reset_index(drop=True))

    bc = run(mode="broadcast")
    jn = run(mode="join", ds_schema=schema)
    pd.testing.assert_frame_equal(bc, jn[bc.columns])   # bit-identical
    auto_small = run(mode="auto", broadcast_max_keys=10)   # 3 keys -> bc
    auto_big = run(mode="auto", broadcast_max_keys=1,      # -> join
                   ds_schema=schema)
    pd.testing.assert_frame_equal(bc, auto_small)
    pd.testing.assert_frame_equal(bc, auto_big[bc.columns])


def test_ngram_contamination_join_matches_broadcast(ray_session):
    import pandas as pd
    import ray.data as rd

    from tabbyray.ops.text import ngram_contamination

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": range(12),
        "text": [f"one two three four token{i} five six"
                 if i % 3 else "alpha beta gamma delta epsilon zeta eta"
                 for i in range(12)],
    }))
    bench = rd.from_pandas(pd.DataFrame({
        "doc_id": [100], "text": ["alpha beta gamma delta epsilon"]}))

    def run(**kw):
        return (ngram_contamination(docs, bench, **kw).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))

    bc = run(mode="broadcast")
    jn = run(mode="join")
    pd.testing.assert_frame_equal(bc, jn[bc.columns])
    assert (bc["n_overlap"] > 0).any() and (bc["n_overlap"] == 0).any()
    auto_small = run(mode="auto", broadcast_max_shingles=1000)
    auto_big = run(mode="auto", broadcast_max_shingles=1)
    pd.testing.assert_frame_equal(bc, auto_small)
    pd.testing.assert_frame_equal(bc, auto_big[bc.columns])


def test_hash_join_composite_key(ray_session):
    """Composite-key hash_join: inner/semi/anti over a two-column key
    must match pandas merge semantics exactly."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from tabbyray.ops.relational import hash_join

    l = pd.DataFrame({"a": [1, 1, 2, 2, 3], "b": [1, 2, 1, 2, 1],
                      "x": [10, 20, 30, 40, 50]})
    r = pd.DataFrame({"a": [1, 2, 2, 4], "b": [2, 1, 9, 1],
                      "y": [7, 8, 9, 6]})
    ls = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                    ("x", pa.int64())])
    rs = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                    ("y", pa.int64())])
    lds, rds = rd.from_pandas(l), rd.from_pandas(r)

    def norm(df):
        return (df.sort_values(list(df.columns))
                .reset_index(drop=True).astype("int64"))

    inner = norm(hash_join(lds, rds, on=["a", "b"], left_schema=ls,
                           right_schema=rs).to_pandas())
    pd.testing.assert_frame_equal(inner, norm(l.merge(r, on=["a", "b"])))

    semi = norm(hash_join(lds, rds, on=["a", "b"], how="semi",
                          left_schema=ls, right_schema=rs).to_pandas())
    expect_semi = norm(l[l.set_index(["a", "b"]).index.isin(
        r.set_index(["a", "b"]).index)])
    pd.testing.assert_frame_equal(semi, expect_semi)

    anti = norm(hash_join(lds, rds, on=["a", "b"], how="anti",
                          left_schema=ls, right_schema=rs).to_pandas())
    expect_anti = norm(l[~l.set_index(["a", "b"]).index.isin(
        r.set_index(["a", "b"]).index)])
    pd.testing.assert_frame_equal(anti, expect_anti)


def test_winsorize(ray_session):
    import pandas as pd
    import ray.data as rd

    from tabbyray.ops.relational import exact_quantiles, winsorize

    df = pd.DataFrame({"id": range(100),
                       "v": list(range(100))})   # 0..99
    ds = rd.from_pandas(df)
    out = (winsorize(ds, "v", out_cols=["id"], lo_q=0.1, hi_q=0.9)
           .to_pandas().sort_values("id").reset_index(drop=True))
    q = exact_quantiles(ds, "v", [0.1, 0.9], mode="exact")
    lo, hi = float(q["value"].iloc[0]), float(q["value"].iloc[1])
    assert out["clipped"].min() == lo and out["clipped"].max() == hi
    # interior values untouched
    assert out.loc[50, "clipped"] == 50.0


def test_exact_quantiles_multipass(ray_session):
    """Multi-pass refinement must equal the exact distinct-histogram
    path bit-for-bit on continuous data, handle point masses, and
    resolve under a tiny collect_cap (forcing several passes)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tabbyray.ops.relational import (exact_quantiles,
                                         exact_quantiles_multipass)

    rng = np.random.RandomState(9)
    vals = np.concatenate([rng.lognormal(2.0, 1.0, 15_000),
                           np.full(3_000, 7.25),       # point mass
                           rng.uniform(-5, 5, 2_000)])
    ds = rd.from_pandas(pd.DataFrame({"v": vals}))
    qs = [0.1, 0.5, 0.9, 0.99]
    exact = exact_quantiles(ds, "v", qs, mode="exact")
    mp = exact_quantiles_multipass(ds, "v", qs, n_bins=64,
                                   collect_cap=100)
    for e, m in zip(exact["value"], mp["value"]):
        assert e == m, (e, m)       # bit-identical, not approximate


def test_guard_rails(ray_session):
    """ADVICE fixes: invalid bands, non-positive weights and exhausted
    multipass refinement fail loudly instead of corrupting output or
    silently unbounding driver state."""
    import ray.data as rd

    from tabbyray.ops.relational import (exact_quantiles_multipass,
                                         range_join_bucketed)
    from tabbyray.ops.sampling import weighted_sample_k

    left = pd.DataFrame({"v": [1.0, 2.0, 3.0], "id": [1, 2, 3]})
    bad_bands = pd.DataFrame({"lo": [5.0], "hi": [1.0], "name": ["x"]})
    # errors raised inside Ray tasks surface wrapped in RayTaskError
    with pytest.raises(Exception, match="invalid band"):
        range_join_bucketed(rd.from_pandas(left), "v",
                            bad_bands).to_pandas()
    nan_bands = pd.DataFrame({"lo": [float("nan")], "hi": [1.0],
                              "name": ["x"]})
    with pytest.raises(Exception, match="invalid band"):
        range_join_bucketed(rd.from_pandas(left), "v",
                            nan_bands).to_pandas()

    docs = pd.DataFrame({"doc_id": [1, 2, 3], "w": [1.0, -1.0, 2.0]})
    with pytest.raises(Exception, match="finite and > 0"):
        weighted_sample_k(rd.from_pandas(docs), "doc_id", "w",
                          k=2).to_pandas()

    vals = pd.DataFrame({"x": np.linspace(0.0, 1.0, 500)})
    with pytest.raises(RuntimeError, match="collect_cap"):
        exact_quantiles_multipass(rd.from_pandas(vals), "x", [0.5],
                                  collect_cap=2, max_passes=0)


def test_hash_join_exact_63bit_ids(ray_session):
    """Int64 values above 2^53 (63-bit hash ids / snowflake keys) must
    survive the tagged-union shuffle EXACTLY — the union-padded int
    columns take a pandas round-trip inside Ray's sort machinery, which
    rounds null-carrying int64 to float64 unless sentinel-padded."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from tabbyray.ops.relational import hash_join
    B = (1 << 61) + 7
    l = rd.from_pandas(pd.DataFrame({"k": [B + 1, B + 2, B + 5],
                                     "lv": [B + 11, B + 12, B + 13]}))
    r = rd.from_pandas(pd.DataFrame({"k": [B + 2, B + 3],
                                     "rv": [B + 21, B + 22]}))
    ls = pa.schema([("k", pa.int64()), ("lv", pa.int64())])
    rs = pa.schema([("k", pa.int64()), ("rv", pa.int64())])
    inner = (hash_join(l, r, on="k", num_partitions=4,
                       left_schema=ls, right_schema=rs)
             .to_arrow_refs())
    import ray as _ray
    t = pa.concat_tables([_ray.get(x) for x in inner])
    assert t.column("k").to_pylist() == [B + 2]
    assert t.column("lv").to_pylist() == [B + 12]
    assert t.column("rv").to_pylist() == [B + 21]
    outer = hash_join(l, r, on="k", how="outer", num_partitions=4,
                      left_schema=ls, right_schema=rs).to_arrow_refs()
    t = pa.concat_tables([_ray.get(x) for x in outer]).sort_by("k")
    assert t.column("k").to_pylist() == [B + 1, B + 2, B + 3, B + 5]
    assert t.column("lv").to_pylist() == [B + 11, B + 12, None, B + 13]
    assert t.column("rv").to_pylist() == [None, B + 21, B + 22, None]


def test_connected_components_63bit_ids(ray_session):
    """Label propagation stays exact for 63-bit node ids (md5 host
    hashes), including the wrapping convergence checksum."""
    import pandas as pd
    import ray.data as rd
    from tabbyray.ops.graph import connected_components
    B = (1 << 61) + 7
    pairs = rd.from_pandas(pd.DataFrame({"a": [B + 1, B + 2],
                                         "b": [B + 2, B + 3]}))
    nodes = rd.from_pandas(pd.DataFrame({"node": [B + 1, B + 2,
                                                  B + 3, B + 4]}))
    df = connected_components(pairs, nodes, num_partitions=4).to_pandas()
    got = sorted(map(tuple, df.itertuples(index=False)))
    assert got == [(B + 1, B + 1), (B + 2, B + 1),
                   (B + 3, B + 1), (B + 4, B + 4)]


def test_hits_matches_dense_iteration(ray_session):
    """HITS == dense numpy power iteration (L1-normalized half-rounds,
    authorities first) on both execution paths at several partition
    counts; no-inbound nodes get auth 0, no-outbound hub 0."""
    import ray.data as rd

    from tabbyray.ops.graph import hits

    rng = np.random.RandomState(13)
    edges = pd.DataFrame({
        "src": rng.randint(0, 25, 160),
        "dst": rng.randint(5, 30, 160)}).drop_duplicates()
    edges = edges[edges["src"] != edges["dst"]]
    nodes = np.array(sorted(set(edges["src"]) | set(edges["dst"])))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for s, t in edges.itertuples(index=False):
        A[idx[s], idx[t]] = 1.0
    h = np.full(n, 1.0 / n)
    for _ in range(3):
        a = A.T @ h
        a = a / a.sum()
        h = A @ a
        h = h / h.sum()
    for nparts, mode in ((1, "broadcast"), (5, "broadcast"), (5, "join")):
        got = (hits(rd.from_pandas(edges).repartition(nparts),
                    n_iter=3, mode=mode)
               .to_pandas().sort_values("node").reset_index(drop=True))
        assert list(got["node"]) == list(nodes)
        assert np.allclose(got["auth"], a, rtol=1e-12, atol=1e-15), mode
        assert np.allclose(got["hub"], h, rtol=1e-12, atol=1e-15), mode
    # sources only (no inbound) -> auth 0; sinks only -> hub 0
    src_only = sorted(set(edges["src"]) - set(edges["dst"]))
    if src_only:
        assert np.allclose(
            got.set_index("node").loc[src_only, "auth"], 0.0)
    dst_only = sorted(set(edges["dst"]) - set(edges["src"]))
    if dst_only:
        assert np.allclose(
            got.set_index("node").loc[dst_only, "hub"], 0.0)


def test_set_delta_statuses(ray_session):
    """Full-outer snapshot delta: added/removed/kept on composite keys,
    bag duplicates collapse to set semantics."""
    import ray.data as rd

    from tabbyray.ops.relational import set_delta
    old = rd.from_items([{"subj": s, "pred": p, "obj": o} for s, p, o in
                         [("a", "t", "x"), ("a", "t", "x"),
                          ("b", "t", "y"), ("c", "t", "z")]])
    new = rd.from_items([{"subj": s, "pred": p, "obj": o} for s, p, o in
                         [("a", "t", "x"), ("c", "t", "z2"),
                          ("d", "t", "w")]])
    got = sorted((r["subj"], r["obj"], r["status"])
                 for r in set_delta(old, new, ["subj", "pred", "obj"],
                                    num_partitions=4).take_all())
    assert got == [("a", "x", "kept"), ("b", "y", "removed"),
                   ("c", "z", "removed"), ("c", "z2", "added"),
                   ("d", "w", "added")]


def test_interval_overlap_join_hand(ray_session):
    """Closed-endpoint semantics, containment, disjoint, and the
    giant-interval bucket-amplification path (tiny forced width)."""
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd
    from tabbyray.ops.relational import interval_overlap_join

    a = pd.DataFrame({"iv_id": [0, 1, 2],
                      "lo": [0, 100, 1000],
                      "hi": [10, 200, 5000]})
    b = pd.DataFrame({"iv_id": [10, 11, 12],
                      "lo": [10, 300, 1500],
                      "hi": [20, 400, 1600]})
    sch = pa.schema([("iv_id", pa.int64()), ("lo", pa.int64()),
                     ("hi", pa.int64())])

    def run(**kw):
        return (interval_overlap_join(
            rd.from_pandas(a), rd.from_pandas(b), num_partitions=4,
            left_schema=sch, right_schema=sch, **kw)
            .to_pandas().sort_values(["iv_id_a", "iv_id_b"]))

    got = run()
    pairs = list(zip(got.iv_id_a, got.iv_id_b))
    # 0-10 touch at 10 (closed: counts); 2 contains 12; 1 vs 11 gap
    assert pairs == [(0, 10), (2, 12)]
    # tiny width forces heavy bucket amplification; dedup rule must
    # still emit each pair exactly once
    got2 = run(bucket_width=7.0)
    assert list(zip(got2.iv_id_a, got2.iv_id_b)) == pairs

    bad = pd.DataFrame({"iv_id": [0], "lo": [5], "hi": [1]})
    # the ValueError surfaces wrapped in Ray's task error
    with pytest.raises(Exception, match="invalid interval"):
        interval_overlap_join(rd.from_pandas(bad), rd.from_pandas(b),
                              num_partitions=4, left_schema=sch,
                              right_schema=sch).to_pandas()

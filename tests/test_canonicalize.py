"""Canonicalization shuffle: salted == unsalted; skew fixture (F6)."""

import os

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def skew_triples(ray_session, tmp_path_factory):
    import ray.data as rd

    from tabbyray import pipeline
    from tabbyray.fixtures import ensure_fixture
    from tabbyray.kb import load_kb

    path = ensure_fixture("skew", seed=13, n_pages=60, n_entities=400, skew=True)
    kb = load_kb(os.path.join(path, "kb.parquet"))
    kb_ref, gaz_ref = pipeline.put_kb(kb)
    results = pipeline.kg_pipeline(os.path.join(path, "pages.parquet"), kb_ref, gaz_ref)
    tri = pipeline.split_kind(results, "triple").to_pandas()
    assert len(tri) > 50
    return tri


def _canon(tri_df, num_salt, mode="auto"):
    import ray.data as rd

    from tabbyray.canonicalize import canonicalize_triples

    ds = rd.from_pandas(tri_df)
    out = canonicalize_triples(ds, num_salt=num_salt, mode=mode).to_pandas()
    key = ["url", "table_idx", "row_idx", "subj", "pred", "obj"]
    return out.sort_values(key).reset_index(drop=True)


def test_salted_equals_unsalted(skew_triples):
    a = _canon(skew_triples, num_salt=1)
    b = _canon(skew_triples, num_salt=16)
    pd.testing.assert_frame_equal(a, b)


def test_join_mode_equals_broadcast(skew_triples):
    # the shuffle-join rewrite (100-TB path) must be output-identical
    # to the broadcast rewrite on the skew fixture
    a = _canon(skew_triples, num_salt=16, mode="broadcast")
    b = _canon(skew_triples, num_salt=16, mode="join")
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_canonical_map_unifies_surface_variants(ray_session):
    import ray.data as rd

    from tabbyray.canonicalize import canonical_map

    tri = pd.DataFrame({
        "subj": ["http://dbpedia.org/resource/New_york"] * 3
                + ["http://dbpedia.org/resource/NEW_YORK"] * 1,
        "pred": ["p"] * 4,
        "obj": ["o"] * 4,
        "obj_is_literal": [True] * 4,
    })
    m = canonical_map(rd.from_pandas(tri)).to_pandas()
    assert len(m) == 1
    # most frequent representative wins
    assert m.iloc[0]["canonical_subj"] == "http://dbpedia.org/resource/New_york"
    assert m.iloc[0]["support"] == 4

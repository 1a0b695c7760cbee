"""Conformance: distributed Ray pipeline vs straight-line oracle.

The north rule's P/R >= 0.95 gate (BASELINE.json): the Ray pipeline's
annotations and triples must match the reference-semantics oracle on
the seeded conformance corpus. Everything order-sensitive (tie-breaks,
insertion-order dedup, last-wins maps) must survive batching, the
table_id shuffle and the actor pool.
"""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def run(ray_session, conformance_fixture):
    from tabbyray import metrics, oracle, pipeline
    from tabbyray.kb import load_kb

    kb = load_kb(os.path.join(conformance_fixture, "kb.parquet"))
    kb_ref, gaz_ref = pipeline.put_kb(kb)
    results = pipeline.kg_pipeline(
        os.path.join(conformance_fixture, "pages.parquet"),
        kb_ref, gaz_ref, check_text_invariant=True)
    res_df = results.to_pandas()
    gold = pq.read_table(os.path.join(conformance_fixture, "gold_cells.parquet"))
    g_ann, g_tri, g_rows, counters = oracle.run_tables(gold, kb)
    return res_df, g_ann, g_tri, g_rows, counters, metrics


def test_annotation_precision_recall(run):
    res_df, g_ann, _, _, _, metrics = run
    ann = res_df[res_df["kind"] == "annotation"]
    m = metrics.evaluate(ann, g_ann)
    assert m["overall"]["total"] > 200
    assert m["overall"]["precision"] >= 0.95
    assert m["overall"]["recall"] >= 0.95


def test_triples_exact_set_equality(run):
    res_df, _, g_tri, _, _, _ = run
    tri = res_df[res_df["kind"] == "triple"][
        ["url", "table_idx", "row_idx", "subj", "pred", "obj", "obj_is_literal"]]
    key = ["url", "table_idx", "row_idx", "subj", "pred", "obj", "obj_is_literal"]
    a = tri.sort_values(key).reset_index(drop=True)
    b = g_tri[key].sort_values(key).reset_index(drop=True)
    for df in (a, b):
        df["row_idx"] = df["row_idx"].astype("int64")
        df["obj_is_literal"] = df["obj_is_literal"].astype("bool")
    pd.testing.assert_frame_equal(a, b)


def test_assembled_rows_match(run):
    res_df, _, _, g_rows, _, _ = run
    rows = res_df[res_df["kind"] == "row"][
        ["url", "table_idx", "row_idx", "data", "row_heading", "column_heading"]]
    key = ["url", "table_idx", "row_idx"]
    a = rows.sort_values(key).reset_index(drop=True)
    b = g_rows.sort_values(key).reset_index(drop=True)
    a["row_idx"] = a["row_idx"].astype("int64")
    b["row_idx"] = b["row_idx"].astype("int64")
    pd.testing.assert_frame_equal(a, b)


def test_counters_match_oracle(run):
    res_df, g_ann, _, _, counters, _ = run
    ann = res_df[res_df["kind"] == "annotation"]
    assert len(ann) == len(g_ann)


def test_fused_equals_partitioned(ray_session):
    """The zero-shuffle fused extract+annotate path must be
    output-identical to the explicit hash-partition plan (the per-table
    grouping is guaranteed by page-aligned extraction)."""
    import os

    import pandas as pd

    from tabbyray import pipeline
    from tabbyray.fixtures import ensure_fixture
    from tabbyray.kb import load_kb

    fix = ensure_fixture("conformance", seed=7, n_pages=60, n_entities=800)
    kb = load_kb(os.path.join(fix, "kb.parquet"))
    kb_ref, gaz_ref = pipeline.put_kb(kb)
    a = pipeline.kg_pipeline(os.path.join(fix, "pages.parquet"), kb_ref,
                             gaz_ref, annotate_mode="partitioned").to_pandas()
    b = pipeline.kg_pipeline(os.path.join(fix, "pages.parquet"), kb_ref,
                             gaz_ref, annotate_mode="fused").to_pandas()
    key = list(a.columns)
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))

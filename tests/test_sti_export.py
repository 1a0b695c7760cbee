"""STI intermediate export (tabbyray/sti_export.py): the artifact that
makes the flagship externally verifiable. Checks that the export is
written atomically, is deterministic, and that the exported factor
columns reproduce the pipeline's aggregates and winners exactly."""

import os

import duckdb
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def export_paths(ray_session):
    from tabbyray.fixtures import ensure_fixture
    from tabbyray.sti_export import ensure_export
    fix = ensure_fixture("export-test", seed=13, n_pages=40, n_entities=400)
    return fix, ensure_export(fix)


def test_export_files_exist(export_paths):
    _fix, paths = export_paths
    for name in ("candidates", "cells", "counters", "triples"):
        assert os.path.exists(paths[name]), name
    cand = pq.read_table(paths["candidates"])
    assert cand.num_rows > 0
    # every candidate carries a computed aggregate
    assert cand.column("agg_rank").null_count == 0


def test_c6_arithmetic_reproduces_agg(export_paths):
    """C6 (`components/CanonicalTableAnnotator.php:860-863`): the factor
    columns recombine to the pipeline's agg_rank bit-for-bit."""
    _fix, paths = export_paths
    t = pq.read_table(paths["candidates"])
    t = t.filter(pc.and_(pc.equal(t["cell_type"], 0),
                         pc.invert(t["is_literal"].combine_chunks())))
    lev = t.column("lev").to_pylist()
    ner = t.column("ner_rank").to_pylist()
    hr = t.column("heading_rank").to_pylist()
    ctx = t.column("ctx_rank").to_pylist()
    sem = t.column("sem_rank").to_pylist()
    agg = t.column("agg_rank").to_pylist()
    for i in range(t.num_rows):
        expect = (1.0 * (1 - lev[i] / 100) + 1.0 * ner[i]
                  + 1.0 * (1 - hr[i] / 100) + 1.0 * ctx[i] + 1.0 * sem[i])
        assert agg[i] == expect, i


def test_sql_argmax_matches_pipeline_winners(export_paths):
    """C8: DuckDB row_number argmax over the export == the live
    pipeline's annotation winners."""
    fix, paths = export_paths
    import ray

    from tabbyray import pipeline
    from tabbyray.kb import load_kb
    kb = load_kb(os.path.join(fix, "kb.parquet"))
    kb_ref, gaz_ref = pipeline.put_kb(kb)
    results = pipeline.kg_pipeline(
        os.path.join(fix, "pages.parquet"), kb_ref, gaz_ref)
    live = (pipeline.split_kind(results, "annotation").to_pandas()
            .sort_values(["url", "table_idx", "cell_type", "surface_form"])
            .reset_index(drop=True))
    con = duckdb.connect()
    sql = f"""
        SELECT url, table_idx, cell_type, surface_form, entity,
               agg_rank AS aggregated_rank, rel_rank,
               CAST(n_cands AS BIGINT) AS n_candidates
        FROM (SELECT *,
                     count(*) OVER (PARTITION BY url, table_idx, cell_type,
                                    surface_form) AS n_cands,
                     row_number() OVER (PARTITION BY url, table_idx,
                                        cell_type, surface_form
                                        ORDER BY agg_rank DESC, ord ASC) AS rn
              FROM read_parquet('{paths["candidates"]}')) WHERE rn = 1
        ORDER BY url, table_idx, cell_type, surface_form
    """
    exp = con.execute(sql).df().reset_index(drop=True)
    assert len(live) == len(exp)
    for col in ("url", "table_idx", "cell_type", "surface_form", "entity",
                "rel_rank", "n_candidates"):
        assert (live[col].astype(str) == exp[col].astype(str)).all(), col
    assert (live["aggregated_rank"] - exp["aggregated_rank"]).abs().max() == 0


def test_export_idempotent(export_paths):
    """A second ensure_export call reuses the completed directory."""
    fix, paths = export_paths
    from tabbyray.sti_export import ensure_export
    before = os.path.getmtime(paths["candidates"])
    again = ensure_export(fix)
    assert again == paths
    assert os.path.getmtime(paths["candidates"]) == before

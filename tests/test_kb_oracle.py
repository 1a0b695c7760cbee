"""SQL-oracle parity for the KB lookup stage itself (A1/A3/A5) — the
candidate-generation semantics that the rest of the STI oracle family
takes as given. Each test runs the registered driver query against its
DuckDB oracle re-derivation from kb.parquet alone
(`commands/SpreadsheetController.php:86-103`, `:378-383`, `:242-257`).
"""

import duckdb
import pandas as pd
import pytest


def _run(name: str):
    import __ray_entry__ as e
    got = e.queries()[name]("/root/testdata/sf0.001")
    try:
        import ray.data as rd
        if isinstance(got, rd.Dataset):
            got = got.to_pandas()
    except ImportError:
        pass
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    exp = duckdb.connect().execute(e.oracle_sql()[name]).df()
    return got, exp


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return (df.sort_values(list(df.columns), kind="stable")
              .reset_index(drop=True))


@pytest.mark.parametrize("name", ["sti_candidates", "sti_ner_rank",
                                  "sti_parent_classes", "sti_ctx_rank",
                                  "sti_rel_rank", "sti_heading_rank",
                                  "sti_sem_rank"])
def test_kb_lookup_oracle_parity(ray_session, name):
    got, exp = _run(name)
    assert len(got) == len(exp), name
    assert sorted(got.columns) == sorted(exp.columns), name
    g, x = _canon(got), _canon(exp)
    pd.testing.assert_frame_equal(g, x.astype(g.dtypes.to_dict()),
                                  check_like=True)


def test_candidate_limit_and_dedup(ray_session):
    """The LIMIT 100 applies to pre-dedup result rows and the dedup is
    order-preserving — spot-check invariants on the query output."""
    got, _ = _run("sti_candidates")
    per_norm = got.groupby("norm")["ord"]
    assert (per_norm.max() <= 99).all()
    # ord is a dense 0..k-1 sequence per norm
    assert (per_norm.max() + 1 == per_norm.count()).all()
    # dedup: no entity repeats within a norm
    assert not got.duplicated(["norm", "entity"]).any()

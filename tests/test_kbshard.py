"""Sharded-KB candidate generation (SURVEY.md §2.5 fallback): the
fan-out/gather path must be output-identical to the broadcast KBIndex
path on the conformance corpus."""

import os

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def corpus(ray_session):
    from tabbyray.fixtures import ensure_fixture
    return ensure_fixture("conformance", seed=7, n_pages=60, n_entities=800)


def test_sharded_equals_broadcast(corpus):
    import pyarrow.parquet as pq

    from tabbyray import pipeline
    from tabbyray.kb import load_kb
    from tabbyray.kbshard import ShardedKB

    kb = load_kb(os.path.join(corpus, "kb.parquet"))
    kb_ref, gaz_ref = pipeline.put_kb(kb)
    a = pipeline.kg_pipeline(
        os.path.join(corpus, "pages.parquet"), kb_ref, gaz_ref).to_pandas()

    skb = ShardedKB(pq.read_table(os.path.join(corpus, "kb.parquet")),
                    num_shards=4)
    b = pipeline.kg_pipeline_sharded(
        os.path.join(corpus, "pages.parquet"), skb, gaz_ref).to_pandas()

    key = list(a.columns)
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert len(a) > 500
    pd.testing.assert_frame_equal(a, b)


def test_sharded_candidates_match_kbindex(corpus, ray_session):
    """The merged candidate lists (order, LIMIT 100, dedup, typeless /
    class-exact quirks) must equal KBIndex.candidates verbatim."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from tabbyray.kb import KBIndex
    from tabbyray.kbshard import ShardedKB, sharded_candidate_payload

    table = pq.read_table(os.path.join(corpus, "kb.parquet"))
    kb = KBIndex(table)
    # probe a mix: exact labels, substring-only, misses, short (<3) forms
    probes = [u.rsplit("/", 1)[-1] for u in kb.uris[:40] if not u.endswith("/")]
    probes += ["Bor", "Q", "Zzzqqq", "Mar"]
    skb = ShardedKB(table, num_shards=3)
    payload = sharded_candidate_payload(
        rd.from_pandas(pd.DataFrame({"norm": probes})), skb).to_pandas()
    got = {}
    for norm, grp in payload.groupby("norm"):
        got[norm] = list(grp.sort_values("pos")["uri"])
    for p in probes:
        assert got.get(p, []) == kb.candidates(p), p

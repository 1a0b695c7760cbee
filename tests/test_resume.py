"""Lineage manifests + resume-from-last-completed-partition (north rule)."""

import glob
import json
import os
import shutil

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def sharded_input(ray_session, tmp_path_factory):
    """Split the smoke fixture pages into 4 parquet files."""
    import pyarrow.parquet as pq

    from tabbyray.fixtures import ensure_fixture

    path = ensure_fixture("smoke", seed=7, n_pages=30, n_entities=400)
    pages = pq.read_table(os.path.join(path, "pages.parquet"))
    d = str(tmp_path_factory.mktemp("pages_sharded"))
    n = 4
    step = (pages.num_rows + n - 1) // n
    for i in range(n):
        pq.write_table(pages.slice(i * step, step), os.path.join(d, f"part-{i:03d}.parquet"))
    return path, d


def _read_all(out_dir):
    import ray.data as rd
    frames = {}
    for kind in ("annotation", "row", "triple"):
        files = sorted(glob.glob(os.path.join(out_dir, "shard=*", f"kind={kind}", "*.parquet")))
        if files:
            df = rd.read_parquet(files).to_pandas()
            frames[kind] = df.sort_values(list(df.columns)).reset_index(drop=True)
    return frames


def test_resume_skips_completed_and_output_identical(sharded_input, tmp_path_factory):
    from tabbyray import lineage, pipeline
    from tabbyray.kb import load_kb

    fix, pages_dir = sharded_input
    kb = load_kb(os.path.join(fix, "kb.parquet"))
    kb_ref, gaz_ref = pipeline.put_kb(kb)

    out_full = str(tmp_path_factory.mktemp("out_full"))
    s1 = lineage.run_resumable(pages_dir, out_full, kb_ref, gaz_ref, num_shards=4)
    assert s1["shards_run"] == [0, 1, 2, 3]
    assert s1["row_counts"]["annotation"] > 0

    # simulate a killed run: shards 0-1 complete, 2-3 missing
    out_killed = str(tmp_path_factory.mktemp("out_killed"))
    shards = lineage.shard_inputs(pages_dir, 4)
    for i in (0, 1):
        lineage.run_shard(shards[i], i, out_killed, kb_ref, gaz_ref)
    # a half-written shard (no manifest) must be redone
    os.makedirs(os.path.join(out_killed, "shard=2.tmp"), exist_ok=True)

    s2 = lineage.run_resumable(pages_dir, out_killed, kb_ref, gaz_ref, num_shards=4)
    assert s2["shards_skipped"] == [0, 1]
    assert s2["shards_run"] == [2, 3]

    a, b = _read_all(out_full), _read_all(out_killed)
    assert set(a) == set(b)
    for kind in a:
        pd.testing.assert_frame_equal(a[kind], b[kind])

    # counters recomputable from manifests alone
    s3 = lineage.summarize(out_killed)
    assert s3["row_counts"] == s1["row_counts"]
    for mp in glob.glob(os.path.join(out_killed, "shard=*", "_MANIFEST.json")):
        with open(mp) as f:
            m = json.load(f)
        assert m["complete"] and m["row_counts"]


def test_canonicalize_resume_skips_and_identical(sharded_input, tmp_path_factory):
    """Kill mid-canonicalize -> rerun skips the finished rewrite shards
    (and the committed mapping) and the final output is identical."""
    import ray.data as rd

    from tabbyray import lineage, pipeline
    from tabbyray.kb import load_kb

    fix, pages_dir = sharded_input
    kb = load_kb(os.path.join(fix, "kb.parquet"))
    kb_ref, gaz_ref = pipeline.put_kb(kb)
    out = str(tmp_path_factory.mktemp("out_canon"))
    annotated = os.path.join(out, "annotated")
    lineage.run_resumable(pages_dir, annotated, kb_ref, gaz_ref, num_shards=4)

    canon = os.path.join(out, "canonical_triples")
    s1 = lineage.run_canonicalize_resumable(annotated, canon)
    assert s1["canonicalize_shards_run"] == [0, 1, 2, 3]
    assert s1["map_recomputed"] is True
    assert s1["canonical_rows"] > 0

    def read_canon():
        files = sorted(glob.glob(os.path.join(canon, "shard=*", "*.parquet")))
        df = rd.read_parquet(files).to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    full = read_canon()

    # simulate the kill: two rewrite shards gone, one half-written tmp
    shutil.rmtree(os.path.join(canon, "shard=2"))
    shutil.rmtree(os.path.join(canon, "shard=3"))
    os.makedirs(os.path.join(canon, "shard=3.tmp"), exist_ok=True)
    s2 = lineage.run_canonicalize_resumable(annotated, canon)
    assert s2["canonicalize_shards_skipped"] == [0, 1]
    assert s2["canonicalize_shards_run"] == [2, 3]
    assert s2["map_recomputed"] is False          # mapping manifest held
    pd.testing.assert_frame_equal(read_canon(), full)

    # nothing to do on a clean rerun
    s3 = lineage.run_canonicalize_resumable(annotated, canon)
    assert s3["canonicalize_shards_run"] == []
    assert s3["canonicalize_shards_skipped"] == [0, 1, 2, 3]

    # a changed annotated input invalidates the fingerprint: re-running
    # one annotated shard with different inputs forces map + shard redo
    shards = lineage.shard_inputs(pages_dir, 4)
    lineage.run_shard(shards[0] + shards[1], 0, annotated, kb_ref, gaz_ref)
    s4 = lineage.run_canonicalize_resumable(annotated, canon)
    assert s4["map_recomputed"] is True
    assert s4["canonicalize_shards_run"] == [0, 1, 2, 3]


@pytest.fixture(scope="module")
def crawl_sharded(ray_session, tmp_path_factory):
    """Split the crawl-capture fixture into 4 parquet files."""
    import pyarrow.parquet as pq

    from tabbyray.fixtures import ensure_crawl_fixture

    src = ensure_crawl_fixture()
    caps = pq.read_table(src)
    d = str(tmp_path_factory.mktemp("crawl_sharded"))
    n = 4
    step = (caps.num_rows + n - 1) // n
    for i in range(n):
        pq.write_table(caps.slice(i * step, step),
                       os.path.join(d, f"part-{i:03d}.parquet"))
    return d


def _read_curated(out_dir):
    import ray.data as rd
    files = sorted(glob.glob(os.path.join(out_dir, "curated", "bucket=*",
                                          "*.parquet")))
    df = rd.read_parquet(files).to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_crawl_staged_split_matches_single_stage(ray_session):
    """flags->finalize composed over a FORCED 2-way input split equals
    the one-shot curate_crawl relation (the associativity the
    resumable runner depends on)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from tabbyray.fixtures import (ensure_blocklist_fixture,
                                   ensure_crawl_fixture,
                                   ensure_robots_fixture)
    from tabbyray.ops.crawlpipe import (crawl_stage_finalize,
                                        crawl_stage_flags, curate_crawl)

    pages = rd.read_parquet(ensure_crawl_fixture(),
                            override_num_blocks=8)
    robots = rd.read_parquet(ensure_robots_fixture())
    bl = rd.read_parquet(ensure_blocklist_fixture())

    def half(parity):
        def f(t):
            import pyarrow as pa
            ln = pc.cast(pc.utf8_length(t.column("url")), pa.int64())
            return t.filter(pc.equal(pc.bit_wise_and(ln, 1),
                                     pa.scalar(parity, pa.int64())))
        return f

    parts = [pages.map_batches(half(p), batch_format="pyarrow")
             for p in (0, 1)]
    flags = [crawl_stage_flags(p, robots, bl, num_partitions=8)
             for p in parts]
    staged = crawl_stage_finalize(flags[0].union(flags[1]),
                                  num_partitions=8).to_pandas()
    single = curate_crawl(pages, robots, bl,
                          num_partitions=8).to_pandas()
    cols = list(single.columns)
    staged = staged.sort_values(cols).reset_index(drop=True)[cols]
    single = single.sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(staged, single)


def test_crawl_resume_skips_and_identical(crawl_sharded, tmp_path_factory):
    """run_crawl_resumable: a rerun skips every committed flags shard
    and the finalize; deleting one shard re-runs ONLY it; final output
    rows stay byte-identical throughout."""
    from tabbyray.fixtures import (ensure_blocklist_fixture,
                                   ensure_robots_fixture)
    from tabbyray.lineage import run_crawl_resumable

    out = str(tmp_path_factory.mktemp("crawl_out"))
    kw = dict(robots_path=ensure_robots_fixture(),
              blocklist_path=ensure_blocklist_fixture(),
              num_shards=2, buckets=4)
    s1 = run_crawl_resumable(crawl_sharded, out, **kw)
    assert s1["flags_shards_run"] == [0, 1]
    assert s1["finalize_recomputed"] is True
    assert s1["curated_docs"] == 89     # the oracled crawl_curated count
    first = _read_curated(out)

    s2 = run_crawl_resumable(crawl_sharded, out, **kw)
    assert s2["flags_shards_run"] == []
    assert s2["flags_shards_skipped"] == [0, 1]
    assert s2["finalize_recomputed"] is False
    pd.testing.assert_frame_equal(_read_curated(out), first)

    # simulate a kill that lost shard 1's commit
    shutil.rmtree(os.path.join(out, "_flags", "shard=1"))
    s3 = run_crawl_resumable(crawl_sharded, out, **kw)
    assert s3["flags_shards_run"] == [1]
    assert s3["flags_shards_skipped"] == [0]
    # the shard recompute is deterministic, so the content fingerprint
    # is reproduced and the committed finalize stays valid (no rework)
    assert s3["finalize_recomputed"] is False
    pd.testing.assert_frame_equal(_read_curated(out), first)

    # a CHANGED shard layout (3 shards over the same files) invalidates
    # the fingerprint and forces the finalize to recompute
    s4 = run_crawl_resumable(crawl_sharded, out,
                             robots_path=kw["robots_path"],
                             blocklist_path=kw["blocklist_path"],
                             num_shards=3, buckets=4)
    assert s4["finalize_recomputed"] is True
    pd.testing.assert_frame_equal(_read_curated(out), first)

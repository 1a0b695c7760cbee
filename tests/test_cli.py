"""CLI (`python -m tabbyray`) + N-Triples sink."""

import glob
import json
import os
import subprocess
import sys


def test_ntriples_lines(ray_session):
    import pandas as pd
    import ray.data as rd

    from tabbyray.io import to_ntriples_lines
    tri = pd.DataFrame({
        "subj": ["http://dbpedia.org/resource/Berlin"] * 2,
        "pred": ["http://dbpedia.org/property/Capital"] * 2,
        "obj": ["http://dbpedia.org/resource/Germany", 'say "hi"\n'],
        "obj_is_literal": [False, True],
    })
    lines = to_ntriples_lines(rd.from_pandas(tri)).to_pandas()["text"].tolist()
    assert lines[0] == ("<http://dbpedia.org/resource/Berlin> "
                        "<http://dbpedia.org/property/Capital> "
                        "<http://dbpedia.org/resource/Germany> .")
    assert lines[1].endswith('"say \\"hi\\"\\n" .')


def test_cli_end_to_end(smoke_fixture, tmp_path):
    out = str(tmp_path / "out")
    # subprocess owns its own Ray session (2 cpus to coexist with the
    # test session's)
    r = subprocess.run(
        [sys.executable, "-m", "tabbyray",
         "--pages", os.path.join(smoke_fixture, "pages.parquet"),
         "--kb", os.path.join(smoke_fixture, "kb.parquet"),
         "--out", out, "--shards", "2", "--canonicalize", "--ntriples",
         "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=dict(os.environ, RAY_ADDRESS="local"),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout[r.stdout.index("{"):])
    assert summary["row_counts"]["triple"] > 0
    assert os.path.exists(os.path.join(out, "annotated", "shard=0", "_MANIFEST.json"))
    assert glob.glob(os.path.join(out, "canonical_triples", "*.parquet"))
    nt_files = glob.glob(os.path.join(out, "ntriples", "*"))
    assert nt_files


def test_cli_curate(tmp_path):
    import pandas as pd
    docs = tmp_path / "docs.parquet"
    pd.DataFrame({
        "doc_id": range(40),
        "text": [f"document number {i} with several distinct tokens inside"
                 for i in range(40)],
    }).to_parquet(docs)
    out = str(tmp_path / "curated")
    r = subprocess.run(
        [sys.executable, "-m", "tabbyray", "curate",
         "--docs", str(docs), "--out", out, "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=dict(os.environ, RAY_ADDRESS="local"),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout[r.stdout.index("{"):])
    assert sum(summary["rows_per_split"].values()) == 40
    assert glob.glob(os.path.join(out, "split=*", "*.parquet"))

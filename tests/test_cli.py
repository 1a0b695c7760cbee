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
    assert glob.glob(os.path.join(out, "canonical_triples", "shard=*", "*.parquet"))
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


_RDFXML_GOLDEN = (
    '<?xml version="1.0"?>\r\n'
    "<rdf:RDF\r\n"
    '\txmlns      = "http://example.org/tabbyray#"\r\n'
    '\txml:base   = "http://example.org/tabbyray#"\r\n'
    '\txmlns:owl  = "http://www.w3.org/2002/07/owl#"\r\n'
    '\txmlns:rdf  = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"\r\n'
    '\txmlns:rdfs = "http://www.w3.org/2000/01/rdf-schema#"\r\n'
    '\txmlns:xsd  = "http://www.w3.org/2001/XMLSchema#"\r\n'
    '\txmlns:ns1  = "http://dbpedia.org/property/">\r\n'
    "\r\n"
    '\t<owl:Thing rdf:about="http://dbpedia.org/resource/Berlin">\r\n'
    '\t\t<ns1:Capital rdf:resource="http://dbpedia.org/resource/Germany"/>\r\n'
    "\t</owl:Thing>\r\n"
    '\t<owl:Thing rdf:about="http://dbpedia.org/resource/Berlin">\r\n'
    "\t\t<ns1:Motto>say &lt;hi&gt; &amp; bye</ns1:Motto>\r\n"
    "\t</owl:Thing>\r\n"
    "</rdf:RDF>"
)


def test_rdfxml_golden_and_wellformed(ray_session):
    """Golden-file check of the reference-shaped RDF/XML document
    (RDFCodeGenerator.php:133-141 header, :55 owl:Thing rows) with the
    reference's malformations fixed — so the output must ALSO parse."""
    import xml.etree.ElementTree as ET

    import pandas as pd
    import pyarrow as pa

    from tabbyray.io import rdfxml_document
    tri = pa.Table.from_pandas(pd.DataFrame({
        "subj": ["http://dbpedia.org/resource/Berlin"] * 2,
        "pred": ["http://dbpedia.org/property/Capital",
                 "http://dbpedia.org/property/Motto"],
        "obj": ["http://dbpedia.org/resource/Germany", "say <hi> & bye"],
        "obj_is_literal": [False, True],
    }), preserve_index=False)
    doc = rdfxml_document(tri)
    assert doc == _RDFXML_GOLDEN
    root = ET.fromstring(doc)     # well-formed (the reference's is not)
    assert root.tag == "{http://www.w3.org/1999/02/22-rdf-syntax-ns#}RDF"
    things = list(root)
    assert len(things) == 2
    lit = things[1][0]
    assert lit.text == "say <hi> & bye"


def test_write_rdfxml_sharded(ray_session, tmp_path):
    import glob as g
    import xml.etree.ElementTree as ET

    import pandas as pd
    import ray.data as rd

    from tabbyray.io import write_rdfxml
    tri = pd.DataFrame({
        "subj": [f"http://dbpedia.org/resource/E{i}" for i in range(10)],
        "pred": ["http://dbpedia.org/property/P"] * 10,
        "obj": [f"v{i}" for i in range(10)],
        "obj_is_literal": [True] * 10,
    })
    out = str(tmp_path / "rdfxml")
    write_rdfxml(rd.from_pandas(tri), out)
    files = g.glob(os.path.join(out, "part-*.rdf"))
    assert files
    n = 0
    for f in files:
        root = ET.parse(f).getroot()   # every shard standalone-parses
        n += len(list(root))
    assert n == 10


def test_cli_crawl(tmp_path):
    """`python -m tabbyray crawl` over the deterministic crawl fixture:
    the gated run matches the oracled crawl_curated count (89) and
    opening the robots/blocklist gates strictly widens the output."""
    from tabbyray.fixtures import (ensure_blocklist_fixture,
                                   ensure_crawl_fixture,
                                   ensure_robots_fixture)
    pages = ensure_crawl_fixture()
    robots = ensure_robots_fixture()
    bl = ensure_blocklist_fixture()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, RAY_ADDRESS="local")

    out1 = str(tmp_path / "gated")
    r = subprocess.run(
        [sys.executable, "-m", "tabbyray", "crawl", "--pages", pages,
         "--robots", robots, "--blocklist", bl, "--out", out1,
         "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300, cwd=repo, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    s1 = json.loads(r.stdout[r.stdout.index("{"):])
    assert s1["captures_in"] == 626 and s1["curated_docs"] == 89

    out2 = str(tmp_path / "open")
    r = subprocess.run(
        [sys.executable, "-m", "tabbyray", "crawl", "--pages", pages,
         "--out", out2, "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300, cwd=repo, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    s2 = json.loads(r.stdout[r.stdout.index("{"):])
    assert s2["curated_docs"] > s1["curated_docs"]


def test_cli_resolve_entities(smoke_fixture, tmp_path):
    """--resolve-entities: resolved_triples/ written, every rewritten
    subject maps to a lexicographically smaller URI, and the exported
    N-Triples use the CANONICAL subjects."""
    import pandas as pd

    out = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, "-m", "tabbyray",
         "--pages", os.path.join(smoke_fixture, "pages.parquet"),
         "--kb", os.path.join(smoke_fixture, "kb.parquet"),
         "--out", out, "--shards", "2", "--canonicalize", "--ntriples",
         "--resolve-entities", "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=dict(os.environ, RAY_ADDRESS="local"))
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout[r.stdout.index("{"):])
    res = pd.read_parquet(summary["resolved_triples_dir"])
    rew = res[res.subj != res.subj_raw]
    assert len(rew) == summary["resolved_subjects_rewritten"]
    assert (rew.subj < rew.subj_raw).all()
    # canonical triple count preserved by the rewrite
    canon = pd.read_parquet(glob.glob(os.path.join(
        summary["canonical_triples_dir"], "shard=*", "*.parquet")))
    assert len(res) == len(canon)
    # the .nt export carries canonical subjects only
    nt = ""
    for f in glob.glob(os.path.join(summary["ntriples_dir"], "*.nt")):
        nt += open(f).read()
    for raw in rew.subj_raw.unique():
        assert f"<{raw}>" not in nt


def test_cli_kgbuild(tmp_path):
    """kgbuild surface: sameAs-closed bucket-partitioned facts +
    functional-violation report; counts must match the library ops."""
    from tabbyray.fixtures import ensure_kg_mixed_fixture
    fix = ensure_kg_mixed_fixture()
    out = str(tmp_path / "kg")
    r = subprocess.run(
        [sys.executable, "-m", "tabbyray", "kgbuild",
         "--triples", fix, "--out", out,
         "--functional", "http://example.org/kg/p/locatedIn",
         "--buckets", "4", "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=dict(os.environ, RAY_ADDRESS="local"))
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["n_facts"] == 399          # == kg_sameas_closure oracle
    assert summary["n_violations"] == 8
    assert summary["stages_run"] == ["facts", "violations"]
    buckets = sorted(glob.glob(os.path.join(out, "facts", "bucket=*")))
    assert len(buckets) == 4
    # no sameAs survives; every alias subject was rewritten
    import pandas as pd
    facts = pd.concat([pd.read_parquet(b) for b in buckets])
    assert len(facts) == 399
    assert not facts["pred"].str.contains("sameAs").any()
    assert not facts["subj"].str.contains("-alias").any()
    assert not facts["obj"].str.contains("-alias").any()
    # resume: a re-submission skips every committed stage and reports
    # identical counts from the manifests alone
    r2 = subprocess.run(
        [sys.executable, "-m", "tabbyray", "kgbuild",
         "--triples", fix, "--out", out,
         "--functional", "http://example.org/kg/p/locatedIn",
         "--buckets", "4", "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=dict(os.environ, RAY_ADDRESS="local"))
    assert r2.returncode == 0, r2.stderr[-2000:]
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s2["stages_run"] == []
    assert sorted(s2["stages_skipped"]) == ["facts", "violations"]
    assert s2["n_facts"] == 399 and s2["n_violations"] == 8
    # a stage whose config changed (new functional pred) recomputes
    # ONLY itself
    r3 = subprocess.run(
        [sys.executable, "-m", "tabbyray", "kgbuild",
         "--triples", fix, "--out", out,
         "--functional", "http://example.org/kg/p/worksFor",
         "--buckets", "4", "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=dict(os.environ, RAY_ADDRESS="local"))
    assert r3.returncode == 0, r3.stderr[-2000:]
    s3 = json.loads(r3.stdout.strip().splitlines()[-1])
    assert s3["stages_run"] == ["violations"]
    assert s3["stages_skipped"] == ["facts"]


def test_ntriples_roundtrip_escapes(ray_session):
    import pandas as pd
    import ray.data as rd

    from tabbyray.io import parse_ntriples_lines, to_ntriples_lines
    tri = pd.DataFrame(
        [("http://e/s1", "http://e/p", 'quote " and \\ back', True),
         ("http://e/s2", "http://e/p", "tab\there\nnewline", True),
         ("http://e/s3", "http://e/p", "unicode é中", True),
         ("http://e/s4", "http://e/p", "http://e/o", False)],
        columns=["subj", "pred", "obj", "obj_is_literal"])
    lines = to_ntriples_lines(rd.from_pandas(tri))
    back = (parse_ntriples_lines(lines)
            .to_pandas()[["subj", "pred", "obj", "obj_is_literal"]]
            .sort_values("subj").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        back, tri.sort_values("subj").reset_index(drop=True))


def test_ntriples_parser_wider_grammar(ray_session):
    import pandas as pd
    import ray.data as rd

    from tabbyray.io import parse_ntriples_lines
    lines = rd.from_pandas(pd.DataFrame({"text": [
        "# a comment",
        "",
        '<http://e/s> <http://e/p> "hi"@en .',
        '<http://e/s> <http://e/p> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        "<http://e/s> <http://e/p> <http://e/o> .",
    ]}))
    got = parse_ntriples_lines(lines).to_pandas()
    assert len(got) == 3
    en = got[got.obj == "hi"].iloc[0]
    assert en.obj_lang == "en" and en.obj_is_literal
    num = got[got.obj == "42"].iloc[0]
    assert num.obj_datatype.endswith("#integer")
    iri = got[got.obj == "http://e/o"].iloc[0]
    assert not iri.obj_is_literal and iri.obj_lang is None


def test_ntriples_parser_strict_raises(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from tabbyray.io import parse_ntriples_lines
    bad = rd.from_pandas(pd.DataFrame({"text": ["not a triple"]}))
    with pytest.raises(Exception):
        parse_ntriples_lines(bad).to_pandas()
    ok = parse_ntriples_lines(bad, strict=False).to_pandas()
    assert len(ok) == 0

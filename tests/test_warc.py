"""WARC source/sink (tabbyray/warc.py): byte-exact roundtrip through
the Common-Crawl layout (one gzip member per record), streaming-parser
edge cases (records split across read chunks, multi-block yield,
uncompressed streams, truncation), and HTTP-envelope handling."""

import datetime
import gzip
import os
import shutil

import pytest
import ray.data as rd

from tabbyray.warc import (_WarcScanner, read_warc, warc_record_bytes,
                           write_warc)

OUT = "/tmp/tabbyray_test_warc"


def _pages(n=40):
    return rd.from_items([
        {"url": f"http://ex{i % 5}.org/p/{i}?x={i}",
         "warc_ts": datetime.datetime(2026, 1, 1 + i % 20, i % 24, 0, 0),
         "html": (f"<html><body>doc {i} é中</body></html>"
                  * (1 + i % 3)).encode(),
         "status": [200, 200, 301, 404][i % 4]}
        for i in range(n)]).repartition(4)


@pytest.fixture(scope="module")
def warc_dir(ray_session):
    shutil.rmtree(OUT, ignore_errors=True)
    write_warc(_pages(), OUT, status_col="status")
    yield OUT


def test_roundtrip_byte_exact(ray_session, warc_dir):
    got = (read_warc(warc_dir).to_pandas()
           .sort_values("url").reset_index(drop=True))
    want = _pages().to_pandas().sort_values("url").reset_index(drop=True)
    assert list(got.url) == list(want.url)
    assert [bytes(b) for b in got.html] == [bytes(b) for b in want.html]
    assert list(got.http_status) == [int(s) for s in want.status]
    assert list(got.warc_ts) == [
        v.strftime("%Y-%m-%dT%H:%M:%SZ") for v in want.warc_ts]
    assert set(got.rec_type) == {"response"}


def test_one_gzip_member_per_record(warc_dir):
    """Common Crawl layout: every record its own member, so a reader
    can split a shard at member boundaries."""
    fn = os.path.join(warc_dir, sorted(os.listdir(warc_dir))[0])
    raw = open(fn, "rb").read()
    import zlib
    members = 0
    while raw:
        d = zlib.decompressobj(wbits=31)
        body = d.decompress(raw)
        assert body.startswith(b"WARC/1.0\r\n")
        members += 1
        raw = d.unused_data
    assert members >= 2  # a 4-block write of 40 rows -> ~10 per shard


def test_scanner_chunk_split_invariance():
    """Feeding 1 byte at a time must parse identically to one shot —
    records straddle every possible chunk boundary."""
    recs = b"".join(
        warc_record_bytes(f"http://a/{i}", "2026-01-01T00:00:00Z",
                          f"body {i}".encode(), http_status=200)
        for i in range(5))
    one = _WarcScanner()
    got_one = [r for r in one.feed(recs)]
    one.finish()
    drip = _WarcScanner()
    got_drip = []
    for i in range(len(recs)):
        got_drip.extend(drip.feed(recs[i:i + 1]))
    drip.finish()
    assert got_one == got_drip
    assert [r["url"] for r in got_one] == [f"http://a/{i}" for i in range(5)]
    assert [r["html"] for r in got_one] == [
        f"body {i}".encode() for i in range(5)]


def test_uncompressed_warc(ray_session, tmp_path):
    recs = b"".join(
        warc_record_bytes(f"http://u/{i}", "2026-02-02T00:00:00Z",
                          f"plain {i}".encode())
        for i in range(7))
    p = tmp_path / "plain.warc"
    p.write_bytes(recs)
    got = read_warc(str(p)).to_pandas().sort_values("url")
    assert len(got) == 7
    assert bytes(got.html.iloc[0]) == b"plain 0"


def test_non_response_records_filtered(ray_session, tmp_path):
    blob = gzip.compress(
        warc_record_bytes("http://w/info", "2026-01-01T00:00:00Z",
                          b"software: tabbyray", rec_type="warcinfo"),
        mtime=0) + gzip.compress(
        warc_record_bytes("http://w/page", "2026-01-01T00:00:00Z",
                          b"<html>x</html>"), mtime=0)
    p = tmp_path / "mixed.warc.gz"
    p.write_bytes(blob)
    got = read_warc(str(p)).to_pandas()
    assert list(got.url) == ["http://w/page"]
    every = read_warc(str(p), record_types=None).to_pandas()
    assert sorted(every.rec_type) == ["response", "warcinfo"]
    # non-HTTP payload passes through raw, no status
    info = every[every.rec_type == "warcinfo"].iloc[0]
    assert bytes(info.html) == b"software: tabbyray"
    import pandas as pd
    assert pd.isna(info.http_status)


def test_truncated_stream_raises(ray_session, tmp_path):
    rec = warc_record_bytes("http://t/1", "2026-01-01T00:00:00Z",
                            b"full body here")
    p = tmp_path / "trunc.warc"
    p.write_bytes(rec[:-10])
    with pytest.raises(Exception, match="truncated"):
        read_warc(str(p)).materialize()


def test_block_bounding(ray_session, warc_dir):
    """target_block_bytes=1 forces one yielded block per record — the
    streaming path never waits for whole-file state."""
    ds = read_warc(warc_dir, target_block_bytes=1)
    assert ds.count() == 40
    # at the datasource level each flush holds exactly one row (Ray may
    # coalesce yielded tables into larger output blocks downstream)
    from tabbyray.warc import WarcDatasource
    fn = os.path.join(warc_dir, sorted(os.listdir(warc_dir))[0])
    src = WarcDatasource(fn, record_types=["response"],
                         target_block_bytes=1)
    import pyarrow.fs as pafs

    blocks = list(src._read_stream(
        pafs.LocalFileSystem().open_input_stream(fn, compression=None),
        fn))
    assert all(b.num_rows == 1 for b in blocks)
    assert sum(b.num_rows for b in blocks) >= 2


def test_write_idempotent(ray_session, tmp_path):
    out = str(tmp_path / "w2")
    write_warc(_pages(8), out, status_col="status")
    n1 = sorted(os.listdir(out))
    write_warc(_pages(8), out, status_col="status")
    assert sorted(os.listdir(out)) == n1  # content-addressed shards
    assert read_warc(out).count() == 8


def test_flagship_over_warc_ingest(ray_session, smoke_fixture):
    """End-to-end: pages.parquet -> WARC shards -> kg_pipeline over the
    WARC ingest path produces the IDENTICAL result set as the parquet
    path (url/html are the only columns the fused stage consumes)."""
    from tabbyray import pipeline
    from tabbyray.kb import load_kb

    out = "/tmp/tabbyray_test_warc_pages"
    shutil.rmtree(out, ignore_errors=True)
    pages_pq = os.path.join(smoke_fixture, "pages.parquet")
    src = rd.read_parquet(pages_pq, columns=["url", "html"])
    ts = src.map_batches(
        lambda t: t.append_column(
            "warc_ts", __import__("pyarrow").array(
                ["2026-03-01T00:00:00Z"] * t.num_rows)),
        batch_format="pyarrow")
    write_warc(ts, out)

    kb = load_kb(os.path.join(smoke_fixture, "kb.parquet"))
    kb_ref, gaz_ref = pipeline.put_kb(kb)
    a = pipeline.kg_pipeline(pages_pq, kb_ref, gaz_ref).to_pandas()
    b = pipeline.kg_pipeline(out, kb_ref, gaz_ref).to_pandas()
    key = list(a.columns)
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_warc_input_rejects_text_invariant(ray_session, tmp_path):
    from tabbyray import pipeline
    p = tmp_path / "x.warc.gz"
    p.write_bytes(gzip.compress(warc_record_bytes(
        "http://a/1", "2026-01-01T00:00:00Z", b"<html></html>"), mtime=0))
    with pytest.raises(ValueError, match="text column"):
        pipeline.read_pages(str(p), columns=["url", "html", "text"])


def test_mixed_input_list_raises(ray_session, tmp_path):
    """A [parquet, warc] list must raise, not silently route every
    element through the first element's reader; homogeneous lists of
    either format classify by content."""
    from tabbyray.pipeline import _is_warc_input
    pq_path = str(tmp_path / "a.parquet")
    warc_path = str(tmp_path / "b.warc.gz")
    assert _is_warc_input([warc_path, str(tmp_path / "c.warc")])
    assert not _is_warc_input([pq_path, str(tmp_path / "d.parquet")])
    assert not _is_warc_input([])
    with pytest.raises(ValueError, match="mixed input list"):
        _is_warc_input([pq_path, warc_path])
    # stray .tmp files next to real shards must not flip a directory
    d = tmp_path / "shards"
    d.mkdir()
    (d / "part-0.warc.gz.tmp").write_bytes(b"")
    assert not _is_warc_input(str(d))
    (d / "part-1.warc.gz").write_bytes(b"")
    assert _is_warc_input(str(d))

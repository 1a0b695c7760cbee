"""WARC (Web ARChive, ISO 28500) source + sink for Common-Crawl-style
page ingest.

The reference never reads the web at all — its input is XLSX files
dropped into ``web/dataset/`` (`commands/SpreadsheetController.php:522-538`).
This engine's input contract is a pages table ``(url, warc_ts, html,
text, lang)`` of Common-Crawl-style captures; WARC is the *native*
on-disk format of that corpus, so the engine grows a real WARC reader
and writer:

- ``read_warc(paths)`` — a streaming `FileBasedDatasource`: one read
  task per ``.warc.gz`` shard, gzip members decoded incrementally
  (Common Crawl compresses each record as its own gzip member so
  readers can split mid-file; we also accept one whole-file member and
  plain ``.warc``), records parsed as the stream decompresses and
  yielded in bounded-size Arrow blocks. NOTHING buffers the whole
  file: at 100 TB each ~1 GiB WARC shard streams through a fixed
  ~``target_block_bytes`` window.
- ``write_warc(pages, out_dir)`` — sharded sink: one
  ``part-*.warc.gz`` per input block, each record its own gzip member
  (the Common Crawl layout), response records carrying a minimal
  ``application/http;msgtype=response`` envelope so third-party WARC
  tooling accepts the output.

Parsed record schema: ``url:string, warc_ts:string (ISO-8601),
rec_type:string, http_status:int32, html:binary`` — feed into the
existing curation chain (``web_visible_text`` → ``lang_id`` → quality
gates) to produce the engine's canonical pages table.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import zlib
from typing import Iterator, List, Optional, Union

import pyarrow as pa
import ray.data as rd
from ray.data.datasource.file_based_datasource import FileBasedDatasource

_CRLF2 = b"\r\n\r\n"


# ---------------------------------------------------------------------------
# Record serialization (sink side)
# ---------------------------------------------------------------------------

def _record_id(url: str, ts: str) -> str:
    h = hashlib.md5(f"{url}\x00{ts}".encode("utf-8")).hexdigest()
    return (f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-"
            f"{h[20:32]}>")


def warc_record_bytes(url: str, ts: str, body: bytes,
                      http_status: int = 200,
                      rec_type: str = "response",
                      content_type: str = "text/html") -> bytes:
    """One WARC/1.0 record. ``response`` records wrap ``body`` in a
    minimal HTTP response envelope (status line + Content-Length), the
    layout Common Crawl response records use; other types carry the
    body raw."""
    if rec_type == "response":
        reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found",
                  500: "Internal Server Error"}.get(http_status, "Unknown")
        http = (f"HTTP/1.1 {http_status} {reason}\r\n"
                f"Content-Type: {content_type}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n").encode("ascii")
        payload = http + body
        block_type = 'application/http; msgtype=response'
    else:
        payload = body
        block_type = content_type
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {rec_type}\r\n"
        f"WARC-Record-ID: {_record_id(url, ts)}\r\n"
        f"WARC-Date: {ts}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"Content-Type: {block_type}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("utf-8")
    return head + payload + _CRLF2


def write_warc(pages: rd.Dataset, out_dir: str, *,
               url_col: str = "url", ts_col: str = "warc_ts",
               body_col: str = "html",
               status_col: Optional[str] = None) -> None:
    """Sharded WARC sink: one ``part-<md5>.warc.gz`` per input block,
    every record its own gzip member (Common Crawl layout — a reader
    can start at any member boundary). Shard names are
    content-addressed (md5 of the record-id list) so a re-run
    overwrites its own shard idempotently instead of duplicating."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "records": pa.array([], pa.int64())})
        urls = t.column(url_col).to_pylist()
        tss = [_ts_str(v) for v in t.column(ts_col).to_pylist()]
        bodies = t.column(body_col).to_pylist()
        stats = (t.column(status_col).to_pylist() if status_col
                 else [200] * t.num_rows)
        members = []
        for u, s, b, st in zip(urls, tss, bodies, stats):
            if isinstance(b, str):
                b = b.encode("utf-8")
            rec = warc_record_bytes(u, s, b or b"", http_status=int(st))
            # mtime=0 + fixed filename -> byte-deterministic shards
            members.append(gzip.compress(rec, mtime=0))
        blob = b"".join(members)
        name = hashlib.md5("\x00".join(
            f"{u}\x00{s}" for u, s in zip(urls, tss)).encode()).hexdigest()
        path = os.path.join(out_dir, f"part-{name}.warc.gz")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)  # atomic commit (lineage.py pattern)
        return pa.table({"path": pa.array([path]),
                         "records": pa.array([t.num_rows], pa.int64())})

    # materialize the tiny per-shard manifest rows (one per block)
    pages.map_batches(write_block, batch_format="pyarrow").materialize()


def _ts_str(v) -> str:
    """ISO-8601 Zulu string for a timestamp-ish value (pa timestamp ->
    datetime, or already a string)."""
    if isinstance(v, str):
        return v
    # datetime.datetime (pyarrow to_pylist for timestamp columns)
    return v.strftime("%Y-%m-%dT%H:%M:%SZ")


# ---------------------------------------------------------------------------
# Streaming parser (source side)
# ---------------------------------------------------------------------------

class _WarcScanner:
    """Incremental WARC parser over a byte stream. Feed decompressed
    chunks with ``feed()``; completed records pop out. Holds only the
    bytes of the record currently being assembled — bounded by the
    largest single record, never the file."""

    def __init__(self):
        self._buf = bytearray()
        self._need = None  # (header_dict, payload_len) once header parsed

    def feed(self, chunk: bytes) -> Iterator[dict]:
        self._buf += chunk
        while True:
            if self._need is None:
                # skip inter-record CRLFs
                while self._buf[:2] == b"\r\n":
                    del self._buf[:2]
                end = self._buf.find(_CRLF2)
                if end < 0:
                    return
                header = bytes(self._buf[:end])
                del self._buf[:end + 4]
                self._need = self._parse_header(header)
            hdr, plen = self._need
            if len(self._buf) < plen:
                return
            payload = bytes(self._buf[:plen])
            del self._buf[:plen]
            self._need = None
            yield self._to_record(hdr, payload)

    @staticmethod
    def _parse_header(header: bytes) -> tuple:
        lines = header.split(b"\r\n")
        if not lines or not lines[0].startswith(b"WARC/"):
            raise ValueError(
                f"malformed WARC record header: {lines[:1]!r}")
        hdr = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            hdr[k.strip().lower().decode("latin-1")] = \
                v.strip().decode("utf-8", "replace")
        return hdr, int(hdr.get("content-length", "0"))

    @staticmethod
    def _to_record(hdr: dict, payload: bytes) -> dict:
        rec_type = hdr.get("warc-type", "")
        status = None
        body = payload
        ctype = hdr.get("content-type", "")
        if "application/http" in ctype and payload[:5] == b"HTTP/":
            # strip the HTTP envelope: status line + headers
            split = payload.find(_CRLF2)
            if split >= 0:
                head = payload[:split]
                body = payload[split + 4:]
                first = head.split(b"\r\n", 1)[0].split(b" ")
                if len(first) >= 2 and first[1].isdigit():
                    status = int(first[1])
        return {
            "url": hdr.get("warc-target-uri", ""),
            "warc_ts": hdr.get("warc-date", ""),
            "rec_type": rec_type,
            "http_status": status,
            "html": body,
        }

    def finish(self) -> None:
        if self._need is not None or self._buf.strip(b"\r\n"):
            raise ValueError(
                f"truncated WARC stream: {len(self._buf)} bytes of an "
                "incomplete record at EOF")


class WarcDatasource(FileBasedDatasource):
    """Streaming WARC reader: decompresses gzip members incrementally
    (multi-member, single-member, or uncompressed streams all work) and
    yields Arrow blocks of parsed records every ``target_block_bytes``
    of payload — one read task per file shard, bounded memory per
    task."""

    # WARC/1.x only: legacy ARC files use a version-block header with
    # no 'WARC/' magic — advertising the extension would accept files
    # the parser then rejects with a confusing "malformed header"
    _FILE_EXTENSIONS = ["warc", "warc.gz"]

    def __init__(self, paths: Union[str, List[str]], *,
                 record_types: Optional[List[str]] = None,
                 target_block_bytes: int = 32 << 20,
                 read_chunk_bytes: int = 1 << 20,
                 **kwargs):
        super().__init__(paths, **kwargs)
        self._record_types = set(record_types) if record_types else None
        self._target_block_bytes = target_block_bytes
        self._read_chunk_bytes = read_chunk_bytes

    def _open_input_source(self, filesystem, path: str, **open_args):
        # Arrow's default path-based codec detection would transparently
        # gunzip ``.warc.gz`` — but its streaming decompressor's
        # multi-member behavior is not contractual, and Common Crawl
        # shards are one gzip member PER RECORD. Open raw; the scanner
        # owns decompression.
        open_args.pop("compression", None)
        buffer_size = (open_args.pop("buffer_size", None)
                       or self._data_context.streaming_read_buffer_size)
        # pyarrow defaults compression='detect' — force raw bytes
        return filesystem.open_input_stream(
            path, buffer_size=buffer_size, compression=None, **open_args)

    def _read_stream(self, f, path: str) -> Iterator[pa.Table]:
        scanner = _WarcScanner()
        rows: list = []
        pending = 0
        gz = path.endswith(".gz")
        decomp = zlib.decompressobj(wbits=31) if gz else None

        def flush() -> pa.Table:
            t = pa.table({
                "url": pa.array([r["url"] for r in rows], pa.string()),
                "warc_ts": pa.array([r["warc_ts"] for r in rows],
                                    pa.string()),
                "rec_type": pa.array([r["rec_type"] for r in rows],
                                     pa.string()),
                "http_status": pa.array([r["http_status"] for r in rows],
                                        pa.int32()),
                "html": pa.array([r["html"] for r in rows], pa.binary()),
            })
            rows.clear()
            return t

        while True:
            chunk = f.read(self._read_chunk_bytes)
            if not chunk:
                break
            if gz:
                data = b""
                # multi-member: drain unused_data into fresh objects
                while chunk:
                    data += decomp.decompress(chunk)
                    if decomp.eof:
                        chunk = decomp.unused_data
                        decomp = zlib.decompressobj(wbits=31)
                    else:
                        chunk = b""
            else:
                data = chunk
            for rec in scanner.feed(data):
                if (self._record_types is None
                        or rec["rec_type"] in self._record_types):
                    rows.append(rec)
                    pending += len(rec["html"]) + 64
                    if pending >= self._target_block_bytes:
                        pending = 0
                        yield flush()
        scanner.finish()
        if rows:
            yield flush()


def read_warc(paths: Union[str, List[str]], *,
              record_types: Optional[List[str]] = ("response",),
              target_block_bytes: int = 32 << 20,
              **kwargs) -> rd.Dataset:
    """Common-Crawl-style WARC ingest → Dataset of
    ``(url, warc_ts, rec_type, http_status, html)``. By default only
    ``response`` records surface (request/metadata/warcinfo are
    skipped at the parser, before any Arrow block is built)."""
    return rd.read_datasource(WarcDatasource(
        paths, record_types=list(record_types) if record_types else None,
        target_block_bytes=target_block_bytes, **kwargs))

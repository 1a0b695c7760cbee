"""Per-partition lineage manifests + resumable runner (north rule).

The input file list is split into ``num_shards`` deterministic shards;
each shard runs the full extract->annotate pipeline and writes

    out/annotated/shard=<i>/kind=<annotation|row|triple>/*.parquet
    out/annotated/shard=<i>/_MANIFEST.json

The manifest is committed atomically (write temp dir, ``os.rename``)
AFTER the shard's parquet is fully written, and records input
fragments, row counts per kind, G3 counters and wall time. A rerun
skips every shard whose manifest exists — that is what "a killed
``ray job submit`` resumes from the last completed partition" means
for a batch pipeline. Counters are recomputable from manifests alone.

The reference has no checkpointing at all (a crashed worker hangs its
polling barrier forever, `components/CanonicalTableAnnotator.php:925-949`);
this module is the from-scratch replacement demanded by the north rule.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
from typing import Optional

from . import pipeline as P
from .sti import Weights


def shard_inputs(pages_path: str, num_shards: int) -> list[list[str]]:
    """Deterministic round-robin of parquet files into shards. A
    directory input shards by file; a single file becomes one shard
    (row-range sharding would go here for monolithic inputs)."""
    if os.path.isdir(pages_path):
        files = sorted(glob.glob(os.path.join(pages_path, "*.parquet")))
        if not files:
            # WARC directory input (Common-Crawl shard layout)
            files = sorted(glob.glob(os.path.join(pages_path, "*.warc"))
                           + glob.glob(os.path.join(pages_path, "*.warc.gz")))
        if not files:
            raise FileNotFoundError(
                f"no *.parquet or *.warc[.gz] files found in pages "
                f"directory {pages_path!r}")
    else:
        files = [pages_path]
    num_shards = min(num_shards, len(files)) or 1
    shards: list[list[str]] = [[] for _ in range(num_shards)]
    for i, f in enumerate(files):
        shards[i % num_shards].append(f)
    return shards


def _manifest_path(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f"shard={shard}", "_MANIFEST.json")


def run_shard(files: list[str], shard: int, out_dir: str, kb_ref, gaz_ref,
              weights: Optional[Weights] = None,
              num_shards: Optional[int] = None, skb=None) -> dict:
    """Run one shard end-to-end and commit it atomically. ``skb``
    (a ``kbshard.ShardedKB``) switches candidate generation to the
    sharded fan-out path for KBs that exceed worker RAM."""
    import pyarrow.parquet as pq

    t0 = time.monotonic()
    final_dir = os.path.join(out_dir, f"shard={shard}")
    tmp_dir = final_dir + ".tmp"
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    if skb is not None:
        results = P.kg_pipeline_sharded(files, skb, gaz_ref, weights=weights)
    else:
        results = P.kg_pipeline(files, kb_ref, gaz_ref, weights=weights)
    # one pass, one write: kinds split into subdirectories
    results.write_parquet(tmp_dir, partition_cols=["kind"])
    # row counts from parquet FOOTER metadata — no second scan of the
    # data pages just to count what was written
    counts: dict[str, int] = {}
    for kind_dir in sorted(glob.glob(os.path.join(tmp_dir, "kind=*"))):
        kind = os.path.basename(kind_dir).split("=", 1)[1]
        counts[kind] = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(kind_dir, "*.parquet")))
    manifest = {
        "shard": shard,
        "num_shards": num_shards,
        "input_files": files,
        "row_counts": counts,
        "wall_sec": round(time.monotonic() - t0, 3),
        "complete": True,
    }
    with open(os.path.join(tmp_dir, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.rename(tmp_dir, final_dir)
    return manifest


def run_resumable(pages_path: str, out_dir: str, kb_ref, gaz_ref, *,
                  num_shards: int = 8, weights: Optional[Weights] = None,
                  skb=None) -> dict:
    """Process all shards, skipping the ones already committed.
    Returns the run summary (recomputed from manifests alone)."""
    os.makedirs(out_dir, exist_ok=True)
    shards = shard_inputs(pages_path, num_shards)
    # drop stale shard dirs from a previous run with a LARGER shard
    # count — they would double-count into summarize() and downstream
    # kind=*/ globs otherwise
    for stale in glob.glob(os.path.join(out_dir, "shard=*")):
        try:
            idx = int(os.path.basename(stale).split("=", 1)[1])
        except ValueError:
            continue
        if idx >= len(shards):
            shutil.rmtree(stale)
    skipped, ran = [], []
    for i, files in enumerate(shards):
        mp = _manifest_path(out_dir, i)
        if os.path.exists(mp):
            with open(mp) as f:
                m = json.load(f)
            if m.get("complete") and m.get("input_files") == files:
                skipped.append(i)
                continue
        run_shard(files, i, out_dir, kb_ref, gaz_ref, weights,
                  num_shards=len(shards), skb=skb)
        ran.append(i)
    return summarize(out_dir) | {"shards_run": ran, "shards_skipped": skipped}


def _annotated_fingerprint(annotated_dir: str) -> str:
    """Content key of the annotated stage's committed output: the
    sorted (shard, input_files, row_counts) tuples of every shard
    manifest. The annotated shards are deterministic in their inputs,
    so this fingerprints the triple stream the canonicalize stage
    consumes — a changed input set invalidates downstream manifests."""
    import hashlib
    parts = []
    for mp in sorted(glob.glob(os.path.join(annotated_dir, "shard=*",
                                            "_MANIFEST.json"))):
        with open(mp) as f:
            m = json.load(f)
        parts.append([m["shard"], m["input_files"], m["row_counts"]])
    return hashlib.md5(json.dumps(parts, sort_keys=True).encode()).hexdigest()


def run_canonicalize_resumable(annotated_dir: str, out_dir: str, *,
                               num_salt: int = 16,
                               mode: str = "auto") -> dict:
    """Resumable canonicalization over the committed annotated shards.

    Two checkpointed phases, both atomic (tmp dir + rename), both keyed
    on the annotated fingerprint:

    1. ``out/_map/`` — the global norm-key -> canonical-subject mapping
       (ONE salted shuffle over all triples). Recomputed only when the
       annotated output changed.
    2. ``out/shard=<i>/`` — the rewrite of shard i's triples against
       the committed mapping; embarrassingly parallel across shards, so
       a kill mid-canonicalize skips every finished shard on rerun and
       re-runs only the rest. Deterministic: the rerun output is
       byte-identical row content (tested in test_resume).
    """
    import ray.data as rd

    from . import pipeline as P
    from .canonicalize import canonical_map, rewrite_with_mapping

    os.makedirs(out_dir, exist_ok=True)
    fp = _annotated_fingerprint(annotated_dir)
    tri_cols = P.KIND_COLUMNS["triple"]

    # ---- phase 1: the global mapping --------------------------------
    map_dir = os.path.join(out_dir, "_map")
    map_manifest = os.path.join(map_dir, "_MANIFEST.json")
    map_fresh = False
    if os.path.exists(map_manifest):
        with open(map_manifest) as f:
            m = json.load(f)
        map_fresh = m.get("fingerprint") == fp and m.get("complete")
    if not map_fresh:
        all_tri_files = sorted(glob.glob(os.path.join(
            annotated_dir, "shard=*", "kind=triple", "*.parquet")))
        tri = rd.read_parquet(all_tri_files, columns=tri_cols)
        tmp = map_dir + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        mapping = canonical_map(tri, num_salt)
        mapping.write_parquet(tmp)
        with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
            json.dump({"fingerprint": fp, "complete": True,
                       "num_salt": num_salt}, f)
        if os.path.exists(map_dir):
            shutil.rmtree(map_dir)
        os.rename(tmp, map_dir)
    mapping = rd.read_parquet(sorted(glob.glob(
        os.path.join(map_dir, "*.parquet")))).materialize()

    # ---- phase 2: per-shard rewrite ---------------------------------
    import pyarrow.parquet as pq
    skipped, ran = [], []
    shard_dirs = sorted(
        glob.glob(os.path.join(annotated_dir, "shard=*")),
        key=lambda d: int(os.path.basename(d).split("=", 1)[1]))
    live = set()
    for sdir in shard_dirs:
        i = int(os.path.basename(sdir).split("=", 1)[1])
        live.add(i)
        files = sorted(glob.glob(os.path.join(sdir, "kind=triple",
                                              "*.parquet")))
        final = os.path.join(out_dir, f"shard={i}")
        mp = os.path.join(final, "_MANIFEST.json")
        if os.path.exists(mp):
            with open(mp) as f:
                m = json.load(f)
            if m.get("complete") and m.get("fingerprint") == fp:
                skipped.append(i)
                continue
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        tri_i = rd.read_parquet(files, columns=tri_cols)
        rewrite_with_mapping(tri_i, mapping, mode).write_parquet(tmp)
        rows = sum(pq.ParquetFile(f).metadata.num_rows
                   for f in glob.glob(os.path.join(tmp, "*.parquet")))
        with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
            json.dump({"shard": i, "fingerprint": fp, "rows": rows,
                       "complete": True}, f)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        ran.append(i)
    # drop canonical shards whose annotated shard no longer exists
    for stale in glob.glob(os.path.join(out_dir, "shard=*")):
        try:
            idx = int(os.path.basename(stale).split("=", 1)[1])
        except ValueError:
            continue
        if idx not in live:
            shutil.rmtree(stale)
    total = 0
    for mp in glob.glob(os.path.join(out_dir, "shard=*", "_MANIFEST.json")):
        with open(mp) as f:
            total += json.load(f).get("rows", 0)
    return {"canonical_rows": total, "canonicalize_shards_run": ran,
            "canonicalize_shards_skipped": skipped,
            "map_recomputed": not map_fresh}


def summarize(out_dir: str) -> dict:
    totals: dict[str, int] = {}
    shards = []
    for mp in sorted(glob.glob(os.path.join(out_dir, "shard=*", "_MANIFEST.json"))):
        with open(mp) as f:
            m = json.load(f)
        shards.append(m["shard"])
        for k, v in m["row_counts"].items():
            totals[k] = totals.get(k, 0) + v
    return {"shards_complete": shards, "row_counts": totals}


def _crawl_flags_fingerprint(flags_dir: str) -> str:
    """Content key of the committed flags stage (sorted manifest
    tuples) — a changed input set or shard layout invalidates the
    finalize stage's manifest downstream."""
    import hashlib
    parts = []
    for mp in sorted(glob.glob(os.path.join(flags_dir, "shard=*",
                                            "_MANIFEST.json"))):
        with open(mp) as f:
            m = json.load(f)
        parts.append([m["shard"], m["input_files"], m["rows"]])
    return hashlib.md5(json.dumps(parts, sort_keys=True).encode()).hexdigest()


def run_crawl_resumable(pages_path: str, out_dir: str, *,
                        robots_path: "str | None" = None,
                        blocklist_path: "str | None" = None,
                        num_shards: int = 8, buckets: int = 16) -> dict:
    """Resumable crawl curation (ops.crawlpipe staged split).

    Two checkpointed phases, both atomic (tmp dir + os.rename):

    1. ``out/_flags/shard=<i>/`` — the shard-associative stage
       (gates, shard-local recrawl collapse, extraction, quality
       flags) over shard i's input files; embarrassingly parallel, so
       a killed run skips every committed shard on re-submission.
    2. ``out/curated/bucket=<k>/`` — the cross-shard finalize (global
       latest-capture argmax, quality filter, exact-text dedup) over
       ALL committed flags, written hash-bucket-partitioned on
       clean_url; keyed on the flags fingerprint, so it recomputes
       only when the flags stage changed. Deterministic: a rerun's
       output is byte-identical row content.

    The reference has no crawl surface at all — this is the
    from-scratch ``ray job submit`` crawl-curation entrypoint the
    north rule's resumability clause demands, mirroring
    ``run_resumable``'s manifest contract."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from .ops.crawlpipe import (FLAGS_SCHEMA, crawl_stage_finalize,
                                crawl_stage_flags)

    def _side_tables():
        if robots_path:
            robots = rd.read_parquet(robots_path,
                                     columns=["host", "robots_txt"])
        else:
            robots = rd.from_arrow(pa.schema(
                [("host", pa.string()),
                 ("robots_txt", pa.string())]).empty_table())
        if blocklist_path:
            bl = rd.read_parquet(blocklist_path, columns=["domain"])
        else:
            bl = rd.from_arrow(
                pa.schema([("domain", pa.string())]).empty_table())
        return robots, bl

    os.makedirs(out_dir, exist_ok=True)
    flags_dir = os.path.join(out_dir, "_flags")
    os.makedirs(flags_dir, exist_ok=True)
    shards = shard_inputs(pages_path, num_shards)
    for stale in glob.glob(os.path.join(flags_dir, "shard=*")):
        try:
            idx = int(os.path.basename(stale).split("=", 1)[1])
        except ValueError:
            continue
        if idx >= len(shards):
            shutil.rmtree(stale)

    captures_in = sum(pq.ParquetFile(f).metadata.num_rows
                     for files in shards for f in files)
    skipped, ran = [], []
    for i, files in enumerate(shards):
        final = os.path.join(flags_dir, f"shard={i}")
        mp = os.path.join(final, "_MANIFEST.json")
        if os.path.exists(mp):
            with open(mp) as f:
                m = json.load(f)
            if m.get("complete") and m.get("input_files") == files:
                skipped.append(i)
                continue
        t0 = time.monotonic()
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        robots, bl = _side_tables()
        pages = rd.read_parquet(files,
                                columns=["url", "warc_ts", "html"])
        crawl_stage_flags(pages, robots, bl).write_parquet(tmp)
        rows = sum(pq.ParquetFile(f).metadata.num_rows
                   for f in glob.glob(os.path.join(tmp, "*.parquet")))
        with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
            json.dump({"shard": i, "input_files": files, "rows": rows,
                       "wall_sec": round(time.monotonic() - t0, 3),
                       "complete": True}, f, indent=1)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        ran.append(i)

    # ---- phase 2: cross-shard finalize ------------------------------
    fp = _crawl_flags_fingerprint(flags_dir)
    cur_dir = os.path.join(out_dir, "curated")
    cur_manifest = os.path.join(cur_dir, "_MANIFEST.json")
    fresh = False
    if os.path.exists(cur_manifest):
        with open(cur_manifest) as f:
            m = json.load(f)
        fresh = m.get("complete") and m.get("fingerprint") == fp
    if not fresh:
        tmp = cur_dir + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        flag_files = sorted(glob.glob(os.path.join(
            flags_dir, "shard=*", "*.parquet")))
        flagged = rd.read_parquet(flag_files,
                                  columns=FLAGS_SCHEMA.names)
        nb = buckets

        def add_bucket(t):
            b = [int.from_bytes(hashlib.md5(u.encode()).digest()[8:],
                                "little") % nb
                 for u in t.column("clean_url").to_pylist()]
            return t.append_column("bucket", pa.array(b, pa.int64()))

        # deterministic md5 buckets on the doc key: one directory per
        # bucket, so a failed 100-TB run can re-verify/redo buckets
        # independently instead of rewriting one giant output
        crawl_stage_finalize(flagged) \
            .map_batches(add_bucket, batch_format="pyarrow") \
            .write_parquet(tmp, partition_cols=["bucket"])
        rows = sum(pq.ParquetFile(f).metadata.num_rows
                   for f in glob.glob(os.path.join(tmp, "bucket=*",
                                                   "*.parquet")))
        with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
            json.dump({"fingerprint": fp, "rows": rows,
                       "buckets": nb, "complete": True}, f, indent=1)
        if os.path.exists(cur_dir):
            shutil.rmtree(cur_dir)
        os.rename(tmp, cur_dir)
    with open(cur_manifest) as f:
        curated_docs = json.load(f).get("rows", 0)
    return {"out": cur_dir, "captures_in": captures_in,
            "curated_docs": curated_docs, "buckets": buckets,
            "flags_shards_run": ran, "flags_shards_skipped": skipped,
            "finalize_recomputed": not fresh}

"""10x stress run of the flagship (VERDICT r3 #8): >= 2M pages through
extract -> annotate -> triples -> write, on BOTH KB paths (broadcast and
sharded fan-out), recording wall time, docs/s, per-stage ds.stats(),
block counts and object-store spill counters.

Input: 7 URL-disambiguated replicas of the deterministic 320k-page
bench fixture (vectorized pyarrow rewrite of the url column — the same
page/table distribution at 7x the volume; built once, cached). This
stresses throughput, memory and the 64-block read heuristic beyond the
320k scaling fixture without an hour of single-threaded fixture
generation.

Usage: python scripts/stress_flagship.py [broadcast|sharded|both]
Writes its JSON summary to /tmp/tabbyray_stress/summary_<path>.json.
"""

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = 7
STRESS_DIR = "/tmp/tabbyray_stress"
PAGES_DIR = os.path.join(STRESS_DIR, "pages")


def build_input() -> str:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from tabbyray.fixtures import ensure_fixture

    marker = os.path.join(PAGES_DIR, "_COMPLETE")
    if os.path.exists(marker):
        return PAGES_DIR
    fix = ensure_fixture("bench", seed=23, n_pages=320_000, n_entities=5000)
    parts = sorted(glob.glob(os.path.join(fix, "pages_parts", "*.parquet")))
    tmp = PAGES_DIR + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    for rep in range(REPLICAS):
        prefix = f"https://r{rep}."
        for i, p in enumerate(parts):
            t = pq.read_table(p)
            url = pc.replace_substring(t.column("url"), pattern="https://",
                                       replacement=prefix, max_replacements=1)
            t = t.set_column(t.column_names.index("url"), "url", url)
            pq.write_table(t, os.path.join(tmp, f"r{rep}-part-{i:04d}.parquet"))
    with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
        f.write("ok")
    shutil.rmtree(PAGES_DIR, ignore_errors=True)
    os.rename(tmp, PAGES_DIR)
    return PAGES_DIR


def spill_summary() -> str:
    try:
        from ray._private.internal_api import memory_summary
        txt = memory_summary(stats_only=True)
        return "\n".join(line for line in txt.splitlines()
                         if "Spill" in line or "Plasma" in line
                         or "objects" in line.lower())[:2000]
    except Exception as e:                      # pragma: no cover
        return f"unavailable: {e}"


def run(path_kind: str) -> dict:
    import ray
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    from tabbyray import pipeline
    from tabbyray.fixtures import ensure_fixture
    from tabbyray.kb import load_kb

    pages = build_input()
    n_files = len(glob.glob(os.path.join(pages, "*.parquet")))
    n_pages = 320_000 * REPLICAS
    fix = ensure_fixture("bench", seed=23, n_pages=320_000, n_entities=5000)
    kb = load_kb(os.path.join(fix, "kb.parquet"))
    kb_ref, gaz_ref = pipeline.put_kb(kb)

    out_dir = os.path.join(STRESS_DIR, f"out_{path_kind}")
    shutil.rmtree(out_dir, ignore_errors=True)

    t0 = time.monotonic()
    if path_kind == "sharded":
        from tabbyray.kbshard import ShardedKB
        skb = ShardedKB(pq.read_table(os.path.join(fix, "kb.parquet")),
                        num_shards=8)
        results = pipeline.kg_pipeline_sharded(pages, skb, gaz_ref)
    else:
        results = pipeline.kg_pipeline(pages, kb_ref, gaz_ref)
    results.write_parquet(out_dir, partition_cols=["kind"])
    wall = time.monotonic() - t0

    counts = {}
    for kind_dir in sorted(glob.glob(os.path.join(out_dir, "kind=*"))):
        kind = os.path.basename(kind_dir).split("=", 1)[1]
        counts[kind] = sum(pq.ParquetFile(f).metadata.num_rows
                           for f in glob.glob(os.path.join(kind_dir,
                                                           "*.parquet")))
    stats = ""
    try:
        stats = results.stats()
    except Exception as e:
        stats = f"stats unavailable: {e}"
    summary = {
        "path": path_kind,
        "num_cpus": num_cpus,
        "pages": n_pages,
        "input_files": n_files,
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_pages / wall, 1),
        "row_counts": counts,
        "spill": spill_summary(),
    }
    os.makedirs(STRESS_DIR, exist_ok=True)
    with open(os.path.join(STRESS_DIR, f"summary_{path_kind}.json"), "w") as f:
        json.dump(summary, f, indent=1)
    with open(os.path.join(STRESS_DIR, f"stats_{path_kind}.txt"), "w") as f:
        f.write(stats if isinstance(stats, str) else str(stats))
    ray.shutdown()
    return summary


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    kinds = ("broadcast", "sharded") if which == "both" else (which,)
    for k in kinds:
        s = run(k)
        print(json.dumps(s))

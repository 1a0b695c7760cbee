"""10x WARC-ingest stress (VERDICT r4 next-round #9): the 2.24M-page
flagship stress repeated through the streaming WARC source.

Reuses stress_flagship's 7x-replica 2,240,000-page input, converts it
once to sharded .warc.gz (one gzip member per record — the Common
Crawl split-anywhere layout), then runs the FULL flagship (extract ->
annotate -> triples) over BOTH ingest paths and asserts identical
per-kind row counts. Records wall time, docs/s and ingest throughput
to /tmp/tabbyray_stress/summary_warc10x.json.

Usage: python scripts/stress_warc_10x.py [num_cpus]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stress_flagship import STRESS_DIR, build_input  # noqa: E402

WARC_DIR = os.path.join(STRESS_DIR, "pages_warc")


def build_warc(pages_dir: str, num_cpus: int) -> str:
    import pyarrow as pa
    import ray.data as rd

    from tabbyray.warc import write_warc

    marker = WARC_DIR + ".done"
    if os.path.exists(marker):
        return WARC_DIR
    # a crashed earlier run may have left partial content-addressed
    # shards; read_warc globs every *.warc.gz, so stale shards would
    # inflate counts — start clean
    import shutil
    shutil.rmtree(WARC_DIR, ignore_errors=True)
    t0 = time.monotonic()
    src = rd.read_parquet(pages_dir, columns=["url", "html"])
    ts = src.map_batches(
        lambda t: t.append_column("warc_ts", pa.array(
            ["2026-03-01T00:00:00Z"] * t.num_rows)),
        batch_format="pyarrow")
    write_warc(ts, WARC_DIR)
    open(marker, "w").write("1")
    n_shards = len([f for f in os.listdir(WARC_DIR)
                    if f.endswith(".warc.gz")])
    print(f"warc write: {time.monotonic() - t0:.1f}s ({n_shards} shards)",
          flush=True)
    return WARC_DIR


def main():
    num_cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import pyarrow as pa

    from tabbyray import pipeline
    from tabbyray.fixtures import ensure_fixture
    from tabbyray.kb import load_kb
    from tabbyray.warc import read_warc

    pages_dir = build_input()
    warc_dir = build_warc(pages_dir, num_cpus)
    total_b = sum(os.path.getsize(os.path.join(warc_dir, f))
                  for f in os.listdir(warc_dir) if f.endswith(".warc.gz"))

    # raw ingest throughput over the full 2.24M-record corpus
    t0 = time.monotonic()
    n = read_warc(warc_dir).count()
    ingest_dt = time.monotonic() - t0
    print(f"ingest: {n:,} records in {ingest_dt:.1f}s = "
          f"{n / ingest_dt:,.0f} rec/s, "
          f"{total_b / ingest_dt / 1e6:.0f} MB(gz)/s", flush=True)

    fix = ensure_fixture("bench", seed=23, n_pages=320_000, n_entities=5000)
    kb = load_kb(os.path.join(fix, "kb.parquet"))
    kb_ref, gaz_ref = pipeline.put_kb(kb)

    def run(src, label):
        t0 = time.monotonic()
        res = pipeline.kg_pipeline(src, kb_ref, gaz_ref)
        counts = (res.map_batches(
            lambda t: pa.table({"kind": t.column("kind")}),
            batch_format="pyarrow")
            .groupby("kind").count().to_pandas())
        dt = time.monotonic() - t0
        out = dict(zip(counts["kind"], (int(x) for x in counts["count()"])))
        print(f"flagship over {label}: {dt:.1f}s ({n / dt:,.0f} docs/s) "
              f"counts={out}", flush=True)
        return out, dt

    a, dt_pq = run(pages_dir, "parquet")
    b, dt_warc = run(warc_dir, "warc")
    assert a == b, (a, b)
    print("IDENTICAL kind counts across ingest paths", flush=True)

    summary = {
        "n_pages": int(n),
        "warc_gz_bytes": int(total_b),
        "ingest_sec": round(ingest_dt, 1),
        "ingest_rec_per_s": round(n / ingest_dt),
        "flagship_parquet_sec": round(dt_pq, 1),
        "flagship_warc_sec": round(dt_warc, 1),
        "docs_per_sec_parquet": round(n / dt_pq),
        "docs_per_sec_warc": round(n / dt_warc),
        "kind_counts": a,
        "num_cpus": num_cpus,
    }
    os.makedirs(STRESS_DIR, exist_ok=True)
    with open(os.path.join(STRESS_DIR, "summary_warc10x.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()

"""WARC-ingest stress: headline-scale evidence for the streaming WARC
source (one read task per shard, incremental gzip-member decode).

Converts the bench pages fixture (default 20k pages, the sf0.1
headline size) to sharded .warc.gz, then times:
  1. raw ingest throughput (read_warc -> count + byte sum),
  2. the FULL flagship pipeline (extract -> annotate -> triples) over
     WARC input vs the same pages from parquet,
and asserts the two pipelines emit identical triple counts.

Usage: python scripts/stress_warc.py [n_pages] [num_cpus]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import pyarrow as pa
    import ray.data as rd

    from tabbyray import pipeline
    from tabbyray.fixtures import ensure_fixture
    from tabbyray.kb import load_kb
    from tabbyray.warc import read_warc, write_warc

    fix = ensure_fixture("driver", seed=11, n_pages=n_pages,
                         n_entities=1200)
    pages_pq = os.path.join(fix, "pages.parquet")
    warc_dir = f"/tmp/tabbyray_fixtures/warc-stress-{n_pages}"
    if not os.path.exists(warc_dir + ".done"):
        t0 = time.monotonic()
        src = rd.read_parquet(pages_pq, columns=["url", "html"],
                              override_num_blocks=64)
        ts = src.map_batches(
            lambda t: t.append_column("warc_ts", pa.array(
                ["2026-03-01T00:00:00Z"] * t.num_rows)),
            batch_format="pyarrow")
        write_warc(ts, warc_dir)
        open(warc_dir + ".done", "w").write("1")
        print(f"warc write: {time.monotonic() - t0:.1f}s "
              f"({len(os.listdir(warc_dir))} shards)")

    # 1. raw ingest
    t0 = time.monotonic()
    ds = read_warc(warc_dir)
    n = ds.count()
    dt = time.monotonic() - t0
    total_b = sum(os.path.getsize(os.path.join(warc_dir, f))
                  for f in os.listdir(warc_dir))
    print(f"ingest: {n} records in {dt:.1f}s = {n / dt:,.0f} rec/s, "
          f"{total_b / dt / 1e6:.0f} MB(gz)/s")

    kb = load_kb(os.path.join(fix, "kb.parquet"))
    kb_ref, gaz_ref = pipeline.put_kb(kb)

    def run(src_path, label):
        t0 = time.monotonic()
        res = pipeline.kg_pipeline(src_path, kb_ref, gaz_ref)
        counts = (res.map_batches(
            lambda t: pa.table({"kind": t.column("kind")}),
            batch_format="pyarrow")
            .groupby("kind").count().to_pandas())
        dt = time.monotonic() - t0
        print(f"flagship over {label}: {dt:.1f}s "
              f"({n_pages / dt:,.0f} docs/s) "
              f"counts={dict(zip(counts['kind'], counts['count()']))}")
        return dict(zip(counts["kind"], counts["count()"]))

    a = run(pages_pq, "parquet")
    b = run(warc_dir, "warc")
    assert a == b, (a, b)
    print("IDENTICAL kind counts across ingest paths")
    ray.shutdown()


if __name__ == "__main__":
    main()

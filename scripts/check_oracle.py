"""Driver-mimic: run every queries() entry and compare against its
oracle_sql() DuckDB result (row count + schema + order-insensitive
value hash). Usage: python scripts/check_oracle.py [sf_dir] [prefix...]
(optional prefixes restrict to queries whose name starts with one).
"""

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa
    try:
        import ray.data as rd
        if isinstance(res, rd.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == "float64":
            df[c] = df[c].round(9)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    # partition-shape stress knob: GRAFT_BLOCK_BYTES=32768 forces many
    # tiny blocks (catches one-sided-partition / empty-block bugs the
    # default block size hides — found the asof_join dtype bug in r2)
    blk = os.environ.get("GRAFT_BLOCK_BYTES")
    if blk:
        DataContext.get_current().target_max_block_size = int(blk)

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    prefixes = sys.argv[2:]
    if prefixes:
        qs = {n: f for n, f in qs.items()
              if any(n.startswith(p) for p in prefixes)}
    failures = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows ({dt:.1f}s) [rows-only]")
            if len(got) == 0 and name not in ("minhash_lsh_dedup",):
                print(f"      WARNING: {name} returned 0 rows")
            continue
        exp = con.execute(oracles[name]).df()
        ok_rows = len(got) == len(exp)
        ok_schema = sorted(got.columns) == sorted(exp.columns)
        ok_hash = ok_rows and ok_schema and value_hash(got) == value_hash(exp)
        status = "OK  " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status}  {name}: rows {len(got)}/{len(exp)} schema={ok_schema} "
              f"hash={ok_hash} ({dt:.1f}s)")
        if not ok_schema:
            print(f"      got {sorted(got.columns)} expected {sorted(exp.columns)}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

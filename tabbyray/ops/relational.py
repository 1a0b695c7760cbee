"""Relational helpers: grouped argmax (the distributed generalization of
the reference's per-cell winner selection C8), partial-aggregate
groupby (combiner-before-shuffle), normalized-key canonicalization
counts, and time-bucketed aggregation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..normalize import normalize_entry


def grouped_argmax(ds: rd.Dataset, key: str, order_col: str, tie_col: str,
                   out_cols: list[str]) -> rd.Dataset:
    """Top-1 row per key by (order_col desc, tie_col asc) — deterministic
    tie-break, like C8's insertion-order rule but made order-insensitive
    for distributed execution (SURVEY.md §7.4 item 3)."""
    def top1(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([order_col, tie_col], ascending=[False, True],
                          kind="stable")
        return g.head(1)[out_cols]
    return ds.groupby(key).map_groups(top1, batch_format="pandas")


def partial_agg_sum(ds: rd.Dataset, key: str, sum_cols: dict[str, str],
                    count_alias: str | None = None) -> rd.Dataset:
    """groupby(key) with per-batch pre-aggregation: each batch combines
    locally first, so the shuffle moves one row per (key, batch) instead
    of every input row (SURVEY.md §2.6 / ray_guide 'Aggregation at
    scale'). ``sum_cols``: {input_col: output_alias}."""
    from ray.data.aggregate import Sum

    in_cols = list(sum_cols)

    def partial(t: pa.Table) -> pa.Table:
        df = t.select([key] + in_cols).to_pandas()
        agg = {c: "sum" for c in in_cols}
        g = df.groupby(key, as_index=False).agg(agg)
        if count_alias:
            g[count_alias] = df.groupby(key, as_index=False).size()["size"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    aggs = [Sum(c, alias_name=alias) for c, alias in sum_cols.items()]
    if count_alias:
        aggs.append(Sum(count_alias, alias_name=count_alias))
    return partials.groupby(key).aggregate(*aggs)


def normalized_key_counts(ds: rd.Dataset, col: str, id_col: str) -> rd.Dataset:
    """Canonicalization-style groupby: normalize ``col`` with the M1
    parity function, count members and keep min(id) representative."""
    from ray.data.aggregate import Count, Min

    def add_norm(t: pa.Table) -> pa.Table:
        vals = [normalize_entry(v) for v in t.column(col).to_pylist()]
        return pa.table({"norm_key": pa.array(vals, pa.string()),
                         id_col: t.column(id_col)})

    return (ds.map_batches(add_norm, batch_format="pyarrow")
            .groupby("norm_key")
            .aggregate(Min(id_col, alias_name="rep_id"),
                       Count(alias_name="n_members")))


def hourly_user_agg(events: rd.Dataset) -> rd.Dataset:
    """Per (user_id, hour bucket): event count + value sum — the
    batch-engine rendering of a tumbling window (ray_guide
    'Streaming-shaped workloads')."""
    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["user_id", "ts", "value"]].copy()
        df["hour"] = df["ts"].dt.floor("h")
        return df.drop(columns=["ts"])

    from ray.data.aggregate import Count, Sum
    return (events.map_batches(add_bucket, batch_format="pandas")
            .groupby(["user_id", "hour"])
            .aggregate(Count(alias_name="n_events"),
                       Sum("value", alias_name="sum_value")))

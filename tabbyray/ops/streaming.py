"""Stream-shaped operators over an ordered, partitioned event log.

Ray Data is a batch engine with no watermarks; the reference is pure
batch too (SURVEY.md §2.9). These operators implement the standard
batch renderings of streaming constructs (ray_guide 'Streaming-shaped
workloads'): partition by key, sort by ts within the partition, window
with vectorized pandas. The ordering assumption — all events of one
key are co-partitioned and sorted by (ts, event_id) — is established
inside the operator itself, so input order never matters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .relational import _resolve_partitions


def round_half_away(s: pd.Series) -> pd.Series:
    """Round half AWAY from zero (SQL ``round`` semantics). pandas/numpy
    ``.round()`` rounds half to even, so ``0.125 * 100`` disagrees with
    the DuckDB oracle; this matches it exactly."""
    return np.sign(s) * np.floor(np.abs(s) + 0.5)


def sessionize(events: rd.Dataset, gap_minutes: int = 30,
               num_partitions: "int | None" = None) -> rd.Dataset:
    """Gap-based sessions per user.

    A new session starts when the gap to the previous event of the same
    user exceeds ``gap_minutes``. Output: (user_id, session_id [1-based
    per user in ts order], session_start, session_end, n_events,
    sum_value_cents). One hash shuffle on user_id; windowing is
    vectorized pandas per partition.
    """
    num_partitions = _resolve_partitions(num_partitions)
    gap = pd.Timedelta(minutes=gap_minutes)

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["user_id", "event_id", "ts", "value"]].copy()
        df["part"] = (pd.util.hash_pandas_object(df["user_id"], index=False)
                      % num_partitions).astype("int64")
        return df

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        prev_ts = g.groupby("user_id")["ts"].shift()
        new_session = (prev_ts.isna() | ((g["ts"] - prev_ts) > gap)).astype("int64")
        g = g.assign(session_id=new_session.groupby(g["user_id"]).cumsum())
        g = g.assign(value_cents=round_half_away(g["value"] * 100))
        out = g.groupby(["user_id", "session_id"], as_index=False).agg(
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("event_id", "size"),
            sum_value_cents=("value_cents", "sum"),
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out

    import pyarrow as pa

    from .relational import typed_groupby_map

    return typed_groupby_map(
        events.map_batches(add_part, batch_format="pandas"), "part", window,
        pa.schema([("user_id", pa.int64()), ("session_id", pa.int64()),
                   ("session_start", pa.timestamp("us")),
                   ("session_end", pa.timestamp("us")),
                   ("n_events", pa.int64()),
                   ("sum_value_cents", pa.float64())]))


def sliding_window_agg(events: rd.Dataset, window_minutes: int = 60,
                       slide_minutes: int = 15) -> rd.Dataset:
    """Sliding-window aggregate per user: for every
    ``slide``-aligned window start, count + cents-sum of the user's
    events with ``window_start <= ts < window_start + window``.

    Batch rendering of the sliding window: each event belongs to
    exactly ``window/slide`` windows, so a vectorized map EXPLODES it
    to those window starts (a per-event constant fan-out, no state),
    and one partitioned hash aggregate on (user_id, window_start)
    finishes — the combiner collapses the fan-out before the shuffle.
    ``window`` must be a multiple of ``slide``.
    """
    import pyarrow as pa

    from .relational import hash_aggregate

    if window_minutes % slide_minutes:
        raise ValueError("window must be a multiple of slide")
    n_windows = window_minutes // slide_minutes
    slide = pd.Timedelta(minutes=slide_minutes)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["user_id", "ts", "value"]].copy()
        df["bucket"] = df["ts"].dt.floor(f"{slide_minutes}min")
        df["cents"] = round_half_away(df["value"] * 100)
        out = pd.concat(
            [df.assign(window_start=df["bucket"] - i * slide)
             for i in range(n_windows)], ignore_index=True)
        return out[["user_id", "window_start", "cents"]]

    return hash_aggregate(
        events.map_batches(explode, batch_format="pandas"),
        ["user_id", "window_start"], {"cents": "sum_value_cents"},
        count_alias="n_events",
        out_schema=pa.schema([("user_id", pa.int64()),
                              ("window_start", pa.timestamp("us")),
                              ("sum_value_cents", pa.float64()),
                              ("n_events", pa.int64())]))


def windowed_cumsum(events: rd.Dataset,
                    num_partitions: "int | None" = None) -> rd.Dataset:
    """Running per-user total — the window-function construct
    ``sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id)``.

    One hash shuffle on user_id; ordering and the cumulative sum are
    vectorized pandas inside each partition. Values are summed as
    integer cents (half-away rounding), so the running total is exact
    and order-stable for the SQL oracle. Output: (event_id, user_id,
    cum_value_cents)."""
    num_partitions = _resolve_partitions(num_partitions)
    import pyarrow as pa

    from .relational import typed_groupby_map

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["user_id", "event_id", "ts", "value"]].copy()
        df["part"] = (pd.util.hash_pandas_object(df["user_id"], index=False)
                      % num_partitions).astype("int64")
        return df

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        cents = round_half_away(g["value"] * 100).astype("int64")
        out = g[["event_id", "user_id"]].copy()
        out["cum_value_cents"] = cents.groupby(g["user_id"]).cumsum()
        return out

    schema = pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                        ("cum_value_cents", pa.int64())])
    return typed_groupby_map(
        events.map_batches(add_part, batch_format="pandas"), "part", window,
        schema)


def event_interarrival(events: rd.Dataset,
                       num_partitions: "int | None" = None) -> rd.Dataset:
    """Per-user inter-arrival gaps — the window construct
    ``date_diff('microsecond', lag(ts) OVER (PARTITION BY user_id
    ORDER BY ts, event_id), ts)``, first event per user dropped (its
    lag is NULL). Gaps are exact integer MICROseconds (the column's
    native resolution — float seconds would round). One hash shuffle
    on user_id; the lag/diff is vectorized pandas inside each
    partition. Output: (event_id, user_id, gap_us)."""
    num_partitions = _resolve_partitions(num_partitions)
    import pyarrow as pa

    from .relational import typed_groupby_map

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["user_id", "event_id", "ts"]].copy()
        df["part"] = (pd.util.hash_pandas_object(df["user_id"], index=False)
                      % num_partitions).astype("int64")
        return df

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        prev = g.groupby("user_id")["ts"].shift(1)
        out = g[["event_id", "user_id"]].copy()
        out["gap_us"] = (g["ts"] - prev) // pd.Timedelta(1, "us")
        return out[prev.notna()].assign(
            gap_us=lambda d: d["gap_us"].astype("int64"))

    schema = pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                        ("gap_us", pa.int64())])
    return typed_groupby_map(
        events.map_batches(add_part, batch_format="pandas"), "part", window,
        schema)


def group_concat(events: rd.Dataset, key: str, value_col: str,
                 order_cols: list[str], sep: str = ",",
                 alias: str = "seq") -> rd.Dataset:
    """Ordered per-key concatenation — SQL ``string_agg(value, sep
    ORDER BY ...)`` — e.g. a user's event-type sequence for behavioral
    training data. One groupby shuffle on the key; the sort + join is
    vectorized pandas per group. (At 100 TB a single hot key's row set
    must fit a worker — same contract as any ordered string_agg.)"""
    import pyarrow as pa

    from .relational import typed_groupby_map

    def concat(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="stable")
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            alias: [sep.join(g[value_col].astype(str))]})

    return typed_groupby_map(
        events.select_columns([key, value_col] + order_cols), key, concat,
        pa.schema([(key, pa.int64()), (alias, pa.string())]))


def funnel_counts(events: rd.Dataset, steps: list[str],
                  num_partitions: "int | None" = None) -> rd.Dataset:
    """Ordered funnel analysis: for each step i, how many users reached
    it — i.e. have a strictly increasing ts chain event_type=steps[0]
    < ... < steps[i] (each step matched at its EARLIEST feasible ts,
    the standard unbounded-window funnel; greedy-earliest is optimal
    here, so it equals the existence semantics of the SQL oracle's
    nested min-ts CTEs).

    One hash shuffle on user_id; per-partition matching is vectorized
    pandas merges (one per step), then only (step_idx, partial count)
    rows — bounded by len(steps) × partitions — feed the final tiny
    aggregate. Output: (step_idx, step, n_users)."""
    num_partitions = _resolve_partitions(num_partitions)
    import pyarrow as pa

    from .relational import partial_agg_sum

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["user_id", "event_type", "ts"]]
        df = df[df["event_type"].isin(steps)].copy()
        df["part"] = (pd.util.hash_pandas_object(df["user_id"], index=False)
                      % num_partitions).astype("int64")
        return df

    def count_funnel(g: pd.DataFrame) -> pd.DataFrame:
        reached = []
        cur = (g[g["event_type"] == steps[0]]
               .groupby("user_id", as_index=False)["ts"].min()
               .rename(columns={"ts": "t"}))
        reached.append(len(cur))
        for step in steps[1:]:
            nxt = g[g["event_type"] == step].merge(cur, on="user_id")
            nxt = nxt[nxt["ts"] > nxt["t"]]
            cur = (nxt.groupby("user_id", as_index=False)["ts"].min()
                   .rename(columns={"ts": "t"}))
            reached.append(len(cur))
        return pd.DataFrame({
            "step_idx": np.arange(len(steps), dtype="int64"),
            "n_users": np.asarray(reached, dtype="int64")})

    from .relational import typed_groupby_map

    partials = typed_groupby_map(
        events.map_batches(add_part, batch_format="pandas"),
        "part", count_funnel,
        pa.schema([("step_idx", pa.int64()), ("n_users", pa.int64())]))
    totals = partial_agg_sum(partials, "step_idx", {"n_users": "n_users"})

    def label(t: "pa.Table") -> "pa.Table":
        idx = t.column("step_idx").to_pylist()
        return pa.table({"step_idx": t.column("step_idx"),
                         "step": pa.array([steps[i] for i in idx],
                                          pa.string()),
                         "n_users": t.column("n_users")})

    return totals.map_batches(label, batch_format="pyarrow")


def weekly_retention(events: rd.Dataset,
                     num_partitions: "int | None" = None) -> rd.Dataset:
    """Cohort retention: per calendar week (Monday-start, matching SQL
    ``date_trunc('week', ts)``), how many users were active, and how
    many of those were also active the NEXT week.

    Plan: per-batch distinct (user, week) combiner -> one user-hash
    shuffle -> per-user week sets answer membership of week+7d locally
    (a user's whole history is co-partitioned) -> bounded (week,
    counts) partials feed a tiny final aggregate. Output: (week,
    n_active, n_retained)."""
    num_partitions = _resolve_partitions(num_partitions)
    import pyarrow as pa

    from .relational import partial_agg_sum, typed_groupby_map

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["user_id", "ts"]].copy()
        df["week"] = df["ts"].dt.to_period("W-SUN").dt.start_time
        df = df[["user_id", "week"]].drop_duplicates()
        df["part"] = (pd.util.hash_pandas_object(df["user_id"],
                                                 index=False)
                      % num_partitions).astype("int64")
        return df

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["user_id", "week"]].drop_duplicates()
        nxt = g.copy()
        nxt["week"] = nxt["week"] - pd.Timedelta(days=7)
        nxt["ret"] = 1
        m = g.merge(nxt, on=["user_id", "week"], how="left")
        out = m.groupby("week", as_index=False).agg(
            n_active=("user_id", "size"), n_retained=("ret", "sum"))
        out["n_active"] = out["n_active"].astype("int64")
        out["n_retained"] = out["n_retained"].fillna(0).astype("int64")
        return out

    partials = typed_groupby_map(
        events.map_batches(add_part, batch_format="pandas"),
        "part", per_user,
        pa.schema([("week", pa.timestamp("us")),
                   ("n_active", pa.int64()),
                   ("n_retained", pa.int64())]))
    return partial_agg_sum(partials, "week",
                           {"n_active": "n_active",
                            "n_retained": "n_retained"})


def gap_filled_hourly_counts(events: rd.Dataset,
                             num_partitions: "int | None" = None) -> rd.Dataset:
    """Dense time series: events counted per (hour, event_type)
    INCLUDING empty grid cells (the densification a downstream
    forecaster/alerting join needs — absent hours must be explicit
    zeros, not missing rows).

    The count aggregate is the usual per-batch combiner + small
    groupby; the aggregate RESULT is bounded by hours × types (tiny
    even at petabyte row counts — ~10⁵ cells for a decade of hours),
    so the dense grid reindex runs on the driver over that bounded
    frame. Output: (hour, event_type, n)."""
    import pyarrow as pa

    from .relational import partial_agg_sum

    def add_hour(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "hour": df["ts"].dt.floor("h"),
            "event_type": df["event_type"]})
        out["one"] = np.int64(1)
        return out

    counts = partial_agg_sum(
        events.map_batches(add_hour, batch_format="pandas"),
        ["hour", "event_type"], {"one": "n"}).to_pandas()
    hours = pd.date_range(counts["hour"].min(), counts["hour"].max(),
                          freq="h")
    types = sorted(counts["event_type"].unique())
    grid = pd.MultiIndex.from_product(
        [hours, types], names=["hour", "event_type"]).to_frame(index=False)
    dense = grid.merge(counts, on=["hour", "event_type"], how="left")
    dense["n"] = dense["n"].fillna(0).astype("int64")
    return rd.from_pandas(dense)


def rolling_user_avg(events: rd.Dataset, window: int = 3,
                     num_partitions: "int | None" = None) -> rd.Dataset:
    """Per-user trailing moving average — the ROWS-frame window
    construct ``avg(cents) OVER (PARTITION BY user_id ORDER BY ts,
    event_id ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``.

    One hash shuffle on user_id; the frame is vectorized pandas
    ``rolling`` inside each partition. Values enter as exact integer
    cents (half-away rounding), so the windowed sums are exact in
    float64 and the avg division matches the oracle bit-for-bit.
    Output: (event_id, user_id, avg_cents)."""
    num_partitions = _resolve_partitions(num_partitions)
    import pyarrow as pa

    from .relational import typed_groupby_map

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["user_id", "event_id", "ts", "value"]].copy()
        df["part"] = (pd.util.hash_pandas_object(df["user_id"],
                                                 index=False)
                      % num_partitions).astype("int64")
        return df

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        cents = round_half_away(g["value"] * 100).astype("int64")
        avg = (cents.groupby(g["user_id"])
               .rolling(window, min_periods=1).mean()
               .reset_index(level=0, drop=True))
        out = g[["event_id", "user_id"]].copy()
        out["avg_cents"] = avg.astype("float64")
        return out

    schema = pa.schema([("event_id", pa.int64()),
                        ("user_id", pa.int64()),
                        ("avg_cents", pa.float64())])
    return typed_groupby_map(
        events.map_batches(add_part, batch_format="pandas"), "part",
        roll, schema)


def late_events(events: rd.Dataset, allowed_lateness_s: int = 3600,
                order_col: str = "event_id",
                num_partitions: "int | None" = None) -> rd.Dataset:
    """Event-time watermark check: in ARRIVAL order (``order_col``,
    ties broken by event_id — the ingest sequence, which at real
    ingest is reordered relative to event time), flag each event whose
    event time ``ts`` is older than the per-user watermark, i.e. the
    running max event time of everything that arrived BEFORE it, minus
    ``allowed_lateness_s``. The streaming-window admission rule (late
    data would be dropped or side-outputted); here the full ledger is
    emitted so the decision is auditable. One hash shuffle on user_id;
    running max is a vectorized in-partition cummax. Output:
    (event_id, user_id, late: int64 0/1, lag_s: whole seconds behind
    the watermark, 0 when on time or first arrival)."""
    num_partitions = _resolve_partitions(num_partitions)
    import pyarrow as pa

    from .relational import typed_groupby_map

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "event_id", "ts"]
        if order_col not in cols:
            cols.append(order_col)
        df = df[cols].copy()
        df["part"] = (pd.util.hash_pandas_object(df["user_id"], index=False)
                      % num_partitions).astype("int64")
        return df

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", order_col, "event_id"],
                          kind="stable")
        # normalize to int64 NANOseconds regardless of the parquet
        # resolution (pandas 2.x keeps us-resolution datetimes as-is)
        ts = g["ts"].astype("datetime64[ns]").astype("int64")
        prev_max = (ts.groupby(g["user_id"]).cummax()
                    .groupby(g["user_id"]).shift(1))
        wm = prev_max - allowed_lateness_s * 1_000_000_000
        lag_ns = (wm - ts).clip(lower=0).fillna(0)
        out = g[["event_id", "user_id"]].copy()
        out["late"] = (lag_ns > 0).astype("int64")
        out["lag_s"] = (lag_ns // 1_000_000_000).astype("int64")
        return out

    schema = pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                        ("late", pa.int64()), ("lag_s", pa.int64())])
    return typed_groupby_map(
        events.map_batches(add_part, batch_format="pandas"), "part", window,
        schema)


def interval_coalesce(intervals: rd.Dataset, key: str, lo_col: str,
                      hi_col: str,
                      num_partitions: "int | None" = None) -> rd.Dataset:
    """Gaps-and-islands: merge overlapping-or-touching [lo, hi]
    intervals per key into maximal spans (the validity-interval
    coalescing step of a temporal KG, or per-entity busy periods).
    Touching means lo == previous max hi — merged. One key-hash
    exchange; islands found by a vectorized running max per partition.
    lo/hi are integers (caller converts dates to epoch days/us).
    Output: (key, span_lo, span_hi, n_intervals)."""
    num_partitions = _resolve_partitions(num_partitions)
    import numpy as np
    import pyarrow as pa

    from .relational import typed_groupby_map

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[key, lo_col, hi_col]].copy()
        df["part"] = (pd.util.hash_pandas_object(df[key], index=False)
                      % num_partitions).astype("int64")
        return df

    def islands(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, lo_col, hi_col], kind="stable")
        hi = g[hi_col].astype("int64")
        lo = g[lo_col].astype("int64")
        pmax = hi.groupby(g[key]).cummax().groupby(g[key]).shift(1)
        new = (pmax.isna() | (lo > pmax)).astype("int64")
        island = new.groupby(g[key].to_numpy()).cumsum()
        out = (pd.DataFrame({key: g[key].to_numpy(),
                             "_i": island.to_numpy(),
                             "lo": lo.to_numpy(), "hi": hi.to_numpy()})
               .groupby([key, "_i"], as_index=False)
               .agg(span_lo=("lo", "min"), span_hi=("hi", "max"),
                    n_intervals=("lo", "size")))
        out["n_intervals"] = out["n_intervals"].astype("int64")
        return out[[key, "span_lo", "span_hi", "n_intervals"]]

    return typed_groupby_map(
        intervals.map_batches(add_part, batch_format="pandas"), "part",
        islands,
        pa.schema([(key, pa.int64()), ("span_lo", pa.int64()),
                   ("span_hi", pa.int64()), ("n_intervals", pa.int64())]))


def event_transitions(events: rd.Dataset,
                      num_partitions: "int | None" = None) -> rd.Dataset:
    """First-order Markov transition counts over per-user event
    streams: for each (prev_type -> type) pair, the global count —
    the session-model estimation step. One user-hash exchange; the lag
    is vectorized per partition; per-partition pair counts pre-combine
    before the tiny final aggregate. First event per user has no
    predecessor and contributes nothing.
    Output: (prev_type, event_type, n: int64)."""
    num_partitions = _resolve_partitions(num_partitions)
    import pyarrow as pa

    from .relational import partial_agg_sum, typed_groupby_map

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["user_id", "event_id", "ts", "event_type"]].copy()
        df["part"] = (pd.util.hash_pandas_object(df["user_id"], index=False)
                      % num_partitions).astype("int64")
        return df

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        prev = g.groupby("user_id")["event_type"].shift(1)
        out = pd.DataFrame({"prev_type": prev,
                            "event_type": g["event_type"]}).dropna()
        out = out.groupby(["prev_type", "event_type"],
                          as_index=False).size()
        out["one"] = out.pop("size").astype("int64")
        return out

    partials = typed_groupby_map(
        events.map_batches(add_part, batch_format="pandas"), "part", pairs,
        pa.schema([("prev_type", pa.string()),
                   ("event_type", pa.string()), ("one", pa.int64())]))
    return partial_agg_sum(partials, ["prev_type", "event_type"],
                           {"one": "n"})

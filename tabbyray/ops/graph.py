"""Graph operators over pair Datasets — the transitive-closure step a
dedup pipeline needs to turn near-dup PAIRS into CLUSTERS (one keeper
per connected component), and degree summaries for KG quality checks.

Connected components is iterative hash-min label propagation — the
standard distributed CC algorithm: every node starts labeled with its
own id; each round every node takes the min label over itself and its
neighbors; converged when no label changes (O(component diameter)
rounds). Each round is ONE co-partitioned hash join (edges x labels)
plus ONE min-aggregate — no driver-side graph, no adjacency
materialization. Label sums decrease strictly monotonically until the
fixpoint, so convergence is a cheap scalar aggregate, not a diff join.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

_LBL_SCHEMA = pa.schema([("node", pa.int64()), ("lbl", pa.int64())])


def _flat(arr) -> pa.Array:
    """Chunked or plain column -> one contiguous Array."""
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def connected_components(pairs: rd.Dataset, nodes: rd.Dataset,
                         pair_cols: tuple[str, str] = ("a", "b"),
                         node_col: str = "node",
                         max_iters: int = 50,
                         num_partitions: int = 32) -> rd.Dataset:
    """(node, component) for every node; component = min node id in the
    node's connected component (isolated nodes are their own
    singleton). ``pairs`` rows are undirected edges.

    Per-round label state is one row per node, re-materialized each
    round (bounded by node count; Ray spills to the object store — at
    extreme node counts checkpoint to parquet instead). The loop count
    is the graph diameter, which for near-dup clusters is tiny."""
    from ray.data.aggregate import Sum

    from .relational import hash_join

    ca, cb = pair_cols

    def sym(t: pa.Table) -> pa.Table:
        a = _flat(t.column(ca).cast(pa.int64()))
        b = _flat(t.column(cb).cast(pa.int64()))
        return pa.table({"src": pa.concat_arrays([a, b]),
                         "dst": pa.concat_arrays([b, a])})

    # self-loops carry each node's own label through the SAME join as
    # its neighbors' labels, so a round is one join + one min-aggregate
    # with no union operator (a labels/msgs union feeding the aggregate
    # sort wedged Ray's streaming executor on repeated rounds)
    def self_loops(t: pa.Table) -> pa.Table:
        n = _flat(t.column(node_col).cast(pa.int64()))
        return pa.table({"src": n, "dst": n})

    edges = (pairs.map_batches(sym, batch_format="pyarrow")
             .union(nodes.map_batches(self_loops, batch_format="pyarrow"))
             .materialize())
    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def init(t: pa.Table) -> pa.Table:
        n = t.column(node_col).cast(pa.int64())
        return pa.table({"node": n, "lbl": n})

    labels = nodes.map_batches(init, batch_format="pyarrow").materialize()

    def as_src(t: pa.Table) -> pa.Table:
        return t.rename_columns(["src", "lbl"])

    def msg_to_node(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("dst"), "lbl": t.column("lbl")})

    # the min-aggregate runs as a node-hash-partitioned plan (NOT the
    # native sort groupby) so the label state always lands in at most
    # ``num_partitions`` blocks: the union doubles block counts every
    # round otherwise (labels + msgs), and after k rounds the 2^k tiny
    # blocks drown the scheduler in per-task overhead
    def partial_min(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False)["lbl"].min()
        g["_part"] = (g["node"] % num_partitions).astype("int64")
        return g

    def final_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", as_index=False)["lbl"].min()

    from .relational import typed_groupby_map

    prev_sum = None
    for _ in range(max_iters):
        msgs = hash_join(
            edges,
            labels.map_batches(as_src, batch_format="pyarrow"),
            on="src", num_partitions=num_partitions,
            left_schema=edge_schema,
            right_schema=pa.schema([("src", pa.int64()),
                                    ("lbl", pa.int64())]),
        ).map_batches(msg_to_node, batch_format="pyarrow")
        new_labels = typed_groupby_map(
            msgs.map_batches(partial_min, batch_format="pandas"),
            "_part", final_min, _LBL_SCHEMA).materialize()
        total = new_labels.aggregate(Sum("lbl", alias_name="s"))["s"]
        labels = new_labels
        if prev_sum is not None and total == prev_sum:
            break
        prev_sum = total

    def out(t: pa.Table) -> pa.Table:
        return pa.table({node_col: t.column("node"),
                         "component": t.column("lbl")})

    return labels.map_batches(out, batch_format="pyarrow")


def degree_counts(pairs: rd.Dataset,
                  pair_cols: tuple[str, str] = ("a", "b")) -> rd.Dataset:
    """(node, degree) over an undirected pair Dataset — per-batch
    partial counts (combiner) before the small aggregate."""
    from ray.data.aggregate import Sum

    ca, cb = pair_cols

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        a = _flat(t.column(ca).cast(pa.int64()))
        b = _flat(t.column(cb).cast(pa.int64()))
        vc = pc.value_counts(pa.concat_arrays([a, b]))
        return pa.table({"node": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    return (pairs.map_batches(partial, batch_format="pyarrow")
            .groupby("node").aggregate(Sum("n", alias_name="degree")))


def cluster_representatives(components: rd.Dataset, meta: rd.Dataset,
                            node_col: str = "node",
                            comp_col: str = "component",
                            num_partitions: int = 8,
                            meta_schema=None) -> rd.Dataset:
    """Keep-one-per-cluster with size annotation — the dedup step after
    ``connected_components``. The representative of each cluster is its
    component id (= min member id by the CC convention); output is ONE
    row per cluster: (node_col = representative id, n_members, the
    representative's ``meta`` columns).

    Plan: one partitioned hash-aggregate counts members per component,
    then one co-partitioned ``hash_join`` attaches the representative's
    metadata — nothing corpus-sized touches the driver. Pass
    ``meta_schema`` when ``meta`` is a lazy transformed dataset (see
    ``hash_join``)."""
    from .relational import hash_aggregate, hash_join

    def ones(t: pa.Table) -> pa.Table:
        return pa.table({node_col: t.column(comp_col).cast(pa.int64()),
                         "n_members": pa.array([1] * t.num_rows, pa.int64())})

    sizes_schema = pa.schema([(node_col, pa.int64()),
                              ("n_members", pa.int64())])
    sizes = hash_aggregate(
        components.map_batches(ones, batch_format="pyarrow"),
        keys=[node_col], sum_cols={"n_members": "n_members"},
        num_partitions=num_partitions, out_schema=sizes_schema)
    return hash_join(sizes, meta, on=node_col,
                     num_partitions=num_partitions,
                     left_schema=sizes_schema, right_schema=meta_schema)

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
import pyarrow.compute as pc
import ray.data as rd

from .relational import _resolve_partitions

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
                         num_partitions: "int | None" = None) -> rd.Dataset:
    """(node, component) for every node; component = min node id in the
    node's connected component (isolated nodes are their own
    singleton). ``pairs`` rows are undirected edges.

    Per-round label state is one row per node, re-materialized each
    round (bounded by node count; Ray spills to the object store — at
    extreme node counts checkpoint to parquet instead). The loop count
    is the graph diameter, which for near-dup clusters is tiny."""
    num_partitions = _resolve_partitions(num_partitions)
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

    # _coalesced: sort-groupby/map_groups/union keep the INPUT block
    # count, so without bounding it the label state grows by
    # blocks(edges) every round and late rounds drown in per-task
    # scheduling (measured 80 s/round -> ~2 s/round at 4.5k edges)
    edges = _coalesced(
        pairs.map_batches(sym, batch_format="pyarrow")
        .union(nodes.map_batches(self_loops, batch_format="pyarrow")),
        num_partitions)
    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def init(t: pa.Table) -> pa.Table:
        n = t.column(node_col).cast(pa.int64())
        return pa.table({"node": n, "lbl": n})

    labels = _coalesced(
        nodes.map_batches(init, batch_format="pyarrow"),
        num_partitions)

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

    # convergence checksum: per-block WRAPPING int64 label sums (numpy
    # C semantics), wrapped again on the driver. Labels decrease
    # strictly monotonically, so consecutive-round equality of the
    # wrapped sum still detects the fixpoint — and unlike Ray's Sum
    # aggregate it cannot overflow-error when node ids are 63-bit
    # hashes (sum of n x 2^62 exceeds int64); the driver collects one
    # row per block, bounded by num_partitions
    import numpy as np

    def batch_sum(t: pa.Table) -> pa.Table:
        v = t.column("lbl").to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            s = np.add.reduce(v.astype(np.int64, copy=False))
        return pa.table({"s": pa.array([int(s)], pa.int64())})

    def wrapped_total(ds: rd.Dataset) -> int:
        rows = ds.map_batches(batch_sum, batch_format="pyarrow").take_all()
        parts = np.array([r["s"] for r in rows], dtype=np.int64)
        with np.errstate(over="ignore"):
            return int(np.add.reduce(parts)) if len(parts) else 0

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
        new_labels = _coalesced(
            typed_groupby_map(
                msgs.map_batches(partial_min, batch_format="pandas"),
                "_part", final_min, _LBL_SCHEMA),
            num_partitions)
        total = wrapped_total(new_labels)
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
                            num_partitions: "int | None" = None,
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


def pagerank(edges: rd.Dataset, n_iter: int = 3, damping: float = 0.85,
             src_col: str = "src", dst_col: str = "dst",
             num_partitions: "int | None" = None, mode: str = "auto",
             broadcast_max_nodes: int = 2_000_000,
             node_dtype: "pa.DataType | None" = None,
             weight_col: "str | None" = None,
             seeds: "list | None" = None) -> rd.Dataset:
    """Damped PageRank over a directed edge Dataset — the textbook
    no-dangling-redistribution variant: r0 = 1/N, then
    r_{k+1}(v) = (1−d)/N + d·Σ_{u→v} r_k(u)/outdeg(u).

    ``seeds`` switches to PERSONALIZED PageRank / TrustRank (Gyöngyi
    et al., VLDB'04): the teleport mass lands only on the seed set —
    p(v) = 1/|S| for v in seeds else 0, r0 = p, and the per-round
    base becomes (1−d)·p(v). Trust flows outward from the seeds, so
    low-rank nodes are link-distance-suspect (the spam-mass signal).
    ``seeds=None`` keeps every code path byte-identical to before the
    parameter existed; seeds absent from the graph's node set carry
    no rows (their teleport share vanishes — documented contract,
    matching the SQL oracle's nodes-join).

    ``weight_col`` switches to WEIGHTED PageRank: duplicate (src, dst)
    rows' weights are summed in the same dedup aggregate, out-degree
    becomes out-WEIGHT, and each edge contributes
    ``r(u) · w(u,v) / W_out(u)`` — evaluated in exactly that operation
    order on both plans so the SQL oracle (same expression) agrees
    bitwise before the 9-dp hash rounding. ``weight_col=None`` keeps
    every unweighted code path byte-identical to before the parameter
    existed (verified queries stay verified).

    Two execution plans (same auto-switch pattern as minhash verify /
    canonicalize rewrite):

    - ``mode="join"`` — the 100-TB path. Each iteration costs a
      CONSTANT number of exchanges regardless of graph size: one
      edges×ranks co-partitioned hash join (rank flows along edges),
      one dst-keyed combiner aggregate, one nodes left join (nodes
      with no inbound edges keep the (1−d)/N base mass). Rank state
      is one row per node, re-materialized per round so the lazy DAG
      never replays earlier rounds; edges/outdeg materialize once.
    - ``mode="broadcast"`` — when the NODE set (not the edge set) fits
      on the driver: the rank/outdeg vectors are broadcast via
      ``ray.put`` each round, contributions are per-batch combiner
      sums collected to the driver, so an iteration is ONE stateless
      edge scan with zero sort barriers (the 3 per-round barriers of
      the join path dominate wall time at toy scale and only amortize
      at real scale).

    ``mode="auto"`` picks broadcast when n_nodes <=
    broadcast_max_nodes (decided from the materialized edge count
    first — if the DISTINCT edge set itself is small enough to bound
    the per-batch degree partials, the node/outdeg derivation also
    skips its two aggregate barriers). Both paths evaluate the
    identical float expression per edge (sum ORDER differs, so results
    agree to float roundoff, which the 9-dp oracle hashing absorbs;
    the SQL oracle unrolls the same expression). Output: (node, r).

    ``node_dtype`` is the Arrow type of the node id columns (default
    int64; pass ``pa.string()`` for e.g. host-name graphs) — supplied
    explicitly so no lazy upstream plan has to execute just to probe
    the schema."""
    import numpy as np

    from .relational import hash_aggregate, hash_join, partial_agg_sum

    nd = node_dtype if node_dtype is not None else pa.int64()

    def as_edge_ones(t: pa.Table) -> pa.Table:
        n = len(t)
        w = (pa.array([1] * n, pa.int64()) if weight_col is None
             else _flat(t.column(weight_col)).cast(pa.int64()))
        return pa.table({"src": _flat(t.column(src_col)),
                         "dst": _flat(t.column(dst_col)),
                         "one": w})

    ded = hash_aggregate(
        edges.map_batches(as_edge_ones, batch_format="pyarrow"),
        keys=["src", "dst"], sum_cols={"one": "n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("src", nd), ("dst", nd),
                              ("n", pa.int64())]))
    if weight_col is None:
        ded = ded.select_columns(["src", "dst"])
    else:
        ded = ded.map_batches(
            lambda t: t.rename_columns(
                ["w" if c == "n" else c for c in t.column_names]),
            batch_format="pyarrow")
    ded = ded.materialize()
    n_edges = ded.count()

    seed_vals = sorted(set(seeds)) if seeds is not None else None

    def _iterate_broadcast(outdeg_pd: pd.Series,
                           nodes_np: np.ndarray) -> rd.Dataset:
        import ray

        n_nodes = len(nodes_np)
        if seed_vals is None:
            base = (1 - damping) / n_nodes
            r = pd.Series(1.0 / n_nodes, index=nodes_np)
        else:
            k = len(seed_vals)
            is_seed = pd.Index(nodes_np).isin(seed_vals)
            base = pd.Series(np.where(is_seed, (1 - damping) / k, 0.0),
                             index=nodes_np)
            r = pd.Series(np.where(is_seed, 1.0 / k, 0.0),
                          index=nodes_np)
        for _ in range(n_iter):
            if weight_col is None:
                ref = ray.put((r.loc[outdeg_pd.index]
                               / outdeg_pd).to_dict())
            else:
                # ship r and W_out separately: the weighted edge term
                # is r*w/W in THAT order (the oracle's expression)
                ref = ray.put((r.to_dict(), outdeg_pd.to_dict()))

            def contrib_bc(t: pa.Table) -> pa.Table:
                if t.num_rows == 0:
                    return pa.table({"dst": pa.array([], nd),
                                     "c": pa.array([], pa.float64())})
                m = ray.get(ref)
                df = t.to_pandas()
                if weight_col is None:
                    df["c"] = df["src"].map(m)
                else:
                    rmap, wmap = m
                    df["c"] = (df["src"].map(rmap) * df["w"]
                               / df["src"].map(wmap))
                g = df.groupby("dst", as_index=False)["c"].sum()
                return pa.Table.from_pandas(g, preserve_index=False)

            sums = (ded.map_batches(contrib_bc, batch_format="pyarrow")
                    .to_pandas().groupby("dst")["c"].sum())
            r = base + damping * sums.reindex(nodes_np, fill_value=0.0)
        return rd.from_pandas(
            pd.DataFrame({"node": nodes_np, "r": r.to_numpy()}))

    if mode != "join" and n_edges <= 2 * broadcast_max_nodes:
        # the distinct edge set is itself driver-bounded (known from
        # the materialized count), so node set and out-degrees come
        # from per-batch partials — zero further exchanges; ded rows
        # are distinct, so summing per-batch src counts is exact
        wcol = "dst" if weight_col is None else "w"
        wagg = "size" if weight_col is None else "sum"
        deg_parts = ded.map_batches(
            lambda t: pa.Table.from_pandas(
                t.to_pandas().groupby("src", as_index=False)
                .agg(outdeg=(wcol, wagg)), preserve_index=False),
            batch_format="pyarrow").to_pandas()
        outdeg_pd = deg_parts.groupby("src")["outdeg"].sum()
        node_parts = ded.map_batches(
            lambda t: pa.table({"node": pa.concat_arrays(
                [_flat(t.column("src")).cast(nd),
                 _flat(t.column("dst")).cast(nd)]).unique()}),
            batch_format="pyarrow").to_pandas()
        nodes_np = np.sort(node_parts["node"].unique())
        return _iterate_broadcast(outdeg_pd, nodes_np)

    def ones(col, out):
        def f(t: pa.Table) -> pa.Table:
            w = (pa.array([1] * len(t), pa.int64()) if weight_col is None
                 else _flat(t.column("w")))
            return pa.table({out: _flat(t.column(col)), "one": w})
        return f

    outdeg = partial_agg_sum(
        ded.map_batches(ones("src", "src"), batch_format="pyarrow"),
        "src", {"one": "outdeg"})
    nodes = hash_aggregate(
        ded.map_batches(ones("src", "node"), batch_format="pyarrow")
        .union(ded.map_batches(ones("dst", "node"),
                               batch_format="pyarrow")),
        keys=["node"], sum_cols={"one": "n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("node", nd), ("n", pa.int64())])
    ).select_columns(["node"]).materialize()
    n_nodes = nodes.count()

    if mode == "broadcast" or (mode == "auto"
                               and n_nodes <= broadcast_max_nodes):
        # edge-heavy but node-light: node count is known (distributed
        # count above), so these collects are bounded
        outdeg_pd = outdeg.to_pandas().set_index("src")["outdeg"]
        nodes_np = np.sort(nodes.to_pandas()["node"].to_numpy())
        return _iterate_broadcast(outdeg_pd, nodes_np)

    ded_schema = ([("src", nd), ("dst", nd)]
                  + ([("w", pa.int64())] if weight_col is not None else []))
    edges_deg = hash_join(
        ded, outdeg, on="src",
        left_schema=pa.schema(ded_schema),
        right_schema=pa.schema([("src", nd),
                                ("outdeg", pa.int64())])).materialize()

    base = (1 - damping) / n_nodes
    seed_arr = (pa.array(seed_vals, nd) if seed_vals is not None
                else None)

    def init(t: pa.Table) -> pa.Table:
        if seed_vals is None:
            r = pa.array([1.0 / n_nodes] * len(t), pa.float64())
        else:
            import pyarrow.compute as _pc
            m = _pc.is_in(_flat(t.column("node")), value_set=seed_arr)                 .to_numpy(zero_copy_only=False)
            r = pa.array(np.where(m, 1.0 / len(seed_vals), 0.0),
                         pa.float64())
        return pa.table({"node": _flat(t.column("node")), "r": r})

    ranks = nodes.map_batches(init, batch_format="pyarrow").materialize()
    rank_schema = pa.schema([("src", nd), ("r", pa.float64())])

    def rename(old: str, new: str):
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [new if c == old else c for c in t.column_names])
        return f

    for _ in range(n_iter):
        per_edge = hash_join(
            edges_deg,
            ranks.map_batches(rename("node", "src"),
                              batch_format="pyarrow"),
            on="src",
            left_schema=pa.schema(ded_schema + [("outdeg", pa.int64())]),
            right_schema=rank_schema)

        def contrib(t: pa.Table) -> pa.Table:
            r = _flat(t.column("r")).to_numpy(zero_copy_only=False)
            od = (_flat(t.column("outdeg"))
                  .to_numpy(zero_copy_only=False).astype(np.float64))
            if weight_col is None:
                c = r / od
            else:
                w = (_flat(t.column("w"))
                     .to_numpy(zero_copy_only=False).astype(np.float64))
                c = r * w / od
            return pa.table({"dst": _flat(t.column("dst")),
                             "c": pa.array(c, pa.float64())})

        sums = partial_agg_sum(
            per_edge.map_batches(contrib, batch_format="pyarrow"),
            "dst", {"c": "s"})
        joined = hash_join(
            nodes,
            sums.map_batches(rename("dst", "node"),
                             batch_format="pyarrow"),
            on="node", how="left",
            left_schema=pa.schema([("node", nd)]),
            right_schema=pa.schema([("node", nd),
                                    ("s", pa.float64())]))

        def apply(t: pa.Table) -> pa.Table:
            s = _flat(t.column("s")).to_numpy(zero_copy_only=False)
            s = np.nan_to_num(s, nan=0.0)
            if seed_vals is None:
                b = base
            else:
                import pyarrow.compute as _pc
                m = _pc.is_in(_flat(t.column("node")),
                              value_set=seed_arr)                     .to_numpy(zero_copy_only=False)
                b = np.where(m, (1 - damping) / len(seed_vals), 0.0)
            return pa.table({"node": _flat(t.column("node")),
                             "r": pa.array(b + damping * s,
                                           pa.float64())})

        ranks = joined.map_batches(apply,
                                   batch_format="pyarrow").materialize()

    return ranks


def hits(edges: rd.Dataset, n_iter: int = 3,
         src_col: str = "src", dst_col: str = "dst",
         num_partitions: "int | None" = None, mode: str = "auto",
         broadcast_max_nodes: int = 2_000_000,
         node_dtype: "pa.DataType | None" = None,
         weight_col: "str | None" = None) -> rd.Dataset:
    """HITS hubs & authorities (Kleinberg 1999) over a directed edge
    Dataset. Documented iteration (the SQL oracle unrolls the exact
    same float expressions): edges dedupe first; h0 = 1/N over ALL
    nodes; per round, a_raw(v) = Σ_{u→v} h(u), a = a_raw / Σ a_raw
    (L1 — no sqrt, so both engines evaluate identical arithmetic),
    then h_raw(u) = Σ_{u→v} a(v) from the NEW authorities,
    h = h_raw / Σ h_raw. Nodes without inbound (resp. outbound) edges
    get authority (resp. hub) 0. Output: (node, auth, hub).

    Execution mirrors :func:`pagerank`'s two plans and auto-switch:

    - ``join`` — the 100-TB path: per half-round ONE edges×scores
      co-partitioned hash join + one combiner aggregate + one nodes
      left join; the L1 total is a Dataset.sum() scalar reduce over
      the MATERIALIZED raw scores (one float per node crosses that
      tree-reduce, nothing else collects).
    - ``broadcast`` — taken when the DISTINCT edge set is
      driver-bounded (decided from the materialized dedup count, as in
      pagerank): score vectors ship via ray.put each half-round, edges
      stream through stateless per-batch combiner sums.

    Sum order differs between paths/engines; agreement is to float
    roundoff, absorbed by the oracle's 9-dp hashing.

    ``weight_col`` switches to WEIGHTED HITS: duplicate-edge weights
    sum in the dedup aggregate and every push becomes Σ score·w
    (evaluated as ``x * w`` per edge — the oracle's op order — on both
    plans); ``None`` keeps the unweighted paths byte-identical."""
    import numpy as np

    from .relational import hash_aggregate, hash_join, partial_agg_sum

    nd = node_dtype if node_dtype is not None else pa.int64()

    def as_edge_ones(t: pa.Table) -> pa.Table:
        w = (pa.array([1] * len(t), pa.int64()) if weight_col is None
             else _flat(t.column(weight_col)).cast(pa.int64()))
        return pa.table({"src": _flat(t.column(src_col)),
                         "dst": _flat(t.column(dst_col)),
                         "one": w})

    ded = hash_aggregate(
        edges.map_batches(as_edge_ones, batch_format="pyarrow"),
        keys=["src", "dst"], sum_cols={"one": "n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("src", nd), ("dst", nd),
                              ("n", pa.int64())]))
    if weight_col is None:
        ded = ded.select_columns(["src", "dst"])
    else:
        ded = ded.map_batches(
            lambda t: t.rename_columns(
                ["w" if c == "n" else c for c in t.column_names]),
            batch_format="pyarrow")
    ded = ded.materialize()
    n_edges = ded.count()
    if n_edges == 0:
        return rd.from_arrow(pa.schema(
            [("node", nd), ("auth", pa.float64()),
             ("hub", pa.float64())]).empty_table())

    if mode != "join" and n_edges <= 2 * broadcast_max_nodes:
        import ray

        node_parts = ded.map_batches(
            lambda t: pa.table({"node": pa.concat_arrays(
                [_flat(t.column("src")).cast(nd),
                 _flat(t.column("dst")).cast(nd)]).unique()}),
            batch_format="pyarrow").to_pandas()
        nodes_np = np.sort(node_parts["node"].unique())
        n_nodes = len(nodes_np)
        h = pd.Series(1.0 / n_nodes, index=nodes_np)
        a = pd.Series(0.0, index=nodes_np)

        def push(vec: pd.Series, key_in: str, key_out: str) -> pd.Series:
            """Σ over edges of vec[key_in], grouped by key_out —
            distributed per-batch combiner, bounded collect (the
            broadcast arm only runs when ded itself is bounded)."""
            ref = ray.put(vec.to_dict())

            def contrib(t: pa.Table) -> pa.Table:
                if t.num_rows == 0:
                    return pa.table({"node": pa.array([], nd),
                                     "s": pa.array([], pa.float64())})
                m = ray.get(ref)
                df = t.to_pandas()
                if weight_col is None:
                    df["s"] = df[key_in].map(m)
                else:
                    df["s"] = df[key_in].map(m) * df["w"]
                g = (df.groupby(key_out, as_index=False)["s"].sum()
                     .rename(columns={key_out: "node"}))
                return pa.Table.from_pandas(g, preserve_index=False)

            return (ded.map_batches(contrib, batch_format="pyarrow")
                    .to_pandas().groupby("node")["s"].sum())

        for _ in range(n_iter):
            a_raw = push(h, "src", "dst").reindex(nodes_np,
                                                  fill_value=0.0)
            tot = float(a_raw.sum())
            a = a_raw / tot if tot > 0 else a_raw
            h_raw = push(a, "dst", "src").reindex(nodes_np,
                                                  fill_value=0.0)
            tot = float(h_raw.sum())
            h = h_raw / tot if tot > 0 else h_raw
        return rd.from_pandas(pd.DataFrame(
            {"node": nodes_np, "auth": a.to_numpy(),
             "hub": h.to_numpy()}))

    def ones(col, out):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({out: _flat(t.column(col)),
                             "one": pa.array([1] * len(t), pa.int64())})
        return f

    nodes = hash_aggregate(
        ded.map_batches(ones("src", "node"), batch_format="pyarrow")
        .union(ded.map_batches(ones("dst", "node"),
                               batch_format="pyarrow")),
        keys=["node"], sum_cols={"one": "n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("node", nd), ("n", pa.int64())])
    ).select_columns(["node"]).materialize()
    n_nodes = nodes.count()

    def rename(old: str, new: str):
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [new if c == old else c for c in t.column_names])
        return f

    score_schema_src = pa.schema([("src", nd), ("x", pa.float64())])
    score_schema_dst = pa.schema([("dst", nd), ("x", pa.float64())])
    edge_schema = pa.schema(
        [("src", nd), ("dst", nd)]
        + ([("w", pa.int64())] if weight_col is not None else []))

    def half_round(scores: rd.Dataset, key_in: str,
                   key_out: str) -> rd.Dataset:
        """scores (node, x) -> normalized pushed scores (node, x):
        join on key_in, combiner-sum on key_out, L1 normalize, left
        join back to the full node set with 0 fill."""
        per_edge = hash_join(
            ded,
            scores.map_batches(rename("node", key_in),
                               batch_format="pyarrow"),
            on=key_in, left_schema=edge_schema,
            right_schema=(score_schema_src if key_in == "src"
                          else score_schema_dst),
            num_partitions=num_partitions)
        def edge_s(t: pa.Table) -> pa.Table:
            x = _flat(t.column("x"))
            if weight_col is not None:
                import pyarrow.compute as pc
                x = pc.multiply(pc.cast(x, pa.float64()),
                                pc.cast(_flat(t.column("w")),
                                        pa.float64()))
            return pa.table({key_out: _flat(t.column(key_out)),
                             "s": x})

        raw = partial_agg_sum(
            per_edge.map_batches(edge_s, batch_format="pyarrow"),
            key_out, {"s": "s"}).materialize()
        tot = raw.sum("s") or 0.0
        joined = hash_join(
            nodes,
            raw.map_batches(rename(key_out, "node"),
                            batch_format="pyarrow"),
            on="node", how="left",
            left_schema=pa.schema([("node", nd)]),
            right_schema=pa.schema([("node", nd),
                                    ("s", pa.float64())]),
            num_partitions=num_partitions)

        def norm(t: pa.Table) -> pa.Table:
            s = _flat(t.column("s")).to_numpy(zero_copy_only=False)
            s = np.nan_to_num(s, nan=0.0)
            if tot > 0:
                s = s / tot
            return pa.table({"node": _flat(t.column("node")),
                             "x": pa.array(s, pa.float64())})

        return joined.map_batches(norm,
                                  batch_format="pyarrow").materialize()

    hubs = nodes.map_batches(
        lambda t: pa.table({"node": _flat(t.column("node")),
                            "x": pa.array([1.0 / n_nodes] * len(t),
                                          pa.float64())}),
        batch_format="pyarrow").materialize()
    auths = None
    for _ in range(n_iter):
        auths = half_round(hubs, "src", "dst")
        hubs = half_round(auths, "dst", "src")

    out = hash_join(
        auths.map_batches(rename("x", "auth"), batch_format="pyarrow"),
        hubs.map_batches(rename("x", "hub"), batch_format="pyarrow"),
        on="node",
        left_schema=pa.schema([("node", nd), ("auth", pa.float64())]),
        right_schema=pa.schema([("node", nd), ("hub", pa.float64())]),
        num_partitions=num_partitions)
    return out


def _sized_partitions(n_rows: int, requested: int,
                      rows_per_partition: int = 50_000) -> int:
    """Bound an exchange's partition count by DATA size, capped at the
    requested (cluster-derived) width: auto_partitions() picks 2x the
    cluster CPUs, which is right for real data but makes a 1,700-edge
    toy graph pay 64-task fixed costs at every one of a chain's 8
    barriers (measured: host triangles 51s -> ~8s at 32 cpus from this
    resize alone). At scale rows/50k exceeds the cap and the requested
    width wins."""
    import math
    return max(1, min(requested, math.ceil(max(1, n_rows)
                                           / rows_per_partition)))


def _coalesced(ds: rd.Dataset, num_partitions: int) -> rd.Dataset:
    """Materialize and bound the BLOCK count at ``num_partitions`` with
    a shuffle-free repartition (local split/merge, no exchange).

    Ray's sort-based groupby/map_groups keeps the INPUT block count, so
    a 64-block toy read stays 64 tiny blocks through every exchange —
    and a multi-join chain (triangles: 8 exchanges) then pays per-task
    scheduling on 128-block unions at every stage (measured 201s -> 16s
    on the 2k-page host graph from this one change). At scale blocks
    are full-size and the coalesce is a no-op pass-through."""
    ds = ds.materialize()
    if ds.num_blocks() > num_partitions:
        ds = ds.repartition(num_partitions, shuffle=False).materialize()
    return ds


def undirected_edges(edges: rd.Dataset,
                     pair_cols: tuple[str, str] = ("src", "dst"),
                     node_dtype: "pa.DataType | None" = None,
                     num_partitions: "int | None" = None) -> rd.Dataset:
    """Canonical undirected edge set: drop self-loops and nulls, order
    each pair as (a, b) with a < b (element-wise min/max — works for
    string and integer node ids), then distinct via one combiner-backed
    hash exchange on the pair. Output schema: (a, b)."""
    import pyarrow.compute as pc

    from .relational import hash_aggregate

    nd = node_dtype or pa.string()
    ca, cb = pair_cols

    def canon(t: pa.Table) -> pa.Table:
        a = pc.cast(_flat(t.column(ca)), nd)
        b = pc.cast(_flat(t.column(cb)), nd)
        keep = pc.and_(pc.and_(pc.is_valid(a), pc.is_valid(b)),
                       pc.not_equal(a, b))
        a, b = a.filter(keep), b.filter(keep)
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        out = pa.table({"a": lo, "b": hi,
                        "one": pa.array([1] * len(lo), pa.int64())})
        # batch-local dedup so the exchange moves distinct pairs/batch
        return out.group_by(["a", "b"]).aggregate([("one", "min")]) \
                  .rename_columns(["a", "b", "one"])

    pairs = edges.map_batches(canon, batch_format="pyarrow")
    out = hash_aggregate(
        pairs, keys=["a", "b"], sum_cols={"one": "_c"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("a", nd), ("b", nd), ("_c", pa.int64())]))
    return out.drop_columns(["_c"])


def _edge_degrees(e: rd.Dataset, nd: "pa.DataType") -> rd.Dataset:
    """(node, deg) over an (a, b) undirected distinct edge set — one
    combiner-backed count aggregate over the exploded endpoints."""
    from .relational import partial_agg_sum

    def explode(t: pa.Table) -> pa.Table:
        a = _flat(t.column("a"))
        b = _flat(t.column("b"))
        return pa.table({"node": pa.concat_arrays([a, b]),
                         "one": pa.array([1] * (2 * t.num_rows),
                                         pa.int64())})

    return partial_agg_sum(e.map_batches(explode, batch_format="pyarrow"),
                           "node", {"one": "deg"})


def _closed_wedges(e: rd.Dataset, deg: rd.Dataset, nd: "pa.DataType",
                   num_partitions: int) -> rd.Dataset:
    """(x, y, pivot) — one row per TRIANGLE of the undirected distinct
    edge set ``e``, found exactly once via degree-ordered orientation
    (see :func:`triangle_counts` for the plan narrative). ``deg`` is
    the (node, deg) table over ``e``. Shared by triangle counting and
    k-truss support."""
    import pyarrow.compute as pc

    from .relational import hash_join

    e_schema = pa.schema([("a", nd), ("b", nd)])

    def rename(m: dict[str, str]):
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns([m.get(c, c) for c in t.column_names])
        return f

    ja = hash_join(
        e, deg.map_batches(rename({"node": "a", "deg": "deg_a"}),
                           batch_format="pyarrow"),
        on="a", left_schema=e_schema,
        right_schema=pa.schema([("a", nd), ("deg_a", pa.int64())]),
        num_partitions=num_partitions)
    jb = hash_join(
        ja, deg.map_batches(rename({"node": "b", "deg": "deg_b"}),
                            batch_format="pyarrow"),
        on="b",
        left_schema=pa.schema([("a", nd), ("b", nd),
                               ("deg_a", pa.int64())]),
        right_schema=pa.schema([("b", nd), ("deg_b", pa.int64())]),
        num_partitions=num_partitions)

    def orient(t: pa.Table) -> pa.Table:
        a, b = _flat(t.column("a")), _flat(t.column("b"))
        da = _flat(t.column("deg_a"))
        db = _flat(t.column("deg_b"))
        # a-first iff (deg_a, a) < (deg_b, b); a != b so the tuple
        # order is total
        first = pc.or_(pc.less(da, db),
                       pc.and_(pc.equal(da, db), pc.less(a, b)))
        return pa.table({"u": pc.if_else(first, a, b),
                         "v": pc.if_else(first, b, a),
                         "deg_v": pc.if_else(first, db, da)})

    oriented = _coalesced(jb.map_batches(orient, batch_format="pyarrow"),
                          num_partitions)

    # wedge generation: self-join on the pivot u; both neighbors sit
    # ABOVE u in rank order, the candidate closing edge is oriented by
    # THEIR (deg, id) rank — same total order, so one filter suffices
    wedges = hash_join(
        oriented.map_batches(rename({"v": "x", "deg_v": "deg_x"}),
                             batch_format="pyarrow"),
        oriented.map_batches(rename({"v": "y", "deg_v": "deg_y"}),
                             batch_format="pyarrow"),
        on="u",
        left_schema=pa.schema([("u", nd), ("x", nd),
                               ("deg_x", pa.int64())]),
        right_schema=pa.schema([("u", nd), ("y", nd),
                                ("deg_y", pa.int64())]),
        num_partitions=num_partitions)

    def rank_filter(t: pa.Table) -> pa.Table:
        dx, dy = _flat(t.column("deg_x")), _flat(t.column("deg_y"))
        x, y = _flat(t.column("x")), _flat(t.column("y"))
        keep = pc.or_(pc.less(dx, dy),
                      pc.and_(pc.equal(dx, dy), pc.less(x, y)))
        return pa.table({"x": x.filter(keep), "y": y.filter(keep),
                         "pivot": _flat(t.column("u")).filter(keep)})

    cand = wedges.map_batches(rank_filter, batch_format="pyarrow")
    return hash_join(
        cand,
        oriented.map_batches(
            lambda t: pa.table({"x": _flat(t.column("u")),
                                "y": _flat(t.column("v"))}),
            batch_format="pyarrow"),
        on=["x", "y"], how="semi",
        left_schema=pa.schema([("x", nd), ("y", nd), ("pivot", nd)]),
        right_schema=pa.schema([("x", nd), ("y", nd)]),
        num_partitions=num_partitions)


def triangle_counts(edges: rd.Dataset,
                    pair_cols: tuple[str, str] = ("src", "dst"),
                    node_dtype: "pa.DataType | None" = None,
                    num_partitions: "int | None" = None) -> rd.Dataset:
    """Per-node triangle counts via DEGREE-ORDERED edge orientation —
    the standard distributed triangle algorithm (Suri & Vassilvitskii,
    WWW'11 "Counting Triangles and the Curse of the Last Reducer"):
    orient every undirected edge from its lower-(deg, id) endpoint to
    the higher one, so each node's oriented out-degree is O(sqrt(m))
    and the wedge self-join materializes O(m^1.5) candidate pairs
    TOTAL regardless of hub skew (an unordered wedge join on a
    degree-d hub would emit d^2 rows — at web scale the host graph has
    multi-million-degree hubs, which is exactly the 'last reducer'
    this orientation kills).

    Plan: undirected distinct edge set -> degree aggregate -> two
    co-partitioned joins attach endpoint degrees -> vectorized orient
    -> SELF-join oriented edges on the pivot (wedge generation) ->
    rank-order filter -> SEMI-join candidate pairs against the
    oriented edge set (each survivor is one triangle, found exactly
    once) -> explode its 3 corners -> count aggregate -> left join
    back onto the full node set (0-fill). Output: (node, n_triangles)
    for EVERY node in the edge set. No driver-side state beyond plan
    scalars."""
    import numpy as np
    import pyarrow.compute as pc

    from .relational import hash_join, partial_agg_sum

    nd = node_dtype or pa.string()
    num_partitions = _resolve_partitions(num_partitions)
    e = _coalesced(undirected_edges(edges, pair_cols, nd, num_partitions),
                   num_partitions)
    num_partitions = _sized_partitions(e.count(), num_partitions)
    e = _coalesced(e, num_partitions)
    deg = _coalesced(_edge_degrees(e, nd), num_partitions)
    deg_schema = pa.schema([("node", nd), ("deg", pa.int64())])
    e_schema = pa.schema([("a", nd), ("b", nd)])

    closed = _closed_wedges(e, deg, nd, num_partitions)

    def corners(t: pa.Table) -> pa.Table:
        xs = _flat(t.column("x"))
        ys = _flat(t.column("y"))
        ps = _flat(t.column("pivot"))
        return pa.table({"node": pa.concat_arrays([xs, ys, ps]),
                         "one": pa.array([1] * (3 * t.num_rows),
                                         pa.int64())})

    cnt = partial_agg_sum(closed.map_batches(corners,
                                             batch_format="pyarrow"),
                          "node", {"one": "n_tri"})

    out = hash_join(
        deg, cnt, on="node", how="left",
        left_schema=deg_schema,
        right_schema=pa.schema([("node", nd), ("n_tri", pa.int64())]),
        num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        n = pc.fill_null(pc.cast(_flat(t.column("n_tri")), pa.int64()), 0)
        return pa.table({"node": _flat(t.column("node")),
                         "n_triangles": n})

    return out.map_batches(finish, batch_format="pyarrow")


def clustering_coefficients(edges: rd.Dataset,
                            pair_cols: tuple[str, str] = ("src", "dst"),
                            node_dtype: "pa.DataType | None" = None,
                            num_partitions: "int | None" = None
                            ) -> rd.Dataset:
    """Local clustering coefficient per node:
    ``2 * triangles(v) / (deg(v) * (deg(v) - 1))`` (0.0 for deg < 2).
    One extra co-partitioned join over ``triangle_counts`` to stitch
    the degree back on. Output: (node, deg, n_triangles, clustering)."""
    import pyarrow.compute as pc

    from .relational import hash_join

    nd = node_dtype or pa.string()
    num_partitions = _resolve_partitions(num_partitions)
    e = _coalesced(undirected_edges(edges, pair_cols, nd, num_partitions),
                   num_partitions)
    num_partitions = _sized_partitions(e.count(), num_partitions)
    e = _coalesced(e, num_partitions)
    tri = triangle_counts(e, ("a", "b"), nd, num_partitions)
    deg = _edge_degrees(e, nd)
    out = hash_join(
        tri, deg, on="node",
        left_schema=pa.schema([("node", nd),
                               ("n_triangles", pa.int64())]),
        right_schema=pa.schema([("node", nd), ("deg", pa.int64())]),
        num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        d = pc.cast(_flat(t.column("deg")), pa.float64())
        n = pc.cast(_flat(t.column("n_triangles")), pa.float64())
        denom = pc.multiply(d, pc.subtract(d, pa.scalar(1.0)))
        cc = pc.if_else(pc.greater(denom, pa.scalar(0.0)),
                        pc.divide(pc.multiply(pa.scalar(2.0), n), denom),
                        pa.scalar(0.0))
        return pa.table({"node": _flat(t.column("node")),
                         "deg": _flat(t.column("deg")),
                         "n_triangles": _flat(t.column("n_triangles")),
                         "clustering": pc.cast(cc, pa.float64())})

    return out.map_batches(finish, batch_format="pyarrow")


def adamic_adar(edges: rd.Dataset,
                pair_cols: tuple[str, str] = ("src", "dst"),
                node_dtype: "pa.DataType | None" = None,
                max_pivot_degree: "int | None" = None,
                num_partitions: "int | None" = None) -> rd.Dataset:
    """Adamic-Adar link prediction over an undirected graph: for every
    NON-adjacent pair (a, b) with at least one common neighbor,

        aa(a, b) = sum over common neighbors z of 1 / ln(deg(z))

    (deg(z) >= 2 whenever z is a wedge pivot, so ln > 0). Output:
    (node_a, node_b, common_neighbors, adamic_adar), node_a < node_b.

    Plan: undirected edge set -> degree aggregate -> ONE join attaches
    the pivot's 1/ln(deg) to its symmetric adjacency -> SELF-join on
    the pivot generates wedges (x < z keeps each pair once) -> pair
    count+sum aggregate -> ANTI-join drops already-connected pairs.

    Wedge fan-out is quadratic in pivot degree and this op does NOT
    orient by degree (both wedge ENDS are needed, not just the
    above-rank ones), so a web-scale hub generates deg^2 candidate
    pairs. ``max_pivot_degree`` caps it: pivots above the cap are
    dropped from wedge generation (the standard supernode cut for
    similarity joins — a 10^6-degree host's neighbor pairs are
    near-random anyway); the cap is applied to the aggregated degree
    table, one vectorized filter."""
    import pyarrow.compute as pc

    from .relational import hash_aggregate, hash_join

    nd = node_dtype or pa.string()
    num_partitions = _resolve_partitions(num_partitions)
    e = _coalesced(undirected_edges(edges, pair_cols, nd, num_partitions),
                   num_partitions)
    num_partitions = _sized_partitions(e.count(), num_partitions)
    e = _coalesced(e, num_partitions)
    deg = _edge_degrees(e, nd)
    if max_pivot_degree is not None:
        cap = max_pivot_degree
        deg = deg.map_batches(
            lambda t: t.filter(pc.less_equal(t.column("deg"), cap)),
            batch_format="pyarrow")

    def inv_ln(t: pa.Table) -> pa.Table:
        d = pc.cast(_flat(t.column("deg")), pa.float64())
        return pa.table({"pivot": _flat(t.column("node")),
                         "inv_ln_deg": pc.divide(pa.scalar(1.0),
                                                 pc.ln(d))})

    piv = deg.map_batches(inv_ln, batch_format="pyarrow")

    def sym(t: pa.Table) -> pa.Table:
        a, b = _flat(t.column("a")), _flat(t.column("b"))
        return pa.table({"pivot": pa.concat_arrays([a, b]),
                         "leaf": pa.concat_arrays([b, a])})

    adj = hash_join(
        e.map_batches(sym, batch_format="pyarrow"), piv, on="pivot",
        left_schema=pa.schema([("pivot", nd), ("leaf", nd)]),
        right_schema=pa.schema([("pivot", nd),
                                ("inv_ln_deg", pa.float64())]),
        num_partitions=num_partitions)
    adj = _coalesced(adj, num_partitions)

    def rename(m: dict[str, str]):
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns([m.get(c, c) for c in t.column_names])
        return f

    adj_schema = pa.schema([("pivot", nd), ("leaf", nd),
                            ("inv_ln_deg", pa.float64())])
    wedges = hash_join(
        adj.map_batches(rename({"leaf": "node_a"}),
                        batch_format="pyarrow"),
        adj.map_batches(
            lambda t: pa.table({"pivot": _flat(t.column("pivot")),
                                "node_b": _flat(t.column("leaf"))}),
            batch_format="pyarrow"),
        on="pivot",
        left_schema=pa.schema([("pivot", nd), ("node_a", nd),
                               ("inv_ln_deg", pa.float64())]),
        right_schema=pa.schema([("pivot", nd), ("node_b", nd)]),
        num_partitions=num_partitions)

    def pair_filter(t: pa.Table) -> pa.Table:
        a, b = _flat(t.column("node_a")), _flat(t.column("node_b"))
        keep = pc.less(a, b)
        a, b = a.filter(keep), b.filter(keep)
        return pa.table({"node_a": a, "node_b": b,
                         "one": pa.array([1] * len(a), pa.int64()),
                         "inv_ln_deg": _flat(t.column("inv_ln_deg"))
                         .filter(keep)})

    pairs = hash_aggregate(
        wedges.map_batches(pair_filter, batch_format="pyarrow"),
        keys=["node_a", "node_b"],
        sum_cols={"one": "common_neighbors",
                  "inv_ln_deg": "adamic_adar"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("node_a", nd), ("node_b", nd),
                              ("common_neighbors", pa.int64()),
                              ("adamic_adar", pa.float64())]))

    return hash_join(
        pairs,
        e.map_batches(rename({"a": "node_a", "b": "node_b"}),
                      batch_format="pyarrow"),
        on=["node_a", "node_b"], how="anti",
        left_schema=pa.schema([("node_a", nd), ("node_b", nd),
                               ("common_neighbors", pa.int64()),
                               ("adamic_adar", pa.float64())]),
        right_schema=pa.schema([("node_a", nd), ("node_b", nd)]),
        num_partitions=num_partitions)


def degree_assortativity(edges: rd.Dataset,
                         pair_cols: tuple[str, str] = ("src", "dst"),
                         node_dtype: "pa.DataType | None" = None,
                         num_partitions: "int | None" = None
                         ) -> rd.Dataset:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees over the SYMMETRIZED undirected
    edge list (each edge contributes (da,db) and (db,da), so the x and
    y marginals coincide). Computed from EXACT int64 moments — n, Σx,
    Σxy, Σx² — accumulated as per-batch partials + one tiny aggregate;
    only the final division is float, so engine and SQL agree bitwise
    before the quantize. Requires 2m·max_deg² < 2^63 (at 10^12 edges
    that still allows ~million-degree hubs; beyond that, pre-bucket
    degrees). Output: one row (n_edges, assortativity); degenerate
    graphs (zero degree variance) yield assortativity = 0.0."""
    import numpy as np
    import pyarrow.compute as pc  # noqa: F401 (kept for parity w/ siblings)
    from ray.data.aggregate import Sum

    from .relational import hash_join

    nd = node_dtype or pa.string()
    num_partitions = _resolve_partitions(num_partitions)
    e = _coalesced(undirected_edges(edges, pair_cols, nd, num_partitions),
                   num_partitions)
    n_edges = e.count()
    num_partitions = _sized_partitions(n_edges, num_partitions)
    e = _coalesced(e, num_partitions)
    deg = _coalesced(_edge_degrees(e, nd), num_partitions)
    e_schema = pa.schema([("a", nd), ("b", nd)])

    def rename(m: dict[str, str]):
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns([m.get(c, c) for c in t.column_names])
        return f

    ja = hash_join(
        e, deg.map_batches(rename({"node": "a", "deg": "deg_a"}),
                           batch_format="pyarrow"),
        on="a", left_schema=e_schema,
        right_schema=pa.schema([("a", nd), ("deg_a", pa.int64())]),
        num_partitions=num_partitions)
    jb = hash_join(
        ja, deg.map_batches(rename({"node": "b", "deg": "deg_b"}),
                            batch_format="pyarrow"),
        on="b",
        left_schema=pa.schema([("a", nd), ("b", nd),
                               ("deg_a", pa.int64())]),
        right_schema=pa.schema([("b", nd), ("deg_b", pa.int64())]),
        num_partitions=num_partitions)

    def moments(t: pa.Table) -> pa.Table:
        da = _flat(t.column("deg_a")).to_numpy().astype(np.int64)
        db = _flat(t.column("deg_b")).to_numpy().astype(np.int64)
        # symmetrized: x runs over both endpoints of every edge
        sx = int((da + db).sum())
        sxy = int(2 * (da * db).sum())
        sxx = int((da * da + db * db).sum())
        return pa.table({"n": pa.array([2 * len(da)], pa.int64()),
                         "sx": pa.array([sx], pa.int64()),
                         "sxy": pa.array([sxy], pa.int64()),
                         "sxx": pa.array([sxx], pa.int64())})

    agg = jb.map_batches(moments, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
        Sum("sxy", alias_name="sxy"), Sum("sxx", alias_name="sxx"))
    n = int(agg["n"] or 0) if isinstance(agg, dict) else 0
    if n == 0:
        return rd.from_items([{"n_edges": 0, "assortativity": 0.0}])
    sx, sxy, sxx = int(agg["sx"]), int(agg["sxy"]), int(agg["sxx"])
    denom = n * sxx - sx * sx
    r = float(n * sxy - sx * sx) / float(denom) if denom != 0 else 0.0
    return rd.from_items([{"n_edges": int(n_edges),
                           "assortativity": round(r, 9)}])


def kcore_nodes(edges: rd.Dataset, k: int,
                pair_cols: tuple[str, str] = ("src", "dst"),
                node_dtype: "pa.DataType | None" = None,
                max_rounds: "int | None" = None,
                num_partitions: "int | None" = None) -> rd.Dataset:
    """The k-CORE of an undirected graph: the maximal subgraph where
    every node has degree >= k, by iterative peeling — each round
    recomputes degrees over the surviving edge set and drops nodes
    below k (one count aggregate + one semi/semi edge filter per
    round; converges in at most |V| rounds, in practice a handful —
    peeling is the classic link-farm/core extraction primitive).

    ``max_rounds`` caps the rounds for a FIXED-DEPTH contract (the
    unrolled-SQL-oracle pattern used by pagerank/HITS); None runs to
    the fixpoint. Round state is one distributed edge set — nothing
    driver-side but the convergence scalar. Output: (node, deg) of
    surviving nodes with their in-core degree."""
    import pyarrow.compute as pc

    from .relational import hash_join

    nd = node_dtype or pa.string()
    num_partitions = _resolve_partitions(num_partitions)
    cur = _coalesced(undirected_edges(edges, pair_cols, nd,
                                      num_partitions), num_partitions)
    num_partitions = _sized_partitions(cur.count(), num_partitions)
    cur = _coalesced(cur, num_partitions)
    e_schema = pa.schema([("a", nd), ("b", nd)])
    deg_schema = pa.schema([("node", nd), ("deg", pa.int64())])
    rounds = 0
    while True:
        rounds += 1
        deg = _coalesced(_edge_degrees(cur, nd), num_partitions)
        keep = deg.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("deg"),
                                                pa.scalar(k, pa.int64()))),
            batch_format="pyarrow").materialize()
        if keep.count() == deg.count():
            return keep
        if max_rounds is not None and rounds >= max_rounds:
            return keep

        def rn(col: str):
            def f(t: pa.Table) -> pa.Table:
                return pa.table({col: _flat(t.column("node"))})
            return f

        cur = hash_join(
            hash_join(cur, keep.map_batches(rn("a"),
                                            batch_format="pyarrow"),
                      on="a", how="semi", left_schema=e_schema,
                      right_schema=pa.schema([("a", nd)]),
                      num_partitions=num_partitions),
            keep.map_batches(rn("b"), batch_format="pyarrow"),
            on="b", how="semi", left_schema=e_schema,
            right_schema=pa.schema([("b", nd)]),
            num_partitions=num_partitions)
        cur = _coalesced(cur, num_partitions)


def ktruss_edges(edges: rd.Dataset, k: int,
                 pair_cols: tuple[str, str] = ("src", "dst"),
                 node_dtype: "pa.DataType | None" = None,
                 max_rounds: "int | None" = None,
                 num_partitions: "int | None" = None) -> rd.Dataset:
    """The k-TRUSS of an undirected graph (Cohen 2008): the maximal
    subgraph where every EDGE sits in >= k-2 triangles — the
    edge-level cohesion measure (stricter than k-core; the standard
    community-nucleus / link-farm-clique extractor). Iterative edge
    peeling: each round computes per-edge triangle support via the
    degree-ordered closed-wedge plan (each triangle charges its 3
    edges, lex-canonical (a, b) identity), drops edges below k-2, and
    repeats on the survivors — triangles through removed edges
    dissolve, so support must be RECOMPUTED, not decremented
    (decrement-based peeling needs per-edge mutable state; recompute
    keeps every round a pure dataflow over the current edge set).

    ``max_rounds`` caps rounds for the fixed-depth oracle contract
    (pagerank/HITS/k-core pattern); None runs to the fixpoint. Output:
    (a, b, support) of surviving edges with their in-truss support."""
    import pyarrow.compute as pc

    from .relational import hash_join, partial_agg_sum

    if k < 3:
        raise ValueError("k-truss needs k >= 3 (k=2 is the whole graph; "
                         "support-less edges never enter the support "
                         "aggregate, so thresh <= 0 would drop them)")
    nd = node_dtype or pa.string()
    num_partitions = _resolve_partitions(num_partitions)
    cur = _coalesced(undirected_edges(edges, pair_cols, nd,
                                      num_partitions), num_partitions)
    num_partitions = _sized_partitions(cur.count(), num_partitions)
    cur = _coalesced(cur, num_partitions)
    thresh = k - 2
    rounds = 0
    while True:
        rounds += 1
        deg = _coalesced(_edge_degrees(cur, nd), num_partitions)
        closed = _closed_wedges(cur, deg, nd, num_partitions)

        def tri_edges(t: pa.Table) -> pa.Table:
            xs = _flat(t.column("x"))
            ys = _flat(t.column("y"))
            ps = _flat(t.column("pivot"))
            # the 3 undirected edges of each triangle, lex-canonical
            e1a, e1b = pc.min_element_wise(xs, ys), \
                pc.max_element_wise(xs, ys)
            e2a, e2b = pc.min_element_wise(xs, ps), \
                pc.max_element_wise(xs, ps)
            e3a, e3b = pc.min_element_wise(ys, ps), \
                pc.max_element_wise(ys, ps)
            return pa.table({
                "a": pa.concat_arrays([pc.cast(e1a, nd),
                                       pc.cast(e2a, nd),
                                       pc.cast(e3a, nd)]),
                "b": pa.concat_arrays([pc.cast(e1b, nd),
                                       pc.cast(e2b, nd),
                                       pc.cast(e3b, nd)]),
                "one": pa.array([1] * (3 * t.num_rows), pa.int64())})

        support = partial_agg_sum(
            closed.map_batches(tri_edges, batch_format="pyarrow"),
            ["a", "b"], {"one": "support"}).materialize()

        keep = support.map_batches(
            lambda t: t.filter(pc.greater_equal(
                t.column("support"), pa.scalar(thresh, pa.int64()))),
            batch_format="pyarrow").materialize()
        if keep.count() == cur.count():
            return keep
        if max_rounds is not None and rounds >= max_rounds:
            return keep
        cur = _coalesced(keep.select_columns(["a", "b"]),
                         num_partitions)


def bfs_layers(edges: rd.Dataset, seeds: rd.Dataset,
               max_depth: int,
               pair_cols: tuple[str, str] = ("src", "dst"),
               node_dtype: "pa.DataType | None" = None,
               directed: bool = False,
               num_partitions: "int | None" = None) -> rd.Dataset:
    """Multi-source BFS over the simple graph of ``edges`` (UNDIRECTED
    by default; ``directed=True`` follows edges src -> dst only):
    (node, depth) for every node within ``max_depth`` hops of any seed,
    depth = minimum hop count (seeds are depth 0). The crawl-ops /
    KG-reachability primitive: "what can we reach from the seed hosts
    in d hops" bounds a frontier expansion, hop distance from a
    trusted seed set is a classic spam-distance feature, and the
    directed form is crawl-frontier reachability itself.

    Plan: one distinct edge set, symmetrized once (undirected mode);
    each round is (edges SEMI-JOIN frontier) -> distinct neighbor set
    -> ANTI-JOIN visited -> the new frontier, i.e. 3 co-partitioned
    exchanges per round over frontier-sized data. Round state (visited,
    frontier) is node-bounded and fully distributed; the driver sees
    only the frontier-empty scalar. ``max_depth`` is a fixed-depth
    contract so the SQL oracle is a bounded recursive CTE.

    ``seeds``: Dataset with one ``node`` column (same dtype as the
    edge endpoints). Seeds absent from the graph still emit depth 0
    (they simply have no neighbors)."""
    nd = node_dtype or pa.string()
    num_partitions = _resolve_partitions(num_partitions)

    from .relational import hash_aggregate, hash_join

    if directed:
        # distinct directed pairs, self-loops dropped — same combiner
        # shape as undirected_edges without the endpoint ordering
        cs, cd = pair_cols

        def canon(t: pa.Table) -> pa.Table:
            s = pc.cast(_flat(t.column(cs)), nd)
            d = pc.cast(_flat(t.column(cd)), nd)
            keep = pc.and_(pc.and_(pc.is_valid(s), pc.is_valid(d)),
                           pc.not_equal(s, d))
            s, d = s.filter(keep), d.filter(keep)
            out = pa.table({"u": s, "v": d,
                            "one": pa.array([1] * len(s), pa.int64())})
            return out.group_by(["u", "v"]).aggregate([("one", "min")]) \
                      .rename_columns(["u", "v", "one"])

        ded = hash_aggregate(
            edges.map_batches(canon, batch_format="pyarrow"),
            keys=["u", "v"], sum_cols={"one": "_c"},
            num_partitions=num_partitions,
            out_schema=pa.schema([("u", nd), ("v", nd),
                                  ("_c", pa.int64())])
        ).select_columns(["u", "v"])
        ed = _coalesced(ded, num_partitions)
        num_partitions = _sized_partitions(max(ed.count(), 1),
                                           num_partitions)
        ed = _coalesced(ed, num_partitions)
    else:
        und = undirected_edges(edges, pair_cols, nd, num_partitions)
        und = _coalesced(und, num_partitions)
        num_partitions = _sized_partitions(max(und.count(), 1) * 2,
                                           num_partitions)

        def sym(t: pa.Table) -> pa.Table:
            a = _flat(t.column("a"))
            b = _flat(t.column("b"))
            return pa.table({"u": pa.concat_arrays([a, b]),
                             "v": pa.concat_arrays([b, a])})

        ed = _coalesced(und.map_batches(sym, batch_format="pyarrow"),
                        num_partitions)
    ed_schema = pa.schema([("u", nd), ("v", nd)])
    n_schema = pa.schema([("node", nd)])

    def as_depth(d: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": pc.cast(_flat(t.column("node")), nd),
                "depth": pa.array([d] * t.num_rows, pa.int64())})
        return f

    frontier = seeds.select_columns(["node"]).materialize()
    visited = frontier.map_batches(as_depth(0),
                                   batch_format="pyarrow").materialize()
    for d in range(1, max_depth + 1):
        hops = hash_join(
            ed, frontier.map_batches(
                lambda t: pa.table({"u": pc.cast(_flat(t.column("node")),
                                                 nd)}),
                batch_format="pyarrow"),
            on="u", how="semi", left_schema=ed_schema,
            right_schema=pa.schema([("u", nd)]),
            num_partitions=num_partitions)

        def nbr(t: pa.Table) -> pa.Table:
            v = _flat(t.column("v"))
            return pa.table({"node": v,
                             "one": pa.array([1] * len(v), pa.int64())})

        cand = hash_aggregate(
            hops.map_batches(nbr, batch_format="pyarrow"),
            keys=["node"], sum_cols={"one": "_c"},
            num_partitions=num_partitions,
            out_schema=pa.schema([("node", nd), ("_c", pa.int64())])
        ).select_columns(["node"])
        fresh = hash_join(
            cand, visited.select_columns(["node"]),
            on="node", how="anti", left_schema=n_schema,
            right_schema=n_schema,
            num_partitions=num_partitions).materialize()
        if fresh.count() == 0:
            break
        frontier = fresh
        visited = _coalesced(visited.union(
            fresh.map_batches(as_depth(d), batch_format="pyarrow")),
            num_partitions)
    return visited


def bellman_ford(edges: rd.Dataset, seeds: rd.Dataset,
                 n_rounds: int = 3,
                 pair_cols: tuple[str, str] = ("src", "dst"),
                 weight_col: str = "w",
                 node_dtype: "pa.DataType | None" = None,
                 num_partitions: "int | None" = None) -> rd.Dataset:
    """Bounded-round distributed Bellman-Ford — the WEIGHTED BFS:
    (node, dist) where dist = minimum path cost from any seed over
    paths of at most ``n_rounds`` edges (seeds are dist 0.0). The
    crawl / trust-distance generalization of ``bfs_layers`` when
    edges carry a traversal cost (1/link-count, latency, toll).

    Contract: ``edges`` is a DIRECTED edge list with DISTINCT (src,
    dst) pairs, positive double weights, no self-loops (symmetrize /
    dedup upstream — ``web.host_bfs_weighted`` shows the rollup).
    Each round is ONE co-partitioned hash join (edges x frontier
    dists) plus ONE min-aggregate over (old dists UNION candidate
    dists) — round state is node-bounded and fully distributed; the
    driver never sees a row. Fixed ``n_rounds`` keeps the SQL oracle
    a bounded min-plus unroll (the pagerank/LP contract shape).
    Output dist is the raw accumulated double (callers quantize at
    the edge; min-plus path sums are identical left-to-right
    additions in any engine, so parity is exact)."""
    nd = node_dtype or pa.string()
    num_partitions = _resolve_partitions(num_partitions)

    from .relational import hash_join, typed_groupby_map

    cs, cd = pair_cols
    ed_schema = pa.schema([("u", nd), ("v", nd), ("w", pa.float64())])

    def canon(t: pa.Table) -> pa.Table:
        return pa.table({"u": pc.cast(_flat(t.column(cs)), nd),
                         "v": pc.cast(_flat(t.column(cd)), nd),
                         "w": pc.cast(_flat(t.column(weight_col)),
                                      pa.float64())})

    ed = _coalesced(edges.map_batches(canon, batch_format="pyarrow"),
                    num_partitions)
    num_partitions = _sized_partitions(max(ed.count(), 1),
                                       num_partitions)
    ed = _coalesced(ed, num_partitions)

    d_schema = pa.schema([("node", nd), ("dist", pa.float64())])

    def _min_by_node(ds: rd.Dataset) -> rd.Dataset:
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("node", as_index=False)["dist"].min()
            h = pd.util.hash_pandas_object(g["node"].astype(str),
                                           index=False)
            g["part"] = (h % num_partitions).astype("int64")
            return g

        def final(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("node", as_index=False)["dist"].min()

        return typed_groupby_map(
            ds.map_batches(partial, batch_format="pandas"),
            "part", final, d_schema)

    def as_dist0(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pc.cast(_flat(t.column("node")), nd),
            "dist": pa.array([0.0] * t.num_rows, pa.float64())})

    dist = seeds.select_columns(["node"]).map_batches(
        as_dist0, batch_format="pyarrow").materialize()
    for _ in range(n_rounds):
        hop = hash_join(
            ed, dist.map_batches(
                lambda t: pa.table({"u": t.column("node"),
                                    "dist": t.column("dist")}),
                batch_format="pyarrow"),
            on="u", how="inner", left_schema=ed_schema,
            right_schema=pa.schema([("u", nd), ("dist", pa.float64())]),
            num_partitions=num_partitions)

        def cand(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t.column("v"),
                "dist": pc.add(t.column("dist"), t.column("w"))})

        # _coalesced: the union + min-groupby keep input block counts,
        # so the frontier state would otherwise grow by blocks(ed) of
        # tiny blocks every relaxation round (same fix as
        # connected_components / label_propagation)
        dist = _coalesced(
            _min_by_node(
                dist.union(hop.map_batches(cand,
                                           batch_format="pyarrow"))),
            num_partitions)
    return dist


def label_propagation(edges: rd.Dataset, nodes: rd.Dataset,
                      n_rounds: int = 3,
                      pair_cols: tuple[str, str] = ("src", "dst"),
                      node_col: str = "node",
                      node_dtype: "pa.DataType | None" = None,
                      weight_col: "str | None" = None,
                      num_partitions: "int | None" = None) -> rd.Dataset:
    """SYNCHRONOUS label-propagation community detection at a
    fixed-round contract: every node starts labeled with its own id;
    each round every node adopts the MODE of its neighbors' previous-
    round labels over the undirected simple graph (ties -> smallest
    label; nodes with no neighbors keep their label). ``n_rounds`` is
    fixed so the SQL oracle is the unrolled round chain — the same
    contract pagerank / HITS / k-core use. Unlike hash-min connected
    components (which converges to one label per component), mode
    propagation finds DENSE regions: bridges between communities lose
    the vote.

    ``weight_col`` switches to WEIGHTED votes: duplicate / reciprocal
    (a, b) rows' integer weights sum into one undirected edge weight,
    and each neighbor contributes its edge weight instead of 1 —
    link multiplicity decides contested nodes. ``None`` keeps every
    unweighted code path byte-identical to before the parameter
    existed (the pagerank/HITS weighted-variant pattern).

    Per round: one co-partitioned join (edges x labels), one
    combiner-backed (node, label) count aggregate, one grouped_argmax
    (count desc, label asc), one left join back to the node set —
    all label state stays distributed and node-bounded."""
    nd = node_dtype or pa.string()
    num_partitions = _resolve_partitions(num_partitions)

    from .relational import grouped_argmax, hash_aggregate, hash_join

    if weight_col is not None:
        ca, cb = pair_cols

        def canonw(t: pa.Table) -> pa.Table:
            a = pc.cast(_flat(t.column(ca)), nd)
            b = pc.cast(_flat(t.column(cb)), nd)
            w = pc.cast(_flat(t.column(weight_col)), pa.int64())
            keep = pc.and_(pc.and_(pc.is_valid(a), pc.is_valid(b)),
                           pc.not_equal(a, b))
            a, b, w = a.filter(keep), b.filter(keep), w.filter(keep)
            lo = pc.min_element_wise(a, b)
            hi = pc.max_element_wise(a, b)
            out = pa.table({"a": lo, "b": hi, "w": w})
            return out.group_by(["a", "b"]).aggregate([("w", "sum")]) \
                      .rename_columns(["a", "b", "w"])

        und = hash_aggregate(
            edges.map_batches(canonw, batch_format="pyarrow"),
            keys=["a", "b"], sum_cols={"w": "w"},
            num_partitions=num_partitions,
            out_schema=pa.schema([("a", nd), ("b", nd),
                                  ("w", pa.int64())]))
        und = _coalesced(und, num_partitions)
        num_partitions = _sized_partitions(max(und.count(), 1) * 2,
                                           num_partitions)

        def symw(t: pa.Table) -> pa.Table:
            a = _flat(t.column("a"))
            b = _flat(t.column("b"))
            w = _flat(t.column("w"))
            return pa.table({"u": pa.concat_arrays([a, b]),
                             "v": pa.concat_arrays([b, a]),
                             "w": pa.concat_arrays([w, w])})

        ed = _coalesced(und.map_batches(symw, batch_format="pyarrow"),
                        num_partitions)
        ed_schema = pa.schema([("u", nd), ("v", nd), ("w", pa.int64())])
    else:
        und = _coalesced(undirected_edges(edges, pair_cols, nd,
                                          num_partitions), num_partitions)
        num_partitions = _sized_partitions(max(und.count(), 1) * 2,
                                           num_partitions)

        def sym(t: pa.Table) -> pa.Table:
            a = _flat(t.column("a"))
            b = _flat(t.column("b"))
            return pa.table({"u": pa.concat_arrays([a, b]),
                             "v": pa.concat_arrays([b, a])})

        ed = _coalesced(und.map_batches(sym, batch_format="pyarrow"),
                        num_partitions)
        ed_schema = pa.schema([("u", nd), ("v", nd)])
    lbl_schema = pa.schema([("node", nd), ("lbl", nd)])

    def init(t: pa.Table) -> pa.Table:
        n = pc.cast(_flat(t.column(node_col)), nd)
        return pa.table({"node": n, "lbl": n})

    labels = nodes.map_batches(init, batch_format="pyarrow").materialize()

    for _ in range(n_rounds):
        msgs = hash_join(
            ed, labels.map_batches(
                lambda t: pa.table({"u": t.column("node"),
                                    "u_lbl": t.column("lbl")}),
                batch_format="pyarrow"),
            on="u", left_schema=ed_schema,
            right_schema=pa.schema([("u", nd), ("u_lbl", nd)]),
            num_partitions=num_partitions)

        def vote(t: pa.Table) -> pa.Table:
            w = (t.column("w") if weight_col is not None
                 else pa.array([1] * t.num_rows, pa.int64()))
            return pa.table({"node": t.column("v"),
                             "lbl": t.column("u_lbl"),
                             "one": w})

        counts = hash_aggregate(
            msgs.map_batches(vote, batch_format="pyarrow"),
            keys=["node", "lbl"], sum_cols={"one": "n"},
            num_partitions=num_partitions,
            out_schema=pa.schema([("node", nd), ("lbl", nd),
                                  ("n", pa.int64())]))
        winners = grouped_argmax(
            counts, key="node", order_col="n", tie_col="lbl",
            out_cols=["node", "lbl"],
            num_partitions=num_partitions).map_batches(
                lambda t: pa.table({"node": t.column("node"),
                                    "new_lbl": t.column("lbl")}),
                batch_format="pyarrow")
        joined = hash_join(
            labels, winners, on="node", how="left",
            left_schema=lbl_schema,
            right_schema=pa.schema([("node", nd), ("new_lbl", nd)]),
            num_partitions=num_partitions)

        def take_new(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t.column("node"),
                "lbl": pc.coalesce(_flat(t.column("new_lbl")),
                                   _flat(t.column("lbl")))})

        labels = _coalesced(joined.map_batches(take_new,
                                               batch_format="pyarrow"),
                            num_partitions)
    return labels


def outlink_jaccard(edges: rd.Dataset,
                    pair_cols: tuple[str, str] = ("src", "dst"),
                    node_dtype: "pa.DataType | None" = None,
                    max_target_indegree: "int | None" = None,
                    min_common: int = 1,
                    num_partitions: "int | None" = None) -> rd.Dataset:
    """OUTLINK-set Jaccard similarity between source nodes of a
    DIRECTED graph: for every source pair (a, b), a < b, sharing at
    least one distinct link target,

        jaccard(a, b) = |out(a) & out(b)| / |out(a) | out(b)|

    — the mirror-site / coordinated-link-farm detector (two hosts that
    link to the same places are the same operation, whether or not
    they link to each other; Adamic-Adar's common-NEIGHBOR machinery
    can't see direction). Output: (node_a, node_b, common_targets,
    jaccard), jaccard quantized to 9 dp (float-tie-stable vs the SQL
    oracle's round()).

    Plan: distinct directed edge set -> out-degree count combiner ->
    SELF-join pivoted on the TARGET generates co-citing pairs (a < b
    keeps each once) -> pair count aggregate -> two joins attach the
    out-degrees; |union| = deg(a) + deg(b) - |intersection|, so no
    second pass. Pair fan-out is quadratic in target IN-degree (a hub
    everyone links to pairs all its citers); ``max_target_indegree``
    drops super-cited targets from pair generation — the standard
    supernode cut (deviates from the exact relation, so the oracle
    runs uncapped)."""
    from .relational import hash_aggregate, hash_join, partial_agg_sum

    nd = node_dtype or pa.string()
    num_partitions = _resolve_partitions(num_partitions)
    cs, cd = pair_cols

    def canon(t: pa.Table) -> pa.Table:
        s = pc.cast(_flat(t.column(cs)), nd)
        d = pc.cast(_flat(t.column(cd)), nd)
        keep = pc.and_(pc.and_(pc.is_valid(s), pc.is_valid(d)),
                       pc.not_equal(s, d))
        s, d = s.filter(keep), d.filter(keep)
        out = pa.table({"s": s, "d": d,
                        "one": pa.array([1] * len(s), pa.int64())})
        return out.group_by(["s", "d"]).aggregate([("one", "min")]) \
                  .rename_columns(["s", "d", "one"])

    e = hash_aggregate(
        edges.map_batches(canon, batch_format="pyarrow"),
        keys=["s", "d"], sum_cols={"one": "_c"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("s", nd), ("d", nd),
                              ("_c", pa.int64())])
    ).select_columns(["s", "d"])
    e = _coalesced(e, num_partitions)
    num_partitions = _sized_partitions(e.count(), num_partitions)
    e = _coalesced(e, num_partitions)
    e_schema = pa.schema([("s", nd), ("d", nd)])

    odeg = partial_agg_sum(
        e.map_batches(
            lambda t: pa.table({"s": t.column("s"),
                                "one": pa.array([1] * t.num_rows,
                                                pa.int64())}),
            batch_format="pyarrow"),
        "s", {"one": "out_deg"})

    pe = e
    if max_target_indegree is not None:
        cap = max_target_indegree
        ind = partial_agg_sum(
            e.map_batches(
                lambda t: pa.table({"d": t.column("d"),
                                    "one": pa.array([1] * t.num_rows,
                                                    pa.int64())}),
                batch_format="pyarrow"),
            "d", {"one": "in_deg"}).map_batches(
                lambda t: pa.table({"d": t.filter(
                    pc.less_equal(t.column("in_deg"),
                                  pa.scalar(cap, pa.int64())))
                    .column("d")}),
                batch_format="pyarrow")
        pe = hash_join(e, ind, on="d", how="semi",
                       left_schema=e_schema,
                       right_schema=pa.schema([("d", nd)]),
                       num_partitions=num_partitions)
        pe = _coalesced(pe, num_partitions)

    co = hash_join(
        pe.map_batches(
            lambda t: pa.table({"d": t.column("d"),
                                "node_a": t.column("s")}),
            batch_format="pyarrow"),
        pe.map_batches(
            lambda t: pa.table({"d": t.column("d"),
                                "node_b": t.column("s")}),
            batch_format="pyarrow"),
        on="d",
        left_schema=pa.schema([("d", nd), ("node_a", nd)]),
        right_schema=pa.schema([("d", nd), ("node_b", nd)]),
        num_partitions=num_partitions)

    def pair_filter(t: pa.Table) -> pa.Table:
        a, b = _flat(t.column("node_a")), _flat(t.column("node_b"))
        keep = pc.less(a, b)
        a, b = a.filter(keep), b.filter(keep)
        return pa.table({"node_a": a, "node_b": b,
                         "one": pa.array([1] * len(a), pa.int64())})

    pairs = hash_aggregate(
        co.map_batches(pair_filter, batch_format="pyarrow"),
        keys=["node_a", "node_b"], sum_cols={"one": "common_targets"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("node_a", nd), ("node_b", nd),
                              ("common_targets", pa.int64())]))
    if min_common > 1:
        # output-volume knob: on dense co-citation graphs the pair set
        # is the cost (35M pairs at the 1M-edge stress); dropping
        # low-overlap pairs BEFORE the two degree joins bounds it
        pairs = pairs.map_batches(
            lambda t: t.filter(pc.greater_equal(
                t.column("common_targets"),
                pa.scalar(min_common, pa.int64()))),
            batch_format="pyarrow")

    j1 = hash_join(
        pairs,
        odeg.map_batches(
            lambda t: pa.table({"node_a": t.column("s"),
                                "deg_a": t.column("out_deg")}),
            batch_format="pyarrow"),
        on="node_a",
        left_schema=pa.schema([("node_a", nd), ("node_b", nd),
                               ("common_targets", pa.int64())]),
        right_schema=pa.schema([("node_a", nd), ("deg_a", pa.int64())]),
        num_partitions=num_partitions)
    j2 = hash_join(
        j1,
        odeg.map_batches(
            lambda t: pa.table({"node_b": t.column("s"),
                                "deg_b": t.column("out_deg")}),
            batch_format="pyarrow"),
        on="node_b",
        left_schema=pa.schema([("node_a", nd), ("node_b", nd),
                               ("common_targets", pa.int64()),
                               ("deg_a", pa.int64())]),
        right_schema=pa.schema([("node_b", nd), ("deg_b", pa.int64())]),
        num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        inter = pc.cast(_flat(t.column("common_targets")), pa.float64())
        da = pc.cast(_flat(t.column("deg_a")), pa.float64())
        db = pc.cast(_flat(t.column("deg_b")), pa.float64())
        j = pc.round(pc.divide(inter,
                               pc.subtract(pc.add(da, db), inter)),
                     ndigits=9)
        return pa.table({"node_a": t.column("node_a"),
                         "node_b": t.column("node_b"),
                         "common_targets": t.column("common_targets"),
                         "jaccard": j})

    return j2.map_batches(finish, batch_format="pyarrow")


def ball_sizes(edges: rd.Dataset,
               pair_cols: tuple = ("src", "dst"),
               node_dtype: "pa.DataType | None" = None,
               num_partitions: "int | None" = None,
               max_mid_degree: "int | None" = None) -> rd.Dataset:
    """Hop-2 ball size per node over the UNDIRECTED distinct graph:
    ``(node, ball2)`` = how many OTHER nodes sit within distance <= 2
    — the local-reach signal (crawl-frontier influence, supernode
    detection) between plain degree and full BFS.

    Plan: canonical undirected edges -> symmetric (u, v) stream
    (materialized once, joined against itself) -> one mid-node-hash
    join emits 2-paths -> union with direct neighbors -> distinct
    (u, v) hash-aggregate -> per-node count.  Three exchanges.

    Scale: a middle node of degree d fans out d^2 two-paths — the
    classic 2-hop blowup.  ``max_mid_degree`` drops higher-degree
    PIVOTS from the expansion (documented approximation: balls that
    pass through dropped hubs undercount); the default ``None`` is
    exact and is what the SQL oracle checks."""
    import pyarrow.compute as pc

    from .relational import hash_aggregate, hash_join

    nd = node_dtype or pa.string()
    num_partitions = _resolve_partitions(num_partitions)
    e = undirected_edges(edges, pair_cols, nd,
                         num_partitions=num_partitions)

    def sym(t: pa.Table) -> pa.Table:
        a = _flat(t.column("a"))
        b = _flat(t.column("b"))
        return pa.table({"u": pa.concat_arrays([a, b]),
                         "v": pa.concat_arrays([b, a])})

    s = _coalesced(e.map_batches(sym, batch_format="pyarrow"),
                   num_partitions)

    mids = s.map_batches(
        lambda t: pa.table({"m": t.column("v"), "u": t.column("u")}),
        batch_format="pyarrow")
    outs = s.map_batches(
        lambda t: pa.table({"m": t.column("u"), "v": t.column("v")}),
        batch_format="pyarrow")
    if max_mid_degree is not None:
        deg = _edge_degrees(e, nd).materialize()
        mids = hash_join(
            mids, deg.map_batches(
                lambda t: t.rename_columns(["m", "deg"]),
                batch_format="pyarrow"),
            on="m", num_partitions=num_partitions,
            left_schema=pa.schema([("m", nd), ("u", nd)]),
            right_schema=pa.schema([("m", nd), ("deg", pa.int64())]))
        mids = mids.map_batches(
            lambda t: t.filter(pc.less_equal(t.column("deg"),
                                             max_mid_degree))
                       .select(["m", "u"]),
            batch_format="pyarrow")

    two = hash_join(
        mids, outs, on="m", num_partitions=num_partitions,
        left_schema=pa.schema([("m", nd), ("u", nd)]),
        right_schema=pa.schema([("m", nd), ("v", nd)]))

    def paths(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t.column("u"), t.column("v"))))
        return pa.table({"u": t.column("u"), "v": t.column("v"),
                         "one": pa.array([1] * t.num_rows, pa.int64())})

    reach = two.map_batches(paths, batch_format="pyarrow").union(
        s.map_batches(
            lambda t: t.append_column(
                "one", pa.array([1] * t.num_rows, pa.int64())),
            batch_format="pyarrow"))

    distinct = hash_aggregate(
        reach, keys=["u", "v"], sum_cols={"one": "_c"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("u", nd), ("v", nd),
                              ("_c", pa.int64())]))

    return hash_aggregate(
        distinct.map_batches(
            lambda t: pa.table({"u": t.column("u"),
                                "one": pa.array([1] * t.num_rows,
                                                pa.int64())}),
            batch_format="pyarrow"),
        keys=["u"], sum_cols={"one": "ball2"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("u", nd), ("ball2", pa.int64())])
    ).map_batches(
        lambda t: t.rename_columns(["node", "ball2"]),
        batch_format="pyarrow")


def harmonic_centrality2(edges: rd.Dataset,
                         pair_cols: tuple = ("src", "dst"),
                         node_dtype: "pa.DataType | None" = None,
                         num_partitions: "int | None" = None) -> rd.Dataset:
    """Radius-2 harmonic centrality per node over the UNDIRECTED
    distinct graph: ``(node, harmonic2)`` with
    ``harmonic2 = |dist==1| * 1.0 + |dist==2| * 0.5`` — the truncated
    form of harmonic centrality (sum of 1/d over reachable nodes),
    the standard bounded-radius influence score for web-host graphs
    where full all-pairs BFS is off the table.  Distance-1 count is
    plain degree; distance-2 nodes are the 2-path reach set MINUS the
    direct neighbors (an anti-join), so no min-dist aggregate is
    needed.

    Plan: canonical undirected edges (1 exchange) -> symmetric stream
    -> mid-node-hash join emits 2-paths -> distinct -> ANTI-JOIN the
    direct-neighbor pairs -> per-node count; degree from one combiner
    aggregate; one final join.  Exact ``1.0/0.5`` sums are binary-
    representable, so the float column is hash-stable without
    quantization.

    Scale: same d^2 mid-node fan-out bound as ``ball_sizes`` (hub
    pivots dominate); at 100 TB you cap pivots the same way (see
    ``ball_sizes(max_mid_degree=...)``) — kept exact here because the
    SQL oracle checks the exact contract."""
    from .relational import hash_aggregate, hash_join

    nd = node_dtype or pa.string()
    num_partitions = _resolve_partitions(num_partitions)
    e = undirected_edges(edges, pair_cols, nd,
                         num_partitions=num_partitions)
    e = e.materialize()

    def sym(t: pa.Table) -> pa.Table:
        a = _flat(t.column("a"))
        b = _flat(t.column("b"))
        return pa.table({"u": pa.concat_arrays([a, b]),
                         "v": pa.concat_arrays([b, a])})

    s = _coalesced(e.map_batches(sym, batch_format="pyarrow"),
                   num_partitions)

    deg = _edge_degrees(e, nd)

    mids = s.map_batches(
        lambda t: pa.table({"m": t.column("v"), "u": t.column("u")}),
        batch_format="pyarrow")
    outs = s.map_batches(
        lambda t: pa.table({"m": t.column("u"), "v": t.column("v")}),
        batch_format="pyarrow")
    two = hash_join(
        mids, outs, on="m", num_partitions=num_partitions,
        left_schema=pa.schema([("m", nd), ("u", nd)]),
        right_schema=pa.schema([("m", nd), ("v", nd)]))

    def paths(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t.column("u"), t.column("v"))))
        return pa.table({"u": t.column("u"), "v": t.column("v"),
                         "one": pa.array([1] * t.num_rows, pa.int64())})

    pair_schema = pa.schema([("u", nd), ("v", nd)])
    two_distinct = hash_aggregate(
        two.map_batches(paths, batch_format="pyarrow"),
        keys=["u", "v"], sum_cols={"one": "_c"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("u", nd), ("v", nd), ("_c", pa.int64())])
    ).select_columns(["u", "v"])

    # nodes at EXACTLY distance 2: 2-path reach minus direct neighbors
    d2_only = hash_join(
        two_distinct, s, on=["u", "v"], how="anti",
        left_schema=pair_schema, right_schema=pair_schema,
        num_partitions=num_partitions)

    c2 = hash_aggregate(
        d2_only.map_batches(
            lambda t: pa.table({"node": t.column("u"),
                                "one": pa.array([1] * t.num_rows,
                                                pa.int64())}),
            batch_format="pyarrow"),
        keys=["node"], sum_cols={"one": "c2"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("node", nd), ("c2", pa.int64())]))

    joined = hash_join(
        deg, c2, on="node", how="left",
        left_schema=pa.schema([("node", nd), ("deg", pa.int64())]),
        right_schema=pa.schema([("node", nd), ("c2", pa.int64())]),
        num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        d = pc.cast(_flat(t.column("deg")), pa.float64())
        c = pc.cast(pc.coalesce(_flat(t.column("c2")),
                                pa.scalar(0, pa.int64())), pa.float64())
        h = pc.add(d, pc.multiply(c, pa.scalar(0.5, pa.float64())))
        return pa.table({"node": t.column("node"), "harmonic2": h})

    return joined.map_batches(finish, batch_format="pyarrow")


def random_walks(edges: rd.Dataset,
                 walk_len: int = 3, n_walks: int = 2,
                 pair_cols: tuple = ("src", "dst"),
                 node_dtype: "pa.DataType | None" = None,
                 num_partitions: "int | None" = None) -> rd.Dataset:
    """Deterministic hash-seeded random walks over the DIRECTED
    distinct graph — the node2vec/DeepWalk corpus generator re-done
    as a bounded-round Dataset loop.  From every node with >= 1
    out-neighbor, ``n_walks`` walks of up to ``walk_len`` steps; at
    step t the walk at (seed, walk) on node u moves to the out-
    neighbor v minimizing ``md5(f"{seed}|{walk}|{t}|{v}")`` (ties by
    v — md5 collisions are the only tie source).  Hash-seeded instead
    of RNG-seeded so a restarted/resumed run reproduces the same
    corpus AND the DuckDB oracle can replay the exact choice with its
    own ``md5()`` — the determinism-over-entropy trade every
    large-scale walk corpus makes for lineage.

    Output: ``(seed, walk, step, node)`` — step 0 is the seed itself;
    a walk that reaches a sink (no out-neighbors) simply stops short.

    Plan: distinct directed edges (1 exchange, materialized once);
    each round is one co-partitioned hash join (frontier x adjacency)
    + one two-phase argmin on (seed, walk) — frontier-sized traffic
    (n_seeds x n_walks rows), never corpus-sized.  The per-candidate
    md5 is a Python loop, but over the candidate stream only
    (frontier x out-degree), bounded per round; numpy can't express
    md5 and oracle parity pins the hash.

    Scale: rounds are walk_len (fixed); per-round shuffle moves
    O(active_walks * avg_outdeg) rows hash-partitioned on the walk
    key, so hub fan-out spreads across partitions. 100-TB knob:
    sample the seed set (any Dataset filter on seeds) — the loop is
    indifferent to seed count."""
    import hashlib

    from .relational import hash_aggregate, hash_join

    nd = node_dtype or pa.string()
    num_partitions = _resolve_partitions(num_partitions)
    cs, cd = pair_cols

    def canon(t: pa.Table) -> pa.Table:
        s = pc.cast(_flat(t.column(cs)), nd)
        d = pc.cast(_flat(t.column(cd)), nd)
        keep = pc.and_(pc.and_(pc.is_valid(s), pc.is_valid(d)),
                       pc.not_equal(s, d))
        s, d = s.filter(keep), d.filter(keep)
        out = pa.table({"u": s, "v": d,
                        "one": pa.array([1] * len(s), pa.int64())})
        return out.group_by(["u", "v"]).aggregate([("one", "min")]) \
                  .rename_columns(["u", "v", "one"])

    de = hash_aggregate(
        edges.map_batches(canon, batch_format="pyarrow"),
        keys=["u", "v"], sum_cols={"one": "_c"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("u", nd), ("v", nd), ("_c", pa.int64())])
    ).select_columns(["u", "v"]).materialize()
    de = _coalesced(de, num_partitions)

    seeds = hash_aggregate(
        de.map_batches(
            lambda t: pa.table({"node": t.column("u"),
                                "one": pa.array([1] * t.num_rows,
                                                pa.int64())}),
            batch_format="pyarrow"),
        keys=["node"], sum_cols={"one": "_c"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("node", nd), ("_c", pa.int64())])
    ).select_columns(["node"])

    import numpy as np

    def expand(t: pa.Table) -> pa.Table:
        s = _flat(t.column("node"))
        idx = pa.array(np.repeat(np.arange(len(s)), n_walks))
        rep = s.take(idx)
        walk = pa.array(np.tile(np.arange(n_walks, dtype=np.int64),
                                len(s)))
        return pa.table({"seed": rep, "walk": walk, "node": rep})

    frontier = seeds.map_batches(expand,
                                 batch_format="pyarrow").materialize()

    def with_step(d: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({"seed": t.column("seed"),
                             "walk": t.column("walk"),
                             "step": pa.array([d] * t.num_rows,
                                              pa.int64()),
                             "node": t.column("node")})
        return f

    parts = [frontier.map_batches(with_step(0), batch_format="pyarrow")]
    f_schema = pa.schema([("seed", nd), ("walk", pa.int64()),
                          ("u", nd)])
    e_schema = pa.schema([("u", nd), ("v", nd)])

    for t_step in range(1, walk_len + 1):
        cand = hash_join(
            frontier.map_batches(
                lambda t: pa.table({"seed": t.column("seed"),
                                    "walk": t.column("walk"),
                                    "u": t.column("node")}),
                batch_format="pyarrow"),
            de, on="u", left_schema=f_schema, right_schema=e_schema,
            num_partitions=num_partitions)

        ts = str(t_step)

        def local_min(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["h"] = [hashlib.md5(f"{s}|{w}|{ts}|{v}".encode())
                       .hexdigest()
                       for s, w, v in zip(df["seed"], df["walk"],
                                          df["v"])]
            g = (df.sort_values(["h", "v"], kind="stable")
                 .drop_duplicates(["seed", "walk"]))
            hh = pd.util.hash_pandas_object(
                g["seed"].astype(str) + "|" + g["walk"].astype(str),
                index=False)
            return g.assign(_part=(hh % num_partitions).astype("int64"))

        def final_min(g: pd.DataFrame) -> pd.DataFrame:
            w = (g.sort_values(["h", "v"], kind="stable")
                 .drop_duplicates(["seed", "walk"]))
            return w[["seed", "walk", "v"]].rename(columns={"v": "node"})

        frontier = (cand.map_batches(local_min, batch_format="pandas")
                    .groupby("_part").map_groups(final_min,
                                                 batch_format="pandas")
                    ).materialize()
        if frontier.count() == 0:
            break
        parts.append(frontier.map_batches(with_step(t_step),
                                          batch_format="pyarrow"))

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return _coalesced(out, num_partitions)


def walk_skipgram_pairs(walks: rd.Dataset, window: int = 2,
                        num_partitions: "int | None" = None
                        ) -> rd.Dataset:
    """Skip-gram co-visit pairs from a ``random_walks`` corpus:
    ``(center, context, cnt)`` where context follows center on the
    SAME (seed, walk) within ``window`` steps (directed,
    forward-window — the asymmetric form; symmetrize downstream if a
    model wants it).  This is the pair table a word2vec-style
    embedding trains on.

    Plan: one hash exchange on (seed, walk), per-partition vectorized
    shift-by-k pair emission (no per-row loop), then one
    combiner-backed count aggregate on (center, context)."""
    from .relational import hash_aggregate, partial_agg_sum

    num_partitions = _resolve_partitions(num_partitions)

    def part_key(df: pd.DataFrame) -> pd.DataFrame:
        hh = pd.util.hash_pandas_object(
            df["seed"].astype(str) + "|" + df["walk"].astype(str),
            index=False)
        return df.assign(_part=(hh % num_partitions).astype("int64"))

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["seed", "walk", "step"],
                          kind="stable").reset_index(drop=True)
        outs = []
        same = (g["seed"].shift(-1) == g["seed"]) & \
               (g["walk"].shift(-1) == g["walk"])
        for k in range(1, window + 1):
            same_k = pd.Series(True, index=g.index)
            for j in range(1, k + 1):
                same_k &= (g["seed"].shift(-j) == g["seed"]) & \
                          (g["walk"].shift(-j) == g["walk"]) & \
                          (g["step"].shift(-j) == g["step"] + j)
            m = same_k.fillna(False)
            if m.any():
                outs.append(pd.DataFrame({
                    "center": g.loc[m, "node"].values,
                    "context": g["node"].shift(-k)[m].values}))
        del same
        if not outs:
            return pd.DataFrame({"center": pd.Series([], dtype=object),
                                 "context": pd.Series([], dtype=object),
                                 "one": pd.Series([], dtype="int64")})
        res = pd.concat(outs, ignore_index=True)
        res["one"] = 1
        return res

    pairs = (walks.map_batches(part_key, batch_format="pandas")
             .groupby("_part").map_groups(emit_pairs,
                                          batch_format="pandas"))
    return partial_agg_sum(pairs, ["center", "context"], {"one": "cnt"})

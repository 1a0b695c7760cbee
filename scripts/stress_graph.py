"""Scale evidence for the degree-ordered triangle path: a synthetic
skewed graph (Zipf-ish degree distribution — a few hub nodes touch a
large share of edges, the regime where an UNORDERED wedge join explodes
quadratically) at parametric size. Usage:
    python scripts/stress_graph.py [n_edges] [n_nodes] [num_cpus]
Prints one JSON line with wall times and the wedge/triangle counts.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    num_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from tabbyray.ops.graph import triangle_counts

    # deterministic skewed endpoints: id = floor(n * u^2.5) — mass
    # concentrates at low ids (node 0 is a mega-hub with ~n_edges/300
    # incident edges) while ids still cover the whole 0..n-1 range
    rng = np.random.default_rng(97)
    u = rng.random((n_edges, 2))
    nodes = np.minimum((n_nodes * u ** 2.5).astype(np.int64),
                       n_nodes - 1)
    t = pa.table({"src": pa.array(nodes[:, 0], pa.int64()),
                  "dst": pa.array(nodes[:, 1], pa.int64())})
    edges = rd.from_arrow(t).repartition(64).materialize()

    t0 = time.monotonic()
    tri = triangle_counts(edges, ("src", "dst"),
                          node_dtype=pa.int64()).materialize()
    wall = time.monotonic() - t0
    df = tri.to_pandas()
    out = {
        "n_edges_in": n_edges,
        "n_nodes": int(len(df)),
        "total_triangles": int(df["n_triangles"].sum() // 3),
        "max_node_triangles": int(df["n_triangles"].max()),
        "wall_sec": round(wall, 1),
        "num_cpus": num_cpus,
    }

    # the session-3 iterative/pair ops on the same skewed graph: BFS
    # from the 2 smallest ids, 3-round label propagation, and the
    # outlink-Jaccard co-citation join (with the supernode cut at
    # in-degree 1000 — the uncapped pair fan-out on the mega-hub is
    # exactly the explosion the cap exists for)
    from tabbyray.ops.graph import (bfs_layers, label_propagation,
                                    outlink_jaccard)

    seeds = rd.from_arrow(pa.table({"node": pa.array([0, 1],
                                                     pa.int64())}))
    t0 = time.monotonic()
    bfs = bfs_layers(edges, seeds, 3, node_dtype=pa.int64()).materialize()
    out["bfs_wall_sec"] = round(time.monotonic() - t0, 1)
    out["bfs_reached"] = int(bfs.count())

    node_t = rd.from_arrow(pa.table({"node": pa.array(
        np.arange(n_nodes, dtype=np.int64), pa.int64())}))
    t0 = time.monotonic()
    lp = label_propagation(edges, node_t, n_rounds=3,
                           node_dtype=pa.int64()).materialize()
    out["lp_wall_sec"] = round(time.monotonic() - t0, 1)
    out["lp_communities"] = int(lp.to_pandas()["lbl"].nunique())

    t0 = time.monotonic()
    oj = outlink_jaccard(edges, node_dtype=pa.int64(),
                         max_target_indegree=1000).materialize()
    out["jaccard_wall_sec"] = round(time.monotonic() - t0, 1)
    out["jaccard_pairs"] = int(oj.count())

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Scale evidence for the KG-construction stages: a synthetic
multi-source triple stream at parametric size — skewed subjects (hub
entities), sameAs alias chains over 10% of entities, a source url per
assertion — through sameAs closure (both component plans),
partition-cut profiling, provenance rollup and source-vote conflict
resolution. Usage:
    python scripts/stress_kgconstruct.py [n_facts] [n_entities] [num_cpus]
Prints one JSON line with wall times and result invariants.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_facts = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_entities = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    num_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from tabbyray.ops.kgconstruct import (OWL_SAMEAS,
                                          partition_cut_profile,
                                          resolve_conflicts,
                                          sameas_closure,
                                          triple_provenance)

    def uri(prefix: str, idx: np.ndarray) -> pa.Array:
        s = pc.cast(pa.array(idx, pa.int64()), pa.string())
        return pc.binary_join_element_wise(
            pa.array([prefix] * len(idx), pa.string()), s, "")

    def flat(a):
        return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

    rng = np.random.default_rng(41)
    # skewed subjects (hubs at low ids), uniform objects
    si = np.minimum((n_entities * rng.random(n_facts) ** 2).astype(
        np.int64), n_entities - 1)
    oi = rng.integers(0, n_entities, n_facts)
    subj = uri("http://ex.org/e", si)
    # ~5% of fact subjects asserted under the entity's first alias
    n_alias = n_entities // 10
    alias_mask = (si < n_alias) & (rng.random(n_facts) < 0.35)
    subj = pc.if_else(pa.array(alias_mask),
                      pc.binary_join_element_wise(
                          subj, pa.array(["-alias0"] * n_facts), ""),
                      subj)
    pred = uri("http://ex.org/p/", si % 5)
    obj = uri("http://ex.org/e", oi)
    url = uri("http://src.org/page", rng.integers(0, 50_000, n_facts))
    facts = pa.table({"subj": subj, "pred": pred, "obj": obj,
                      "url": url})

    # sameAs chains: alias0 sameAs e, alias1 sameAs alias0 (half)
    base = uri("http://ex.org/e", np.arange(n_alias))
    a0 = pc.binary_join_element_wise(
        base, pa.array(["-alias0"] * n_alias), "")
    a1 = pc.binary_join_element_wise(
        base[: n_alias // 2], pa.array(["-alias1"] * (n_alias // 2)), "")
    sp = pa.array([OWL_SAMEAS] * n_alias, pa.string())
    sa = pa.table({
        "subj": pa.concat_arrays([flat(a0), flat(a1)]),
        "pred": pa.concat_arrays([sp, sp[: n_alias // 2]]),
        "obj": pa.concat_arrays([flat(base),
                                 flat(a0)[: n_alias // 2]]),
        "url": pa.concat_arrays([
            flat(uri("http://src.org/page", np.arange(n_alias))),
            flat(uri("http://src.org/page",
                     np.arange(n_alias // 2)))])})
    tri = rd.from_arrow(pa.concat_tables([facts, sa])) \
        .repartition(64).materialize()
    n_in = tri.count()
    def mark(msg):
        print(f"[stress] {msg}", file=sys.stderr, flush=True)
    mark(f"generated {n_in} triples")

    out = {"n_triples_in": n_in, "n_entities": n_entities,
           "n_sameas": int(n_alias + n_alias // 2),
           "num_cpus": num_cpus}

    spo = tri.select_columns(["subj", "pred", "obj"]).materialize()

    t0 = time.monotonic()
    closed = sameas_closure(spo).materialize()
    out["sameas_closure_local_sec"] = round(time.monotonic() - t0, 1)
    mark(f"closure local {out['sameas_closure_local_sec']}s")
    out["n_facts_closed"] = closed.count()

    t0 = time.monotonic()
    closed_j = sameas_closure(spo, components_mode="join").materialize()
    out["sameas_closure_join_sec"] = round(time.monotonic() - t0, 1)
    mark(f"closure join {out['sameas_closure_join_sec']}s")
    assert closed_j.count() == out["n_facts_closed"]

    t0 = time.monotonic()
    cut = partition_cut_profile(spo, n_parts_list=(64, 1024)
                                ).to_pandas().set_index("n_parts")
    out["partition_cut_sec"] = round(time.monotonic() - t0, 1)
    mark(f"partition cut {out['partition_cut_sec']}s")
    out["cut_share_64"] = float(cut.loc[64, "cut_share"])
    out["balance_64"] = float(cut.loc[64, "balance"])

    t0 = time.monotonic()
    prov = triple_provenance(tri).materialize()
    out["provenance_sec"] = round(time.monotonic() - t0, 1)
    mark(f"provenance {out['provenance_sec']}s")
    out["n_provenance"] = prov.count()

    t0 = time.monotonic()
    res = resolve_conflicts(tri).materialize()
    out["resolve_conflicts_sec"] = round(time.monotonic() - t0, 1)
    out["n_slots"] = res.count()

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()

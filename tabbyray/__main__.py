"""CLI entrypoint — the ``ray job submit`` surface.

    ray job submit -- python -m tabbyray \
        --pages /data/pages/ --kb /data/kb.parquet --out /data/out \
        --shards 64 [--canonicalize] [--ntriples] [--gold gold.parquet]

Runs the resumable sharded pipeline (tabbyray.lineage): a re-submission
of the same command after a kill resumes from the last completed shard
manifest. Owns its Ray session (guarded init) — library code never
calls ray.init.

A second surface runs the training-data curation pipeline:

    python -m tabbyray curate --docs /data/documents.parquet --out /data/curated

A third runs the end-to-end CRAWL curation pipeline (ops.crawlpipe):

    python -m tabbyray crawl --pages /data/captures.parquet \
        --robots /data/robots.parquet --blocklist /data/blocklist.parquet \
        --out /data/curated_crawl
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _init_ray(num_cpus=None):
    import ray
    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True,
                  "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), **kwargs)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def curate_main(argv) -> int:
    ap = argparse.ArgumentParser(prog="tabbyray curate")
    ap.add_argument("--docs", required=True,
                    help="documents parquet (doc_id, text, ...)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray
    _init_ray(args.num_cpus)
    import ray.data as rd

    from tabbyray.curation import curate

    docs = rd.read_parquet(args.docs, columns=["doc_id", "text"])
    out = curate(docs, min_tokens=args.min_tokens)
    # partitioned by split so a consumer reads one split without a scan
    out.write_parquet(args.out, partition_cols=["split"])
    counts = {}
    for d in sorted(glob.glob(os.path.join(args.out, "split=*"))):
        import pyarrow.parquet as pq
        n = sum(pq.ParquetFile(f).metadata.num_rows
                for f in glob.glob(os.path.join(d, "*.parquet")))
        counts[os.path.basename(d).split("=", 1)[1]] = n
    print(json.dumps({"out": args.out, "rows_per_split": counts}))
    ray.shutdown()
    return 0


def crawl_main(argv) -> int:
    """Crawl-curation surface: captures + robots + blocklist parquet in,
    curated (clean_url, text, n_words) parquet out — RESUMABLE: the
    shard-associative stage checkpoints per input shard (lineage
    manifests, atomic commits), the cross-shard finalize is keyed on
    the committed flags fingerprint, so a re-submission after a kill
    skips everything already done. Omitting --robots or --blocklist
    runs with that gate open (typed empty table)."""
    ap = argparse.ArgumentParser(prog="tabbyray crawl")
    ap.add_argument("--pages", required=True,
                    help="capture-log parquet file or directory "
                         "(url, warc_ts, html)")
    ap.add_argument("--robots", default=None,
                    help="robots parquet (host, robots_txt)")
    ap.add_argument("--blocklist", default=None,
                    help="blocklist parquet (domain)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--shards", type=int, default=8,
                    help="input-file shards for the resumable flags "
                         "stage (capped at the file count)")
    ap.add_argument("--buckets", type=int, default=16,
                    help="hash-bucket partitions for the output layout "
                         "(bucket=K dirs; a rerun can skip or repair "
                         "buckets independently)")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray
    _init_ray(args.num_cpus)

    from tabbyray.lineage import run_crawl_resumable

    summary = run_crawl_resumable(
        args.pages, args.out, robots_path=args.robots,
        blocklist_path=args.blocklist, num_shards=args.shards,
        buckets=args.buckets)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


def kgbuild_main(argv) -> int:
    """KG materialize surface: a raw multi-source triple stream in
    (subj, pred, obj [, url]), a loadable KG out —

    1. owl:sameAs closure (identity resolution, alias facts merged,
       sameAs triples dropped, distinct) -> ``facts/`` written
       HASH-BUCKET-PARTITIONED on subj (bucket=K dirs: co-locates each
       entity's adjacency and lets a rerun repair buckets
       independently);
    2. per-fact provenance rollup (when a source column is present)
       -> ``provenance/``;
    3. functional-constraint validation on the CLOSED facts (alias
       merges can surface violations raw data hides) ->
       ``violations/``.

    RESUMABLE at stage granularity: each stage directory carries a
    ``_MANIFEST.json`` with a fingerprint of the input file list
    (paths + sizes) and the stage's own config, committed atomically
    AFTER the stage's parquet lands. A re-submission after a kill
    skips committed stages (byte-identical output stays in place) and
    recomputes only uncommitted ones; a stage dir without a manifest
    is wiped before rewrite so partial output never double-counts.
    """
    ap = argparse.ArgumentParser(prog="tabbyray kgbuild")
    ap.add_argument("--triples", required=True,
                    help="triples parquet file or directory "
                         "(subj, pred, obj [, url])")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--functional", default="",
                    help="comma-separated predicates declared "
                         "functional (validated post-closure)")
    ap.add_argument("--buckets", type=int, default=16,
                    help="hash-bucket partitions for facts/")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray
    _init_ray(args.num_cpus)
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from tabbyray.ops.kgconstruct import (functional_violations,
                                          sameas_closure,
                                          triple_provenance)

    files = ([args.triples] if os.path.isfile(args.triples)
             else sorted(glob.glob(os.path.join(args.triples,
                                                "**", "*.parquet"),
                         recursive=True)))
    names = set(pq.read_schema(files[0]).names)
    has_source = "url" in names
    cols = ["subj", "pred", "obj"] + (["url"] if has_source else [])
    tri = rd.read_parquet(files, columns=cols)

    import hashlib
    import shutil
    input_fp = hashlib.md5(json.dumps(
        [[f, os.path.getsize(f)] for f in files]).encode()).hexdigest()

    def stage_done(d: str, fp: str) -> "dict | None":
        m = os.path.join(d, "_MANIFEST.json")
        if os.path.exists(m):
            got = json.load(open(m))
            if got.get("fingerprint") == fp:
                return got
        return None

    def commit_stage(d: str, fp: str, extra: dict) -> None:
        os.makedirs(d, exist_ok=True)   # an empty stage writes no files
        m = os.path.join(d, "_MANIFEST.json")
        tmp = m + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"fingerprint": fp, **extra}, f)
        os.replace(tmp, m)

    def fresh_dir(d: str) -> None:
        # no manifest -> any content is a partial write; wipe it
        if os.path.isdir(d):
            shutil.rmtree(d)

    summary = {"out": args.out, "stages_run": [],
               "stages_skipped": []}
    fpreds = [p for p in args.functional.split(",") if p]

    facts_dir = os.path.join(args.out, "facts")
    facts_fp = f"{input_fp}:buckets={args.buckets}"
    done = stage_done(facts_dir, facts_fp)
    if done:
        summary["n_facts"] = done["n_rows"]
        summary["stages_skipped"].append("facts")
        facts = None
    else:
        fresh_dir(facts_dir)
        facts = sameas_closure(
            tri.select_columns(["subj", "pred", "obj"])).materialize()
        summary["n_facts"] = facts.count()

        def bucketed(t: pa.Table) -> pa.Table:
            from tabbyray.ops.sampling import _hash64
            b = [(_hash64(v) % args.buckets)
                 for v in t.column("subj").to_pylist()]
            return t.append_column("bucket", pa.array(b, pa.int64()))

        facts.map_batches(bucketed, batch_format="pyarrow") \
            .write_parquet(facts_dir, partition_cols=["bucket"])
        commit_stage(facts_dir, facts_fp,
                     {"n_rows": summary["n_facts"]})
        summary["stages_run"].append("facts")
    summary["facts_dir"] = facts_dir

    if has_source:
        prov_dir = os.path.join(args.out, "provenance")
        done = stage_done(prov_dir, input_fp)
        if done:
            summary["n_provenance"] = done["n_rows"]
            summary["stages_skipped"].append("provenance")
        else:
            fresh_dir(prov_dir)
            prov = triple_provenance(tri).materialize()
            prov.write_parquet(prov_dir)
            summary["n_provenance"] = prov.count()
            commit_stage(prov_dir, input_fp,
                         {"n_rows": summary["n_provenance"]})
            summary["stages_run"].append("provenance")
        summary["provenance_dir"] = prov_dir

    if fpreds:
        viol_dir = os.path.join(args.out, "violations")
        viol_fp = f"{facts_fp}:functional={','.join(sorted(fpreds))}"
        done = stage_done(viol_dir, viol_fp)
        if done:
            summary["n_violations"] = done["n_rows"]
            summary["stages_skipped"].append("violations")
        else:
            if facts is None:   # facts stage was skipped: read back
                facts = rd.read_parquet(
                    sorted(glob.glob(os.path.join(
                        facts_dir, "bucket=*", "*.parquet"))),
                    columns=["subj", "pred", "obj"])
            fresh_dir(viol_dir)
            viol = functional_violations(facts, fpreds).materialize()
            viol.write_parquet(viol_dir)
            summary["n_violations"] = viol.count()
            commit_stage(viol_dir, viol_fp,
                         {"n_rows": summary["n_violations"]})
            summary["stages_run"].append("violations")
        summary["violations_dir"] = viol_dir

    print(json.dumps(summary))
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "curate":
        return curate_main(argv[1:])
    if argv and argv[0] == "crawl":
        return crawl_main(argv[1:])
    if argv and argv[0] == "kgbuild":
        return kgbuild_main(argv[1:])
    ap = argparse.ArgumentParser(prog="tabbyray")
    ap.add_argument("--pages", required=True, help="pages parquet file or directory")
    ap.add_argument("--kb", required=True, help="KB index parquet (FIXTURES.md F2)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--canonicalize", action="store_true",
                    help="also write canonicalized triples")
    ap.add_argument("--ntriples", action="store_true",
                    help="also write a text export of the (canonical) triples")
    ap.add_argument("--format", choices=("ntriples", "rdfxml"),
                    default="ntriples",
                    help="triple export serialization (default ntriples; "
                         "rdfxml emits the reference's RDF/XML document "
                         "shape with its malformations fixed, and implies "
                         "the export even without --ntriples)")
    ap.add_argument("--resolve-entities", action="store_true",
                    help="merge near-duplicate canonical subjects "
                         "(byte-Levenshtein 1 on URI local names, "
                         "connected components) and rewrite triples "
                         "through the resolution map before export")
    ap.add_argument("--gold", default=None,
                    help="gold annotations parquet for P/R evaluation")
    ap.add_argument("--kb-shards", type=int, default=0,
                    help="shard the KB index N ways (fan-out candidate "
                         "generation for KBs larger than worker RAM; "
                         "0 = broadcast the whole index)")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray
    _init_ray(args.num_cpus)

    from tabbyray import lineage, pipeline
    from tabbyray.kb import load_kb

    kb = load_kb(args.kb)
    kb_ref, gaz_ref = pipeline.put_kb(kb)
    skb = None
    if args.kb_shards > 0:
        import pyarrow.parquet as pq

        from tabbyray.kbshard import ShardedKB
        skb = ShardedKB(pq.read_table(args.kb), num_shards=args.kb_shards)
    annotated_dir = os.path.join(args.out, "annotated")
    summary = lineage.run_resumable(args.pages, annotated_dir, kb_ref, gaz_ref,
                                    num_shards=args.shards, skb=skb)

    export = args.ntriples or args.format == "rdfxml"
    if args.canonicalize or export:
        import ray.data as rd

        # resumable canonicalize (lineage manifests for the mapping AND
        # each per-shard rewrite — a kill mid-canonicalize skips the
        # finished shards on re-submission)
        canon_dir = os.path.join(args.out, "canonical_triples")
        summary |= lineage.run_canonicalize_resumable(annotated_dir,
                                                      canon_dir)
        summary["canonical_triples_dir"] = canon_dir
        if args.resolve_entities:
            from tabbyray.ops.linkage import resolve_triple_subjects
            canon_ds = rd.read_parquet(sorted(glob.glob(
                os.path.join(canon_dir, "shard=*", "*.parquet"))))
            resolved = resolve_triple_subjects(canon_ds).materialize()
            res_dir = os.path.join(args.out, "resolved_triples")
            resolved.write_parquet(res_dir)
            merged = resolved.filter(
                lambda r: r["subj"] != r["subj_raw"]).count()
            summary["resolved_triples_dir"] = res_dir
            summary["resolved_subjects_rewritten"] = int(merged)
        if export:
            src_dir = (os.path.join(args.out, "resolved_triples")
                       if args.resolve_entities else canon_dir)
            pat = (os.path.join(src_dir, "*.parquet")
                   if args.resolve_entities
                   else os.path.join(src_dir, "shard=*", "*.parquet"))
            canon_ds = rd.read_parquet(sorted(glob.glob(pat)))
            if args.format == "rdfxml":
                from tabbyray.io import write_rdfxml
                x_dir = os.path.join(args.out, "rdfxml")
                write_rdfxml(canon_ds, x_dir)
                summary["rdfxml_dir"] = x_dir
            else:
                from tabbyray.io import write_ntriples
                nt_dir = os.path.join(args.out, "ntriples")
                write_ntriples(canon_ds, nt_dir)
                summary["ntriples_dir"] = nt_dir

    if args.gold:
        import pandas as pd
        import ray.data as rd

        from tabbyray.metrics import evaluate
        ann_files = sorted(glob.glob(
            os.path.join(annotated_dir, "shard=*", "kind=annotation", "*.parquet")))
        pred = rd.read_parquet(
            ann_files, columns=pipeline.KIND_COLUMNS["annotation"]).to_pandas()
        gold = pd.read_parquet(args.gold)
        summary["metrics"] = evaluate(pred, gold)

    print(json.dumps(summary, indent=1, default=str))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Ray Data pipeline stages composing the KG-construction flow.

Physical plan (SURVEY.md §4.2):

1. ``read_parquet(pages)`` — file/row-group parallel scan; only the
   columns a stage needs are read (``html`` for extraction; the wide
   binary column is dropped immediately after).
2. **extract** — stateless ``map_batches`` tasks (Arrow in/out): HTML ->
   canonical cell rows + NER tags (inline ``data-ner`` attributes take
   precedence; the rule-based tagger fills the rest, with the
   KB-gazetteer broadcast once and cached per worker process).
3. **annotate** — the FIRST shuffle: ``groupby(table_id)`` then
   ``map_groups``; ``table_id = url#table_idx`` is high-cardinality and
   balanced by construction. The KB index is broadcast via ``ray.put``
   once and fetched ONCE per worker process (module-level cache — the
   actor-pool state pattern with stateless-task elasticity; see
   ``_cached_get``). Output is a union-schema dataset (kind ∈
   {annotation, row, triple}) so CEA+CTA+CPA+assembly+triples all
   happen in ONE pass over each group; downstream splits by the
   ``kind`` column (or ``write_parquet(partition_cols=["kind"])``
   writes all three outputs in one execution).
4. **canonicalize** — the SECOND shuffle: salted two-phase groupby on
   the normalized subject surface form (``tabbyray.canonicalize``).
"""

from __future__ import annotations

import os
from typing import Optional

import pyarrow as pa
import ray
import ray.data as rd

from .ops.relational import _resolve_partitions

from .extract import extract_tables, extract_text
from .kb import KBIndex
from .ner import tag_value
from .sti import Weights, annotate_table

# union output schema of the annotate stage
RESULT_SCHEMA = pa.schema([
    ("kind", pa.string()),            # annotation | row | triple
    ("url", pa.string()),
    ("table_idx", pa.int32()),
    ("row_idx", pa.int32()),          # row/triple kinds
    ("cell_type", pa.int32()),        # annotation kind
    ("surface_form", pa.string()),
    ("entity", pa.string()),
    ("aggregated_rank", pa.float64()),
    ("rel_rank", pa.int64()),         # CPA relationship count of the winner
    ("n_candidates", pa.int64()),
    ("data", pa.string()),            # row kind (assembled output row)
    ("row_heading", pa.string()),
    ("column_heading", pa.string()),
    ("subj", pa.string()),            # triple kind
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("obj_is_literal", pa.bool_()),
    ("pred_source", pa.string()),     # cta | cpa | minted
])

CELL_COLUMNS = ["url", "table_idx", "row_idx", "table_id", "data", "row_heading",
                "column_heading", "data_ner", "row_heading_ner", "column_heading_ner"]

_STATE_CACHE: dict[str, object] = {}


def _cached_get(ref):
    """Fetch a broadcast ObjectRef once per worker PROCESS and memoize
    the deserialized value (module-level cache). This gives actor-pool
    state semantics (state loaded once, reused across batches) with
    stateless-task elasticity: no pool ramp-up, and no risk of two
    eagerly-created fixed pools holding every CPU while the read stage
    starves (observed deadlock with fixed pools on this plan — the
    table_id Sort barrier makes the stages sequential, but Ray creates
    every pool at launch)."""
    if ref is None or isinstance(ref, (KBIndex, dict)):
        return ref
    key = ref.hex() if hasattr(ref, "hex") else str(id(ref))
    if key not in _STATE_CACHE:
        _STATE_CACHE[key] = ray.get(ref)
    return _STATE_CACHE[key]


def _extract_batch(batch: pa.Table, gaz, check_text: bool,
                   fill_ner: bool = True) -> pa.Table:
    """S2 replacement (SURVEY.md §2.1): page rows -> canonical cell rows.
    With ``fill_ner=False`` missing NER labels stay None for a
    downstream model-tagger actor stage (``tabbyray.ner_model``)."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    texts = (batch.column("text").to_pylist()
             if "text" in batch.column_names else [None] * len(urls))
    out = {k: [] for k in CELL_COLUMNS}

    def ner_of(inline, value):
        if inline:
            return inline
        return tag_value(value, gaz) if fill_ner else None

    for url, html, text in zip(urls, htmls, texts):
        if check_text and text is not None:
            if extract_text(html) != text:
                raise ValueError(f"text invariant violated for {url}")
        elif b"<table" not in (html if isinstance(html, (bytes, bytearray))
                               else html.encode()).lower():
            continue   # ~10% of crawl pages carry no table: skip the parse
            # (lowercased first: HTML tag names are case-insensitive and
            # the parser handles <TABLE>; the fast-path must not drop them)
        for t_idx, rows in enumerate(extract_tables(html)):
            table_id = f"{url}#{t_idx}"
            for r_idx, r in enumerate(rows):
                out["url"].append(url)
                out["table_idx"].append(t_idx)
                out["row_idx"].append(r_idx)
                out["table_id"].append(table_id)
                out["data"].append(r["data"])
                out["row_heading"].append(r["row_heading"])
                out["column_heading"].append(r["column_heading"])
                out["data_ner"].append(ner_of(r["data_ner"], r["data"]))
                out["row_heading_ner"].append(ner_of(r["row_heading_ner"], r["row_heading"]))
                out["column_heading_ner"].append(ner_of(r["column_heading_ner"], r["column_heading"]))
    return pa.table({
        "url": pa.array(out["url"], pa.string()),
        "table_idx": pa.array(out["table_idx"], pa.int32()),
        "row_idx": pa.array(out["row_idx"], pa.int32()),
        "table_id": pa.array(out["table_id"], pa.string()),
        "data": pa.array(out["data"], pa.string()),
        "row_heading": pa.array(out["row_heading"], pa.string()),
        "column_heading": pa.array(out["column_heading"], pa.string()),
        "data_ner": pa.array(out["data_ner"], pa.string()),
        "row_heading_ner": pa.array(out["row_heading_ner"], pa.string()),
        "column_heading_ner": pa.array(out["column_heading_ner"], pa.string()),
    })


_ROW_FIELDS = ("url", "table_idx", "row_idx", "data", "row_heading",
               "column_heading", "data_ner", "row_heading_ner",
               "column_heading_ner")


def _kind_table(kind: str, cols: dict[str, list], n: int) -> pa.Table:
    """Full-union-schema table for one result kind: present columns from
    the lists, absent ones as typed nulls — no per-row dict work."""
    arrays = []
    for f in RESULT_SCHEMA:
        if f.name == "kind":
            arrays.append(pa.array([kind] * n, pa.string()))
        elif f.name in cols:
            arrays.append(pa.array(cols[f.name], f.type))
        else:
            arrays.append(pa.nulls(n, f.type))
    return pa.Table.from_arrays(arrays, schema=RESULT_SCHEMA)


def _annotate_partition(part: pa.Table, kb: KBIndex, w: Weights) -> pa.Table:
    """All canonical tables of one hash partition -> union-schema result
    rows. One Python call annotates ~hundreds of tables (contiguous
    slices of the Arrow-sorted partition) — the explicit-partition
    pattern of ops.relational.hash_aggregate. Row dicts are built once
    straight from Arrow columns (a pandas ``to_dict("records")`` here
    was ~half the stage's CPU)."""
    if part.num_rows == 0:
        return RESULT_SCHEMA.empty_table()
    part = part.sort_by([("table_id", "ascending"), ("row_idx", "ascending")])
    col_vals = [part.column(name).to_pylist() for name in _ROW_FIELDS]
    tids = part.column("table_id").to_pylist()
    rows_all = [dict(zip(_ROW_FIELDS, vals)) for vals in zip(*col_vals)]

    ann = {k: [] for k in ("url", "table_idx", "cell_type", "surface_form",
                           "entity", "aggregated_rank", "rel_rank", "n_candidates")}
    rowk = {k: [] for k in ("url", "table_idx", "row_idx", "data",
                            "row_heading", "column_heading")}
    trik = {k: [] for k in ("url", "table_idx", "row_idx", "subj", "pred",
                            "obj", "obj_is_literal", "pred_source")}

    n = len(rows_all)
    start = 0
    while start < n:
        end = start
        tid = tids[start]
        while end < n and tids[end] == tid:
            end += 1
        rows = rows_all[start:end]
        start = end
        url = rows[0]["url"]
        tidx = rows[0]["table_idx"]
        res = annotate_table(rows, kb, w)
        for cell_type, cells_of_type in res.cells.items():
            for surface, cell in cells_of_type.items():
                wnr = cell.winner()
                if wnr is not None:
                    ann["url"].append(url)
                    ann["table_idx"].append(tidx)
                    ann["cell_type"].append(cell_type)
                    ann["surface_form"].append(surface)
                    ann["entity"].append(wnr.entity)
                    ann["aggregated_rank"].append(wnr.agg_rank)
                    ann["rel_rank"].append(wnr.rel_rank)
                    ann["n_candidates"].append(len(cell.candidates))
        for r in res.annotated_rows:
            rowk["url"].append(url)
            rowk["table_idx"].append(tidx)
            rowk["row_idx"].append(r["row_idx"])
            rowk["data"].append(r["data"])
            rowk["row_heading"].append(r["row_heading"])
            rowk["column_heading"].append(r["column_heading"])
        for t in res.triples:
            trik["url"].append(url)
            trik["table_idx"].append(tidx)
            trik["row_idx"].append(t["row_idx"])
            trik["subj"].append(t["subj"])
            trik["pred"].append(t["pred"])
            trik["obj"].append(t["obj"])
            trik["obj_is_literal"].append(t["obj_is_literal"])
            trik["pred_source"].append(t["pred_source"])

    return pa.concat_tables([
        _kind_table("annotation", ann, len(ann["url"])),
        _kind_table("row", rowk, len(rowk["url"])),
        _kind_table("triple", trik, len(trik["url"])),
    ])


# --------------------------------------------------------------------------
# stage compositions (Dataset -> Dataset; lazy, streaming)
# --------------------------------------------------------------------------

def read_pages(path, columns: Optional[list[str]] = None,
               override_num_blocks: Optional[int] = None) -> rd.Dataset:
    """Prune at the read: extraction only needs url+html (+text when
    verifying the byte-identical invariant).

    Block count defaults to ~3x cluster CPUs instead of Ray's ~200-block
    read heuristic: every downstream stage launches one task per block,
    and the driver's per-task scheduling cost is serial — hundreds of
    tiny blocks turn into a data-proportional serial term that caps
    scaling (measured: ~74s of driver time at 1,400 tasks)."""
    if override_num_blocks is None:
        # 64 blocks measured best across configs on this node (160k
        # pages / 8 cpus: 24 blocks -> 75s, 64 -> 60s, 128 -> 63s, 448
        # (Ray default heuristic) -> 66s; 20k pages / 32 cpus: 256
        # blocks -> 15s, ~64 -> 7.6s): enough grain to smooth
        # per-table cost skew, few enough that driver scheduling stays
        # negligible. Re-validated for the FUSED path (20k/32, best-of-2
        # extract+annotate+write): 64 -> 3.3s, 128 -> 3.4s, 256 -> 4.2s.
        # On a multi-node cluster scale this with total cores (~2-8
        # blocks per core).
        override_num_blocks = 64
    if _is_warc_input(path):
        # Common-Crawl-native ingest: stream records out of sharded
        # .warc.gz (one read task per shard file, incremental gzip-
        # member decode — tabbyray/warc.py), then keep only the
        # columns extraction needs. warc_ts/status/rec_type drop here,
        # the binary html drops after the extract map as usual.
        from .warc import read_warc
        if columns and "text" in columns:
            raise ValueError(
                "check_text_invariant needs a stored text column; WARC "
                "captures carry only the raw body — run against parquet "
                "pages to verify the invariant")
        pages = read_warc(path)
        return pages.select_columns(["url", "html"])
    return rd.read_parquet(path, columns=columns or ["url", "html"],
                           override_num_blocks=override_num_blocks)


def _is_warc_input(path) -> bool:
    """True when the pages input is WARC: a .warc/.warc.gz file (or
    list of them), or a directory containing any. Mixed parquet+WARC
    lists raise — each element would silently take the first
    element's reader otherwise."""
    import glob as _glob
    if isinstance(path, (list, tuple)):
        if not path:
            return False
        flags = {_is_warc_input(p) for p in path}
        if len(flags) > 1:
            raise ValueError(
                "mixed input list (both WARC and non-WARC paths): "
                f"{list(path)!r} — pass one format per run")
        return flags.pop()
    if str(path).endswith((".warc", ".warc.gz")):
        return True
    if os.path.isdir(path):
        return (not _glob.glob(os.path.join(path, "*.parquet"))
                and bool(_glob.glob(os.path.join(path, "*.warc"))
                         or _glob.glob(os.path.join(path, "*.warc.gz"))))
    return False


def extract_stage(pages: rd.Dataset, gazetteer_ref=None, *,
                  check_text_invariant: bool = False,
                  batch_size: int = 64, fill_ner: bool = True) -> rd.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        gaz = _cached_get(gazetteer_ref)
        return _extract_batch(batch, gaz, check_text_invariant, fill_ner)

    return pages.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def _cached_tagger(model_ref):
    """NERTagger instance cached per worker process (same pattern as
    ``_cached_get`` — model deserialized once, memo shared)."""
    from .ner_model import NERTagger
    key = "tagger-" + (model_ref.hex() if hasattr(model_ref, "hex")
                       else str(id(model_ref)))
    if key not in _STATE_CACHE:
        _STATE_CACHE[key] = NERTagger(model_ref)
    return _STATE_CACHE[key]


def extract_annotate_stage(pages: rd.Dataset, kb_ref, gazetteer_ref=None, *,
                           weights: Optional[Weights] = None,
                           check_text_invariant: bool = False,
                           ner_model_ref=None,
                           batch_size: int = 64) -> rd.Dataset:
    """ZERO-SHUFFLE extract+annotate: one fused ``map_batches``.

    The per-table grouping the hash-partition shuffle provides is
    already guaranteed by construction here: a canonical table never
    spans pages, and each page's rows are extracted inside ONE batch —
    so extraction output is table-contiguous, and running the per-table
    STI inside the same UDF removes the pipeline's only all-to-all
    exchange over the full cell stream (at 100 TB that exchange moves
    every extracted cell; this path moves none). Doing both steps in
    one UDF also makes the invariant airtight: no intermediate stream
    exists for Ray's dynamic block splitting to cut a table in half.

    Use ``annotate_stage`` (the partitioned path) when cells come from
    a source that is NOT page-aligned (e.g. a pre-extracted cell table
    with arbitrary row order)."""
    w = weights or Weights()

    def fn(batch: pa.Table) -> pa.Table:
        gaz = _cached_get(gazetteer_ref)
        cells = _extract_batch(batch, gaz, check_text_invariant,
                               fill_ner=ner_model_ref is None)
        if ner_model_ref is not None:
            cells = _cached_tagger(ner_model_ref)(cells)
        kb = _cached_get(kb_ref)
        return _annotate_partition(cells, kb, w)

    return pages.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def annotate_stage(cells: rd.Dataset, kb_ref, weights: Optional[Weights] = None,
                   num_cpus: float = 1, num_partitions: "int | None" = None) -> rd.Dataset:
    """The per-table shuffle + annotate pass (first shuffle).

    Explicit partitioned plan: a vectorized map adds
    ``part = hash(table_id) % P``; the groupby shuffle then moves each
    table's rows to exactly one partition, and one task per partition
    annotates all of its tables (``_annotate_partition``). table_id is
    high-cardinality and balanced, so partitions even out; P bounds
    task count independently of table count (at web scale P scales with
    cluster size, not data size)."""
    num_partitions = _resolve_partitions(num_partitions)
    w = weights or Weights()

    def add_part(t: pa.Table) -> pa.Table:
        import pandas as pd
        ids = t.column("table_id").to_pandas()
        part = (pd.util.hash_pandas_object(ids, index=False) % num_partitions)
        return t.append_column("part", pa.array(part.astype("int64")))

    def fn(group: pa.Table) -> pa.Table:
        kb = _cached_get(kb_ref)
        if "part" in group.column_names:
            group = group.drop_columns(["part"])
        return _annotate_partition(group, kb, w)

    return (cells.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(fn, batch_format="pyarrow", num_cpus=num_cpus))


def annotate_stage_sharded(cells: rd.Dataset, skb, weights: Optional[Weights] = None,
                           num_cpus: float = 1,
                           num_partitions: "int | None" = None) -> rd.Dataset:
    """The per-table annotate pass against a SHARDED KB (SURVEY.md §2.5
    fallback; `tabbyray/kbshard.py`). Same output as ``annotate_stage``
    (asserted in tests/test_kbshard.py); used when the KB exceeds
    worker RAM, where candidate generation must become a fan-out /
    gather exchange instead of a per-worker broadcast.

    Plan: distinct norms -> sharded candidate payload (one task per KB
    shard) -> payload co-partitioned back to the table partitions that
    need it -> one tagged-union shuffle with the cells -> per-partition
    ``SubsetKB`` scoring (identical scoring code path)."""
    num_partitions = _resolve_partitions(num_partitions)
    import pyarrow.compute as pc

    from .constants import LABEL_SEP
    from .kbshard import (PAYLOAD_SCHEMA, SubsetKB,
                          sharded_candidate_payload)
    from .normalize import normalize_entry
    from .ops.relational import hash_aggregate

    w = weights or Weights()
    ancestors_ref = skb.ancestors_ref

    def add_part(t: pa.Table) -> pa.Table:
        import pandas as pd
        ids = t.column("table_id").to_pandas()
        part = (pd.util.hash_pandas_object(ids, index=False) % num_partitions)
        return t.append_column("part", pa.array(part.astype("int64")))

    # the DAG fans out from the cells three ways (cells union branch,
    # demand pairs, distinct norms); Ray Data does not share common
    # sub-plans across branches, so materialize the extracted cells once
    # — object-store blocks, spillable — instead of re-running the
    # read+extract stages per branch
    cells_p = cells.map_batches(add_part, batch_format="pyarrow").materialize()

    def norm_pairs(t: pa.Table) -> pa.Table:
        # batch-distinct (part, norm) demand pairs; exact global dedup
        # happens at the payload-routing merge (cheap, in-memory)
        pairs: set[tuple[int, str]] = set()
        parts = t.column("part").to_pylist()
        datas = t.column("data").to_pylist()
        rhs = t.column("row_heading").to_pylist()
        chs = t.column("column_heading").to_pylist()
        for part, data, rh, ch in zip(parts, datas, rhs, chs):
            n = normalize_entry(data or "")
            if n:
                pairs.add((part, n))
            for role_val in (rh, ch):
                for s in (role_val or "").split(LABEL_SEP):
                    n = normalize_entry(s)
                    if n:
                        pairs.add((part, n))
        ps = sorted(pairs)
        return pa.table({"part": pa.array([p for p, _ in ps], pa.int64()),
                         "norm": pa.array([n for _, n in ps], pa.string())})

    pairs = cells_p.map_batches(norm_pairs, batch_format="pyarrow")

    def pair_ones(t: pa.Table) -> pa.Table:
        return pa.table({"norm": t.column("norm"),
                         "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1)})

    norms = hash_aggregate(pairs.map_batches(pair_ones, batch_format="pyarrow"),
                           ["norm"], {"one": "n"}).drop_columns(["n"])
    payload = sharded_candidate_payload(norms, skb)

    # ---- route payload rows to the table partitions that demand them
    ROUTE_SCHEMA = pa.schema([("norm", pa.string()), ("part", pa.int64()),
                              ("pos", pa.int32()), ("uri", pa.string()),
                              ("types", pa.list_(pa.string())),
                              ("parents", pa.list_(pa.string())),
                              ("neighbors", pa.list_(pa.string())),
                              ("props", pa.list_(pa.string())),
                              ("side", pa.int8())])

    def pad_pairs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays([
            t.column("norm"), t.column("part"),
            pa.nulls(n, pa.int32()), pa.nulls(n, pa.string()),
            pa.nulls(n, pa.list_(pa.string())), pa.nulls(n, pa.list_(pa.string())),
            pa.nulls(n, pa.list_(pa.string())), pa.nulls(n, pa.list_(pa.string())),
            pa.nulls(n, pa.int8()).fill_null(0)], schema=ROUTE_SCHEMA)

    def pad_payload(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays([
            t.column("norm"), pa.nulls(n, pa.int64()),
            t.column("pos"), t.column("uri"), t.column("types"),
            t.column("parents"), t.column("neighbors"), t.column("props"),
            pa.nulls(n, pa.int8()).fill_null(1)], schema=ROUTE_SCHEMA)

    tagged = (pairs.map_batches(pad_pairs, batch_format="pyarrow")
              .union(payload.map_batches(pad_payload, batch_format="pyarrow")))

    def add_norm_part(t: pa.Table) -> pa.Table:
        import pandas as pd
        h = pd.util.hash_pandas_object(t.column("norm").to_pandas(), index=False)
        return t.append_column("_np", pa.array((h % 64).astype("int64")))

    def route(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_np"])
        is_pair = pc.equal(g.column("side"), 0)
        pair_rows = g.filter(is_pair)
        pay = g.filter(pc.invert(is_pair))
        demand: dict[str, set[int]] = {}
        for norm, part in zip(pair_rows.column("norm").to_pylist(),
                              pair_rows.column("part").to_pylist()):
            demand.setdefault(norm, set()).add(part)
        idx: list[int] = []
        parts_out: list[int] = []
        for i, norm in enumerate(pay.column("norm").to_pylist()):
            for part in sorted(demand.get(norm, ())):
                idx.append(i)
                parts_out.append(part)
        if not idx:
            return ROUTE_SCHEMA.empty_table()
        return pay.take(idx).set_column(
            1, "part", pa.array(parts_out, pa.int64()))

    routed = (tagged.map_batches(add_norm_part, batch_format="pyarrow")
              .groupby("_np").map_groups(route, batch_format="pyarrow"))

    # ---- final union shuffle: cells + their candidate payload per part
    FINAL_CELL_FIELDS = [(c, pa.string()) if c not in ("table_idx", "row_idx")
                         else (c, pa.int32()) for c in CELL_COLUMNS]
    FINAL_SCHEMA = pa.schema(
        [("part", pa.int64()), ("side", pa.int8())]
        + FINAL_CELL_FIELDS
        + [("norm", pa.string()), ("pos", pa.int32()), ("uri", pa.string()),
           ("types", pa.list_(pa.string())), ("parents", pa.list_(pa.string())),
           ("neighbors", pa.list_(pa.string())),
           ("props", pa.list_(pa.string()))])

    def pad_cells(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arrays = [t.column("part"), pa.nulls(n, pa.int8()).fill_null(0)]
        arrays += [t.column(c).cast(ty) for c, ty in FINAL_CELL_FIELDS]
        arrays += [pa.nulls(n, FINAL_SCHEMA.field(name).type)
                   for name in ("norm", "pos", "uri", "types", "parents",
                                "neighbors", "props")]
        return pa.Table.from_arrays(arrays, schema=FINAL_SCHEMA)

    def pad_routed(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arrays = [t.column("part"), pa.nulls(n, pa.int8()).fill_null(1)]
        arrays += [pa.nulls(n, ty) for _c, ty in FINAL_CELL_FIELDS]
        arrays += [t.column("norm"), t.column("pos"), t.column("uri"),
                   t.column("types"), t.column("parents"),
                   t.column("neighbors"), t.column("props")]
        return pa.Table.from_arrays(arrays, schema=FINAL_SCHEMA)

    final_union = (cells_p.map_batches(pad_cells, batch_format="pyarrow")
                   .union(routed.map_batches(pad_routed, batch_format="pyarrow")))

    def annotate(group: pa.Table) -> pa.Table:
        is_cell = pc.equal(group.column("side"), 0)
        cells_t = group.filter(is_cell).select(CELL_COLUMNS)
        pay = group.filter(pc.invert(is_cell))
        by_norm: dict[str, dict[int, str]] = {}
        rows: dict[str, tuple] = {}
        for norm, pos, uri, ty, par, nb, pr in zip(
                pay.column("norm").to_pylist(), pay.column("pos").to_pylist(),
                pay.column("uri").to_pylist(), pay.column("types").to_pylist(),
                pay.column("parents").to_pylist(),
                pay.column("neighbors").to_pylist(),
                pay.column("props").to_pylist()):
            by_norm.setdefault(norm, {})[pos] = uri
            rows[uri] = (ty or [], par or [], nb or [], pr or [])
        cand_lists = {norm: [u for _p, u in sorted(d.items())]
                      for norm, d in by_norm.items()}
        kb = SubsetKB(cand_lists, rows, _cached_get(ancestors_ref))
        return _annotate_partition(cells_t, kb, w)

    return (final_union.groupby("part")
            .map_groups(annotate, batch_format="pyarrow", num_cpus=num_cpus))


KIND_COLUMNS = {
    "annotation": ["url", "table_idx", "cell_type", "surface_form", "entity",
                   "aggregated_rank", "rel_rank", "n_candidates"],
    "row": ["url", "table_idx", "row_idx", "data", "row_heading", "column_heading"],
    "triple": ["url", "table_idx", "row_idx", "subj", "pred", "obj",
               "obj_is_literal", "pred_source"],
}


def split_kind(results: rd.Dataset, kind: str) -> rd.Dataset:
    import pyarrow.compute as pc
    keep = KIND_COLUMNS[kind]
    return results.map_batches(
        lambda t, k=kind, cols=keep: t.filter(pc.equal(t["kind"], k)).select(cols),
        batch_format="pyarrow",
    )


def kg_pipeline(pages_path, kb_ref, gazetteer_ref=None, *,
                weights: Optional[Weights] = None,
                check_text_invariant: bool = False,
                ner_model_ref=None,
                annotate_mode: str = "fused") -> rd.Dataset:
    """pages parquet -> union-schema results Dataset (lazy).

    ``annotate_mode``: "fused" (default) extracts and annotates in ONE
    ``map_batches`` — zero shuffles, valid because extraction is
    page-aligned and tables never span pages (``extract_annotate_stage``);
    "partitioned" runs the explicit hash-partition plan (required when
    cells are not page-aligned, and used by the sharded-KB path).
    Both are output-identical (tested).

    ``ner_model_ref``: broadcast ref of a trained ``ner_model`` NB
    model; when given, missing NER labels are filled by the model
    tagger (per-worker cached state in fused mode; an autoscaling
    ACTOR-POOL stage in partitioned mode) — the model-grade replacement
    for the inline gazetteer fallback on pages without ``data-ner``."""
    pages = read_pages(pages_path,
                       columns=["url", "html", "text"] if check_text_invariant else None)
    if annotate_mode == "fused":
        return extract_annotate_stage(
            pages, kb_ref, gazetteer_ref, weights=weights,
            check_text_invariant=check_text_invariant,
            ner_model_ref=ner_model_ref)
    cells = extract_stage(pages, gazetteer_ref,
                          check_text_invariant=check_text_invariant,
                          fill_ner=ner_model_ref is None)
    if ner_model_ref is not None:
        from .ner_model import ner_stage
        cells = ner_stage(cells, ner_model_ref)
    return annotate_stage(cells, kb_ref, weights)


def kg_pipeline_sharded(pages_path, skb, gazetteer_ref=None, *,
                        weights: Optional[Weights] = None,
                        check_text_invariant: bool = False,
                        ner_model_ref=None) -> rd.Dataset:
    """pages parquet -> union-schema results via the SHARDED-KB path
    (`annotate_stage_sharded`); output-identical to ``kg_pipeline``.
    Composes with the NER model actor stage like the broadcast path."""
    pages = read_pages(pages_path,
                       columns=["url", "html", "text"] if check_text_invariant else None)
    cells = extract_stage(pages, gazetteer_ref,
                          check_text_invariant=check_text_invariant,
                          fill_ner=ner_model_ref is None)
    if ner_model_ref is not None:
        from .ner_model import ner_stage
        cells = ner_stage(cells, ner_model_ref)
    return annotate_stage_sharded(cells, skb, weights)


def put_kb(kb: KBIndex):
    """Broadcast the KB index (and its gazetteer) once per job."""
    return ray.put(kb), ray.put(kb.gazetteer())

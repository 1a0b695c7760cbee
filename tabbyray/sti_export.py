"""STI intermediate export — makes the flagship externally verifiable.

The per-table STI scoring (`tabbyray.sti`) is not expressible as one
DuckDB query over the input pages, so the driver's SQL-oracle gate
could previously only do rows-only checks on the ``sti_*`` family.
This module exports the pipeline's INTERMEDIATES — the per-cell
candidate/score table with every factor rank, the raw extracted cell
rows, the per-table G3 counters and the materialized triples — to a
FIXED parquet path, so static oracle SQL can independently recompute:

* C6/C7 aggregate arithmetic from the factor columns
  (`components/CanonicalTableAnnotator.php:860-863`, `:382-415`);
* C8 winner argmax as ``row_number() OVER (ORDER BY agg_rank DESC,
  ord)`` (`commands/SpreadsheetController.php:588-592`);
* J2/M8 result assembly as a substitution join (`:570-684`);
* G3/G4 counters (`:702-727`);
* M1 normalization as a regexp_replace chain
  (`components/CanonicalTableAnnotator.php:121-137`) and C1 Levenshtein
  via DuckDB ``levenshtein()`` on the ASCII subset (`:223-237`);
* full triple materialization + canonicalization over the KB edges.

Export content depends ONLY on the fixture (seed / page count), never
on the driver's ``sf_dir``, so a fixed path is sound: any process that
regenerates it writes byte-identical content. The write is atomic
(tmp dir + rename) and guarded by a completion marker.

Scale note: this is an oracle-support artifact at fixture scale (a few
MB); the driver-side collect below is deliberate and NOT a production
path — the production pipeline (`tabbyray.pipeline`) streams.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from .normalize import normalize_entry
from .sti import Weights, annotate_table

EXPORT_ROOT = "/tmp/tabbyray_sti_oracle"
# bump when the export schema/content definition changes
EXPORT_FORMAT = "x1"

CAND_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("table_idx", pa.int32()),
    ("cell_type", pa.int32()),
    ("surface_form", pa.string()),
    ("norm", pa.string()),            # normalize_entry(surface_form)
    ("ord", pa.int32()),              # candidate insertion order within the cell
    ("entity", pa.string()),
    ("lev", pa.int64()),
    ("ner_rank", pa.float64()),
    ("heading_rank", pa.int64()),
    ("ctx_rank", pa.int64()),
    ("sem_rank", pa.float64()),
    ("rel_rank", pa.int64()),
    ("agg_rank", pa.float64()),
    ("is_literal", pa.bool_()),
])

CELL_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("table_idx", pa.int32()),
    ("row_idx", pa.int32()),
    ("data", pa.string()),
    ("row_heading", pa.string()),
    ("column_heading", pa.string()),
])

COUNTER_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("table_idx", pa.int32()),
    ("total_elements", pa.int64()),
    ("annotated_elements", pa.int64()),
])

TRIPLE_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("table_idx", pa.int32()),
    ("row_idx", pa.int32()),
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("obj_is_literal", pa.bool_()),
    ("pred_source", pa.string()),
])

FILES = ("candidates", "cells", "counters", "triples")


def export_paths(fix_dir: str) -> dict[str, str]:
    """Fixed, fixture-keyed export file paths (independent of sf_dir)."""
    key = f"{os.path.basename(os.path.normpath(fix_dir))}-{EXPORT_FORMAT}"
    d = os.path.join(EXPORT_ROOT, key)
    return {name: os.path.join(d, f"{name}.parquet") for name in FILES}


def _export_batch(batch: pa.Table, gaz, kb, w: Weights) -> pa.Table:
    """pages batch -> union export rows (xkind in candidate|cell|counter|
    triple). Reuses the live extractor and per-table annotator, so the
    export is BY CONSTRUCTION the same computation the flagship runs."""
    from .pipeline import _ROW_FIELDS, _extract_batch

    cells_t = _extract_batch(batch, gaz, check_text=False, fill_ner=True)
    cols = {n: [] for n in ("xkind",) + tuple(CAND_SCHEMA.names)
            + ("row_idx", "data", "row_heading", "column_heading",
               "total_elements", "annotated_elements",
               "subj", "pred", "obj", "obj_is_literal", "pred_source")}

    def emit(kind: str, **kw):
        cols["xkind"].append(kind)
        for k in cols:
            if k != "xkind":
                cols[k].append(kw.get(k))

    col_vals = [cells_t.column(n).to_pylist() for n in _ROW_FIELDS]
    rows_all = [dict(zip(_ROW_FIELDS, vals)) for vals in zip(*col_vals)]
    tids = cells_t.column("table_id").to_pylist()
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
        for r in rows:
            emit("cell", url=url, table_idx=tidx, row_idx=r["row_idx"],
                 data=r["data"] or "", row_heading=r["row_heading"] or "",
                 column_heading=r["column_heading"] or "")
        res = annotate_table(rows, kb, w)
        for cell_type, cells_of_type in res.cells.items():
            for surface, cell in cells_of_type.items():
                for ordn, c in enumerate(cell.candidates):
                    emit("candidate", url=url, table_idx=tidx,
                         cell_type=cell_type, surface_form=surface,
                         norm=normalize_entry(surface), ord=ordn,
                         entity=c.entity, lev=int(c.lev),
                         ner_rank=float(c.ner_rank),
                         heading_rank=int(c.heading_rank),
                         ctx_rank=int(c.ctx_rank),
                         sem_rank=float(c.sem_rank),
                         rel_rank=int(c.rel_rank),
                         agg_rank=float(c.agg_rank),
                         is_literal=bool(c.is_literal))
        emit("counter", url=url, table_idx=tidx,
             total_elements=res.total_elements,
             annotated_elements=res.annotated_elements)
        for t in res.triples:
            emit("triple", url=url, table_idx=tidx, row_idx=t["row_idx"],
                 subj=t["subj"], pred=t["pred"], obj=t["obj"],
                 obj_is_literal=t["obj_is_literal"],
                 pred_source=t["pred_source"])

    types = {f.name: f.type for s in (CAND_SCHEMA, CELL_SCHEMA,
                                      COUNTER_SCHEMA, TRIPLE_SCHEMA)
             for f in s}
    return pa.table({
        "xkind": pa.array(cols["xkind"], pa.string()),
        **{k: pa.array(v, types[k]) for k, v in cols.items() if k != "xkind"},
    })


def _split(table: pa.Table, kind: str, schema: pa.Schema) -> pa.Table:
    import pyarrow.compute as pc
    sub = table.filter(pc.equal(table["xkind"], kind)).select(schema.names)
    return sub.cast(schema)


def ensure_export(fix_dir: str) -> dict[str, str]:
    """Run the instrumented flagship over the fixture pages and write
    candidates/cells/counters/triples parquet once (atomic, idempotent).
    Returns the file paths. Deterministic: same fixture -> same bytes."""
    paths = export_paths(fix_dir)
    d = os.path.dirname(paths["candidates"])
    marker = os.path.join(d, "_COMPLETE.json")
    if os.path.exists(marker):
        return paths

    from . import pipeline
    from .kb import load_kb

    kb = load_kb(os.path.join(fix_dir, "kb.parquet"))
    kb_ref, gaz_ref = pipeline.put_kb(kb)
    w = Weights()

    def fn(batch: pa.Table) -> pa.Table:
        return _export_batch(batch, pipeline._cached_get(gaz_ref),
                             pipeline._cached_get(kb_ref), w)

    ds = pipeline.read_pages(os.path.join(fix_dir, "pages.parquet"))
    union = ds.map_batches(fn, batch_format="pyarrow")
    # fixture-scale collect (few MB) — oracle-support artifact only
    blocks = [b for b in ray.get(union.to_arrow_refs()) if b.num_rows]
    full = pa.concat_tables(blocks, promote_options="default") if blocks \
        else _export_batch(pa.table({"url": pa.array([], pa.string()),
                                     "html": pa.array([], pa.binary())}),
                           kb.gazetteer(), kb, w)

    tmp = d + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    for name, schema in (("candidates", CAND_SCHEMA), ("cells", CELL_SCHEMA),
                         ("counters", COUNTER_SCHEMA),
                         ("triples", TRIPLE_SCHEMA)):
        pq.write_table(_split(full, name.rstrip("s"), schema),
                       os.path.join(tmp, f"{name}.parquet"))
    with open(os.path.join(tmp, "_COMPLETE.json"), "w") as f:
        json.dump({"fixture": os.path.basename(os.path.normpath(fix_dir)),
                   "rows": full.num_rows, "format": EXPORT_FORMAT}, f)
    if os.path.exists(d):
        import shutil
        shutil.rmtree(d)
    os.rename(tmp, d)
    return paths

"""Straight-line (single-process, loop-ordered) corpus runner.

This is the conformance stand-in for the PHP reference, which cannot
execute in this sandbox (Yii2/Postgres/SPARQL): it applies the same
per-table semantics (`tabbyray.sti`, cited line-by-line against the
reference) sequentially over an extracted corpus, producing the gold
annotation and triple sets the distributed Ray pipeline must match at
P/R >= 0.95. The parity test is meaningful because the Ray pipeline
reaches the same numbers through batching, shuffles and actor pools —
everything order-sensitive (tie-breaks, last-wins maps, insertion-order
dedup) must survive the distribution.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .kb import KBIndex
from .sti import Weights, annotate_table


def run_tables(cells: pa.Table, kb: KBIndex, w: Weights | None = None):
    """Annotate every (url, table_idx) group of an extracted cell table,
    in url/table_idx/row_idx order. Returns (annotations_df, triples_df,
    annotated_rows_df, counters)."""
    df = cells.to_pandas().sort_values(["url", "table_idx", "row_idx"], kind="stable")
    ann_rows, triple_rows, out_rows = [], [], []
    total = annotated = 0
    for (url, tidx), g in df.groupby(["url", "table_idx"], sort=True):
        rows = g.to_dict("records")
        res = annotate_table(rows, kb, w)
        total += res.total_elements
        annotated += res.annotated_elements
        for cell_type, cells_of_type in res.cells.items():
            for surface, cell in cells_of_type.items():
                wnr = cell.winner()
                if wnr is not None:
                    ann_rows.append({
                        "url": url, "table_idx": tidx, "cell_type": cell_type,
                        "surface_form": surface, "entity": wnr.entity,
                        "aggregated_rank": wnr.agg_rank,
                        "n_candidates": len(cell.candidates),
                    })
        for t in res.triples:
            triple_rows.append({"url": url, "table_idx": tidx, **t})
        for r in res.annotated_rows:
            out_rows.append({"url": url, "table_idx": tidx, **r})
    ann = pd.DataFrame(ann_rows, columns=["url", "table_idx", "cell_type",
                                          "surface_form", "entity",
                                          "aggregated_rank", "n_candidates"])
    tri = pd.DataFrame(triple_rows, columns=["url", "table_idx", "subj", "pred",
                                             "obj", "obj_is_literal", "row_idx"])
    rows_df = pd.DataFrame(out_rows, columns=["url", "table_idx", "row_idx",
                                              "data", "row_heading", "column_heading"])
    counters = {"total_elements": total, "annotated_elements": annotated}
    return ann, tri, rows_df, counters

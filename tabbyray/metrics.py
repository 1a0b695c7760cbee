"""G3/G4 evaluation: P / R / F1 of pipeline annotations vs gold.

Comparison semantics follow ``calculateT2Dv2``
(`commands/SpreadsheetController.php:453-494`): match on surface form
per table, ``annotated`` when a winner exists, ``correct`` when the
winner equals the gold entity; P/R/F1 formulas at `:712-727`.
"""

from __future__ import annotations

import pandas as pd


def evaluate(pred: pd.DataFrame, gold: pd.DataFrame) -> dict:
    """``pred`` and ``gold``: columns url, table_idx, cell_type,
    surface_form, entity. Returns counters + P/R/F1 overall and per
    cell_type."""
    key = ["url", "table_idx", "cell_type", "surface_form"]
    p = pred[key + ["entity"]].drop_duplicates(subset=key)
    g = gold[key + ["entity"]].drop_duplicates(subset=key).rename(columns={"entity": "gold_entity"})
    m = g.merge(p, on=key, how="left")

    def _stats(df: pd.DataFrame) -> dict:
        total = len(df)
        annotated = int(df["entity"].notna().sum())
        correct = int((df["entity"] == df["gold_entity"]).sum())
        precision = correct / annotated if annotated else 0.0
        recall = correct / total if total else 0.0
        f1 = (2 * precision * recall / (precision + recall)
              if precision and recall else 0.0)
        return {"total": total, "annotated": annotated, "correct": correct,
                "precision": precision, "recall": recall, "f1": f1}

    out = {"overall": _stats(m)}
    for ct, sub in m.groupby("cell_type"):
        out[f"cell_type_{ct}"] = _stats(sub)
    return out


def evaluate_troy200(gold_rows: pd.DataFrame, annotated_rows: pd.DataFrame) -> int:
    """``calculateTroy200`` adapter
    (`commands/SpreadsheetController.php:411-445`, disabled at `:709` in
    the reference but kept as a selectable evaluation adapter): count
    row-aligned exact matches of annotated values against gold rows —
    DATA by whole-cell equality, headings per ``" | "`` split with the
    reference's quadratic any-split-matches counting.

    Both frames need columns (url, table_idx, row_idx, data,
    row_heading, column_heading). Returns the correctly-annotated
    element count."""
    key = ["url", "table_idx", "row_idx"]
    m = gold_rows.merge(annotated_rows, on=key, suffixes=("_g", "_a"))
    correct = int((m["data_g"] == m["data_a"]).sum())
    for col in ("row_heading", "column_heading"):
        for g_val, a_val in zip(m[f"{col}_g"], m[f"{col}_a"]):
            a_splits = (a_val or "").split(" | ")
            for s in (g_val or "").split(" | "):
                correct += sum(1 for a in a_splits if s == a)
    return correct

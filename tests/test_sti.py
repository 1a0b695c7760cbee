"""Per-operator STI unit tests on hand-computed micro tables."""

import pyarrow as pa
import pytest

from tabbyray.constants import CELL_COLUMN_HEADING, CELL_DATA, CELL_ROW_HEADING
from tabbyray.kb import KBIndex
from tabbyray.normalize import php_levenshtein
from tabbyray.sti import (
    Candidate,
    Cell,
    Weights,
    annotate_data,
    annotate_heading,
    annotate_table,
    assemble,
    collect_data_mentions,
    collect_heading_mentions,
    context_rank,
    entry_context,
    heading_rank,
    materialize_triples,
    semantic_similarity,
)

DBO = "http://dbpedia.org/ontology/"
DBR = "http://dbpedia.org/resource/"


def _row(data="", rh="", ch="", dn="NONE", rn="NONE", cn="NONE", idx=0):
    return {"row_idx": idx, "data": data, "row_heading": rh, "column_heading": ch,
            "data_ner": dn, "row_heading_ner": rn, "column_heading_ner": cn}


@pytest.fixture(scope="module")
def kb():
    rows = [
        (DBO + "Location", "Location", True, [], [], []),
        (DBO + "City", "City", True, [], [DBO + "Location"], []),
        (DBO + "Person", "Person", True, [], [], []),
        (DBR + "Berlin", "Berlin", False, [DBO + "City"], [DBO + "Location"],
         [DBR + "Germany"]),
        (DBR + "Germany", "Germany", False, [DBO + "Location"], [], [DBR + "Berlin"]),
    ]
    return KBIndex(pa.table({
        "uri": [r[0] for r in rows], "label": [r[1] for r in rows],
        "is_class": [r[2] for r in rows], "types": [r[3] for r in rows],
        "parents": [r[4] for r in rows], "neighbors": [r[5] for r in rows],
    }))


def test_collect_data_mentions_dedup_and_last_wins():
    rows = [
        _row("Berlin", "Germany", "Capital", dn="LOCATION", idx=0),
        _row("Berlin", "Prussia", "City", dn="MISC", idx=1),   # dup mention
        _row("", "X", "Y", idx=2),                             # invalid data
        _row("!!!", "A", "B", idx=3),                          # normalizes to ''
    ]
    entries, ners, heads = collect_data_mentions(rows)
    assert list(entries) == ["Berlin"]
    # last occurrence wins (components/CanonicalTableAnnotator.php:1040-1041)
    assert ners["Berlin"] == "MISC"
    assert heads["Berlin"] == ["Prussia", "City"]
    # rows with invalid DATA key the '' slot (:1054)
    assert heads[""] == ["A", "B"]


def test_collect_heading_mentions_last_split_ner_quirk():
    rows = [_row("x", rh="Alpha | Beta", rn="LOCATION | PERSON", idx=0)]
    labels, ners = collect_heading_mentions(rows, "row_heading")
    assert list(labels) == ["Alpha", "Beta"]
    # the LAST ner split is assigned to EVERY label of the cell
    # (components/CanonicalTableAnnotator.php:899-901)
    assert ners["Alpha"] == "PERSON"
    assert ners["Beta"] == "PERSON"


def test_entry_context_whole_cell_equality_and_multiplicity():
    rows = [
        _row("Berlin", "Germany", "Capital", idx=0),
        _row("Munich", "Germany", "City", idx=1),     # shares RowHeading
        _row("Paris", "France", "Capital", idx=2),    # shares ColumnHeading
        _row("Berlin", "Prussia", "Old", idx=3),      # second occurrence
    ]
    ctx = entry_context(rows, "Berlin")
    # occurrence row0: rows 0 (self, rh), 1 (rh), 2 (ch) match — ONE push per
    # matching row (the OR is a single condition); occurrence row3: self only
    assert ctx == ["Berlin", "Munich", "Paris", "Berlin"]


def test_context_rank_counts_byte_equal_pairs():
    ctx = ["Germany", "Berlin", "Germany"]
    neighbors = [DBR + "Germany", DBR + "Germany", DBO + "City"]
    # Germany matches 2 neighbors x 2 occurrences = 4 pairs
    assert context_rank(ctx, neighbors) == 4
    # underscored local names do NOT match spaced surface forms
    assert context_rank(["New York"], [DBR + "New_York"]) == 0


def test_heading_rank_min_and_default():
    assert heading_rank([DBO + "City"], ["City"]) == 0
    assert heading_rank([], ["City"]) == 100          # no classes -> default
    assert heading_rank([DBO + "City"], []) == 100    # no labels -> inner default
    d = php_levenshtein("City", "Cyti")
    assert heading_rank([DBO + "City"], ["Cyti", "Zzz"]) == d


def test_semantic_similarity_hand_computed():
    all_cands = {
        "A": {"a1": (DBO + "City",), "a2": (DBO + "City", DBO + "Person")},
        "B": {"b1": (DBO + "City",)},
        "C": {"c1": (DBO + "Person",)},
    }
    out = semantic_similarity(all_cands)
    # a1 votes City both times -> max 2; a2 splits City/Person -> max 1
    # max_rank=2 -> coefficient 10
    assert out["A"]["a1"] == pytest.approx(0.2)
    assert out["A"]["a2"] == pytest.approx(0.1)
    # B: b1 compared to a1,a2,c1 -> City selected vs a1/a2... max <= 3
    assert out["B"]["b1"] > 0


def test_semantic_similarity_empty_classes_skipped():
    out = semantic_similarity({"A": {"a1": ()}, "B": {"b1": (DBO + "City",)}})
    assert out["A"]["a1"] == 0.0


def test_winner_argmax_first_inserted_tie_break():
    cell = Cell("x", CELL_DATA, [
        Candidate("first", agg_rank=2.0),
        Candidate("second", agg_rank=2.0),
        Candidate("third", agg_rank=1.0),
    ])
    assert cell.winner().entity == "first"


def test_literal_short_circuit(kb):
    rows = [_row("1234", "Germany", "Population", dn="NUMBER", idx=0)]
    cells = annotate_data(rows, kb, Weights())
    c = cells["1234"]
    assert len(c.candidates) == 1
    assert c.candidates[0].entity == DBR + "Number"
    assert c.candidates[0].agg_rank == 1.0


def test_annotate_data_scores(kb):
    rows = [
        _row("Berlin", "City", "Capital", dn="LOCATION", idx=0),
        _row("Germany", "Location", "Country", dn="LOCATION", idx=1),
    ]
    cells = annotate_data(rows, kb, Weights())
    berlin = cells["Berlin"].winner()
    assert berlin.entity == DBR + "Berlin"
    # lev=0; ner_rank=1 (City->Location depth 1); heading: types [City] vs
    # labels [City] -> 0 -> term 1; ctx 0; sem per table
    assert berlin.agg_rank >= 3.0
    germany = cells["Germany"].winner()
    assert germany.entity == DBR + "Germany"
    # Germany typed Location directly: int-cast rank 2
    assert germany.ner_rank == 2


def test_annotate_heading_aggregate_stub(kb):
    rows = [_row("x", rh="Berlin", rn="LOCATION", idx=0)]
    cells = annotate_heading(rows, kb, "row_heading", Weights())
    w = cells["Berlin"].winner()
    assert w.entity == DBR + "Berlin"
    # C7: (1 - 0/100) + ner_rank(1) + 1 (hardcoded relationship stub,
    # components/CanonicalTableAnnotator.php:410)
    assert w.agg_rank == pytest.approx(3.0)


def test_assemble_counters_and_substitution(kb):
    rows = [
        _row("Berlin", "Germany", "Capital | City", dn="LOCATION", idx=0),
        _row("", "", "", idx=1),
    ]
    res = annotate_table(rows, kb)
    out, total, annotated = res.annotated_rows, res.total_elements, res.annotated_elements
    # total: DATA counts every row (2); RowHeading: 1 split of non-empty (1);
    # ColumnHeading: 2 splits (2) -> 5
    assert total == 5
    assert out[0]["data"] == DBR + "Berlin"
    assert out[0]["row_heading"] == DBR + "Germany"
    assert out[1]["data"] == ""


def test_materialize_triples(kb):
    rows = [_row("Berlin", "Germany", "Capital", dn="LOCATION", idx=0)]
    res = annotate_table(rows, kb)
    assert len(res.triples) == 1
    t = res.triples[0]
    assert t["subj"] == DBR + "Berlin"
    assert t["pred"] == "http://dbpedia.org/property/Capital"
    assert t["obj"] == DBR + "Germany"
    assert t["obj_is_literal"] is False


def test_evaluate_troy200():
    import pandas as pd
    from tabbyray.metrics import evaluate_troy200
    gold = pd.DataFrame([{
        "url": "u", "table_idx": 0, "row_idx": 0,
        "data": "E1", "row_heading": "A | B", "column_heading": "C",
    }])
    ann = pd.DataFrame([{
        "url": "u", "table_idx": 0, "row_idx": 0,
        "data": "E1", "row_heading": "A | X", "column_heading": "C",
    }])
    # data match (1) + row_heading split A (1) + column_heading C (1)
    assert evaluate_troy200(gold, ann) == 3

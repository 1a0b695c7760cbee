"""S2 extractor: byte-identical text invariant + table recovery."""

import os

import pyarrow.parquet as pq

from tabbyray.extract import extract_tables, extract_text, split_labels
from tabbyray.ner import tag_value


def test_text_invariant_byte_identical(smoke_fixture):
    pages = pq.read_table(os.path.join(smoke_fixture, "pages.parquet"))
    for html, text in zip(pages.column("html").to_pylist(),
                          pages.column("text").to_pylist()):
        assert extract_text(html) == text


def test_extractor_recovers_gold_cells(smoke_fixture, smoke_kb):
    # mirror the pipeline: inline data-ner attrs win, the rule-based
    # tagger (with the KB gazetteer) fills generic-table cells
    gaz = smoke_kb.gazetteer()
    pages = pq.read_table(os.path.join(smoke_fixture, "pages.parquet"))
    gold = pq.read_table(os.path.join(smoke_fixture, "gold_cells.parquet")).to_pylist()
    got = []
    for url, html in zip(pages.column("url").to_pylist(),
                         pages.column("html").to_pylist()):
        for ti, t in enumerate(extract_tables(html)):
            for ri, r in enumerate(t):
                for role in ("data", "row_heading", "column_heading"):
                    if not r[f"{role}_ner"]:
                        r[f"{role}_ner"] = tag_value(r[role], gaz)
                got.append({"url": url, "table_idx": ti, "row_idx": ri, **r})
    key = lambda r: (r["url"], r["table_idx"], r["row_idx"])
    got.sort(key=key)
    gold.sort(key=key)
    assert len(got) == len(gold)
    for a, b in zip(got, gold):
        for k in ("data", "row_heading", "column_heading",
                  "data_ner", "row_heading_ner", "column_heading_ner"):
            assert a[k] == b[k], (a, b)


def test_canonical_table_extraction():
    html = ("<table><tr><th>DATA</th><th>RowHeading</th><th>ColumnHeading</th></tr>"
            '<tr><td data-ner="LOCATION">Berlin</td><td>Germany</td>'
            "<td>Capital | City</td></tr></table>")
    tables = extract_tables(html)
    assert len(tables) == 1
    row = tables[0][0]
    assert row["data"] == "Berlin"
    assert row["data_ner"] == "LOCATION"
    assert row["row_heading"] == "Germany"
    assert split_labels(row["column_heading"]) == ["Capital", "City"]


def test_generic_table_pivot():
    html = ("<table><tr><th>Country</th><th>Capital</th><th>Population</th></tr>"
            "<tr><td>France</td><td>Paris</td><td>67m</td></tr></table>")
    tables = extract_tables(html)
    assert len(tables) == 1
    rows = tables[0]
    assert rows[0] == {
        "data": "Paris", "row_heading": "France", "column_heading": "Capital",
        "data_ner": None, "row_heading_ner": None, "column_heading_ner": None,
    }
    assert rows[1]["data"] == "67m"
    assert rows[1]["column_heading"] == "Population"


def test_text_skips_script_and_style():
    html = "<html><head><script>var x=1;</script></head><body><p>Hi   there</p></body></html>"
    assert extract_text(html) == "Hi there"


def test_ner_tagger_literals():
    assert tag_value("123456") == "NUMBER"
    assert tag_value("1234") == "DATE"  # bare 4-digit year heuristic
    assert tag_value("1,234,567") == "NUMBER"
    assert tag_value("42%") == "PERCENT"
    assert tag_value("$9.99") == "MONEY"
    assert tag_value("2020-01-31") == "DATE"
    assert tag_value("1987") == "DATE"
    assert tag_value("12:30") == "TIME"
    assert tag_value("3rd") == "ORDINAL"
    assert tag_value("Berlin") == "NONE"
    assert tag_value("Berlin", {"Berlin": "LOCATION"}) == "LOCATION"


def test_malformed_html_is_tolerated():
    # unclosed tags, stray brackets, nested tables, entities
    html = ("<html><body><table><tr><th>DATA<th>RowHeading<th>ColumnHeading"
            "<tr><td>A &amp; B<td>H1<td>C1"
            "<table><tr><td>x</td></tr>"       # nested, non-canonical
            "<p>loose < text >")
    tables = extract_tables(html)
    assert tables, "canonical table should survive malformed markup"
    assert tables[0][0]["data"] == "A & B"
    text = extract_text(html)
    assert "A & B" in text and "loose" in text


def test_page_without_tables_yields_nothing():
    assert extract_tables("<html><body><p>nothing here</p></body></html>") == []


def test_uppercase_table_tags_not_dropped(ray_session):
    # ADVICE round 1: the no-table fast path lowercases before checking,
    # so <TABLE>/<Table> pages flow into the parser (tag names are
    # case-insensitive in HTML)
    import pyarrow as pa

    from tabbyray.pipeline import _extract_batch

    html = ("<HTML><BODY><TABLE><TR><TH>DATA</TH><TH>RowHeading</TH>"
            "<TH>ColumnHeading</TH></TR>"
            "<TR><TD>Val</TD><TD>H</TD><TD>C</TD></TR></TABLE></BODY></HTML>")
    batch = pa.table({"url": ["u1"], "html": [html.encode()]})
    out = _extract_batch(batch, None, check_text=False)
    assert out.num_rows == 1
    assert out.column("data").to_pylist() == ["Val"]


def test_round_half_away_matches_sql():
    import numpy as np
    import pandas as pd

    from tabbyray.ops.streaming import round_half_away

    # 0.125 * 100 = 12.5 exactly in binary; SQL round() gives 13,
    # pandas .round() would give 12 (half to even)
    s = pd.Series([0.125, -0.125, 0.115, 2.675]) * 100
    got = round_half_away(s).tolist()
    assert got[0] == 13.0 and got[1] == -13.0
    assert (s.round() != round_half_away(s)).any()  # the quirk is real

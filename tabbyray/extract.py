"""Frozen HTML -> (page text, canonical tables) extractor.

This is the S2 replacement (SURVEY.md §2.1): instead of reading three
XLSX sheets (`commands/SpreadsheetController.php:522-538`), the pipeline
extracts canonical tables from the ``html`` column of Common-Crawl-style
page rows. The extractor is deliberately self-contained (stdlib
``html.parser`` only, no external parser) so its output can never drift:
the ``text`` column of a page row must be byte-identical to
``extract_text(html)`` for every url — that invariant is definitional
(BASELINE.json ``input_hint``) and golden-tested.

Two table shapes are handled:

* **canonical** — header row exactly ``DATA | RowHeading | ColumnHeading``
  (the reference's canonical form, `components/CanonicalTableAnnotator.php:56-58`);
  each body row maps 1:1 to a canonical row. NER labels may ride along in
  ``data-ner`` cell attributes (the analog of the reference's `NER TAGS`
  sheet, row-aligned by index as at
  `components/CanonicalTableAnnotator.php:898,1040`).
* **generic** — any other table: first row = column headings, first
  column = row headings; each remaining cell becomes a canonical row
  ``(data=cell, row_heading=[first col], column_heading=[its header])``.
  NER labels fall back to the rule-based tagger (``tabbyray.ner``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Optional

from .constants import COLUMN_HEADING_TITLE, DATA_TITLE, LABEL_SEP, ROW_HEADING_TITLE

_WS_COLLAPSE = re.compile(r"\s+")

# Tags whose content never contributes to page text.
_SKIP_CONTENT = {"script", "style", "head", "noscript", "template"}
# Tags that imply a whitespace break in the text flow.
_BLOCK_TAGS = {
    "p", "div", "br", "tr", "td", "th", "table", "li", "ul", "ol",
    "h1", "h2", "h3", "h4", "h5", "h6", "section", "article", "header",
    "footer", "nav", "blockquote", "pre", "hr", "title", "body",
}


@dataclass
class _Cell:
    text: str
    ner: Optional[str] = None
    is_header: bool = False


@dataclass
class _Table:
    rows: list[list[_Cell]] = field(default_factory=list)


class _PageParser(HTMLParser):
    """Single-pass parser collecting page text and raw table grids."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.text_parts: list[str] = []
        self.tables: list[_Table] = []
        self._skip_depth = 0
        self._table_stack: list[_Table] = []
        self._row: Optional[list[_Cell]] = None
        self._cell: Optional[_Cell] = None
        self._cell_parts: list[str] = []

    # -- tag handling -------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_CONTENT:
            self._skip_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self.text_parts.append("\n")
        if tag == "table":
            t = _Table()
            self.tables.append(t)
            self._table_stack.append(t)
        elif tag == "tr" and self._table_stack:
            self._flush_cell()
            self._row = []
            self._table_stack[-1].rows.append(self._row)
        elif tag in ("td", "th") and self._row is not None:
            self._flush_cell()
            ner = None
            for k, v in attrs:
                if k == "data-ner":
                    ner = v
            self._cell = _Cell(text="", ner=ner, is_header=(tag == "th"))
            self._cell_parts = []

    def handle_endtag(self, tag):
        if tag in _SKIP_CONTENT:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in ("td", "th"):
            self._flush_cell()
        elif tag == "tr":
            self._flush_cell()
            self._row = None
        elif tag == "table":
            self._flush_cell()
            self._row = None
            if self._table_stack:
                self._table_stack.pop()
        if tag in _BLOCK_TAGS:
            self.text_parts.append("\n")

    def handle_data(self, data):
        if self._skip_depth:
            return
        self.text_parts.append(data)
        if self._cell is not None:
            self._cell_parts.append(data)

    def _flush_cell(self):
        if self._cell is not None and self._row is not None:
            self._cell.text = _WS_COLLAPSE.sub(" ", "".join(self._cell_parts)).strip()
            self._row.append(self._cell)
        self._cell = None
        self._cell_parts = []


def _parse(html: str) -> _PageParser:
    p = _PageParser()
    p.feed(html)
    p.close()
    return p


def extract_text(html: bytes | str) -> str:
    """Frozen page-text extraction. Whitespace-collapsed visible text,
    single spaces, no leading/trailing space. Byte-identical output per
    input is the per-row invariant (BASELINE.json ``input_hint``)."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    p = _parse(html)
    return _WS_COLLAPSE.sub(" ", "".join(p.text_parts)).strip()


def extract_tables(html: bytes | str) -> list[list[dict]]:
    """Extract canonical-table rows from a page.

    Returns one list per table; each element is a dict with keys
    ``data, row_heading, column_heading`` (strings; headings are
    ``" | "``-joined multi-label paths as in the reference) plus
    ``data_ner, row_heading_ner, column_heading_ner`` (None when the
    page carries no inline NER labels — the tagger stage fills them).
    """
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    p = _parse(html)
    out: list[list[dict]] = []
    for t in p.tables:
        rows = [r for r in t.rows if r]
        if not rows:
            continue
        header = [c.text for c in rows[0]]
        if header == [DATA_TITLE, ROW_HEADING_TITLE, COLUMN_HEADING_TITLE]:
            body = []
            for r in rows[1:]:
                cells = list(r) + [_Cell("")] * (3 - len(r))
                body.append({
                    "data": cells[0].text,
                    "row_heading": cells[1].text,
                    "column_heading": cells[2].text,
                    "data_ner": cells[0].ner,
                    "row_heading_ner": cells[1].ner,
                    "column_heading_ner": cells[2].ner,
                })
            if body:
                out.append(body)
        elif len(rows) >= 2 and len(rows[0]) >= 2:
            # generic table -> canonical pivot
            col_heads = [c.text for c in rows[0][1:]]
            body = []
            for r in rows[1:]:
                if not r:
                    continue
                row_head = r[0].text
                for j, cell in enumerate(r[1:]):
                    ch = col_heads[j] if j < len(col_heads) else ""
                    body.append({
                        "data": cell.text,
                        "row_heading": row_head,
                        "column_heading": ch,
                        "data_ner": cell.ner,
                        "row_heading_ner": r[0].ner,
                        "column_heading_ner": None,
                    })
            if body:
                out.append(body)
    return out


def split_labels(value: str) -> list[str]:
    """M3: split a `` | ``-joined multi-label heading path
    (`components/CanonicalTableAnnotator.php:888`)."""
    return value.split(LABEL_SEP) if value is not None else [""]

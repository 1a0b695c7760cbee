"""Per-table semantic table interpretation (CEA / CTA / CPA).

This module is the algorithmic heart: a pure-Python, deterministic
re-implementation of the reference's per-table annotation flow
(`components/CanonicalTableAnnotator.php` + worker actions in
`commands/SpreadsheetController.php`), operating on ONE canonical
table's rows at a time. In the Ray pipeline it runs inside
``groupby(table_id).map_groups`` (tables are small, numerous and
balanced — the per-table shuffle key), with the KB index held as
actor-pool state; here it is framework-free so every score can be
unit-tested against hand-computed values.

Parity quirks preserved on purpose (SURVEY.md §7.4):

* mention dedup keyed by RAW surface form per table, insertion order
  (`components/CanonicalTableAnnotator.php:1032,892`);
* NER-label and heading-label maps are last-occurrence-wins
  (`:1040-1041,1054`), and for multi-label heading cells the LAST
  ``" | "`` split of the NER cell wins for every label (`:899-901`);
* literal-typed cells short-circuit with a fixed instance and
  ``aggregated_rank = 1``, excluding them from all later scoring via
  the ``aggregated_rank IS NULL`` filters (`:1081-1098,393-395`);
* heading rank defaults to 100, is int-cast, and is only computed for
  non-literal NER labels (`commands/SpreadsheetController.php:282,306`;
  guard `components/CanonicalTableAnnotator.php:1202`);
* NER-class depth rank is int-cast (`commands/SpreadsheetController.php:257`);
* entry context compares WHOLE heading cell strings (not splits) and
  accumulates with multiplicity (`components/CanonicalTableAnnotator.php:632-681`);
* context similarity counts byte-equal pairs (levenshtein == 0)
  between raw cell text and URI local names (`:789-801`);
* the heading aggregate keeps the hardcoded ``* 1`` relationship term
  (`:410`) even though CPA relationship counts are computed (we emit
  them as a separate CPA output instead of folding them in);
* winner selection is argmax with first-inserted tie-break
  (`commands/SpreadsheetController.php:588-592` — DB scan order equals
  candidate insertion order).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache
from typing import Optional

from .constants import (
    CELL_COLUMN_HEADING,
    CELL_DATA,
    CELL_ROW_HEADING,
    COLUMN_HEADING_TITLE,
    DBPEDIA_PROPERTY_SECTION,
    LABEL_SEP,
    LITERAL_INSTANCE_MAP,
    ROW_HEADING_TITLE,
)
from .kb import KBIndex
from .normalize import normalize_entry, php_levenshtein, strip_uri_prefix


@dataclass
class Weights:
    """Weight factors of the two aggregators; every reference call site
    passes 1 (`components/CanonicalTableAnnotator.php:1297-1298,1009`)."""
    ld: float = 1.0
    ncr: float = 1.0
    hr: float = 1.0
    cs: float = 1.0
    ss: float = 1.0
    r: float = 1.0


@dataclass
class Candidate:
    entity: str
    lev: int = 0
    ner_rank: float = 0.0
    heading_rank: int = 100
    ctx_rank: int = 0
    sem_rank: float = 0.0
    rel_rank: int = 0
    agg_rank: Optional[float] = None
    # provenance: True for the literal short-circuit candidates created
    # with agg_rank=1 (`components/CanonicalTableAnnotator.php:1081-1098`),
    # so the intermediate-export oracle can exclude them from the C6/C7
    # arithmetic recompute. Never affects scoring.
    is_literal: bool = False


@dataclass
class Cell:
    name: str                 # raw surface form (dedup key)
    cell_type: int            # CELL_DATA / CELL_ROW_HEADING / CELL_COLUMN_HEADING
    candidates: list[Candidate] = field(default_factory=list)

    def winner(self) -> Optional[Candidate]:
        """C8 argmax, first-inserted tie-break
        (`commands/SpreadsheetController.php:588-592`)."""
        best = None
        for c in self.candidates:
            r = c.agg_rank if c.agg_rank is not None else float("-inf")
            if best is None or r > (best.agg_rank if best.agg_rank is not None else float("-inf")):
                best = c
        return best


@dataclass
class TableResult:
    cells: dict[int, dict[str, Cell]]          # cell_type -> surface -> Cell
    annotated_rows: list[dict]                 # assembled rows (J2/M8)
    triples: list[dict]                        # materialized (subj, pred, obj)
    total_elements: int = 0                    # G3 counters
    annotated_elements: int = 0


# direct alias: php_levenshtein is lru-cached; avoid a wrapper frame in
# the hot path (hundreds of thousands of calls per block)
_lev_names = php_levenshtein


# --------------------------------------------------------------------------
# mention collection (components/CanonicalTableAnnotator.php:1025-1055, 885-906)
# --------------------------------------------------------------------------

def collect_data_mentions(rows: list[dict]):
    """One pass over the table rows building the three maps of
    ``annotateTableData`` (`:1025-1055`). ``rows`` must be in row_idx
    order. Returns (entries, ner_labels, heading_labels) — all
    insertion-ordered dicts keyed by raw surface form."""
    entries: dict[str, str] = {}
    ner_labels: dict[str, str] = {}
    heading_labels: dict[str, list[str]] = {}
    for row in rows:
        value = row.get("data") or ""
        current = ""
        labels: list[str] = []
        if value != "" and normalize_entry(value) != "":
            entries[value] = normalize_entry(value)
            current = value
            ner_labels[value] = row.get("data_ner") or ""
        for role in ("row_heading", "column_heading"):
            for s in (row.get(role) or "").split(LABEL_SEP):
                if normalize_entry(s) != "":
                    labels.append(normalize_entry(s))
        heading_labels[current] = labels   # last row wins, incl. key ""
    return entries, ner_labels, heading_labels


def collect_heading_mentions(rows: list[dict], role: str):
    """Mention maps of ``annotateTableHeading`` (`:880-906`). ``role``
    is ``row_heading`` or ``column_heading``. For each valid split
    label the NER label is the LAST split of the matching row's NER
    cell (`:899-901`)."""
    ner_col = f"{role}_ner"
    labels: dict[str, str] = {}
    ner_labels: dict[str, str] = {}
    for row in rows:
        value = row.get(role) or ""
        ner_value = row.get(ner_col) or ""
        for s in value.split(LABEL_SEP):
            if normalize_entry(s) != "":
                labels[s] = normalize_entry(s)
                splits = ner_value.split(LABEL_SEP)
                ner_labels[s] = splits[-1] if splits else ""
    return labels, ner_labels


# --------------------------------------------------------------------------
# scoring stages
# --------------------------------------------------------------------------

def entry_context(rows: list[dict], entry: str) -> list[str]:
    """C3 ``getEntryContext`` (`components/CanonicalTableAnnotator.php:632-681`).

    Context of a DATA mention = DATA values of all rows sharing its
    (whole, raw) RowHeading or ColumnHeading cell value, accumulated
    once per row in which the mention occurs (multiplicity preserved,
    self included). The reference is O(rows^2); this builds the two
    inverted indexes once, keeping identical output order (row order).
    """
    by_rh: dict[str, list[str]] = {}
    by_ch: dict[str, list[str]] = {}
    seq: list[tuple[str, str, str]] = []
    for row in rows:
        d = row.get("data") or ""
        rh = row.get("row_heading") or ""
        ch = row.get("column_heading") or ""
        seq.append((d, rh, ch))
    out: list[str] = []
    for d, rh, ch in seq:
        if d == entry and d != "":
            for d2, rh2, ch2 in seq:
                if (rh == rh2 and rh != "") or (ch == ch2 and ch != ""):
                    out.append(d2)
    return out


def context_rank(entry_ctx: list[str], neighbor_uris: list[str]) -> int:
    """C4 (`components/CanonicalTableAnnotator.php:786-808`): count of
    (entry-context value, entity-context neighbor) pairs whose raw
    strings are byte-equal after URI-prefix strip."""
    from collections import Counter
    nb = Counter(strip_uri_prefix(n) for n in neighbor_uris)
    rank = 0
    for e in entry_ctx:
        rank += nb.get(e, 0)
    return int(rank)


def heading_rank(type_classes: list[str], heading_labels: list[str]) -> int:
    """C2 (`commands/SpreadsheetController.php:282-306`): min Levenshtein
    between any dbo: type class local name and any heading label;
    default 100, int-cast."""
    rank = 100
    if type_classes:
        for cls in type_classes:
            distance = 100
            cls_name = strip_uri_prefix(cls)
            for label in heading_labels:
                d = _lev_names(cls_name, label)
                if d < distance:
                    distance = d
            if distance < rank:
                rank = distance
    return int(rank)


@lru_cache(maxsize=1 << 16)
def _select_class(cur_classes: tuple[str, ...], comp_classes: tuple[str, ...]) -> str:
    """Inner kernel of C5 (`components/CanonicalTableAnnotator.php:524-546`):
    pick the current candidate's parent class with globally minimal
    Levenshtein to any of the comparative candidate's classes.
    Deterministic in (cur, comp) — memoized per class-tuple pair, which
    collapses the reference's O(cands^2) rescans to O(distinct tuples^2).
    """
    selected = ""
    global_min = 100
    for cur in cur_classes:
        min_distance = 100
        cn = strip_uri_prefix(cur)
        for comp in comp_classes:
            d = _lev_names(cn, strip_uri_prefix(comp))
            if min_distance > d:
                min_distance = d
        if global_min > min_distance:
            global_min = min_distance
            selected = cur
    return selected


def semantic_similarity(all_candidates: dict[str, dict[str, tuple[str, ...]]]) -> dict[str, dict[str, float]]:
    """C5 ``getSemanticSimilarityDistance``
    (`components/CanonicalTableAnnotator.php:513-623`).

    ``all_candidates``: mention surface -> {entity -> parent-class tuple}
    in insertion order. Returns mention -> {entity -> sem_rank}.
    Empty class tuples behave like the reference's ``false`` (PHP
    ``array() != false`` is false — the comparison is skipped).
    ``arsort`` tie-break: count desc, then first-inserted class first
    (PHP7 arsort is unstable; this is the documented deterministic choice).
    """
    from collections import Counter

    # the vote a candidate receives from one comparison depends only on
    # the two CLASS TUPLES involved, and the merge over comparative
    # entries is additive — so the per-entity rank collapses to a
    # per-distinct-tuple computation against the pooled tuple counts of
    # all OTHER entries (identical totals to the reference's
    # per-candidate-pair loops at `:516-565`, orders of magnitude fewer
    # _select_class calls).
    entry_tuple_counts: dict[str, Counter] = {
        e: Counter(cands.values()) for e, cands in all_candidates.items()
    }
    total_tuples: Counter = Counter()
    for c in entry_tuple_counts.values():
        total_tuples.update(c)

    out: dict[str, dict[str, float]] = {}
    for current_entry, current_cands in all_candidates.items():
        others = total_tuples - entry_tuple_counts[current_entry]
        best_by_tuple: dict[tuple[str, ...], int] = {}
        for cur_classes in set(current_cands.values()):
            ranked: dict[str, int] = {}
            if cur_classes:
                for comp_classes, mult in others.items():
                    if comp_classes:
                        sel = _select_class(cur_classes, comp_classes)
                        ranked[sel] = ranked.get(sel, 0) + mult
            best_by_tuple[cur_classes] = max(ranked.values()) if ranked else 0
        max_rank = 0
        intermediate: list[tuple[str, int]] = []
        for entity, cur_classes in current_cands.items():
            current_rank = best_by_tuple[cur_classes]
            if current_rank != 0:
                intermediate.append((entity, current_rank))
                if max_rank < current_rank:
                    max_rank = current_rank
            else:
                intermediate.append((entity, 0))
        coefficient = 0
        if 1 <= max_rank < 10:
            coefficient = 10
        elif 10 <= max_rank < 100:
            coefficient = 100
        elif 100 <= max_rank < 1000:
            coefficient = 1000
        elif 1000 <= max_rank < 10000:
            coefficient = 10000
        ranks: dict[str, float] = {}
        for entity, r in intermediate:
            ranks[entity] = (r / coefficient) if coefficient != 0 else 0.0
        out[current_entry] = ranks
    return out


# --------------------------------------------------------------------------
# per-table annotation (CEA + CTA + CPA)
# --------------------------------------------------------------------------

def annotate_data(rows: list[dict], kb: KBIndex, w: Weights) -> dict[str, Cell]:
    """CEA over the DATA column — ``annotateTableData``
    (`components/CanonicalTableAnnotator.php:1019-1299`)."""
    entries, ner_labels, heading_labels = collect_data_mentions(rows)
    cells: dict[str, Cell] = {}
    # candidate generation with literal short-circuit (:1058-1098)
    for surface, norm in entries.items():
        ner = ner_labels.get(surface, "")
        literal = LITERAL_INSTANCE_MAP.get(ner)
        cell = Cell(name=surface, cell_type=CELL_DATA)
        if literal is not None:
            cell.candidates.append(Candidate(entity=literal, agg_rank=1.0, is_literal=True))
        else:
            for uri in kb.candidates(norm):
                cell.candidates.append(Candidate(entity=uri))
        cells[surface] = cell
    # C1 Levenshtein (:1123-1136) on active (agg IS NULL) candidates
    for cell in cells.values():
        norm = normalize_entry(cell.name)
        for c in cell.candidates:
            if c.agg_rank is None:
                c.lev = _lev_names(norm, strip_uri_prefix(c.entity))
    # A5 NER-class rank (:1137-1174)
    for cell in cells.values():
        ner = ner_labels.get(cell.name, "")
        for c in cell.candidates:
            if c.agg_rank is None:
                c.ner_rank = kb.ner_class_rank(c.entity, ner)
    # C2 heading rank (:1175-1232); only for non-literal NER labels (:1202)
    for cell in cells.values():
        labels = heading_labels.get(cell.name, [])
        ner = ner_labels.get(cell.name, "")
        if LITERAL_INSTANCE_MAP.get(ner) is None:
            for c in cell.candidates:
                if c.agg_rank is None:
                    c.heading_rank = heading_rank(kb.types_dbo(c.entity), labels)
    # C3+C4 context similarity (:1233-1235 -> :733-812)
    for cell in cells.values():
        active = [c for c in cell.candidates if c.agg_rank is None]
        if active:
            ctx = entry_context(rows, cell.name)
            for c in active:
                c.ctx_rank = context_rank(ctx, kb.neighbors(c.entity))
    # A3 parent classes + C5 semantic similarity (:1236-1294)
    all_cands: dict[str, dict[str, tuple[str, ...]]] = {}
    for cell in cells.values():
        per_entity: dict[str, tuple[str, ...]] = {}
        for c in cell.candidates:
            if c.agg_rank is None:
                per_entity[c.entity] = tuple(kb.parent_classes(c.entity))
        all_cands[cell.name] = per_entity
    sem = semantic_similarity(all_cands)
    for cell in cells.values():
        ranks = sem.get(cell.name, {})
        for c in cell.candidates:
            if c.agg_rank is None:
                c.sem_rank = ranks.get(c.entity, 0.0)
    # C6 aggregate (:824-868)
    for cell in cells.values():
        for c in cell.candidates:
            if c.agg_rank is None:
                c.agg_rank = (
                    w.ld * (1 - c.lev / 100)
                    + w.ncr * c.ner_rank
                    + w.hr * (1 - c.heading_rank / 100)
                    + w.cs * c.ctx_rank
                    + w.ss * c.sem_rank
                )
    return cells


def annotate_heading(rows: list[dict], kb: KBIndex, role: str, w: Weights,
                     with_cpa: bool = True) -> dict[str, Cell]:
    """CTA over a heading column — ``annotateTableHeading``
    (`components/CanonicalTableAnnotator.php:878-1010`) — plus the §2.8
    CPA relationship count (computed, stored on the candidate, NOT
    folded into the aggregate: the reference stub multiplies 1)."""
    cell_type = CELL_ROW_HEADING if role == "row_heading" else CELL_COLUMN_HEADING
    labels, ner_labels = collect_heading_mentions(rows, role)
    cells: dict[str, Cell] = {}
    for surface, norm in labels.items():
        ner = ner_labels.get(surface, "")
        literal = LITERAL_INSTANCE_MAP.get(ner)
        cell = Cell(name=surface, cell_type=cell_type)
        if literal is not None:
            cell.candidates.append(Candidate(entity=literal, agg_rank=1.0, is_literal=True))
        else:
            for uri in kb.candidates(norm):
                cell.candidates.append(Candidate(entity=uri))
        cells[surface] = cell
    for cell in cells.values():
        norm = normalize_entry(cell.name)
        for c in cell.candidates:
            if c.agg_rank is None:
                c.lev = _lev_names(norm, strip_uri_prefix(c.entity))
    for cell in cells.values():
        ner = ner_labels.get(cell.name, "")
        for c in cell.candidates:
            if c.agg_rank is None:
                c.ner_rank = kb.ner_class_rank(c.entity, ner)
    if with_cpa:
        # §2.8: per candidate, adjacency count into the union (with
        # multiplicity) of all OTHER same-role cells' candidate lists
        # (`components/CanonicalTableAnnotator.php:245-372`,
        #  `commands/SpreadsheetController.php:180-202`).
        per_cell_lists = {
            s: [c.entity for c in cell.candidates if c.agg_rank is None]
            for s, cell in cells.items()
        }
        for surface, cell in cells.items():
            others: list[str] = []
            for s2, lst in per_cell_lists.items():
                if s2 != surface:
                    others.extend(lst)
            for c in cell.candidates:
                if c.agg_rank is None:
                    c.rel_rank = kb.relationship_count(c.entity, others)
    # C7 aggregate (`:382-415`), relationship term hardcoded to 1 (`:410`)
    for cell in cells.values():
        for c in cell.candidates:
            if c.agg_rank is None:
                c.agg_rank = w.ld * (1 - c.lev / 100) + w.ncr * c.ner_rank + w.r * 1
    return cells


def assemble(rows: list[dict], cells: dict[int, dict[str, Cell]]) -> tuple[list[dict], int, int]:
    """M8/J2 result assembly (`commands/SpreadsheetController.php:570-684`):
    substitute winning entities into the original rows and count the G3
    total/annotated counters with the reference's exact counting rules."""
    total = 0
    annotated = 0
    out_rows: list[dict] = []
    data_cells = cells.get(CELL_DATA, {})
    rh_cells = cells.get(CELL_ROW_HEADING, {})
    ch_cells = cells.get(CELL_COLUMN_HEADING, {})
    for row in rows:
        data_value = row.get("data") or ""
        total += 1                       # every DATA cell counts (:576-577)
        data_out = data_value
        cell = data_cells.get(data_value)
        if cell is not None and data_value != "":
            wnr = cell.winner()
            if wnr is not None:
                annotated += 1
                data_out = wnr.entity
        parts_out = {}
        for role, role_cells in (("row_heading", rh_cells), ("column_heading", ch_cells)):
            value = row.get(role) or ""
            acc = ""
            for s in value.split(LABEL_SEP):
                existing = ""
                if value != "":
                    total += 1           # per split when cell non-empty (:607-609)
                c2 = role_cells.get(s)
                if c2 is not None and s == c2.name:
                    wnr = c2.winner()
                    if wnr is not None:
                        annotated += 1
                        existing = wnr.entity
                piece = existing if existing != "" else s
                acc = piece if acc == "" else acc + LABEL_SEP + piece
            parts_out[role] = acc
        out_rows.append({
            "row_idx": row.get("row_idx"),
            "data": data_out,
            "row_heading": parts_out["row_heading"],
            "column_heading": parts_out["column_heading"],
        })
    return out_rows, total, annotated


def materialize_triples(rows: list[dict], cells: dict[int, dict[str, Cell]],
                        kb: Optional[KBIndex] = None) -> list[dict]:
    """Deterministic triple materialization (SURVEY.md §3.3): for each
    row whose DATA cell is annotated, emit one triple per
    (ColumnHeading label x RowHeading label): subj = winning DATA
    entity; obj = winning RowHeading entity (else the raw label as a
    literal); pred selected in priority order, recorded in
    ``pred_source``:

    * ``"cta"`` — the winning ColumnHeading entity;
    * ``"cpa"`` — a REAL KB property bound by the CPA adjacency query
      (`commands/SpreadsheetController.php:189-202` counts
      ``<subj> ?property <obj>``; we select the bound ``?property``
      whose local name has minimal byte Levenshtein to the normalized
      heading label, first-edge tie-break) — only when subj and obj
      are both entities and an edge exists;
    * ``"minted"`` — ``dbp:<normalized heading label>`` fallback.
    """
    data_cells = cells.get(CELL_DATA, {})
    rh_cells = cells.get(CELL_ROW_HEADING, {})
    ch_cells = cells.get(CELL_COLUMN_HEADING, {})
    triples: list[dict] = []
    for row in rows:
        data_value = row.get("data") or ""
        cell = data_cells.get(data_value)
        if cell is None or data_value == "":
            continue
        wnr = cell.winner()
        if wnr is None:
            continue
        subj = wnr.entity
        ch_value = row.get("column_heading") or ""
        rh_value = row.get("row_heading") or ""
        for ch in ch_value.split(LABEL_SEP):
            pred_cell = ch_cells.get(ch)
            cta_pred = None
            if pred_cell is not None:
                pw = pred_cell.winner()
                if pw is not None:
                    cta_pred = pw.entity
            norm = normalize_entry(ch)
            if cta_pred is None and norm == "":
                continue
            for rh in rh_value.split(LABEL_SEP):
                obj_cell = rh_cells.get(rh)
                obj = None
                obj_is_literal = True
                if obj_cell is not None:
                    ow = obj_cell.winner()
                    if ow is not None:
                        obj = ow.entity
                        obj_is_literal = False
                if obj is None:
                    if rh == "":
                        continue
                    obj = rh
                pred, source = cta_pred, "cta"
                if pred is None:
                    props = (kb.edge_properties(subj, obj)
                             if kb is not None and not obj_is_literal else [])
                    if props:
                        pred = min(props, key=lambda p, n=norm: _lev_names(
                            strip_uri_prefix(p), n))
                        source = "cpa"
                    else:
                        pred = DBPEDIA_PROPERTY_SECTION + norm
                        source = "minted"
                triples.append({
                    "subj": subj,
                    "pred": pred,
                    "obj": obj,
                    "obj_is_literal": obj_is_literal,
                    "pred_source": source,
                    "row_idx": row.get("row_idx"),
                })
    return triples


def annotate_table(rows: list[dict], kb: KBIndex, w: Optional[Weights] = None) -> TableResult:
    """Full per-table flow (`commands/SpreadsheetController.php:555-684`):
    CEA on DATA, CTA on RowHeading then ColumnHeading (+CPA counts),
    assembly, counters, triples. ``rows`` must be sorted by row_idx."""
    w = w or Weights()
    cells = {
        CELL_DATA: annotate_data(rows, kb, w),
        CELL_ROW_HEADING: annotate_heading(rows, kb, "row_heading", w),
        CELL_COLUMN_HEADING: annotate_heading(rows, kb, "column_heading", w),
    }
    annotated_rows, total, annotated = assemble(rows, cells)
    triples = materialize_triples(rows, cells, kb)
    return TableResult(
        cells=cells,
        annotated_rows=annotated_rows,
        triples=triples,
        total_elements=total,
        annotated_elements=annotated,
    )

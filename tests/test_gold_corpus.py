"""Independent end-to-end gold corpus (VERDICT round-1, item 5).

Five single-table pages over a hand-written 10-row micro-KB. Every
expected annotation, assembled row and triple below was derived BY HAND
from the reference semantics (`components/CanonicalTableAnnotator.php`
`:1019-1299` CEA, `:878-1010` CTA, `commands/SpreadsheetController.php`
`:86-103` candidates, `:228-261` NER-class depth, `:270-310` heading
rank, `:570-684` assembly) — NOT by running the pipeline. Levenshtein
values were computed with pen-and-paper DP tables; they are annotated
inline. This converts the conformance suite's distribution-invariance
evidence into reference-parity evidence.

Score traces (weights all 1):
  CEA agg = (1 - lev/100) + ner + (1 - heading/100) + ctx + sem
  CTA agg = (1 - lev/100) + ner + 1

NER depth quirk (int cast, `:257`): a type t qualifies each ancestor
class anc of t with ner_class among anc's ancestors; depth = |inter|/2;
rank = int(1/depth). types=[City] under LOCATION -> inter {City,
Location} -> depth 1 -> rank 1; types=[Location] -> inter {Location} ->
depth 0.5 -> rank 2; types=[Person] under PERSON -> rank 2.
"""

import html as _html
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DBO = "http://dbpedia.org/ontology/"
DBR = "http://dbpedia.org/resource/"
DBP = "http://dbpedia.org/property/"

# ---------------------------------------------------------------------------
# micro-KB (row order is candidate order — it matters)
# ---------------------------------------------------------------------------
_KB_ROWS = [
    # uri, label, is_class, types, parents, neighbors, neighbor_props
    (DBO + "Location", "Location", True, [], [], [], []),
    (DBO + "City", "City", True, [], [DBO + "Location"], [], []),
    (DBO + "Person", "Person", True, [], [], [], []),
    (DBR + "Paris", "Paris", False, [DBO + "City"], [DBO + "Location"],
     [DBR + "France", DBR + "Seine"], [DBP + "Capital_of", DBP + "Near"]),
    (DBR + "Parisot", "Parisot", False, [DBO + "City"], [DBO + "Location"],
     [], []),
    (DBR + "France", "France", False, [DBO + "Location"], [], [DBR + "Paris"],
     [DBP + "Capital"]),
    (DBR + "Seine", "Seine", False, [DBO + "Location"], [], [DBR + "Paris"],
     [DBP + "Flows_through"]),
    (DBR + "John_smith", "John Smith", False, [DBO + "Person"], [],
     [DBR + "Paris"], [DBP + "Mayor_of"]),
    (DBR + "Boduxx", "Boduxx", False, [DBO + "City"], [DBO + "Location"],
     [], []),
    (DBR + "Boduyy", "Boduyy", False, [DBO + "City"], [DBO + "Location"],
     [], []),
]

# pages: (url, [(data, data_ner, rh, rh_ner, ch, ch_ner), ...])
_PAGES = [
    # P1 — exact + distractor, literal short-circuit, class-exact quirk
    # ("City" resolves to the dbo:City CLASS first -> exact arm blocked,
    # no instance uri contains "city" -> ColumnHeading unannotated)
    ("https://gold.test/p1", [
        ("Paris", "LOCATION", "France", "NONE", "City", "NONE"),
        ("2148000", "NUMBER", "France", "NONE", "Population", "NONE"),
    ]),
    # P2 — PERSON depth-2 rank, multi-label ColumnHeading
    ("https://gold.test/p2", [
        ("John Smith", "PERSON", "Paris", "LOCATION",
         "Mayor | Leader", "NONE | NONE"),
    ]),
    # P3 — CPA relationship counts on RowHeading (Paris<->France adjacency)
    ("https://gold.test/p3", [
        ("Seine", "LOCATION", "Paris", "LOCATION", "Waterway", "NONE"),
        ("2.5", "NUMBER", "France", "LOCATION", "Length", "NONE"),
    ]),
    # P4 — context similarity (shared RowHeading) + semantic similarity
    ("https://gold.test/p4", [
        ("Paris", "LOCATION", "Region", "NONE", "Place", "NONE"),
        ("France", "LOCATION", "Region", "NONE", "Place", "NONE"),
    ]),
    # P5 — exact tie -> first-inserted (KB row order) wins
    ("https://gold.test/p5", [
        ("Bodu", "NONE", "Thing", "NONE", "Name", "NONE"),
    ]),
]

# ---------------------------------------------------------------------------
# hand-derived expectations
# ---------------------------------------------------------------------------

# (url, table_idx, cell_type, surface, entity, agg, rel, n_candidates)
# agg expressions keep the aggregate's exact term order/arithmetic.
_EXP_ANNOTATIONS = [
    # P1 "Paris": cands [dbr:Paris, dbr:Parisot]; lev 0; ner 1 (City->
    # depth 1); heading min lev over {France, City} vs type "City" = 0;
    # ctx 0 (context [Paris, 2148000] vs neighbors {France, Seine});
    # sem 0 (only other mention is a literal).
    ("https://gold.test/p1", 0, 0, "Paris", DBR + "Paris",
     (1 - 0 / 100) + 1 + (1 - 0 / 100) + 0 + 0, 0, 2),
    # P1 literal NUMBER -> fixed instance, agg hardcoded 1 (:1081-1098)
    ("https://gold.test/p1", 0, 0, "2148000", DBR + "Number", 1.0, 0, 1),
    # P1 CTA RowHeading "France": [dbr:France]; lev 0; ner NONE -> 0;
    # CTA agg = 1 + 0 + 1
    ("https://gold.test/p1", 0, 1, "France", DBR + "France",
     (1 - 0 / 100) + 0 + 1, 0, 1),

    # P2 "John Smith": [dbr:John_smith]; lev 0; ner PERSON types [Person]
    # -> depth .5 -> rank 2; heading labels {Paris, Mayor, Leader} vs
    # type "Person": lev(Person,Paris)=4 (DP), (Person,Mayor)=5,
    # (Person,Leader)=5 -> 4; ctx 0 ([John Smith] vs {Paris}); sem 0.
    ("https://gold.test/p2", 0, 0, "John Smith", DBR + "John_smith",
     (1 - 0 / 100) + 2 + (1 - 4 / 100) + 0 + 0, 0, 1),
    # P2 CTA RowHeading "Paris": [Paris, Parisot]; Paris lev 0 ner 1 ->
    # 1+1+1=3 beats Parisot 0.98+1+1; single rh mention -> rel 0
    ("https://gold.test/p2", 0, 1, "Paris", DBR + "Paris",
     (1 - 0 / 100) + 1 + 1, 0, 2),

    # P3 "Seine": [dbr:Seine]; lev 0; ner LOCATION types [Location] ->
    # depth .5 -> 2; heading {Paris, Waterway} vs type "Location":
    # lev(Location,Paris)=6, (Location,Waterway)=8 -> 6; ctx 0; sem 0
    # (other mention literal).
    ("https://gold.test/p3", 0, 0, "Seine", DBR + "Seine",
     (1 - 0 / 100) + 2 + (1 - 6 / 100) + 0 + 0, 0, 1),
    ("https://gold.test/p3", 0, 0, "2.5", DBR + "Number", 1.0, 0, 1),
    # P3 CTA rh "Paris": winner dbr:Paris; CPA rel = |neighbors(Paris) ∩
    # bag[France's cands]| = |{France,Seine} ∩ {France}| = 1
    ("https://gold.test/p3", 0, 1, "Paris", DBR + "Paris",
     (1 - 0 / 100) + 1 + 1, 1, 2),
    # P3 CTA rh "France": ner LOCATION types [Location] -> 2; rel:
    # neighbors(France)={Paris}, others bag [Paris, Parisot] -> 1
    ("https://gold.test/p3", 0, 1, "France", DBR + "France",
     (1 - 0 / 100) + 2 + 1, 1, 1),

    # P4 "Paris": lev 0; ner 1; heading {Region, Place} vs "City":
    # lev(City,Region)=5, (City,Place)=5 -> 5; ctx: context [Paris,
    # France] (shared rh "Region") vs neighbors {France,Seine} -> 1;
    # sem: others={France:(Location,)}x1; select over (City,Location)
    # -> Location (lev 0); votes {Location:1} -> max 1 -> coeff 10 ->
    # 0.1.
    ("https://gold.test/p4", 0, 0, "Paris", DBR + "Paris",
     (1 - 0 / 100) + 1 + (1 - 5 / 100) + 1 + 1 / 10, 0, 2),
    # P4 "France": lev 0; ner 2 (types [Location]); heading {Region,
    # Place} vs "Location": lev(Location,Region)=5, (Location,Place)=7
    # -> 5; ctx 1 (context [Paris, France] vs neighbors {Paris}); sem:
    # others={(City,Location):2} -> select Location, votes {Location:2}
    # -> max 2 -> coeff 10 -> 0.2.
    ("https://gold.test/p4", 0, 0, "France", DBR + "France",
     (1 - 0 / 100) + 2 + (1 - 5 / 100) + 1 + 2 / 10, 0, 1),

    # P5 "Bodu": cands [Boduxx, Boduyy] (KB row order); both lev 2, ner
    # 0, heading {Thing, Name} vs "City": lev(City,Thing)=4,
    # (City,Name)=4 -> 4; ctx 0; sem 0 -> identical agg; first-inserted
    # tie-break -> Boduxx.
    ("https://gold.test/p5", 0, 0, "Bodu", DBR + "Boduxx",
     (1 - 2 / 100) + 0 + (1 - 4 / 100) + 0 + 0, 0, 2),
]

# (url, table_idx, row_idx, data, row_heading, column_heading)
_EXP_ROWS = [
    ("https://gold.test/p1", 0, 0, DBR + "Paris", DBR + "France", "City"),
    ("https://gold.test/p1", 0, 1, DBR + "Number", DBR + "France", "Population"),
    ("https://gold.test/p2", 0, 0, DBR + "John_smith", DBR + "Paris",
     "Mayor | Leader"),
    ("https://gold.test/p3", 0, 0, DBR + "Seine", DBR + "Paris", "Waterway"),
    ("https://gold.test/p3", 0, 1, DBR + "Number", DBR + "France", "Length"),
    ("https://gold.test/p4", 0, 0, DBR + "Paris", "Region", "Place"),
    ("https://gold.test/p4", 0, 1, DBR + "France", "Region", "Place"),
    ("https://gold.test/p5", 0, 0, DBR + "Boduxx", "Thing", "Name"),
]

# (url, table_idx, row_idx, subj, pred, obj, obj_is_literal, pred_source)
# CPA predicate selection: when the ColumnHeading has no winner and a
# KB edge subj->obj exists, the bound edge property replaces the minted
# dbp:<label> predicate (pred_source "cpa"); literal objects and
# off-KB subjects (dbr:Number) keep the minted fallback.
_EXP_TRIPLES = [
    # Paris->France edge carries dbp:Capital_of -> selected over minting
    # dbp:City from the unresolved heading
    ("https://gold.test/p1", 0, 0, DBR + "Paris", DBP + "Capital_of",
     DBR + "France", False, "cpa"),
    ("https://gold.test/p1", 0, 1, DBR + "Number", DBP + "Population",
     DBR + "France", False, "minted"),
    # one edge property serves both unresolved heading labels
    ("https://gold.test/p2", 0, 0, DBR + "John_smith", DBP + "Mayor_of",
     DBR + "Paris", False, "cpa"),
    ("https://gold.test/p2", 0, 0, DBR + "John_smith", DBP + "Mayor_of",
     DBR + "Paris", False, "cpa"),
    ("https://gold.test/p3", 0, 0, DBR + "Seine", DBP + "Flows_through",
     DBR + "Paris", False, "cpa"),
    ("https://gold.test/p3", 0, 1, DBR + "Number", DBP + "Length",
     DBR + "France", False, "minted"),
    ("https://gold.test/p4", 0, 0, DBR + "Paris", DBP + "Place",
     "Region", True, "minted"),
    ("https://gold.test/p4", 0, 1, DBR + "France", DBP + "Place",
     "Region", True, "minted"),
    ("https://gold.test/p5", 0, 0, DBR + "Boduxx", DBP + "Name",
     "Thing", True, "minted"),
]


def _render(rows) -> str:
    def esc(s):
        return _html.escape(s, quote=True)

    parts = ["<html><body><table>",
             "<tr><th>DATA</th><th>RowHeading</th><th>ColumnHeading</th></tr>"]
    for d, dn, rh, rn, ch, cn in rows:
        parts.append(
            f'<tr><td data-ner="{esc(dn)}">{esc(d)}</td>'
            f'<td data-ner="{esc(rn)}">{esc(rh)}</td>'
            f'<td data-ner="{esc(cn)}">{esc(ch)}</td></tr>')
    parts.append("</table></body></html>")
    return "".join(parts)


@pytest.fixture(scope="module")
def gold_results(ray_session, tmp_path_factory):
    import datetime as dt

    from tabbyray import pipeline
    from tabbyray.extract import extract_text
    from tabbyray.kb import KBIndex

    root = tmp_path_factory.mktemp("gold")
    kb_table = pa.table({
        "uri": [r[0] for r in _KB_ROWS], "label": [r[1] for r in _KB_ROWS],
        "is_class": [r[2] for r in _KB_ROWS], "types": [r[3] for r in _KB_ROWS],
        "parents": [r[4] for r in _KB_ROWS],
        "neighbors": [r[5] for r in _KB_ROWS],
        "neighbor_props": [r[6] for r in _KB_ROWS],
    })
    htmls = [_render(rows).encode() for _url, rows in _PAGES]
    pages = pa.table({
        "url": [u for u, _ in _PAGES],
        "warc_ts": pa.array([dt.datetime(2025, 1, 1)] * len(_PAGES),
                            pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": [extract_text(h) for h in htmls],
        "lang": ["en"] * len(_PAGES),
    })
    pages_path = os.path.join(str(root), "pages.parquet")
    pq.write_table(pages, pages_path)
    kb_ref, gaz_ref = pipeline.put_kb(KBIndex(kb_table))
    results = pipeline.kg_pipeline(pages_path, kb_ref, gaz_ref).materialize()
    return results


def _frame(results, kind, cols):
    from tabbyray import pipeline
    df = pipeline.split_kind(results, kind).to_pandas()
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_gold_annotations(gold_results):
    cols = ["url", "table_idx", "cell_type", "surface_form", "entity",
            "aggregated_rank", "rel_rank", "n_candidates"]
    got = _frame(gold_results, "annotation", cols)
    want = (pd.DataFrame(_EXP_ANNOTATIONS, columns=cols)
            .astype({"table_idx": "int32", "cell_type": "int32",
                     "rel_rank": "int64", "n_candidates": "int64"})
            .sort_values(cols).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, atol=1e-12, rtol=0)


def test_gold_rows(gold_results):
    cols = ["url", "table_idx", "row_idx", "data", "row_heading",
            "column_heading"]
    got = _frame(gold_results, "row", cols)
    want = (pd.DataFrame(_EXP_ROWS, columns=cols)
            .astype({"table_idx": "int32", "row_idx": "int32"})
            .sort_values(cols).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_gold_triples(gold_results):
    cols = ["url", "table_idx", "row_idx", "subj", "pred", "obj",
            "obj_is_literal", "pred_source"]
    got = _frame(gold_results, "triple", cols)
    want = (pd.DataFrame(_EXP_TRIPLES, columns=cols)
            .astype({"table_idx": "int32", "row_idx": "int32"})
            .sort_values(cols).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


# ---------------------------------------------------------------------------
# C5 pooled-tuple optimization vs the naive quadratic reference loops
# ---------------------------------------------------------------------------

def _naive_semantic_similarity(all_candidates):
    """Direct transliteration of the reference's per-candidate-pair
    loops (`components/CanonicalTableAnnotator.php:513-623`): for each
    candidate, vote over every candidate of every OTHER mention; rank =
    top vote count; per-mention coefficient = next power of 10 of the
    max rank."""
    from tabbyray.sti import _select_class

    out = {}
    for current_entry, current_cands in all_candidates.items():
        intermediate = []
        max_rank = 0
        for entity, cur_classes in current_cands.items():
            ranked = {}
            if cur_classes:
                for other_entry, other_cands in all_candidates.items():
                    if other_entry == current_entry:
                        continue
                    for _oe, comp_classes in other_cands.items():
                        if comp_classes:
                            sel = _select_class(cur_classes, comp_classes)
                            ranked[sel] = ranked.get(sel, 0) + 1
            rank = max(ranked.values()) if ranked else 0
            intermediate.append((entity, rank))
            if rank > max_rank:
                max_rank = rank
        coefficient = 0
        for bound in (10, 100, 1000, 10000):
            if bound // 10 <= max_rank < bound:
                coefficient = bound
                break
        out[current_entry] = {
            e: (r / coefficient if coefficient else 0.0)
            for e, r in intermediate}
    return out


def test_semantic_similarity_pooled_equals_naive():
    import random

    from tabbyray.sti import semantic_similarity

    classes = [DBO + c for c in
               ("City", "Location", "Person", "Country", "Region", "Place")]
    rng = random.Random(99)
    for trial in range(5):
        all_cands = {}
        for m in range(rng.randint(2, 5)):
            cands = {}
            for c in range(rng.randint(0, 6)):
                tup = tuple(sorted(rng.sample(classes, rng.randint(0, 3))))
                cands[f"{DBR}e{m}_{c}"] = tup
            all_cands[f"mention{m}"] = cands
        assert semantic_similarity(all_cands) == \
            _naive_semantic_similarity(all_cands), trial

    # the hand-derived P4 case, explicitly
    p4 = {
        "Paris": {DBR + "Paris": (DBO + "City", DBO + "Location"),
                  DBR + "Parisot": (DBO + "City", DBO + "Location")},
        "France": {DBR + "France": (DBO + "Location",)},
    }
    got = semantic_similarity(p4)
    assert got["Paris"][DBR + "Paris"] == pytest.approx(0.1)
    assert got["Paris"][DBR + "Parisot"] == pytest.approx(0.1)
    assert got["France"][DBR + "France"] == pytest.approx(0.2)
    assert got == _naive_semantic_similarity(p4)

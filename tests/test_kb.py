"""KBIndex (A1-A5) semantics."""

import pyarrow as pa
import pytest

from tabbyray.kb import KBIndex

DBO = "http://dbpedia.org/ontology/"
DBR = "http://dbpedia.org/resource/"


@pytest.fixture(scope="module")
def kb():
    rows = [
        # uri, label, is_class, types, parents, neighbors
        (DBO + "Location", "Location", True, [], [], []),
        (DBO + "City", "City", True, [], [DBO + "Location"], []),
        (DBO + "Person", "Person", True, [], [], []),
        (DBR + "Berlin", "Berlin", False, [DBO + "City"], [DBO + "Location"],
         [DBR + "Germany", DBR + "Germany", DBO + "City"]),
        (DBR + "Berlin_township", "Berlin Township", False, [DBO + "City"],
         [DBO + "Location"], []),
        (DBR + "Germany", "Germany", False, [DBO + "Location"], [],
         [DBR + "Berlin"]),
        (DBR + "Pergamon", "Pergamon", False, [DBO + "City"], [DBO + "Location"], []),
    ]
    t = pa.table({
        "uri": [r[0] for r in rows], "label": [r[1] for r in rows],
        "is_class": [r[2] for r in rows], "types": [r[3] for r in rows],
        "parents": [r[4] for r in rows], "neighbors": [r[5] for r in rows],
    })
    return KBIndex(t)


def test_candidates_exact_first_then_substring(kb):
    # exact dbr:Berlin arm first, then case-insensitive substring
    # (commands/SpreadsheetController.php:86-103)
    got = kb.candidates("Berlin")
    assert got[0] == DBR + "Berlin"
    assert DBR + "Berlin_township" in got
    assert len(got) == len(set(got))  # order-preserving dedup


def test_candidates_substring_case_insensitive(kb):
    assert DBR + "Berlin" in kb.candidates("bErLi")


def test_candidates_match_full_uri_quirk(kb):
    # regex runs on str(?subject) including the namespace: 'Org' matches
    # every resource URI through "dbpedia.org" — quirk preserved
    got = kb.candidates("Org")
    assert len(got) == 4  # all instances


def test_candidates_empty_and_miss(kb):
    assert kb.candidates("") == []
    assert kb.candidates("Zzzqqq") == []


def test_ner_class_rank_int_cast(kb):
    # Berlin: City + Location on the chain -> 2 intermediates -> depth 1 -> 1
    assert kb.ner_class_rank(DBR + "Berlin", "LOCATION") == 1
    # Germany typed Location directly: 1 intermediate -> depth 0.5 -> int(2) == 2
    # (the (int)$rank quirk, commands/SpreadsheetController.php:257)
    assert kb.ner_class_rank(DBR + "Germany", "LOCATION") == 2
    # wrong family -> 0
    assert kb.ner_class_rank(DBR + "Berlin", "PERSON") == 0
    # literal/unknown label -> 0
    assert kb.ner_class_rank(DBR + "Berlin", "NUMBER") == 0


def test_parent_classes_any_property_quirk(kb):
    # types + superclass chain + dbo: neighbors all match `<e> ?p ?class`
    # FILTER(strstarts(dbo:)) (commands/SpreadsheetController.php:378-383)
    got = kb.parent_classes(DBR + "Berlin")
    assert got == [DBO + "City", DBO + "Location", DBO + "City"]


def test_neighbors_multiplicity(kb):
    assert kb.neighbors(DBR + "Berlin").count(DBR + "Germany") == 2


def test_relationship_count_bag_semantics(kb):
    # duplicated UNION arms count multiply
    # (commands/SpreadsheetController.php:189-202)
    others = [DBR + "Germany", DBR + "Germany", DBR + "Pergamon"]
    assert kb.relationship_count(DBR + "Berlin", others) == 4  # 2 edges x 2 arms
    assert kb.relationship_count(DBR + "Pergamon", others) == 0


def test_types_dbo(kb):
    assert kb.types_dbo(DBR + "Berlin") == [DBO + "City"]
    assert kb.types_dbo("missing") == []


def test_gazetteer(kb):
    g = kb.gazetteer()
    assert g["Berlin"] == "LOCATION"
    assert g["Germany"] == "LOCATION"


def test_candidates_contains_a2_variant(kb):
    # case-sensitive, optional section restriction, classes included
    got = kb.candidates_contains("Berlin")
    assert got == [DBR + "Berlin", DBR + "Berlin_township"]
    assert kb.candidates_contains("berlin") == []      # case-sensitive
    only_cls = kb.candidates_contains("o", DBO)
    assert all(u.startswith(DBO) for u in only_cls)


def test_typeless_entity_emits_no_exact_rows():
    # the reference's exact arm is the join `?subject a ?object`
    # (commands/SpreadsheetController.php:86-93): an entity with NO
    # rdf:type contributes ZERO exact rows; it can still surface via the
    # substring arm, but in KB order, not up front
    rows = [
        (DBR + "Xqwxya", "Xqwxya", False, [DBO + "City"], [], []),
        (DBR + "Qwxy", "Qwxy", False, [], [], []),      # typeless
    ]
    t = pa.table({
        "uri": [r[0] for r in rows], "label": [r[1] for r in rows],
        "is_class": [r[2] for r in rows], "types": [r[3] for r in rows],
        "parents": [r[4] for r in rows], "neighbors": [r[5] for r in rows],
    })
    got = KBIndex(t).candidates("Qwxy")
    # no exact-arm row for the typeless entity -> substring arm in KB
    # order puts the earlier row first
    assert got == [DBR + "Xqwxya", DBR + "Qwxy"]

"""In-page structured-data extraction (tabbyray/ops/structured.py):
JSON-LD / microdata / meta contracts on hand-built pages — multi-scope
binding, invalid-JSON skip, scalar-only filtering, non-string scalar
rendering, raw (undecoded) meta text — plus the type-census arithmetic
against a by-hand count."""

import pyarrow as pa
import pytest
import ray.data as rd


def _pages(rows):
    return rd.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "html": pa.array([r[1] for r in rows], pa.string())}))


_PAGE_A = (
    "https://a.example/p1",
    '<html><head>'
    '<meta property="og:title" content="A &amp; B">'
    '<meta property="og:type" content="article">'
    '</head><body>'
    '<script type="application/ld+json">'
    '{"@id": "https://kg/e1", "@type": "Person", "name": "Ada",'
    ' "age": 37, "vip": true, "skip_null": null,'
    ' "nested": {"x": 1}, "arr": [1, 2]}'
    '</script>'
    '<script type="application/ld+json">{not json}</script>'
    '<script type="application/ld+json">{"name": "no id"}</script>'
    '<div itemscope itemtype="https://schema.org/Book">'
    '<span itemprop="name">Dune</span> filler '
    '<span itemprop="author">Herbert</span></div>'
    '<div itemscope itemtype="https://schema.org/Event">'
    '<span itemprop="name">Expo</span></div>'
    '</body></html>')

_PAGE_B = ("https://b.example/p2", "<html><body><p>nothing here</p></body></html>")


def test_jsonld_contract(ray_session):
    from tabbyray.ops.structured import jsonld_records
    rows = jsonld_records(_pages([_PAGE_A, _PAGE_B])).take_all()
    got = {(r["subj"], r["pred"], r["obj"]) for r in rows}
    # invalid JSON and the @id-less block are skipped; null/dict/list
    # values are skipped; int/bool render as json text
    assert got == {
        ("https://kg/e1", "@type", "Person"),
        ("https://kg/e1", "name", "Ada"),
        ("https://kg/e1", "age", "37"),
        ("https://kg/e1", "vip", "true"),
    }
    assert all(r["url"] == "https://a.example/p1" for r in rows)


def test_microdata_scope_binding(ray_session):
    from tabbyray.ops.structured import microdata_records
    rows = microdata_records(_pages([_PAGE_A, _PAGE_B])).take_all()
    got = {(r["itemtype"], r["itemprop"], r["value"]) for r in rows}
    # each span binds to its ENCLOSING scope, not the page's first
    assert got == {
        ("https://schema.org/Book", "name", "Dune"),
        ("https://schema.org/Book", "author", "Herbert"),
        ("https://schema.org/Event", "name", "Expo"),
    }


def test_meta_raw_text(ray_session):
    from tabbyray.ops.structured import meta_properties
    rows = meta_properties(_pages([_PAGE_A, _PAGE_B])).take_all()
    got = {(r["property"], r["content"]) for r in rows}
    # entities stay encoded — raw attribute text by contract
    assert got == {("og:title", "A &amp; B"), ("og:type", "article")}


def test_structured_triples_union(ray_session):
    from tabbyray.ops.structured import structured_triples
    rows = structured_triples(_pages([_PAGE_A, _PAGE_B])).take_all()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], set()).add(
            (r["subj"], r["pred"], r["obj"]))
    assert by_src["jsonld"] == {
        ("https://kg/e1", "@type", "Person"),
        ("https://kg/e1", "name", "Ada"),
        ("https://kg/e1", "age", "37"),
        ("https://kg/e1", "vip", "true")}
    assert ("https://a.example/p1", "md:itemtype",
            "https://schema.org/Book") in by_src["microdata"]
    assert ("https://a.example/p1", "md:name", "Expo") in by_src["microdata"]
    assert by_src["meta"] == {
        ("https://a.example/p1", "meta:og:title", "A &amp; B"),
        ("https://a.example/p1", "meta:og:type", "article")}


def test_jsonld_type_counts(ray_session):
    from tabbyray.ops.structured import jsonld_type_counts
    extra = (
        "https://c.example/p3",
        '<script type="application/ld+json">'
        '{"@id": "https://kg/e2", "@type": "Person", "name": "Bo"}'
        '</script>'
        '<script type="application/ld+json">'
        '{"@id": "https://kg/e3", "@type": "Person",'
        ' "nested": {"x": 1}}</script>')
    rows = jsonld_type_counts(
        _pages([_PAGE_A, _PAGE_B, extra]), num_partitions=4).take_all()
    got = {r["rdf_type"]: (r["n_entities"], r["n_facts"]) for r in rows}
    # e1: name/age/vip = 3 scalar facts; e2: 1; e3: 0 (nested only —
    # still counted as an entity)
    assert got == {"Person": (3, 4)}


def test_fixture_oracle_parity_sample(ray_session):
    """End-to-end spot check on the real fixture: every subject in the
    extracted JSON-LD layer matches the fixture's @id shape and no
    invalid block leaks through."""
    from tabbyray.fixtures import ensure_structured_fixture
    from tabbyray.ops.structured import jsonld_records
    ds = rd.read_parquet(ensure_structured_fixture(), override_num_blocks=4)
    rows = jsonld_records(ds).take_all()
    assert len(rows) > 100
    assert all(r["subj"].startswith("https://kg.example/e") for r in rows)
    assert all(not r["obj"].startswith("{") for r in rows)

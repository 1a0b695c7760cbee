"""In-page structured-data extraction — JSON-LD, microdata, OpenGraph.

A Common-Crawl-scale KG-construction pass gets its highest-precision
triples not from table interpretation but from the structured data
publishers embed directly: schema.org JSON-LD script blocks, microdata
item scopes, and OpenGraph/article ``<meta property=...>`` tags. The
reference mines tables only (``components/CanonicalTableAnnotator.php``);
this family is the web-scale complement that feeds the same canonical
(subj, pred, obj) shape the rest of the KG stages consume
(``ops/kgconstruct.py``).

All extractors are stateless map-side stages (compiled-regex scan per
batch, no shuffle, no state) — at 100 TB each is embarrassingly
parallel and pipelines with the read. Only ``jsonld_type_counts``
exchanges: one combiner hash-aggregate over (type) after a map-side
count, the standard partial-agg plan.

Extraction contracts (shared with the DuckDB oracles — the SQL uses the
same RE2 patterns, so the two sides can never drift):

* JSON-LD: blocks are ``<script type="application/ld+json">...</script>``;
  invalid JSON blocks are skipped (``json_valid`` on the SQL side);
  subjects come from ``@id``; ``@id``/``@context`` are not emitted as
  predicates, ``@type`` is; only scalar values are emitted (nested
  objects/arrays and JSON nulls are skipped) — non-string scalars are
  rendered with ``json.dumps`` (``true``/``37``), matching DuckDB's
  ``json_extract_string``.
* microdata: scopes are ``<div itemscope itemtype="T">...</div>`` with
  no nested ``</div>`` inside; properties are canonical-serialization
  ``<span itemprop="p">v</span>`` spans (``v`` contains no '<').
* meta: ``<meta property="p" content="v">`` — ``v`` is kept as the raw
  (still-escaped) attribute text; no entity decode.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_JSONLD_RE = re.compile(
    r'<script type="application/ld\+json">(.*?)</script>', re.S)
_SCOPE_RE = re.compile(
    r'<div itemscope itemtype="([^"]*)">(.*?)</div>', re.S)
_ITEMPROP_RE = re.compile(r'<span itemprop="([^"]*)">([^<]*)</span>')
_META_RE = re.compile(r'<meta property="([^"]*)" content="([^"]*)">')


def _html_strings(t: pa.Table, html_col: str) -> list:
    return pc.cast(t.column(html_col), pa.string()).to_pylist()


def jsonld_records(pages: rd.Dataset, url_col: str = "url",
                   html_col: str = "html") -> rd.Dataset:
    """One (url, subj, pred, obj) row per scalar JSON-LD property.

    Map-side only: regex scan + ``json.loads`` per block, compiled
    once at module import; invalid blocks and non-scalar values are
    dropped per the module contract."""
    def f(t: pa.Table) -> pa.Table:
        urls, subjs, preds, objs = [], [], [], []
        for url, html in zip(pc.cast(t.column(url_col),
                                     pa.string()).to_pylist(),
                             _html_strings(t, html_col)):
            for block in _JSONLD_RE.findall(html):
                try:
                    obj = json.loads(block)
                except ValueError:
                    continue
                if not isinstance(obj, dict):
                    continue
                subj = obj.get("@id")
                if not isinstance(subj, str):
                    continue
                for k, v in obj.items():
                    if k in ("@id", "@context"):
                        continue
                    if v is None or isinstance(v, (dict, list)):
                        continue
                    urls.append(url)
                    subjs.append(subj)
                    preds.append(k)
                    objs.append(v if isinstance(v, str) else json.dumps(v))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "subj": pa.array(subjs, pa.string()),
                         "pred": pa.array(preds, pa.string()),
                         "obj": pa.array(objs, pa.string())})

    return pages.map_batches(f, batch_format="pyarrow")


def microdata_records(pages: rd.Dataset, url_col: str = "url",
                      html_col: str = "html") -> rd.Dataset:
    """One (url, itemtype, itemprop, value) row per property span,
    associated with its ENCLOSING scope (multiple scopes per page are
    supported — each scope's spans bind to its own itemtype)."""
    def f(t: pa.Table) -> pa.Table:
        urls, types, props, vals = [], [], [], []
        for url, html in zip(pc.cast(t.column(url_col),
                                     pa.string()).to_pylist(),
                             _html_strings(t, html_col)):
            for itype, body in _SCOPE_RE.findall(html):
                for prop, val in _ITEMPROP_RE.findall(body):
                    urls.append(url)
                    types.append(itype)
                    props.append(prop)
                    vals.append(val)
        return pa.table({"url": pa.array(urls, pa.string()),
                         "itemtype": pa.array(types, pa.string()),
                         "itemprop": pa.array(props, pa.string()),
                         "value": pa.array(vals, pa.string())})

    return pages.map_batches(f, batch_format="pyarrow")


def meta_properties(pages: rd.Dataset, url_col: str = "url",
                    html_col: str = "html") -> rd.Dataset:
    """One (url, property, content) row per ``<meta property>`` tag,
    raw attribute text (no entity decode)."""
    def f(t: pa.Table) -> pa.Table:
        urls, props, vals = [], [], []
        for url, html in zip(pc.cast(t.column(url_col),
                                     pa.string()).to_pylist(),
                             _html_strings(t, html_col)):
            for prop, val in _META_RE.findall(html):
                urls.append(url)
                props.append(prop)
                vals.append(val)
        return pa.table({"url": pa.array(urls, pa.string()),
                         "property": pa.array(props, pa.string()),
                         "content": pa.array(vals, pa.string())})

    return pages.map_batches(f, batch_format="pyarrow")


def jsonld_type_counts(pages: rd.Dataset, url_col: str = "url",
                       html_col: str = "html",
                       num_partitions: "int | None" = None) -> rd.Dataset:
    """Per-@type entity/fact census over the JSON-LD layer:
    (rdf_type, n_entities, n_facts) where n_entities counts distinct
    ``@id`` subjects typed T and n_facts counts their non-@type scalar
    facts. The schema.org coverage dashboard every crawl-KG run wants.

    Plan: map-side per-batch partials (one row per (type) per batch —
    subjects never leave the batch un-aggregated... except distinctness,
    which needs the exchange), so: distinct (type, subj) pairs via ONE
    hash exchange + fact counts via the same exchange, then a small
    per-type finish. Two combiner aggregates, no driver state."""
    from .relational import hash_aggregate

    def prep(t: pa.Table) -> pa.Table:
        # (type, subj, n_facts_for_subj_in_this_block)
        recs: dict[tuple, int] = {}
        types: dict[tuple, bool] = {}
        for html in _html_strings(t, html_col):
            for block in _JSONLD_RE.findall(html):
                try:
                    obj = json.loads(block)
                except ValueError:
                    continue
                if not isinstance(obj, dict):
                    continue
                subj, rtype = obj.get("@id"), obj.get("@type")
                if not isinstance(subj, str) or not isinstance(rtype, str):
                    continue
                key = (rtype, subj)
                types[key] = True
                n = sum(1 for k, v in obj.items()
                        if k not in ("@id", "@context", "@type")
                        and v is not None
                        and not isinstance(v, (dict, list)))
                recs[key] = recs.get(key, 0) + n
        keys = list(recs)
        return pa.table({
            "rdf_type": pa.array([k[0] for k in keys], pa.string()),
            "subj": pa.array([k[1] for k in keys], pa.string()),
            "n_facts": pa.array([recs[k] for k in keys], pa.int64())})

    pairs = pages.map_batches(prep, batch_format="pyarrow")
    # distinct (type, subj) + summed facts: one exchange on the pair
    per_subj = hash_aggregate(pairs, ["rdf_type", "subj"],
                              {"n_facts": "n_facts"},
                              num_partitions=num_partitions)

    # per_subj is already partitioned by (type, subj) hash; a second
    # tiny exchange on type alone collapses to one row per type
    return hash_aggregate(
        per_subj.map_batches(
            lambda t: pa.table({
                "rdf_type": t.column("rdf_type"),
                "n_entities": pa.array([1] * t.num_rows, pa.int64()),
                "n_facts": t.column("n_facts")}),
            batch_format="pyarrow"),
        ["rdf_type"], {"n_entities": "n_entities", "n_facts": "n_facts"},
        num_partitions=num_partitions)


def structured_triples(pages: rd.Dataset, url_col: str = "url",
                       html_col: str = "html") -> rd.Dataset:
    """Unified KG view of all three carriers: (subj, pred, obj, src).

    * JSON-LD rows keep their ``@id`` subject and raw predicate,
      ``src='jsonld'``.
    * microdata rows use the page URL as subject (page-as-item),
      ``pred='md:'+itemprop`` plus one ``md:itemtype`` row per scope
      occurrence, ``src='microdata'``.
    * meta rows use the page URL, ``pred='meta:'+property``,
      ``src='meta'``.

    ONE pass over the html (single map_batches, zero shuffle) — the
    fan-in point that feeds ``ops/kgconstruct.py`` stages (sameAs
    closure, provenance rollup, truth discovery) with web-native
    triples alongside the table-mined ones."""
    def f(t: pa.Table) -> pa.Table:
        subjs, preds, objs, srcs = [], [], [], []

        def emit(s, p, o, src):
            subjs.append(s)
            preds.append(p)
            objs.append(o)
            srcs.append(src)

        for url, html in zip(pc.cast(t.column(url_col),
                                     pa.string()).to_pylist(),
                             _html_strings(t, html_col)):
            for block in _JSONLD_RE.findall(html):
                try:
                    obj = json.loads(block)
                except ValueError:
                    continue
                if not isinstance(obj, dict):
                    continue
                subj = obj.get("@id")
                if not isinstance(subj, str):
                    continue
                for k, v in obj.items():
                    if k in ("@id", "@context") or v is None \
                            or isinstance(v, (dict, list)):
                        continue
                    emit(subj, k,
                         v if isinstance(v, str) else json.dumps(v),
                         "jsonld")
            for itype, body in _SCOPE_RE.findall(html):
                emit(url, "md:itemtype", itype, "microdata")
                for prop, val in _ITEMPROP_RE.findall(body):
                    emit(url, "md:" + prop, val, "microdata")
            for prop, val in _META_RE.findall(html):
                emit(url, "meta:" + prop, val, "meta")
        return pa.table({"subj": pa.array(subjs, pa.string()),
                         "pred": pa.array(preds, pa.string()),
                         "obj": pa.array(objs, pa.string()),
                         "src": pa.array(srcs, pa.string())})

    return pages.map_batches(f, batch_format="pyarrow")

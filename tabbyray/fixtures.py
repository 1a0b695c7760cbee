"""Deterministic synthetic fixtures (FIXTURES.md F1-F6).

Everything is derived from ``random.Random(seed)`` — no wall clock, no
network — so the same (seed, scale) always produces byte-identical
parquet. The pages table has EXACTLY the ``input_hint`` shape
``(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)``; ``text`` is definitionally the output of the frozen
extractor applied to ``html``.

Canonical tables are rendered as real HTML ``<table>`` elements whose
header row is ``DATA | RowHeading | ColumnHeading`` and whose cells
carry ``data-ner`` attributes — the web-input analog of the reference's
`NER TAGS` sheet (`commands/SpreadsheetController.php:528-532`).
"""

from __future__ import annotations

import datetime as _dt
import html as _html
import json
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from .constants import (
    DATE_NER_LABEL,
    LOCATION_NER_LABEL,
    MISC_NER_LABEL,
    MONEY_NER_LABEL,
    NONE_NER_LABEL,
    NUMBER_NER_LABEL,
    ORGANIZATION_NER_LABEL,
    PERCENT_NER_LABEL,
    PERSON_NER_LABEL,
    TIME_NER_LABEL,
    DBPEDIA_ONTOLOGY_SECTION,
    DBPEDIA_RESOURCE_SECTION,
)
from .extract import extract_text
from .kb import KBIndex
from .normalize import normalize_entry

# class tree: name -> (parent chain upward, NER family)
_CLASS_TREE = {
    "Location": ([], LOCATION_NER_LABEL),
    "PopulatedPlace": (["Location"], LOCATION_NER_LABEL),
    "City": (["PopulatedPlace", "Location"], LOCATION_NER_LABEL),
    "Town": (["PopulatedPlace", "Location"], LOCATION_NER_LABEL),
    "Country": (["PopulatedPlace", "Location"], LOCATION_NER_LABEL),
    "NaturalPlace": (["Location"], LOCATION_NER_LABEL),
    "Mountain": (["NaturalPlace", "Location"], LOCATION_NER_LABEL),
    "River": (["NaturalPlace", "Location"], LOCATION_NER_LABEL),
    "Person": ([], PERSON_NER_LABEL),
    "Athlete": (["Person"], PERSON_NER_LABEL),
    "SoccerPlayer": (["Athlete", "Person"], PERSON_NER_LABEL),
    "Cyclist": (["Athlete", "Person"], PERSON_NER_LABEL),
    "Artist": (["Person"], PERSON_NER_LABEL),
    "MusicalArtist": (["Artist", "Person"], PERSON_NER_LABEL),
    "Scientist": (["Person"], PERSON_NER_LABEL),
    "Organisation": ([], ORGANIZATION_NER_LABEL),
    "Company": (["Organisation"], ORGANIZATION_NER_LABEL),
    "University": (["Organisation"], ORGANIZATION_NER_LABEL),
    "Band": (["Organisation"], ORGANIZATION_NER_LABEL),
    "Work": ([], MISC_NER_LABEL),
    "Film": (["Work"], MISC_NER_LABEL),
    "Album": (["Work"], MISC_NER_LABEL),
}

_SYL = ["ba", "ке", "do", "fa", "gu", "hi", "jo", "ka", "lu", "me", "ni", "po",
        "qa", "ri", "su", "ta", "vu", "we", "xi", "yo", "zu", "mar", "ten",
        "vil", "bor", "dal", "fen", "gor", "hal", "kir", "lon", "mos", "nar"]

_HEAD_WORDS = ["Population", "Area", "Capital", "Founded", "Revenue", "Height",
               "Length", "Members", "Albums", "Matches", "Region", "District"]

_BOILER = ["lorem", "ipsum", "table", "data", "page", "crawl", "web", "index",
           "content", "section", "report", "archive", "news", "list"]


def _name(rng: random.Random, syllables=(2, 4), cyr_ok=False) -> str:
    n = rng.randint(*syllables)
    syl = _SYL if cyr_ok else [s for s in _SYL if s.isascii()]
    word = "".join(rng.choice(syl) for _ in range(n))
    return word.capitalize()


def _entity_label(rng: random.Random, cls: str) -> str:
    if rng.random() < 0.05:
        # Cyrillic labels exercise the multi-byte branches: normalization
        # keeps а-яА-Я (no ucfirst on a multi-byte first char) and
        # levenshtein runs over UTF-8 bytes (SURVEY.md §7.4 item 1)
        return _name(rng, cyr_ok=True) + " " + _name(rng, cyr_ok=True)
    base = _name(rng)
    if cls in ("City", "Town", "Country"):
        suffix = rng.choice(["", "", " City", " Land", "ia", " Valley"])
        return (base + suffix).strip()
    if cls in ("SoccerPlayer", "Cyclist", "MusicalArtist", "Scientist"):
        return base + " " + _name(rng)
    if cls in ("Company", "University", "Band"):
        return base + rng.choice([" Corp", " Inc", " Group", " Labs", " Union"])
    return base


def _mutate(rng: random.Random, label: str) -> str:
    """Distractor label at Levenshtein distance 1-3."""
    chars = list(label)
    for _ in range(rng.randint(1, 3)):
        op = rng.randrange(3)
        pos = rng.randrange(len(chars))
        c = rng.choice("abcdefghijklmnopqrstuvwxyz")
        if op == 0:
            chars[pos] = c
        elif op == 1:
            chars.insert(pos, c)
        elif len(chars) > 2:
            del chars[pos]
    return "".join(chars)


def build_kb(rng: random.Random, n_entities: int = 1200) -> pa.Table:
    """F2 KB table: classes + instances + near-miss distractors."""
    uris, labels, is_class, types, parents, neighbors = [], [], [], [], [], []

    def cls_uri(name: str) -> str:
        return DBPEDIA_ONTOLOGY_SECTION + name

    for name, (chain, _fam) in _CLASS_TREE.items():
        uris.append(cls_uri(name))
        labels.append(name)
        is_class.append(True)
        types.append([])
        parents.append([cls_uri(c) for c in chain])
        neighbors.append([])

    inst_classes = [c for c in _CLASS_TREE if _CLASS_TREE[c][0]]  # leaf-ish
    ent_uris: list[str] = []
    seen_norm: set[str] = set()
    while len(ent_uris) < n_entities:
        cls = rng.choice(inst_classes)
        label = _entity_label(rng, cls)
        norm = normalize_entry(label)
        if not norm or norm in seen_norm:
            continue
        seen_norm.add(norm)
        uri = DBPEDIA_RESOURCE_SECTION + norm
        ent_uris.append(uri)
        uris.append(uri)
        labels.append(label)
        is_class.append(False)
        t = [cls_uri(cls)]
        if rng.random() < 0.2:
            t.append(cls_uri(rng.choice(inst_classes)))
        types.append(t)
        chain = _CLASS_TREE[cls][0]
        parents.append([cls_uri(c) for c in chain])
        neighbors.append([])
        # distractor with a near-miss label, 25% of entities
        if rng.random() < 0.25:
            dl = _mutate(rng, label)
            dn = normalize_entry(dl)
            if dn and dn not in seen_norm:
                seen_norm.add(dn)
                duri = DBPEDIA_RESOURCE_SECTION + dn
                ent_uris.append(duri)
                uris.append(duri)
                labels.append(dl)
                is_class.append(False)
                dcls = rng.choice(inst_classes)
                types.append([cls_uri(dcls)])
                parents.append([cls_uri(c) for c in _CLASS_TREE[dcls][0]])
                neighbors.append([])
    # neighbor edges between instances (drives C4 context + CPA counts)
    n_inst = len(ent_uris)
    for i, uri in enumerate(uris):
        if is_class[i] or n_inst < 2:
            continue
        k = rng.randint(0, 8)
        nb = [ent_uris[rng.randrange(n_inst)] for _ in range(k)]
        if rng.random() < 0.15:
            nb.append(cls_uri(rng.choice(list(_CLASS_TREE))))
        neighbors[i] = nb
    # per-edge property URIs (CPA predicate selection): drawn from a
    # SEPARATE deterministic stream so the main rng's draw sequence —
    # and therefore every page/table in the fixture — is unchanged from
    # the pre-props fixture versions
    prop_rng = random.Random(1_000_003)
    from .constants import DBPEDIA_PROPERTY_SECTION
    neighbor_props = [
        [DBPEDIA_PROPERTY_SECTION + prop_rng.choice(_HEAD_WORDS).lower()
         if prop_rng.random() < 0.7 else "" for _ in nb]
        for nb in neighbors
    ]
    return pa.table({
        # rid = stable KB row id (the deterministic stand-in for endpoint
        # result order that KBIndex builds its posting lists in); carried
        # as data so oracle SQL can reproduce A1's substring-arm ordering
        "rid": pa.array(range(len(uris)), pa.int64()),
        "uri": uris, "label": labels, "is_class": is_class,
        "types": types, "parents": parents, "neighbors": neighbors,
        "neighbor_props": neighbor_props,
    })


def _literal_cell(rng: random.Random) -> tuple[str, str]:
    kind = rng.randrange(5)
    if kind == 0:
        return str(rng.randint(1, 5_000_000)), NUMBER_NER_LABEL
    if kind == 1:
        return f"{rng.randint(1900, 2025)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}", DATE_NER_LABEL
    if kind == 2:
        return f"${rng.randint(1, 900)}.{rng.randint(0, 99):02d}", MONEY_NER_LABEL
    if kind == 3:
        return f"{rng.randint(0, 100)}%", PERCENT_NER_LABEL
    return f"{rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}", TIME_NER_LABEL


def _gen_table_rows(rng: random.Random, kb_labels: list[tuple[str, str]],
                    skew_heads: list[str] | None = None) -> list[dict]:
    """One canonical table: list of row dicts with data/headings + NER."""
    n_rows = rng.randint(3, 10)
    col_head = rng.choice(_HEAD_WORDS)
    if rng.random() < 0.3:
        col_head = col_head + " | " + rng.choice(_HEAD_WORDS)
        col_ner = NONE_NER_LABEL + " | " + NONE_NER_LABEL
    else:
        col_ner = NONE_NER_LABEL
    rows = []
    for _ in range(n_rows):
        r = rng.random()
        if r < 0.55:
            label, fam = rng.choice(kb_labels)
            if rng.random() < 0.1:
                label = _mutate(rng, label)      # unresolvable-ish surface
            data, data_ner = label, (fam if rng.random() < 0.8 else
                                     rng.choice([MISC_NER_LABEL, NONE_NER_LABEL]))
        else:
            data, data_ner = _literal_cell(rng)
        if skew_heads and rng.random() < 0.7:
            rh = rng.choice(skew_heads)
        elif rng.random() < 0.4:
            rh, _f = rng.choice(kb_labels)
        else:
            rh = rng.choice(_HEAD_WORDS)
        rh_ner = NONE_NER_LABEL
        rows.append({
            "data": data, "row_heading": rh, "column_heading": col_head,
            "data_ner": data_ner, "row_heading_ner": rh_ner,
            "column_heading_ner": col_ner,
        })
    return rows


def _gen_generic_table(rng: random.Random, kb_labels: list[tuple[str, str]],
                       gazetteer: dict[str, str]) -> tuple[str, list[dict]]:
    """A generic (non-canonical) HTML grid + the canonical rows the
    extractor's pivot must produce from it. NER labels come from the
    rule-based tagger (no inline attributes on generic tables), so the
    expected labels are computed with the same tagger + gazetteer the
    pipeline uses."""
    from .ner import tag_value

    n_rows = rng.randint(2, 5)
    n_cols = rng.randint(2, 4)
    col_heads = [rng.choice(_HEAD_WORDS) for _ in range(n_cols)]
    corner = rng.choice(_HEAD_WORDS)
    grid: list[list[str]] = []
    for _ in range(n_rows):
        row_head = rng.choice(kb_labels)[0] if rng.random() < 0.5 else rng.choice(_HEAD_WORDS)
        cells = []
        for _c in range(n_cols):
            if rng.random() < 0.5:
                cells.append(rng.choice(kb_labels)[0])
            else:
                cells.append(_literal_cell(rng)[0])
        grid.append([row_head] + cells)

    def esc(s: str) -> str:
        return _html.escape(s, quote=True)

    html = ["<table><tr><th>" + esc(corner) + "</th>"]
    html += [f"<th>{esc(h)}</th>" for h in col_heads]
    html.append("</tr>")
    for row in grid:
        html.append("<tr>" + "".join(f"<td>{esc(v)}</td>" for v in row) + "</tr>")
    html.append("</table>")

    expected: list[dict] = []
    for row in grid:
        for j, v in enumerate(row[1:]):
            expected.append({
                "data": v, "row_heading": row[0], "column_heading": col_heads[j],
                "data_ner": tag_value(v, gazetteer),
                "row_heading_ner": tag_value(row[0], gazetteer),
                "column_heading_ner": tag_value(col_heads[j], gazetteer),
            })
    return "".join(html), expected


def _render_page(rng: random.Random, tables: list[tuple[str | None, list[dict]]],
                 inline_ner: bool = True) -> str:
    """``tables``: list of (pre-rendered generic html | None, rows).
    ``inline_ner=False`` renders canonical tables WITHOUT ``data-ner``
    attributes (the raw-crawl shape: the NER model stage must tag)."""
    def esc(s: str) -> str:
        return _html.escape(s, quote=True)

    parts = ["<html><head><title>", esc(" ".join(rng.choice(_BOILER) for _ in range(3))),
             "</title><style>body{font:12px}</style></head><body>"]
    parts.append("<p>" + esc(" ".join(rng.choice(_BOILER) for _ in range(rng.randint(5, 25)))) + "</p>")
    for pre_html, rows in tables:
        if pre_html is not None:
            parts.append(pre_html)
        else:
            parts.append("<table><tr><th>DATA</th><th>RowHeading</th><th>ColumnHeading</th></tr>")
            for r in rows:
                if inline_ner:
                    parts.append(
                        f'<tr><td data-ner="{esc(r["data_ner"])}">{esc(r["data"])}</td>'
                        f'<td data-ner="{esc(r["row_heading_ner"])}">{esc(r["row_heading"])}</td>'
                        f'<td data-ner="{esc(r["column_heading_ner"])}">{esc(r["column_heading"])}</td></tr>'
                    )
                else:
                    parts.append(
                        f'<tr><td>{esc(r["data"])}</td>'
                        f'<td>{esc(r["row_heading"])}</td>'
                        f'<td>{esc(r["column_heading"])}</td></tr>'
                    )
            parts.append("</table>")
        if rng.random() < 0.5:
            parts.append("<p>" + esc(" ".join(rng.choice(_BOILER) for _ in range(rng.randint(3, 12)))) + "</p>")
    parts.append("</body></html>")
    return "".join(parts)


def build_pages(rng: random.Random, kb: pa.Table, n_pages: int,
                skew: bool = False,
                inline_ner: bool = True) -> tuple[pa.Table, pa.Table]:
    """F1 pages + F3 gold cell rows (the expected extractor output)."""
    kb_labels = [
        (lbl, _CLASS_TREE[t[0].rsplit("/", 1)[-1]][1])
        for lbl, ic, t in zip(kb.column("label").to_pylist(),
                              kb.column("is_class").to_pylist(),
                              kb.column("types").to_pylist())
        if not ic and t
    ]
    skew_heads = None
    if skew:
        skew_heads = [lbl for lbl, _ in rng.sample(kb_labels, max(2, len(kb_labels) // 10))]
    # gazetteer as the pipeline builds it, for generic-table NER gold
    gazetteer = KBIndex(kb).gazetteer()

    base_ts = _dt.datetime(2025, 1, 1)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    g_url, g_tidx, g_ridx = [], [], []
    g_cols = {k: [] for k in ("data", "row_heading", "column_heading",
                              "data_ner", "row_heading_ner", "column_heading_ner")}
    for i in range(n_pages):
        url = f"https://fixture.test/page/{i:06d}"
        n_tables = rng.choices([0, 1, 2, 3], weights=[10, 55, 25, 10])[0]
        tables: list[tuple[str | None, list[dict]]] = []
        for _ in range(n_tables):
            if rng.random() < 0.2:   # generic grid -> extractor pivots it
                tables.append(_gen_generic_table(rng, kb_labels, gazetteer))
            else:
                tables.append((None, _gen_table_rows(rng, kb_labels, skew_heads)))
        html = _render_page(rng, tables, inline_ner=inline_ner)
        urls.append(url)
        tss.append(base_ts + _dt.timedelta(seconds=i))
        htmls.append(html.encode("utf-8"))
        texts.append(extract_text(html))
        langs.append("ru" if rng.random() < 0.05 else "en")
        for t_idx, (_pre, rows) in enumerate(tables):
            for r_idx, r in enumerate(rows):
                g_url.append(url)
                g_tidx.append(t_idx)
                g_ridx.append(r_idx)
                for k in g_cols:
                    g_cols[k].append(r[k])
    pages = pa.table({
        "url": urls,
        "warc_ts": pa.array(tss, type=pa.timestamp("us")),
        "html": pa.array(htmls, type=pa.binary()),
        "text": texts,
        "lang": langs,
    })
    gold_cells = pa.table({
        "url": g_url,
        "table_idx": pa.array(g_tidx, type=pa.int32()),
        "row_idx": pa.array(g_ridx, type=pa.int32()),
        **{k: v for k, v in g_cols.items()},
    })
    return pages, gold_cells


_WEB_DOMAINS = ["example.com", "news-site.org", "crawl-archive.net",
                "shoppy.io", "wikidata-mirror.org", "cityguide.info",
                "dailytimes.com", "research-hub.edu", "openmaps.net",
                "forum-board.org", "statportal.gov", "mediacdn.com"]
_WEB_SUBS = ["", "www.", "en.", "blog.", "cdn."]
_WEB_PATH_WORDS = ["page", "article", "item", "wiki", "post", "doc",
                   "archive", "view", "list", "tag"]


def ensure_web_fixture(n_urls: int = 900, seed: int = 29,
                       root: str = "/tmp/tabbyray_fixtures") -> str:
    """Deterministic Common-Crawl-style capture log for the web-ops
    oracles: ``captures.parquet`` with (url, warc_ts, content_len,
    status). Each of ``n_urls`` canonical targets is captured 1-4 times
    (recrawls) under RAW variants that canonicalize identically —
    scheme/host case differences, explicit default ports (:80/:443) and
    fragments — plus non-default ports, query strings and empty paths,
    so every branch of url canonicalization is exercised. warc_ts is
    strictly increasing over captures (latest-per-url is unambiguous).
    Returns the parquet file path."""
    key = f"web-v1-s{seed}-u{n_urls}.parquet"
    path = os.path.join(root, key)
    if os.path.exists(path):
        return path
    rng = random.Random(seed)
    urls, tss, lens, stats = [], [], [], []
    t0 = 1_735_689_600_000_000   # 2025-01-01 UTC, microseconds
    cap_idx = 0
    for u in range(n_urls):
        scheme = rng.choice(["http", "https"])
        host = rng.choice(_WEB_SUBS) + rng.choice(_WEB_DOMAINS)
        port = rng.choice([None] * 8 + [8080, 8443])
        depth = rng.randint(0, 3)
        path_part = "".join(
            f"/{rng.choice(_WEB_PATH_WORDS)}{rng.randrange(50)}"
            for _ in range(depth))
        if depth and rng.random() < 0.3:
            path_part += "/"
        query = (f"q={rng.randrange(1000)}&lang={rng.choice(['en', 'de'])}"
                 if rng.random() < 0.25 else "")
        n_caps = rng.randint(1, 4)
        for _c in range(n_caps):
            s = scheme.upper() if rng.random() < 0.1 else scheme
            h = host.upper() if rng.random() < 0.1 else host
            default_port = 443 if scheme == "https" else 80
            if port is not None:
                p = f":{port}"
            elif rng.random() < 0.15:
                p = f":{default_port}"    # explicit default port
            else:
                p = ""
            pp = path_part
            if pp == "" and rng.random() < 0.5:
                pp = "/"                  # empty path == root
            frag = f"#sec{rng.randrange(9)}" if rng.random() < 0.2 else ""
            q = f"?{query}" if query else ""
            urls.append(f"{s}://{h}{p}{pp}{q}{frag}")
            tss.append(t0 + cap_idx * 1_000_000 + rng.randrange(1000))
            lens.append(rng.randint(200, 200_000))
            stats.append(rng.choice([200] * 8 + [301, 404]))
            cap_idx += 1
    table = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "content_len": pa.array(lens, pa.int64()),
        "status": pa.array(stats, pa.int64()),
    })
    os.makedirs(root, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def ensure_clustered_embeddings(n: int = 256, dim: int = 16,
                                n_clusters: int = 8, seed: int = 38,
                                noise: float = 0.002,
                                lsh_planes: int = 8, lsh_seed: int = 42,
                                root: str = "/tmp/tabbyray_fixtures") -> str:
    """Clustered embedding fixture for oracling multi-probe LSH kNN at
    probes < n_planes: vectors sit in tight unit-norm clusters
    (``vec_id % n_clusters``), and generation ASSERTS that every
    member's hyperplane sign pattern equals its cluster center's under
    the default LSH planes — so each query's own bucket provably holds
    its whole cluster and the exact top-k, making the exact-kNN SQL
    oracle applicable to the approximate path. Deterministic; returns
    the parquet path (vec_id:int64, embedding:list<double>)."""
    import numpy as np
    key = (f"clustered-v1-s{seed}-n{n}-d{dim}-c{n_clusters}"
           f"-p{lsh_planes}.parquet")
    path = os.path.join(root, key)
    if os.path.exists(path):
        return path
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # the SAME planes lsh_buckets derives from (lsh_seed, dim)
    planes = np.random.RandomState(lsh_seed).randn(dim, lsh_planes)
    center_bits = (centers @ planes) > 0
    vecs = np.empty((n, dim))
    for i in range(n):
        c = i % n_clusters
        v = centers[c] + noise * rng.randn(dim)
        if not np.array_equal((v @ planes) > 0, center_bits[c]):
            raise AssertionError(
                f"vector {i} crosses a hyperplane; lower noise or "
                "re-seed the fixture")
        vecs[i] = v
    table = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64())),
    })
    os.makedirs(root, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def fixture_path(name: str = "conformance", seed: int = 7, n_pages: int = 200,
                 n_entities: int = 1200, skew: bool = False,
                 inline_ner: bool = True,
                 root: str = "/tmp/tabbyray_fixtures") -> str:
    """Deterministic fixture directory path WITHOUT generating anything
    (used by oracle SQL strings that embed read_parquet paths)."""
    key = (f"{name}-v5-s{seed}-p{n_pages}-e{n_entities}-k{int(skew)}"
           + ("" if inline_ner else "-noner"))
    return os.path.join(root, key)


def ensure_fixture(name: str = "conformance", seed: int = 7, n_pages: int = 200,
                   n_entities: int = 1200, skew: bool = False,
                   inline_ner: bool = True,
                   root: str = "/tmp/tabbyray_fixtures") -> str:
    """Generate (or reuse cached) fixture directory with pages.parquet,
    kb.parquet, gold_cells.parquet. Returns the directory path."""
    path = fixture_path(name, seed, n_pages, n_entities, skew, inline_ner, root)
    marker = os.path.join(path, "_COMPLETE.json")
    if os.path.exists(marker):
        return path
    tmp = path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    rng = random.Random(seed)
    kb = build_kb(rng, n_entities)
    pages, gold_cells = build_pages(rng, kb, n_pages, skew=skew,
                                    inline_ner=inline_ner)
    pq.write_table(kb, os.path.join(tmp, "kb.parquet"))
    pq.write_table(pages, os.path.join(tmp, "pages.parquet"))
    # sharded layout (the realistic Common-Crawl shape: many WARC-derived
    # files) — read tasks, extract locality and lineage shards all key
    # off files, so the single-file form caps read parallelism at 1
    n_parts = max(1, min(32, n_pages // 250))
    parts_dir = os.path.join(tmp, "pages_parts")
    os.makedirs(parts_dir, exist_ok=True)
    step = (pages.num_rows + n_parts - 1) // n_parts
    for i in range(n_parts):
        pq.write_table(pages.slice(i * step, step),
                       os.path.join(parts_dir, f"part-{i:04d}.parquet"))
    pq.write_table(gold_cells, os.path.join(tmp, "gold_cells.parquet"))
    with open(os.path.join(tmp, "_COMPLETE.json"), "w") as f:
        json.dump({"name": name, "seed": seed, "n_pages": n_pages,
                   "n_entities": n_entities, "skew": skew,
                   "pages": pages.num_rows, "kb": kb.num_rows,
                   "cells": gold_cells.num_rows}, f)
    if os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    os.rename(tmp, path)
    return path


def ensure_link_fixture(n_pages: int = 500, seed: int = 37,
                        communities: int = 1,
                        root: str = "/tmp/tabbyray_fixtures") -> str:
    """Deterministic crawl-page fixture for the link-graph operators:
    ``links.parquet`` with (url:string, html:string). Every page URL is
    unique and already fragment-free; the html body embeds anchors in
    the canonical serialization ``<a href="H">w</a>`` (the documented
    extraction contract) covering every href class the resolver
    handles: absolute http(s) (including raw-case scheme/host, explicit
    default ports and fragments — canonicalization must flatten them),
    protocol-relative (``//host/path``), root-relative (``/seg``),
    directory-relative (``seg`` / ``sub/seg``), plus the dropped
    classes: fragment-only, empty, ``mailto:`` and ``javascript:``.
    Absolute targets point at OTHER fixture pages so the resolved graph
    is dense enough for host pagerank. Returns the parquet path.

    ``communities > 1`` partitions the HOST universe into that many
    disjoint groups (by deterministic host index) and restricts every
    cross-page link to targets whose host is in the same group — the
    inter-host graph then has exactly ``communities`` connected
    components (dense within, no edges between), the shape the
    host_components oracle needs."""
    key = (f"links-v1-s{seed}-p{n_pages}"
           + (f"-c{communities}" if communities > 1 else "") + ".parquet")
    path = os.path.join(root, key)
    if os.path.exists(path):
        return path
    rng = random.Random(seed)
    all_hosts = sorted({s + d for s in _WEB_SUBS for d in _WEB_DOMAINS})
    host_comm = {h: i % communities for i, h in enumerate(all_hosts)}
    # page URLs: one capture per page, path depth >= 1 so every base
    # has a well-defined directory for relative resolution
    page_urls, page_hosts = [], []
    seen = set()
    while len(page_urls) < n_pages:
        scheme = rng.choice(["http", "https"])
        host = rng.choice(_WEB_SUBS) + rng.choice(_WEB_DOMAINS)
        port = rng.choice([None] * 9 + [8080])
        depth = rng.randint(1, 3)
        p = "".join(f"/{rng.choice(_WEB_PATH_WORDS)}{rng.randrange(60)}"
                    for _ in range(depth))
        if rng.random() < 0.25:
            p += "/"
        q = f"?q={rng.randrange(40)}" if rng.random() < 0.15 else ""
        u = f"{scheme}://{host}{':' + str(port) if port else ''}{p}{q}"
        if u not in seen:
            seen.add(u)
            page_urls.append(u)
            page_hosts.append(host)
    comm_pages = [[i for i, h in enumerate(page_hosts)
                   if host_comm[h] == c] for c in range(communities)]

    def pick_target(i: int) -> str:
        if communities == 1:
            return page_urls[rng.randrange(n_pages)]
        pool = comm_pages[host_comm[page_hosts[i]]]
        return page_urls[pool[rng.randrange(len(pool))]]

    urls, htmls = [], []
    for i, u in enumerate(page_urls):
        n_links = rng.randint(0, 6)
        parts = [f"<p>{' '.join(rng.choice(_WEB_PATH_WORDS) for _ in range(8))}</p>"]
        for j in range(n_links):
            kind = rng.randrange(10)
            if kind < 4:        # absolute link to another page (raw variants)
                t = pick_target(i)
                sch, rest = t.split("://", 1)
                if rng.random() < 0.2:
                    sch = sch.upper()
                if rng.random() < 0.2:
                    # uppercase the host portion
                    k = min([x for x in (rest.find("/"), rest.find("?"))
                             if x >= 0] or [len(rest)])
                    rest = rest[:k].upper() + rest[k:]
                if ":" not in rest.split("/", 1)[0] and rng.random() < 0.15:
                    dflt = 443 if sch.lower() == "https" else 80
                    k = min([x for x in (rest.find("/"), rest.find("?"))
                             if x >= 0] or [len(rest)])
                    rest = rest[:k] + f":{dflt}" + rest[k:]
                href = f"{sch}://{rest}"
                if rng.random() < 0.25:
                    href += f"#frag{rng.randrange(5)}"
            elif kind < 5:      # protocol-relative
                t = pick_target(i)
                href = "//" + t.split("://", 1)[1].split("?", 1)[0]
            elif kind < 7:      # root-relative
                href = (f"/{rng.choice(_WEB_PATH_WORDS)}{rng.randrange(60)}"
                        f"/{rng.choice(_WEB_PATH_WORDS)}{rng.randrange(60)}")
                if rng.random() < 0.3:
                    href += f"?lang={rng.choice(['en', 'de'])}"
            elif kind < 9:      # directory-relative
                href = f"{rng.choice(_WEB_PATH_WORDS)}{rng.randrange(60)}"
                if rng.random() < 0.4:
                    href = (f"{rng.choice(_WEB_PATH_WORDS)}"
                            f"{rng.randrange(60)}/" + href)
            else:               # dropped classes
                href = rng.choice(["", f"#sec{rng.randrange(8)}",
                                   "mailto:a@b.example",
                                   "javascript:void(0)"])
            parts.append(f'<a href="{href}">{rng.choice(_WEB_PATH_WORDS)}'
                         f"{j}</a>")
        urls.append(u)
        htmls.append("<html><body>" + "".join(parts) + "</body></html>")
    table = pa.table({"url": pa.array(urls, pa.string()),
                      "html": pa.array(htmls, pa.string())})
    os.makedirs(root, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def ensure_lineset_docs(n_docs: int = 400, seed: int = 31,
                        n_boiler: int = 80,
                        root: str = "/tmp/tabbyray_fixtures") -> str:
    """Deterministic multi-line document fixture for corpus-level line
    dedup (the CCNet scenario): ``linedocs.parquet`` with
    (doc_id:int64, text:string) where text is 2-10 newline-joined
    lines. ~40% of lines are drawn from a shared pool of ``n_boiler``
    boilerplate lines (nav/footer strings that recur across documents);
    the rest are unique to the document. A handful of docs are exact
    replicas of an earlier doc (whole-page dup) and some docs repeat a
    line internally, so keep-first must also dedup WITHIN a document.
    No line is empty and no line contains a newline."""
    key = f"linedocs-v1-s{seed}-d{n_docs}-b{n_boiler}.parquet"
    path = os.path.join(root, key)
    if os.path.exists(path):
        return path
    rng = random.Random(seed)
    words = _WEB_PATH_WORDS + ["copyright", "privacy", "terms", "menu",
                               "home", "contact", "search", "login"]
    boiler = [f"{rng.choice(words)} {rng.choice(words)} "
              f"{rng.choice(words)} {i}" for i in range(n_boiler)]
    texts = []
    for d in range(n_docs):
        if d > 20 and rng.random() < 0.05:
            texts.append(texts[rng.randrange(d - 10, d)])  # whole-page dup
            continue
        n_lines = rng.randint(2, 10)
        lines = []
        for j in range(n_lines):
            if rng.random() < 0.4:
                lines.append(rng.choice(boiler))
            else:
                lines.append(f"doc {d} line {j} "
                             + " ".join(rng.choice(words) for _ in range(5)))
        if n_lines >= 4 and rng.random() < 0.2:
            lines[n_lines - 1] = lines[0]   # intra-doc repeat
        texts.append("\n".join(lines))
    table = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    os.makedirs(root, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def ensure_robots_fixture(seed: int = 41,
                          root: str = "/tmp/tabbyray_fixtures") -> str:
    """Deterministic robots.txt corpus for the robots-gate oracle:
    ``robots.parquet`` with (host:string, robots_txt:string) over the
    same host universe as the capture-log fixture (so the host join is
    meaningful). ~80% of hosts carry a robots file; the rest are absent
    (default-allow path). Each file mixes, in realistic order: comment
    lines, a decoy ``User-agent: evilbot`` group whose rules must be
    IGNORED (often ``Disallow: /``), the ``User-agent: *`` group with
    0-5 Allow/Disallow prefix rules drawn from the capture path
    vocabulary, noise directives (``Crawl-delay``, ``Sitemap``), and
    sometimes a trailing group for another agent — so group-boundary
    termination is exercised in both parsers. Rule paths are ``/word``
    or ``/word<digit>`` prefixes, and a few hosts get ``Disallow: /``
    in the ``*`` group (block-everything)."""
    key = f"robots-v1-s{seed}.parquet"
    path = os.path.join(root, key)
    if os.path.exists(path):
        return path
    rng = random.Random(seed)
    hosts = sorted({s + d for s in _WEB_SUBS for d in _WEB_DOMAINS})
    out_hosts, out_txt = [], []
    for h in hosts:
        if rng.random() < 0.2:
            continue                       # no robots.txt -> default allow
        lines = [f"# robots for {h}"]
        if rng.random() < 0.5:             # decoy group (must be ignored)
            lines += ["User-agent: evilbot", "Disallow: /"]
            if rng.random() < 0.5:
                lines.append("")
        lines.append("User-agent: *")
        n_rules = rng.randint(0, 5)
        if rng.random() < 0.1:
            lines.append("Disallow: /")    # block-everything host
        for _ in range(n_rules):
            word = rng.choice(_WEB_PATH_WORDS)
            p = f"/{word}" if rng.random() < 0.5 else f"/{word}{rng.randrange(6)}"
            verb = "Allow" if rng.random() < 0.35 else "Disallow"
            lines.append(f"{verb}: {p}")
        if rng.random() < 0.3:
            lines.append(f"Crawl-delay: {rng.randint(1, 10)}")   # ignored
        if rng.random() < 0.3:
            lines.append(f"Sitemap: https://{h}/sitemap.xml")    # ignored
        if rng.random() < 0.3:             # trailing non-* group
            lines += ["", "User-agent: otherbot",
                      f"Allow: /{rng.choice(_WEB_PATH_WORDS)}"]
        out_hosts.append(h)
        out_txt.append("\n".join(lines))
    table = pa.table({"host": pa.array(out_hosts, pa.string()),
                      "robots_txt": pa.array(out_txt, pa.string())})
    os.makedirs(root, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def ensure_html_fixture(n_pages: int = 400, seed: int = 53,
                        root: str = "/tmp/tabbyray_fixtures") -> str:
    """Deterministic HTML corpus for the visible-text extractor:
    ``html.parquet`` with (url:string, html:string). Every page
    exercises the full strip chain: a doctype, HTML comments (some
    multi-line), ``<script>`` and ``<style>`` blocks whose BODIES must
    vanish entirely (multi-line, attribute-bearing open tags), nested
    inline markup, attribute-heavy tags, the entity set
    (&lt; &gt; &quot; &#39; &nbsp; and &amp; — including the
    ``&amp;lt;`` double-escape trap that breaks a wrong decode order),
    and messy whitespace (newlines, tabs, runs of spaces) that must
    collapse to single spaces."""
    key = f"html-v1-s{seed}-p{n_pages}.parquet"
    path = os.path.join(root, key)
    if os.path.exists(path):
        return path
    rng = random.Random(seed)
    words = _WEB_PATH_WORDS + ["пример", "данные", "таблица", "graph",
                               "corpus", "crawl"]
    ents = ["&lt;", "&gt;", "&quot;", "&#39;", "&nbsp;", "&amp;",
            "&amp;lt;"]
    urls, htmls = [], []
    for i in range(n_pages):
        host = rng.choice(_WEB_SUBS) + rng.choice(_WEB_DOMAINS)
        urls.append(f"https://{host}/page{i}")
        body = []
        for _ in range(rng.randint(1, 5)):
            ws = [rng.choice(words) for _ in range(rng.randint(3, 10))]
            if rng.random() < 0.5:
                ws.insert(rng.randrange(len(ws)), rng.choice(ents))
            txt = " ".join(ws)
            if rng.random() < 0.4:
                k = rng.randrange(len(txt))
                txt = txt[:k] + rng.choice(["\n", "\t", "   "]) + txt[k:]
            tag = rng.choice(["p", "div", "span", "li"])
            attr = ' class="c1" data-x="1"' if rng.random() < 0.4 else ""
            if rng.random() < 0.3:
                txt = (f"{txt[:len(txt) // 2]}<b>{rng.choice(words)}</b>"
                       f"{txt[len(txt) // 2:]}")
            body.append(f"<{tag}{attr}>{txt}</{tag}>")
        if rng.random() < 0.6:
            body.insert(rng.randrange(len(body) + 1),
                        f"<script type=\"text/javascript\">\nvar x = "
                        f"{rng.randrange(100)};\nconsole.log('{rng.choice(words)}');"
                        f"\n</script>")
        if rng.random() < 0.5:
            body.insert(rng.randrange(len(body) + 1),
                        f"<style>\n.c1 {{ color: red; margin: "
                        f"{rng.randrange(9)}px }}\n</style>")
        if rng.random() < 0.5:
            body.insert(rng.randrange(len(body) + 1),
                        f"<!-- comment {rng.choice(words)}\n spanning -->")
        htmls.append("<!doctype html>\n<html>\n<body>"
                     + "\n".join(body) + "</body>\n</html>")
    table = pa.table({"url": pa.array(urls, pa.string()),
                      "html": pa.array(htmls, pa.string())})
    os.makedirs(root, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def ensure_quality_docs(n_docs: int = 500, seed: int = 59,
                        root: str = "/tmp/tabbyray_fixtures") -> str:
    """Deterministic document fixture for the Gopher-style quality gate:
    ``qualitydocs.parquet`` with (doc_id:int64, text:string) where every
    rejection rule has both passing and failing docs: too-short and
    long-enough word counts, degenerate mean word length (runs of 1-char
    or 20+-char tokens), symbol-heavy docs ('#' and '…'), bullet-led
    lines ('•' / '- '), ellipsis-ended lines, low-alpha docs (numeric
    tokens), and docs with/without the English stopword set. Text is
    newline-joined lines of space-joined words (no tabs, no empty
    lines)."""
    key = f"qualitydocs-v1-s{seed}-d{n_docs}.parquet"
    path = os.path.join(root, key)
    if os.path.exists(path):
        return path
    rng = random.Random(seed)
    stopwords = ["the", "be", "to", "of", "and", "that", "have", "with"]
    plain = _WEB_PATH_WORDS + ["signal", "window", "stream", "vector",
                               "column", "batch"]
    texts = []
    for d in range(n_docs):
        flavor = rng.randrange(8)
        n_lines = rng.randint(1, 6)
        lines = []
        for _ in range(n_lines):
            n_words = rng.randint(2, 14) if flavor == 0 else rng.randint(6, 14)
            ws = []
            for _ in range(n_words):
                r = rng.random()
                if flavor == 1 and r < 0.7:
                    ws.append("x" * rng.randint(14, 24))    # huge words
                elif flavor == 2 and r < 0.7:
                    ws.append(rng.choice(["a", "i", "x"]))  # tiny words
                elif flavor == 3 and r < 0.4:
                    ws.append(rng.choice(["#", "…", "##"]))  # symbols
                elif flavor == 4 and r < 0.6:
                    ws.append(str(rng.randrange(10_000)))   # numeric
                elif flavor != 5 and r < 0.25:
                    ws.append(rng.choice(stopwords))        # 5: no stopwords
                else:
                    ws.append(rng.choice(plain))
            line = " ".join(ws)
            if flavor == 6 and rng.random() < 0.6:
                line = rng.choice(["• ", "- "]) + line      # bullet lines
            if flavor == 7 and rng.random() < 0.6:
                line += rng.choice(["…", "..."])            # ellipsis ends
            lines.append(line)
        texts.append("\n".join(lines))
    table = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    os.makedirs(root, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def ensure_repetition_docs(n_docs: int = 500, seed: int = 61,
                           root: str = "/tmp/tabbyray_fixtures") -> str:
    """Deterministic fixture for the Gopher repetition signals:
    ``repdocs.parquet`` with (doc_id:int64, text:string). Flavors give
    every rule both sides: clean multi-line docs; docs with one line
    repeated many times (dup-line + dup-char rules); docs with a short
    phrase (2-4 words) spammed inline (top-n-gram rules, overlapping
    occurrences included); docs right AT a threshold boundary (the <=
    keep rule is exercised exactly); single-line and two-word
    minimal docs (no 3/4-grams exist)."""
    key = f"repdocs-v1-s{seed}-d{n_docs}.parquet"
    path = os.path.join(root, key)
    if os.path.exists(path):
        return path
    rng = random.Random(seed)
    words = _WEB_PATH_WORDS + ["stream", "vector", "column", "window",
                               "signal", "batch", "token", "corpus"]
    def fresh_line(k):
        return " ".join(rng.choice(words) + str(rng.randrange(50))
                        for _ in range(k))
    texts = []
    for d in range(n_docs):
        flavor = rng.randrange(6)
        if flavor == 0:                       # clean
            lines = [fresh_line(rng.randint(5, 12))
                     for _ in range(rng.randint(2, 8))]
        elif flavor == 1:                     # heavy line repetition
            boiler = fresh_line(rng.randint(3, 8))
            lines = []
            for _ in range(rng.randint(4, 10)):
                lines.append(boiler if rng.random() < 0.6
                             else fresh_line(rng.randint(3, 8)))
        elif flavor == 2:                     # ngram spam
            n = rng.randint(2, 4)
            phrase = " ".join(rng.choice(words) for _ in range(n))
            ws = []
            for _ in range(rng.randint(8, 30)):
                ws.append(phrase if rng.random() < 0.4
                          else rng.choice(words) + str(rng.randrange(50)))
            lines = [" ".join(ws)]
        elif flavor == 3:                     # exactly at the dup-line bound
            uniq = [fresh_line(4) for _ in range(7)]
            lines = uniq + [uniq[0], uniq[1], uniq[2]]  # 3 dups / 10 lines
        elif flavor == 4:                     # minimal docs
            lines = [" ".join(rng.choice(words)
                              for _ in range(rng.randint(1, 3)))]
        else:                                 # overlap stress: aaa a...
            w = rng.choice(words)
            lines = [" ".join([w] * rng.randint(4, 12))]
        texts.append("\n".join(lines))
    table = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    os.makedirs(root, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def ensure_anchor_entity_fixture(n_pages: int = 300, n_entities: int = 120,
                                 seed: int = 67,
                                 root: str = "/tmp/tabbyray_fixtures") -> str:
    """Deterministic fixture for anchor-text entity linking: a dir with
    ``pages.parquet`` (url, html — canonical-serialization anchors whose
    texts are decorated entity-label variants or noise) and
    ``labels.parquet`` (entity, label). Shapes exercised on purpose:

    * decorations that normalization must erase: case flips, extra
      internal/edge spaces, wrapping/trailing punctuation («», *, !).
      None introduce '"' or '<' (the extraction contract).
    * multi-label entities, incl. a variant label that normalizes to a
      DIFFERENT key (matches nothing — the " Inc" suffix).
    * AMBIGUOUS surface forms: sibling entity pairs whose labels
      differ only by case/spacing (same norm — punctuation deltas do
      NOT collide: the strip inserts no space, so 'Delta-Corp' norms
      to 'Deltacorp'), so both match every decorated anchor and the
      top-1 rule (votes desc, entity asc) must break the tie.
    * Cyrillic labels (the ucfirst/ё quirks run on real data) and pure
      noise anchors plus '***' texts that normalize to '' (filtered).
    * duplicate labels WITHIN one entity (distinct raw, same norm) —
      the (norm, entity) distinct must collapse them or votes double.
    """
    key = f"anchorkb-v2-s{seed}-p{n_pages}-e{n_entities}"
    path = os.path.join(root, key)
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    rng = random.Random(seed)
    first = ["Santa", "Grand", "North", "Delta", "Omega", "Royal",
             "Union", "Vista", "Echo", "Halcyon"]
    second = ["Fe", "Rapids", "Harbor", "Corp", "Labs", "Point",
              "Works", "Mills", "Ridge", "Gate"]
    cyr = ["Москва", "Ёлкино", "Пермь", "Сити", "Берег"]

    ents, labels = [], []
    base_labels = []
    for i in range(n_entities):
        kind = i % 10
        if kind < 7:
            base = f"{rng.choice(first)} {rng.choice(second)}{i}"
        else:
            base = f"{rng.choice(cyr)} {rng.choice(second)}{i}"
        ent = "http://kb.example/resource/" + base.replace(" ", "_")
        base_labels.append(base)
        ents.append(ent)
        labels.append((ent, base))
        if kind == 1:       # same-norm duplicate label within the entity
            labels.append((ent, base.upper()))
        if kind == 2:       # different-norm variant: matches nothing
            labels.append((ent, base + " Inc"))
        if kind == 3:       # ambiguous sibling: same-norm label
            sib = "http://kb.example/resource/sib_" + base.replace(" ", "_")
            ents.append(sib)
            labels.append((sib, base.replace(" ", "  ").lower()))

    targets = [f"https://{rng.choice(_WEB_SUBS)}{rng.choice(_WEB_DOMAINS)}"
               f"/t/{w}{i}"
               for i, w in enumerate(rng.choices(_WEB_PATH_WORDS, k=80))]

    def decorate(label: str) -> str:
        style = rng.randrange(6)
        if style == 0:
            return label
        if style == 1:
            return label.upper()
        if style == 2:
            return f"  {label}! "
        if style == 3:
            return "«" + label.replace(" ", "  ") + "»"
        if style == 4:
            return "*" + label.lower() + "*"
        return label + "..."

    urls, htmls = [], []
    for p in range(n_pages):
        u = (f"https://{rng.choice(_WEB_SUBS)}{rng.choice(_WEB_DOMAINS)}"
             f"/p/{rng.choice(_WEB_PATH_WORDS)}{p}")
        parts = []
        for _ in range(rng.randint(0, 6)):
            href = (rng.choice(targets) if rng.random() < 0.8
                    else f"/local/{rng.choice(_WEB_PATH_WORDS)}"
                         f"{rng.randrange(40)}")
            r = rng.random()
            if r < 0.65:
                text = decorate(rng.choice(base_labels))
            elif r < 0.9:
                text = (f"{rng.choice(_WEB_PATH_WORDS)} "
                        f"{rng.choice(_WEB_PATH_WORDS)}{rng.randrange(30)}")
            else:
                text = rng.choice(["***", "–—", "", "!!"])
            parts.append(f'<a href="{href}">{text}</a>')
        urls.append(u)
        htmls.append("<html><body>" + " ".join(parts) + "</body></html>")

    os.makedirs(path, exist_ok=True)
    pages_t = pa.table({"url": pa.array(urls, pa.string()),
                        "html": pa.array(htmls, pa.string())})
    labels_t = pa.table({
        "entity": pa.array([e for e, _l in labels], pa.string()),
        "label": pa.array([l for _e, l in labels], pa.string())})
    for name, t in (("pages.parquet", pages_t),
                    ("labels.parquet", labels_t)):
        tmp = os.path.join(path, name + ".tmp")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(path, name))
    with open(done, "w") as f:
        f.write("ok")
    return path


def ensure_blocklist_fixture(root: str = "/tmp/tabbyray_fixtures") -> str:
    """Tiny deterministic UT1-style domain blocklist over the web
    fixture's domain universe: two registered domains blocked (one with
    mixed-case raw entries — the gate lowercases), one entry that
    matches nothing (blocklists always carry dead domains)."""
    path = os.path.join(root, "blocklist-v1.parquet")
    if os.path.exists(path):
        return path
    table = pa.table({"domain": pa.array(
        ["Shoppy.IO", "forum-board.org", "dead-domain.example"],
        pa.string())})
    os.makedirs(root, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def ensure_template_fixture(n_hosts: int = 10, seed: int = 71,
                            root: str = "/tmp/tabbyray_fixtures") -> str:
    """Deterministic fixture for per-host template mining:
    ``template.parquet`` with (url, html). Each host has 1-8 pages; a
    host-wide HEADER and FOOTER block appear on every page (template),
    a PROMO block on roughly half (one host pins it to exactly 50% —
    the >= boundary), content blocks are unique per page, a singleton
    host exercises the min_pages floor, and script/entity noise rides
    inside blocks so the strip chain does real work."""
    key = f"template-v1-s{seed}-h{n_hosts}.parquet"
    path = os.path.join(root, key)
    if os.path.exists(path):
        return path
    rng = random.Random(seed)
    urls, htmls = [], []
    for h in range(n_hosts):
        host = f"site{h}.{rng.choice(_WEB_DOMAINS)}"
        n_pages = 1 if h == 0 else rng.randint(2, 8)
        header = f"Welcome to site{h} &amp; friends"
        footer = f"Copyright site{h} — all rights reserved"
        promo = f"Join the site{h} newsletter today"
        # exactly-half host: even page count, promo on first half
        if h == 1:
            n_pages = 6
        for p in range(n_pages):
            parts = [f'<div class="hdr">{header}</div>',
                     '<script>var x = "<div>not text</div>";</script>']
            if (h == 1 and p < 3) or (h > 1 and rng.random() < 0.5):
                parts.append(f"<p>{promo}</p>")
            for _ in range(rng.randint(1, 3)):
                words = " ".join(rng.choice(_WEB_PATH_WORDS)
                                 + str(rng.randrange(90))
                                 for _ in range(rng.randint(3, 9)))
                parts.append(f"<li>{words}</li>")
            parts.append(f"<div>{footer}</div>")
            urls.append(f"https://{host}/p/{p}")
            htmls.append("<html><body>" + "".join(parts)
                         + "</body></html>")
    table = pa.table({"url": pa.array(urls, pa.string()),
                      "html": pa.array(htmls, pa.string())})
    os.makedirs(root, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def ensure_tracking_fixture(n_urls: int = 400, seed: int = 73,
                            root: str = "/tmp/tabbyray_fixtures") -> str:
    """Deterministic fixture for tracking-param stripping and
    clean-URL recrawl dedup: ``tracking.parquet`` with (url, warc_ts
    int64 us). ~n_urls/3 base resources each captured 1-5 times with
    DIFFERENT tracking decorations (so stripped forms collapse) and
    strictly increasing timestamps; query strings mix tracking params
    (utm_*, gclid, fbclid, ref, mc_cid/mc_eid) with real params at
    every position (first / middle / last / only / none), some urls
    with fragments and non-default ports, some with empty param
    values, and clean urls that must pass through byte-identical."""
    key = f"tracking-v2-s{seed}-u{n_urls}.parquet"
    path = os.path.join(root, key)
    if os.path.exists(path):
        return path
    rng = random.Random(seed)
    track = ["utm_source=news", "utm_medium=cpc", "utm_campaign=x1",
             "utm_term=", "gclid=abc123", "fbclid=zz9", "ref=sidebar",
             "mc_cid=77", "mc_eid=a1b2"]
    real = ["q=7", "page=2", "lang=en", "id=991", "sort=asc", "v="]
    urls, tss = [], []
    ts = 1_735_689_600_000_000
    for i in range(max(1, n_urls // 3)):
        host = rng.choice(_WEB_SUBS) + rng.choice(_WEB_DOMAINS)
        scheme = rng.choice(["http", "https"])
        port = ":8080" if rng.random() < 0.1 else ""
        p = f"/{rng.choice(_WEB_PATH_WORDS)}{i}"
        base_real = sorted({rng.choice(real)
                            for _ in range(rng.randint(0, 2))})
        for _cap in range(rng.randint(1, 5)):
            n_t = rng.randint(0, 3)
            params = list(base_real) + [rng.choice(track)
                                        for _ in range(n_t)]
            rng.shuffle(params)
            q = "?" + "&".join(params) if params else ""
            frag = (f"#sec{rng.randrange(5)}"
                    if rng.random() < 0.2 else "")
            urls.append(f"{scheme}://{host}{port}{p}{q}{frag}")
            ts += rng.randint(1, 10_000_000)
            tss.append(ts)
    table = pa.table({"url": pa.array(urls, pa.string()),
                      "warc_ts": pa.array(tss, pa.int64())})
    os.makedirs(root, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def ensure_crawl_fixture(n_resources: int = 300, seed: int = 79,
                         root: str = "/tmp/tabbyray_fixtures") -> str:
    """Deterministic end-to-end crawl-curation fixture:
    ``crawl.parquet`` with (url, warc_ts int64 us, html) over the SAME
    host universe as the robots fixture (so robots rules bind) and the
    blocklist fixture's blocked domains. Every curation gate gets both
    sides:

    * ~15% of resources live on blocked registered domains.
    * paths reuse the robots path vocabulary, so some canonical URLs
      hit Disallow rules (and Allow overrides).
    * each resource is captured 1-3 times, some captures decorated
      with tracking params (collapse under the clean form) at strictly
      increasing global timestamps; the html CONTENT CHANGES per
      capture except a marker tied to the resource, so the
      latest-capture choice is observable.
    * body flavors: good latin paragraphs (pass all gates); too-short
      (fail Gopher quality); one line spammed (fail repetition);
      Cyrillic-dominant (fail script routing); near-empty. ~10% of
      GOOD resources share an identical visible body with another
      resource (content dup across urls — keep-first by clean_url).
    * html carries the usual noise: script bodies with block tags in
      strings, entities, comments."""
    key = f"crawl-v1-s{seed}-r{n_resources}.parquet"
    path = os.path.join(root, key)
    if os.path.exists(path):
        return path
    rng = random.Random(seed)
    blocked = ["shoppy.io", "forum-board.org"]       # = blocklist fixture
    good_words = ["the", "and", "for", "with", "from", "this", "that",
                  "have", "were", "their", "about", "which", "would",
                  "there", "could", "people", "system", "process",
                  "data", "value", "market", "river", "city", "house"]

    def good_body(k: int) -> str:
        ps = []
        for _ in range(3):
            ws = [rng.choice(good_words) for _ in range(14)]
            ps.append(" ".join(ws))
        return (f"<p>resource {k} overview: {ps[0]}.</p>"
                f"<p>{ps[1]} &amp; more.</p><p>{ps[2]}.</p>")

    dup_pool = []
    urls, tss, htmls = [], [], []
    ts = 1_735_689_600_000_000
    for r in range(n_resources):
        if rng.random() < 0.15:
            dom = rng.choice(blocked)
        else:
            dom = rng.choice([d for d in _WEB_DOMAINS
                              if d not in blocked])
        host = rng.choice(_WEB_SUBS) + dom
        word = rng.choice(_WEB_PATH_WORDS)
        p = (f"/{word}" if rng.random() < 0.3
             else f"/{word}{rng.randrange(6)}")
        p += f"/r{r}"
        flavor = rng.randrange(10)
        if flavor < 5:                       # good
            if dup_pool and rng.random() < 0.2:
                body = rng.choice(dup_pool)  # exact content dup
            else:
                body = good_body(r)
                dup_pool.append(body)
        elif flavor < 7:                     # too short
            body = f"<p>tiny {r}</p>"
        elif flavor < 8:                     # repetition spam
            line = f"buy resource {r} now and again"
            body = "<p>" + " ".join([line] * 12) + "</p>"
        else:                                # cyrillic-dominant
            body = (f"<p>ресурс {r}: это полностью русский текст "
                    "про длинную реку и большой город возле " 
                    "старого моста через долину</p>")
        noise = ('<script>var t = "<p>ghost</p>";</script>'
                 "<!-- comment -->")
        for _cap in range(rng.randint(1, 3)):
            q = ""
            if rng.random() < 0.4:
                q = "?" + rng.choice(["utm_source=x", "gclid=g1",
                                      "ref=feed"])
            ts += rng.randint(1, 5_000_000)
            urls.append(f"https://{host}{p}{q}")
            tss.append(ts)
            htmls.append("<html><body>" + noise
                         + f"<!-- cap {_cap} -->" + body
                         + "</body></html>")
    table = pa.table({"url": pa.array(urls, pa.string()),
                      "warc_ts": pa.array(tss, pa.int64()),
                      "html": pa.array(htmls, pa.string())})
    os.makedirs(root, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def ensure_fuzzy_linkage_fixture(n_entities: int = 80,
                                 n_mentions: int = 400, seed: int = 73,
                                 root: str = "/tmp/tabbyray_fixtures"
                                 ) -> str:
    """Deterministic fixture for fuzzy entity linkage / resolution: a
    dir with ``labels.parquet`` (entity, label) and
    ``mentions.parquet`` (mention_id, surface).  ASCII-only on purpose
    (byte-level == char-level Levenshtein, and the pure-ASCII DuckDB
    norm chain applies exactly).  Shapes exercised:

    * duplicate-entity PAIRS: a ``_v2`` twin whose label is one
      mid-word edit (sub/ins/del of a letter) from the original;
    * duplicate CHAINS of three (A-B and B-C at distance 1, A-C at
      distance 2 — only transitive closure merges them);
    * distance-0 twins: a sibling whose label differs only by case /
      doubled spaces (same norm, different entity);
    * labels that normalize to '' (``***``) — a ``_ghost`` entity
      carrying ONLY such labels must vanish from every output;
    * multi-label entities (a far-away alias that matches nothing);
    * mention surfaces: decorated (case flips, wrapping punctuation,
      edge spaces) entity labels with 0 or 1 extra mid-word edit, plus
      random-word noise mentions.
    """
    key = f"fuzzylink-v1-s{seed}-e{n_entities}-m{n_mentions}"
    path = os.path.join(root, key)
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    rng = random.Random(seed)
    first = ["Santa", "Grand", "North", "Delta", "Omega", "Royal",
             "Union", "Vista", "Echo", "Halcyon", "Iron", "Cedar"]
    second = ["Fe", "Rapids", "Harbor", "Corp", "Labs", "Point",
              "Works", "Mills", "Ridge", "Gate", "Forge", "Fields"]

    def edit1(s: str, rng: random.Random) -> str:
        """One mid-word lowercase-letter edit that survives the norm
        chain (never touches position 0, spaces, or punctuation)."""
        alpha = "abcdefghijklmnopqrstuvwxyz"
        idxs = [i for i, ch in enumerate(s) if i > 0 and ch.isalpha()]
        i = rng.choice(idxs)
        op = rng.randrange(3)
        if op == 0:                                     # substitute
            repl = rng.choice([c for c in alpha if c != s[i].lower()])
            return s[:i] + repl + s[i + 1:]
        if op == 1:                                     # insert
            return s[:i] + rng.choice(alpha) + s[i:]
        return s[:i] + s[i + 1:]                        # delete

    ents: list[tuple[str, str]] = []
    base_labels: list[str] = []
    for i in range(n_entities):
        base = f"{rng.choice(first)} {rng.choice(second)}{i}"
        uri = "http://kb.example/resource/" + base.replace(" ", "_")
        kind = i % 10
        ents.append((uri, base))
        base_labels.append(base)
        if kind == 6:            # duplicate pair at distance 1
            ents.append((uri + "_v2", edit1(base, rng)))
        elif kind == 7:          # chain of three: A-B-C
            b = edit1(base, rng)
            ents.append((uri + "_v2", b))
            ents.append((uri + "_v3", edit1(b, rng)))
        elif kind == 8:          # distance-0 twin (same norm)
            ents.append(("http://kb.example/resource/sib_"
                         + base.replace(" ", "_"),
                         base.upper().replace(" ", "  ")))
        elif kind == 9:          # far-away alias + an all-'' ghost
            ents.append((uri, "Zephyr Quills" + str(i) + "x"))
            ents.append((uri + "_ghost", "***"))
    mentions = []
    for m in range(n_mentions):
        r = rng.random()
        if r < 0.55:
            s = rng.choice(base_labels)
        elif r < 0.8:
            s = edit1(rng.choice(base_labels), rng)
        else:
            s = (f"{rng.choice(['blue', 'crimson', 'velvet', 'quartz'])} "
                 f"{rng.choice(['falcon', 'meadow', 'anchor', 'lantern'])}"
                 f"{rng.randrange(50)}")
        style = rng.randrange(5)
        if style == 1:
            s = s.upper()
        elif style == 2:
            s = f"  {s}! "
        elif style == 3:
            s = "*" + s.lower() + "*"
        elif style == 4:
            s = s + "..."
        mentions.append((m, s))

    os.makedirs(path, exist_ok=True)
    labels_t = pa.table({
        "entity": pa.array([e for e, _l in ents], pa.string()),
        "label": pa.array([l for _e, l in ents], pa.string())})
    mentions_t = pa.table({
        "mention_id": pa.array([i for i, _s in mentions], pa.int64()),
        "surface": pa.array([s for _i, s in mentions], pa.string())})
    for name, t in (("labels.parquet", labels_t),
                    ("mentions.parquet", mentions_t)):
        tmp = os.path.join(path, name + ".tmp")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(path, name))
    with open(done, "w") as f:
        f.write("ok")
    return path


def ensure_topic_docs(n_docs: int = 400, n_topics: int = 3, seed: int = 91,
                      root: str = "/tmp/tabbyray_fixtures") -> str:
    """Deterministic topical corpus for TF-IDF cosine similarity:
    ``(doc_id, text)`` where each doc draws most tokens from its
    topic's private vocabulary plus a few corpus-wide stopword-like
    tokens.  Same-topic pairs land at intermediate cosine (0.2-0.8),
    cross-topic pairs near 0 once the max-df cap drops the shared
    tokens — the shape the sf tables can't produce (their vocabulary
    is one shared 30-word pool, so only exact duplicates survive the
    cap)."""
    path = os.path.join(root, f"topicdocs-v1-s{seed}-d{n_docs}-t{n_topics}"
                              ".parquet")
    if os.path.exists(path):
        return path
    rng = random.Random(seed)
    topics = [[f"t{k}w{i}" for i in range(60)] for k in range(n_topics)]
    shared = [f"common{i}" for i in range(12)]
    ids, texts = [], []
    for d in range(n_docs):
        k = d % n_topics
        n_tok = rng.randint(40, 80)
        toks = []
        for _ in range(n_tok):
            if rng.random() < 0.25:
                toks.append(rng.choice(shared))
            else:
                # zipf-ish: favor the front of the topic vocabulary
                i = min(int(rng.expovariate(1 / 12.0)), 59)
                toks.append(topics[k][i])
        ids.append(d)
        texts.append(" ".join(toks))
    table = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts, pa.string())})
    os.makedirs(root, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def ensure_retrieval_queries(root: str = "/tmp/tabbyray_fixtures") -> str:
    """Static eval-query set for BM25 retrieval scoring over the sf
    ``documents`` tables: terms drawn from the generator's shared
    30-word vocabulary (so every query matches many docs at every
    scale), plus one term that matches nothing and one empty-ish
    query."""
    path = os.path.join(root, "retrievalq-v1.parquet")
    if os.path.exists(path):
        return path
    qs = ["table scan merge join",
          "fast key sort",
          "customer order line",
          "window stream batch",
          "group agg filter row",
          "vector hash part",
          "zzz-nomatch-term",
          "slow big small query data"]
    table = pa.table({"query_id": pa.array(range(len(qs)), pa.int64()),
                      "text": pa.array(qs, pa.string())})
    os.makedirs(root, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def ensure_interval_fixture(n_a: int = 300, n_b: int = 200, seed: int = 97,
                            root: str = "/tmp/tabbyray_fixtures") -> str:
    """Deterministic interval tables for the overlap join: one parquet
    with (iv_id, kind, lo, hi) — kind 'a' rows vs kind 'b' rows.
    Mix of short intervals, a few giants (bucket-amplification path),
    point intervals (lo == hi), and exact-touching endpoints (closed
    semantics: touching counts)."""
    path = os.path.join(root,
                        f"intervals-v1-s{seed}-a{n_a}-b{n_b}.parquet")
    if os.path.exists(path):
        return path
    rng = random.Random(seed)
    ids, kinds, los, his = [], [], [], []
    iv = 0
    for kind, n in (("a", n_a), ("b", n_b)):
        for _ in range(n):
            lo = rng.randrange(0, 100_000)
            r = rng.random()
            if r < 0.70:
                w = rng.randrange(0, 500)         # short (incl. points)
            elif r < 0.95:
                w = rng.randrange(500, 5_000)
            else:
                w = rng.randrange(5_000, 40_000)  # giants
            ids.append(iv)
            kinds.append(kind)
            los.append(lo)
            his.append(lo + w)
            iv += 1
    # planted exact-touch pair: [x, y] meets [y, z]
    ids += [iv, iv + 1]
    kinds += ["a", "b"]
    los += [200_000, 200_500]
    his += [200_500, 201_000]
    table = pa.table({"iv_id": pa.array(ids, pa.int64()),
                      "kind": pa.array(kinds, pa.string()),
                      "lo": pa.array(los, pa.int64()),
                      "hi": pa.array(his, pa.int64())})
    os.makedirs(root, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def ensure_kg_edges_fixture(n_entities: int = 160, seed: int = 83,
                            root: str = "/tmp/tabbyray_fixtures") -> str:
    """Deterministic KG edge list for the schema-profiling oracles
    (predicate cardinality, inverse-predicate detection, 2-hop path
    profile): one parquet with (subj, pred, obj) URIs and five
    predicates of known character —

    * ``bornIn``   — functional N:1 (every person exactly one place)
    * ``ownsPet``  — 1:N inverse-functional (each pet owned once)
    * ``hasPart`` / ``partOf`` — a true inverse pair (~85% reversed
      coverage plus unpaired noise on both sides)
    * ``marriedTo`` — symmetric (~80% of edges have their reverse)
    * ``linksTo``  — asymmetric random noise (N:M)

    Duplicated rows are emitted on purpose (the ops must distinct
    first); self-loops are excluded at generation."""
    path = os.path.join(root, f"kgedges-v1-s{seed}-e{n_entities}.parquet")
    if os.path.exists(path):
        return path
    rng = random.Random(seed)
    ent = [f"http://example.org/kg/e{i}" for i in range(n_entities)]
    rows: list[tuple[str, str, str]] = []
    pred = "http://example.org/kg/p/{}".format
    # bornIn: entities 30.. each exactly one place among the first 10
    for i in range(30, n_entities):
        rows.append((ent[i], pred("bornIn"), ent[rng.randrange(10)]))
    # ownsPet: owners 0..29, pets 100.. each owned exactly once
    pets = list(range(100, n_entities))
    rng.shuffle(pets)
    p_i = 0
    for i in range(30):
        for _ in range(rng.randint(1, 3)):
            if p_i >= len(pets):
                break
            rows.append((ent[i], pred("ownsPet"), ent[pets[p_i]]))
            p_i += 1
    # hasPart / partOf: inverse pair with noise
    for _ in range(120):
        a, b = rng.sample(range(n_entities), 2)
        rows.append((ent[a], pred("hasPart"), ent[b]))
        if rng.random() < 0.85:
            rows.append((ent[b], pred("partOf"), ent[a]))
    for _ in range(15):   # unpaired partOf noise
        a, b = rng.sample(range(n_entities), 2)
        rows.append((ent[a], pred("partOf"), ent[b]))
    # marriedTo: symmetric ~80%
    for _ in range(60):
        a, b = rng.sample(range(n_entities), 2)
        rows.append((ent[a], pred("marriedTo"), ent[b]))
        if rng.random() < 0.8:
            rows.append((ent[b], pred("marriedTo"), ent[a]))
    # linksTo: N:M noise (drives the 2-hop path profile density)
    for _ in range(250):
        a, b = rng.sample(range(n_entities), 2)
        rows.append((ent[a], pred("linksTo"), ent[b]))
    # deliberate duplicates: re-emit a deterministic 10% sample
    rows += [rows[i] for i in range(0, len(rows), 10)]
    rng.shuffle(rows)
    table = pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string())})
    os.makedirs(root, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def ensure_kg_literals_fixture(n_subjects: int = 220, seed: int = 89,
                               root: str = "/tmp/tabbyray_fixtures") -> str:
    """Deterministic literal-bearing triple stream for the datatype-
    inference oracle (``ops.kgprofile.datatype_profile``): one parquet
    with (subj, pred, obj) where ``obj`` is the RAW LEXICAL FORM a
    table/web extractor would emit — untyped strings whose datatype
    must be INDUCED. Predicates with known mixes:

    * ``population`` — integers, ~8% messy ("1,200", "unknown")
    * ``height``     — decimals, some integers (a value like "180"
      legitimately classifies integer — the profile shows the split)
    * ``founded``    — ISO dates, ~10% bare years (integer lexical)
    * ``homepage``   — http(s) URIs, a couple of malformed stragglers
    * ``active``     — true/false plus Yes/No noise (string class)
    * ``motto``      — free strings (some digit-leading, not numeric)

    Duplicates re-emitted on purpose; empty strings sprinkled in (the
    op must bucket them as 'string', never crash)."""
    path = os.path.join(root,
                        f"kgliterals-v1-s{seed}-n{n_subjects}.parquet")
    if os.path.exists(path):
        return path
    rng = random.Random(seed)
    subj = [f"http://example.org/kg/s{i}" for i in range(n_subjects)]
    pred = "http://example.org/kg/p/{}".format
    rows: list[tuple[str, str, str]] = []
    mottos = ["per aspera ad astra", "4 winds rising", "semper fi",
              "e pluribus unum", "", "citius altius fortius"]
    for i in range(n_subjects):
        r = rng.random()
        pop = (f"{rng.randint(1, 900)},{rng.randint(100, 999)}"
               if r < 0.05 else "unknown" if r < 0.08
               else str(rng.randint(100, 5_000_000)))
        rows.append((subj[i], pred("population"), pop))
        h = (str(rng.randint(120, 210)) if rng.random() < 0.2
             else f"{rng.uniform(1.2, 2.1):.2f}")
        rows.append((subj[i], pred("height"), h))
        f = (str(rng.randint(1200, 2020)) if rng.random() < 0.1
             else f"{rng.randint(1200, 2020):04d}-"
                  f"{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}")
        rows.append((subj[i], pred("founded"), f))
        if rng.random() < 0.7:
            u = (f"http{'s' if rng.random() < 0.6 else ''}://"
                 f"example{rng.randint(0, 99)}.org/page/{i}"
                 if rng.random() > 0.04 else f"www.broken{i}.example")
            rows.append((subj[i], pred("homepage"), u))
        a = ("true" if rng.random() < 0.45 else
             "false" if rng.random() < 0.8 else
             rng.choice(["Yes", "No", "TRUE"]))
        rows.append((subj[i], pred("active"), a))
        if rng.random() < 0.5:
            rows.append((subj[i], pred("motto"), rng.choice(mottos)))
    rows += [rows[i] for i in range(0, len(rows), 9)]  # duplicates
    rng.shuffle(rows)
    table = pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string())})
    os.makedirs(root, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def ensure_kg_taxonomy_fixture(n_entities: int = 400, seed: int = 91,
                               root: str = "/tmp/tabbyray_fixtures"
                               ) -> str:
    """Deterministic rdf:type + rdfs:subClassOf triple stream for the
    RDFS type-closure oracle (``ops.kgprofile.type_closure``): ONE
    parquet mixing both predicates (the op splits by predicate, as a
    real ingest would). Class DAG: 30 classes in 4 levels with
    multiple inheritance (some classes have 2 parents) and a couple of
    redundant shortcut edges (so min-depth vs any-path matters);
    max chain depth 4. Entities get 1-2 asserted types at any level.
    Duplicate triples re-emitted on purpose."""
    path = os.path.join(root,
                        f"kgtaxo-v1-s{seed}-e{n_entities}.parquet")
    if os.path.exists(path):
        return path
    rng = random.Random(seed)
    cls = "http://example.org/kg/C{}".format
    ent = "http://example.org/kg/e{}".format
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    subclass = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
    # levels: 0 = roots (3), 1 = 6, 2 = 9, 3 = 12  (30 classes)
    levels = [list(range(0, 3)), list(range(3, 9)),
              list(range(9, 18)), list(range(18, 30))]
    sc: list[tuple[int, int]] = []
    for li in range(1, 4):
        for c in levels[li]:
            parents = rng.sample(levels[li - 1],
                                 2 if rng.random() < 0.3 else 1)
            sc += [(c, p) for p in parents]
    # redundant shortcut edges: level-3 -> level-1 (min-depth tiebreak)
    for c in rng.sample(levels[3], 3):
        sc.append((c, rng.choice(levels[1])))
    rows: list[tuple[str, str, str]] = [
        (cls(a), subclass, cls(b)) for a, b in sc]
    all_cls = [c for lv in levels for c in lv]
    for i in range(n_entities):
        for c in rng.sample(all_cls, 2 if rng.random() < 0.35 else 1):
            rows.append((ent(i), rdf_type, cls(c)))
    rows += [rows[i] for i in range(0, len(rows), 7)]  # duplicates
    rng.shuffle(rows)
    table = pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string())})
    os.makedirs(root, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def ensure_kg_mixed_fixture(n_entities: int = 150, seed: int = 97,
                            root: str = "/tmp/tabbyray_fixtures") -> str:
    """Deterministic MIXED KG triple stream for the construction-stage
    oracles (``ops.kgconstruct``: domain/range induction, owl:sameAs
    closure, functional-constraint validation, negative sampling) —
    one parquet with (subj, pred, obj) holding four triple families in
    one stream, as a real ingest would:

    * ``rdf:type`` assertions — ~70% of entities typed with 1-2
      classes from {Person, Agent, Org, Place}; the rest untyped (the
      domain/range profile must bucket them under '(untyped)')
    * fact edges — ``worksFor`` (mostly Person->Org), ``locatedIn``
      (declared FUNCTIONAL; ~8 planted violators assert 2-3 distinct
      places), ``knows`` (N:M noise)
    * ``owl:sameAs`` — alias chains of length 1-3 hanging off ~25
      base entities (alias URIs sort AFTER their base, so the
      closure's lexicographic-min canonical is the base entity) (a1 sameAs e, a2 sameAs a1, ...), plus reversed
      duplicates and a few self-loops; a share of the fact edges is
      asserted ABOUT aliases so the closure rewrite visibly merges
      facts
    Duplicate rows re-emitted on purpose (ops must distinct first)."""
    path = os.path.join(root, f"kgmixed-v2-s{seed}-e{n_entities}.parquet")
    if os.path.exists(path):
        return path
    rng = random.Random(seed)
    ent = [f"http://example.org/kg/e{i}" for i in range(n_entities)]
    pred = "http://example.org/kg/p/{}".format
    cls = "http://example.org/kg/C/{}".format
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    sameas = "http://www.w3.org/2002/07/owl#sameAs"
    rows: list[tuple[str, str, str]] = []

    # classes: persons 0..79, orgs 80..119, places 120..149 (with
    # holes -> untyped endpoints, and some Person+Agent multi-typing)
    for i in range(n_entities):
        if rng.random() < 0.3:
            continue                      # untyped entity
        if i < 80:
            rows.append((ent[i], rdf_type, cls("Person")))
            if rng.random() < 0.4:
                rows.append((ent[i], rdf_type, cls("Agent")))
        elif i < 120:
            rows.append((ent[i], rdf_type, cls("Org")))
        else:
            rows.append((ent[i], rdf_type, cls("Place")))

    # sameAs alias chains over the first 25 persons
    alias_of: dict[str, str] = {}
    for i in range(25):
        prev = ent[i]
        for j in range(rng.randint(1, 3)):
            a = f"http://example.org/kg/e{i}-alias{j}"
            rows.append((a, sameas, prev))
            if rng.random() < 0.4:        # reversed duplicate
                rows.append((prev, sameas, a))
            alias_of[a] = ent[i]
            prev = a
    for i in rng.sample(range(25), 4):    # self-loops (must be ignored)
        rows.append((ent[i], sameas, ent[i]))
    aliases = list(alias_of)

    def some_subject(i: int) -> str:
        """Base entity i, or (30%) one of its aliases when it has any."""
        mine = [a for a, b in alias_of.items() if b == ent[i]]
        if mine and rng.random() < 0.3:
            return rng.choice(mine)
        return ent[i]

    # worksFor: persons -> orgs (some via alias subjects)
    for i in range(70):
        if rng.random() < 0.75:
            rows.append((some_subject(i), pred("worksFor"),
                         ent[rng.randrange(80, 120)]))
    # locatedIn: FUNCTIONAL — orgs/persons one place each, 8 violators
    located = rng.sample(range(120), 90)
    violators = set(located[:8])
    for i in located:
        rows.append((ent[i], pred("locatedIn"),
                     ent[rng.randrange(120, n_entities)]))
        if i in violators:
            for _ in range(rng.randint(1, 2)):
                rows.append((ent[i], pred("locatedIn"),
                             ent[rng.randrange(120, n_entities)]))
    # knows: N:M noise, some alias endpoints on either side
    pool = ent[:80] + aliases
    for _ in range(120):
        a, b = rng.sample(pool, 2)
        rows.append((a, pred("knows"), b))

    rows += [rows[i] for i in range(0, len(rows), 8)]   # duplicates
    rng.shuffle(rows)
    table = pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string())})
    os.makedirs(root, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def ensure_kg_ontology_fixture(n_entities: int = 180, seed: int = 101,
                               root: str = "/tmp/tabbyray_fixtures"
                               ) -> str:
    """Deterministic triple stream carrying ONTOLOGY AXIOMS alongside
    instance data, for the OWL/RDFS entailment oracles
    (``ops.kginfer``): one parquet with (subj, pred, obj) mixing

    * ``rdfs:subPropertyOf`` axioms — a 2-level chain
      (hasCEO < hasEmployee < affiliatedWith) plus two properties
      sharing one superproperty (parentOf, mentorOf < relatedTo)
    * one ``owl:inverseOf`` axiom — (employs, worksAt); instance
      edges exist on BOTH sides, ~35% already materialized as mirrors
      (the entailment op must dedup against asserted rows)
    * an ``owl:SymmetricProperty`` declaration — friendOf, ~40% of
      edges pre-mirrored
    * an ``owl:TransitiveProperty`` declaration — ancestorOf, an
      ACYCLIC forest of descent chains of depth 4-6 with branching
      (so the closure adds real multi-hop pairs; min-depth matters
      through remarriage-style shortcut edges)
    * an ``owl:InverseFunctionalProperty`` declaration — email;
      ~10 planted identity groups of 2-3 entities share an address,
      including one CHAIN (a~b via m1, b~c via m2) so pair->component
      resolution is visible
    * ``rdfs:domain`` / ``rdfs:range`` axioms (employs, worksAt,
      ancestorOf, hasCEO) plus PARTIAL asserted rdf:type rows — the
      rdfs2/rdfs3 entailment must add the missing types while the
      asserted ones keep 'asserted' provenance
    * ``linksTo`` N:M noise

    Duplicate rows re-emitted on purpose (ops must distinct first);
    hasCEO instance edges are a SUBSET relation of hasEmployee only
    through entailment (a few entailed rows are also asserted, so the
    asserted-beats-entailed min-rank is exercised)."""
    path = os.path.join(root, f"kgonto-v2-s{seed}-e{n_entities}.parquet")
    if os.path.exists(path):
        return path
    rng = random.Random(seed)
    ent = [f"http://example.org/kg/e{i}" for i in range(n_entities)]
    pred = "http://example.org/kg/p/{}".format
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    subprop = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
    inverse = "http://www.w3.org/2002/07/owl#inverseOf"
    owl_sym = "http://www.w3.org/2002/07/owl#SymmetricProperty"
    owl_trans = "http://www.w3.org/2002/07/owl#TransitiveProperty"
    owl_ifp = "http://www.w3.org/2002/07/owl#InverseFunctionalProperty"
    rows: list[tuple[str, str, str]] = []

    # --- axioms ---
    rows += [(pred("hasCEO"), subprop, pred("hasEmployee")),
             (pred("hasEmployee"), subprop, pred("affiliatedWith")),
             (pred("parentOf"), subprop, pred("relatedTo")),
             (pred("mentorOf"), subprop, pred("relatedTo")),
             (pred("employs"), inverse, pred("worksAt")),
             (pred("friendOf"), rdf_type, owl_sym),
             (pred("ancestorOf"), rdf_type, owl_trans),
             (pred("email"), rdf_type, owl_ifp)]
    rdfs_domain = "http://www.w3.org/2000/01/rdf-schema#domain"
    rdfs_range = "http://www.w3.org/2000/01/rdf-schema#range"
    cls = "http://example.org/kg/C/{}".format
    rows += [(pred("employs"), rdfs_domain, cls("Org")),
             (pred("employs"), rdfs_range, cls("Person")),
             (pred("worksAt"), rdfs_domain, cls("Person")),
             (pred("worksAt"), rdfs_range, cls("Org")),
             (pred("ancestorOf"), rdfs_domain, cls("Person")),
             (pred("ancestorOf"), rdfs_range, cls("Person")),
             (pred("hasCEO"), rdfs_range, cls("Person"))]
    # PARTIAL asserted types: entailment must fill the gaps while the
    # asserted rows keep 'asserted' provenance
    for i in range(0, 30):
        rows.append((ent[i], rdf_type, cls("Person")))
    for o in range(100, 120):
        rows.append((ent[o], rdf_type, cls("Org")))

    # --- instances ---
    # orgs 100..139, persons 0..99, places 140..
    # hasCEO: each org one CEO; ~25% ALSO asserted as hasEmployee
    for o in range(100, 140):
        c = rng.randrange(100)
        rows.append((ent[o], pred("hasCEO"), ent[c]))
        if rng.random() < 0.25:
            rows.append((ent[o], pred("hasEmployee"), ent[c]))
    # hasEmployee noise
    for _ in range(60):
        rows.append((ent[rng.randrange(100, 140)], pred("hasEmployee"),
                     ent[rng.randrange(100)]))
    # parentOf / mentorOf
    for _ in range(40):
        a, b = rng.sample(range(100), 2)
        rows.append((ent[a], pred("parentOf"), ent[b]))
    for _ in range(20):
        a, b = rng.sample(range(100), 2)
        rows.append((ent[a], pred("mentorOf"), ent[b]))
    # employs / worksAt with partial materialized mirrors
    for _ in range(40):
        o, p = rng.randrange(100, 140), rng.randrange(100)
        rows.append((ent[o], pred("employs"), ent[p]))
        if rng.random() < 0.35:
            rows.append((ent[p], pred("worksAt"), ent[o]))
    for _ in range(15):   # worksAt-only side
        o, p = rng.randrange(100, 140), rng.randrange(100)
        rows.append((ent[p], pred("worksAt"), ent[o]))
    # friendOf symmetric ~40% pre-mirrored
    for _ in range(40):
        a, b = rng.sample(range(100), 2)
        rows.append((ent[a], pred("friendOf"), ent[b]))
        if rng.random() < 0.4:
            rows.append((ent[b], pred("friendOf"), ent[a]))
    # ancestorOf: acyclic descent forest — edges only i -> j with
    # j > i inside a family block, chains of depth 4-6, branching 1-2,
    # plus grandparent shortcut edges (min-depth tiebreak)
    fam_starts = list(range(0, 96, 12))          # 8 family blocks
    anc_edges: list[tuple[int, int]] = []
    for s in fam_starts:
        gen = [s]
        nxt_id = s + 1
        for _depth in range(rng.randint(4, 6)):
            nxt_gen = []
            for g in gen:
                for _ in range(rng.randint(1, 2)):
                    if nxt_id >= s + 12:
                        break
                    anc_edges.append((g, nxt_id))
                    nxt_gen.append(nxt_id)
                    nxt_id += 1
            if not nxt_gen:
                break
            gen = nxt_gen
    for g, c in anc_edges:
        rows.append((ent[g], pred("ancestorOf"), ent[c]))
    for g, c in rng.sample(anc_edges, min(5, len(anc_edges))):
        # shortcut: great-grandparent asserted directly (depth-1 row
        # that the closure would otherwise derive at depth >= 2)
        deeper = [d for (p2, d) in anc_edges if p2 == c]
        if deeper:
            rows.append((ent[g], pred("ancestorOf"),
                         ent[rng.choice(deeper)]))
    # linksTo noise
    for _ in range(60):
        a, b = rng.sample(range(n_entities), 2)
        rows.append((ent[a], pred("linksTo"), ent[b]))
    # email IFP: base addresses + planted shared groups (incl a chain)
    for i in range(60):
        rows.append((ent[i], pred("email"),
                     f"mailto:u{i}@example.org"))
    for g in range(8):
        # disjoint member blocks (components stay separable); group
        # sizes alternate 2/3
        base = 60 + 4 * g
        members = list(range(base, base + 2 + (g % 2)))
        addr = f"mailto:shared{g}@example.org"
        for m in members:
            rows.append((ent[m], pred("email"), addr))
    # ONE deliberate cross-group bridge: a member of group 0 also
    # asserts group 1's address (components must merge through it)
    rows.append((ent[60], pred("email"), "mailto:shared1@example.org"))
    # the chain: e150~e151 via c1, e151~e152 via c2
    rows += [(ent[150], pred("email"), "mailto:chain1@example.org"),
             (ent[151], pred("email"), "mailto:chain1@example.org"),
             (ent[151], pred("email"), "mailto:chain2@example.org"),
             (ent[152], pred("email"), "mailto:chain2@example.org")]

    rows += [rows[i] for i in range(0, len(rows), 9)]   # duplicates
    rng.shuffle(rows)
    table = pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string())})
    os.makedirs(root, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


_SD_TYPES = ["Person", "Place", "Organization", "Book", "Event"]
_SD_PROPS = ["name", "alternateName", "jobTitle", "addressLocality",
             "publisher", "headline", "genre", "nationality"]
_SD_WORDS = _WEB_PATH_WORDS + ["Anna", "Bor", "Carta", "Delta", "данные",
                               "graph", "corpus", "Rock & Roll", "O'Neil"]
_SD_META = ["og:title", "og:type", "og:site_name", "og:locale",
            "article:section"]


def ensure_structured_fixture(n_pages: int = 500, seed: int = 67,
                              root: str = "/tmp/tabbyray_fixtures") -> str:
    """Deterministic structured-data corpus: ``structured.parquet`` with
    (url:string, html:string). Pages embed the three in-page structured
    -data carriers a Common-Crawl KG-construction pass mines:

    * 0-3 ``<script type="application/ld+json">`` blocks — flat JSON-LD
      objects with ``@id``/``@type`` plus 2-5 scalar properties (strings
      incl. non-ASCII / '&' / "'", and ints). ~10% of blocks are
      deliberately INVALID JSON (must be skipped), ~15% carry one nested
      -object property (skipped by the scalar-only contract).
    * 0-2 microdata scopes — ``<div itemscope itemtype="...">`` holding
      1-4 canonical ``<span itemprop="p">v</span>`` spans with filler
      text between them (no nested divs inside a scope, values '<'- and
      '"'-free: the canonical-serialization contract, same spirit as
      the anchor-text fixture).
    * 0-4 ``<meta property="..." content="...">`` head tags (values
      HTML-escaped; extraction keeps the raw escaped text — no entity
      decode, documented).

    Filler paragraphs surround every carrier so offsets are irregular.
    """
    key = f"structured-v1-s{seed}-p{n_pages}.parquet"
    path = os.path.join(root, key)
    if os.path.exists(path):
        return path
    rng = random.Random(seed)
    urls, htmls = [], []
    for i in range(n_pages):
        host = rng.choice(_WEB_SUBS) + rng.choice(_WEB_DOMAINS)
        urls.append(f"https://{host}/sd{i}")
        head = []
        for _ in range(rng.randint(0, 4)):
            prop = rng.choice(_SD_META)
            val = _html.escape(" ".join(
                rng.choice(_SD_WORDS) for _ in range(rng.randint(1, 3))),
                quote=True)
            head.append(f'<meta property="{prop}" content="{val}">')
        body = []
        for j in range(rng.randint(0, 3)):
            if rng.random() < 0.10:
                body.append('<script type="application/ld+json">'
                            f'{{bad json {i}_{j}</script>')
                continue
            obj = {"@id": f"https://kg.example/e{i}_{j}",
                   "@type": rng.choice(_SD_TYPES)}
            for p in rng.sample(_SD_PROPS, rng.randint(2, 5)):
                if rng.random() < 0.2:
                    obj[p] = rng.randrange(1, 2000)
                else:
                    obj[p] = " ".join(rng.choice(_SD_WORDS)
                                      for _ in range(rng.randint(1, 3)))
            if rng.random() < 0.15:
                obj["address"] = {"streetAddress": rng.choice(_SD_WORDS)}
            body.append('<script type="application/ld+json">'
                        + json.dumps(obj) + '</script>')
        for _ in range(rng.randint(0, 2)):
            itype = f"https://schema.org/{rng.choice(_SD_TYPES)}"
            spans = []
            for p in rng.sample(_SD_PROPS, rng.randint(1, 4)):
                v = " ".join(rng.choice(_SD_WORDS)
                             for _ in range(rng.randint(1, 2))).replace(
                    "&", "and").replace('"', "")
                spans.append(f'<span itemprop="{p}">{v}</span>')
                if rng.random() < 0.5:
                    spans.append(" " + rng.choice(_BOILER) + " ")
            body.append(f'<div itemscope itemtype="{itype}">'
                        + "".join(spans) + '</div>')
        filler = [f"<p>{' '.join(rng.choice(_BOILER) for _ in range(rng.randint(2, 8)))}</p>"
                  for _ in range(rng.randint(1, 4))]
        parts = body + filler
        rng.shuffle(parts)
        htmls.append("<html><head>" + "".join(head) + "</head><body>"
                     + "".join(parts) + "</body></html>")
    table = pa.table({"url": pa.array(urls, pa.string()),
                      "html": pa.array(htmls, pa.string())})
    os.makedirs(root, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path

"""Web-capture operators over Common-Crawl-style page tables.

The flagship's input shape is (url, warc_ts, html, text, lang) — a
crawl capture log. These operators cover the crawl-side bookkeeping a
KG-construction pipeline needs before extraction ever runs:

* ``url_components`` — vectorized RFC-3986-lite URL parsing (scheme,
  host, port, path, query, fragment, registered domain) as a stateless
  zero-copy Arrow ``map_batches`` stage (``pyarrow.compute
  extract_regex``, RE2). Scale-free: no state, no shuffle.
* ``url_canonicalize`` — canonical URL form: lowercased scheme + host,
  default port (80/443) stripped, empty path -> '/', fragment dropped,
  non-empty query kept verbatim. One derived column, stateless.
* ``latest_capture_per_url`` — the recrawl dedup every crawl snapshot
  needs: top-1 capture per canonical URL by (warc_ts desc). Reuses
  ``ops.relational.grouped_argmax`` — a batch-local top-1 combiner,
  ONE canon-hash exchange, vectorized in-partition finish. At 100 TB
  this is the same plan as the C8 winner argmax: one shuffle whose
  payload is <= one row per (url, input block).
* ``host_stats`` — per-host crawl rollup (captures, distinct canonical
  URLs, total payload bytes, last-seen timestamp), composed entirely
  from existing primitives: ``hash_aggregate`` (count/sum combiner) +
  ``distinct_count`` (exact distinct, pair-hash exchange) +
  ``grouped_argmax`` (last capture) joined with two co-partitioned
  ``hash_join`` passes. Hosts are the classic skew key (one host can be
  1% of a crawl) — every stage here pre-aggregates inside the batch
  before its exchange, so the hot host ships partials, not rows.

Fragment/query edge cases follow the fixture contract: absent query and
fragment parse as '' (matching DuckDB ``regexp_extract``'s no-match
result); an empty-but-present query ('?#f') is treated as absent.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .relational import distinct_count, grouped_argmax, hash_aggregate, hash_join

_URL_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
           r"(?P<hostport>[^/?#]*)(?P<path>[^?#]*)"
           r"(?:\?(?P<query>[^#]*))?(?:#(?P<fragment>.*))?$")
_HOSTPORT_RE = r"^(?P<host>[^:]*)(?::(?P<port>[0-9]+))?$"
_REG_DOMAIN_RE = r"(?P<reg>[^.]+\.[^.]+)$"


def _parse_batch(t: pa.Table, url_col: str) -> dict[str, pa.Array]:
    """Vectorized parse of one Arrow batch -> component arrays."""
    u = pc.cast(t.column(url_col), pa.string())
    parts = pc.extract_regex(u, _URL_RE)
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    hostport = pc.utf8_lower(pc.struct_field(parts, "hostport"))
    hp = pc.extract_regex(hostport, _HOSTPORT_RE)
    host = pc.struct_field(hp, "host")
    port_s = pc.struct_field(hp, "port")
    default_port = pc.if_else(pc.equal(scheme, "https"),
                              pa.scalar(443, pa.int64()),
                              pa.scalar(80, pa.int64()))
    port = pc.if_else(
        pc.equal(pc.fill_null(port_s, ""), ""),
        default_port,
        pc.cast(pc.if_else(pc.equal(pc.fill_null(port_s, ""), ""),
                           "0", pc.fill_null(port_s, "")), pa.int64()))
    raw_path = pc.fill_null(pc.struct_field(parts, "path"), "")
    path = pc.if_else(pc.equal(raw_path, ""), "/", raw_path)
    query = pc.fill_null(pc.struct_field(parts, "query"), "")
    fragment = pc.fill_null(pc.struct_field(parts, "fragment"), "")
    reg = pc.fill_null(pc.struct_field(
        pc.extract_regex(host, _REG_DOMAIN_RE), "reg"), "")
    return {"scheme": scheme, "host": host, "port": port, "path": path,
            "query": query, "fragment": fragment, "registered_domain": reg}


def url_components(pages: rd.Dataset, url_col: str = "url") -> rd.Dataset:
    """Parse ``url_col`` into components (stateless vectorized map)."""
    def f(t: pa.Table) -> pa.Table:
        comp = _parse_batch(t, url_col)
        out = t
        for name, arr in comp.items():
            out = out.append_column(name, arr)
        return out

    return pages.map_batches(f, batch_format="pyarrow")


def _canon_array(t: pa.Table, url_col: str) -> pa.Array:
    comp = _parse_batch(t, url_col)
    default_port = pc.if_else(pc.equal(comp["scheme"], "https"),
                              pa.scalar(443, pa.int64()),
                              pa.scalar(80, pa.int64()))
    port_part = pc.if_else(
        pc.equal(comp["port"], default_port),
        pa.scalar("", pa.string()),
        pc.binary_join_element_wise(
            ":", pc.cast(comp["port"], pa.string()), ""))
    query_part = pc.if_else(
        pc.equal(comp["query"], ""),
        pa.scalar("", pa.string()),
        pc.binary_join_element_wise("?", comp["query"], ""))
    return pc.binary_join_element_wise(
        comp["scheme"], "://", comp["host"], port_part, comp["path"],
        query_part, "")


def url_canonicalize(pages: rd.Dataset, url_col: str = "url",
                     out_col: str = "canon_url") -> rd.Dataset:
    """Add the canonical URL column (see module docstring for the
    normal form). Stateless vectorized map — no shuffle."""
    def f(t: pa.Table) -> pa.Table:
        return t.append_column(out_col, _canon_array(t, url_col))

    return pages.map_batches(f, batch_format="pyarrow")


def latest_capture_per_url(pages: rd.Dataset, url_col: str = "url",
                           ts_col: str = "warc_ts",
                           num_partitions: "int | None" = None
                           ) -> rd.Dataset:
    """One row per canonical URL: the most recent capture (warc_ts
    desc, raw url asc tie-break). Plan: canonicalize (stateless) ->
    grouped_argmax (combiner + one canon-hash exchange)."""
    canon = url_canonicalize(pages, url_col)

    def to_us(t: pa.Table) -> pa.Table:
        return t.append_column(
            "ts_us", pc.cast(t.column(ts_col), pa.int64()))

    with_ts = canon.map_batches(to_us, batch_format="pyarrow")
    return grouped_argmax(
        with_ts, key="canon_url", order_col="ts_us", tie_col=url_col,
        out_cols=["canon_url", url_col, "ts_us", "content_len", "status"],
        num_partitions=num_partitions)


def host_stats(pages: rd.Dataset, url_col: str = "url",
               ts_col: str = "warc_ts", len_col: str = "content_len",
               num_partitions: "int | None" = None) -> rd.Dataset:
    """Per-host crawl rollup: (host, n_captures, n_urls, total_bytes,
    last_seen_us). Composition of existing partitioned primitives —
    every exchange ships batch-level partials, never raw rows."""
    def prep(t: pa.Table) -> pa.Table:
        comp = _parse_batch(t, url_col)
        return pa.table({
            "host": comp["host"],
            "canon_url": _canon_array(t, url_col),
            "content_len": pc.cast(t.column(len_col), pa.int64()),
            "ts_us": pc.cast(t.column(ts_col), pa.int64()),
        })

    base = pages.map_batches(prep, batch_format="pyarrow")
    agg = hash_aggregate(base, ["host"], {"content_len": "total_bytes"},
                         count_alias="n_captures",
                         num_partitions=num_partitions)
    nurls = distinct_count(base, "host", "canon_url", alias="n_urls",
                           num_partitions=num_partitions)
    last = grouped_argmax(base, key="host", order_col="ts_us",
                          tie_col="canon_url", out_cols=["host", "ts_us"],
                          num_partitions=num_partitions)

    def last_only(t: pa.Table) -> pa.Table:
        return pa.table({"host": t.column("host"),
                         "last_seen_us": t.column("ts_us")})

    last = last.map_batches(last_only, batch_format="pyarrow")
    joined = hash_join(agg, nurls, on=["host"],
                       num_partitions=num_partitions)
    return hash_join(joined, last, on=["host"],
                     num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# Link graph: anchor extraction -> href resolution -> host edges -> pagerank
# ---------------------------------------------------------------------------
#
# The KG-construction crawl side needs the page link graph (for host
# authority / crawl prioritization) before any table extraction runs.
# Contract (mirrored exactly by the DuckDB oracles):
#
# * extraction targets the canonical anchor serialization
#   ``<a href="H">`` (double-quoted, lowercase tag) — the fixture
#   writer only emits that form, and the SQL oracle uses the identical
#   RE2 pattern, so both sides parse the same grammar;
# * resolution is RFC-3986-lite: absolute http(s) hrefs pass through,
#   non-http(s) schemes (mailto:, javascript:) drop, ``//host/...``
#   takes the base scheme, ``/path`` joins the base origin, anything
#   else joins origin + base directory (path up to the last ``/``);
#   empty and fragment-only hrefs drop; fragments are stripped; no
#   dot-segment (``..``) collapsing (documented subset — the fixture
#   emits none);
# * both endpoints are then canonicalized with the SAME normal form as
#   ``url_canonicalize``.
#
# Everything is stateless vectorized Arrow (split_pattern /
# extract_regex / if_else) — zero shuffles until the host-edge
# aggregate, which ships per-batch partial counts.

_ANCHOR_PREFIX = '<a href="'


def _explode_positions(sp: pa.ListArray):
    """Flatten a list array, returning (flat_values, parent_indices,
    position_within_list) — the shared explode helper."""
    import numpy as np
    flat = pc.list_flatten(sp)
    parents = pc.list_parent_indices(sp)
    lens = pc.list_value_length(sp).to_numpy(zero_copy_only=False)
    lens = lens.astype("int64")
    starts = np.repeat(np.cumsum(lens) - lens, lens)
    pos = np.arange(len(flat), dtype="int64") - starts
    return flat, parents, pos


def extract_anchors(pages: rd.Dataset, url_col: str = "url",
                    html_col: str = "html") -> rd.Dataset:
    """One (url, href) row per ``<a href="...">`` anchor, in document
    order. Vectorized: split each page on the anchor prefix; every
    segment after the first starts with the href, terminated by the
    closing quote. Pages without anchors emit no rows."""
    def f(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([(url_col, pa.string()),
                                ("href", pa.string())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        html = pc.cast(t.column(html_col), pa.string()).combine_chunks()
        sp = pc.split_pattern(html, _ANCHOR_PREFIX)
        flat, parents, pos = _explode_positions(sp)
        mask = pa.array(pos > 0)
        seg = pc.filter(flat, mask)
        par = pc.filter(parents, mask)
        href = pc.struct_field(
            pc.extract_regex(seg, '^(?P<h>[^"]*)"'), "h")
        urls = pc.take(pc.cast(t.column(url_col), pa.string()), par)
        return pa.table({url_col: urls, "href": href})

    return pages.map_batches(f, batch_format="pyarrow")


def resolve_hrefs(anchors: rd.Dataset, url_col: str = "url",
                  href_col: str = "href", src_out: str = "src_canon",
                  dst_out: str = "dst_canon",
                  carry_cols: "list[str] | None" = None) -> rd.Dataset:
    """Resolve each (base url, href) pair to canonical (src, dst) URLs
    per the module resolution contract; undroppable rows only. Keeps
    the raw ``href`` column for provenance; ``carry_cols`` pass through
    unchanged (filtered with the kept rows). Stateless vectorized
    map."""
    carry = list(carry_cols or [])

    def f(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([(src_out, pa.string()),
                                (href_col, pa.string()),
                                (dst_out, pa.string())]
                               + [(c, pa.string()) for c in carry])
        if t.num_rows == 0:
            return out_schema.empty_table()
        comp = _parse_batch(t, url_col)
        src = _canon_array(t, url_col)
        href = pc.fill_null(
            pc.cast(t.column(href_col), pa.string()), "").combine_chunks()
        default_port = pc.if_else(pc.equal(comp["scheme"], "https"),
                                  pa.scalar(443, pa.int64()),
                                  pa.scalar(80, pa.int64()))
        port_part = pc.if_else(
            pc.equal(comp["port"], default_port),
            pa.scalar("", pa.string()),
            pc.binary_join_element_wise(
                ":", pc.cast(comp["port"], pa.string()), ""))
        origin = pc.binary_join_element_wise(
            comp["scheme"], "://", comp["host"], port_part, "")
        base_dir = pc.struct_field(
            pc.extract_regex(comp["path"], "^(?P<d>.*/)"), "d")
        empty_or_frag = pc.or_(pc.equal(href, ""),
                               pc.starts_with(href, "#"))
        has_scheme = pc.match_substring_regex(
            href, r"^[A-Za-z][A-Za-z0-9+.\-]*:")
        scheme_of = pc.utf8_lower(pc.fill_null(pc.struct_field(
            pc.extract_regex(href, r"^(?P<s>[A-Za-z][A-Za-z0-9+.\-]*):"),
            "s"), ""))
        http_abs = pc.and_(has_scheme, pc.is_in(
            scheme_of, value_set=pa.array(["http", "https"])))
        proto_rel = pc.starts_with(href, "//")
        root_rel = pc.and_(pc.starts_with(href, "/"),
                           pc.invert(proto_rel))
        resolved = pc.if_else(
            http_abs, href,
            pc.if_else(
                proto_rel,
                pc.binary_join_element_wise(comp["scheme"], ":", href, ""),
                pc.if_else(
                    root_rel,
                    pc.binary_join_element_wise(origin, href, ""),
                    pc.binary_join_element_wise(
                        origin, base_dir, href, ""))))
        resolved = pc.struct_field(
            pc.extract_regex(resolved, "^(?P<p>[^#]*)"), "p")
        keep = pc.and_(
            pc.invert(empty_or_frag),
            pc.or_(pc.invert(has_scheme), http_abs))
        cols = {src_out: src, href_col: href, "_resolved": resolved}
        for c in carry:
            cols[c] = pc.cast(t.column(c), pa.string())
        kept = pa.table(cols).filter(keep)
        dst = _canon_array(kept, "_resolved")
        out = {src_out: kept.column(src_out),
               href_col: kept.column(href_col), dst_out: dst}
        for c in carry:
            out[c] = kept.column(c)
        return pa.table(out)

    return anchors.map_batches(f, batch_format="pyarrow")


def resolve_links(pages: rd.Dataset, url_col: str = "url",
                  html_col: str = "html") -> rd.Dataset:
    """extract_anchors -> resolve_hrefs over a (url, html) page table:
    one (src_canon, href, dst_canon) row per resolvable anchor."""
    return resolve_hrefs(extract_anchors(pages, url_col, html_col),
                         url_col=url_col)


def host_edges(pages: rd.Dataset, url_col: str = "url",
               html_col: str = "html",
               num_partitions: "int | None" = None) -> rd.Dataset:
    """Host-level link rollup: (src_host, dst_host, n_links) including
    self-loops (intra-host nav). One combiner-backed hash exchange on
    the host pair — the hot-host case ships per-batch partial counts,
    never raw anchor rows."""
    links = resolve_links(pages, url_col, html_col)

    def hosts(t: pa.Table) -> pa.Table:
        schema = pa.schema([("src_host", pa.string()),
                            ("dst_host", pa.string()),
                            ("one", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        s = _parse_batch(t, "src_canon")
        d = _parse_batch(t, "dst_canon")
        return pa.table({"src_host": s["host"], "dst_host": d["host"],
                         "one": pa.array([1] * t.num_rows, pa.int64())})

    pairs = links.map_batches(hosts, batch_format="pyarrow")
    return hash_aggregate(
        pairs, keys=["src_host", "dst_host"], sum_cols={"one": "n_links"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("src_host", pa.string()),
                              ("dst_host", pa.string()),
                              ("n_links", pa.int64())]))


def host_pagerank(pages: rd.Dataset, url_col: str = "url",
                  html_col: str = "html", n_iter: int = 3,
                  num_partitions: "int | None" = None,
                  mode: str = "auto",
                  weighted: bool = False) -> rd.Dataset:
    """Damped PageRank over the DISTINCT inter-host edge set
    (self-loops excluded — intra-host nav drowns the authority
    signal). Reuses ``ops.graph.pagerank`` and inherits its auto
    broadcast/join switch: at crawl scale the join path's per-round
    exchange count is constant in graph size. ``weighted=True`` ranks
    by LINK MULTIPLICITY (each edge votes n_links times —
    r·w/W_out per edge) instead of the distinct edge set."""
    from .graph import pagerank

    edges = host_edges(pages, url_col, html_col,
                       num_partitions=num_partitions)

    def inter(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t.column("src_host"),
                                        t.column("dst_host"))))
        out = {"src": t.column("src_host"),
               "dst": t.column("dst_host")}
        if weighted:
            out["n_links"] = t.column("n_links")
        return pa.table(out)

    return pagerank(edges.map_batches(inter, batch_format="pyarrow"),
                    n_iter=n_iter, num_partitions=num_partitions,
                    mode=mode, node_dtype=pa.string(),
                    weight_col="n_links" if weighted else None)


def capture_diff(pages: rd.Dataset, ts_split_us: int,
                 url_col: str = "url", ts_col: str = "warc_ts",
                 len_col: str = "content_len",
                 num_partitions: "int | None" = None) -> rd.Dataset:
    """Crawl snapshot diff: compare the latest capture per canonical
    URL BEFORE ``ts_split_us`` (snapshot A) against the latest AT/AFTER
    it (snapshot B). Output one row per canonical URL seen in either:
    (canon_url, status, a_ts_us, b_ts_us, a_len, b_len) with status in
    {added, gone, changed, unchanged} ('changed' = payload length
    differs — the fixture has no content hash) and -1 sentinels on the
    absent side (keeps the schema all-int64; no float-null widening).

    Plan: two pruned passes over the capture log (one per side — at
    crawl scale two column-pruned scans beat materializing a mid-
    pipeline copy), each reduced by ``grouped_argmax`` (combiner + one
    canon-hash exchange), then ONE co-partitioned full outer
    ``hash_join`` on canon_url and a stateless classify map."""
    from .relational import hash_join

    def prep(lo: "int | None", hi: "int | None", pfx: str):
        def f(t: pa.Table) -> pa.Table:
            ts = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                         pa.int64())
            keep = pc.less(ts, hi) if hi is not None else \
                pc.greater_equal(ts, lo)
            tt = pa.table({
                "canon_url": _canon_array(t, url_col),
                f"{pfx}_ts_us": ts,
                f"{pfx}_len": pc.cast(t.column(len_col), pa.int64()),
                "_tie": pc.cast(t.column(url_col), pa.string()),
            }).filter(keep)
            return tt
        return f

    side_schema = lambda pfx: pa.schema(
        [("canon_url", pa.string()), (f"{pfx}_ts_us", pa.int64()),
         (f"{pfx}_len", pa.int64())])
    a = grouped_argmax(
        pages.map_batches(prep(None, ts_split_us, "a"),
                          batch_format="pyarrow"),
        key="canon_url", order_col="a_ts_us", tie_col="_tie",
        out_cols=["canon_url", "a_ts_us", "a_len"],
        num_partitions=num_partitions)
    b = grouped_argmax(
        pages.map_batches(prep(ts_split_us, None, "b"),
                          batch_format="pyarrow"),
        key="canon_url", order_col="b_ts_us", tie_col="_tie",
        out_cols=["canon_url", "b_ts_us", "b_len"],
        num_partitions=num_partitions)
    j = hash_join(a.select_columns(["canon_url", "a_ts_us", "a_len"]),
                  b.select_columns(["canon_url", "b_ts_us", "b_len"]),
                  on="canon_url", how="outer",
                  num_partitions=num_partitions,
                  left_schema=side_schema("a"),
                  right_schema=side_schema("b"))

    def classify(t: pa.Table) -> pa.Table:
        schema = pa.schema([("canon_url", pa.string()),
                            ("status", pa.string()),
                            ("a_ts_us", pa.int64()), ("b_ts_us", pa.int64()),
                            ("a_len", pa.int64()), ("b_len", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        a_ts = pc.fill_null(pc.cast(t.column("a_ts_us"), pa.int64()), -1)
        b_ts = pc.fill_null(pc.cast(t.column("b_ts_us"), pa.int64()), -1)
        a_len = pc.fill_null(pc.cast(t.column("a_len"), pa.int64()), -1)
        b_len = pc.fill_null(pc.cast(t.column("b_len"), pa.int64()), -1)
        only_b = pc.equal(a_ts, -1)
        only_a = pc.equal(b_ts, -1)
        status = pc.if_else(
            only_b, pa.scalar("added", pa.string()),
            pc.if_else(
                only_a, pa.scalar("gone", pa.string()),
                pc.if_else(pc.equal(a_len, b_len),
                           pa.scalar("unchanged", pa.string()),
                           pa.scalar("changed", pa.string()))))
        return pa.table({"canon_url": t.column("canon_url"),
                         "status": status, "a_ts_us": a_ts,
                         "b_ts_us": b_ts, "a_len": a_len,
                         "b_len": b_len})

    return j.map_batches(classify, batch_format="pyarrow")


def host_components(pages: rd.Dataset, url_col: str = "url",
                    html_col: str = "html",
                    num_partitions: "int | None" = None) -> rd.Dataset:
    """Site clusters: connected components over the UNDIRECTED
    inter-host link graph. Output (host, component) for every host that
    appears as an edge endpoint (self-loop-only hosts are singleton
    clusters); component = the lexicographically smallest host in the
    cluster — a stable, human-readable cluster id.

    Plan: the string graph is mapped to int64 via 63-bit md5 node
    hashes (collision probability ~n^2/2^63 — negligible below ~1e8
    hosts; hashes never leave the pipeline), reusing the int-keyed
    ``connected_components`` label propagation unchanged; the min-host
    remap is one grouped_argmax (constant order key + host tie-break =
    distributed MIN-string) plus one co-partitioned join."""
    import hashlib

    from .graph import connected_components
    from .relational import hash_aggregate, hash_join, grouped_argmax

    edges = host_edges(pages, url_col, html_col,
                       num_partitions=num_partitions)

    def _h63(arr: pa.Array) -> pa.Array:
        uniq = pc.unique(arr)
        m = {u: int.from_bytes(
            hashlib.md5(u.encode()).digest()[:8], "big") >> 1
            for u in uniq.to_pylist()}
        return pa.array([m[v] for v in arr.to_pylist()], pa.int64())

    def int_pairs(t: pa.Table) -> pa.Table:
        schema = pa.schema([("ha", pa.int64()), ("hb", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        t = t.filter(pc.invert(pc.equal(t.column("src_host"),
                                        t.column("dst_host"))))
        return pa.table({
            "ha": _h63(t.column("src_host").combine_chunks()),
            "hb": _h63(t.column("dst_host").combine_chunks())})

    def node_rows(t: pa.Table) -> pa.Table:
        schema = pa.schema([("host", pa.string()), ("hnode", pa.int64()),
                            ("one", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        hosts = pa.concat_arrays(
            [t.column("src_host").combine_chunks(),
             t.column("dst_host").combine_chunks()]).unique()
        return pa.table({"host": hosts, "hnode": _h63(hosts),
                         "one": pa.array([1] * len(hosts), pa.int64())})

    edges = edges.materialize()   # small: one row per distinct host pair
    nodes = hash_aggregate(
        edges.map_batches(node_rows, batch_format="pyarrow"),
        keys=["host", "hnode"], sum_cols={"one": "n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("host", pa.string()),
                              ("hnode", pa.int64()),
                              ("n", pa.int64())])
    ).select_columns(["host", "hnode"]).materialize()

    comps = connected_components(
        edges.map_batches(int_pairs, batch_format="pyarrow"),
        nodes.select_columns(["hnode"]).map_batches(
            lambda t: t.rename_columns(["node"]), batch_format="pyarrow"),
        pair_cols=("ha", "hb"), node_col="node",
        num_partitions=num_partitions)

    members = hash_join(
        nodes.map_batches(lambda t: t.rename_columns(["host", "node"]),
                          batch_format="pyarrow"),
        comps, on="node", num_partitions=num_partitions,
        left_schema=pa.schema([("host", pa.string()),
                               ("node", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()),
                                ("component", pa.int64())])).materialize()

    def with_zero(t: pa.Table) -> pa.Table:
        return t.append_column("_zero",
                               pa.array([0] * t.num_rows, pa.int64()))

    reps = grouped_argmax(
        members.map_batches(with_zero, batch_format="pyarrow"),
        key="component", order_col="_zero", tie_col="host",
        out_cols=["component", "host"],
        num_partitions=num_partitions).map_batches(
            lambda t: pa.table({"component": t.column("component"),
                                "rep_host": t.column("host")}),
            batch_format="pyarrow")

    out = hash_join(
        members.select_columns(["host", "component"]), reps,
        on="component", num_partitions=num_partitions,
        left_schema=pa.schema([("host", pa.string()),
                               ("component", pa.int64())]),
        right_schema=pa.schema([("component", pa.int64()),
                                ("rep_host", pa.string())]))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"host": t.column("host"),
                         "component": t.column("rep_host")})

    return out.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# robots.txt: parse + URL gate
# ---------------------------------------------------------------------------

_UA_RE = r"^User-agent:\s*(\S+)"
_RULE_RE = r"^(Allow|Disallow):\s*(\S+)"


def parse_robots_rules(robots: rd.Dataset, host_col: str = "host",
                       txt_col: str = "robots_txt") -> rd.Dataset:
    """Parse a robots.txt corpus into the ``User-agent: *`` rule set:
    one (host, rule_path, allow) row per Allow/Disallow line in the
    ``*`` group. Simplified REP semantics, documented for the oracle:
    a group is introduced by ONE ``User-agent:`` line and runs until
    the next one; only the ``*`` group's rules apply; rule paths must
    start with '/'; every other directive (Crawl-delay, Sitemap,
    comments, blank lines) is ignored.

    Stateless vectorized map over the ROBOTS table — the corpus-small
    side (one row per host, not per capture): pandas split/explode +
    per-row-ordered cumsum assigns group ids without a per-line Python
    loop; no shuffle."""
    import pandas as pd

    def f(df: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame({"host": pd.Series(dtype="object"),
                              "rule_path": pd.Series(dtype="object"),
                              "allow": pd.Series(dtype="int64")})
        if not len(df):
            return empty
        e = (df[[host_col]].assign(_line=df[txt_col].str.split("\n"))
             .explode("_line"))
        e["_line"] = e["_line"].fillna("")
        e = e.reset_index(drop=False, names="_doc")
        is_ua = e["_line"].str.match(_UA_RE)
        # group id = running count of User-agent lines within the doc
        e["_grp"] = is_ua.astype("int64").groupby(e["_doc"]).cumsum()
        agent = e["_line"].str.extract(_UA_RE, expand=False)
        ua = (e.loc[is_ua, ["_doc", "_grp"]]
              .assign(_agent=agent[is_ua].to_numpy()))
        e = e.merge(ua, on=["_doc", "_grp"], how="left")
        m = e["_line"].str.extract(_RULE_RE)
        sel = ((e["_agent"] == "*") & m[0].notna()
               & m[1].str.startswith("/", na=False))
        if not sel.any():
            return empty
        return pd.DataFrame({
            "host": e.loc[sel, host_col].astype(object).to_numpy(),
            "rule_path": m.loc[sel, 1].astype(object).to_numpy(),
            "allow": (m.loc[sel, 0] == "Allow").astype("int64").to_numpy(),
        })

    return robots.map_batches(f, batch_format="pandas")


def robots_gate(pages: rd.Dataset, robots: rd.Dataset,
                url_col: str = "url",
                num_partitions: "int | None" = None) -> rd.Dataset:
    """Evaluate every distinct canonical URL against its host's
    robots.txt: longest-matching-prefix rule wins, Allow beats Disallow
    on equal length (Google REP tie rule), no matching rule or no
    robots file -> allowed. Output one row per canonical URL:
    (canon_url, host, allowed:int64, rule_path — matched rule or '').

    Plan (all existing primitives; robots is O(hosts) but still rides
    distributed joins, never a broadcast): distinct canon via one
    hash_aggregate -> host-hash ``hash_join`` against the parsed rules
    -> vectorized prefix filter (grouped by the few distinct rule
    lengths, so the slice compare is one vector op per length) ->
    ``grouped_argmax`` on score = 2*len(rule)+allow -> LEFT join back
    to the distinct URL set with default-allow fill."""
    import numpy as np
    import pandas as pd

    from .relational import grouped_argmax, hash_aggregate, hash_join

    def prep(t: pa.Table) -> pa.Table:
        comp = _parse_batch(t, url_col)
        return pa.table({"canon_url": _canon_array(t, url_col),
                         "host": comp["host"], "path": comp["path"],
                         "one": pa.array([1] * t.num_rows, pa.int64())})

    distinct = hash_aggregate(
        pages.map_batches(prep, batch_format="pyarrow"),
        keys=["canon_url", "host", "path"], sum_cols={"one": "n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("canon_url", pa.string()),
                              ("host", pa.string()), ("path", pa.string()),
                              ("n", pa.int64())])
    ).select_columns(["canon_url", "host", "path"]).materialize()

    rules = parse_robots_rules(robots)
    cand = hash_join(
        distinct, rules, on="host", num_partitions=num_partitions,
        left_schema=pa.schema([("canon_url", pa.string()),
                               ("host", pa.string()),
                               ("path", pa.string())]),
        right_schema=pa.schema([("host", pa.string()),
                                ("rule_path", pa.string()),
                                ("allow", pa.int64())]))

    def match_score(df: "pd.DataFrame") -> "pd.DataFrame":
        cols = ["canon_url", "rule_path", "allow", "score"]
        if not len(df):
            return pd.DataFrame({"canon_url": pd.Series(dtype="object"),
                                 "rule_path": pd.Series(dtype="object"),
                                 "allow": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="int64")})
        rl = df["rule_path"].str.len().to_numpy()
        keep = np.zeros(len(df), dtype=bool)
        for L in np.unique(rl):
            m = rl == L
            keep[m] = (df["path"][m].str.slice(0, int(L))
                       == df["rule_path"][m]).to_numpy()
        out = df.loc[keep, ["canon_url", "rule_path", "allow"]].copy()
        out["allow"] = out["allow"].astype("int64")
        out["score"] = (2 * out["rule_path"].str.len()
                        + out["allow"]).astype("int64")
        return out[cols].reset_index(drop=True)

    win = grouped_argmax(
        cand.map_batches(match_score, batch_format="pandas"),
        key="canon_url", order_col="score", tie_col="rule_path",
        out_cols=["canon_url", "rule_path", "allow"],
        num_partitions=num_partitions)

    final = hash_join(
        distinct.select_columns(["canon_url", "host"]), win,
        on="canon_url", how="left", num_partitions=num_partitions,
        left_schema=pa.schema([("canon_url", pa.string()),
                               ("host", pa.string())]),
        right_schema=pa.schema([("canon_url", pa.string()),
                                ("rule_path", pa.string()),
                                ("allow", pa.int64())]))

    def classify(t: pa.Table) -> pa.Table:
        schema = pa.schema([("canon_url", pa.string()),
                            ("host", pa.string()),
                            ("allowed", pa.int64()),
                            ("rule_path", pa.string())])
        if t.num_rows == 0:
            return schema.empty_table()
        return pa.table({
            "canon_url": t.column("canon_url"),
            "host": t.column("host"),
            "allowed": pc.fill_null(pc.cast(t.column("allow"), pa.int64()),
                                    1),
            "rule_path": pc.fill_null(pc.cast(t.column("rule_path"),
                                              pa.string()), ""),
        })

    return final.map_batches(classify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# visible-text extraction (boilerplate strip before the KG extractor)
# ---------------------------------------------------------------------------

# strip chain shared (as documented semantics) with the DuckDB oracle:
# RE2-compatible patterns, same order; &amp; decodes LAST so the
# &amp;lt; double-escape stays a literal '&lt;' in the visible text
_STRIP_BLOCK_RES = (r"(?is)<script\b[^>]*>.*?</script>",
                    r"(?is)<style\b[^>]*>.*?</style>",
                    r"(?s)<!--.*?-->")
_TAG_RE = r"(?s)<[^>]*>"
_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"))


def visible_text(pages: rd.Dataset, url_col: str = "url",
                 html_col: str = "html") -> rd.Dataset:
    """Extract the visible text of each page: drop <script>/<style>
    bodies and HTML comments, strip all remaining tags (replaced by a
    space so adjacent words don't fuse), decode the common entity set
    (&amp; last), collapse whitespace runs to single spaces and trim.
    Output (url, text, text_chars, html_chars) with codepoint lengths.

    Stateless zero-copy Arrow map — every step is one
    ``pc.replace_substring_regex`` / ``pc.replace_substring`` kernel
    over the whole batch; no shuffle, no per-row Python."""
    def f(t: pa.Table) -> pa.Table:
        html = pc.cast(t.column(html_col), pa.string())
        txt = html
        for pat in _STRIP_BLOCK_RES:
            txt = pc.replace_substring_regex(txt, pat, " ")
        txt = pc.replace_substring_regex(txt, _TAG_RE, " ")
        for ent, rep in _ENTITIES:
            txt = pc.replace_substring(txt, ent, rep)
        txt = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(txt, r"\s+", " "))
        return pa.table({
            "url": pc.cast(t.column(url_col), pa.string()),
            "text": txt,
            "text_chars": pc.cast(pc.utf8_length(txt), pa.int64()),
            "html_chars": pc.cast(pc.utf8_length(html), pa.int64()),
        })

    return pages.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# anchor text: extraction -> per-target rollup; URL in-degree
# ---------------------------------------------------------------------------
#
# Anchor text is the classic web-graph surface-form signal for entity
# linking: the texts other pages use to link to a URL describe what the
# URL is about (the reference's candidate lookup matches cell text
# against entity labels — anchor text is the web-scale analog of that
# label table). The rollup contract mirrors the link-graph one: only
# the canonical serialization ``<a href="H">text</a>`` is parsed (text
# may not contain '<'), resolution/canonicalization reuse the exact
# resolve_hrefs semantics, and the aggregate ships batch-level
# partials.

_ANCHOR_TEXT_RE = '^(?P<h>[^"]*)">(?P<t>[^<]*)</a>'


def extract_anchor_texts(pages: rd.Dataset, url_col: str = "url",
                         html_col: str = "html") -> rd.Dataset:
    """One (url, href, anchor_text) row per canonical-serialization
    anchor; segments without the full ``">text</a>`` close are dropped
    (non-canonical anchors carry no text). Same vectorized explode as
    ``extract_anchors``."""
    def f(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([(url_col, pa.string()),
                                ("href", pa.string()),
                                ("anchor_text", pa.string())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        html = pc.cast(t.column(html_col), pa.string()).combine_chunks()
        sp = pc.split_pattern(html, _ANCHOR_PREFIX)
        flat, parents, pos = _explode_positions(sp)
        mask = pa.array(pos > 0)
        seg = pc.filter(flat, mask)
        par = pc.filter(parents, mask)
        m = pc.extract_regex(seg, _ANCHOR_TEXT_RE)
        ok = pc.is_valid(m)
        urls = pc.take(pc.cast(t.column(url_col), pa.string()),
                       pc.filter(par, ok))
        m = pc.filter(m, ok)
        return pa.table({url_col: urls,
                         "href": pc.struct_field(m, "h"),
                         "anchor_text": pc.struct_field(m, "t")})

    return pages.map_batches(f, batch_format="pyarrow")


def anchor_text_rollup(pages: rd.Dataset, url_col: str = "url",
                       html_col: str = "html",
                       num_partitions: "int | None" = None) -> rd.Dataset:
    """Per (dst_canon, anchor_text): how many resolvable links carry
    that surface form to that target. Plan: extract_anchor_texts
    (stateless) -> resolve_hrefs with the text column carried through
    (stateless) -> ONE pair-hash ``hash_aggregate`` exchange shipping
    per-batch partial counts."""
    at = extract_anchor_texts(pages, url_col, html_col)
    resolved = resolve_hrefs(at, url_col=url_col,
                             carry_cols=["anchor_text"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"dst_canon": t.column("dst_canon"),
                         "anchor_text": t.column("anchor_text"),
                         "one": pa.array([1] * t.num_rows, pa.int64())})

    return hash_aggregate(
        resolved.map_batches(prep, batch_format="pyarrow"),
        keys=["dst_canon", "anchor_text"], sum_cols={"one": "n_links"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("dst_canon", pa.string()),
                              ("anchor_text", pa.string()),
                              ("n_links", pa.int64())]))


def url_indegree(pages: rd.Dataset, url_col: str = "url",
                 html_col: str = "html",
                 num_partitions: "int | None" = None) -> rd.Dataset:
    """Per target canonical URL: total resolvable in-links, distinct
    linking pages (src canon) and distinct linking hosts. Composition
    of the host_stats primitives — count partials via hash_aggregate,
    exact distincts via the pair-hash distinct_count, stitched with
    co-partitioned hash_joins; no stage ships raw rows across more
    than one exchange."""
    links = resolve_links(pages, url_col, html_col)

    def prep(t: pa.Table) -> pa.Table:
        hosts = _parse_batch(t, "src_canon")["host"]
        return pa.table({"dst_canon": t.column("dst_canon"),
                         "src_canon": t.column("src_canon"),
                         "src_host": hosts,
                         "one": pa.array([1] * t.num_rows, pa.int64())})

    base = links.map_batches(prep, batch_format="pyarrow")
    total = hash_aggregate(
        base, keys=["dst_canon"], sum_cols={"one": "n_inlinks"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("dst_canon", pa.string()),
                              ("n_inlinks", pa.int64())]))
    nsrc = distinct_count(base, "dst_canon", "src_canon",
                          alias="n_src_urls",
                          num_partitions=num_partitions)
    nhost = distinct_count(base, "dst_canon", "src_host",
                           alias="n_src_hosts",
                           num_partitions=num_partitions)
    j = hash_join(total, nsrc, on=["dst_canon"],
                  num_partitions=num_partitions)
    return hash_join(j, nhost, on=["dst_canon"],
                     num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# anchor-text entity linking: the web-scale candidate-generation analog
# ---------------------------------------------------------------------------
#
# The reference generates entity candidates by matching normalized cell
# text against KB entity labels (`commands/SpreadsheetController.php:
# 86-103`, M1 normalization `components/CanonicalTableAnnotator.php:
# 121-137`). On a crawl, the same signal comes from the link graph:
# the anchor texts other pages use for a URL are its surface forms, and
# matching them (normalized the same way) against a label table yields
# link-weighted entity candidates per URL. Two label-side plans with
# hash-identical results (the tfidf/pagerank auto-switch pattern):
# "join" — both sides normalize vectorized (Arrow RE2 kernels) and
# meet in ONE co-partitioned hash_join on the norm key, the label
# table never leaves the cluster (at web scale it is millions of
# rows); "broadcast" — when the label table is driver-bounded the
# distinct (norm -> entities) map ships once via ray.put and the match
# is a stateless per-batch explode, leaving ONE exchange (the vote
# sum) in the whole pipeline.


def anchor_entity_candidates(pages: rd.Dataset, labels: rd.Dataset,
                             url_col: str = "url", html_col: str = "html",
                             entity_col: str = "entity",
                             label_col: str = "label",
                             num_partitions: "int | None" = None,
                             mode: str = "auto",
                             broadcast_max_labels: int = 2_000_000
                             ) -> rd.Dataset:
    """Link-weighted entity candidates per canonical target URL:
    (dst_canon, entity, votes) where votes = number of resolvable
    in-links whose anchor text normalizes to one of the entity's label
    norms. Surface forms normalizing to '' (pure punctuation) are
    dropped on both sides; duplicate (norm, entity) label rows
    collapse so one entity never double-votes for one surface form.

    Anchor side (both modes): extract+resolve (stateless) -> per-BATCH
    (dst_canon, norm) partial counts — a vectorized combiner with NO
    exchange of its own; the final vote sum is over partials, so a
    full pre-aggregation shuffle would be pure overhead. Label side:
    ``mode="join"`` (the 100-TB path) runs (norm, entity) distinct
    (1 exchange) -> norm-hash join (1 exchange) -> vote sum
    (1 exchange); ``mode="broadcast"`` (taken by ``auto`` when
    ``labels.count() <= broadcast_max_labels`` — metadata-cheap for
    parquet reads) collects the distinct pairs once, ships the
    norm->entities map via ray.put, and matches statelessly, leaving
    the vote sum as the pipeline's ONLY exchange."""
    from ..normalize import normalize_batch

    resolved = resolve_hrefs(
        extract_anchor_texts(pages, url_col, html_col),
        url_col=url_col, carry_cols=["anchor_text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        out = pa.table({"dst_canon": t.column("dst_canon"),
                        "norm": normalize_batch(t.column("anchor_text")),
                        "n_links": pa.array([1] * t.num_rows,
                                            pa.int64())})
        out = out.filter(pc.not_equal(out.column("norm"), ""))
        df = (out.to_pandas()
              .groupby(["dst_canon", "norm"], as_index=False)
              ["n_links"].sum())
        return pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema([("dst_canon", pa.string()),
                       ("norm", pa.string()),
                       ("n_links", pa.int64())]))

    left = resolved.map_batches(partial_counts, batch_format="pyarrow")

    def norm_label(t: pa.Table) -> pa.Table:
        out = pa.table({"norm": normalize_batch(t.column(label_col)),
                        "entity": pc.cast(t.column(entity_col),
                                          pa.string()),
                        "one": pa.array([1] * t.num_rows, pa.int64())})
        return out.filter(pc.not_equal(out.column("norm"), ""))

    votes_schema = pa.schema([("dst_canon", pa.string()),
                              ("entity", pa.string()),
                              ("votes", pa.int64())])

    if mode == "broadcast" or (mode == "auto"
                               and labels.count() <= broadcast_max_labels):
        import ray as _ray

        lab_pd = (labels.map_batches(norm_label, batch_format="pyarrow")
                  .to_pandas().drop_duplicates(["norm", "entity"]))
        lab_map = {k: g["entity"].to_numpy()
                   for k, g in lab_pd.groupby("norm")}
        ref = _ray.put(lab_map)

        def match(t: pa.Table) -> pa.Table:
            out_schema = pa.schema([("dst_canon", pa.string()),
                                    ("entity", pa.string()),
                                    ("n_links", pa.int64())])
            if t.num_rows == 0:
                return out_schema.empty_table()
            m = _ray.get(ref)
            df = t.to_pandas()
            ents = df["norm"].map(m)
            keep = ents.notna()
            df = df[keep].assign(entity=ents[keep]).explode("entity")
            if not len(df):
                return out_schema.empty_table()
            return pa.Table.from_pandas(
                df[["dst_canon", "entity", "n_links"]],
                preserve_index=False).cast(out_schema)

        matched = left.map_batches(match, batch_format="pyarrow")
        return hash_aggregate(
            matched, keys=["dst_canon", "entity"],
            sum_cols={"n_links": "votes"},
            num_partitions=num_partitions, out_schema=votes_schema)

    pairs = hash_aggregate(
        labels.map_batches(norm_label, batch_format="pyarrow"),
        keys=["norm", "entity"], sum_cols={"one": "_c"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("norm", pa.string()),
                              ("entity", pa.string()),
                              ("_c", pa.int64())])).drop_columns(["_c"])

    j = hash_join(left, pairs, on=["norm"],
                  num_partitions=num_partitions)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"dst_canon": t.column("dst_canon"),
                         "entity": t.column("entity"),
                         "n_links": t.column("n_links")})

    return hash_aggregate(
        j.map_batches(prep, batch_format="pyarrow"),
        keys=["dst_canon", "entity"], sum_cols={"n_links": "votes"},
        num_partitions=num_partitions, out_schema=votes_schema)


def anchor_entity_top1(pages: rd.Dataset, labels: rd.Dataset,
                       url_col: str = "url", html_col: str = "html",
                       entity_col: str = "entity",
                       label_col: str = "label",
                       num_partitions: "int | None" = None,
                       mode: str = "auto") -> rd.Dataset:
    """Winning entity per target URL — the C8 argmax rule transplanted
    to the link graph: top-1 candidate by (votes desc, entity asc),
    deterministic under any partitioning (grouped_argmax combiner)."""
    cand = anchor_entity_candidates(pages, labels, url_col, html_col,
                                    entity_col, label_col, num_partitions,
                                    mode=mode)
    return grouped_argmax(cand, key="dst_canon", order_col="votes",
                          tie_col="entity",
                          out_cols=["dst_canon", "entity", "votes"],
                          num_partitions=num_partitions)


def host_hits(pages: rd.Dataset, url_col: str = "url",
              html_col: str = "html", n_iter: int = 3,
              num_partitions: "int | None" = None,
              mode: str = "auto", weighted: bool = False) -> rd.Dataset:
    """HITS hubs & authorities over the DISTINCT inter-host edge set
    (self-loops excluded, as in host_pagerank): authorities are the
    hosts good pages point AT, hubs the hosts that point at good
    authorities — the complementary centrality to PageRank for crawl
    seed selection. Reuses ``ops.graph.hits`` (same broadcast/join
    auto-switch; constant exchanges per half-round at scale).
    ``weighted=True`` pushes scores by LINK MULTIPLICITY
    (score·n_links per edge)."""
    from .graph import hits

    edges = host_edges(pages, url_col, html_col,
                       num_partitions=num_partitions)

    def inter(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t.column("src_host"),
                                        t.column("dst_host"))))
        out = {"src": t.column("src_host"),
               "dst": t.column("dst_host")}
        if weighted:
            out["n_links"] = t.column("n_links")
        return pa.table(out)

    return hits(edges.map_batches(inter, batch_format="pyarrow"),
                n_iter=n_iter, num_partitions=num_partitions,
                mode=mode, node_dtype=pa.string(),
                weight_col="n_links" if weighted else None)


def entity_cooccurrence(pages: rd.Dataset, labels: rd.Dataset,
                        url_col: str = "url", html_col: str = "html",
                        entity_col: str = "entity",
                        label_col: str = "label",
                        min_count: int = 1,
                        num_partitions: "int | None" = None
                        ) -> rd.Dataset:
    """Entity co-occurrence graph with PMI — the relatedness signal a
    KG-construction pipeline derives from the corpus itself (the
    reference's entity-context relatedness, A4/C3, re-expressed over
    crawl pages): a page MENTIONS entity e when any anchor text on it
    normalizes (M1) to one of e's label norms; for entity pairs
    co-mentioned on >= min_count pages,

        pmi(x, y) = ln(N * n_pair / (n_x * n_y))

    with N = distinct pages in the input, n_x = pages mentioning x,
    counted ONCE per page regardless of anchor multiplicity. Output:
    (e1, e2, n_pair, n_e1, n_e2, pmi) with e1 < e2 (string order).

    Plan: extract+norm (stateless) -> labels norm-hash join ->
    (url, entity) distinct -> url-hash SELF-join generates in-page
    pairs (bounded by per-page anchor count squared) -> pair-hash
    count aggregate -> two co-partitioned joins stitch the marginals.
    N and nothing else crosses to the driver (one scalar count)."""
    import numpy as np

    from ..normalize import normalize_batch

    at = extract_anchor_texts(pages, url_col, html_col)

    def norm_anchor(t: pa.Table) -> pa.Table:
        out = pa.table({"url": pc.cast(t.column(url_col), pa.string()),
                        "norm": normalize_batch(t.column("anchor_text")),
                        "one": pa.array([1] * t.num_rows, pa.int64())})
        return out.filter(pc.not_equal(out.column("norm"), ""))

    def norm_label(t: pa.Table) -> pa.Table:
        out = pa.table({"norm": normalize_batch(t.column(label_col)),
                        "entity": pc.cast(t.column(entity_col),
                                          pa.string()),
                        "one": pa.array([1] * t.num_rows, pa.int64())})
        return out.filter(pc.not_equal(out.column("norm"), ""))

    pairs_lab = hash_aggregate(
        labels.map_batches(norm_label, batch_format="pyarrow"),
        keys=["norm", "entity"], sum_cols={"one": "_c"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("norm", pa.string()),
                              ("entity", pa.string()),
                              ("_c", pa.int64())])).drop_columns(["_c"])

    anchors_n = hash_aggregate(
        at.map_batches(norm_anchor, batch_format="pyarrow"),
        keys=["url", "norm"], sum_cols={"one": "_c"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("url", pa.string()),
                              ("norm", pa.string()),
                              ("_c", pa.int64())])).drop_columns(["_c"])

    j = hash_join(anchors_n, pairs_lab, on=["norm"],
                  num_partitions=num_partitions)
    mentions = hash_aggregate(
        j.map_batches(
            lambda t: pa.table({"url": t.column("url"),
                                "entity": t.column("entity"),
                                "one": pa.array([1] * t.num_rows,
                                                pa.int64())}),
            batch_format="pyarrow"),
        keys=["url", "entity"], sum_cols={"one": "_c"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("url", pa.string()),
                              ("entity", pa.string()),
                              ("_c", pa.int64())])
    ).drop_columns(["_c"]).materialize()

    n_pages = hash_aggregate(
        pages.map_batches(
            lambda t: pa.table({"url": pc.cast(t.column(url_col),
                                               pa.string()),
                                "one": pa.array([1] * t.num_rows,
                                                pa.int64())}),
            batch_format="pyarrow"),
        keys=["url"], sum_cols={"one": "_c"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("url", pa.string()),
                              ("_c", pa.int64())])).count()

    from .relational import partial_agg_sum
    marg = partial_agg_sum(
        mentions.map_batches(
            lambda t: pa.table({"entity": t.column("entity"),
                                "one": pa.array([1] * t.num_rows,
                                                pa.int64())}),
            batch_format="pyarrow"),
        "entity", {"one": "n_e"}).materialize()

    def rn(old, new):
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [new if c == old else c for c in t.column_names])
        return f

    sj = hash_join(
        mentions.map_batches(rn("entity", "e1"), batch_format="pyarrow"),
        mentions.map_batches(rn("entity", "e2"), batch_format="pyarrow"),
        on=["url"],
        left_schema=pa.schema([("url", pa.string()),
                               ("e1", pa.string())]),
        right_schema=pa.schema([("url", pa.string()),
                                ("e2", pa.string())]),
        num_partitions=num_partitions)

    def keep_ordered(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("e1"), t.column("e2")))
        return pa.table({"e1": t.column("e1"), "e2": t.column("e2"),
                         "one": pa.array([1] * t.num_rows, pa.int64())})

    pair_counts = hash_aggregate(
        sj.map_batches(keep_ordered, batch_format="pyarrow"),
        keys=["e1", "e2"], sum_cols={"one": "n_pair"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("e1", pa.string()), ("e2", pa.string()),
                              ("n_pair", pa.int64())]))
    if min_count > 1:
        pair_counts = pair_counts.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("n_pair"),
                                                min_count)),
            batch_format="pyarrow")

    j1 = hash_join(
        pair_counts, marg.map_batches(rn("entity", "e1"),
                                      batch_format="pyarrow")
        .map_batches(rn("n_e", "n_e1"), batch_format="pyarrow"),
        on=["e1"],
        left_schema=pa.schema([("e1", pa.string()), ("e2", pa.string()),
                               ("n_pair", pa.int64())]),
        right_schema=pa.schema([("e1", pa.string()),
                                ("n_e1", pa.int64())]),
        num_partitions=num_partitions)
    j2 = hash_join(
        j1, marg.map_batches(rn("entity", "e2"), batch_format="pyarrow")
        .map_batches(rn("n_e", "n_e2"), batch_format="pyarrow"),
        on=["e2"],
        left_schema=pa.schema([("e1", pa.string()), ("e2", pa.string()),
                               ("n_pair", pa.int64()),
                               ("n_e1", pa.int64())]),
        right_schema=pa.schema([("e2", pa.string()),
                                ("n_e2", pa.int64())]),
        num_partitions=num_partitions)

    def with_pmi(t: pa.Table) -> pa.Table:
        np_ = _np_col(t, "n_pair")
        ne1 = _np_col(t, "n_e1")
        ne2 = _np_col(t, "n_e2")
        pmi = np.log(n_pages * np_ / (ne1 * ne2))
        return pa.table({"e1": t.column("e1"), "e2": t.column("e2"),
                         "n_pair": t.column("n_pair"),
                         "n_e1": t.column("n_e1"),
                         "n_e2": t.column("n_e2"),
                         "pmi": pa.array(pmi, pa.float64())})

    return j2.map_batches(with_pmi, batch_format="pyarrow")


def _np_col(t: pa.Table, name: str):
    import numpy as np
    return (t.column(name).combine_chunks()
            .to_numpy(zero_copy_only=False).astype(np.float64))


def url_quality_features(pages: rd.Dataset, url_col: str = "url"
                         ) -> rd.Dataset:
    """Per-capture URL spam/quality features (the URL-level filter
    signals C4/RefinedWeb-style curation applies before fetching
    content): codepoint ``url_len``, ``host_dots`` (subdomain depth
    proxy), ``host_digits``, ``path_depth`` ('/' count in the path),
    ``path_len``, ``n_query_params`` (0 for an absent/empty query,
    else '&'-separated count), ``nondefault_port`` (0/1), plus a
    composite ``suspicious`` flag under documented integer thresholds:
    host_digits > 3 OR path_depth > 6 OR url_len > 120 OR
    n_query_params > 4. Stateless zero-copy Arrow kernels; the oracle
    re-derives every counter from the same RE2 component grammar."""
    def f(t: pa.Table) -> pa.Table:
        comp = _parse_batch(t, url_col)
        u = pc.cast(t.column(url_col), pa.string())
        url_len = pc.cast(pc.utf8_length(u), pa.int64())
        host_dots = pc.cast(pc.count_substring(comp["host"], "."),
                            pa.int64())
        host_digits = pc.cast(
            pc.count_substring_regex(comp["host"], "[0-9]"), pa.int64())
        path_depth = pc.cast(pc.count_substring(comp["path"], "/"),
                             pa.int64())
        path_len = pc.cast(pc.utf8_length(comp["path"]), pa.int64())
        has_q = pc.invert(pc.equal(comp["query"], ""))
        n_params = pc.cast(
            pc.if_else(has_q,
                       pc.add(pc.count_substring(comp["query"], "&"), 1),
                       pa.scalar(0, pa.int32())), pa.int64())
        default_port = pc.if_else(pc.equal(comp["scheme"], "https"),
                                  pa.scalar(443, pa.int64()),
                                  pa.scalar(80, pa.int64()))
        nondefault = pc.cast(
            pc.invert(pc.equal(comp["port"], default_port)), pa.int64())
        suspicious = pc.cast(
            pc.or_(pc.or_(pc.greater(host_digits, 3),
                          pc.greater(path_depth, 6)),
                   pc.or_(pc.greater(url_len, 120),
                          pc.greater(n_params, 4))), pa.int64())
        return pa.table({url_col: u, "url_len": url_len,
                         "host_dots": host_dots,
                         "host_digits": host_digits,
                         "path_depth": path_depth, "path_len": path_len,
                         "n_query_params": n_params,
                         "nondefault_port": nondefault,
                         "suspicious": suspicious})

    return pages.map_batches(f, batch_format="pyarrow")


def domain_blocklist_gate(pages: rd.Dataset, blocklist: rd.Dataset,
                          url_col: str = "url",
                          domain_col: str = "domain",
                          keep: str = "allowed",
                          num_partitions: "int | None" = None
                          ) -> rd.Dataset:
    """UT1-style domain blocklist gate: drop (or keep) captures whose
    REGISTERED domain (last two host labels — the url_components
    contract) appears in the blocklist table. ``keep='allowed'`` is
    the curation filter (anti join); ``keep='blocked'`` the audit view
    (semi join). Fully distributed: ONE co-partitioned hash semi/anti
    join on the registered domain — the blocklist is a Dataset, never
    a driver-side set, so a 10M-domain list costs the same plan.
    Output: (url, registered_domain)."""
    if keep not in ("allowed", "blocked"):
        raise ValueError(f"keep must be 'allowed'|'blocked', got {keep!r}")

    def prep(t: pa.Table) -> pa.Table:
        comp = _parse_batch(t, url_col)
        return pa.table({url_col: pc.cast(t.column(url_col),
                                          pa.string()),
                         "registered_domain": comp["registered_domain"]})

    left = pages.map_batches(prep, batch_format="pyarrow")

    def prep_bl(t: pa.Table) -> pa.Table:
        return pa.table({"registered_domain":
                         pc.utf8_lower(pc.cast(t.column(domain_col),
                                               pa.string()))})

    right = blocklist.map_batches(prep_bl, batch_format="pyarrow")
    how = "anti" if keep == "allowed" else "semi"
    return hash_join(left, right, on=["registered_domain"], how=how,
                     left_schema=pa.schema([(url_col, pa.string()),
                                            ("registered_domain",
                                             pa.string())]),
                     right_schema=pa.schema([("registered_domain",
                                              pa.string())]),
                     num_partitions=num_partitions)


def crawl_frontier(pages: rd.Dataset, url_col: str = "url",
                   html_col: str = "html",
                   num_partitions: "int | None" = None) -> rd.Dataset:
    """Discovery frontier: every canonical URL the crawl LINKS TO but
    has never CAPTURED, with its total resolvable in-link count as the
    (exact integer) priority signal. Plan: resolve_links (stateless)
    -> dst-hash partial-count aggregate -> distinct crawled canon set
    (hash_aggregate over the canonicalized capture URLs) -> ONE
    co-partitioned hash ANTI join. Output: (dst_canon, n_inlinks)."""
    links = resolve_links(pages, url_col, html_col)

    def ones(t: pa.Table) -> pa.Table:
        return pa.table({"dst_canon": t.column("dst_canon"),
                         "one": pa.array([1] * t.num_rows, pa.int64())})

    total = hash_aggregate(
        links.map_batches(ones, batch_format="pyarrow"),
        keys=["dst_canon"], sum_cols={"one": "n_inlinks"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("dst_canon", pa.string()),
                              ("n_inlinks", pa.int64())]))

    def canon(t: pa.Table) -> pa.Table:
        return pa.table({"dst_canon": _canon_array(t, url_col),
                         "one": pa.array([1] * t.num_rows, pa.int64())})

    crawled = hash_aggregate(
        pages.map_batches(canon, batch_format="pyarrow"),
        keys=["dst_canon"], sum_cols={"one": "_c"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("dst_canon", pa.string()),
                              ("_c", pa.int64())])).drop_columns(["_c"])

    return hash_join(total, crawled, on=["dst_canon"], how="anti",
                     left_schema=pa.schema([("dst_canon", pa.string()),
                                            ("n_inlinks", pa.int64())]),
                     right_schema=pa.schema([("dst_canon", pa.string())]),
                     num_partitions=num_partitions)


def fetch_schedule(pages: rd.Dataset, url_col: str = "url",
                   html_col: str = "html",
                   num_partitions: "int | None" = None) -> rd.Dataset:
    """Politeness-aware fetch ordering over the discovery frontier:
    within each target HOST (the politeness unit — one queue per host,
    one fetch per slot), frontier URLs take 1-based ``slot`` positions
    by (n_inlinks desc, dst_canon asc). A crawler draining slot k of
    every host in round k never fetches a host twice per round while
    always fetching the best-linked URLs first. ONE host-hash exchange
    after the frontier's own plan; ranking is vectorized pandas per
    partition (the sessionize shape). Output: (dst_canon, host,
    n_inlinks, slot)."""
    import pandas as pd

    from .relational import typed_groupby_map

    from .relational import _resolve_partitions

    frontier = crawl_frontier(pages, url_col, html_col, num_partitions)
    nparts = _resolve_partitions(num_partitions)

    def add_host(t: pa.Table) -> pa.Table:
        host = _parse_batch(t, "dst_canon")["host"]
        return pa.table({"dst_canon": t.column("dst_canon"),
                         "host": host,
                         "n_inlinks": t.column("n_inlinks")})

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["host"], index=False)
        return df.assign(_part=(h % nparts).astype("int64"))

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["host", "n_inlinks", "dst_canon"],
                          ascending=[True, False, True], kind="stable")
        slot = g.groupby("host").cumcount() + 1
        return g.assign(slot=slot.astype("int64"))[
            ["dst_canon", "host", "n_inlinks", "slot"]]

    withhost = frontier.map_batches(add_host, batch_format="pyarrow")
    return typed_groupby_map(
        withhost.map_batches(add_part, batch_format="pandas"),
        "_part", rank,
        pa.schema([("dst_canon", pa.string()), ("host", pa.string()),
                   ("n_inlinks", pa.int64()), ("slot", pa.int64())]))


def reciprocal_host_edges(pages: rd.Dataset, url_col: str = "url",
                          html_col: str = "html",
                          num_partitions: "int | None" = None
                          ) -> rd.Dataset:
    """Link-farm signal: unordered host pairs linking BOTH ways.
    Output (host_a, host_b, ab_links, ba_links) with host_a < host_b,
    where ab_links counts resolvable a->b links (and ba_links b->a),
    both > 0 by construction. Plan: host_edges (1 exchange) -> orient
    each directed pair to its sorted form (stateless) -> ONE pair-hash
    exchange summing the two directions into separate columns -> keep
    pairs with both directions present. Self-loops excluded."""
    edges = host_edges(pages, url_col, html_col,
                       num_partitions=num_partitions)

    def orient(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t.column("src_host"),
                                        t.column("dst_host"))))
        s, d, n = (t.column("src_host"), t.column("dst_host"),
                   t.column("n_links"))
        fwd = pc.less(s, d)
        zero = pa.array([0] * t.num_rows, pa.int64())
        return pa.table({
            "host_a": pc.if_else(fwd, s, d),
            "host_b": pc.if_else(fwd, d, s),
            "ab_links": pc.if_else(fwd, n, zero),
            "ba_links": pc.if_else(fwd, zero, n)})

    summed = hash_aggregate(
        edges.map_batches(orient, batch_format="pyarrow"),
        keys=["host_a", "host_b"],
        sum_cols={"ab_links": "ab_links", "ba_links": "ba_links"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("host_a", pa.string()),
                              ("host_b", pa.string()),
                              ("ab_links", pa.int64()),
                              ("ba_links", pa.int64())]))
    return summed.map_batches(
        lambda t: t.filter(pc.and_(pc.greater(t.column("ab_links"), 0),
                                   pc.greater(t.column("ba_links"), 0))),
        batch_format="pyarrow")


_BLOCK_SPLIT_RE = r"(?i)<(?:p|div|li|h[1-6]|td|tr|br)\b[^>]*>"


def page_blocks(pages: rd.Dataset, url_col: str = "url",
                html_col: str = "html",
                with_pos: bool = False) -> rd.Dataset:
    """Block-level visible-text segmentation: strip script/style
    bodies and comments from the WHOLE page first (so a block tag
    inside a script string cannot sever the script body), split at
    every remaining block-OPEN tag (p/div/li/h1-6/td/tr/br — the
    boilerplate units), then finish each segment with the visible_text
    chain (tag strip, entities with &amp; last, whitespace collapse)
    and drop empty results. One (url, block) row per non-empty
    segment, including the pre-first-tag preamble. Stateless zero-copy
    Arrow explode — the extract_anchors shape. ``with_pos=True`` adds
    the 0-based RAW segment index ``seg_no`` (position among all
    segments, empties included — stable under the empty-drop) for
    order-preserving reassembly downstream."""
    def f(t: pa.Table) -> pa.Table:
        cols = [(url_col, pa.string()), ("block", pa.string())]
        if with_pos:
            cols.append(("seg_no", pa.int64()))
        out_schema = pa.schema(cols)
        if t.num_rows == 0:
            return out_schema.empty_table()
        html = pc.cast(t.column(html_col), pa.string()).combine_chunks()
        for pat in _STRIP_BLOCK_RES:
            html = pc.replace_substring_regex(html, pat, " ")
        sp = pc.split_pattern_regex(html, _BLOCK_SPLIT_RE)
        flat, parents, pos = _explode_positions(sp)
        txt = pc.replace_substring_regex(flat, _TAG_RE, " ")
        for ent, rep in _ENTITIES:
            txt = pc.replace_substring(txt, ent, rep)
        txt = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(txt, r"\s+", " "))
        keep = pc.invert(pc.equal(txt, ""))
        urls = pc.take(pc.cast(t.column(url_col), pa.string()),
                       pc.filter(parents, keep))
        out = {url_col: urls, "block": pc.filter(txt, keep)}
        if with_pos:
            out["seg_no"] = pc.filter(pa.array(pos, pa.int64()), keep)
        return pa.table(out)

    return pages.map_batches(f, batch_format="pyarrow")


def host_template_blocks(pages: rd.Dataset, url_col: str = "url",
                         html_col: str = "html", min_pct: int = 50,
                         min_pages: int = 2,
                         num_partitions: "int | None" = None
                         ) -> rd.Dataset:
    """Per-host template/boilerplate mining (the site-level CCNet
    analog): blocks whose text appears on >= min_pct % of the host's
    captured pages (and on >= min_pages pages absolutely — a 1-page
    host is all 'template' otherwise). Exact integer threshold:
    100 * n_pages_with >= min_pct * n_pages_host. Presence is counted
    once per page (distinct), hosts parse from the raw URL. Plan:
    page_blocks (stateless) -> (host,url,block) distinct exchange ->
    (host,block) count exchange -> host-hash join vs the per-host
    distinct page count -> stateless filter. Output: (host, block,
    n_pages_with, n_pages_host)."""
    blocks = page_blocks(pages, url_col, html_col)

    def add_host(t: pa.Table) -> pa.Table:
        host = _parse_batch(t, url_col)["host"]
        return pa.table({"host": host,
                         "url": pc.cast(t.column(url_col), pa.string()),
                         "block": t.column("block"),
                         "one": pa.array([1] * t.num_rows, pa.int64())})

    distinct = hash_aggregate(
        blocks.map_batches(add_host, batch_format="pyarrow"),
        keys=["host", "url", "block"], sum_cols={"one": "_c"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("host", pa.string()),
                              ("url", pa.string()),
                              ("block", pa.string()),
                              ("_c", pa.int64())]))

    per_block = hash_aggregate(
        distinct.map_batches(
            lambda t: pa.table({"host": t.column("host"),
                                "block": t.column("block"),
                                "one": pa.array([1] * t.num_rows,
                                                pa.int64())}),
            batch_format="pyarrow"),
        keys=["host", "block"], sum_cols={"one": "n_pages_with"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("host", pa.string()),
                              ("block", pa.string()),
                              ("n_pages_with", pa.int64())]))

    def host_url(t: pa.Table) -> pa.Table:
        host = _parse_batch(t, url_col)["host"]
        return pa.table({"host": host,
                         "url": pc.cast(t.column(url_col), pa.string()),
                         "one": pa.array([1] * t.num_rows, pa.int64())})

    host_pages = hash_aggregate(
        hash_aggregate(
            pages.map_batches(host_url, batch_format="pyarrow"),
            keys=["host", "url"], sum_cols={"one": "_c"},
            num_partitions=num_partitions,
            out_schema=pa.schema([("host", pa.string()),
                                  ("url", pa.string()),
                                  ("_c", pa.int64())])
        ).map_batches(
            lambda t: pa.table({"host": t.column("host"),
                                "one": pa.array([1] * t.num_rows,
                                                pa.int64())}),
            batch_format="pyarrow"),
        keys=["host"], sum_cols={"one": "n_pages_host"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("host", pa.string()),
                              ("n_pages_host", pa.int64())]))

    j = hash_join(per_block, host_pages, on=["host"],
                  num_partitions=num_partitions)

    def gate(t: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.greater_equal(pc.multiply(t.column("n_pages_with"),
                                         pa.scalar(100, pa.int64())),
                             pc.multiply(t.column("n_pages_host"),
                                         pa.scalar(min_pct,
                                                   pa.int64()))),
            pc.greater_equal(t.column("n_pages_with"),
                             pa.scalar(min_pages, pa.int64())))
        t = t.filter(ok)
        return pa.table({"host": t.column("host"),
                         "block": t.column("block"),
                         "n_pages_with": t.column("n_pages_with"),
                         "n_pages_host": t.column("n_pages_host")})

    return j.map_batches(gate, batch_format="pyarrow")


_TRACKING_PARAM_RE = (r"&(?:utm_[A-Za-z0-9_]*|gclid|fbclid|ref"
                      r"|mc_cid|mc_eid)=[^&]*")


def _clean_array(t: pa.Table, url_col: str) -> pa.Array:
    """The tracking-strip program over one batch: parse, remove the
    tracking params via the documented 3-step regex chain, rebuild the
    canonical URL. Shared by url_strip_tracking / latest_capture_clean."""
    comp = _parse_batch(t, url_col)
    q1 = pc.binary_join_element_wise("&", comp["query"], "")
    q2 = pc.replace_substring_regex(q1, _TRACKING_PARAM_RE, "")
    q3 = pc.replace_substring_regex(q2, "^&", "")
    default_port = pc.if_else(pc.equal(comp["scheme"], "https"),
                              pa.scalar(443, pa.int64()),
                              pa.scalar(80, pa.int64()))
    port_part = pc.if_else(
        pc.equal(comp["port"], default_port),
        pa.scalar("", pa.string()),
        pc.binary_join_element_wise(
            ":", pc.cast(comp["port"], pa.string()), ""))
    query_part = pc.if_else(
        pc.equal(q3, ""), pa.scalar("", pa.string()),
        pc.binary_join_element_wise("?", q3, ""))
    return pc.binary_join_element_wise(
        comp["scheme"], "://", comp["host"], port_part,
        comp["path"], query_part, "")


def url_strip_tracking(pages: rd.Dataset, url_col: str = "url",
                       out_col: str = "clean_url") -> rd.Dataset:
    """Tracking-parameter removal — the recrawl-dedup signal that
    collapses campaign-tagged captures of one resource: drop query
    params named utm_* / gclid / fbclid / ref / mc_cid / mc_eid
    (surviving params keep their order), then rebuild the CANONICAL
    url (lower scheme+host, default port stripped, fragment dropped,
    '?' dropped when no params survive). Documented as a pure regex
    chain over the parsed query — '&'-sentinel prefix, one global
    removal, one leading-'&' strip — so the SQL oracle is the
    identical RE2 program. Stateless vectorized map; output
    (url, clean_url)."""
    def f(t: pa.Table) -> pa.Table:
        return pa.table({url_col: pc.cast(t.column(url_col),
                                          pa.string()),
                         out_col: _clean_array(t, url_col)})

    return pages.map_batches(f, batch_format="pyarrow")


def robots_sitemaps(robots: rd.Dataset, host_col: str = "host",
                    txt_col: str = "robots_txt") -> rd.Dataset:
    """Sitemap discovery from the robots corpus: one (host,
    sitemap_url) row per ``Sitemap:`` line (REP: the directive is
    GLOBAL — group membership is irrelevant — and case-insensitive;
    value = first whitespace-free token after the colon). Stateless
    zero-copy Arrow explode + extract_regex; no shuffle."""
    pat = r"(?i)^sitemap:[ \t]*(?P<u>\S+)"

    def f(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([("host", pa.string()),
                                ("sitemap_url", pa.string())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        txt = pc.cast(t.column(txt_col), pa.string()).combine_chunks()
        sp = pc.split_pattern(txt, "\n")
        flat, parents, _pos = _explode_positions(sp)
        m = pc.extract_regex(flat, pat)
        ok = pc.is_valid(m)
        hosts = pc.take(pc.cast(t.column(host_col), pa.string()),
                        pc.filter(parents, ok))
        return pa.table({"host": hosts,
                         "sitemap_url": pc.struct_field(
                             pc.filter(m, ok), "u")})

    return robots.map_batches(f, batch_format="pyarrow")


def latest_capture_clean(pages: rd.Dataset, url_col: str = "url",
                         ts_col: str = "warc_ts",
                         num_partitions: "int | None" = None
                         ) -> rd.Dataset:
    """Recrawl dedup on the TRACKING-STRIPPED canonical form: campaign
    variants of one resource collapse to a single (latest) capture.
    Composition: url_strip_tracking (stateless) -> grouped_argmax on
    clean_url by (warc_ts desc, raw url asc) — one clean-hash
    exchange. The clean form is computed in the SAME stateless batch
    as the timestamp (re-using the url_strip_tracking program) so no
    join re-attaches columns. Output: (clean_url, url, ts_us)."""
    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"clean_url": _clean_array(t, url_col),
                         url_col: pc.cast(t.column(url_col),
                                          pa.string()),
                         "ts_us": pc.cast(t.column(ts_col),
                                          pa.int64())})

    base = pages.map_batches(prep, batch_format="pyarrow")
    return grouped_argmax(base, key="clean_url", order_col="ts_us",
                          tie_col=url_col,
                          out_cols=["clean_url", url_col, "ts_us"],
                          num_partitions=num_partitions)


def host_triangles(pages: rd.Dataset, url_col: str = "url",
                   html_col: str = "html",
                   num_partitions: "int | None" = None) -> rd.Dataset:
    """Per-host triangle counts over the UNDIRECTED distinct inter-host
    link graph (self-loops dropped inside ``undirected_edges``) — the
    community-density signal for link-farm detection. Degree-ordered
    orientation (see ``ops.graph.triangle_counts``) keeps the wedge
    join O(m^1.5) under hub skew. Output: (host, n_triangles)."""
    from .graph import triangle_counts

    edges = host_edges(pages, url_col, html_col,
                       num_partitions=num_partitions)
    tri = triangle_counts(edges, ("src_host", "dst_host"),
                          node_dtype=pa.string(),
                          num_partitions=num_partitions)
    return tri.map_batches(
        lambda t: t.rename_columns(
            ["host" if c == "node" else c for c in t.column_names]),
        batch_format="pyarrow")


def host_clustering(pages: rd.Dataset, url_col: str = "url",
                    html_col: str = "html",
                    num_partitions: "int | None" = None) -> rd.Dataset:
    """Local clustering coefficient per host over the undirected
    inter-host graph. Output: (host, deg, n_triangles, clustering)."""
    from .graph import clustering_coefficients

    edges = host_edges(pages, url_col, html_col,
                       num_partitions=num_partitions)
    cc = clustering_coefficients(edges, ("src_host", "dst_host"),
                                 node_dtype=pa.string(),
                                 num_partitions=num_partitions)
    return cc.map_batches(
        lambda t: t.rename_columns(
            ["host" if c == "node" else c for c in t.column_names]),
        batch_format="pyarrow")


def host_adamic_adar(pages: rd.Dataset, url_col: str = "url",
                     html_col: str = "html",
                     max_pivot_degree: "int | None" = None,
                     num_partitions: "int | None" = None) -> rd.Dataset:
    """Adamic-Adar link prediction over the undirected inter-host
    graph: non-adjacent host pairs scored by their shared neighbors
    (suggests hosts that SHOULD be crawled together / likely same
    operator). Output: (host_a, host_b, common_neighbors,
    adamic_adar)."""
    from .graph import adamic_adar

    edges = host_edges(pages, url_col, html_col,
                       num_partitions=num_partitions)
    aa = adamic_adar(edges, ("src_host", "dst_host"),
                     node_dtype=pa.string(),
                     max_pivot_degree=max_pivot_degree,
                     num_partitions=num_partitions)

    def rn(t: pa.Table) -> pa.Table:
        m = {"node_a": "host_a", "node_b": "host_b"}
        return t.rename_columns([m.get(c, c) for c in t.column_names])

    return aa.map_batches(rn, batch_format="pyarrow")


def strip_template_blocks(pages: rd.Dataset, url_col: str = "url",
                          html_col: str = "html", min_pct: int = 50,
                          min_pages: int = 2,
                          num_partitions: "int | None" = None
                          ) -> rd.Dataset:
    """Boilerplate REMOVAL (the transform ``host_template_blocks``
    mines for): every block whose text is one of its host's template
    blocks is dropped from the page, the survivors reassemble in
    original segment order. A block text that recurs within one page
    drops at every position if it's a template. Pages whose every
    block is template disappear (nothing left — the CCNet empty-doc
    rule). Output: (url, text, n_kept).

    Plan: positioned block explode (stateless) -> host attach ->
    ANTI ``hash_join`` on (host, block) against the mined template
    set (big-big safe: both sides are distributed, the anti side
    ships distinct keys only) -> one url-hash exchange reassembles
    per partition. The template mining itself re-runs its own two
    exchanges; at crawl scale mine ONCE, persist, and pass the
    parquet-backed template set instead (same join)."""
    import pandas as pd

    from .relational import hash_join, typed_groupby_map, \
        _resolve_partitions as _rp

    num_partitions = _rp(num_partitions)
    blocks = page_blocks(pages, url_col, html_col, with_pos=True)

    def add_host(t: pa.Table) -> pa.Table:
        host = _parse_batch(t, url_col)["host"]
        return pa.table({"host": host,
                         "url": pc.cast(t.column(url_col), pa.string()),
                         "block": t.column("block"),
                         "seg_no": t.column("seg_no")})

    tpl = host_template_blocks(pages, url_col, html_col, min_pct,
                               min_pages, num_partitions)
    kept = hash_join(
        blocks.map_batches(add_host, batch_format="pyarrow"),
        tpl.select_columns(["host", "block"]),
        on=["host", "block"], how="anti",
        left_schema=pa.schema([("host", pa.string()),
                               ("url", pa.string()),
                               ("block", pa.string()),
                               ("seg_no", pa.int64())]),
        right_schema=pa.schema([("host", pa.string()),
                                ("block", pa.string())]),
        num_partitions=num_partitions)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["url"], index=False)
        return df.assign(_part=(h % num_partitions).astype("int64"))

    out_schema = pa.schema([("url", pa.string()), ("text", pa.string()),
                            ("n_kept", pa.int64())])

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["url", "seg_no"], kind="stable")
        agg = g.groupby("url", sort=True)["block"].agg(
            [("text", "\n".join), ("n_kept", "size")]).reset_index()
        agg["n_kept"] = agg["n_kept"].astype("int64")
        return agg

    return typed_groupby_map(
        kept.map_batches(part, batch_format="pandas"),
        "_part", reassemble, out_schema)


def host_assortativity(pages: rd.Dataset, url_col: str = "url",
                       html_col: str = "html",
                       num_partitions: "int | None" = None
                       ) -> rd.Dataset:
    """Degree assortativity of the undirected inter-host graph — do
    big hosts link to big hosts? (Web graphs are famously
    DISassortative.) One row: (n_edges, assortativity)."""
    from .graph import degree_assortativity

    edges = host_edges(pages, url_col, html_col,
                       num_partitions=num_partitions)
    return degree_assortativity(edges, ("src_host", "dst_host"),
                                node_dtype=pa.string(),
                                num_partitions=num_partitions)


def host_kcore(pages: rd.Dataset, k: int, url_col: str = "url",
               html_col: str = "html",
               max_rounds: "int | None" = None,
               num_partitions: "int | None" = None) -> rd.Dataset:
    """k-core of the undirected inter-host graph by iterative peeling
    (the dense-nucleus / link-farm extraction primitive). Output:
    (host, deg) of surviving hosts with in-core degree."""
    from .graph import kcore_nodes

    edges = host_edges(pages, url_col, html_col,
                       num_partitions=num_partitions)
    core = kcore_nodes(edges, k, ("src_host", "dst_host"),
                       node_dtype=pa.string(), max_rounds=max_rounds,
                       num_partitions=num_partitions)
    return core.map_batches(
        lambda t: t.rename_columns(
            ["host" if c == "node" else c for c in t.column_names]),
        batch_format="pyarrow")


def host_feature_table(pages: rd.Dataset, url_col: str = "url",
                       html_col: str = "html", n_iter: int = 3,
                       num_partitions: "int | None" = None
                       ) -> rd.Dataset:
    """Per-host web-graph FEATURE ASSEMBLY — the classifier-input
    table a spam/quality model trains on, composed entirely from the
    individually-oracled graph primitives: undirected degree, triangle
    count, clustering coefficient, damped PageRank and HITS hub/
    authority, stitched with two co-partitioned joins on host. Every
    host with >= 1 inter-host edge gets one row:
    (host, deg, n_triangles, clustering, pagerank, auth, hub)."""
    from .relational import hash_join

    cc = host_clustering(pages, url_col, html_col,
                         num_partitions=num_partitions)
    pr = host_pagerank(pages, url_col, html_col, n_iter=n_iter,
                       num_partitions=num_partitions)
    ht = host_hits(pages, url_col, html_col, n_iter=n_iter,
                   num_partitions=num_partitions)

    def rn(m: dict[str, str]):
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns([m.get(c, c) for c in t.column_names])
        return f

    j1 = hash_join(
        cc, pr.map_batches(rn({"node": "host", "r": "pagerank"}),
                           batch_format="pyarrow"),
        on="host",
        left_schema=pa.schema([("host", pa.string()),
                               ("deg", pa.int64()),
                               ("n_triangles", pa.int64()),
                               ("clustering", pa.float64())]),
        right_schema=pa.schema([("host", pa.string()),
                                ("pagerank", pa.float64())]),
        num_partitions=num_partitions)
    return hash_join(
        j1, ht.map_batches(rn({"node": "host"}), batch_format="pyarrow"),
        on="host",
        left_schema=pa.schema([("host", pa.string()),
                               ("deg", pa.int64()),
                               ("n_triangles", pa.int64()),
                               ("clustering", pa.float64()),
                               ("pagerank", pa.float64())]),
        right_schema=pa.schema([("host", pa.string()),
                                ("auth", pa.float64()),
                                ("hub", pa.float64())]),
        num_partitions=num_partitions)


def host_ktruss(pages: rd.Dataset, k: int, url_col: str = "url",
                html_col: str = "html",
                max_rounds: "int | None" = None,
                num_partitions: "int | None" = None) -> rd.Dataset:
    """k-truss of the undirected inter-host graph — the edge-cohesion
    nucleus (every surviving host pair co-occurs in >= k-2 triangles;
    stricter than k-core, the standard link-clique extractor). Output:
    (host_a, host_b, support)."""
    from .graph import ktruss_edges

    edges = host_edges(pages, url_col, html_col,
                       num_partitions=num_partitions)
    tr = ktruss_edges(edges, k, ("src_host", "dst_host"),
                      node_dtype=pa.string(), max_rounds=max_rounds,
                      num_partitions=num_partitions)

    def rn(t: pa.Table) -> pa.Table:
        m = {"a": "host_a", "b": "host_b"}
        return t.rename_columns([m.get(c, c) for c in t.column_names])

    return tr.map_batches(rn, batch_format="pyarrow")


def host_dup_stats(pages: rd.Dataset, url_col: str = "url",
                   html_col: str = "html",
                   num_partitions: "int | None" = None) -> rd.Dataset:
    """Per-host content-duplication profile — the crawl-health signal
    that decides recrawl budgets (a host whose captures are mostly
    byte-identical is wasting fetches): captures, DISTINCT payload
    fingerprints (md5 of the raw html), and
    ``dup_rate = 1 - n_distinct / n_captures``. One stateless
    fingerprint map, one count combiner aggregate, one exact
    ``distinct_count`` exchange, one co-partitioned join. Output:
    (host, n_captures, n_distinct, dup_rate)."""
    import hashlib

    from .relational import distinct_count, hash_join, partial_agg_sum

    def fp(t: pa.Table) -> pa.Table:
        host = _parse_batch(t, url_col)["host"]
        fps = [hashlib.md5((x or "").encode()).hexdigest()
               for x in pc.cast(t.column(html_col),
                                pa.string()).to_pylist()]
        return pa.table({"host": host,
                         "fp": pa.array(fps, pa.string()),
                         "one": pa.array([1] * t.num_rows, pa.int64())})

    base = pages.map_batches(fp, batch_format="pyarrow").materialize()
    caps = partial_agg_sum(base, "host", {"one": "n_captures"})
    dist = distinct_count(base, "host", "fp", alias="n_distinct",
                          key_type=pa.string(),
                          num_partitions=num_partitions)
    j = hash_join(
        caps, dist, on="host",
        left_schema=pa.schema([("host", pa.string()),
                               ("n_captures", pa.int64())]),
        right_schema=pa.schema([("host", pa.string()),
                                ("n_distinct", pa.int64())]),
        num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        c = pc.cast(t.column("n_captures"), pa.float64())
        d = pc.cast(t.column("n_distinct"), pa.float64())
        rate = pc.subtract(pa.scalar(1.0), pc.divide(d, c))
        return pa.table({"host": t.column("host"),
                         "n_captures": t.column("n_captures"),
                         "n_distinct": t.column("n_distinct"),
                         "dup_rate": pc.cast(rate, pa.float64())})

    return j.map_batches(finish, batch_format="pyarrow")


def _host_nodes(edges: rd.Dataset,
                num_partitions: "int | None" = None) -> rd.Dataset:
    """(host,) — every endpoint of the host_edges rollup INCLUDING
    self-loop-only hosts (sites with only intra-host nav are still
    nodes, matching host_components' node universe). One combiner-
    backed distinct exchange."""
    from .relational import hash_aggregate

    def ends(t: pa.Table) -> pa.Table:
        schema = pa.schema([("host", pa.string()), ("one", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        hosts = pa.concat_arrays(
            [t.column("src_host").combine_chunks(),
             t.column("dst_host").combine_chunks()]).unique()
        return pa.table({"host": hosts,
                         "one": pa.array([1] * len(hosts), pa.int64())})

    return hash_aggregate(
        edges.map_batches(ends, batch_format="pyarrow"),
        keys=["host"], sum_cols={"one": "_c"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("host", pa.string()),
                              ("_c", pa.int64())])
    ).select_columns(["host"])


def host_bfs_depth(pages: rd.Dataset, max_depth: int = 3,
                   n_seeds: int = 2, url_col: str = "url",
                   html_col: str = "html", directed: bool = False,
                   num_partitions: "int | None" = None) -> rd.Dataset:
    """Hop distance from the seed hosts over the undirected inter-host
    link graph: (host, depth) for every host within ``max_depth`` hops,
    depth = minimum hops (crawl-frontier / trust-distance primitive).
    Seeds = the ``n_seeds`` lexicographically smallest hosts of the
    node universe — a deterministic, fixture-independent choice the
    SQL oracle reproduces with ORDER BY host LIMIT n (the sort runs
    over the HOST set, already aggregate-collapsed and tiny relative
    to the crawl; a production caller passes its own trusted seed
    Dataset straight to ``bfs_layers`` and skips it). Plan:
    ``ops.graph.bfs_layers`` (3 frontier-sized exchanges per round)."""
    from .graph import bfs_layers

    edges = host_edges(pages, url_col, html_col,
                       num_partitions=num_partitions).materialize()
    seeds = (_host_nodes(edges, num_partitions)
             .map_batches(lambda t: pa.table({"node": t.column("host")}),
                          batch_format="pyarrow")
             .sort("node").limit(n_seeds))
    out = bfs_layers(edges, seeds, max_depth,
                     pair_cols=("src_host", "dst_host"),
                     directed=directed,
                     num_partitions=num_partitions)
    return out.map_batches(
        lambda t: pa.table({"host": t.column("node"),
                            "depth": t.column("depth")}),
        batch_format="pyarrow")


def host_bfs_weighted(pages: rd.Dataset, n_rounds: int = 3,
                      n_seeds: int = 2, url_col: str = "url",
                      html_col: str = "html",
                      num_partitions: "int | None" = None) -> rd.Dataset:
    """Minimum link-COST distance from the seed hosts over the
    DIRECTED inter-host link graph with per-edge cost 1/n_links —
    heavily-linked host pairs are cheap to traverse, so dist is a
    crawl-priority / trust-propagation distance rather than a hop
    count (the weighted generalization of ``host_bfs_depth``; paths
    of at most ``n_rounds`` edges, the bounded-unroll contract).
    Seeds = the ``n_seeds`` lexicographically smallest hosts of the
    node universe (self-loop-only hosts included, as in BFS; the
    traversal edge set drops self-loops). Output (host, dist), dist
    quantized 9 dp. Plan: ``ops.graph.bellman_ford`` — 2 exchanges
    per round over node-bounded state."""
    import numpy as np

    from .graph import bellman_ford

    edges = host_edges(pages, url_col, html_col,
                       num_partitions=num_partitions).materialize()
    seeds = (_host_nodes(edges, num_partitions)
             .map_batches(lambda t: pa.table({"node": t.column("host")}),
                          batch_format="pyarrow")
             .sort("node").limit(n_seeds))

    def weight(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t.column("src_host"), t.column("dst_host"))
        t = t.filter(keep)
        n = t.column("n_links").to_numpy().astype(np.float64)
        return pa.table({"src_host": t.column("src_host"),
                         "dst_host": t.column("dst_host"),
                         "w": pa.array(1.0 / n, pa.float64())})

    out = bellman_ford(edges.map_batches(weight, batch_format="pyarrow"),
                       seeds, n_rounds,
                       pair_cols=("src_host", "dst_host"),
                       num_partitions=num_partitions)
    return out.map_batches(
        lambda t: pa.table({
            "host": t.column("node"),
            "dist": pa.array(np.round(t.column("dist").to_numpy(), 9),
                             pa.float64())}),
        batch_format="pyarrow")


def host_communities(pages: rd.Dataset, n_rounds: int = 3,
                     url_col: str = "url", html_col: str = "html",
                     weighted: bool = False,
                     num_partitions: "int | None" = None) -> rd.Dataset:
    """Community labels over the undirected inter-host link graph by
    synchronous mode-label propagation at a fixed ``n_rounds`` contract
    (ties -> smallest label; isolated / self-loop-only hosts keep their
    own label): (host, community). Mode propagation separates DENSE
    site clusters where hash-min components would merge anything
    connected — the link-farm / mirror-cluster detector.
    Plan: ``ops.graph.label_propagation``."""
    from .graph import label_propagation

    edges = host_edges(pages, url_col, html_col,
                       num_partitions=num_partitions).materialize()
    nodes = _host_nodes(edges, num_partitions).map_batches(
        lambda t: pa.table({"node": t.column("host")}),
        batch_format="pyarrow")
    out = label_propagation(edges, nodes, n_rounds=n_rounds,
                            pair_cols=("src_host", "dst_host"),
                            weight_col="n_links" if weighted else None,
                            num_partitions=num_partitions)
    return out.map_batches(
        lambda t: pa.table({"host": t.column("node"),
                            "community": t.column("lbl")}),
        batch_format="pyarrow")


def url_path_templates(pages: rd.Dataset, url_col: str = "url",
                       num_partitions: "int | None" = None) -> rd.Dataset:
    """Crawl-trap / faceted-explosion detector: collapse every URL
    path to its TEMPLATE (digit runs -> 'N', so /post/123/page/4 and
    /post/999/page/7 coincide) and profile each template with its
    capture count and distinct-host spread. A template with huge
    n_urls on few hosts is a calendar trap or pagination explosion —
    the classic recrawl-budget sink; one with many hosts is a shared
    CMS layout. Output (path_template, n_urls, n_hosts).

    Plan: stateless vectorized parse+replace, then one count combiner
    exchange + one exact distinct-pair exchange + one co-partitioned
    join (the host_dup_stats shape keyed by template)."""
    from .relational import distinct_count, hash_join, partial_agg_sum

    def f(t: pa.Table) -> pa.Table:
        comp = _parse_batch(t, url_col)
        tmpl = pc.replace_substring_regex(comp["path"], "[0-9]+", "N")
        return pa.table({"path_template": tmpl, "host": comp["host"],
                         "one": pa.array([1] * t.num_rows, pa.int64())})

    base = pages.map_batches(f, batch_format="pyarrow").materialize()
    counts = partial_agg_sum(base, "path_template", {"one": "n_urls"})
    dist = distinct_count(base, "path_template", "host",
                          alias="n_hosts", key_type=pa.string(),
                          num_partitions=num_partitions)
    return hash_join(
        counts, dist, on="path_template",
        left_schema=pa.schema([("path_template", pa.string()),
                               ("n_urls", pa.int64())]),
        right_schema=pa.schema([("path_template", pa.string()),
                                ("n_hosts", pa.int64())]),
        num_partitions=num_partitions)


def host_outlink_jaccard(pages: rd.Dataset, url_col: str = "url",
                         html_col: str = "html",
                         max_target_indegree: "int | None" = None,
                         num_partitions: "int | None" = None
                         ) -> rd.Dataset:
    """Outlink-set Jaccard between HOSTS of the directed inter-host
    link graph — mirror / coordinated-network detection: (host_a,
    host_b, common_targets, jaccard) for co-citing host pairs.
    Plan: ``ops.graph.outlink_jaccard`` over the host_edges rollup."""
    from .graph import outlink_jaccard

    edges = host_edges(pages, url_col, html_col,
                       num_partitions=num_partitions).materialize()
    out = outlink_jaccard(edges, pair_cols=("src_host", "dst_host"),
                          max_target_indegree=max_target_indegree,
                          num_partitions=num_partitions)
    return out.map_batches(
        lambda t: pa.table({"host_a": t.column("node_a"),
                            "host_b": t.column("node_b"),
                            "common_targets": t.column("common_targets"),
                            "jaccard": t.column("jaccard")}),
        batch_format="pyarrow")


def host_robots_profile(pages: rd.Dataset, robots: rd.Dataset,
                        url_col: str = "url",
                        num_partitions: "int | None" = None
                        ) -> rd.Dataset:
    """Per-host robots.txt pressure: how much of a host's distinct
    canonical URL surface its own robots rules BLOCK — (host, n_urls,
    n_blocked, block_rate). High block rates flag hosts whose crawl
    budget is being burned on fetches that then get gated (or whose
    robots changed under a recrawl). One indicator-sum combiner
    aggregate over the robots_gate relation; block_rate quantized 9 dp
    (float-tie rule)."""
    from .relational import partial_agg_sum

    gate = robots_gate(pages, robots, url_col=url_col,
                       num_partitions=num_partitions)

    def ind(t: pa.Table) -> pa.Table:
        blocked = pc.subtract(pa.scalar(1, pa.int64()),
                              pc.cast(t.column("allowed"), pa.int64()))
        return pa.table({"host": t.column("host"),
                         "one": pa.array([1] * t.num_rows, pa.int64()),
                         "blocked": blocked})

    agg = partial_agg_sum(
        gate.map_batches(ind, batch_format="pyarrow"), "host",
        {"one": "n_urls", "blocked": "n_blocked"})

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column("n_urls"), pa.float64())
        b = pc.cast(t.column("n_blocked"), pa.float64())
        return pa.table({"host": t.column("host"),
                         "n_urls": t.column("n_urls"),
                         "n_blocked": t.column("n_blocked"),
                         "block_rate": pc.round(pc.divide(b, n),
                                                ndigits=9)})

    return agg.map_batches(finish, batch_format="pyarrow")


def host_path_depth(pages: rd.Dataset, url_col: str = "url",
                    num_partitions: "int | None" = None) -> rd.Dataset:
    """Per-host URL path-depth profile over the capture log: depth =
    number of '/' characters in the parsed path ('/' root = 1). Deep
    tails are the classic trap signal (calendars, faceted nav) and the
    politeness scheduler's queue-depth prior. Output (host,
    n_captures, max_depth, avg_depth) with avg quantized 9 dp.
    One count/sum combiner exchange + one grouped_argmax + a join."""
    from .relational import grouped_argmax, hash_join, partial_agg_sum

    def prep(t: pa.Table) -> pa.Table:
        comp = _parse_batch(t, url_col)
        depth = pc.cast(pc.count_substring(comp["path"], "/"),
                        pa.int64())
        return pa.table({"host": comp["host"], "depth": depth,
                         "one": pa.array([1] * t.num_rows, pa.int64())})

    base = pages.map_batches(prep, batch_format="pyarrow").materialize()
    sums = partial_agg_sum(base, "host",
                           {"one": "n_captures", "depth": "sum_depth"})
    mx = grouped_argmax(
        base, key="host", order_col="depth", tie_col="depth",
        out_cols=["host", "depth"],
        num_partitions=num_partitions).map_batches(
            lambda t: pa.table({"host": t.column("host"),
                                "max_depth": t.column("depth")}),
            batch_format="pyarrow")
    j = hash_join(
        sums, mx, on="host",
        left_schema=pa.schema([("host", pa.string()),
                               ("n_captures", pa.int64()),
                               ("sum_depth", pa.int64())]),
        right_schema=pa.schema([("host", pa.string()),
                                ("max_depth", pa.int64())]),
        num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        s = pc.cast(t.column("sum_depth"), pa.float64())
        n = pc.cast(t.column("n_captures"), pa.float64())
        return pa.table({"host": t.column("host"),
                         "n_captures": t.column("n_captures"),
                         "max_depth": t.column("max_depth"),
                         "avg_depth": pc.round(pc.divide(s, n),
                                               ndigits=9)})

    return j.map_batches(finish, batch_format="pyarrow")


def host_trustrank(pages: rd.Dataset, n_seeds: int = 2,
                   url_col: str = "url", html_col: str = "html",
                   n_iter: int = 3, mode: str = "auto",
                   num_partitions: "int | None" = None) -> rd.Dataset:
    """TrustRank over the distinct inter-host edge set: personalized
    PageRank whose teleport mass lands only on the trusted seed hosts
    — trust decays with link distance from the seeds, so a host's gap
    between PageRank and TrustRank is the classic spam-mass signal.
    Seeds = the ``n_seeds`` lexicographically smallest hosts of the
    edge-endpoint universe (deterministic; the SQL oracle reproduces
    it with ORDER BY LIMIT n — production passes a real whitelist via
    ``ops.graph.pagerank(seeds=...)`` directly). Output (node, r)."""
    from .graph import pagerank
    from .relational import hash_aggregate

    edges = host_edges(pages, url_col, html_col,
                       num_partitions=num_partitions).materialize()

    def inter(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t.column("src_host"),
                                        t.column("dst_host"))))
        return pa.table({"src": t.column("src_host"),
                         "dst": t.column("dst_host")})

    inter_e = edges.map_batches(inter,
                                batch_format="pyarrow").materialize()

    def ends(t: pa.Table) -> pa.Table:
        schema = pa.schema([("node", pa.string()), ("one", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        h = pa.concat_arrays([t.column("src").combine_chunks(),
                              t.column("dst").combine_chunks()]).unique()
        return pa.table({"node": h,
                         "one": pa.array([1] * len(h), pa.int64())})

    seeds = [r["node"] for r in hash_aggregate(
        inter_e.map_batches(ends, batch_format="pyarrow"),
        keys=["node"], sum_cols={"one": "_c"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("node", pa.string()),
                              ("_c", pa.int64())])
    ).select_columns(["node"]).sort("node").limit(n_seeds).take_all()]

    return pagerank(inter_e, n_iter=n_iter,
                    num_partitions=num_partitions, mode=mode,
                    node_dtype=pa.string(), seeds=seeds)


def host_spam_mass(pages: rd.Dataset, n_seeds: int = 2,
                   url_col: str = "url", html_col: str = "html",
                   n_iter: int = 3,
                   num_partitions: "int | None" = None) -> rd.Dataset:
    """Estimated SPAM MASS per host (Gyongyi et al.): the share of a
    host's PageRank that does NOT arrive through trusted paths —
    spam_mass = (pagerank - trustrank) / pagerank. Hosts whose rank
    comes almost entirely from untrusted link mass score near 1; the
    seed neighborhood scores low or negative. One co-partitioned join
    of the two rank relations; both float columns quantized 9 dp
    (float-tie rule). Output (host, pagerank, trustrank, spam_mass)."""
    from .relational import hash_join

    pr = host_pagerank(pages, url_col, html_col, n_iter=n_iter,
                       num_partitions=num_partitions).map_batches(
        lambda t: pa.table({"host": t.column("node"),
                            "pr": t.column("r")}),
        batch_format="pyarrow")
    tr = host_trustrank(pages, n_seeds=n_seeds, url_col=url_col,
                        html_col=html_col, n_iter=n_iter,
                        num_partitions=num_partitions).map_batches(
        lambda t: pa.table({"host": t.column("node"),
                            "tr": t.column("r")}),
        batch_format="pyarrow")
    j = hash_join(
        pr, tr, on="host",
        left_schema=pa.schema([("host", pa.string()),
                               ("pr", pa.float64())]),
        right_schema=pa.schema([("host", pa.string()),
                                ("tr", pa.float64())]),
        num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        p = t.column("pr")
        r = t.column("tr")
        sm = pc.divide(pc.subtract(p, r), p)
        return pa.table({"host": t.column("host"),
                         "pagerank": pc.round(p, ndigits=9),
                         "trustrank": pc.round(r, ndigits=9),
                         "spam_mass": pc.round(sm, ndigits=9)})

    return j.map_batches(finish, batch_format="pyarrow")


def host_harmonic2(pages: rd.Dataset, url_col: str = "url",
                   html_col: str = "html",
                   num_partitions: "int | None" = None) -> rd.Dataset:
    """Radius-2 harmonic centrality per host over the undirected
    inter-host graph: deg * 1.0 + |dist==2| * 0.5 — the bounded-radius
    influence score (crawl-seed ranking signal) between degree and
    full closeness. Output: (host, harmonic2)."""
    from .graph import harmonic_centrality2

    edges = host_edges(pages, url_col, html_col,
                       num_partitions=num_partitions)
    return harmonic_centrality2(
        edges, pair_cols=("src_host", "dst_host"),
        node_dtype=pa.string(), num_partitions=num_partitions
    ).map_batches(
        lambda t: t.rename_columns(["host", "harmonic2"]),
        batch_format="pyarrow")


def host_random_walks(pages: rd.Dataset, walk_len: int = 3,
                      n_walks: int = 2, url_col: str = "url",
                      html_col: str = "html",
                      num_partitions: "int | None" = None) -> rd.Dataset:
    """Deterministic hash-seeded random walks over the DIRECTED
    inter-host link graph (the DeepWalk corpus for host embeddings).
    Output: (seed, walk, step, node)."""
    from .graph import random_walks

    edges = host_edges(pages, url_col, html_col,
                       num_partitions=num_partitions)
    return random_walks(edges, walk_len=walk_len, n_walks=n_walks,
                        pair_cols=("src_host", "dst_host"),
                        node_dtype=pa.string(),
                        num_partitions=num_partitions)


def host_walk_skipgrams(pages: rd.Dataset, walk_len: int = 3,
                        n_walks: int = 2, window: int = 2,
                        url_col: str = "url", html_col: str = "html",
                        num_partitions: "int | None" = None
                        ) -> rd.Dataset:
    """Skip-gram (center, context, cnt) pairs from the host random-walk
    corpus — the training-pair table for a host-embedding model."""
    from .graph import walk_skipgram_pairs

    walks = host_random_walks(pages, walk_len=walk_len,
                              n_walks=n_walks, url_col=url_col,
                              html_col=html_col,
                              num_partitions=num_partitions)
    return walk_skipgram_pairs(walks, window=window,
                               num_partitions=num_partitions)


def entity_subsumption(cooc: rd.Dataset,
                       threshold: float = 0.6) -> rd.Dataset:
    """Taxonomy-induction candidates from the co-mention graph
    (Hearst-free distributional subsumption, the CTA-style "broader
    concept" signal a KG builds when no ontology is given): from each
    ``entity_cooccurrence`` pair, emit (broad, narrow) when the
    conditional mention probability P(broad | narrow) = n_pair /
    n_narrow reaches ``threshold`` AND broad is STRICTLY more frequent
    (n_broad > n_narrow — strictness keeps ties from subsuming both
    ways). Output: (broad, narrow, n_pair, n_broad, n_narrow,
    confidence) with confidence quantized 9 dp via the exact
    ``n_pair / n_narrow`` division the SQL oracle evaluates (integer
    inputs -> IEEE-identical on both sides).

    Stateless single map over the cooccurrence output — the pair graph
    never re-shuffles; scale rides entirely on the upstream op."""
    import numpy as np

    def direct(t: pa.Table) -> pa.Table:
        e1 = t.column("e1").to_numpy(zero_copy_only=False)
        e2 = t.column("e2").to_numpy(zero_copy_only=False)
        npair = t.column("n_pair").to_numpy(zero_copy_only=False)
        n1 = t.column("n_e1").to_numpy(zero_copy_only=False)
        n2 = t.column("n_e2").to_numpy(zero_copy_only=False)
        # both orientations, then one vectorized gate
        broad = np.concatenate([e1, e2])
        narrow = np.concatenate([e2, e1])
        nb = np.concatenate([n1, n2])
        nn = np.concatenate([n2, n1])
        np2 = np.concatenate([npair, npair])
        conf = np2 * 1.0 / nn
        keep = (nb > nn) & (conf >= threshold)
        return pa.table({
            "broad": pa.array(broad[keep], pa.string()),
            "narrow": pa.array(narrow[keep], pa.string()),
            "n_pair": pa.array(np2[keep], pa.int64()),
            "n_broad": pa.array(nb[keep], pa.int64()),
            "n_narrow": pa.array(nn[keep], pa.int64()),
            "confidence": pa.array(np.round(conf[keep], 9),
                                   pa.float64())})

    return cooc.map_batches(direct, batch_format="pyarrow")


def scd2_versions(captures: rd.Dataset, key_col: str = "url",
                  sig_col: str = "content_len", ts_col: str = "warc_ts",
                  num_partitions: "int | None" = None) -> rd.Dataset:
    """Slowly-changing-dimension type-2 build over the capture log:
    consecutive captures of a url with the SAME content signature
    collapse into one version row carrying its validity interval —
    (key, sig, valid_from_us, valid_to_us, n_captures), where valid_to
    is the next version's start or -1 for the still-current version.
    One key-hash exchange; run-length collapse and the lead() are
    vectorized per partition."""
    import pandas as pd

    from .relational import _resolve_partitions, typed_groupby_map

    num_partitions = _resolve_partitions(num_partitions)

    def add_part(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df[[key_col, sig_col, ts_col]].copy()
        df["part"] = (pd.util.hash_pandas_object(df[key_col], index=False)
                      % num_partitions).astype("int64")
        return df

    def versions(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values([key_col, ts_col], kind="stable")
        tsu = g[ts_col].astype("datetime64[ns]").astype("int64") // 1000
        prev = g.groupby(key_col)[sig_col].shift(1)
        new = (prev.isna() | (g[sig_col] != prev)).astype("int64")
        ver = new.groupby(g[key_col].to_numpy()).cumsum()
        runs = (pd.DataFrame({key_col: g[key_col].to_numpy(),
                              "_v": ver.to_numpy(),
                              sig_col: g[sig_col].to_numpy(),
                              "tsu": tsu.to_numpy()})
                .groupby([key_col, "_v", sig_col], as_index=False)
                .agg(valid_from_us=("tsu", "min"),
                     n_captures=("tsu", "size")))
        runs = runs.sort_values([key_col, "valid_from_us"], kind="stable")
        nxt = runs.groupby(key_col)["valid_from_us"].shift(-1)
        runs["valid_to_us"] = nxt.fillna(-1).astype("int64")
        runs["n_captures"] = runs["n_captures"].astype("int64")
        return runs[[key_col, sig_col, "valid_from_us", "valid_to_us",
                     "n_captures"]]

    return typed_groupby_map(
        captures.map_batches(add_part, batch_format="pandas"), "part",
        versions,
        pa.schema([(key_col, pa.string()), (sig_col, pa.int64()),
                   ("valid_from_us", pa.int64()),
                   ("valid_to_us", pa.int64()),
                   ("n_captures", pa.int64())]))

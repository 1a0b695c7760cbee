"""Web-capture operators (tabbyray/ops/web.py): URL parsing and
canonicalization invariants, recrawl dedup, and the per-host rollup —
each checked against an independent pandas recompute on the
deterministic capture-log fixture."""

import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture(scope="module")
def captures(ray_session):
    from tabbyray.fixtures import ensure_web_fixture
    path = ensure_web_fixture()
    ds = rd.read_parquet(path, override_num_blocks=8)
    return ds, pd.read_parquet(path)


def _canon_py(url: str) -> str:
    """Independent reference canonicalization (urllib-free on purpose:
    simple string logic mirrors the documented normal form)."""
    scheme, rest = url.split("://", 1)
    scheme = scheme.lower()
    for sep in "/?#":
        i = rest.find(sep)
        if i >= 0:
            hostport, tail = rest[:i], rest[i:]
            break
    else:
        hostport, tail = rest, ""
    hostport = hostport.lower()
    host, _, port_s = hostport.partition(":")
    default = 443 if scheme == "https" else 80
    port = int(port_s) if port_s else default
    frag_i = tail.find("#")
    if frag_i >= 0:
        tail = tail[:frag_i]
    q_i = tail.find("?")
    path, query = (tail[:q_i], tail[q_i + 1:]) if q_i >= 0 else (tail, "")
    path = path or "/"
    out = f"{scheme}://{host}"
    if port != default:
        out += f":{port}"
    out += path
    if query:
        out += f"?{query}"
    return out


def test_url_components_parse(captures):
    from tabbyray.ops.web import url_components
    ds, raw = captures
    got = url_components(ds).to_pandas()
    assert len(got) == len(raw)
    # spot-parse every result row independently
    for g in got.itertuples():
        c = _canon_py(g.url)
        assert c.startswith(g.scheme + "://" + g.host)
        assert g.scheme == g.scheme.lower()
        assert g.host == g.host.lower()
        assert ("." + g.registered_domain) in ("." + g.host) or \
            g.host == g.registered_domain
    # default ports filled by scheme
    https = got[got["scheme"] == "https"]
    assert set(https["port"].unique()) <= {443, 8443, 8080}


def test_canonicalize_collapses_variants(captures):
    from tabbyray.ops.web import url_canonicalize
    ds, raw = captures
    got = url_canonicalize(ds).to_pandas()
    assert len(got) == len(raw)
    assert (got["canon_url"] == got["url"].map(_canon_py)).all()
    # variants genuinely collapse: fewer canon urls than raw spellings
    assert got["canon_url"].nunique() < got["url"].nunique()
    # no canonical url retains a fragment or an explicit default port
    assert not got["canon_url"].str.contains("#").any()
    assert not got["canon_url"].str.match(r"https://[^/]*:443(/|$)").any()
    assert not got["canon_url"].str.match(r"http://[^/]*:80(/|$)").any()


def test_latest_capture_per_url(captures):
    from tabbyray.ops.web import latest_capture_per_url
    ds, raw = captures
    got = latest_capture_per_url(ds).to_pandas()
    ref = raw.assign(canon_url=raw["url"].map(_canon_py),
                     ts_us=raw["warc_ts"].astype("int64"))
    win = (ref.sort_values(["ts_us", "url"], ascending=[False, True])
           .drop_duplicates("canon_url"))
    assert len(got) == len(win)
    g = got.sort_values("canon_url").reset_index(drop=True)
    w = (win[["canon_url", "url", "ts_us", "content_len", "status"]]
         .sort_values("canon_url").reset_index(drop=True))
    pd.testing.assert_frame_equal(g[w.columns], w)


def test_host_stats(captures):
    from tabbyray.ops.web import host_stats
    ds, raw = captures
    got = (host_stats(ds).to_pandas()
           .sort_values("host").reset_index(drop=True))
    ref = raw.assign(canon_url=raw["url"].map(_canon_py),
                     ts_us=raw["warc_ts"].astype("int64"))
    ref["host"] = ref["canon_url"].str.extract(r"^[a-z+.-]+://([^:/?]+)")
    exp = (ref.groupby("host")
           .agg(n_captures=("url", "size"),
                n_urls=("canon_url", "nunique"),
                total_bytes=("content_len", "sum"),
                last_seen_us=("ts_us", "max"))
           .reset_index().sort_values("host").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[exp.columns], exp)


# ---------------------------------------------------------------------------
# Link graph
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def link_pages(ray_session):
    from tabbyray.fixtures import ensure_link_fixture
    path = ensure_link_fixture()
    return rd.read_parquet(path, override_num_blocks=4), pd.read_parquet(path)


def test_resolve_hrefs_classes(ray_session):
    """One unit case per documented href class."""
    import pyarrow as pa
    from tabbyray.ops.web import resolve_hrefs
    base = "https://www.Example.com:443/a/b?q=1#top"
    cases = [
        ("https://OTHER.org:8080/x#f", "https://other.org:8080/x"),
        ("HTTP://h.example/p", "http://h.example/p"),
        ("//cdn.example/pic", "https://cdn.example/pic"),
        ("/root/doc", "https://www.example.com/root/doc"),
        ("rel/doc?l=en", "https://www.example.com/a/rel/doc?l=en"),
        ("leaf", "https://www.example.com/a/leaf"),
        ("", None), ("#sec", None),
        ("mailto:x@y.example", None), ("javascript:void(0)", None),
    ]
    t = pa.table({"url": pa.array([base] * len(cases)),
                  "href": pa.array([c[0] for c in cases])})
    got = resolve_hrefs(rd.from_arrow(t)).to_pandas()
    want = {c[0]: c[1] for c in cases if c[1] is not None}
    assert dict(zip(got["href"], got["dst_canon"])) == want
    # src always canonicalizes the base (lowercase, default port
    # stripped, fragment dropped, query kept)
    assert set(got["src_canon"]) == {"https://www.example.com/a/b?q=1"}


def test_extract_anchors_counts(link_pages):
    """Anchor rows equal an independent re.findall recount, in order."""
    import re
    from tabbyray.ops.web import extract_anchors
    ds, raw = link_pages
    got = extract_anchors(ds).to_pandas()
    want = []
    for r in raw.itertuples():
        for h in re.findall(r'<a href="([^"]*)"', r.html):
            want.append((r.url, h))
    assert sorted(map(tuple, got.itertuples(index=False))) == sorted(want)


def test_host_edges_conservation(link_pages):
    """Edge counts sum to the number of resolvable anchors; self-loops
    are kept in the rollup."""
    from tabbyray.ops.web import host_edges, resolve_links
    ds, _ = link_pages
    links = resolve_links(ds).to_pandas()
    edges = host_edges(ds).to_pandas()
    assert edges["n_links"].sum() == len(links)
    assert (edges["n_links"] > 0).all()
    assert len(edges) == edges[["src_host", "dst_host"]].drop_duplicates().shape[0]


def test_host_pagerank_paths_agree(link_pages):
    """String-node pagerank: broadcast and join paths agree to float
    roundoff and conserve total mass."""
    from tabbyray.ops.web import host_pagerank
    ds, _ = link_pages
    b = host_pagerank(ds, mode="broadcast").to_pandas().set_index("node")["r"]
    j = host_pagerank(ds, mode="join").to_pandas().set_index("node")["r"]
    assert set(b.index) == set(j.index)
    assert (b.sort_index() - j.sort_index()).abs().max() < 1e-12
    assert abs(b.sum() - 1.0) < 1e-9


def test_capture_diff_classes(captures):
    """Snapshot diff statuses match an independent pandas recompute."""
    from tabbyray.ops.web import capture_diff
    ds, raw = captures
    split = 1_735_689_600_000_000 + 1_125 * 1_000_000
    got = capture_diff(ds, split).to_pandas()
    df = raw.copy()
    df["canon"] = df["url"].map(_canon_py)
    df["ts_us"] = df["warc_ts"].astype("int64")
    def latest(side):
        s = (side.sort_values(["ts_us", "url"], ascending=[False, True])
             .drop_duplicates("canon"))
        return s.set_index("canon")[["ts_us", "content_len"]]
    a = latest(df[df.ts_us < split]); b = latest(df[df.ts_us >= split])
    assert len(got) == len(set(a.index) | set(b.index))
    gm = got.set_index("canon_url")
    for c in gm.index:
        in_a, in_b = c in a.index, c in b.index
        want = ("added" if not in_a else "gone" if not in_b else
                "unchanged" if a.loc[c, "content_len"] == b.loc[c, "content_len"]
                else "changed")
        assert gm.loc[c, "status"] == want
        assert gm.loc[c, "a_ts_us"] == (a.loc[c, "ts_us"] if in_a else -1)
        assert gm.loc[c, "b_len"] == (b.loc[c, "content_len"] if in_b else -1)


def test_host_components_communities(ray_session):
    """The 5-community fixture yields exactly 5 clusters; every member
    host's community (by generator rule) matches its cluster mates."""
    from tabbyray.fixtures import ensure_link_fixture
    from tabbyray.ops.web import host_components
    ds = rd.read_parquet(ensure_link_fixture(communities=5),
                         override_num_blocks=4)
    hc = host_components(ds, num_partitions=8).to_pandas()
    assert hc.component.nunique() == 5
    # rep is the lexicographic min of its cluster and a member of it
    for rep, grp in hc.groupby("component"):
        assert rep == grp.host.min()


def test_parse_robots_rules_semantics(ray_session):
    """Group boundaries, decoy groups, non-/ rules and noise directives
    all handled on a hand-built robots corpus."""
    import pyarrow as pa
    from tabbyray.ops.web import parse_robots_rules
    txt_a = "\n".join([
        "# comment",
        "User-agent: evilbot",
        "Disallow: /",                 # decoy group: ignored
        "",
        "User-agent: *",
        "Disallow: /private",
        "Allow: /private/ok",
        "Crawl-delay: 5",              # noise: ignored
        "Sitemap: https://a.example/s.xml",
        "Disallow: nope",              # no leading '/': ignored
        "",
        "User-agent: otherbot",
        "Allow: /x",                   #later group: ignored
    ])
    txt_b = "User-agent: *\nDisallow: /"
    t = pa.table({"host": ["a.example", "b.example"],
                  "robots_txt": [txt_a, txt_b]})
    got = parse_robots_rules(rd.from_arrow(t)).to_pandas()
    rows = set(map(tuple, got[["host", "rule_path", "allow"]].to_numpy()))
    assert rows == {("a.example", "/private", 0),
                    ("a.example", "/private/ok", 1),
                    ("b.example", "/", 0)}


def test_robots_gate_rules(ray_session):
    """Longest-prefix wins; Allow beats Disallow on equal length;
    missing robots file and unmatched paths default to allowed."""
    import pyarrow as pa
    from tabbyray.ops.web import robots_gate
    robots = pa.table({
        "host": ["a.example"],
        "robots_txt": ["User-agent: *\nDisallow: /p\nAllow: /p/ok\n"
                       "Allow: /q\nDisallow: /q"],
    })
    pages = pa.table({"url": [
        "https://a.example/p/secret",     # /p disallow
        "https://a.example/p/ok/file",    # longer allow wins
        "https://a.example/q/x",          # equal length: allow wins tie
        "https://a.example/free",         # no matching rule
        "https://b.example/p/anything",   # no robots file
    ]})
    got = robots_gate(rd.from_arrow(pages), rd.from_arrow(robots),
                      num_partitions=4).to_pandas()
    m = got.set_index("canon_url")
    assert m.loc["https://a.example/p/secret", "allowed"] == 0
    assert m.loc["https://a.example/p/secret", "rule_path"] == "/p"
    assert m.loc["https://a.example/p/ok/file", "allowed"] == 1
    assert m.loc["https://a.example/p/ok/file", "rule_path"] == "/p/ok"
    assert m.loc["https://a.example/q/x", "allowed"] == 1
    assert m.loc["https://a.example/free", "allowed"] == 1
    assert m.loc["https://a.example/free", "rule_path"] == ""
    assert m.loc["https://b.example/p/anything", "allowed"] == 1


def test_visible_text_strip_chain(ray_session):
    """Script/style/comment bodies vanish, tags become spaces, entity
    decode order keeps &amp;lt; literal, whitespace collapses."""
    import pyarrow as pa
    from tabbyray.ops.web import visible_text
    html = ("<!doctype html><body><p class=\"c\">Hello\n\t world</p>"
            "<script type=\"x\">var s = '<p>not text</p>';</script>"
            "<style>.c { color: red }</style>"
            "<!-- secret\ncomment --><div>A &amp;lt; B &amp; C&nbsp;D"
            "<b>bold</b>ed</div></body>")
    t = pa.table({"url": ["https://e.example/1"], "html": [html]})
    got = visible_text(rd.from_arrow(t)).to_pandas()
    assert got.loc[0, "text"] == "Hello world A &lt; B & C D bold ed"
    assert got.loc[0, "text_chars"] == len(got.loc[0, "text"])
    assert got.loc[0, "html_chars"] == len(html)
    assert "secret" not in got.loc[0, "text"]
    assert "not text" not in got.loc[0, "text"]
    assert "red" not in got.loc[0, "text"]


def test_extract_anchor_texts(ray_session):
    """Only canonical-serialization anchors with the full '">text</a>'
    close yield a row; text may not span '<'."""
    import pyarrow as pa
    from tabbyray.ops.web import extract_anchor_texts
    html = ('<a href="/a">first link</a> noise '
            '<a href="/b">second</a>'
            '<a href="/c">broken <b>mark</b></a>'   # '<' in text: dropped
            '<a href="/d" class="x">attr</a>'        # non-canonical: dropped
            '<a href="/e"></a>')                     # empty text: kept
    t = pa.table({"url": ["http://h.example/p/q"], "html": [html]})
    got = extract_anchor_texts(rd.from_arrow(t)).to_pandas()
    assert (sorted(zip(got["href"], got["anchor_text"]))
            == [("/a", "first link"), ("/b", "second"), ("/e", "")])


def test_anchor_text_rollup_counts(link_pages):
    """Rollup equals an independent re.findall + python-dict recount
    through the same resolution (resolve_hrefs is itself unit-tested)."""
    import re
    from collections import Counter
    from tabbyray.ops.web import anchor_text_rollup, resolve_hrefs
    import pyarrow as pa
    ds, raw = link_pages
    got = anchor_text_rollup(ds, num_partitions=4).to_pandas()
    # reference: extract (url, href, text), resolve via the op itself
    # on the exploded table, then count pairs in python
    rows = []
    for r in raw.itertuples():
        for h, txt in re.findall(r'<a href="([^"]*)">([^<]*)</a>', r.html):
            rows.append((r.url, h, txt))
    t = pa.table({"url": [r[0] for r in rows],
                  "href": [r[1] for r in rows],
                  "anchor_text": [r[2] for r in rows]})
    res = resolve_hrefs(rd.from_arrow(t),
                        carry_cols=["anchor_text"]).to_pandas()
    want = Counter(zip(res["dst_canon"], res["anchor_text"]))
    have = {(r.dst_canon, r.anchor_text): r.n_links
            for r in got.itertuples()}
    assert have == dict(want)


def test_url_indegree(link_pages):
    """Totals and exact distincts vs a pandas groupby recount over the
    op's own resolved-link table."""
    from tabbyray.ops.web import resolve_links, url_indegree
    ds, _raw = link_pages
    got = url_indegree(ds, num_partitions=4).to_pandas()
    links = resolve_links(ds).to_pandas()
    links["src_host"] = links["src_canon"].str.extract(
        r"^[a-z]+://([^/:?]+)")[0]
    want = links.groupby("dst_canon").agg(
        n_inlinks=("src_canon", "size"),
        n_src_urls=("src_canon", "nunique"),
        n_src_hosts=("src_host", "nunique")).reset_index()
    g = got.sort_values("dst_canon").reset_index(drop=True)
    w = want.sort_values("dst_canon").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g[["dst_canon", "n_inlinks", "n_src_urls", "n_src_hosts"]], w,
        check_dtype=False)


def test_anchor_entity_linking_semantics(ray_session):
    """Hand-crafted page + label table: decorations erased by
    normalization, duplicate same-norm labels collapse (no double
    vote), ambiguous surface forms vote for both entities, top-1
    breaks ties by (votes desc, entity asc), ''-norm anchors drop."""
    import pyarrow as pa
    from tabbyray.ops.web import (anchor_entity_candidates,
                                  anchor_entity_top1)
    html = (
        '<a href="http://t.example/a">Santa Fe</a>'
        '<a href="http://t.example/a">  SANTA  FE! </a>'   # same norm
        '<a href="http://t.example/a">Delta Corp</a>'      # ambiguous
        '<a href="http://t.example/b">delta  corp.</a>'    # same norm
        '<a href="http://t.example/b">***</a>'             # '' norm
        '<a href="http://t.example/b">nomatch text</a>')
    pages = rd.from_arrow(pa.table(
        {"url": ["http://h.example/p"], "html": [html]}))
    labels = rd.from_arrow(pa.table({
        "entity": ["E1", "E1", "E2", "E3"],
        "label": ["Santa Fe", "SANTA FE",      # same norm: must collapse
                  "Delta Corp", "DELTA corp"]}))  # same-norm pair
    cand = (anchor_entity_candidates(pages, labels, num_partitions=4)
            .to_pandas())
    got = {(r.dst_canon, r.entity): r.votes for r in cand.itertuples()}
    assert got == {
        ("http://t.example/a", "E1"): 2,   # two anchors, one label norm
        ("http://t.example/a", "E2"): 1,
        ("http://t.example/a", "E3"): 1,
        ("http://t.example/b", "E2"): 1,
        ("http://t.example/b", "E3"): 1,
    }
    top = (anchor_entity_top1(pages, labels, num_partitions=4)
           .to_pandas().set_index("dst_canon"))
    assert top.loc["http://t.example/a", "entity"] == "E1"   # most votes
    assert top.loc["http://t.example/b", "entity"] == "E2"   # tie: asc


def test_host_hits_paths_agree(link_pages):
    """String-node HITS: broadcast and join paths agree to float
    roundoff; each score vector is L1-normalized."""
    from tabbyray.ops.web import host_hits
    ds, _ = link_pages
    b = host_hits(ds, mode="broadcast").to_pandas().set_index("node")
    j = host_hits(ds, mode="join").to_pandas().set_index("node")
    assert set(b.index) == set(j.index)
    for c in ("auth", "hub"):
        assert (b[c].sort_index() - j[c].sort_index()).abs().max() < 1e-12
        assert abs(b[c].sum() - 1.0) < 1e-9


def test_entity_cooccurrence_pmi(ray_session):
    """Hand-computed PMI on 4 pages: once-per-page counting, e1<e2
    ordering, min_count filter."""
    import math
    import pyarrow as pa
    from tabbyray.ops.web import entity_cooccurrence

    def page(*texts):
        return "".join(f'<a href="/x">{t}</a>' for t in texts)

    pages = rd.from_arrow(pa.table({
        "url": [f"http://h.example/p{i}" for i in range(4)],
        "html": [page("Aaa", "Bbb", "aaa"),    # A,B (A once despite 2 anchors)
                 page("Aaa", "Bbb"),           # A,B
                 page("Aaa", "Ccc"),           # A,C
                 page("Ddd")],                 # D alone
    }))
    labels = rd.from_arrow(pa.table({
        "entity": ["A", "B", "C", "D"],
        "label": ["Aaa", "Bbb", "Ccc", "Ddd"]}))
    got = (entity_cooccurrence(pages, labels, num_partitions=4)
           .to_pandas().set_index(["e1", "e2"]).sort_index())
    # N=4; n_A=3 n_B=2 n_C=1; pairs: (A,B):2, (A,C):1
    assert set(got.index) == {("A", "B"), ("A", "C")}
    ab = got.loc[("A", "B")]
    assert (ab["n_pair"], ab["n_e1"], ab["n_e2"]) == (2, 3, 2)
    assert abs(ab["pmi"] - math.log(4 * 2 / (3 * 2))) < 1e-12
    ac = got.loc[("A", "C")]
    assert abs(ac["pmi"] - math.log(4 * 1 / (3 * 1))) < 1e-12
    # min_count=2 drops the single-page pair
    got2 = (entity_cooccurrence(pages, labels, min_count=2,
                                num_partitions=4).to_pandas())
    assert set(zip(got2["e1"], got2["e2"])) == {("A", "B")}


def test_url_quality_features(ray_session):
    """Hand-computed features incl. the suspicious composite."""
    import pyarrow as pa
    from tabbyray.ops.web import url_quality_features
    urls = [
        "https://a.b.example.com/x/y?p=1&q=2",
        "http://h0st123456.net:8080/a/b/c/d/e/f/g",       # digits+depth
        "https://ok.example.com/",
    ]
    got = (url_quality_features(rd.from_arrow(
        pa.table({"url": urls}))).to_pandas().set_index("url"))
    r0 = got.loc[urls[0]]
    assert (r0["host_dots"], r0["path_depth"], r0["n_query_params"],
            r0["nondefault_port"], r0["suspicious"]) == (3, 2, 2, 0, 0)
    r1 = got.loc[urls[1]]
    assert (r1["host_digits"], r1["path_depth"],
            r1["nondefault_port"], r1["suspicious"]) == (7, 7, 1, 1)
    r2 = got.loc[urls[2]]
    assert (r2["n_query_params"], r2["suspicious"]) == (0, 0)


def test_domain_blocklist_gate(ray_session):
    """Registered-domain anti/semi gate; blocklist case-insensitive."""
    import pyarrow as pa
    from tabbyray.ops.web import domain_blocklist_gate
    pages = rd.from_arrow(pa.table({"url": [
        "https://www.spam.example/x",
        "https://sub.deep.spam.example/y",    # same registered domain
        "http://clean.org/z"]}))
    bl = rd.from_arrow(pa.table({"domain": ["SPAM.example"]}))
    ok = domain_blocklist_gate(pages, bl, keep="allowed").to_pandas()
    assert list(ok["url"]) == ["http://clean.org/z"]
    bad = domain_blocklist_gate(pages, bl, keep="blocked").to_pandas()
    assert sorted(bad["url"]) == ["https://sub.deep.spam.example/y",
                                  "https://www.spam.example/x"]


def test_crawl_frontier_and_schedule(ray_session):
    """Captured targets leave the frontier (matched on CANONICAL form);
    per-host slots are 1-based by (inlinks desc, url asc)."""
    import pyarrow as pa
    from tabbyray.ops.web import crawl_frontier, fetch_schedule
    pages = rd.from_arrow(pa.table({
        "url": ["https://A.example:443/p1",     # canon https://a.example/p1
                "https://b.example/p2"],
        "html": [
            # p1 links: captured p2 (drops), new x twice, new y once
            '<a href="https://b.example/p2">t</a>'
            '<a href="https://c.example/x">t</a>'
            '<a href="https://c.example/x#f">t</a>'
            '<a href="https://c.example/y">t</a>',
            # p2 links: CAPTURED p1 via a raw variant (drops), new z
            '<a href="https://a.example:443/p1">t</a>'
            '<a href="https://d.example/z">t</a>'],
    }))
    fr = crawl_frontier(pages).to_pandas().set_index("dst_canon")
    assert fr["n_inlinks"].to_dict() == {
        "https://c.example/x": 2, "https://c.example/y": 1,
        "https://d.example/z": 1}
    sched = fetch_schedule(pages).to_pandas().set_index("dst_canon")
    assert sched.loc["https://c.example/x", "slot"] == 1   # 2 inlinks
    assert sched.loc["https://c.example/y", "slot"] == 2
    assert sched.loc["https://d.example/z", "slot"] == 1   # own host
    assert sched.loc["https://c.example/x", "host"] == "c.example"


def test_reciprocal_host_edges(ray_session):
    """Only both-way pairs survive; counts keep their direction
    relative to the sorted (host_a < host_b) orientation."""
    import pyarrow as pa
    from tabbyray.ops.web import reciprocal_host_edges
    pages = rd.from_arrow(pa.table({
        "url": ["http://a.x/p", "http://b.x/p", "http://c.x/p"],
        "html": [
            '<a href="http://b.x/1">t</a><a href="http://b.x/2">t</a>'
            '<a href="http://c.x/1">t</a>',      # a->b x2, a->c x1
            '<a href="http://a.x/1">t</a>',      # b->a x1
            ''],                                 # c links nowhere
    }))
    got = reciprocal_host_edges(pages).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["host_a"], r["host_b"], r["ab_links"], r["ba_links"]) \
        == ("a.x", "b.x", 2, 1)


def test_page_blocks_and_templates(ray_session):
    """Strip-before-split contract (a <div> inside a script string
    must NOT sever the script body), entity decode, the >= 50%
    boundary and the min_pages floor."""
    import pyarrow as pa
    from tabbyray.ops.web import host_template_blocks, page_blocks
    mk = lambda *bs: "<html><body>" + "".join(bs) + "</body></html>"
    hdr = '<div>Header &amp; nav</div>'
    scr = '<script>var x = "<div>ghost</div>";</script>'
    pages = rd.from_arrow(pa.table({
        "url": [f"https://h.example/p{i}" for i in range(4)]
        + ["https://solo.example/p0"],
        "html": [mk(hdr, scr, "<p>unique one</p>"),
                 mk(hdr, scr, "<li>unique two</li>"),
                 mk(hdr, "<p>promo block</p>"),
                 mk(hdr, "<p>promo block</p>"),   # promo on 2/4 = 50%
                 mk("<p>alone</p>")],
    }))
    pb = page_blocks(pages).to_pandas()
    assert "ghost" not in " ".join(pb["block"])        # script survived split
    assert (pb["block"] == "Header & nav").sum() == 4  # entity decoded
    ht = (host_template_blocks(pages, num_partitions=4)
          .to_pandas().set_index("block"))
    assert ht.loc["Header & nav", "n_pages_with"] == 4
    assert ht.loc["promo block", "n_pages_with"] == 2  # exactly 50% kept
    assert "unique one" not in ht.index
    assert "alone" not in ht.index                     # min_pages floor


def test_url_strip_tracking(ray_session):
    """Position cases (first/middle/last/only/none), empty values,
    canonicalization of the rebuilt URL, clean pass-through."""
    import pyarrow as pa
    from tabbyray.ops.web import url_strip_tracking
    cases = {
        "https://A.example/p?utm_source=x&q=1": "https://a.example/p?q=1",
        "https://a.example/p?q=1&utm_medium=&id=2":
            "https://a.example/p?q=1&id=2",
        "https://a.example/p?q=1&gclid=g": "https://a.example/p?q=1",
        "https://a.example/p?fbclid=f": "https://a.example/p",
        "https://a.example:443/p?ref=r#top": "https://a.example/p",
        "http://a.example:8080/p?q=1": "http://a.example:8080/p?q=1",
        "https://a.example/p": "https://a.example/p",
        # 'ref' matches only as a FULL name: 'referrer' is kept
        "https://a.example/p?referrer=x": "https://a.example/p?referrer=x",
    }
    got = (url_strip_tracking(rd.from_arrow(
        pa.table({"url": list(cases)}))).to_pandas())
    assert dict(zip(got["url"], got["clean_url"])) == cases


def test_latest_capture_clean_and_sitemaps(ray_session):
    """Campaign variants collapse to one latest capture; sitemap lines
    extract case-insensitively regardless of group position."""
    import pyarrow as pa
    from tabbyray.ops.web import latest_capture_clean, robots_sitemaps
    pages = rd.from_arrow(pa.table({
        "url": ["https://a.x/p?utm_source=1&q=1",
                "https://a.x/p?q=1&gclid=g",
                "https://a.x/p?q=1",
                "https://a.x/other"],
        "warc_ts": [100, 300, 200, 50]}))
    got = (latest_capture_clean(pages).to_pandas()
           .set_index("clean_url"))
    assert len(got) == 2
    assert got.loc["https://a.x/p?q=1", "ts_us"] == 300
    assert got.loc["https://a.x/p?q=1", "url"] == "https://a.x/p?q=1&gclid=g"
    robots = rd.from_arrow(pa.table({
        "host": ["h1", "h2"],
        "robots_txt": ["User-agent: *\nSITEMAP: https://h1/s.xml\n"
                       "Disallow: /x\nsitemap:\thttps://h1/s2.xml",
                       "User-agent: bot\nDisallow: /"]}))
    sm = robots_sitemaps(robots).to_pandas()
    assert sorted(sm["sitemap_url"]) == ["https://h1/s.xml",
                                         "https://h1/s2.xml"]


def test_anchor_entity_paths_agree(ray_session):
    """Broadcast and forced-join label-side plans produce identical
    candidate sets on the fixture."""
    import os
    import pyarrow.parquet  # noqa: F401
    from tabbyray.fixtures import ensure_anchor_entity_fixture
    from tabbyray.ops.web import anchor_entity_candidates
    fix = ensure_anchor_entity_fixture()
    pages = rd.read_parquet(os.path.join(fix, "pages.parquet"),
                            override_num_blocks=4)
    labels = rd.read_parquet(os.path.join(fix, "labels.parquet"),
                             override_num_blocks=2)
    key = ["dst_canon", "entity"]
    b = (anchor_entity_candidates(pages, labels, mode="broadcast",
                                  num_partitions=4)
         .to_pandas().sort_values(key).reset_index(drop=True))
    j = (anchor_entity_candidates(pages, labels, mode="join",
                                  num_partitions=4)
         .to_pandas().sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(b, j)



def test_curate_crawl_gates(ray_session):
    """Each gate individually excludes its crafted capture; the
    survivor collapses recrawls and dedups content keep-first."""
    import pyarrow as pa
    from tabbyray.ops.crawlpipe import curate_crawl
    # long enough that a single n-gram occurrence stays under the
    # Gopher coverage fractions (a short doc fails top-4 at count 1)
    good = ("<p>the quick brown fox and that dog have gone from the "
            "old mill to the wide river near this city</p>"
            "<p>people from the market would trade value and data "
            "with those that came from the house by the river</p>")
    mk = lambda b: "<html><body><!-- x -->" + b + "</body></html>"
    pages = rd.from_arrow(pa.table({
        "url": [
            "https://ok.example/a?utm_source=1",    # good, variant 1
            "https://ok.example/a",                  # good, variant 2 (later)
            "https://ok.example/dup",                # same content as /a
            "https://blocked.bad/x",                 # blocked domain
            "https://ok.example/private/p",          # robots-disallowed
            "https://ok.example/short",              # fails quality
            "https://ok.example/ru",                 # cyrillic
        ],
        "warc_ts": [100, 200, 300, 400, 500, 600, 700],
        "html": [mk(good), mk(good), mk(good),
                 mk(good), mk(good),
                 mk("<p>tiny doc</p>"),
                 mk("<p>это русский текст про реку и город и мост "
                    "и долину и берег и лес</p>")],
    }))
    robots = rd.from_arrow(pa.table({
        "host": ["ok.example"],
        "robots_txt": ["User-agent: *\nDisallow: /private"]}))
    bl = rd.from_arrow(pa.table({"domain": ["blocked.bad"]}))
    got = curate_crawl(pages, robots, bl, num_partitions=4).to_pandas()
    # only the deduped good doc survives; keep-first by clean_url:
    # 'https://ok.example/a' < 'https://ok.example/dup'
    assert list(got["clean_url"]) == ["https://ok.example/a"]
    assert got.iloc[0]["n_words"] == 39
    assert got.iloc[0]["text"].startswith("the quick brown fox")


def test_graph_analytics_hand_graph(ray_session):
    """triangle_counts / clustering_coefficients / adamic_adar against
    a hand-computed 6-node graph (two triangles sharing edge b-c, a
    pendant, a disconnected edge):

        a-b, a-c, b-c, b-d, c-d, d-e, f-g

    triangles: (a,b,c) and (b,c,d); deg: a2 b3 c3 d3 e1 f1 g1."""
    import math

    from tabbyray.ops.graph import (adamic_adar, clustering_coefficients,
                                    triangle_counts)
    edges = rd.from_items([
        {"src": "a", "dst": "b"}, {"src": "c", "dst": "a"},
        {"src": "b", "dst": "c"}, {"src": "b", "dst": "d"},
        {"src": "d", "dst": "c"}, {"src": "d", "dst": "e"},
        {"src": "g", "dst": "f"},
        # noise: dup edge both ways + self-loop, must not change counts
        {"src": "b", "dst": "a"}, {"src": "a", "dst": "a"},
    ])
    tri = triangle_counts(edges).to_pandas().set_index("node")[
        "n_triangles"].to_dict()
    assert tri == {"a": 1, "b": 2, "c": 2, "d": 1, "e": 0,
                   "f": 0, "g": 0}

    cc = clustering_coefficients(edges).to_pandas().set_index("node")
    assert cc.loc["a", "deg"] == 2 and cc.loc["b", "deg"] == 3
    assert cc.loc["a", "clustering"] == pytest.approx(1.0)       # 2*1/(2*1)
    assert cc.loc["b", "clustering"] == pytest.approx(2 * 2 / 6)
    assert cc.loc["d", "clustering"] == pytest.approx(2 * 1 / 6)
    assert cc.loc["e", "clustering"] == 0.0

    aa = adamic_adar(edges).to_pandas()
    aa = aa.set_index(["node_a", "node_b"]).sort_index()
    # non-adjacent pairs with common neighbors:
    #   (a,d): via b(3), c(3)  (b,e)/(c,e): via d(3)  (a,e): none
    assert set(aa.index) == {("a", "d"), ("b", "e"), ("c", "e")}
    assert aa.loc[("a", "d"), "common_neighbors"] == 2
    assert aa.loc[("a", "d"), "adamic_adar"] == pytest.approx(
        2 / math.log(3))
    assert aa.loc[("b", "e"), "adamic_adar"] == pytest.approx(
        1 / math.log(3))

    # supernode cut: capping pivot degree at 2 leaves only a/e/f/g as
    # pivots — a's single wedge (b, c) is adjacent, so no pair at all
    aa_cap = adamic_adar(edges, max_pivot_degree=2).to_pandas()
    assert len(aa_cap) == 0


def test_strip_template_blocks_and_doc_line_dedup(ray_session):
    """strip_template_blocks: the shared footer drops from every page
    of the host, unique content stays in order, the all-template page
    disappears. doc_line_dedup: within-doc keep-first."""
    from tabbyray.ops.dedup import doc_line_dedup
    from tabbyray.ops.web import strip_template_blocks
    foot = "<p>copyright footer</p>"
    pages = rd.from_items([
        {"url": "http://h.com/1",
         "html": f"<p>alpha one</p><p>beta</p>{foot}"},
        {"url": "http://h.com/2", "html": f"<p>gamma</p>{foot}"},
        {"url": "http://h.com/3", "html": foot},
        {"url": "http://other.org/1",
         "html": "<p>copyright footer</p><p>solo</p>"},
    ])
    got = strip_template_blocks(pages, min_pct=50, min_pages=2) \
        .to_pandas().set_index("url")
    assert got.loc["http://h.com/1", "text"] == "alpha one\nbeta"
    assert got.loc["http://h.com/2", "text"] == "gamma"
    assert "http://h.com/3" not in got.index      # all-template page
    # other.org has <2 pages: its footer is NOT a template there
    assert got.loc["http://other.org/1", "text"] \
        == "copyright footer\nsolo"

    docs = rd.from_items([
        {"doc_id": 0, "text": "a\nb\na\nc\nb"},
        {"doc_id": 1, "text": "x"},
    ])
    dd = doc_line_dedup(docs).to_pandas().set_index("doc_id")
    assert dd.loc[0, "text"] == "a\nb\nc"
    assert dd.loc[0, "n_kept"] == 3 and dd.loc[0, "n_dropped"] == 2
    assert dd.loc[1, "text"] == "x" and dd.loc[1, "n_dropped"] == 0


def test_assortativity_and_kcore(ray_session):
    """degree_assortativity against numpy's corrcoef on the
    symmetrized endpoint-degree pairs; kcore_nodes against an
    independent iterative peel on a graph with a clear 2-core."""
    import numpy as np

    from tabbyray.ops.graph import degree_assortativity, kcore_nodes
    # triangle a-b-c (the 2-core) + pendant chain c-d, d-e
    edges = rd.from_items([
        {"src": "a", "dst": "b"}, {"src": "b", "dst": "c"},
        {"src": "a", "dst": "c"}, {"src": "c", "dst": "d"},
        {"src": "d", "dst": "e"},
    ])
    got = degree_assortativity(edges).to_pandas()
    deg = {"a": 2, "b": 2, "c": 3, "d": 2, "e": 1}
    xs, ys = [], []
    for u, v in [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"),
                 ("d", "e")]:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    want = np.corrcoef(xs, ys)[0, 1]
    assert got.loc[0, "n_edges"] == 5
    assert got.loc[0, "assortativity"] == pytest.approx(want, abs=1e-9)

    core = kcore_nodes(edges, k=2).to_pandas().set_index("node")
    # peel: e drops (deg 1) -> d drops (deg falls to 1) -> {a,b,c}
    assert set(core.index) == {"a", "b", "c"}
    assert core["deg"].tolist() == [2, 2, 2]

    # fixed-depth contract: after ONE round only e is gone and d
    # still shows its round-1 degree-2 survival
    r1 = kcore_nodes(edges, k=2, max_rounds=1).to_pandas()
    assert set(r1["node"]) == {"a", "b", "c", "d"}

    # k larger than any degree -> empty core with a stable schema
    empty = kcore_nodes(edges, k=99).to_pandas()
    assert len(empty) == 0


def test_weighted_pagerank_paths_and_semantics(ray_session):
    """Weighted pagerank: broadcast and join paths agree; a node that
    receives the heavier edge outranks the lighter target; weight 1
    everywhere reduces to the unweighted result exactly."""
    import pyarrow as pa
    from tabbyray.ops.graph import pagerank
    edges = rd.from_items(
        # a sends 9 votes to b, 1 to c: b must outrank c
        [{"src": "a", "dst": "b", "w": 9}, {"src": "a", "dst": "c", "w": 1},
         {"src": "b", "dst": "a", "w": 1}, {"src": "c", "dst": "a", "w": 1}])
    b = pagerank(edges, weight_col="w", mode="broadcast",
                 node_dtype=pa.string()).to_pandas().set_index("node")["r"]
    j = pagerank(edges, weight_col="w", mode="join",
                 node_dtype=pa.string()).to_pandas().set_index("node")["r"]
    assert (b.sort_index() - j.sort_index()).abs().max() < 1e-12
    assert b["b"] > b["c"]

    ones = rd.from_items(
        [{"src": "a", "dst": "b", "w": 1}, {"src": "a", "dst": "c", "w": 1},
         {"src": "b", "dst": "a", "w": 1}, {"src": "c", "dst": "a", "w": 1}])
    wu = pagerank(ones, weight_col="w", node_dtype=pa.string()) \
        .to_pandas().set_index("node")["r"].sort_index()
    uw = pagerank(ones, node_dtype=pa.string()).to_pandas() \
        .set_index("node")["r"].sort_index()
    assert (wu - uw).abs().max() < 1e-12


def test_weighted_hits_reduces_and_ranks(ray_session):
    """Weighted HITS: weight-1 edges reduce to the unweighted result
    exactly; a heavier edge pulls authority toward its target."""
    import pyarrow as pa

    from tabbyray.ops.graph import hits
    ones = rd.from_items(
        [{"src": "a", "dst": "b", "w": 1}, {"src": "a", "dst": "c", "w": 1},
         {"src": "b", "dst": "c", "w": 1}])
    wu = hits(ones, weight_col="w", node_dtype=pa.string()) \
        .to_pandas().set_index("node").sort_index()
    uw = hits(ones, node_dtype=pa.string()) \
        .to_pandas().set_index("node").sort_index()
    assert (wu["auth"] - uw["auth"]).abs().max() < 1e-12
    assert (wu["hub"] - uw["hub"]).abs().max() < 1e-12

    skew = rd.from_items(
        [{"src": "a", "dst": "b", "w": 9}, {"src": "a", "dst": "c", "w": 1}])
    w = hits(skew, weight_col="w", node_dtype=pa.string()) \
        .to_pandas().set_index("node")
    assert w.loc["b", "auth"] > w.loc["c", "auth"]


def test_ktruss_hand_graph(ray_session):
    """ktruss_edges: two triangles sharing edge b-c + pendant d-e.
    3-truss = the 5 triangle edges (shared edge support 2); 4-truss =
    empty (dropping support-1 edges dissolves both triangles); k < 3
    raises."""
    from tabbyray.ops.graph import ktruss_edges
    edges = rd.from_items([
        {"src": "a", "dst": "b"}, {"src": "b", "dst": "c"},
        {"src": "a", "dst": "c"}, {"src": "b", "dst": "d"},
        {"src": "c", "dst": "d"}, {"src": "d", "dst": "e"}])
    t3 = ktruss_edges(edges, k=3).to_pandas()
    got = {(r.a, r.b): r.support for r in t3.itertuples()}
    assert got == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 2,
                   ("b", "d"): 1, ("c", "d"): 1}
    assert len(ktruss_edges(edges, k=4).to_pandas()) == 0
    with pytest.raises(ValueError):
        ktruss_edges(edges, k=2)


def test_bfs_layers_path_graph(ray_session):
    """Min-hop depths on a path graph with a disconnected pair; depth
    capped at max_depth; seeds absent from the graph emit depth 0."""
    from tabbyray.ops.graph import bfs_layers
    edges = rd.from_items(
        [{"src": s, "dst": d} for s, d in
         [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
          ("f", "g"), ("b", "a")]])
    seeds = rd.from_items([{"node": "a"}, {"node": "zz"}])
    got = sorted((r["node"], r["depth"])
                 for r in bfs_layers(edges, seeds, 2,
                                     num_partitions=4).take_all())
    assert got == [("a", 0), ("b", 1), ("c", 2), ("zz", 0)]


def _lp_reference(edge_list, nodes, rounds):
    """Pure-python synchronous mode-label propagation (ties -> min)."""
    from collections import Counter
    adj = {n: set() for n in nodes}
    for a, b in edge_list:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    lbl = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n, nb in adj.items():
            if not nb:
                new[n] = lbl[n]
                continue
            c = Counter(lbl[m] for m in nb)
            top = max(c.values())
            new[n] = min(l for l, k in c.items() if k == top)
        lbl = new
    return lbl


def test_label_propagation_two_triangles(ray_session):
    """3-round sync LP on two triangles joined by a bridge matches the
    pure-python reference; the isolated node keeps its own label."""
    from tabbyray.ops.graph import label_propagation
    el = [("a", "b"), ("b", "c"), ("a", "c"),
          ("d", "e"), ("e", "f"), ("d", "f"), ("c", "d")]
    edges = rd.from_items([{"src": s, "dst": d} for s, d in el])
    nodes = rd.from_items([{"node": n} for n in "abcdefh"])
    got = {r["node"]: r["lbl"]
           for r in label_propagation(edges, nodes, n_rounds=3,
                                      num_partitions=4).take_all()}
    assert got == _lp_reference(el, list("abcdefh"), 3)


def test_host_bfs_and_communities(ray_session):
    """Host-graph wrappers against pure-python references computed
    from the (already-oracled) host_edges rollup."""
    from tabbyray.fixtures import ensure_link_fixture
    from tabbyray.ops.web import (host_bfs_depth, host_communities,
                                  host_edges)
    ds = rd.read_parquet(ensure_link_fixture(), override_num_blocks=4)
    he = host_edges(ds, num_partitions=8).to_pandas()
    pairs = [(a, b) for a, b in zip(he.src_host, he.dst_host)]
    nodes = sorted({h for p in pairs for h in p})
    adj = {n: set() for n in nodes}
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)

    seeds = nodes[:2]
    depth = {s: 0 for s in seeds}
    frontier = list(seeds)
    for d in (1, 2, 3):
        frontier = sorted({m for n in frontier for m in adj[n]
                           if m not in depth})
        depth.update({m: d for m in frontier})
    got = {r["host"]: r["depth"]
           for r in host_bfs_depth(ds, max_depth=3,
                                   num_partitions=8).take_all()}
    assert got == depth

    want = _lp_reference(pairs, nodes, 3)
    gotc = {r["host"]: r["community"]
            for r in host_communities(ds, n_rounds=3,
                                      num_partitions=8).take_all()}
    assert gotc == want


def test_bfs_directed_vs_undirected(ray_session):
    """directed=True follows src->dst only: on a directed path a->b->c
    plus c->d, seeds {c} reach {c,d} directed but {a,b,c,d} undirected."""
    from tabbyray.ops.graph import bfs_layers
    edges = rd.from_items([{"src": s, "dst": d} for s, d in
                           [("a", "b"), ("b", "c"), ("c", "d")]])
    seeds = rd.from_items([{"node": "c"}])
    got_d = sorted((r["node"], r["depth"])
                   for r in bfs_layers(edges, seeds, 3, directed=True,
                                       num_partitions=4).take_all())
    assert got_d == [("c", 0), ("d", 1)]
    got_u = sorted((r["node"], r["depth"])
                   for r in bfs_layers(edges, seeds, 3,
                                       num_partitions=4).take_all())
    assert got_u == [("a", 2), ("b", 1), ("c", 0), ("d", 1)]


def test_label_propagation_weighted_votes(ray_session):
    """A contested node whose neighbor labels tie unweighted (min
    label wins) flips to the heavy edge's label when weights count."""
    from tabbyray.ops.graph import label_propagation
    # round-1 vote at x over initial labels: a1=1, a2=1, b=1 (or w=3)
    el = [("x", "a1", 1), ("x", "a2", 1), ("x", "b", 3)]
    edges = rd.from_items([{"src": s, "dst": d, "w": w}
                           for s, d, w in el])
    nodes = rd.from_items([{"node": n} for n in ("x", "a1", "a2", "b")])
    unw = {r["node"]: r["lbl"]
           for r in label_propagation(edges, nodes, n_rounds=1,
                                      num_partitions=4).take_all()}
    assert unw["x"] == "a1"          # 3-way tie -> min label
    w = {r["node"]: r["lbl"]
         for r in label_propagation(edges, nodes, n_rounds=1,
                                    weight_col="w",
                                    num_partitions=4).take_all()}
    assert w["x"] == "b"             # weight 3 outvotes the 1s


def test_trustrank_modes_agree_and_decay(ray_session):
    """Seeded (TrustRank) ranks: broadcast and join plans agree to fp
    roundoff; seeds carry the teleport mass and a node with no inbound
    path from the seeds scores 0."""
    import numpy as np
    from tabbyray.ops.graph import pagerank
    el = [("s", "a"), ("a", "b"), ("b", "s"), ("z", "a")]
    edges = rd.from_items([{"src": x, "dst": y} for x, y in el])
    kw = dict(n_iter=3, node_dtype=__import__("pyarrow").string(),
              seeds=["s"], num_partitions=4)
    bc = {r["node"]: r["r"]
          for r in pagerank(edges, mode="broadcast", **kw).take_all()}
    jn = {r["node"]: r["r"]
          for r in pagerank(edges, mode="join", **kw).take_all()}
    assert set(bc) == set(jn) == {"s", "a", "b", "z"}
    for n in bc:
        assert abs(bc[n] - jn[n]) < 1e-12
    # z has no inbound edge and is not a seed -> zero trust
    assert bc["z"] == 0.0
    assert bc["s"] > bc["a"] > bc["b"] > 0


def test_graph_ops_degenerate_inputs(ray_session):
    """Empty edge sets and self-loop-only graphs: seeds still emit
    depth 0, nodes keep their own labels, the pair join is empty —
    nothing raises."""
    import pyarrow as pa

    from tabbyray.ops.graph import (bfs_layers, label_propagation,
                                    outlink_jaccard)
    empty = rd.from_arrow(pa.schema([("src", pa.string()),
                                     ("dst", pa.string())]).empty_table())
    seeds = rd.from_items([{"node": "a"}])
    assert bfs_layers(empty, seeds, 2, num_partitions=2).take_all() == \
        [{"node": "a", "depth": 0}]
    assert label_propagation(empty, seeds, n_rounds=2,
                             num_partitions=2).take_all() == \
        [{"node": "a", "lbl": "a"}]
    assert outlink_jaccard(empty, num_partitions=2).take_all() == []
    loops = rd.from_items([{"src": "x", "dst": "x"}])
    assert bfs_layers(loops, seeds, 2, num_partitions=2).take_all() == \
        [{"node": "a", "depth": 0}]


def test_harmonic_centrality2_path_graph(ray_session):
    """Path a-b-c-d: harmonic2 = deg*1.0 + |dist==2|*0.5 per node;
    hand values 1.5 / 2.5 / 2.5 / 1.5. Isolated edge (f, g): 1.0."""
    from tabbyray.ops.graph import harmonic_centrality2
    edges = rd.from_items(
        [{"src": s, "dst": d} for s, d in
         [("a", "b"), ("b", "c"), ("c", "d"), ("f", "g"),
          ("b", "a")]])
    got = {r["node"]: r["harmonic2"]
           for r in harmonic_centrality2(edges,
                                         num_partitions=4).take_all()}
    assert got == {"a": 1.5, "b": 2.5, "c": 2.5, "d": 1.5,
                   "f": 1.0, "g": 1.0}


def test_random_walks_hand_rule(ray_session):
    """Every consecutive (seed, walk) pair follows a real directed
    edge; the chosen neighbor is exactly argmin md5("seed|walk|t|v")
    (hand-replayed); a sink stops the walk short; rerun is identical
    (hash-seeded determinism)."""
    import hashlib

    from tabbyray.ops.graph import random_walks
    edge_list = [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"),
                 ("c", "a"), ("c", "d")]  # d is a sink
    edges = rd.from_items(
        [{"src": s, "dst": d} for s, d in edge_list])
    adj = {}
    for s, d in edge_list:
        adj.setdefault(s, []).append(d)

    def replay(seed, walk, walk_len=3):
        path, cur = [(0, seed)], seed
        for t in range(1, walk_len + 1):
            if cur not in adj:
                break
            nxt = min(adj[cur], key=lambda v: (hashlib.md5(
                f"{seed}|{walk}|{t}|{v}".encode()).hexdigest(), v))
            path.append((t, nxt))
            cur = nxt
        return path

    rows = random_walks(edges, walk_len=3, n_walks=2,
                        num_partitions=4).take_all()
    got = {}
    for r in rows:
        got.setdefault((r["seed"], r["walk"]), []).append(
            (r["step"], r["node"]))
    # seeds = nodes with an out-edge (a, b, c), 2 walks each
    assert set(got) == {(s, w) for s in ("a", "b", "c") for w in (0, 1)}
    for (seed, walk), path in got.items():
        assert sorted(path) == replay(seed, walk)
    rows2 = random_walks(edges, walk_len=3, n_walks=2,
                         num_partitions=4).take_all()
    key = lambda r: (r["seed"], r["walk"], r["step"], r["node"])
    assert sorted(map(key, rows2)) == sorted(map(key, rows))


def test_walk_skipgram_pairs_window(ray_session):
    """Hand corpus: forward-window-2 pairs with counts; pairs never
    cross (seed, walk) boundaries."""
    from tabbyray.ops.graph import walk_skipgram_pairs
    walks = rd.from_items([
        {"seed": "a", "walk": 0, "step": 0, "node": "a"},
        {"seed": "a", "walk": 0, "step": 1, "node": "b"},
        {"seed": "a", "walk": 0, "step": 2, "node": "c"},
        {"seed": "a", "walk": 1, "step": 0, "node": "a"},
        {"seed": "a", "walk": 1, "step": 1, "node": "b"},
    ])
    got = sorted((r["center"], r["context"], r["cnt"])
                 for r in walk_skipgram_pairs(
                     walks, window=2, num_partitions=4).take_all())
    assert got == [("a", "b", 2), ("a", "c", 1), ("b", "c", 1)]


def test_scd2_versions_hand_case(ray_session):
    """Consecutive same-signature captures collapse; a return to an
    OLD signature opens a NEW version (type-2, not distinct-values);
    the last version stays open (valid_to = -1)."""
    import datetime

    import ray.data as rd

    from tabbyray.ops.web import scd2_versions

    t0 = datetime.datetime(2026, 1, 1)

    def at(m):
        return t0 + datetime.timedelta(minutes=m)

    caps = rd.from_items([
        {"url": "u", "warc_ts": at(0), "content_len": 10},
        {"url": "u", "warc_ts": at(1), "content_len": 10},   # same -> collapse
        {"url": "u", "warc_ts": at(2), "content_len": 20},   # change
        {"url": "u", "warc_ts": at(3), "content_len": 10},   # back -> NEW version
        {"url": "v", "warc_ts": at(5), "content_len": 7},
    ]).repartition(2)
    out = (scd2_versions(caps).to_pandas()
           .sort_values(["url", "valid_from_us"]).reset_index(drop=True))
    us = lambda m: int(at(m).timestamp() * 1_000_000)
    assert out[out.url == "u"][
        ["content_len", "valid_from_us", "valid_to_us", "n_captures"]
    ].values.tolist() == [
        [10, us(0), us(2), 2], [20, us(2), us(3), 1], [10, us(3), -1, 1]]
    assert out[out.url == "v"].valid_to_us.tolist() == [-1]

"""End-to-end crawl curation: the webtext flagship composition.

``curate_crawl`` chains the individually-oracled web/text primitives
into the pipeline a 100-TB pretraining crawl actually runs, in this
exact order (the SQL oracle mirrors it stage for stage):

1. **Domain gate** — registered domain NOT IN the (lowercased)
   blocklist; ONE co-partitioned hash ANTI join.
2. **Robots gate** — ``ops.web.robots_gate`` over the survivors
   (longest-matching-prefix, Allow wins ties, absent file -> allowed),
   keyed by the canonical URL; inner join keeps allowed captures.
3. **Recrawl collapse** — latest capture per TRACKING-STRIPPED clean
   URL (ts desc, raw url asc), html carried through the argmax
   combiner; campaign variants collapse here.
4. **Text extraction** — ``ops.web.visible_text`` strip chain.
5. **Quality gates** — Gopher quality AND Gopher repetition AND
   ``script_profile`` dominant == 'latin'; each op runs stateless
   over the same (doc_id=clean_url, text) table and the flags meet in
   co-partitioned joins (a production deployment would fuse the three
   stateless maps; the joins keep each gate's counters observable).
6. **Content dedup** — exact visible-text dedup, keep-FIRST by
   clean_url (constant order key + asc tie through grouped_argmax).

The pipeline is factored into TWO composable stages so the resumable
CLI runner (``tabbyray.lineage.run_crawl_resumable``) can checkpoint
per input shard:

* ``crawl_stage_flags`` — everything that is associative across input
  shards: gates, SHARD-LOCAL recrawl collapse, extraction, quality
  FLAGS (not yet filtered). Because the latest-capture argmax is a max,
  the global winner per clean_url is the max over shard-local winners —
  so each shard can collapse, extract and flag independently and the
  finalize stage re-argmaxes across shards. Output one row per
  shard-local winning capture: (clean_url, ts_us, url, text, n_words,
  q_passes, r_passes, dominant).
* ``crawl_stage_finalize`` — the cross-shard barrier: global
  latest-capture argmax, THEN the quality filter (selecting before
  filtering equals filtering the global winner — the flags travel with
  the capture that produced them), then corpus-wide exact-text dedup.

``curate_crawl`` = finalize(flags(...)) — one shard, same relation as
the original single-stage plan (shared SQL oracle; the staged split is
additionally oracled via the forced-2-shard ``crawl_curated_staged``
query). Output: (clean_url, text, n_words) for every surviving
document. Every exchange ships partials or doc-keyed rows; nothing
collects to the driver."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .relational import grouped_argmax, hash_join
from .text import gopher_quality, gopher_repetition, script_profile
from .web import (_canon_array, _clean_array, _parse_batch, robots_gate,
                  visible_text)


def crawl_stage_flags(pages: rd.Dataset, robots: rd.Dataset,
                      blocklist: rd.Dataset,
                      num_partitions: "int | None" = None) -> rd.Dataset:
    """Shard-associative prefix of the crawl-curation pipeline: domain
    + robots gates, SHARD-LOCAL latest-capture collapse, visible-text
    extraction and quality flags — NO cross-shard decisions. See the
    module docstring for why this composes across input shards."""
    def prep(t: pa.Table) -> pa.Table:
        comp = _parse_batch(t, "url")
        return pa.table({
            "url": pc.cast(t.column("url"), pa.string()),
            "ts_us": pc.cast(t.column("warc_ts"), pa.int64()),
            "html": pc.cast(t.column("html"), pa.string()),
            "registered_domain": comp["registered_domain"],
            "canon_url": _canon_array(t, "url"),
            "clean_url": _clean_array(t, "url"),
        })

    base = pages.map_batches(prep, batch_format="pyarrow")
    base_schema = pa.schema([
        ("url", pa.string()), ("ts_us", pa.int64()),
        ("html", pa.string()), ("registered_domain", pa.string()),
        ("canon_url", pa.string()), ("clean_url", pa.string())])

    def prep_bl(t: pa.Table) -> pa.Table:
        return pa.table({"registered_domain":
                         pc.utf8_lower(pc.cast(t.column("domain"),
                                               pa.string()))})

    unblocked = hash_join(
        base, blocklist.map_batches(prep_bl, batch_format="pyarrow"),
        on=["registered_domain"], how="anti",
        left_schema=base_schema,
        right_schema=pa.schema([("registered_domain", pa.string())]),
        num_partitions=num_partitions)

    gate = robots_gate(unblocked, robots,
                       num_partitions=num_partitions)

    def allowed_only(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("allowed"),
                              pa.scalar(1, pa.int64())))
        return pa.table({"canon_url": t.column("canon_url")})

    allowed = hash_join(
        unblocked.select_columns(["canon_url", "clean_url", "url",
                                  "ts_us", "html"]),
        gate.map_batches(allowed_only, batch_format="pyarrow"),
        on=["canon_url"], how="semi",
        left_schema=pa.schema([("canon_url", pa.string()),
                               ("clean_url", pa.string()),
                               ("url", pa.string()),
                               ("ts_us", pa.int64()),
                               ("html", pa.string())]),
        right_schema=pa.schema([("canon_url", pa.string())]),
        num_partitions=num_partitions)

    # materialized: winners feeds BOTH the extraction path and the
    # (ts_us, url) reattach join below — without the barrier the whole
    # upstream (parse, gates, collapse) lazily re-executes once per
    # consumer. Doc-keyed collapsed state, bounded by docs-per-shard;
    # Ray spills it to the object store at scale.
    winners = grouped_argmax(
        allowed, key="clean_url", order_col="ts_us", tie_col="url",
        out_cols=["clean_url", "ts_us", "url", "html"],
        num_partitions=num_partitions).materialize()

    # visible_text names its key column "url" regardless of url_col;
    # extract on (clean_url, html) alone, then one co-partitioned join
    # reattaches the winning capture's (ts_us, url) identity
    # materialized: docs feeds the three stateless gate maps AND the
    # first gate join — four lazy consumers would re-run the regex
    # strip chain (the pipeline's dominant CPU) once each otherwise
    docs = visible_text(winners.select_columns(["clean_url", "html"]),
                        url_col="clean_url",
                        html_col="html").map_batches(
        lambda t: pa.table({"doc_id": t.column("url"),
                            "text": t.column("text")}),
        batch_format="pyarrow").materialize()

    q = gopher_quality(docs).map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id"),
                            "n_words": t.column("n_words"),
                            "q_passes": t.column("passes")}),
        batch_format="pyarrow")
    r = gopher_repetition(docs).map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id"),
                            "r_passes": t.column("passes")}),
        batch_format="pyarrow")
    s = script_profile(docs).map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id"),
                            "dominant": t.column("dominant")}),
        batch_format="pyarrow")

    jq = hash_join(
        docs, q, on=["doc_id"],
        left_schema=pa.schema([("doc_id", pa.string()),
                               ("text", pa.string())]),
        right_schema=pa.schema([("doc_id", pa.string()),
                                ("n_words", pa.int64()),
                                ("q_passes", pa.int64())]),
        num_partitions=num_partitions)
    jr = hash_join(
        jq, r, on=["doc_id"],
        left_schema=pa.schema([("doc_id", pa.string()),
                               ("text", pa.string()),
                               ("n_words", pa.int64()),
                               ("q_passes", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.string()),
                                ("r_passes", pa.int64())]),
        num_partitions=num_partitions)
    js = hash_join(
        jr, s, on=["doc_id"],
        left_schema=pa.schema([("doc_id", pa.string()),
                               ("text", pa.string()),
                               ("n_words", pa.int64()),
                               ("q_passes", pa.int64()),
                               ("r_passes", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.string()),
                                ("dominant", pa.string())]),
        num_partitions=num_partitions)

    def as_clean(t: pa.Table) -> pa.Table:
        return pa.table({"clean_url": t.column("doc_id"),
                         "text": t.column("text"),
                         "n_words": t.column("n_words"),
                         "q_passes": t.column("q_passes"),
                         "r_passes": t.column("r_passes"),
                         "dominant": t.column("dominant")})

    flagged = js.map_batches(as_clean, batch_format="pyarrow")
    return hash_join(
        flagged, winners.select_columns(["clean_url", "ts_us", "url"]),
        on=["clean_url"],
        left_schema=pa.schema([("clean_url", pa.string()),
                               ("text", pa.string()),
                               ("n_words", pa.int64()),
                               ("q_passes", pa.int64()),
                               ("r_passes", pa.int64()),
                               ("dominant", pa.string())]),
        right_schema=pa.schema([("clean_url", pa.string()),
                                ("ts_us", pa.int64()),
                                ("url", pa.string())]),
        num_partitions=num_partitions)


FLAGS_SCHEMA = pa.schema([
    ("clean_url", pa.string()), ("text", pa.string()),
    ("n_words", pa.int64()), ("q_passes", pa.int64()),
    ("r_passes", pa.int64()), ("dominant", pa.string()),
    ("ts_us", pa.int64()), ("url", pa.string())])


def crawl_stage_finalize(flagged: rd.Dataset,
                         num_partitions: "int | None" = None
                         ) -> rd.Dataset:
    """Cross-shard suffix: global latest-capture argmax over the
    shard-local winners, quality filter, corpus-wide exact-text
    keep-first dedup. Input rows carry the flags their own html
    produced, so argmax-then-filter equals the single-stage
    filter-the-global-winner plan."""
    winners = grouped_argmax(
        flagged, key="clean_url", order_col="ts_us", tie_col="url",
        out_cols=["clean_url", "text", "n_words", "q_passes",
                  "r_passes", "dominant"],
        num_partitions=num_partitions)

    def gate_quality(t: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.and_(pc.equal(t.column("q_passes"),
                             pa.scalar(1, pa.int64())),
                    pc.equal(t.column("r_passes"),
                             pa.scalar(1, pa.int64()))),
            pc.equal(t.column("dominant"), "latin"))
        t = t.filter(ok)
        return pa.table({"clean_url": t.column("clean_url"),
                         "text": t.column("text"),
                         "n_words": t.column("n_words"),
                         "zero": pa.array([0] * t.num_rows,
                                          pa.int64())})

    kept = winners.map_batches(gate_quality, batch_format="pyarrow")

    return grouped_argmax(
        kept, key="text", order_col="zero", tie_col="clean_url",
        out_cols=["clean_url", "text", "n_words"],
        num_partitions=num_partitions)


def curate_crawl(pages: rd.Dataset, robots: rd.Dataset,
                 blocklist: rd.Dataset,
                 num_partitions: "int | None" = None) -> rd.Dataset:
    return crawl_stage_finalize(
        crawl_stage_flags(pages, robots, blocklist,
                          num_partitions=num_partitions),
        num_partitions=num_partitions)

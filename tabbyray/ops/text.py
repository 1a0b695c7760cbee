"""Text-analysis operators over a documents table (doc_id, text, lang, ...).

All stages are vectorized ``map_batches`` transforms; nothing touches
Python rows outside the batch kernels, and regexes/stopword sets are
module-level constants compiled once per worker process.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .relational import _resolve_partitions

_WS = re.compile(r"\s+")

# small deterministic stopword sets per language for the n-gram-free
# language-ID heuristic; word-overlap scoring
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "a", "for", "with", "on"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "por", "con", "los"},
    "de": {"der", "die", "und", "das", "von", "mit", "ist", "den", "im", "ein"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "du", "est"},
    "ru": {"и", "в", "не", "на", "что", "с", "по", "это", "как", "из"},
}

STOPWORDS_EN = ("the", "and", "of", "to", "in", "is", "a", "for")


def token_counts(docs: rd.Dataset) -> rd.Dataset:
    """doc_id, n_tokens (single-space tokenization, matching the SQL
    oracle's ``string_split(text, ' ')``)."""
    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        toks = pc.split_pattern(t.column("text"), " ")
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": pc.list_value_length(toks).cast(pa.int64())})
    return docs.map_batches(f, batch_format="pyarrow")


# BPE-ish pretokenizer: contraction suffixes, space-prefixed word /
# number / punctuation runs, whitespace runs. No lookaheads so the same
# pattern runs verbatim under DuckDB's RE2 (the oracle).
_BPE_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+")


def regex_token_counts(docs: rd.Dataset) -> rd.Dataset:
    """doc_id, n_bpe_tokens — counts of BPE-style pretokenizer matches
    (the 'token counting: whitespace + a BPE-ish regex' operator). The
    regex is compiled once per worker process (module constant)."""
    def f(t: pa.Table) -> pa.Table:
        ns = [len(_BPE_RE.findall(x or ""))
              for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_bpe_tokens": pa.array(ns, pa.int64())})
    return docs.map_batches(f, batch_format="pyarrow")


def winnow_fingerprints(docs: rd.Dataset, k: int = 5, w: int = 4) -> rd.Dataset:
    """Winnowing document fingerprints (rolling k-gram hash + per-window
    minimum; Schleimer/Wilkerson/Aiken's scheme with min-VALUE
    selection): one output row per DISTINCT selected fingerprint per
    doc. Fingerprints are the first 8 hex chars of md5 over each char
    k-gram — a fixed-width lowercase hex string, so lexicographic min
    equals numeric min and the DuckDB oracle can reproduce it exactly.
    Docs shorter than k emit no rows."""
    def f(t: pa.Table) -> pa.Table:
        ids, fps = [], []
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            s = text or ""
            if len(s) < k:
                continue
            hs = [hashlib.md5(s[i:i + k].encode()).hexdigest()[:8]
                  for i in range(len(s) - k + 1)]
            if len(hs) < w:
                sel = {min(hs)}
            else:
                sel = {min(hs[j:j + w]) for j in range(len(hs) - w + 1)}
            for fp in sorted(sel):
                ids.append(doc_id)
                fps.append(fp)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "fp": pa.array(fps, pa.string())})
    return docs.map_batches(f, batch_format="pyarrow")


def fingerprints(docs: rd.Dataset) -> rd.Dataset:
    """doc_id, fp = md5 hex of the whitespace-normalized text — the
    document fingerprint used by exact dedup at scale (hash first, then
    group on the 16-byte key instead of the full text)."""
    def f(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        fps = [hashlib.md5(_WS.sub(" ", (x or "")).strip().encode()).hexdigest()
               for x in texts]
        return pa.table({"doc_id": t.column("doc_id"), "fp": pa.array(fps, pa.string())})
    return docs.map_batches(f, batch_format="pyarrow")


def quality_scores(docs: rd.Dataset) -> rd.Dataset:
    """doc_id, n_tokens, n_chars_obs, avg_token_len, stop_ratio —
    length / stopword-ratio quality heuristics (integer-derived doubles
    so the DuckDB oracle reproduces them bit-for-bit)."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ")
        n_tokens = toks.str.len().astype("int64")
        n_chars = df["text"].str.len().astype("int64")
        nonspace = n_chars - (n_tokens - 1)
        stops = toks.map(lambda ws: sum(1 for w in ws if w in STOPWORDS_EN))
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_tokens": n_tokens,
            "n_chars_obs": n_chars,
            "avg_token_len": nonspace / n_tokens,
            "stop_ratio": stops.astype("int64") / n_tokens,
        })
    return docs.map_batches(f, batch_format="pandas")


def lang_id(docs: rd.Dataset) -> rd.Dataset:
    """doc_id, pred_lang — marker-word voting language identifier
    (deterministic heuristic; ties resolve in fixed language order)."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for text in df["text"]:
            words = set((text or "").lower().split())
            best, best_n = "und", 0
            for lang, markers in _LANG_MARKERS.items():
                n = len(words & markers)
                if n > best_n:
                    best, best_n = lang, n
            preds.append(best)
        return pd.DataFrame({"doc_id": df["doc_id"], "pred_lang": preds})
    return docs.map_batches(f, batch_format="pandas")


def lang_distribution(docs: rd.Dataset) -> rd.Dataset:
    """lang, n_docs — groupby over the stored language column, with a
    per-batch partial count (combiner) before the small shuffle."""
    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        g = t.group_by("lang").aggregate([("lang", "count")])
        return g.rename_columns(["lang", "n"])
    partials = docs.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum
    return partials.groupby("lang").aggregate(Sum("n", alias_name="n_docs"))


def term_counts_topk(docs: rd.Dataset, k: int = 500,
                     num_partitions: "int | None" = None) -> rd.Dataset:
    """Corpus-wide term frequency top-k (the vocabulary-build step of a
    tokenizer-training pipeline): term, n, ordered (n desc, term asc).

    Plan: per-batch Counter combiner (the shuffle moves one row per
    (term, batch), not per token) -> partitioned hash aggregate over
    the high-cardinality term key -> per-partition top-k prune -> final
    sort+limit over the <= P*k pruned survivors (tiny; the global sort
    never sees the full vocabulary). Deterministic tie-break: term asc.
    """
    from collections import Counter

    from .relational import hash_aggregate

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t.column("text").to_pylist():
            c.update(_WS.sub(" ", (text or "")).strip().split(" "))
        return pa.table({"term": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    counts = hash_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"),
        keys=["term"], sum_cols={"n": "n"}, num_partitions=num_partitions,
        out_schema=pa.schema([("term", pa.string()), ("n", pa.int64())]))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "term"], ascending=[False, True],
                              kind="stable").head(k)

    pruned = counts.map_batches(local_topk, batch_format="pandas")
    return pruned.sort(["n", "term"], descending=[True, False]).limit(k)


def term_doc_freq(docs: rd.Dataset, min_df: int = 10,
                  num_partitions: "int | None" = None) -> rd.Dataset:
    """Document frequency per term (the IDF input): term, df for terms
    appearing in >= min_df distinct documents.

    Per-batch kernel emits each doc's DISTINCT terms once (set, not
    bag), so the aggregate counts documents; duplicate (doc, term)
    pairs cannot span batches because a document lives in one row."""
    from .relational import hash_aggregate

    def partial(t: pa.Table) -> pa.Table:
        terms, ones = [], []
        for text in t.column("text").to_pylist():
            uniq = set(_WS.sub(" ", (text or "")).strip().split(" "))
            terms.extend(uniq)
            ones.extend([1] * len(uniq))
        return pa.table({"term": pa.array(terms, pa.string()),
                         "df": pa.array(ones, pa.int64())})

    counts = hash_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"),
        keys=["term"], sum_cols={"df": "df"}, num_partitions=num_partitions,
        out_schema=pa.schema([("term", pa.string()), ("df", pa.int64())]))

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.greater_equal(t.column("df"), min_df))

    return counts.map_batches(keep, batch_format="pyarrow")


def _tf_explode(t: pa.Table) -> pa.Table:
    """Per-doc term frequencies (doc_id, term, tf) — the exploded tf
    stream shared by the tfidf / unigram-NLL join paths. Stateless;
    exactly the tokenization of ``term_doc_freq``."""
    from collections import Counter

    ids, terms, tfs = [], [], []
    for doc_id, text in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
        counts = Counter(_WS.sub(" ", (text or "")).strip().split(" "))
        for term, tf in counts.items():
            ids.append(doc_id)
            terms.append(term)
            tfs.append(tf)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "term": pa.array(terms, pa.string()),
                     "tf": pa.array(tfs, pa.int64())})


_TF_SCHEMA = pa.schema([("doc_id", pa.int64()), ("term", pa.string()),
                        ("tf", pa.int64())])


def tfidf_scores(docs: rd.Dataset, min_df: int = 10,
                 num_partitions: "int | None" = None, mode: str = "auto",
                 broadcast_max_terms: int = 2_000_000) -> rd.Dataset:
    """Per-(doc, term) TF-IDF over the vocabulary of terms appearing in
    >= min_df distinct documents: ``tfidf = tf * ln(N / df)``.

    Two plans, picked by a DISTRIBUTED vocabulary count (``mode="auto"``,
    same pattern as ``dedup.minhash verify="auto"``):

    - ``broadcast`` (vocab <= broadcast_max_terms): the df table is
      ``ray.put`` ONCE and every batch scores against the shared dict —
      one df shuffle + one stateless corpus pass.
    - ``join`` (web-scale vocabularies that exceed driver/worker RAM):
      the per-doc tf stream explodes to (doc_id, term, tf) rows and
      co-partitions against the df table on ``hash(term)`` via
      ``relational.hash_join`` — no corpus-sized state anywhere; the
      vocabulary only ever exists as a distributed Dataset.

    Both paths evaluate the identical IEEE expression
    ``tf * ln(N / df)`` per surviving (doc, term), so results match
    bit-for-bit under either plan."""
    import math

    import ray

    from .relational import hash_join

    n_docs = docs.count()
    df_tbl = term_doc_freq(docs, min_df=min_df,
                           num_partitions=num_partitions).materialize()
    if mode == "auto":
        # distributed count over the materialized vocab (metadata-only)
        mode = "broadcast" if df_tbl.count() <= broadcast_max_terms else "join"

    if mode == "broadcast":
        idf = {r["term"]: math.log(n_docs / r["df"]) for r in df_tbl.take_all()}
        ref = ray.put(idf)

        def f(t: pa.Table) -> pa.Table:
            m = ray.get(ref)
            e = _tf_explode(t)
            ids, terms, tfs, scores = [], [], [], []
            for doc_id, term, tf in zip(e.column("doc_id").to_pylist(),
                                        e.column("term").to_pylist(),
                                        e.column("tf").to_pylist()):
                w = m.get(term)
                if w is None:
                    continue
                ids.append(doc_id)
                terms.append(term)
                tfs.append(tf)
                scores.append(tf * w)
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "term": pa.array(terms, pa.string()),
                             "tf": pa.array(tfs, pa.int64()),
                             "tfidf": pa.array(scores, pa.float64())})

        return docs.map_batches(f, batch_format="pyarrow")

    if mode != "join":
        raise ValueError(f"unknown mode {mode!r}")

    tf_stream = docs.map_batches(_tf_explode, batch_format="pyarrow")
    joined = hash_join(
        tf_stream, df_tbl, on="term", num_partitions=num_partitions,
        left_schema=_TF_SCHEMA,
        right_schema=pa.schema([("term", pa.string()), ("df", pa.int64())]))

    def score(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy().astype(np.float64)
        df_ = t.column("df").to_numpy().astype(np.float64)
        return pa.table({"doc_id": t.column("doc_id"),
                         "term": t.column("term"),
                         "tf": t.column("tf"),
                         "tfidf": pa.array(tf * np.log(float(n_docs) / df_),
                                           pa.float64())})

    return joined.map_batches(score, batch_format="pyarrow")


def tfidf_doc_similarity(docs: rd.Dataset, min_df: int = 2,
                         max_df_ratio: float = 0.5,
                         sim_threshold: float = 0.3,
                         num_partitions: "int | None" = None
                         ) -> rd.Dataset:
    """Sparse TF-IDF cosine similarity between documents: (doc_a,
    doc_b, sim) for unordered pairs whose cosine over L2-normalized
    TF-IDF vectors reaches ``sim_threshold`` (applied to the 9-dp
    quantized value so engine and oracle never disagree at the float
    boundary; `doc_a < doc_b`).

    The inverted-index plan — never a dense doc×doc product:
    tf explode -> df join (terms with ``min_df <= df <=
    floor(max_df_ratio · N)``) -> per-doc L2 norms (one doc-hash
    aggregate) -> term-hash SELF-join emits only pairs that SHARE a
    surviving term -> pair-hash sum.

    Scale contract: the self-join fans out df² pairs per term, so the
    ``max_df`` cap is the knob that bounds the worst posting list —
    stopword-like terms (the quadratic risk) are exactly the high-df
    terms the cap drops, and they carry near-zero IDF weight anyway.
    All exchanges are hash-partitioned; nothing corpus-sized is
    collected (N is one scalar count)."""
    import pyarrow.compute as pc

    from .relational import hash_aggregate, hash_join

    n_docs = docs.count()
    max_df = int(max_df_ratio * n_docs)

    df_tbl = term_doc_freq(docs, min_df=min_df,
                           num_partitions=num_partitions)
    df_tbl = df_tbl.map_batches(
        lambda t: t.filter(pc.less_equal(t.column("df"), max_df)),
        batch_format="pyarrow").materialize()

    tf_stream = docs.map_batches(_tf_explode, batch_format="pyarrow")
    joined = hash_join(
        tf_stream, df_tbl, on="term", num_partitions=num_partitions,
        left_schema=_TF_SCHEMA,
        right_schema=pa.schema([("term", pa.string()),
                                ("df", pa.int64())]))

    def weight(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy().astype(np.float64)
        df_ = t.column("df").to_numpy().astype(np.float64)
        return pa.table({"doc_id": t.column("doc_id"),
                         "term": t.column("term"),
                         "w": pa.array(tf * np.log(float(n_docs) / df_),
                                       pa.float64())})

    w = joined.map_batches(weight,
                           batch_format="pyarrow").materialize()

    def sq(t: pa.Table) -> pa.Table:
        ww = t.column("w").to_numpy()
        return pa.table({"doc_id": t.column("doc_id"),
                         "w2": pa.array(ww * ww, pa.float64())})

    norms = hash_aggregate(
        w.map_batches(sq, batch_format="pyarrow"),
        keys=["doc_id"], sum_cols={"w2": "ss"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("doc_id", pa.int64()),
                              ("ss", pa.float64())]))

    wn = hash_join(
        w, norms, on="doc_id", num_partitions=num_partitions,
        left_schema=pa.schema([("doc_id", pa.int64()),
                               ("term", pa.string()),
                               ("w", pa.float64())]),
        right_schema=pa.schema([("doc_id", pa.int64()),
                                ("ss", pa.float64())]))

    def unit(t: pa.Table) -> pa.Table:
        ww = t.column("w").to_numpy()
        ss = t.column("ss").to_numpy()
        return pa.table({"term": t.column("term"),
                         "doc_id": t.column("doc_id"),
                         "wn": pa.array(ww / np.sqrt(ss), pa.float64())})

    wn = wn.map_batches(unit, batch_format="pyarrow").materialize()

    left = wn.map_batches(
        lambda t: pa.table({"term": t.column("term"),
                            "doc_a": t.column("doc_id"),
                            "wa": t.column("wn")}),
        batch_format="pyarrow")
    right = wn.map_batches(
        lambda t: pa.table({"term": t.column("term"),
                            "doc_b": t.column("doc_id"),
                            "wb": t.column("wn")}),
        batch_format="pyarrow")

    pairs = hash_join(
        left, right, on="term", num_partitions=num_partitions,
        left_schema=pa.schema([("term", pa.string()),
                               ("doc_a", pa.int64()),
                               ("wa", pa.float64())]),
        right_schema=pa.schema([("term", pa.string()),
                                ("doc_b", pa.int64()),
                                ("wb", pa.float64())]))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("doc_a"), t.column("doc_b")))
        wa = t.column("wa").to_numpy()
        wb = t.column("wb").to_numpy()
        return pa.table({"doc_a": t.column("doc_a"),
                         "doc_b": t.column("doc_b"),
                         "prod": pa.array(wa * wb, pa.float64())})

    sims = hash_aggregate(
        pairs.map_batches(partial, batch_format="pyarrow"),
        keys=["doc_a", "doc_b"], sum_cols={"prod": "sim"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("doc_a", pa.int64()),
                              ("doc_b", pa.int64()),
                              ("sim", pa.float64())]))

    def finish(t: pa.Table) -> pa.Table:
        s = pc.round(t.column("sim"), ndigits=9)
        t = pa.table({"doc_a": t.column("doc_a"),
                      "doc_b": t.column("doc_b"), "sim": s})
        return t.filter(pc.greater_equal(t.column("sim"),
                                         sim_threshold))

    return sims.map_batches(finish, batch_format="pyarrow")


def lang_unigram_kl(docs: rd.Dataset, group_col: str = "lang",
                    num_partitions: "int | None" = None) -> rd.Dataset:
    """Domain-shift measurement per corpus slice: ``(group, n_terms,
    kl)`` where ``kl = KL(P_group || P_corpus)`` over unigram
    distributions — how far each language/source slice's token mix
    sits from the pooled corpus (the DSIR-style importance signal
    aggregated to slice level).  Every group term exists in the corpus
    by construction, so the divergence is always finite.

    Plan: one (group, term)-hash count aggregate (Counter combiner
    inside each batch first), corpus term totals DERIVED from those
    partials by a second term-hash aggregate (the corpus pass is never
    repeated), group/corpus totals as tiny aggregates, one term-hash
    join, one group-hash sum.  State everywhere is bounded by the
    vocabulary partition, never the corpus."""
    import math

    import pyarrow.compute as pc

    from .relational import hash_aggregate, hash_join

    def counts(t: pa.Table) -> pa.Table:
        from collections import Counter
        gs, terms, cs = [], [], []
        for g, text in zip(t.column(group_col).to_pylist(),
                           t.column("text").to_pylist()):
            for term, c in Counter(
                    _WS.sub(" ", (text or "")).strip()
                    .split(" ")).items():
                gs.append(g)
                terms.append(term)
                cs.append(c)
        return pa.table({group_col: pa.array(gs, pa.string()),
                         "term": pa.array(terms, pa.string()),
                         "c": pa.array(cs, pa.int64())})

    gt = hash_aggregate(
        docs.map_batches(counts, batch_format="pyarrow"),
        keys=[group_col, "term"], sum_cols={"c": "c"},
        num_partitions=num_partitions,
        out_schema=pa.schema([(group_col, pa.string()),
                              ("term", pa.string()),
                              ("c", pa.int64())])).materialize()

    corpus_t = hash_aggregate(
        gt, keys=["term"], sum_cols={"c": "tc"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("term", pa.string()),
                              ("tc", pa.int64())]))

    # totals: a handful of rows — safe to collect
    g_tot = {r[group_col]: r["n"] for r in hash_aggregate(
        gt, keys=[group_col], sum_cols={"c": "n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([(group_col, pa.string()),
                              ("n", pa.int64())])).take_all()}
    corpus_n = float(sum(g_tot.values()))

    joined = hash_join(
        gt, corpus_t, on="term", num_partitions=num_partitions,
        left_schema=pa.schema([(group_col, pa.string()),
                               ("term", pa.string()),
                               ("c", pa.int64())]),
        right_schema=pa.schema([("term", pa.string()),
                                ("tc", pa.int64())]))

    def contrib(t: pa.Table) -> pa.Table:
        import numpy as np
        g = t.column(group_col).to_pylist()
        c = t.column("c").to_numpy().astype(np.float64)
        tc = t.column("tc").to_numpy().astype(np.float64)
        gn = np.array([g_tot[x] for x in g], dtype=np.float64)
        p = c / gn
        q = tc / corpus_n
        return pa.table({group_col: t.column(group_col),
                         "one": pa.array([1] * t.num_rows, pa.int64()),
                         "kl_part": pa.array(p * np.log(p / q),
                                             pa.float64())})

    agg = hash_aggregate(
        joined.map_batches(contrib, batch_format="pyarrow"),
        keys=[group_col], sum_cols={"one": "n_terms",
                                    "kl_part": "kl"},
        num_partitions=num_partitions,
        out_schema=pa.schema([(group_col, pa.string()),
                              ("n_terms", pa.int64()),
                              ("kl", pa.float64())]))

    return agg.map_batches(
        lambda t: pa.table({group_col: t.column(group_col),
                            "n_terms": t.column("n_terms"),
                            "kl": pc.round(t.column("kl"),
                                           ndigits=9)}),
        batch_format="pyarrow")


def bm25_scores(docs: rd.Dataset, queries: rd.Dataset,
                k1: float = 1.2, b: float = 0.75,
                num_partitions: "int | None" = None) -> rd.Dataset:
    """Batch retrieval scoring: ``(query_id, doc_id, score)`` —
    Lucene-form BM25 of every document against every query that shares
    at least one term::

        score = sum_t ln((N - df + 0.5)/(df + 0.5) + 1)
                      * tf (k1+1) / (tf + k1 (1 - b + b dl/avgdl))

    over the query's DISTINCT terms.  The benchmark-decontamination /
    eval-retrieval shape: queries are a SMALL side (an eval set), docs
    are the corpus.

    Plan: the query table collects to the driver ONCE (bounded by the
    eval set, asserted small by contract), df is computed for QUERY
    TERMS ONLY by filtering the distinct-term stream before its hash
    aggregate (the vocabulary never materializes), avgdl/N are two
    scalar aggregates, and scoring is one stateless pass over the
    corpus with the query-term dict broadcast via the closure.  Output
    is 9-dp quantized (the oracle applies the identical rounding)."""
    import math
    from collections import Counter

    import pyarrow.compute as pc

    from .relational import hash_aggregate

    q_terms: dict[int, set] = {}
    for r in queries.take_all():
        toks = set(_WS.sub(" ", (r["text"] or "")).strip().split(" "))
        q_terms[r["query_id"]] = toks
    all_q_terms = frozenset().union(*q_terms.values()) if q_terms \
        else frozenset()

    def distinct_terms(t: pa.Table) -> pa.Table:
        ids, terms = [], []
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            toks = set(_WS.sub(" ", (text or "")).strip().split(" "))
            for tok in toks & all_q_terms:
                ids.append(doc_id)
                terms.append(tok)
        return pa.table({"term": pa.array(terms, pa.string()),
                         "one": pa.array([1] * len(terms), pa.int64())})

    df_map = {r["term"]: r["df"] for r in hash_aggregate(
        docs.map_batches(distinct_terms, batch_format="pyarrow"),
        keys=["term"], sum_cols={"one": "df"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("term", pa.string()),
                              ("df", pa.int64())])).take_all()}

    def lens(t: pa.Table) -> pa.Table:
        dls = [len(_WS.sub(" ", (x or "")).strip().split(" "))
               for x in t.column("text").to_pylist()]
        return pa.table({"dl": pa.array([sum(dls)], pa.int64()),
                         "n": pa.array([t.num_rows], pa.int64())})

    tot = docs.map_batches(lens, batch_format="pyarrow") \
        .sum(["dl", "n"])
    n_docs = float(tot["sum(n)"])
    avgdl = float(tot["sum(dl)"]) / n_docs

    idf = {t: math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
           for t, df in df_map.items()}

    out_schema = pa.schema([("query_id", pa.int64()),
                            ("doc_id", pa.int64()),
                            ("score", pa.float64())])

    def score(t: pa.Table) -> pa.Table:
        qids, dids, scores = [], [], []
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            toks = _WS.sub(" ", (text or "")).strip().split(" ")
            tf = Counter(toks)
            dl = len(toks)
            norm = k1 * (1.0 - b + b * dl / avgdl)
            for qid, terms in q_terms.items():
                s = 0.0
                hit = False
                for term in terms:
                    f = tf.get(term)
                    if f:
                        hit = True
                        s += idf[term] * f * (k1 + 1.0) / (f + norm)
                if hit:
                    qids.append(qid)
                    dids.append(doc_id)
                    scores.append(s)
        out = pa.table({"query_id": pa.array(qids, pa.int64()),
                        "doc_id": pa.array(dids, pa.int64()),
                        "score": pa.array(scores, pa.float64())},
                       schema=out_schema)
        return out.set_column(2, "score",
                              pc.round(out.column("score"), ndigits=9))

    return docs.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# cleaning / safety / quality-signal operators
# ---------------------------------------------------------------------------

_CTRL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
# RE2-compatible (no lookaround) so the DuckDB oracle runs the same
# patterns verbatim
_EMAIL = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
_PHONE = re.compile(r"\+?[0-9][0-9()\-. ]{7,}[0-9]")


def clean_normalize(docs: rd.Dataset) -> rd.Dataset:
    """doc_id, clean_text: NFC unicode normalization, lowercase,
    control-char strip, whitespace collapse — the canonical first stage
    of a text-prep pipeline. Pure per-batch map, no state."""
    import unicodedata

    def f(t: pa.Table) -> pa.Table:
        out = []
        for x in t.column("text").to_pylist():
            s = unicodedata.normalize("NFC", x or "").lower()
            s = _CTRL.sub("", s)
            out.append(_WS.sub(" ", s).strip())
        return pa.table({"doc_id": t.column("doc_id"),
                         "clean_text": pa.array(out, pa.string())})
    return docs.map_batches(f, batch_format="pyarrow")


def pii_counts(docs: rd.Dataset) -> rd.Dataset:
    """doc_id, n_emails, n_phones, redacted_fp: counts of email/phone
    matches plus the md5 of the text with matches replaced by
    placeholder tokens (the redaction output, fingerprinted so the
    check stays scalar). Patterns are module-level compiled constants
    (once per worker process) and RE2-compatible."""
    def f(t: pa.Table) -> pa.Table:
        ne, np_, fps = [], [], []
        for x in t.column("text").to_pylist():
            s = x or ""
            ne.append(len(_EMAIL.findall(s)))
            red = _EMAIL.sub("<EMAIL>", s)
            np_.append(len(_PHONE.findall(red)))
            red = _PHONE.sub("<PHONE>", red)
            fps.append(hashlib.md5(red.encode()).hexdigest())
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_emails": pa.array(ne, pa.int64()),
                         "n_phones": pa.array(np_, pa.int64()),
                         "redacted_fp": pa.array(fps, pa.string())})
    return docs.map_batches(f, batch_format="pyarrow")


def repetition_stats(docs: rd.Dataset) -> rd.Dataset:
    """doc_id, n_bigrams, n_distinct_bigrams: token-bigram repetition
    (a Gopher-style quality rule — highly repetitive documents have a
    low distinct/total ratio). Counts are integers so the SQL oracle
    compares exactly; compute the ratio downstream from identical
    operands."""
    def f(t: pa.Table) -> pa.Table:
        tot, dis = [], []
        for x in t.column("text").to_pylist():
            toks = _WS.sub(" ", (x or "")).strip().split(" ")
            bigrams = [toks[i] + " " + toks[i + 1]
                       for i in range(len(toks) - 1)]
            tot.append(len(bigrams))
            dis.append(len(set(bigrams)))
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_bigrams": pa.array(tot, pa.int64()),
                         "n_distinct_bigrams": pa.array(dis, pa.int64())})
    return docs.map_batches(f, batch_format="pyarrow")


def _doc_shingles(text: str, shingle_n: int) -> set[str]:
    toks = _WS.sub(" ", (text or "")).strip().split(" ")
    if len(toks) < shingle_n:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + shingle_n])
            for i in range(len(toks) - shingle_n + 1)}


def ngram_contamination(docs: rd.Dataset, benchmark: rd.Dataset,
                        shingle_n: int = 3, mode: str = "auto",
                        broadcast_max_shingles: int = 5_000_000
                        ) -> rd.Dataset:
    """doc_id, n_overlap, n_shingles: per-document overlap with the
    union of a benchmark set's DISTINCT n-gram shingles — the
    decontamination check of a training-data pipeline.

    Two plans behind a distributed shingle-count auto-switch:

    - ``broadcast`` (eval-set-sized benchmarks): the distinct benchmark
      shingle set is built distributedly, ``ray.put`` once, and each
      batch intersects against the shared frozenset — one stateless
      corpus pass.
    - ``join`` (benchmark beyond driver/worker RAM): per-doc DISTINCT
      shingles explode with n_shingles riding along, LEFT-hash_join
      against the distinct benchmark shingles on a shingle-hash
      co-partition (marker column), and one per-doc hash aggregate
      sums matches — the benchmark never leaves the object store.
      Every doc emits >= 1 shingle row, so zero-overlap docs survive.
    """
    import ray

    from .relational import hash_aggregate, hash_join

    def to_shingles(t: pa.Table) -> pa.Table:
        out = set()
        for x in t.column("text").to_pylist():
            out |= _doc_shingles(x, shingle_n)
        return pa.table({"s": pa.array(sorted(out), pa.string())})

    # distinct benchmark shingles as a DATASET (batch-local dedup +
    # one s-hash aggregate — tiny for eval sets, bounded at scale)
    bench_distinct = hash_aggregate(
        benchmark.map_batches(to_shingles, batch_format="pyarrow")
        .map_batches(lambda t: t.append_column(
            "one", pa.array([1] * t.num_rows, pa.int64())),
            batch_format="pyarrow"),
        keys=["s"], sum_cols={"one": "one"},
        out_schema=pa.schema([("s", pa.string()),
                              ("one", pa.int64())])).materialize()

    if mode == "auto":
        mode = ("broadcast"
                if bench_distinct.count() <= broadcast_max_shingles
                else "join")

    if mode == "broadcast":
        bench_shingles = frozenset(
            r["s"] for r in bench_distinct.take_all())
        ref = ray.put(bench_shingles)

        def f(t: pa.Table) -> pa.Table:
            bench = ray.get(ref)
            n_ov, n_sh = [], []
            for x in t.column("text").to_pylist():
                sh = _doc_shingles(x, shingle_n)
                n_sh.append(len(sh))
                n_ov.append(len(sh & bench))
            return pa.table({"doc_id": t.column("doc_id"),
                             "n_overlap": pa.array(n_ov, pa.int64()),
                             "n_shingles": pa.array(n_sh, pa.int64())})
        return docs.map_batches(f, batch_format="pyarrow")

    if mode != "join":
        raise ValueError(f"unknown mode {mode!r}")

    def explode(t: pa.Table) -> pa.Table:
        ids, shs, ns = [], [], []
        for doc_id, x in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            sh = _doc_shingles(x, shingle_n)
            for s in sh:
                ids.append(doc_id)
                shs.append(s)
                ns.append(len(sh))
        return pa.table({"s": pa.array(shs, pa.string()),
                         "doc_id": pa.array(ids, pa.int64()),
                         "n_sh": pa.array(ns, pa.int64())})

    joined = hash_join(
        docs.map_batches(explode, batch_format="pyarrow"),
        bench_distinct, on="s", how="left",
        left_schema=pa.schema([("s", pa.string()), ("doc_id", pa.int64()),
                               ("n_sh", pa.int64())]),
        right_schema=pa.schema([("s", pa.string()), ("one", pa.int64())]))

    def mark(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        hit = pc.cast(pc.is_valid(t.column("one")), pa.int64())
        return pa.table({"doc_id": t.column("doc_id"),
                         "hit": hit, "n_sh": t.column("n_sh")})

    agg = hash_aggregate(
        joined.map_batches(mark, batch_format="pyarrow"),
        keys=["doc_id"], sum_cols={"hit": "n_overlap"},
        count_alias="_rows",
        out_schema=pa.schema([("doc_id", pa.int64()),
                              ("n_overlap", pa.int64()),
                              ("_rows", pa.int64())]))

    def finish(t: pa.Table) -> pa.Table:
        # per-doc shingle rows are DISTINCT shingles, so the row count
        # per doc IS n_shingles
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_overlap": t.column("n_overlap"),
                         "n_shingles": t.column("_rows")})

    return agg.map_batches(finish, batch_format="pyarrow")


def chunk_documents(docs: rd.Dataset, chunk_tokens: int = 128,
                    overlap: int = 16) -> rd.Dataset:
    """Split documents into overlapping fixed-size token windows — the
    context-window chunking step of an embedding/RAG ingestion
    pipeline. Emits (doc_id, chunk_id, tok_start, tok_end, chunk_text);
    stride = chunk_tokens - overlap; the last chunk is truncated at the
    document end. Pure per-batch flat map, deterministic in the row."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap

    def f(t: pa.Table) -> pa.Table:
        ids, cids, starts, ends, texts = [], [], [], [], []
        for doc_id, x in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            toks = _WS.sub(" ", (x or "")).strip().split(" ")
            n = len(toks)
            n_chunks = (1 if n <= chunk_tokens
                        else (n - chunk_tokens + stride - 1) // stride + 1)
            for i in range(n_chunks):
                s = i * stride
                e = min(s + chunk_tokens, n)
                ids.append(doc_id)
                cids.append(i)
                starts.append(s)
                ends.append(e)
                texts.append(" ".join(toks[s:e]))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "chunk_id": pa.array(cids, pa.int64()),
                         "tok_start": pa.array(starts, pa.int64()),
                         "tok_end": pa.array(ends, pa.int64()),
                         "chunk_text": pa.array(texts, pa.string())})
    return docs.map_batches(f, batch_format="pyarrow")


def token_entropy(docs: rd.Dataset) -> rd.Dataset:
    """Per-doc unigram token entropy in nats (a repetition/diversity
    quality signal: boilerplate and keyword-stuffed pages score low).
    Stateless map, no shuffle. The '+ 0.0' canonicalizes IEEE -0.0
    (single-token docs) so the value matches the SQL oracle's
    ``0.0 + -sum(p * ln(p))`` byte-for-byte in CSV form."""
    def f(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        ents = []
        for x in t.column("text").to_pylist():
            toks = _WS.sub(" ", (x or "")).strip().split(" ")
            _, counts = np.unique(np.asarray(toks, dtype=object),
                                  return_counts=True)
            p = counts / counts.sum()
            ents.append(float(-(p * np.log(p)).sum()) + 0.0)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "token_entropy": pa.array(ents, pa.float64())})
    return docs.map_batches(f, batch_format="pyarrow")


def length_histogram(docs: rd.Dataset, col: str = "n_chars",
                     width: int = 200) -> rd.Dataset:
    """Fixed-width histogram of a numeric column (corpus length
    profile). Per-batch bin counts (combiner) + a small groupby over
    the bin domain — the shuffle moves one row per (bin, batch), never
    the rows. Output (bin_lo, n_docs)."""
    import pyarrow.compute as pc

    from .relational import partial_agg_sum

    def binify(t: pa.Table) -> pa.Table:
        lo = pc.multiply(
            pc.floor(pc.divide(pc.cast(t.column(col), pa.float64()), width)),
            float(width))
        return pa.table({"bin_lo": pc.cast(lo, pa.int64()),
                         "one": pa.array(np.ones(t.num_rows, dtype=np.int64))})

    out = partial_agg_sum(docs.map_batches(binify, batch_format="pyarrow"),
                          "bin_lo", {"one": "n_docs"})
    return out.select_columns(["bin_lo", "n_docs"])


def sequence_pack(docs: rd.Dataset, seq_len: int = 2048,
                  bucket_size: int = 4096) -> rd.Dataset:
    """Concat-and-chunk sequence packing: lay every doc's tokens out
    end-to-end in doc_id order and assign each doc its global token
    offset and training-sequence id (offset // seq_len) — the
    GPT-style pretraining packing layout, as a distributed PREFIX SUM.

    Plan: (1) stateless per-doc token counts; (2) coarse buckets
    bucket = doc_id // bucket_size, per-bucket token sums via a
    combiner aggregate — one tiny row per bucket to the driver (pick
    ``bucket_size`` so corpus_size / bucket_size driver rows stay
    small; hierarchical buckets extend this another 1000x if needed);
    (3) broadcast the bucket->prefix offsets once (ray.put) and finish
    with a per-bucket groupby: sort by doc_id, local cumsum + bucket
    offset. No full-data shuffle at any step — the only exchange is
    the bucket-count aggregate. Output (doc_id, n_tokens, tok_offset,
    seq_id)."""
    import pyarrow.compute as pc
    import ray

    from .relational import partial_agg_sum, typed_groupby_map

    def counts(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.list_value_length(
            pc.split_pattern(t.column("text"), " ")), pa.int64())
        doc = t.column("doc_id")
        return pa.table({
            "doc_id": doc, "n_tokens": n,
            "bucket": pc.cast(pc.floor(pc.divide(
                pc.cast(doc, pa.float64()), bucket_size)), pa.int64())})

    per_doc = docs.map_batches(counts, batch_format="pyarrow")
    bucket_sums = partial_agg_sum(per_doc, "bucket",
                                  {"n_tokens": "n"}).to_pandas()
    bucket_sums = bucket_sums.sort_values("bucket")
    prefix = dict(zip(bucket_sums["bucket"],
                      bucket_sums["n"].cumsum() - bucket_sums["n"]))
    ref = ray.put(prefix)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(ref)
        g = g.sort_values("doc_id", kind="stable")
        off = int(offs[g["bucket"].iloc[0]]) \
            + g["n_tokens"].cumsum() - g["n_tokens"]
        return pd.DataFrame({"doc_id": g["doc_id"],
                             "n_tokens": g["n_tokens"],
                             "tok_offset": off.astype("int64"),
                             "seq_id": (off // seq_len).astype("int64")})

    return typed_groupby_map(
        per_doc, "bucket", finish,
        pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                   ("tok_offset", pa.int64()), ("seq_id", pa.int64())]))


def packed_sequences(docs: rd.Dataset, seq_len: int = 2048,
                     bucket_size: int = 4096) -> rd.Dataset:
    """MATERIALIZED sequence packing: the global token stream (docs
    concatenated in doc_id order) cut into fixed ``seq_len``-token
    training sequences — documents crossing a boundary are SPLIT
    across the two sequences, exactly like GPT-style pretraining
    batch construction.

    Plan: the same coarse-bucket distributed prefix sum as
    ``sequence_pack`` gives each doc its global token offset; then
    each doc emits one PIECE per sequence it overlaps (a stateless
    flat map — a doc of n tokens overlaps at most n/seq_len + 1
    sequences, so the fan-out is proportional to data size), and ONE
    groupby(seq_id) reassembles pieces in position order. Output
    (seq_id, n_tokens, seq_text); the final (ragged) sequence is kept.
    """
    import pyarrow.compute as pc
    import ray

    from .relational import partial_agg_sum, typed_groupby_map

    def counts(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.list_value_length(
            pc.split_pattern(t.column("text"), " ")), pa.int64())
        doc = t.column("doc_id")
        return pa.table({
            "doc_id": doc, "n_tokens": n, "text": t.column("text"),
            "bucket": pc.cast(pc.floor(pc.divide(
                pc.cast(doc, pa.float64()), bucket_size)), pa.int64())})

    per_doc = docs.select_columns(["doc_id", "text"]).map_batches(
        counts, batch_format="pyarrow")
    bucket_sums = partial_agg_sum(
        per_doc.select_columns(["bucket", "n_tokens"]), "bucket",
        {"n_tokens": "n"}).to_pandas().sort_values("bucket")
    prefix = dict(zip(bucket_sums["bucket"],
                      bucket_sums["n"].cumsum() - bucket_sums["n"]))
    ref = ray.put(prefix)

    def pieces(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(ref)
        g = g.sort_values("doc_id", kind="stable")
        start = int(offs[g["bucket"].iloc[0]])
        cum = g["n_tokens"].cumsum() - g["n_tokens"]
        seqs, poss, texts = [], [], []
        for text, n, local in zip(g["text"], g["n_tokens"], cum):
            off = start + int(local)
            toks = text.split(" ")
            for s in range(off // seq_len, (off + n - 1) // seq_len + 1):
                a = max(0, s * seq_len - off)
                b = min(n, (s + 1) * seq_len - off)
                seqs.append(s)
                poss.append(off + a)
                texts.append(" ".join(toks[a:b]))
        return pd.DataFrame({"seq_id": seqs, "pos": poss, "piece": texts})

    piece_schema = pa.schema([("seq_id", pa.int64()), ("pos", pa.int64()),
                              ("piece", pa.string())])
    piece_ds = typed_groupby_map(per_doc, "bucket", pieces, piece_schema)

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("pos", kind="stable")
        n = int(sum(len(p.split(" ")) for p in g["piece"]))
        return pd.DataFrame({"seq_id": [g["seq_id"].iloc[0]],
                             "n_tokens": [n],
                             "seq_text": [" ".join(g["piece"])]})

    return typed_groupby_map(
        piece_ds, "seq_id", assemble,
        pa.schema([("seq_id", pa.int64()), ("n_tokens", pa.int64()),
                   ("seq_text", pa.string())]))


def corpus_term_counts(docs: rd.Dataset,
                       num_partitions: "int | None" = None) -> rd.Dataset:
    """Exact corpus-wide term frequencies: Counter combiner per batch
    (the shuffle moves one row per (term, batch), never per token) ->
    partitioned hash aggregate over the high-cardinality term key.
    Output: (term, n). The building block behind vocabulary top-k,
    unigram LM scoring and the CMS query set."""
    from collections import Counter

    from .relational import hash_aggregate

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t.column("text").to_pylist():
            c.update(_WS.sub(" ", (text or "")).strip().split(" "))
        return pa.table({"term": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    return hash_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"), keys=["term"],
        sum_cols={"n": "n"}, num_partitions=num_partitions,
        out_schema=pa.schema([("term", pa.string()), ("n", pa.int64())]))


def unigram_logprob_scores(docs: rd.Dataset,
                           num_partitions: "int | None" = None, mode: str = "auto",
                           broadcast_max_terms: int = 2_000_000) -> rd.Dataset:
    """Unigram language-model quality score per document: the mean
    negative log-likelihood of the doc's tokens under the corpus's OWN
    unigram distribution — the fluency/outlier signal quality filters
    use (low = typical text, high = rare-token-heavy).

    Two plans behind a DISTRIBUTED vocabulary-count auto-switch (the
    ``minhash verify="auto"`` pattern):

    - ``broadcast``: the Counter-combiner hash aggregate builds the
      corpus term counts (shuffle moves one row per (term, batch), not
      per token); the (term → −ln p) map is ``ray.put`` ONCE and
      scoring is a stateless single pass.
    - ``join`` (vocabulary beyond driver/worker RAM): explode the
      per-doc tf stream to (doc_id, term, tf), co-partition against
      the distributed counts table on ``hash(term)``
      (``relational.hash_join``), score per row, and hash-aggregate
      ``Σ tf·(−ln p)`` and ``Σ tf`` (= n_tokens, since every corpus
      token is in its own vocabulary) back to one row per doc. The
      vocabulary never leaves the object store.

    The corpus total is a distributed ``Dataset.sum`` either way.
    Output: (doc_id, n_tokens, nll)."""
    import ray

    from .relational import hash_aggregate, hash_join

    counts = corpus_term_counts(docs, num_partitions).materialize()
    total = float(counts.sum("n"))
    if mode == "auto":
        mode = ("broadcast" if counts.count() <= broadcast_max_terms
                else "join")

    if mode == "broadcast":
        cdf = counts.to_pandas()
        neglogp = dict(zip(
            cdf["term"],
            -np.log(cdf["n"].to_numpy().astype(np.float64) / total)))
        ref = ray.put(neglogp)

        def score(t: pa.Table) -> pa.Table:
            m = ray.get(ref)
            ids, nt, nll = [], [], []
            for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                    t.column("text").to_pylist()):
                toks = _WS.sub(" ", (text or "")).strip().split(" ")
                ids.append(doc_id)
                nt.append(len(toks))
                nll.append(sum(m[tok] for tok in toks) / len(toks))
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "n_tokens": pa.array(nt, pa.int64()),
                             "nll": pa.array(nll, pa.float64())})

        return docs.map_batches(score, batch_format="pyarrow")

    if mode != "join":
        raise ValueError(f"unknown mode {mode!r}")

    tf_stream = docs.map_batches(_tf_explode, batch_format="pyarrow")
    joined = hash_join(
        tf_stream, counts, on="term", num_partitions=num_partitions,
        left_schema=_TF_SCHEMA,
        right_schema=pa.schema([("term", pa.string()), ("n", pa.int64())]))

    def contrib(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy().astype(np.float64)
        n = t.column("n").to_numpy().astype(np.float64)
        return pa.table({"doc_id": t.column("doc_id"),
                         "tf": t.column("tf"),
                         "_c": pa.array(tf * -np.log(n / total),
                                        pa.float64())})

    agg = hash_aggregate(
        joined.map_batches(contrib, batch_format="pyarrow"),
        keys=["doc_id"], sum_cols={"_c": "sum_nll", "tf": "n_tokens"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("doc_id", pa.int64()),
                              ("sum_nll", pa.float64()),
                              ("n_tokens", pa.int64())]))

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("sum_nll").to_numpy()
        n = t.column("n_tokens").to_numpy().astype(np.float64)
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": t.column("n_tokens"),
                         "nll": pa.array(s / n, pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def inverted_index(docs: rd.Dataset, min_df: int = 10,
                   num_partitions: "int | None" = None) -> rd.Dataset:
    """Posting-list inverted index: for each term appearing in >=
    min_df distinct documents, the ordered comma-joined doc_id list —
    the IR-shard build step. Per-batch kernel emits each doc's
    DISTINCT terms once; ONE term-hash partitioned exchange; posting
    lists assemble per partition (a term's postings are co-partitioned
    by construction, so lists never cross partitions). Output:
    (term, df, doc_ids)."""
    num_partitions = _resolve_partitions(num_partitions)
    from .relational import typed_groupby_map

    def pairs(t: pa.Table) -> pd.DataFrame:
        terms, ids = [], []
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            for term in set(_WS.sub(" ", (text or "")).strip().split(" ")):
                terms.append(term)
                ids.append(doc_id)
        df = pd.DataFrame({"term": terms, "doc_id": ids})
        h = pd.util.hash_pandas_object(df["term"], index=False)
        return df.assign(_part=(h % num_partitions).astype("int64"))

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", "doc_id"], kind="stable")
        out = g.groupby("term", as_index=False).agg(
            df=("doc_id", "size"),
            doc_ids=("doc_id", lambda s: ",".join(map(str, s))))
        out["df"] = out["df"].astype("int64")
        return out[out["df"] >= min_df]

    return typed_groupby_map(
        docs.map_batches(pairs, batch_format="pyarrow"),
        "_part", assemble,
        pa.schema([("term", pa.string()), ("df", pa.int64()),
                   ("doc_ids", pa.string())]))


def bigram_counts_topk(docs: rd.Dataset, k: int = 100,
                       num_partitions: "int | None" = None) -> rd.Dataset:
    """Corpus-wide token-bigram top-k (the pair-merge statistic a
    BPE-style tokenizer trainer ranks each round): same
    combiner/partitioned-aggregate/prune plan as ``term_counts_topk``,
    over adjacent-token pairs. Output: (bigram, n), (n desc, bigram
    asc)."""
    from collections import Counter

    from .relational import hash_aggregate

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t.column("text").to_pylist():
            toks = _WS.sub(" ", (text or "")).strip().split(" ")
            c.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
        return pa.table({"bigram": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    counts = hash_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"),
        keys=["bigram"], sum_cols={"n": "n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("bigram", pa.string()),
                              ("n", pa.int64())]))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "bigram"], ascending=[False, True],
                              kind="stable").head(k)

    return (counts.map_batches(local_topk, batch_format="pandas")
            .sort(["n", "bigram"], descending=[True, False]).limit(k))


# Gopher quality-gate constants (Rae et al. 2021, "Scaling Language
# Models", table A1 rules — the widely-reproduced repetition-free
# subset). Thresholds are integers cross-multiplied so the pass/fail
# decision is exact integer arithmetic on both engines.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_ALPHA = re.compile(r"[A-Za-z]")
_GOPHER_SYM = re.compile(r"^(#+|…+)$")


def gopher_quality(docs: rd.Dataset, min_words: int = 10,
                   max_words: int = 100_000) -> rd.Dataset:
    """Gopher-style document quality gate: per-doc integer counts for
    every rule plus the composite ``passes`` flag. Rules (all integer
    comparisons — no float thresholds anywhere):

    * ``min_words <= n_words <= max_words``
    * mean word length in [3, 10]:  ``3*n <= sum_word_len <= 10*n``
    * symbol-word fraction < 10%:   ``10*n_symbol_words < n_words``
      (a symbol word is entirely '#' or '…' characters)
    * bullet-led lines < 90%:       ``10*n_bullet_lines < 9*n_lines``
      (a bullet line starts with '• ' or '- ')
    * ellipsis-ended lines < 30%:   ``10*n_ellipsis_lines < 3*n_lines``
    * alphabetic-word fraction >= 80%: ``5*n_alpha_words >= 4*n_words``
      (word contains at least one [A-Za-z])
    * >= 2 distinct Gopher stopwords present

    Stateless map; list kernels run per batch (pandas str.split once,
    Python set/regex folds over the token lists — the same shape as
    ``quality_scores``/``lang_id``)."""
    stops = set(GOPHER_STOPWORDS)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split()
        lines = df["text"].str.split("\n")
        n_words = toks.str.len().astype("int64")
        sum_wl = toks.map(lambda ws: sum(len(w) for w in ws)).astype("int64")
        n_alpha = toks.map(
            lambda ws: sum(1 for w in ws if _GOPHER_ALPHA.search(w))
        ).astype("int64")
        n_sym = toks.map(
            lambda ws: sum(1 for w in ws if _GOPHER_SYM.match(w))
        ).astype("int64")
        n_lines = lines.str.len().astype("int64")
        n_bullet = lines.map(
            lambda ls: sum(1 for l in ls if l.startswith(("• ", "- ")))
        ).astype("int64")
        n_ell = lines.map(
            lambda ls: sum(1 for l in ls if l.endswith(("…", "...")))
        ).astype("int64")
        n_stop = toks.map(lambda ws: len(stops & set(ws))).astype("int64")
        passes = ((n_words >= min_words) & (n_words <= max_words)
                  & (3 * n_words <= sum_wl) & (sum_wl <= 10 * n_words)
                  & (10 * n_sym < n_words)
                  & (10 * n_bullet < 9 * n_lines)
                  & (10 * n_ell < 3 * n_lines)
                  & (5 * n_alpha >= 4 * n_words)
                  & (n_stop >= 2)).astype("int64")
        return pd.DataFrame({
            "doc_id": df["doc_id"], "n_words": n_words,
            "sum_word_len": sum_wl, "n_alpha_words": n_alpha,
            "n_symbol_words": n_sym, "n_lines": n_lines,
            "n_bullet_lines": n_bullet, "n_ellipsis_lines": n_ell,
            "n_stop_hits": n_stop, "passes": passes,
        })

    return docs.map_batches(f, batch_format="pandas")


def gopher_repetition(docs: rd.Dataset) -> rd.Dataset:
    """Gopher-style repetition-removal signals (Rae et al. 2021 table
    A1, repetition block) as per-doc EXACT INTEGER counters plus the
    composite ``passes`` flag. Documented semantics (mirrored by the
    SQL oracle):

    * a line OCCURRENCE is a duplicate if the identical line appeared
      earlier in the same doc (keep-first, the line_dedup rule);
      ``dup_lines`` counts such occurrences, ``dup_line_chars`` their
      codepoint chars; ``line_chars`` = total chars over all lines
      (newlines excluded).
    * for n in {2,3,4}: the TOP word n-gram is the most frequent
      (ties: lexicographically smallest joined string); ``topN_chars``
      = sum of its word lengths (no separators); the covered-char
      numerator is ``topN_count * topN_chars`` (every occurrence
      counted, overlaps included); denominator ``word_chars`` = sum of
      all word lengths. Docs with < n words have topN_ngram='' and
      zero count/chars.
    * passes (all integer cross-multiplications, <= keeps):
      dup-line fraction <= 30%        (10*dup_lines <= 3*n_lines)
      dup-line char fraction <= 20%   (5*dup_line_chars <= line_chars)
      top-2-gram char fraction <= 20% (5*top2_count*top2_chars <= word_chars)
      top-3-gram char fraction <= 18% (50*... <= 9*word_chars)
      top-4-gram char fraction <= 16% (25*... <= 4*word_chars)

    Stateless map; per-batch pandas split + Counter folds over the
    token lists (the gopher_quality / lang_id shape)."""
    from collections import Counter

    def top_ngram(ws: list, n: int):
        if len(ws) < n:
            return "", 0, 0
        grams = Counter(
            " ".join(ws[i:i + n]) for i in range(len(ws) - n + 1))
        best = min(grams.items(), key=lambda kv: (-kv[1], kv[0]))
        return best[0], best[1], len(best[0]) - (n - 1)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split()
        lines = df["text"].str.split("\n")
        n_lines, dup_lines, line_chars, dup_line_chars = [], [], [], []
        for ls in lines:
            seen, d, lc, dc = set(), 0, 0, 0
            for l in ls:
                lc += len(l)
                if l in seen:
                    d += 1
                    dc += len(l)
                else:
                    seen.add(l)
            n_lines.append(len(ls))
            dup_lines.append(d)
            line_chars.append(lc)
            dup_line_chars.append(dc)
        cols = {"doc_id": df["doc_id"],
                "n_lines": pd.Series(n_lines, dtype="int64").to_numpy(),
                "dup_lines": pd.Series(dup_lines, dtype="int64").to_numpy(),
                "line_chars": pd.Series(line_chars,
                                        dtype="int64").to_numpy(),
                "dup_line_chars": pd.Series(dup_line_chars,
                                            dtype="int64").to_numpy()}
        word_chars = toks.map(
            lambda ws: sum(len(w) for w in ws)).astype("int64")
        for n in (2, 3, 4):
            tri = toks.map(lambda ws, n=n: top_ngram(ws, n))
            cols[f"top{n}_ngram"] = tri.str[0]
            cols[f"top{n}_count"] = tri.str[1].astype("int64")
            cols[f"top{n}_chars"] = tri.str[2].astype("int64")
        cols["word_chars"] = word_chars
        out = pd.DataFrame(cols)
        out["passes"] = (
            (10 * out["dup_lines"] <= 3 * out["n_lines"])
            & (5 * out["dup_line_chars"] <= out["line_chars"])
            & (5 * out["top2_count"] * out["top2_chars"]
               <= out["word_chars"])
            & (50 * out["top3_count"] * out["top3_chars"]
               <= 9 * out["word_chars"])
            & (25 * out["top4_count"] * out["top4_chars"]
               <= 4 * out["word_chars"])).astype("int64")
        return out

    return docs.map_batches(f, batch_format="pandas")


def script_profile(docs: rd.Dataset) -> rd.Dataset:
    """Per-doc Unicode-script profile for curation routing: exact
    codepoint counts of Latin letters, Cyrillic letters (ё/Ё included
    — this is script detection, NOT the M1 normalization alphabet),
    digits and ASCII whitespace, plus ``n_other`` (the remainder of
    the codepoint length) and a deterministic ``dominant`` script
    ('latin' / 'cyrillic' / 'none' when tied). All zero-copy Arrow
    ``count_substring_regex`` kernels — RE2 on both engines, so the
    SQL oracle's regexp_replace-length counts are definitionally
    identical."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        s = pc.cast(t.column("text"), pa.string())
        n_latin = pc.count_substring_regex(s, "[A-Za-z]")
        n_cyr = pc.count_substring_regex(s, "[а-яА-ЯёЁ]")
        n_digit = pc.count_substring_regex(s, "[0-9]")
        n_space = pc.count_substring_regex(s, r"\s")
        total = pc.utf8_length(s)
        known = pc.add(pc.add(n_latin, n_cyr), pc.add(n_digit, n_space))
        n_other = pc.subtract(total, known)
        dom = pc.if_else(
            pc.greater(n_latin, n_cyr), pa.scalar("latin"),
            pc.if_else(pc.greater(n_cyr, n_latin),
                       pa.scalar("cyrillic"), pa.scalar("none")))
        cast = lambda a: pc.cast(a, pa.int64())
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_latin": cast(n_latin),
                         "n_cyrillic": cast(n_cyr),
                         "n_digit": cast(n_digit),
                         "n_space": cast(n_space),
                         "n_other": cast(n_other),
                         "n_total": cast(total),
                         "dominant": dom})

    return docs.map_batches(f, batch_format="pyarrow")


def _bucket_tokens(texts: list, n_buckets: int):
    """Tokenize a batch (shared _WS whitespace convention) and hash
    every token to a fixed bucket: low-8-bytes-little-endian md5 ==
    DuckDB's ``md5_number_lower`` (the ops/dedup.py shingle
    convention), mod n_buckets. A per-batch distinct-token cache runs
    md5 once per unique token. Returns (per-doc token counts int64,
    flat bucket array int64, doc boundaries via counts)."""
    toks_per_doc: list[list[str]] = [
        _WS.sub(" ", (x or "")).strip().split(" ") for x in texts]
    cache: dict[str, int] = {}
    flat = []
    for toks in toks_per_doc:
        for tok in toks:
            b = cache.get(tok)
            if b is None:
                b = int.from_bytes(
                    hashlib.md5(tok.encode()).digest()[8:],
                    "little") % n_buckets
                cache[tok] = b
            flat.append(b)
    counts = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
    return counts, np.array(flat, dtype=np.int64)


def dsir_logratios(docs: rd.Dataset, target_col: str = "lang",
                   target_value: str = "en", n_buckets: int = 1024,
                   smoothing: float = 1.0,
                   id_col: str = "doc_id", text_col: str = "text",
                   num_partitions: "int | None" = None) -> rd.Dataset:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"), hashed-unigram
    variant: tokens hash into ``n_buckets`` fixed buckets; a TARGET
    unigram model (docs where ``target_col == target_value``) and a
    RAW model (all docs) are estimated over the bucket space with
    add-``smoothing`` Laplace smoothing, and every doc scores

        log_ratio(d) = sum over tokens of
                       [ln p_target(bucket) - ln p_raw(bucket)]

    High log_ratio = looks like the target distribution; resample /
    top-k on it to select pretraining data.

    This is DSIR's own scale architecture: model state is EXACTLY
    ``n_buckets`` counters regardless of corpus size, so pass 1 is a
    bincount combiner + one tiny aggregate (the driver touches
    n_buckets rows, never the vocabulary), and pass 2 is a stateless
    map over a broadcast (n_buckets,) float array (``ray.put`` once,
    ~8 KiB at the default 1024). No vocabulary shuffle exists in the
    plan at any scale.

    ``log_ratio`` is quantized to 9 decimals: the engine sums per-doc
    in token order, a SQL oracle sums in join order — equal to ~1e-13
    but not bitwise, and downstream top-k ordering must agree exactly.
    Output: (id_col, n_tokens, log_ratio)."""
    import ray

    from .relational import partial_agg_sum

    lam = float(smoothing)

    def bucket_counts(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        is_tgt = np.array(
            [v == target_value for v in t.column(target_col).to_pylist()],
            dtype=bool)
        counts, flat = _bucket_tokens(texts, n_buckets)
        raw = np.bincount(flat, minlength=n_buckets)
        tgt_mask = np.repeat(is_tgt, counts)
        tgt = np.bincount(flat[tgt_mask], minlength=n_buckets)
        nz = np.nonzero(raw)[0]
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "n_raw": pa.array(raw[nz], pa.int64()),
                         "n_tgt": pa.array(tgt[nz], pa.int64())})

    bc = partial_agg_sum(
        docs.map_batches(bucket_counts, batch_format="pyarrow"),
        "bucket", {"n_raw": "n_raw", "n_tgt": "n_tgt"}
    ).to_pandas()  # bounded: <= n_buckets rows by construction

    raw = np.zeros(n_buckets, dtype=np.float64)
    tgt = np.zeros(n_buckets, dtype=np.float64)
    raw[bc["bucket"].to_numpy()] = bc["n_raw"].to_numpy()
    tgt[bc["bucket"].to_numpy()] = bc["n_tgt"].to_numpy()
    rtot, ttot = raw.sum(), tgt.sum()
    delta = (np.log((tgt + lam) / (ttot + lam * n_buckets))
             - np.log((raw + lam) / (rtot + lam * n_buckets)))
    ref = ray.put(delta)

    def score(t: pa.Table) -> pa.Table:
        d = ray.get(ref)
        counts, flat = _bucket_tokens(t.column(text_col).to_pylist(),
                                      n_buckets)
        sums = np.zeros(len(counts), dtype=np.float64)
        np.add.at(sums, np.repeat(np.arange(len(counts)), counts),
                  d[flat])
        return pa.table({id_col: t.column(id_col),
                         "n_tokens": pa.array(counts, pa.int64()),
                         "log_ratio": pa.array(np.round(sums, 9),
                                               pa.float64())})

    return docs.map_batches(score, batch_format="pyarrow")


def dsir_select_topk(docs: rd.Dataset, k: int = 200,
                     target_col: str = "lang", target_value: str = "en",
                     n_buckets: int = 1024,
                     num_partitions: "int | None" = None) -> rd.Dataset:
    """DSIR selection: the k docs whose hashed-unigram importance
    ratio is highest (ties broken by doc_id) — ``dsir_logratios``
    piped through the grouped_topk combiner (each batch forwards at
    most k rows, one single-partition finish). Output: (doc_id,
    n_tokens, log_ratio)."""
    from .relational import grouped_topk

    scores = dsir_logratios(docs, target_col, target_value, n_buckets,
                            num_partitions=num_partitions)

    def add_const(t: pa.Table) -> pa.Table:
        return t.append_column("_g", pa.array([0] * t.num_rows,
                                              pa.int64()))

    return grouped_topk(
        scores.map_batches(add_const, batch_format="pyarrow"),
        key="_g", order_col="log_ratio", tie_col="doc_id",
        out_cols=["doc_id", "n_tokens", "log_ratio"], k=k,
        num_partitions=num_partitions)


def ccnet_perplexity_buckets(docs: rd.Dataset,
                             cuts: tuple[float, float] = (1 / 3, 2 / 3),
                             num_partitions: "int | None" = None
                             ) -> rd.Dataset:
    """CCNet-style quality bucketing (Wenzek et al. 2020): score every
    doc with the corpus unigram LM (mean NLL — the engine's stand-in
    for the paper's KenLM perplexity) and split the corpus into
    head / middle / tail at the exact ``cuts`` quantiles (low NLL =
    fluent = head). Thresholds come from
    ``exact_quantiles_multipass`` — bounded state at any corpus size,
    bit-identical to quantile_cont — so the bucket edges need no
    sampling. Two scalars cross to the driver; the labeling pass is
    stateless. Output: (doc_id, n_tokens, nll, bucket)."""
    import pyarrow.compute as pc

    from .relational import exact_quantiles_multipass

    scores = unigram_logprob_scores(
        docs, num_partitions=num_partitions).materialize()
    qdf = exact_quantiles_multipass(scores, "nll", list(cuts))
    t1, t2 = (float(v) for v in qdf.sort_values("q")["value"])

    def label(t: pa.Table) -> pa.Table:
        nll = t.column("nll")
        b = pc.if_else(
            pc.less_equal(nll, pa.scalar(t1, pa.float64())),
            pa.scalar("head"),
            pc.if_else(pc.less_equal(nll, pa.scalar(t2, pa.float64())),
                       pa.scalar("middle"), pa.scalar("tail")))
        return t.append_column("bucket", pc.cast(b, pa.string()))

    return scores.map_batches(label, batch_format="pyarrow")


def vocab_zipf(docs: rd.Dataset, top_n: int = 500,
               num_partitions: "int | None" = None) -> rd.Dataset:
    """Zipf rank-frequency fit over the corpus vocabulary: least-
    squares slope/intercept of ln(count) on ln(rank) for the top-N
    terms (rank 1 = most frequent, ties n desc / term asc) — the
    one-number corpus-health signal (natural text ~ -1; template spam
    and boilerplate floods flatten or steepen it). Output ONE row:
    (n_terms, slope, intercept), floats quantized 9 dp.

    Plan: ``term_counts_topk`` (combiner-backed vocabulary aggregate;
    the global sort only ever sees <= P*k pruned survivors), then the
    closed-form fit over the N-row result in one bounded single-
    partition task — state O(top_n), constant in corpus size. The SQL
    oracle computes the identical sum expressions (summation order
    differs; absorbed by the rounding)."""
    import numpy as np

    topk = term_counts_topk(docs, k=top_n,
                            num_partitions=num_partitions)

    def fit(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n", "term"], ascending=[False, True],
                            kind="stable").reset_index(drop=True)
        rank = np.arange(1, len(df) + 1, dtype=np.float64)
        x = np.log(rank)
        y = np.log(df["n"].to_numpy(dtype=np.float64))
        cnt = float(len(df))
        sx, sy = x.sum(), y.sum()
        sxy, sxx = (x * y).sum(), (x * x).sum()
        slope = (cnt * sxy - sx * sy) / (cnt * sxx - sx * sx)
        intercept = (sy - slope * sx) / cnt
        return pd.DataFrame({"n_terms": pd.array([len(df)],
                                                 dtype="int64"),
                             "slope": [round(slope, 9)],
                             "intercept": [round(intercept, 9)]})

    return topk.repartition(1).map_batches(fit, batch_format="pandas")


def _bpe_state(docs: rd.Dataset, n_merges: int,
               num_partitions: "int | None" = None):
    """Byte-pair-encoding MERGE LEARNING over the corpus — the
    tokenizer-training primitive: starting from character symbols,
    each round counts adjacent symbol pairs across the whole corpus
    (weighted by word frequency) and merges the most frequent pair
    (ties: count desc, left asc, right asc). Output one row per
    learned merge: (round, left_sym, right_sym, pair_count).

    Merge application contract (FIXED so the SQL oracle is exact):
    one left-to-right non-overlapping replace pass per round over the
    space-delimited symbol sequence — identical semantics in Python
    ``str.replace`` and SQL ``replace``. A chained repeat (\"a b a b\")
    merges one pair this round and the rest in later rounds (the pair
    stays frequent); canonical BPE differs only in that scheduling.

    Plan: one vocabulary count aggregate (word-frequency combiner —
    pair counting then runs over DISTINCT words, not tokens), then per
    round ONE pair-count combiner exchange + a single-row argmax
    collect (the only driver state: one merge rule per round,
    broadcast back into the next stateless merge map). Vocabulary
    state is one distributed (word, n, seq) table per round."""
    from .relational import hash_aggregate

    from collections import Counter

    num_partitions = _resolve_partitions(num_partitions)

    def wcount(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t.column("text").to_pylist():
            c.update(w for w in _WS.sub(" ", (text or ""))
                     .strip().split(" ") if w)
        return pa.table({"word": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    vocab = hash_aggregate(
        docs.map_batches(wcount, batch_format="pyarrow"),
        keys=["word"], sum_cols={"n": "n"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("word", pa.string()),
                              ("n", pa.int64())]))

    def init_seq(t: pa.Table) -> pa.Table:
        words = t.column("word").to_pylist()
        return pa.table({"word": t.column("word"), "n": t.column("n"),
                         "seq": pa.array([" ".join(w) for w in words],
                                         pa.string())})

    state = vocab.map_batches(init_seq,
                              batch_format="pyarrow").materialize()
    merges = []
    for rnd in range(1, n_merges + 1):
        def pair_partial(t: pa.Table) -> pa.Table:
            c: Counter = Counter()
            ns = t.column("n").to_pylist()
            for seq, n in zip(t.column("seq").to_pylist(), ns):
                syms = seq.split(" ")
                for a, b in zip(syms, syms[1:]):
                    c[(a, b)] += n
            ka = [k[0] for k in c]
            kb = [k[1] for k in c]
            return pa.table({"a": pa.array(ka, pa.string()),
                             "b": pa.array(kb, pa.string()),
                             "cnt": pa.array(list(c.values()),
                                             pa.int64())})

        pcounts = hash_aggregate(
            state.map_batches(pair_partial, batch_format="pyarrow"),
            keys=["a", "b"], sum_cols={"cnt": "cnt"},
            num_partitions=num_partitions,
            out_schema=pa.schema([("a", pa.string()),
                                  ("b", pa.string()),
                                  ("cnt", pa.int64())]))
        top = pcounts.sort(["cnt", "a", "b"],
                           descending=[True, False, False]) \
            .limit(1).take_all()
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], top[0]["cnt"]
        merges.append({"round": rnd, "left_sym": a, "right_sym": b,
                       "pair_count": cnt})
        pat, rep = f" {a} {b} ", f" {a}{b} "

        def apply_merge(t: pa.Table, pat=pat, rep=rep) -> pa.Table:
            seqs = [(" " + s + " ").replace(pat, rep).strip()
                    for s in t.column("seq").to_pylist()]
            return pa.table({"word": t.column("word"),
                             "n": t.column("n"),
                             "seq": pa.array(seqs, pa.string())})

        state = state.map_batches(apply_merge,
                                  batch_format="pyarrow").materialize()
    return state, merges


def bpe_merges(docs: rd.Dataset, n_merges: int = 3,
               num_partitions: "int | None" = None) -> rd.Dataset:
    """The learned merge table (see ``_bpe_state``): one row per
    round — (round, left_sym, right_sym, pair_count)."""
    _state, merges = _bpe_state(docs, n_merges, num_partitions)
    out_schema = pa.schema([("round", pa.int64()),
                            ("left_sym", pa.string()),
                            ("right_sym", pa.string()),
                            ("pair_count", pa.int64())])
    if not merges:
        return rd.from_arrow(out_schema.empty_table())
    return rd.from_arrow(pa.Table.from_pylist(merges, schema=out_schema))


def bpe_vocab(docs: rd.Dataset, n_merges: int = 3,
              num_partitions: "int | None" = None) -> rd.Dataset:
    """The ENCODER side of BPE learning: every vocabulary word with
    its post-merge symbol sequence and symbol count — (word, n, seq,
    n_symbols) after applying the ``n_merges`` learned rules under the
    same single-pass contract. n_symbols x word frequency is the
    corpus token count under the learned tokenizer; the seq column is
    the word's encoding. Distributed state identical to the learning
    pass (the final round's vocabulary table, one stateless length
    map)."""
    state, _merges = _bpe_state(docs, n_merges, num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        seqs = t.column("seq").to_pylist()
        return pa.table({
            "word": t.column("word"), "n": t.column("n"),
            "seq": t.column("seq"),
            "n_symbols": pa.array([s.count(" ") + 1 for s in seqs],
                                  pa.int64())})

    return state.map_batches(finish, batch_format="pyarrow")


def bpe_doc_tokens(docs: rd.Dataset, n_merges: int = 3,
                   num_partitions: "int | None" = None) -> rd.Dataset:
    """Per-document token counts UNDER the learned BPE merges — the
    budgeting number a tokenizer change actually moves: learn
    ``n_merges`` rules (``_bpe_state``), then one per-doc word-count
    combiner, one co-partitioned join against the (word -> n_symbols)
    vocabulary, one per-doc sum. Output (doc_id, n_tokens); documents
    with no words emit no row (matching the SQL join)."""
    import pyarrow.compute as pc

    from .relational import hash_join, partial_agg_sum

    from collections import Counter

    state, _merges = _bpe_state(docs, n_merges, num_partitions)
    vs = state.map_batches(
        lambda t: pa.table({
            "word": t.column("word"),
            "m": pa.array([s.count(" ") + 1
                           for s in t.column("seq").to_pylist()],
                          pa.int64())}),
        batch_format="pyarrow")

    def dwc(t: pa.Table) -> pa.Table:
        d_out, w_out, k_out = [], [], []
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            c: Counter = Counter(
                w for w in _WS.sub(" ", (text or "")).strip().split(" ")
                if w)
            for w, k in c.items():
                d_out.append(doc_id)
                w_out.append(w)
                k_out.append(k)
        return pa.table({"doc_id": pa.array(d_out, pa.int64()),
                         "word": pa.array(w_out, pa.string()),
                         "k": pa.array(k_out, pa.int64())})

    dw = docs.map_batches(dwc, batch_format="pyarrow")
    j = hash_join(
        dw, vs, on="word",
        left_schema=pa.schema([("doc_id", pa.int64()),
                               ("word", pa.string()),
                               ("k", pa.int64())]),
        right_schema=pa.schema([("word", pa.string()),
                                ("m", pa.int64())]),
        num_partitions=num_partitions)

    def mul(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "km": pc.multiply(t.column("k"),
                                           t.column("m"))})

    return partial_agg_sum(
        j.map_batches(mul, batch_format="pyarrow"), "doc_id",
        {"km": "n_tokens"})


def bigram_logprob_scores(docs: rd.Dataset,
                          num_partitions: "int | None" = None,
                          mode: str = "auto",
                          broadcast_max_bigrams: int = 2_000_000
                          ) -> rd.Dataset:
    """Bigram language-model quality score per document: mean negative
    log-likelihood of the doc's adjacent word pairs under the corpus's
    OWN add-one-smoothed bigram model,

        P(w2 | w1) = (c(w1, w2) + 1) / (c1(w1) + V)

    (V = corpus vocabulary size) — the next-order fluency signal after
    ``unigram_logprob_scores``: word-salad that passes a unigram filter
    (common words, wrong order) scores high here. Docs with fewer than
    2 tokens emit no row. Output (doc_id, n_bigrams, nll), nll
    quantized 9 dp (summation order differs from SQL).

    Same two plans as the unigram op behind an auto-switch on the
    DISTRIBUTED bigram-count cardinality: ``broadcast`` ships the
    (-ln p) maps once via ray.put; ``join`` co-partitions the per-doc
    bigram stream against the counts table on the composite (w1, w2)
    key, then against the unigram counts on w1 — neither table ever
    lands on the driver."""
    import ray

    from collections import Counter

    from .relational import hash_aggregate, hash_join

    num_partitions = _resolve_partitions(num_partitions)

    uni = corpus_term_counts(docs, num_partitions).materialize()
    v_size = float(uni.count())

    def big_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t.column("text").to_pylist():
            toks = _WS.sub(" ", (text or "")).strip().split(" ")
            c.update(zip(toks, toks[1:]))
        return pa.table({
            "w1": pa.array([k[0] for k in c], pa.string()),
            "w2": pa.array([k[1] for k in c], pa.string()),
            "cb": pa.array(list(c.values()), pa.int64())})

    big = hash_aggregate(
        docs.map_batches(big_partial, batch_format="pyarrow"),
        keys=["w1", "w2"], sum_cols={"cb": "cb"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("w1", pa.string()), ("w2", pa.string()),
                              ("cb", pa.int64())])).materialize()
    if mode == "auto":
        mode = ("broadcast" if big.count() <= broadcast_max_bigrams
                else "join")

    if mode == "broadcast":
        bdf = big.to_pandas()
        udf = uni.to_pandas()
        c1 = dict(zip(udf["term"], udf["n"]))
        cb = {(a, b): n for a, b, n in zip(bdf["w1"], bdf["w2"],
                                           bdf["cb"])}
        ref = ray.put((cb, c1))

        def score(t: pa.Table) -> pa.Table:
            cbm, c1m = ray.get(ref)
            ids, nb, nll = [], [], []
            for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                    t.column("text").to_pylist()):
                toks = _WS.sub(" ", (text or "")).strip().split(" ")
                if len(toks) < 2:
                    continue
                s = 0.0
                for a, b in zip(toks, toks[1:]):
                    s += -np.log((cbm[(a, b)] + 1.0)
                                 / (c1m[a] + v_size))
                ids.append(doc_id)
                nb.append(len(toks) - 1)
                nll.append(round(s / (len(toks) - 1), 9))
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "n_bigrams": pa.array(nb, pa.int64()),
                             "nll": pa.array(nll, pa.float64())})

        return docs.map_batches(score, batch_format="pyarrow")

    if mode != "join":
        raise ValueError(f"unknown mode {mode!r}")

    def bg_explode(t: pa.Table) -> pa.Table:
        ids, w1s, w2s, tfs = [], [], [], []
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            toks = _WS.sub(" ", (text or "")).strip().split(" ")
            c: Counter = Counter(zip(toks, toks[1:]))
            for (a, b), k in c.items():
                ids.append(doc_id)
                w1s.append(a)
                w2s.append(b)
                tfs.append(k)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "w1": pa.array(w1s, pa.string()),
                         "w2": pa.array(w2s, pa.string()),
                         "tf": pa.array(tfs, pa.int64())})

    stream = docs.map_batches(bg_explode, batch_format="pyarrow")
    j1 = hash_join(
        stream, big, on=["w1", "w2"],
        left_schema=pa.schema([("doc_id", pa.int64()),
                               ("w1", pa.string()),
                               ("w2", pa.string()),
                               ("tf", pa.int64())]),
        right_schema=pa.schema([("w1", pa.string()),
                                ("w2", pa.string()),
                                ("cb", pa.int64())]),
        num_partitions=num_partitions)
    j2 = hash_join(
        j1, uni.map_batches(
            lambda t: pa.table({"w1": t.column("term"),
                                "c1": t.column("n")}),
            batch_format="pyarrow"),
        on="w1",
        left_schema=pa.schema([("doc_id", pa.int64()),
                               ("w1", pa.string()),
                               ("w2", pa.string()),
                               ("tf", pa.int64()),
                               ("cb", pa.int64())]),
        right_schema=pa.schema([("w1", pa.string()),
                                ("c1", pa.int64())]),
        num_partitions=num_partitions)

    def contrib(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy().astype(np.float64)
        cb = t.column("cb").to_numpy().astype(np.float64)
        c1 = t.column("c1").to_numpy().astype(np.float64)
        s = tf * -np.log((cb + 1.0) / (c1 + v_size))
        return pa.table({"doc_id": t.column("doc_id"),
                         "tf": t.column("tf"),
                         "_c": pa.array(s, pa.float64())})

    agg = hash_aggregate(
        j2.map_batches(contrib, batch_format="pyarrow"),
        keys=["doc_id"], sum_cols={"_c": "sum_nll", "tf": "n_bigrams"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("doc_id", pa.int64()),
                              ("sum_nll", pa.float64()),
                              ("n_bigrams", pa.int64())]))

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("sum_nll").to_numpy()
        n = t.column("n_bigrams").to_numpy().astype(np.float64)
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_bigrams": t.column("n_bigrams"),
                         "nll": pa.array(np.round(s / n, 9),
                                         pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def trigram_backoff_scores(docs: rd.Dataset,
                           alpha: float = 0.4,
                           train_mod: int = 2,
                           num_partitions: "int | None" = None,
                           mode: str = "auto",
                           broadcast_max_trigrams: int = 2_000_000
                           ) -> rd.Dataset:
    """Trigram stupid-backoff LM quality score per document (Brants et
    al. 2007, "Large Language Models in Machine Translation"): the
    model is TRAINED on the deterministic held-in split (docs with
    ``doc_id % train_mod == 0``) and scores EVERY doc, so held-out docs
    genuinely exercise the backoff chain (a same-corpus model would
    never back off). Per trigram position (w1, w2, w3):

        S = ct(w1,w2,w3) / cb(w1,w2)                   if ct > 0
          = alpha * cb(w2,w3) / c1(w2)                 elif cb(w2,w3) > 0
          = alpha*alpha * (c1(w3) + 1) / (N + V)       otherwise

    (N = train token count, V = train vocab size; the level-3 add-one
    keeps out-of-vocabulary words finite). Output per doc with >= 3
    tokens: (doc_id, n_trigrams, n_l1, n_l2, n_l3, nll) — the level
    counts are the backoff-pressure observables (a doc scoring mostly
    at level 3 is out-of-domain), nll = mean(-ln S) quantized 9 dp.

    Two plans behind an auto-switch on the DISTRIBUTED trigram-type
    count: ``broadcast`` ships the count dicts once via ray.put;
    ``join`` LEFT-co-partitions the per-doc trigram stream against the
    trigram / bigram(prefix) / bigram(suffix) / unigram count tables —
    five composite-key exchanges, no corpus-sized driver state (the
    10^12-doc plan)."""
    import ray

    from collections import Counter

    from .relational import hash_aggregate, hash_join

    num_partitions = _resolve_partitions(num_partitions)

    def _keep_train(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        return t.filter(pa.array(ids % train_mod == 0))

    train = (docs.map_batches(_keep_train, batch_format="pyarrow")
             if train_mod else docs)

    uni = corpus_term_counts(train, num_partitions).materialize()
    v_size = float(uni.count())
    n_total = float(uni.sum("n"))

    def _ngram_partial(n: int, cols: list[str], out: str):
        def f(t: pa.Table) -> pa.Table:
            c: Counter = Counter()
            for text in t.column("text").to_pylist():
                toks = _WS.sub(" ", (text or "")).strip().split(" ")
                c.update(zip(*(toks[i:] for i in range(n))))
            data = {cols[i]: pa.array([k[i] for k in c], pa.string())
                    for i in range(n)}
            data[out] = pa.array(list(c.values()), pa.int64())
            return pa.table(data)
        return f

    def _ngram_counts(n: int, cols: list[str], out: str) -> rd.Dataset:
        return hash_aggregate(
            train.map_batches(_ngram_partial(n, cols, out),
                              batch_format="pyarrow"),
            keys=cols, sum_cols={out: out},
            num_partitions=num_partitions,
            out_schema=pa.schema([(c, pa.string()) for c in cols]
                                 + [(out, pa.int64())])).materialize()

    big = _ngram_counts(2, ["a", "b"], "cb")
    tri = _ngram_counts(3, ["a", "b", "c"], "ct")
    if mode == "auto":
        mode = ("broadcast" if tri.count() <= broadcast_max_trigrams
                else "join")

    a2 = alpha * alpha

    if mode == "broadcast":
        udf = uni.to_pandas()
        bdf = big.to_pandas()
        tdf = tri.to_pandas()
        c1 = dict(zip(udf["term"], udf["n"]))
        cb = {(a, b): n for a, b, n in zip(bdf["a"], bdf["b"], bdf["cb"])}
        ct = {(a, b, c): n
              for a, b, c, n in zip(tdf["a"], tdf["b"], tdf["c"],
                                    tdf["ct"])}
        ref = ray.put((ct, cb, c1))

        def score(t: pa.Table) -> pa.Table:
            ctm, cbm, c1m = ray.get(ref)
            ids, nt, l1, l2, l3, nll = [], [], [], [], [], []
            for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                    t.column("text").to_pylist()):
                toks = _WS.sub(" ", (text or "")).strip().split(" ")
                if len(toks) < 3:
                    continue
                s = 0.0
                k1 = k2 = k3 = 0
                for w1, w2, w3 in zip(toks, toks[1:], toks[2:]):
                    ctn = ctm.get((w1, w2, w3), 0)
                    if ctn > 0:
                        s += -np.log(ctn / cbm[(w1, w2)])
                        k1 += 1
                        continue
                    cbn = cbm.get((w2, w3), 0)
                    if cbn > 0:
                        s += -np.log(alpha * cbn / c1m[w2])
                        k2 += 1
                    else:
                        s += -np.log(a2 * (c1m.get(w3, 0) + 1.0)
                                     / (n_total + v_size))
                        k3 += 1
                ids.append(doc_id)
                nt.append(len(toks) - 2)
                l1.append(k1)
                l2.append(k2)
                l3.append(k3)
                nll.append(round(s / (len(toks) - 2), 9))
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "n_trigrams": pa.array(nt, pa.int64()),
                             "n_l1": pa.array(l1, pa.int64()),
                             "n_l2": pa.array(l2, pa.int64()),
                             "n_l3": pa.array(l3, pa.int64()),
                             "nll": pa.array(nll, pa.float64())})

        return docs.map_batches(score, batch_format="pyarrow")

    if mode != "join":
        raise ValueError(f"unknown mode {mode!r}")

    def tg_explode(t: pa.Table) -> pa.Table:
        ids, w1s, w2s, w3s, tfs = [], [], [], [], []
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            toks = _WS.sub(" ", (text or "")).strip().split(" ")
            c: Counter = Counter(zip(toks, toks[1:], toks[2:]))
            for (w1, w2, w3), k in c.items():
                ids.append(doc_id)
                w1s.append(w1)
                w2s.append(w2)
                w3s.append(w3)
                tfs.append(k)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "w1": pa.array(w1s, pa.string()),
                         "w2": pa.array(w2s, pa.string()),
                         "w3": pa.array(w3s, pa.string()),
                         "tf": pa.array(tfs, pa.int64())})

    def _rename(ds: rd.Dataset, mapping: dict[str, str]) -> rd.Dataset:
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns([mapping.get(n, n)
                                     for n in t.column_names])
        return ds.map_batches(f, batch_format="pyarrow")

    stream = docs.map_batches(tg_explode, batch_format="pyarrow")
    sch = [("doc_id", pa.int64()), ("w1", pa.string()),
           ("w2", pa.string()), ("w3", pa.string()), ("tf", pa.int64())]
    j = hash_join(
        stream, _rename(tri, {"a": "w1", "b": "w2", "c": "w3"}),
        on=["w1", "w2", "w3"], how="left",
        left_schema=pa.schema(sch),
        right_schema=pa.schema([("w1", pa.string()), ("w2", pa.string()),
                                ("w3", pa.string()), ("ct", pa.int64())]),
        num_partitions=num_partitions)
    sch.append(("ct", pa.int64()))
    j = hash_join(
        j, _rename(big, {"a": "w1", "b": "w2", "cb": "cb12"}),
        on=["w1", "w2"], how="left", left_schema=pa.schema(sch),
        right_schema=pa.schema([("w1", pa.string()), ("w2", pa.string()),
                                ("cb12", pa.int64())]),
        num_partitions=num_partitions)
    sch.append(("cb12", pa.int64()))
    j = hash_join(
        j, _rename(big, {"a": "w2", "b": "w3", "cb": "cb23"}),
        on=["w2", "w3"], how="left", left_schema=pa.schema(sch),
        right_schema=pa.schema([("w2", pa.string()), ("w3", pa.string()),
                                ("cb23", pa.int64())]),
        num_partitions=num_partitions)
    sch.append(("cb23", pa.int64()))
    j = hash_join(
        j, _rename(uni, {"term": "w2", "n": "c1w2"}),
        on="w2", how="left", left_schema=pa.schema(sch),
        right_schema=pa.schema([("w2", pa.string()),
                                ("c1w2", pa.int64())]),
        num_partitions=num_partitions)
    sch.append(("c1w2", pa.int64()))
    j = hash_join(
        j, _rename(uni, {"term": "w3", "n": "c1w3"}),
        on="w3", how="left", left_schema=pa.schema(sch),
        right_schema=pa.schema([("w3", pa.string()),
                                ("c1w3", pa.int64())]),
        num_partitions=num_partitions)

    def contrib(t: pa.Table) -> pa.Table:
        def col(name):
            return np.nan_to_num(t.column(name).to_numpy(
                zero_copy_only=False).astype(np.float64))
        tf = col("tf")
        ct = col("ct")
        cb12 = col("cb12")
        cb23 = col("cb23")
        c1w2 = col("c1w2")
        c1w3 = col("c1w3")
        lvl1 = ct > 0
        lvl2 = ~lvl1 & (cb23 > 0)
        lvl3 = ~lvl1 & ~lvl2
        with np.errstate(divide="ignore", invalid="ignore"):
            s = np.where(
                lvl1, -np.log(ct / cb12),
                np.where(lvl2, -np.log(alpha * cb23 / c1w2),
                         -np.log(a2 * (c1w3 + 1.0)
                                 / (n_total + v_size))))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "tf": t.column("tf"),
            "_c": pa.array(s * tf, pa.float64()),
            "_l1": pa.array((lvl1 * tf).astype(np.int64), pa.int64()),
            "_l2": pa.array((lvl2 * tf).astype(np.int64), pa.int64()),
            "_l3": pa.array((lvl3 * tf).astype(np.int64), pa.int64())})

    agg = hash_aggregate(
        j.map_batches(contrib, batch_format="pyarrow"),
        keys=["doc_id"],
        sum_cols={"_c": "sum_nll", "tf": "n_trigrams",
                  "_l1": "n_l1", "_l2": "n_l2", "_l3": "n_l3"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("doc_id", pa.int64()),
                              ("sum_nll", pa.float64()),
                              ("n_trigrams", pa.int64()),
                              ("n_l1", pa.int64()),
                              ("n_l2", pa.int64()),
                              ("n_l3", pa.int64())]))

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("sum_nll").to_numpy()
        n = t.column("n_trigrams").to_numpy().astype(np.float64)
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_trigrams": t.column("n_trigrams"),
                         "n_l1": t.column("n_l1"),
                         "n_l2": t.column("n_l2"),
                         "n_l3": t.column("n_l3"),
                         "nll": pa.array(np.round(s / n, 9),
                                         pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


# -------------------------------------------------------------------------
# Phrase search (exact token-sequence match) — the positional-index
# retrieval shape: scan plan for raw docs, adjacency-join plan for
# pre-exploded postings
# -------------------------------------------------------------------------

def phrase_match(docs: rd.Dataset, phrase: "list[str]",
                 id_col: str = "doc_id",
                 text_col: str = "text") -> rd.Dataset:
    """Docs containing the exact token sequence ``phrase`` (whitespace
    tokenization, same normal form as ``inverted_index``), with the
    occurrence count (overlapping starts each count). STATELESS scan —
    zero shuffles; the right plan whenever the raw text is on hand.
    Output: (id_col, n_matches), matches only."""
    if not phrase:
        raise ValueError("phrase_match: empty phrase")
    k = len(phrase)

    def scan(t: pa.Table) -> pa.Table:
        ids, counts = [], []
        for doc_id, text in zip(t.column(id_col).to_pylist(),
                                t.column(text_col).to_pylist()):
            toks = _WS.sub(" ", (text or "")).strip().split(" ")
            n = sum(1 for i in range(len(toks) - k + 1)
                    if toks[i:i + k] == phrase)
            if n:
                ids.append(doc_id)
                counts.append(n)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_matches": pa.array(counts, pa.int64())})

    return docs.map_batches(scan, batch_format="pyarrow")


def positional_postings(docs: rd.Dataset, terms=None,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> rd.Dataset:
    """Positional posting explode: one (term, doc_id, pos) row per
    token occurrence (pos is 0-based). ``terms`` prunes AT THE EXPLODE
    — a k-term phrase query ships only the phrase terms' postings into
    the exchange, not the corpus."""
    want = set(terms) if terms is not None else None

    def explode(t: pa.Table) -> pa.Table:
        terms_out, ids, pos = [], [], []
        for doc_id, text in zip(t.column(id_col).to_pylist(),
                                t.column(text_col).to_pylist()):
            for p, tok in enumerate(
                    _WS.sub(" ", (text or "")).strip().split(" ")):
                if want is None or tok in want:
                    terms_out.append(tok)
                    ids.append(doc_id)
                    pos.append(p)
        return pa.table({"term": pa.array(terms_out, pa.string()),
                         id_col: pa.array(ids, pa.int64()),
                         "pos": pa.array(pos, pa.int64())})

    return docs.map_batches(explode, batch_format="pyarrow")


def phrase_match_postings(postings: rd.Dataset, phrase: "list[str]",
                          id_col: str = "doc_id",
                          num_partitions: "int | None" = None) -> rd.Dataset:
    """Phrase match over a positional index — the plan when only the
    INDEX exists (the raw text stayed cold). A posting of phrase slot
    j at position p contributes candidate start s = p - j; a start
    where all k slots contributed is a match. Handles repeated phrase
    terms (each posting fans out to every slot its term occupies).
    ONE doc-hash exchange; per-partition vectorized verify.
    Output: (id_col, n_matches), matches only — identical to
    ``phrase_match`` on the same corpus (tested + oracled)."""
    from .relational import _resolve_partitions, typed_groupby_map

    if not phrase:
        raise ValueError("phrase_match_postings: empty phrase")
    k = len(phrase)
    slots: "dict[str, list[int]]" = {}
    for j, w in enumerate(phrase):
        slots.setdefault(w, []).append(j)
    num_partitions = _resolve_partitions(num_partitions)

    def candidates(t: pa.Table) -> pa.Table:
        ids, starts, js = [], [], []
        for term, doc_id, p in zip(t.column("term").to_pylist(),
                                   t.column(id_col).to_pylist(),
                                   t.column("pos").to_pylist()):
            for j in slots.get(term, ()):
                if p - j >= 0:
                    ids.append(doc_id)
                    starts.append(p - j)
                    js.append(j)
        out = pa.table({id_col: pa.array(ids, pa.int64()),
                        "s": pa.array(starts, pa.int64()),
                        "j": pa.array(js, pa.int64())})
        part = pa.array(np.asarray(ids, dtype=np.int64) % num_partitions
                        if ids else np.array([], dtype=np.int64),
                        pa.int64())
        return out.append_column("_part", part)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        full = (g.groupby([id_col, "s"])["j"].nunique()
                 .reset_index(name="nj"))
        hits = full[full["nj"] == k]
        out = hits.groupby(id_col).size().reset_index(name="n_matches")
        out["n_matches"] = out["n_matches"].astype("int64")
        return out

    cand = postings.map_batches(candidates, batch_format="pyarrow")
    return typed_groupby_map(
        cand, "_part", verify,
        out_schema=pa.schema([(id_col, pa.int64()),
                              ("n_matches", pa.int64())]))

"""Record linkage / entity resolution — the KG entity-merge stage.

The reference links a cell mention to KB entities whose label matches
the M1-normalized mention EXACTLY or by substring
(``components/CanonicalTableAnnotator.php:121-137`` normalization,
``:223-237`` candidate lookup).  A web-scale KG build additionally
needs NEAR-match linkage (typos in anchor/cell surfaces) and
duplicate-entity merging — this module supplies both as blocked fuzzy
joins that never go quadratic:

* :func:`fuzzy_label_match` — mention→entity candidate pairs within a
  byte-level Levenshtein budget, via symmetric-deletion blocking
  (SymSpell): two strings within edit distance ``d`` of each other
  always share at least one key in the union of their depth-``d``
  deletion neighborhoods, so a hash-join on deletion keys has perfect
  recall and the exact verify only runs on blocked candidates.
* :func:`entity_resolution` — duplicate-entity clusters: the same
  blocking applied label-vs-label, then connected components over the
  matched-entity graph, canonical id = lexicographic min entity.

Distance semantics are BYTE-level Levenshtein over the UTF-8 encoding
(PHP ``levenshtein()`` semantics, ``CanonicalTableAnnotator.php:223``;
DuckDB's ``levenshtein`` is byte-level too, so oracles align exactly).

Scale notes (the 100-TB contract):

* Each input string of L bytes emits L+1 deletion keys at depth 1
  (O(L^2) at depth 2) — linear explode, one hash exchange on the key.
* Verify cost is |blocked candidate pairs| × O(d·L) banded DP — the
  whole point of blocking; no all-pairs path exists at any size.
* Hot keys: very short norms produce deletion keys shared by many
  strings (the classic SymSpell skew).  Norms with ``len(bytes) <=
  max_dist`` emit only their identity key, and the candidate join is a
  :func:`~tabbyray.ops.relational.hash_join` that accepts
  ``skew_threshold`` for salted sub-splits of an oversized block.
* Component state in :func:`entity_resolution` is one row per entity
  per round (`connected_components` contract) — bounded by the entity
  catalog, not the corpus.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..normalize import normalize_batch
from .relational import auto_partitions, grouped_argmax, hash_aggregate, \
    hash_join


def deletion_keys(b: bytes, max_dist: int) -> set[bytes]:
    """Depth-``max_dist`` symmetric-deletion neighborhood of ``b``
    (the string itself plus every string reachable by deleting up to
    ``max_dist`` single bytes).  The EMPTY key is emitted for strings
    of ``len <= max_dist`` — required for recall (length-1
    substitution pairs like ``a``/``b`` meet ONLY at ``""``); it
    blocks all such ultra-short norms together, which is bounded skew
    (post-M1 norms this short are rare) and salted by the join's
    ``skew_threshold`` when not."""
    out = {b}
    frontier = {b}
    for _ in range(max_dist):
        nxt = set()
        for s in frontier:
            for i in range(len(s)):
                nxt.add(s[:i] + s[i + 1:])
        out |= nxt
        frontier = nxt
    return out


def byte_lev_within(a: bytes, b: bytes, k: int) -> int:
    """Byte-level Levenshtein distance of ``a``/``b`` if it is
    ``<= k``, else ``k + 1`` (banded DP, O(k·min(len)) per pair)."""
    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la > k:
        return k + 1
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        cur = [j] + [0] * la
        lo = max(1, j - k)
        hi = min(la, j + k)
        if lo > 1:
            cur[lo - 1] = k + 1
        # cur[0] = j is a real DP cell (empty-a prefix): in-band iff
        # j <= k — without it an empty/short `a` early-exits wrongly
        best = j if j <= k else k + 1
        for i in range(lo, hi + 1):
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1,
                         prev[i - 1] + (a[i - 1] != b[j - 1]))
            best = min(best, cur[i])
        if best > k:
            return k + 1
        prev = cur
    return prev[la] if prev[la] <= k else k + 1


def _explode_keys(ds: rd.Dataset, text_col: str, carry: list[str],
                  max_dist: int, out_schema: pa.Schema) -> rd.Dataset:
    """(key, *carry) rows: one per deletion key per input row.  Keys
    are hex-encoded (deleting one byte from UTF-8 can produce invalid
    UTF-8, which an Arrow string column would reject)."""

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        keys, idx = [], []
        texts = t.column(text_col).to_pylist()
        cache: dict[str, list[str]] = {}
        for r, s in enumerate(texts):
            ks = cache.get(s)
            if ks is None:
                ks = [d.hex() for d in
                      deletion_keys(s.encode("utf-8"), max_dist)]
                cache[s] = ks
            keys.extend(ks)
            idx.extend([r] * len(ks))
        taken = t.select(carry).take(pa.array(idx, pa.int64()))
        cols = {"key": pa.array(keys, pa.string())}
        for c in carry:
            cols[c] = taken.column(c)
        return pa.table(cols, schema=out_schema)

    return ds.map_batches(explode, batch_format="pyarrow")


def _normed(ds: rd.Dataset, text_col: str, keep: list[str],
            out_col: str) -> rd.Dataset:
    """M1-normalize ``text_col`` into ``out_col``; drop rows whose norm
    is empty (the reference's empty/invalid filter, M2)."""

    def norm(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c) for c in keep}
        cols[out_col] = normalize_batch(t.column(text_col))
        out = pa.table(cols)
        return out.filter(pc.not_equal(out.column(out_col), ""))

    return ds.map_batches(norm, batch_format="pyarrow")


def fuzzy_label_match(mentions: rd.Dataset, labels: rd.Dataset,
                      mention_id_col: str = "mention_id",
                      surface_col: str = "surface",
                      entity_col: str = "entity",
                      label_col: str = "label",
                      max_dist: int = 1,
                      num_partitions: "int | None" = None,
                      skew_threshold: "int | None" = None) -> rd.Dataset:
    """Fuzzy entity linking: (mention_id, mnorm, entity, lnorm, dist)
    for every (mention, entity) whose normalized surface is within
    byte-Levenshtein ``max_dist`` of one of the entity's normalized
    labels; ``dist`` = the MINIMUM distance across that entity's
    matching labels, ``lnorm`` = the lexicographically smallest label
    norm achieving it (deterministic under multi-label entities).

    Plan: M1-normalize both sides (stateless map) -> deletion-key
    explode (linear) -> key-hash join -> candidate dedup (pair-hash
    aggregate; a pair can share many keys) -> banded byte-Levenshtein
    verify (vector of blocked pairs only) -> per-(mention, entity)
    argmin.  Three hash exchanges, no broadcast, no driver state."""
    num_partitions = num_partitions or auto_partitions()

    m = _normed(mentions, surface_col, [mention_id_col], "mnorm")
    lab = _normed(labels, label_col, [entity_col], "lnorm")
    # distinct (entity, lnorm): duplicate raw labels with one norm
    # must not multiply candidate rows
    lab = hash_aggregate(
        lab.map_batches(
            lambda t: t.append_column(
                "one", pa.array([1] * t.num_rows, pa.int64())),
            batch_format="pyarrow"),
        keys=[entity_col, "lnorm"], sum_cols={"one": "_c"},
        num_partitions=num_partitions,
        out_schema=pa.schema([(entity_col, pa.string()),
                              ("lnorm", pa.string()),
                              ("_c", pa.int64())])).drop_columns(["_c"])

    mk = _explode_keys(m, "mnorm", [mention_id_col, "mnorm"], max_dist,
                       pa.schema([("key", pa.string()),
                                  (mention_id_col, pa.int64()),
                                  ("mnorm", pa.string())]))
    lk = _explode_keys(lab, "lnorm", [entity_col, "lnorm"], max_dist,
                       pa.schema([("key", pa.string()),
                                  (entity_col, pa.string()),
                                  ("lnorm", pa.string())]))

    cand = hash_join(
        mk, lk, on="key", num_partitions=num_partitions,
        skew_threshold=skew_threshold,
        left_schema=pa.schema([("key", pa.string()),
                               (mention_id_col, pa.int64()),
                               ("mnorm", pa.string())]),
        right_schema=pa.schema([("key", pa.string()),
                                (entity_col, pa.string()),
                                ("lnorm", pa.string())]))
    cand = hash_aggregate(
        cand.map_batches(
            lambda t: t.drop_columns(["key"]).append_column(
                "one", pa.array([1] * t.num_rows, pa.int64())),
            batch_format="pyarrow"),
        keys=[mention_id_col, "mnorm", entity_col, "lnorm"],
        sum_cols={"one": "_c"}, num_partitions=num_partitions,
        out_schema=pa.schema([(mention_id_col, pa.int64()),
                              ("mnorm", pa.string()),
                              (entity_col, pa.string()),
                              ("lnorm", pa.string()),
                              ("_c", pa.int64())])).drop_columns(["_c"])

    verified_schema = pa.schema([(mention_id_col, pa.int64()),
                                 ("mnorm", pa.string()),
                                 (entity_col, pa.string()),
                                 ("lnorm", pa.string()),
                                 ("dist", pa.int64())])

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return verified_schema.empty_table()
        ms = t.column("mnorm").to_pylist()
        ls = t.column("lnorm").to_pylist()
        cache: dict[tuple, int] = {}
        dist = []
        for a, b in zip(ms, ls):
            d = cache.get((a, b))
            if d is None:
                d = byte_lev_within(a.encode(), b.encode(), max_dist)
                cache[(a, b)] = d
            dist.append(d)
        t = t.append_column("dist", pa.array(dist, pa.int64()))
        return t.filter(pc.less_equal(t.column("dist"),
                                      max_dist)).cast(verified_schema)

    pairs = cand.map_batches(verify, batch_format="pyarrow")

    # per-(mention, entity) argmin over the entity's labels:
    # order by -dist (grouped_argmax keeps the max), tie-break lnorm
    # asc; grouped_argmax keys on ONE column, so fuse the pair into a
    # synthetic key (mention ids are int64 — no separator ambiguity)
    def neg(t: pa.Table) -> pa.Table:
        me = pc.binary_join_element_wise(
            pc.cast(t.column(mention_id_col), pa.string()),
            t.column(entity_col), "|")
        return (t.append_column("_negd", pc.multiply(t.column("dist"), -1))
                .append_column("_mekey", me))

    return grouped_argmax(
        pairs.map_batches(neg, batch_format="pyarrow"),
        key="_mekey", order_col="_negd", tie_col="lnorm",
        out_cols=[mention_id_col, "mnorm", entity_col, "lnorm", "dist"],
        num_partitions=num_partitions)


def fuzzy_match_top1(matches: rd.Dataset,
                     mention_id_col: str = "mention_id",
                     entity_col: str = "entity",
                     num_partitions: "int | None" = None) -> rd.Dataset:
    """Winning entity per mention from :func:`fuzzy_label_match`
    output — the reference's C8 argmax rule transplanted to linkage:
    smallest distance wins, ties broken by entity ascending
    (``commands/SpreadsheetController.php:588-592``)."""

    def neg(t: pa.Table) -> pa.Table:
        return t.append_column("_negd", pc.multiply(t.column("dist"), -1))

    return grouped_argmax(
        matches.map_batches(neg, batch_format="pyarrow"),
        key=mention_id_col, order_col="_negd", tie_col=entity_col,
        out_cols=[mention_id_col, "mnorm", entity_col, "dist"],
        num_partitions=num_partitions or auto_partitions())


def string_components(edges: rd.Dataset, nodes: rd.Dataset,
                      edge_cols: tuple = ("a", "b"),
                      node_col: str = "node",
                      num_partitions: "int | None" = None,
                      mode: str = "auto",
                      local_max_edges: int = 5_000_000,
                      local_max_nodes: int = 2_000_000) -> rd.Dataset:
    """(node, component) over STRING node ids; component = the
    lexicographically smallest node in the connected component.

    Two plans (the pagerank count-gate pattern — both verified under
    the same oracles via forced-mode queries):

    - ``local`` (auto when the graph fits the gates): the edge/node
      sets are CATALOG-sized relations (entity duplicates, not the
      corpus) — one bounded collect + union-find beats paying the
      per-round exchange overhead of label propagation times the
      cluster diameter (measured 37 s -> <1 s at 3k edges; chains of
      numeric-suffix labels make diameters of 10+ common).
    - ``join``: the 63-bit-md5 bridge into the int-keyed distributed
      label propagation (as ``tabbyray.ops.web.host_components``),
      one grouped min-string remap + one co-partitioned join restore
      readable ids.  The at-scale path: per-round state is one row
      per node, all exchanges hash-partitioned."""
    num_partitions = num_partitions or auto_partitions()
    ca, cb = edge_cols

    edges = edges.materialize()
    nodes = nodes.materialize()
    if mode == "auto":
        mode = ("local" if edges.count() <= local_max_edges
                and nodes.count() <= local_max_nodes else "join")

    if mode == "local":
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:      # path compression
                parent[x], x = r, parent[x]
            return r

        for r in nodes.iter_rows():
            parent.setdefault(r[node_col], r[node_col])
        for r in edges.iter_rows():
            a, b = r[ca], r[cb]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
        # representative = lexicographic min member
        rep: dict[str, str] = {}
        for x in parent:
            r = find(x)
            if r not in rep or x < rep[r]:
                rep[r] = x
        out = pa.table({node_col: pa.array(list(parent), pa.string()),
                        "component": pa.array(
                            [rep[find(x)] for x in parent],
                            pa.string())})
        return rd.from_arrow(out)

    if mode != "join":
        raise ValueError(f"unknown mode {mode!r}")
    from .graph import connected_components

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
        t = t.filter(pc.invert(pc.equal(t.column(ca), t.column(cb))))
        return pa.table({"ha": _h63(t.column(ca).combine_chunks()),
                         "hb": _h63(t.column(cb).combine_chunks())})

    def node_rows(t: pa.Table) -> pa.Table:
        schema = pa.schema([("name", pa.string()), ("node", pa.int64()),
                            ("one", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        names = t.column(node_col).combine_chunks().unique()
        return pa.table({"name": names, "node": _h63(names),
                         "one": pa.array([1] * len(names), pa.int64())})

    named = hash_aggregate(
        nodes.map_batches(node_rows, batch_format="pyarrow"),
        keys=["name", "node"], sum_cols={"one": "_c"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("name", pa.string()),
                              ("node", pa.int64()),
                              ("_c", pa.int64())])
    ).drop_columns(["_c"]).materialize()

    comps = connected_components(
        edges.map_batches(int_pairs, batch_format="pyarrow"),
        named.select_columns(["node"]),
        pair_cols=("ha", "hb"), node_col="node",
        num_partitions=num_partitions)

    members = hash_join(
        named, comps, on="node", num_partitions=num_partitions,
        left_schema=pa.schema([("name", pa.string()),
                               ("node", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()),
                                ("component", pa.int64())])).materialize()

    def with_zero(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_zero", pa.array([0] * t.num_rows, pa.int64()))

    reps = grouped_argmax(
        members.map_batches(with_zero, batch_format="pyarrow"),
        key="component", order_col="_zero", tie_col="name",
        out_cols=["component", "name"],
        num_partitions=num_partitions).map_batches(
            lambda t: pa.table({"component": t.column("component"),
                                "rep": t.column("name")}),
            batch_format="pyarrow")

    out = hash_join(
        members.select_columns(["name", "component"]), reps,
        on="component", num_partitions=num_partitions,
        left_schema=pa.schema([("name", pa.string()),
                               ("component", pa.int64())]),
        right_schema=pa.schema([("component", pa.int64()),
                                ("rep", pa.string())]))

    return out.map_batches(
        lambda t: pa.table({node_col: t.column("name"),
                            "component": t.column("rep")}),
        batch_format="pyarrow")


def entity_resolution(labels: rd.Dataset,
                      entity_col: str = "entity",
                      label_col: str = "label",
                      max_dist: int = 1,
                      num_partitions: "int | None" = None,
                      skew_threshold: "int | None" = None,
                      normalize: bool = True,
                      components_mode: str = "auto") -> rd.Dataset:
    """Duplicate-entity merge: (entity, canonical) for every entity
    with at least one non-empty label norm; canonical = lexicographic
    min entity of the duplicate cluster (singletons map to
    themselves).  Two entities are duplicates when ANY pair of their
    normalized labels is within byte-Levenshtein ``max_dist``
    (including distinct entities sharing one exact norm — distance 0);
    clusters are the transitive closure of that relation.

    Plan: label norms -> deletion-key explode -> key-hash SELF-join ->
    entity-pair dedup -> banded verify -> string connected components
    (:func:`string_components`).  Per-round component state is one row
    per entity — the entity catalog, not the corpus, bounds it.

    ``normalize=False`` matches on the RAW label bytes (empty labels
    still dropped) — for identifier-like labels (URI local names)
    where the M1 surface-text chain would be wrong."""
    num_partitions = num_partitions or auto_partitions()

    if normalize:
        lab = _normed(labels, label_col, [entity_col], "lnorm")
    else:
        def raw(t: pa.Table) -> pa.Table:
            out = pa.table({entity_col: pc.cast(t.column(entity_col),
                                                pa.string()),
                            "lnorm": pc.cast(t.column(label_col),
                                             pa.string())})
            return out.filter(pc.not_equal(out.column("lnorm"), ""))
        lab = labels.map_batches(raw, batch_format="pyarrow")
    lab = hash_aggregate(
        lab.map_batches(
            lambda t: t.append_column(
                "one", pa.array([1] * t.num_rows, pa.int64())),
            batch_format="pyarrow"),
        keys=[entity_col, "lnorm"], sum_cols={"one": "_c"},
        num_partitions=num_partitions,
        out_schema=pa.schema([(entity_col, pa.string()),
                              ("lnorm", pa.string()),
                              ("_c", pa.int64())])
    ).drop_columns(["_c"]).materialize()   # consumed by 3 stages below

    keyed = _explode_keys(lab, "lnorm", [entity_col, "lnorm"], max_dist,
                          pa.schema([("key", pa.string()),
                                     (entity_col, pa.string()),
                                     ("lnorm", pa.string())]))

    right = keyed.map_batches(
        lambda t: pa.table({"key": t.column("key"),
                            "e2": t.column(entity_col),
                            "l2": t.column("lnorm")}),
        batch_format="pyarrow")

    cand = hash_join(
        keyed, right, on="key", num_partitions=num_partitions,
        skew_threshold=skew_threshold,
        left_schema=pa.schema([("key", pa.string()),
                               (entity_col, pa.string()),
                               ("lnorm", pa.string())]),
        right_schema=pa.schema([("key", pa.string()),
                                ("e2", pa.string()),
                                ("l2", pa.string())]))

    def ordered(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column(entity_col), t.column("e2")))
        return pa.table({"e1": t.column(entity_col),
                         "e2": t.column("e2"),
                         "l1": t.column("lnorm"),
                         "l2": t.column("l2"),
                         "one": pa.array([1] * t.num_rows, pa.int64())})

    cand = hash_aggregate(
        cand.map_batches(ordered, batch_format="pyarrow"),
        keys=["e1", "e2", "l1", "l2"], sum_cols={"one": "_c"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("e1", pa.string()), ("e2", pa.string()),
                              ("l1", pa.string()), ("l2", pa.string()),
                              ("_c", pa.int64())])).drop_columns(["_c"])

    edge_schema = pa.schema([("e1", pa.string()), ("e2", pa.string())])

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return edge_schema.empty_table()
        l1 = t.column("l1").to_pylist()
        l2 = t.column("l2").to_pylist()
        cache: dict[tuple, bool] = {}
        ok = []
        for a, b in zip(l1, l2):
            kk = (a, b) if a <= b else (b, a)
            v = cache.get(kk)
            if v is None:
                v = byte_lev_within(a.encode(), b.encode(),
                                    max_dist) <= max_dist
                cache[kk] = v
            ok.append(v)
        t = t.filter(pa.array(ok, pa.bool_()))
        return t.select(["e1", "e2"])

    edges = cand.map_batches(verify, batch_format="pyarrow")
    # a pair may verify through several label pairs — dedup the edge
    edges = hash_aggregate(
        edges.map_batches(
            lambda t: t.append_column(
                "one", pa.array([1] * t.num_rows, pa.int64())),
            batch_format="pyarrow"),
        keys=["e1", "e2"], sum_cols={"one": "_c"},
        num_partitions=num_partitions,
        out_schema=pa.schema([("e1", pa.string()), ("e2", pa.string()),
                              ("_c", pa.int64())])).drop_columns(["_c"])

    return string_components(
        edges, lab.select_columns([entity_col]).map_batches(
            lambda t: t.rename_columns(["node"]), batch_format="pyarrow"),
        edge_cols=("e1", "e2"), node_col="node",
        num_partitions=num_partitions,
        mode=components_mode).map_batches(
            lambda t: pa.table({entity_col: t.column("node"),
                                "canonical": t.column("component")}),
            batch_format="pyarrow")


def resolve_triple_subjects(triples: rd.Dataset,
                            prefix: str = "http://dbpedia.org/resource/",
                            max_dist: int = 1,
                            num_partitions: "int | None" = None,
                            components_mode: str = "auto") -> rd.Dataset:
    """KG entity-merge applied to a triple stream: subjects whose URI
    local names (the ``prefix``-stripped tail) sit within
    byte-Levenshtein ``max_dist`` merge into one canonical subject
    (connected components, canonical = min URI), and every triple is
    rewritten through the resolution map — ``subj`` becomes the
    canonical URI, the original rides along as ``subj_raw``, all other
    columns pass through.  Resolution runs on RAW local names
    (identifiers, not surface text).

    The dedup step between triple materialization and graph load —
    wired into the CLI as ``--resolve-entities``."""
    s = triples.schema()
    names = list(s.names)
    types = dict(zip(s.names, s.types))
    carry = [c for c in names if c != "subj"]

    def to_labels(t: pa.Table) -> pa.Table:
        subj = t.column("subj")
        return pa.table({"entity": subj,
                         "label": pc.replace_substring(
                             subj, pattern=prefix, replacement="")})

    res = entity_resolution(
        triples.map_batches(to_labels, batch_format="pyarrow"),
        normalize=False, max_dist=max_dist,
        num_partitions=num_partitions,
        components_mode=components_mode)

    left_schema = pa.schema([("entity", pa.string())]
                            + [(c, types[c]) for c in carry])
    out = hash_join(
        triples.map_batches(
            lambda t: t.rename_columns(
                ["entity" if c == "subj" else c for c in t.column_names]),
            batch_format="pyarrow"),
        res, on="entity", num_partitions=num_partitions,
        left_schema=left_schema,
        right_schema=pa.schema([("entity", pa.string()),
                                ("canonical", pa.string())]))

    def finish(t: pa.Table) -> pa.Table:
        cols = {"subj": t.column("canonical"),
                "subj_raw": t.column("entity")}
        for c in carry:
            cols[c] = t.column(c)
        return pa.table(cols)

    return out.map_batches(finish, batch_format="pyarrow")

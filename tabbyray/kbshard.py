"""Sharded-KB candidate generation — the scale path for knowledge bases
larger than a worker's RAM (SURVEY.md §2.5 fallback).

The broadcast ``KBIndex`` (`tabbyray/kb.py`) is the right shape while
the whole KB fits one worker. At full-DBpedia×100 scale it does not;
this module re-expresses the candidate surface of the reference's
endpoint query (`commands/SpreadsheetController.php:86-93`) as a
fan-out/gather dataflow over KB *shards*:

1. the KB table is split round-robin by global row id into S shards;
   each shard builds the same localname + trigram indexes ``KBIndex``
   builds, over its rows only, and is ``ray.put`` ONCE (a worker task
   fetches exactly one shard — never the whole KB);
2. the distinct normalized mentions of the input are replicated S ways
   and routed by ``groupby(shard_id)`` — S lookup tasks, one shard
   each; every shard answers with its local exact-arm info and its
   first ≤100 verified substring matches in local (== global, rows are
   row-id-sorted) order, payload lists (types/parents/neighbors)
   attached;
3. a ``hash(norm)``-partitioned merge rebuilds the reference's result
   stream exactly: global-first exact row (zero rows if it is a class
   or typeless — the ``?subject a ?object`` join), then substring rows
   in global KB row order, trimmed to LIMIT 100, order-preserving
   dedup (`:100-103`);
4. the per-table annotate partitions receive just the candidate payload
   for THEIR norms via one more co-partitioned exchange, and score with
   a ``SubsetKB`` that duck-types the five ``KBIndex`` query methods
   (A1, A3-A5, C2, CPA) over the payload plus a broadcast class
   hierarchy (classes are orders of magnitude fewer than instances).

Output parity with the broadcast path is asserted in
``tests/test_kbshard.py`` (identical annotations, rows and triples on
the conformance corpus).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .ops.relational import _resolve_partitions

from .constants import DBPEDIA_ONTOLOGY_SECTION, NER_CLASS_MAP
from .kb import CANDIDATE_LIMIT, PARENT_LIMIT, KBIndex, _trigrams


class KBShard:
    """One shard of the KB: the same lookup indexes as ``KBIndex`` over
    a row-id-annotated subset of rows."""

    def __init__(self, table: pa.Table):
        self.row_ids: list[int] = table.column("row_id").to_pylist()
        self.uris: list[str] = table.column("uri").to_pylist()
        self.is_class: list[bool] = table.column("is_class").to_pylist()
        self._types = [x or [] for x in table.column("types").to_pylist()]
        self._parents = [x or [] for x in table.column("parents").to_pylist()]
        self._neighbors = [x or [] for x in table.column("neighbors").to_pylist()]
        if "neighbor_props" in table.column_names:
            self._props = [x or [] for x in
                           table.column("neighbor_props").to_pylist()]
        else:
            self._props = [[] for _ in self.uris]
        self._by_localname: dict[str, int] = {}
        self._posting: dict[str, list[int]] = {}
        self._instance_ids: list[int] = []
        self._uri_lower: list[str] = []
        for i, uri in enumerate(self.uris):
            local = uri.rsplit("/", 1)[-1]
            self._by_localname.setdefault(local, i)
            low = uri.lower()
            self._uri_lower.append(low)
            if not self.is_class[i]:
                self._instance_ids.append(i)
                for g in _trigrams(low):
                    self._posting.setdefault(g, []).append(i)

    def lookup(self, norm_value: str):
        """Local answer for one normalized mention.

        Returns (exact, matches): ``exact`` is None or a dict with the
        shard's first row bearing the exact localname (global-first is
        resolved at merge time via row_id); ``matches`` are the first
        ≤ CANDIDATE_LIMIT verified substring rows in row order, payload
        attached. Mirrors `commands/SpreadsheetController.php:86-93`
        per shard."""
        if not norm_value:
            return None, []
        exact = None
        i = self._by_localname.get(norm_value)
        if i is not None:
            exact = {"row_id": self.row_ids[i], "uri": self.uris[i],
                     "is_class": self.is_class[i],
                     "n_types": len(self._types[i]),
                     "types": self._types[i], "parents": self._parents[i],
                     "neighbors": self._neighbors[i],
                     "props": self._props[i]}
        low = norm_value.lower()
        grams = _trigrams(low)
        if grams:
            postings = [self._posting.get(g) for g in grams]
            if all(p is not None for p in postings):
                postings.sort(key=len)
                cand = set(postings[0])
                for p in postings[1:]:
                    cand.intersection_update(p)
                    if not cand:
                        break
                ids = sorted(cand)
            else:
                ids = []
        else:
            ids = [i for i in self._instance_ids if low in self._uri_lower[i]]
        matches = []
        for i in ids:
            if len(matches) >= CANDIDATE_LIMIT:
                break
            if low in self._uri_lower[i]:
                matches.append({"row_id": self.row_ids[i], "uri": self.uris[i],
                                "types": self._types[i],
                                "parents": self._parents[i],
                                "neighbors": self._neighbors[i],
                                "props": self._props[i]})
        return exact, matches


class ShardedKB:
    """Driver-side handle: shard refs + the broadcast class hierarchy."""

    def __init__(self, table: pa.Table, num_shards: int = 4):
        self.num_shards = num_shards
        table = table.append_column(
            "row_id", pa.array(range(table.num_rows), pa.int64()))
        self.shard_refs = []
        for s in range(num_shards):
            idx = [i for i in range(table.num_rows) if i % num_shards == s]
            self.shard_refs.append(ray.put(KBShard(table.take(idx))))
        # class hierarchy: ancestors-or-self closure, classes only (small)
        class_parents: dict[str, list[str]] = {}
        for uri, is_cls, parents in zip(table.column("uri").to_pylist(),
                                        table.column("is_class").to_pylist(),
                                        table.column("parents").to_pylist()):
            if is_cls:
                class_parents[uri] = parents or []
        ancestors = {c: KBIndex._closure(c, class_parents) for c in class_parents}
        self.ancestors_ref = ray.put(ancestors)


PAYLOAD_SCHEMA = pa.schema([
    ("norm", pa.string()),
    ("pos", pa.int32()),                 # candidate order within the mention
    ("uri", pa.string()),
    ("types", pa.list_(pa.string())),
    ("parents", pa.list_(pa.string())),
    ("neighbors", pa.list_(pa.string())),
    ("props", pa.list_(pa.string())),    # per-edge property URIs (CPA)
])

# fan-out row schema (shard answers, pre-merge)
_ANSWER_SCHEMA = pa.schema([
    ("norm", pa.string()),
    ("kind", pa.int8()),                 # 0 = exact info, 1 = substring match
    ("row_id", pa.int64()),
    ("uri", pa.string()),
    ("is_class", pa.bool_()),
    ("n_types", pa.int32()),
    ("types", pa.list_(pa.string())),
    ("parents", pa.list_(pa.string())),
    ("neighbors", pa.list_(pa.string())),
    ("props", pa.list_(pa.string())),
])


def sharded_candidate_payload(norms: rd.Dataset, skb: ShardedKB,
                              num_partitions: "int | None" = None) -> rd.Dataset:
    """Distinct norms Dataset (column ``norm``) -> PAYLOAD_SCHEMA rows:
    the merged, LIMIT-100, order-preserving-deduped candidate list per
    norm with KB payload attached."""
    num_partitions = _resolve_partitions(num_partitions)
    S = skb.num_shards
    shard_refs = skb.shard_refs

    def fan_out(t: pa.Table) -> pa.Table:
        n = t.num_rows
        parts = [t.append_column("shard_id",
                                 pa.array([s] * n, pa.int32()))
                 for s in range(S)]
        return pa.concat_tables(parts)

    def query_shard(g: pa.Table) -> pa.Table:
        from .pipeline import _cached_get
        sid = g.column("shard_id")[0].as_py()
        shard: KBShard = _cached_get(shard_refs[sid])
        cols = {name: [] for name in _ANSWER_SCHEMA.names}

        def emit(norm, kind, row):
            cols["norm"].append(norm)
            cols["kind"].append(kind)
            cols["row_id"].append(row["row_id"])
            cols["uri"].append(row["uri"])
            cols["is_class"].append(bool(row.get("is_class", False)))
            cols["n_types"].append(int(row.get("n_types", 0)))
            cols["types"].append(row["types"])
            cols["parents"].append(row["parents"])
            cols["neighbors"].append(row["neighbors"])
            cols["props"].append(row["props"])

        for norm in g.column("norm").to_pylist():
            exact, matches = shard.lookup(norm)
            if exact is not None:
                emit(norm, 0, exact)
            for m in matches:
                emit(norm, 1, m)
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], f.type) for f in _ANSWER_SCHEMA],
            schema=_ANSWER_SCHEMA)

    answers = (norms.map_batches(fan_out, batch_format="pyarrow")
               .groupby("shard_id")
               .map_groups(query_shard, batch_format="pyarrow"))

    def add_part(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(t.column("norm").to_pandas(), index=False)
        return t.append_column(
            "_part", pa.array((h % num_partitions).astype("int64")))

    def merge(g: pa.Table) -> pa.Table:
        if "_part" in g.column_names:
            g = g.drop_columns(["_part"])
        cols = {name: g.column(name).to_pylist() for name in g.column_names}
        by_norm: dict[str, dict] = {}
        for i in range(g.num_rows):
            norm = cols["norm"][i]
            slot = by_norm.setdefault(norm, {"exact": None, "subs": []})
            row = {k: cols[k][i] for k in cols}
            if row["kind"] == 0:
                ex = slot["exact"]
                if ex is None or row["row_id"] < ex["row_id"]:
                    slot["exact"] = row
            else:
                slot["subs"].append(row)
        out = {name: [] for name in PAYLOAD_SCHEMA.names}
        for norm, slot in by_norm.items():
            # rebuild the reference's result stream
            # (`commands/SpreadsheetController.php:86-103`)
            rows: list[dict] = []
            ex = slot["exact"]
            if ex is not None and not ex["is_class"]:
                rows.extend([ex] * ex["n_types"])
            for m in sorted(slot["subs"], key=lambda r: r["row_id"]):
                if len(rows) >= CANDIDATE_LIMIT:
                    break
                rows.append(m)
            rows = rows[:CANDIDATE_LIMIT]
            seen: set[str] = set()
            pos = 0
            for r in rows:
                if r["uri"] and r["uri"] not in seen:
                    seen.add(r["uri"])
                    out["norm"].append(norm)
                    out["pos"].append(pos)
                    out["uri"].append(r["uri"])
                    out["types"].append(r["types"] or [])
                    out["parents"].append(r["parents"] or [])
                    out["neighbors"].append(r["neighbors"] or [])
                    out["props"].append(r["props"] or [])
                    pos += 1
        return pa.Table.from_arrays(
            [pa.array(out[f.name], f.type) for f in PAYLOAD_SCHEMA],
            schema=PAYLOAD_SCHEMA)

    return (answers.map_batches(add_part, batch_format="pyarrow")
            .groupby("_part").map_groups(merge, batch_format="pyarrow"))


class SubsetKB:
    """Duck-types the five ``KBIndex`` query methods over a payload
    subset + the broadcast class-ancestor closure. Used inside one
    annotate partition; every uri it is asked about came from its own
    candidate payload."""

    def __init__(self, cand_lists: dict[str, list[str]],
                 rows: dict[str, tuple[list[str], list[str], list[str],
                                       list[str]]],
                 ancestors: dict[str, frozenset]):
        self._cands = cand_lists
        self._rows = rows          # uri -> (types, parents, neighbors, props)
        self._ancestors = ancestors

    # -- A1 ------------------------------------------------------------
    def candidates(self, norm_value: str) -> list[str]:
        return self._cands.get(norm_value, [])

    # -- C2 ------------------------------------------------------------
    def types_dbo(self, uri: str) -> list[str]:
        row = self._rows.get(uri)
        if row is None:
            return []
        return [t for t in row[0] if t.startswith(DBPEDIA_ONTOLOGY_SECTION)]

    # -- A3 ------------------------------------------------------------
    def parent_classes(self, uri: str) -> list[str]:
        row = self._rows.get(uri)
        if row is None:
            return []
        types, parents, neighbors, _props = row
        out = [t for t in types if t.startswith(DBPEDIA_ONTOLOGY_SECTION)]
        out += [p for p in parents if p.startswith(DBPEDIA_ONTOLOGY_SECTION)]
        out += [n for n in neighbors if n.startswith(DBPEDIA_ONTOLOGY_SECTION)]
        return out[:PARENT_LIMIT]

    # -- A4 ------------------------------------------------------------
    def neighbors(self, uri: str) -> list[str]:
        row = self._rows.get(uri)
        return row[2] if row is not None else []

    # -- A5 (int-cast quirk preserved, SpreadsheetController.php:257) ---
    def ner_class_rank(self, uri: str, ner_label: str) -> int:
        ner_class = NER_CLASS_MAP.get(ner_label, "")
        if not ner_class:
            return 0
        row = self._rows.get(uri)
        if row is None:
            return 0
        inter: set[str] = set()
        for t in row[0]:
            for anc in self._ancestors.get(t, frozenset({t})):
                if ner_class in self._ancestors.get(anc, frozenset({anc})):
                    inter.add(anc)
        depth = len(inter) / 2.0
        if depth == 0:
            return 0
        return int(1.0 / depth)

    # -- CPA predicate selection (mirrors KBIndex.edge_properties) ------
    def edge_properties(self, subj_uri: str, obj_uri: str) -> list[str]:
        row = self._rows.get(subj_uri)
        if row is None:
            return []
        _t, _p, neighbors, props = row
        return [props[j] for j, n in enumerate(neighbors)
                if n == obj_uri and j < len(props) and props[j]]

    # -- CPA (§2.8, bag semantics) --------------------------------------
    def relationship_count(self, uri: str, other_candidates: list[str]) -> int:
        nb = self.neighbors(uri)
        if not nb:
            return 0
        counts: dict[str, int] = {}
        for n in nb:
            counts[n] = counts.get(n, 0) + 1
        return sum(counts.get(o, 0) for o in other_candidates)

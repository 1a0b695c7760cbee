"""Local knowledge-base index — the per-worker stateful stand-in for the
reference's live SPARQL endpoint (`components/CanonicalTableAnnotator.php:49`).

One ``KBIndex`` instance replaces the five SPARQL query shapes:

* A1 candidate lookup  (`commands/SpreadsheetController.php:86-93`)
* A3 parent classes    (`commands/SpreadsheetController.php:378-383`)
* A4 entity context    (`commands/SpreadsheetController.php:324-336`)
* A5 NER-class depth   (`commands/SpreadsheetController.php:242-246`)
* C2 dbo: rdf:type     (`commands/SpreadsheetController.php:275-278`)

The index is built once from a KB parquet table (FIXTURES.md F2) and
shared via ``ray.put`` — every actor of the annotation pool gets the
same object-store reference in ``__init__`` (broadcast once, never
re-shipped per batch). At 100 TB / full-DBpedia scale the index would be
sharded by label-hash and candidate generation would become a shuffle
join on ``norm_form`` (SURVEY.md §2.5); the single-object broadcast is
the right shape for KBs that fit a worker (DBpedia labels ~1-2 GB).

Substring candidate search uses a character-trigram inverted index over
the *full lowercased URI string* — the reference's regex runs against
``str(?subject)``, i.e. including the ``http://dbpedia.org/resource/``
prefix, so e.g. the value ``Org`` matches every resource URI; that quirk
is preserved deliberately.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

from .constants import (
    DBPEDIA_ONTOLOGY_SECTION,
    LOCATION_NER_LABEL,
    LOCATION_ONTOLOGY_CLASS,
    NER_CLASS_MAP,
    ORGANISATION_ONTOLOGY_CLASS,
    ORGANIZATION_NER_LABEL,
    PERSON_NER_LABEL,
    PERSON_ONTOLOGY_CLASS,
)
from .normalize import normalize_entry

CANDIDATE_LIMIT = 100   # LIMIT 100 (commands/SpreadsheetController.php:93)
PARENT_LIMIT = 100      # LIMIT 100 (commands/SpreadsheetController.php:383)


def _trigrams(s: str) -> set[str]:
    return {s[i:i + 3] for i in range(len(s) - 2)} if len(s) >= 3 else set()


class KBIndex:
    """In-memory KB with deterministic result ordering (KB row order)."""

    def __init__(self, table: pa.Table):
        self.uris: list[str] = table.column("uri").to_pylist()
        self.labels: list[str] = table.column("label").to_pylist()
        self.is_class: list[bool] = table.column("is_class").to_pylist()
        self._types: list[list[str]] = [x or [] for x in table.column("types").to_pylist()]
        self._parents: list[list[str]] = [x or [] for x in table.column("parents").to_pylist()]
        self._neighbors: list[list[str]] = [x or [] for x in table.column("neighbors").to_pylist()]
        # per-edge property URIs, parallel to neighbors (optional column;
        # KBs without it degrade to label-minted CPA predicates)
        if "neighbor_props" in table.column_names:
            self._neighbor_props: list[list[str]] = [
                x or [] for x in table.column("neighbor_props").to_pylist()]
        else:
            self._neighbor_props = [[] for _ in self.uris]

        self._by_uri: dict[str, int] = {}
        self._by_localname: dict[str, int] = {}
        # trigram posting lists over full lowercase uri, instances only
        self._posting: dict[str, list[int]] = {}
        self._instance_ids: list[int] = []
        self._uri_lower: list[str] = []
        for i, uri in enumerate(self.uris):
            self._by_uri.setdefault(uri, i)
            local = uri.rsplit("/", 1)[-1]
            self._by_localname.setdefault(local, i)
            low = uri.lower()
            self._uri_lower.append(low)
            if not self.is_class[i]:
                self._instance_ids.append(i)
                for g in _trigrams(low):
                    self._posting.setdefault(g, []).append(i)

        # class hierarchy: ancestors-or-self closure per class uri
        class_parents: dict[str, list[str]] = {}
        for i, uri in enumerate(self.uris):
            if self.is_class[i]:
                class_parents[uri] = self._parents[i]
        self._ancestors: dict[str, frozenset[str]] = {}
        for c in class_parents:
            self._ancestors[c] = self._closure(c, class_parents)

    @staticmethod
    def _closure(c: str, parents: dict[str, list[str]]) -> frozenset[str]:
        seen: set[str] = set()
        stack = [c]
        while stack:
            cur = stack.pop()
            if cur in seen:
                continue
            seen.add(cur)
            stack.extend(parents.get(cur, ()))
        return frozenset(seen)

    # -- A1 -----------------------------------------------------------
    def candidates(self, norm_value: str) -> list[str]:
        """Candidate entities for a normalized mention.

        Reference query (`commands/SpreadsheetController.php:86-93`):
        rows = {exact: ?subject = dbr:$value (one row per rdf:type)} UNION
        {substring: regex(str(?subject), '$value', 'i') restricted to
        owl:Thing instances}, LIMIT 100 on rows, then order-preserving
        dedup of subjects (`:100-103`). Exact rows first, substring rows
        in KB order (the deterministic stand-in for endpoint order).
        """
        if not norm_value:
            return []
        rows: list[str] = []
        exact = self._by_localname.get(norm_value)
        if exact is not None and not self.is_class[exact]:
            # one result row per rdf:type binding (?subject a ?object) —
            # an entity with NO rdf:type produces zero exact rows, exactly
            # like the reference's join (it may still appear via the
            # substring arm below)
            rows.extend([self.uris[exact]] * len(self._types[exact]))
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
            # query shorter than a trigram: linear scan fallback
            ids = [i for i in self._instance_ids if low in self._uri_lower[i]]
        for i in ids:
            if len(rows) >= CANDIDATE_LIMIT:
                break
            if low in self._uri_lower[i]:
                rows.append(self.uris[i])
        rows = rows[:CANDIDATE_LIMIT]
        out: list[str] = []
        seen: set[str] = set()
        for r in rows:
            if r and r not in seen:
                seen.add(r)
                out.append(r)
        return out

    # -- A2 (web variant, unused by the reference CLI pipeline) --------
    def candidates_contains(self, value: str, section: str = "") -> list[str]:
        """Case-SENSITIVE substring variant
        (`components/CanonicalTableAnnotator.php:146-183`):
        ``contains(str(?subject), '$value')`` over ALL subjects with an
        optional namespace restriction (``strstarts(str(?subject),
        '$section')``), LIMIT 100, order-preserving dedup."""
        if not value:
            return []
        rows: list[str] = []
        # case-sensitive scan over all KB rows in stable order; classes
        # included (the query has no owl:Thing restriction)
        for i, uri in enumerate(self.uris):
            if len(rows) >= CANDIDATE_LIMIT:
                break
            if value in uri and (not section or uri.startswith(section)):
                rows.append(uri)
        out: list[str] = []
        seen: set[str] = set()
        for r in rows:
            if r not in seen:
                seen.add(r)
                out.append(r)
        return out

    # -- C2 / heading rank types --------------------------------------
    def types_dbo(self, uri: str) -> list[str]:
        """dbo:-namespace rdf:type classes
        (`commands/SpreadsheetController.php:275-278`)."""
        i = self._by_uri.get(uri)
        if i is None:
            return []
        return [t for t in self._types[i] if t.startswith(DBPEDIA_ONTOLOGY_SECTION)]

    # -- A3 -----------------------------------------------------------
    def parent_classes(self, uri: str) -> list[str]:
        """All ``<uri> ?property ?class`` objects in the dbo: namespace,
        LIMIT 100 (`commands/SpreadsheetController.php:378-383`). Note the
        query matches ANY property — rdf:type objects, the superclass
        chain AND dbo:-namespace neighbors all qualify; preserved."""
        i = self._by_uri.get(uri)
        if i is None:
            return []
        out = [t for t in self._types[i] if t.startswith(DBPEDIA_ONTOLOGY_SECTION)]
        out += [p for p in self._parents[i] if p.startswith(DBPEDIA_ONTOLOGY_SECTION)]
        out += [n for n in self._neighbors[i] if n.startswith(DBPEDIA_ONTOLOGY_SECTION)]
        return out[:PARENT_LIMIT]

    # -- A4 -----------------------------------------------------------
    def neighbors(self, uri: str) -> list[str]:
        """Entity context: adjacent dbo:/dbr: nodes, both directions
        merged (`commands/SpreadsheetController.php:324-336`)."""
        i = self._by_uri.get(uri)
        if i is None:
            return []
        return self._neighbors[i]

    # -- A5 -----------------------------------------------------------
    def ner_class_rank(self, uri: str, ner_label: str) -> int:
        """Depth-based rank of ``uri`` against the NER-mapped class.

        SPARQL ``count(?intermediate)/2 as ?depth`` over
        ``rdf:type/rdfs:subClassOf*`` with ``?intermediate rdfs:subClassOf*
        <ner_class>`` (`commands/SpreadsheetController.php:242-246`);
        rank = 1/depth when depth != 0, then stored through ``(int)$rank``
        (`:257`) — the int-cast quirk is preserved (rank 2 when exactly one
        intermediate, 1 when two, else 0).
        """
        ner_class = NER_CLASS_MAP.get(ner_label, "")
        if not ner_class:
            return 0
        i = self._by_uri.get(uri)
        if i is None:
            return 0
        inter: set[str] = set()
        for t in self._types[i]:
            for anc in self._ancestors.get(t, frozenset({t})):
                if ner_class in self._ancestors.get(anc, frozenset({anc})):
                    inter.add(anc)
        depth = len(inter) / 2.0
        if depth == 0:
            return 0
        return int(1.0 / depth)

    # -- CPA (§2.8) ----------------------------------------------------
    def relationship_count(self, uri: str, other_candidates: list[str]) -> int:
        """COUNT(*) over UNIONed patterns ``<uri> ?property <other>``
        (`commands/SpreadsheetController.php:189-202`). Bag semantics:
        duplicates in ``other_candidates`` (the same entity appearing in
        several other cells' candidate lists) count multiply, as the
        duplicated UNION arms would."""
        i = self._by_uri.get(uri)
        if i is None:
            return 0
        nb = self._neighbors[i]
        if not nb:
            return 0
        counts: dict[str, int] = {}
        for n in nb:
            counts[n] = counts.get(n, 0) + 1
        return sum(counts.get(o, 0) for o in other_candidates)

    def edge_properties(self, subj_uri: str, obj_uri: str) -> list[str]:
        """Property URIs of the KB edges between ``subj_uri`` and
        ``obj_uri``, in edge order. This is the adjacency the CPA count
        query iterates (`commands/SpreadsheetController.php:189-202` —
        ``<current_candidate> ?property <other_candidate>``); exposing
        the bound ``?property`` lets triple materialization pick a REAL
        KB predicate instead of minting one from the heading label.
        Neighbors are stored direction-merged (A4), so the edge list
        follows that merge."""
        i = self._by_uri.get(subj_uri)
        if i is None:
            return []
        props = self._neighbor_props[i]
        return [props[j] for j, n in enumerate(self._neighbors[i])
                if n == obj_uri and j < len(props) and props[j]]

    # -- gazetteer for the NER tagger ---------------------------------
    def gazetteer(self) -> dict[str, str]:
        """norm_label -> NER label for named-entity tagging, derived from
        each instance's class subtree (Location/Person/Organisation)."""
        roots = {
            LOCATION_ONTOLOGY_CLASS: LOCATION_NER_LABEL,
            PERSON_ONTOLOGY_CLASS: PERSON_NER_LABEL,
            ORGANISATION_ONTOLOGY_CLASS: ORGANIZATION_NER_LABEL,
        }
        out: dict[str, str] = {}
        for i, uri in enumerate(self.uris):
            if self.is_class[i]:
                continue
            label = None
            for t in self._types[i]:
                anc = self._ancestors.get(t, frozenset({t}))
                for root, ner in roots.items():
                    if root in anc:
                        label = ner
                        break
                if label:
                    break
            if label:
                out.setdefault(normalize_entry(self.labels[i]), label)
        return out


def load_kb(path: str) -> KBIndex:
    import pyarrow.parquet as pq
    return KBIndex(pq.read_table(path))

"""Model-grade NER stage — an actor-pool tagger with per-actor state.

The reference consumes Stanford-NER labels precomputed into the
`NER TAGS` sheet (`commands/SpreadsheetController.php:528-532`). On
crawl pages with no inline ``data-ner`` attributes, round 1 fell back
to literal regexes + an exact-match gazetteer (`tabbyray/ner.py`) —
recall on unseen/mutated surface forms was gazetteer recall. This
module adds the missing first-class component: a lightweight,
self-contained character-trigram Naive Bayes classifier over the
named-entity families (LOCATION / PERSON / ORGANIZATION / NONE),
trained deterministically from the KB's labeled instances (the same
signal the gazetteer uses) plus a static heading-word lexicon for the
NONE class — so a surface form that is *similar* to known entity labels
is still tagged even when it matches no label exactly.

Ray shape (SURVEY.md §2.3): the model is actor-pool state — loaded
ONCE per actor in ``__init__`` via ``ray.get`` of a broadcast ref, used
per batch in ``__call__``. The pool autoscales (``concurrency=(1, N)``)
to avoid the eager-fixed-pool allocation that can starve upstream
stages (see pipeline._cached_get notes).
"""

from __future__ import annotations

import math

import pyarrow as pa
import ray

from .constants import (
    LOCATION_NER_LABEL,
    NONE_NER_LABEL,
    ORGANIZATION_NER_LABEL,
    PERSON_NER_LABEL,
)
from .ner import tag_value
from .normalize import normalize_entry

_FAMILIES = (LOCATION_NER_LABEL, PERSON_NER_LABEL, ORGANIZATION_NER_LABEL,
             NONE_NER_LABEL)

# generic table-heading / boilerplate vocabulary for the NONE class —
# static and domain-neutral (the classifier needs counterexamples)
_NONE_VOCAB = [
    "Population", "Area", "Capital", "Founded", "Revenue", "Height",
    "Length", "Members", "Albums", "Matches", "Region", "District",
    "Name", "Type", "Total", "Count", "Year", "Date", "Value", "Rank",
    "Score", "Status", "Category", "Description", "Title", "Country",
    "City", "State", "Size", "Weight", "Price", "Amount", "Number",
    "Average", "Index", "Rate", "Share", "Group", "Label", "Code",
    "table", "data", "page", "content", "section", "report", "archive",
    "news", "list", "index", "item", "entry", "record", "summary",
]


def _grams(text: str) -> list[str]:
    s = " " + (text or "").lower() + " "
    return [s[i:i + 3] for i in range(len(s) - 2)]


def train_model(labeled: list[tuple[str, str]]) -> dict:
    """Multinomial NB over char trigrams. ``labeled``: (surface label,
    family) pairs — e.g. ``KBIndex.gazetteer_training()`` output. The
    NONE class trains on the static heading vocabulary. Deterministic:
    no randomness, insertion-order-independent log tables."""
    counts: dict[str, dict[str, int]] = {f: {} for f in _FAMILIES}
    totals: dict[str, int] = {f: 0 for f in _FAMILIES}
    n_docs: dict[str, int] = {f: 0 for f in _FAMILIES}
    exact: dict[str, str] = {}
    for label, family in labeled:
        if family not in counts:
            continue
        exact.setdefault(normalize_entry(label), family)
        n_docs[family] += 1
        for g in _grams(label):
            counts[family][g] = counts[family].get(g, 0) + 1
            totals[family] += 1
    for w in _NONE_VOCAB:
        n_docs[NONE_NER_LABEL] += 1
        for g in _grams(w):
            counts[NONE_NER_LABEL][g] = counts[NONE_NER_LABEL].get(g, 0) + 1
            totals[NONE_NER_LABEL] += 1
    vocab = set()
    for f in _FAMILIES:
        vocab.update(counts[f])
    V = len(vocab) or 1
    total_docs = sum(n_docs.values()) or 1
    log_like = {
        f: {g: math.log((counts[f].get(g, 0) + 1) / (totals[f] + V))
            for g in vocab}
        for f in _FAMILIES
    }
    log_unseen = {f: math.log(1 / (totals[f] + V)) for f in _FAMILIES}
    log_prior = {f: math.log((n_docs[f] + 1) / (total_docs + len(_FAMILIES)))
                 for f in _FAMILIES}
    return {"log_like": log_like, "log_unseen": log_unseen,
            "log_prior": log_prior, "exact": exact}


def classify(model: dict, value: str) -> str:
    """One NER family for a cell value: literal regexes first (they are
    exact), then the exact-label memory, then the NB argmax."""
    rule = tag_value(value, None)
    if rule != NONE_NER_LABEL:
        return rule
    norm = normalize_entry(value)
    hit = model["exact"].get(norm)
    if hit:
        return hit
    gs = _grams(value)
    if not gs:
        return NONE_NER_LABEL
    best, best_score = NONE_NER_LABEL, -math.inf
    for f in _FAMILIES:
        ll = model["log_like"][f]
        lu = model["log_unseen"][f]
        score = model["log_prior"][f] + sum(ll.get(g, lu) for g in gs)
        if score > best_score:
            best, best_score = f, score
    return best


def kb_training_pairs(kb) -> list[tuple[str, str]]:
    """(label, family) training pairs from a ``KBIndex`` — the same
    class-subtree signal the gazetteer uses."""
    from .constants import (
        LOCATION_ONTOLOGY_CLASS,
        ORGANISATION_ONTOLOGY_CLASS,
        PERSON_ONTOLOGY_CLASS,
    )
    roots = {
        LOCATION_ONTOLOGY_CLASS: LOCATION_NER_LABEL,
        PERSON_ONTOLOGY_CLASS: PERSON_NER_LABEL,
        ORGANISATION_ONTOLOGY_CLASS: ORGANIZATION_NER_LABEL,
    }
    out: list[tuple[str, str]] = []
    for i, uri in enumerate(kb.uris):
        if kb.is_class[i]:
            continue
        for t in kb._types[i]:
            anc = kb._ancestors.get(t, frozenset({t}))
            fam = next((ner for root, ner in roots.items() if root in anc),
                       None)
            if fam:
                out.append((kb.labels[i], fam))
                break
    return out


class NERTagger:
    """Actor-pool stage: fills missing NER labels on cell rows.

    State (the trained model) is fetched once per ACTOR in ``__init__``
    (`SURVEY.md §2.3`); ``__call__`` runs per batch with a per-actor
    memo so each distinct surface form is classified once."""

    NER_COLS = ("data_ner", "row_heading_ner", "column_heading_ner")
    VALUE_COLS = ("data", "row_heading", "column_heading")

    def __init__(self, model_ref):
        self.model = ray.get(model_ref)
        self._memo: dict[str, str] = {}

    def _tag(self, value: str) -> str:
        hit = self._memo.get(value)
        if hit is None:
            hit = classify(self.model, value)
            self._memo[value] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        for vcol, ncol in zip(self.VALUE_COLS, self.NER_COLS):
            ners = batch.column(ncol).to_pylist()
            if all(n is not None and n != "" for n in ners):
                continue
            vals = batch.column(vcol).to_pylist()
            filled = [n if (n is not None and n != "")
                      else self._tag(v or "") for n, v in zip(ners, vals)]
            batch = batch.set_column(batch.column_names.index(ncol), ncol,
                                     pa.array(filled, pa.string()))
        return batch


def ner_stage(cells, model_ref, *, concurrency=(1, 8),
              batch_size: int = 512):
    """Attach the actor-pool tagger to a cells Dataset."""
    return cells.map_batches(NERTagger, batch_format="pyarrow",
                             fn_constructor_args=(model_ref,),
                             concurrency=concurrency, batch_size=batch_size)

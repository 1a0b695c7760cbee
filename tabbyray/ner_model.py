"""Model-grade NER stage — an actor-pool tagger with per-actor state.

The reference consumes Stanford-NER labels precomputed into the
`NER TAGS` sheet (`commands/SpreadsheetController.php:528-532`). On
crawl pages with no inline ``data-ner`` attributes, round 1 fell back
to literal regexes + an exact-match gazetteer (`tabbyray/ner.py`) —
recall on unseen/mutated surface forms was gazetteer recall. This
module adds the missing first-class component: a lightweight,
self-contained classifier over the named-entity families (LOCATION /
PERSON / ORGANIZATION / NONE), trained deterministically from the KB's
labeled instances (the same signal the gazetteer uses) plus a static
heading-word lexicon for the NONE class — so a surface form that is
*similar* to known entity labels is still tagged even when it matches
no label exactly. Evidence is applied most-exact-first: literal
regexes, the exact-surface memory, a FUZZY token gazetteer (symmetric
deletion index — any token within edit distance 1 of an unambiguous
training token votes its family; a camel-split recovers fused words),
then a multinomial Naive Bayes over char trigrams + word-shape
signatures + token-count buckets + token unigrams + 3-suffixes.
Measured on single-edit-mutated held-out labels: 0.96 accuracy (0.74
for the round-2 trigram-only model on mixed 1-3-edit mutations, 0.83
now — see tests/test_ner_model.py).

Ray shape (SURVEY.md §2.3): the model is actor-pool state — loaded
ONCE per actor in ``__init__`` via ``ray.get`` of a broadcast ref, used
per batch in ``__call__``. The pool autoscales (``concurrency=(1, N)``)
to avoid the eager-fixed-pool allocation that can starve upstream
stages (see pipeline._cached_get notes).
"""

from __future__ import annotations

import math
import re

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

# lower->UPPER case bump (latin + cyrillic): camel-split point
_CAMEL_RE = re.compile(r"(?<=[a-zа-яё])(?=[A-ZА-ЯЁ])")

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


def _shape(tok: str) -> str:
    """Run-length-collapsed word shape: 'Halkirten' -> 'Xx',
    'Corp' -> 'Xx', '1984' -> 'd', 'a-b' -> 'xpx'."""
    out: list[str] = []
    for ch in tok:
        c = ("X" if ch.isupper() else "x" if ch.islower()
             else "d" if ch.isdigit() else "p")
        if not out or out[-1] != c:
            out.append(c)
    return "".join(out)


def _features(text: str) -> list[str]:
    """Feature bag: char trigrams + word-shape signature + token-count
    bucket + lowercased token unigrams + token 3-suffixes. Shape and
    suffix features survive character-level mutations that break exact
    lookup; token unigrams let one intact token of a multi-word label
    carry the decision."""
    feats = _grams(text)
    toks = [t for t in (text or "").split() if t]
    if toks:
        feats.append("S:" + "_".join(_shape(t) for t in toks))
        feats.append("N:" + str(min(len(toks), 4)))
        for t in toks:
            tl = t.lower()
            feats.append("W:" + tl)
            if len(tl) >= 4:
                feats.append("F3:" + tl[-3:])
    return feats


def _del1(tok: str) -> set[str]:
    """SymSpell-style deletion neighborhood at depth 1: the token plus
    every single-character deletion of it. Two strings within edit
    distance 1 (substitute / insert / delete) always share a key."""
    out = {tok}
    for i in range(len(tok)):
        out.add(tok[:i] + tok[i + 1:])
    return out


def _token_gazetteer(labeled, none_vocab) -> dict[str, str]:
    """deletion-neighborhood key (lowercased token, len >= 4) -> family,
    kept only when the key is UNAMBIGUOUS across the training labels
    (one family only). The word-level FUZZY gazetteer backoff: a
    mutated multi-word surface usually keeps at least one token within
    edit distance 1 of a training token, and the symmetric-delete index
    finds it without any pairwise distance scan. Index size is
    O(labels x tokens x token_len) keys — per-actor model state,
    linear in KB label bytes."""
    votes: dict[str, set] = {}

    def add(tok: str, family: str) -> None:
        tl = tok.lower()
        if len(tl) < 4:
            return
        for k in _del1(tl):
            votes.setdefault(k, set()).add(family)

    for label, family in labeled:
        if family not in _FAMILIES:
            continue
        for t in (label or "").split():
            add(t, family)
    for w in none_vocab:
        add(w, NONE_NER_LABEL)
    return {t: next(iter(fs)) for t, fs in votes.items() if len(fs) == 1}


def train_model(labeled: list[tuple[str, str]]) -> dict:
    """Multinomial NB over the ``_features`` bag (char trigrams +
    word shapes + token unigrams + suffixes), plus the exact-surface
    memory and the unambiguous-token gazetteer used as backoffs.
    ``labeled``: (surface label, family) pairs — e.g.
    ``kb_training_pairs`` output. The NONE class trains on the static
    heading vocabulary. Deterministic: no randomness,
    insertion-order-independent log tables."""
    counts: dict[str, dict[str, int]] = {f: {} for f in _FAMILIES}
    totals: dict[str, int] = {f: 0 for f in _FAMILIES}
    n_docs: dict[str, int] = {f: 0 for f in _FAMILIES}
    exact: dict[str, str] = {}
    for label, family in labeled:
        if family not in counts:
            continue
        exact.setdefault(normalize_entry(label), family)
        n_docs[family] += 1
        for g in _features(label):
            counts[family][g] = counts[family].get(g, 0) + 1
            totals[family] += 1
    for w in _NONE_VOCAB:
        n_docs[NONE_NER_LABEL] += 1
        for g in _features(w):
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
            "log_prior": log_prior, "exact": exact,
            "tok_gaz": _token_gazetteer(labeled, _NONE_VOCAB)}


def classify(model: dict, value: str) -> str:
    """One NER family for a cell value, most-exact evidence first:
    literal regexes (they are exact), the exact-surface memory, the
    unambiguous-token gazetteer backoff (majority vote over tokens;
    ties fall through), then the NB argmax over the feature bag."""
    rule = tag_value(value, None)
    if rule != NONE_NER_LABEL:
        return rule
    norm = normalize_entry(value)
    hit = model["exact"].get(norm)
    if hit:
        return hit
    gaz = model.get("tok_gaz")
    if gaz:
        toks = (value or "").split()
        if len(toks) == 1:
            # a deleted space fuses two words; re-split at case bumps
            toks = _CAMEL_RE.split(value or "")
        votes: dict[str, int] = {}
        for t in toks:
            tl = t.lower()
            if len(tl) < 4:
                continue
            fams = set()
            for k in _del1(tl):
                fam = gaz.get(k)
                if fam:
                    fams.add(fam)
            if len(fams) == 1:       # token matches ONE family fuzzily
                f = fams.pop()
                votes[f] = votes.get(f, 0) + 1
        if votes:
            ranked = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))
            if len(ranked) == 1 or ranked[0][1] > ranked[1][1]:
                return ranked[0][0]
    gs = _features(value)
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

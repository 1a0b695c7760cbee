"""Model-grade NER actor stage: on pages WITHOUT inline ``data-ner``
attributes, the trained tagger must recover the annotations of the
inline-NER pipeline at P/R >= 0.95 (VERDICT round-1, item 8)."""

import os

import pytest


def test_classifier_families(ray_session):
    from tabbyray.kb import load_kb
    from tabbyray.fixtures import ensure_fixture
    from tabbyray.ner_model import classify, kb_training_pairs, train_model

    fix = ensure_fixture("conformance", seed=7, n_pages=60, n_entities=800)
    kb = load_kb(os.path.join(fix, "kb.parquet"))
    model = train_model(kb_training_pairs(kb))
    # literal rules still win
    assert classify(model, "2148000") == "NUMBER"
    assert classify(model, "85%") == "PERCENT"
    assert classify(model, "2020-01-02") == "DATE"
    # exact KB labels classify to their family
    pairs = kb_training_pairs(kb)
    hits = sum(1 for label, fam in pairs[:200] if classify(model, label) == fam)
    assert hits / min(200, len(pairs)) >= 0.95
    # heading vocabulary stays NONE
    assert classify(model, "Population") == "NONE"
    assert classify(model, "Albums") == "NONE"


def test_pipeline_without_inline_ner_reaches_pr(ray_session):
    import ray

    from tabbyray import pipeline
    from tabbyray.fixtures import ensure_fixture
    from tabbyray.kb import load_kb
    from tabbyray.ner_model import kb_training_pairs, train_model

    seed, n_pages, n_entities = 7, 60, 800
    fix_inline = ensure_fixture("conformance", seed=seed, n_pages=n_pages,
                                n_entities=n_entities)
    fix_noner = ensure_fixture("conformance", seed=seed, n_pages=n_pages,
                               n_entities=n_entities, inline_ner=False)
    kb = load_kb(os.path.join(fix_inline, "kb.parquet"))
    kb_ref, gaz_ref = pipeline.put_kb(kb)

    ref = pipeline.split_kind(
        pipeline.kg_pipeline(os.path.join(fix_inline, "pages.parquet"),
                             kb_ref, gaz_ref), "annotation").to_pandas()

    model_ref = ray.put(train_model(kb_training_pairs(kb)))
    got = pipeline.split_kind(
        pipeline.kg_pipeline(os.path.join(fix_noner, "pages.parquet"),
                             kb_ref, gaz_ref, ner_model_ref=model_ref),
        "annotation").to_pandas()

    key = ["url", "table_idx", "cell_type", "surface_form"]
    ref_pairs = set(map(tuple, ref[key + ["entity"]].itertuples(index=False)))
    got_pairs = set(map(tuple, got[key + ["entity"]].itertuples(index=False)))
    tp = len(ref_pairs & got_pairs)
    precision = tp / len(got_pairs)
    recall = tp / len(ref_pairs)
    assert precision >= 0.95, (precision, recall)
    assert recall >= 0.95, (precision, recall)


def _mutate_k(rng, label, k):
    """k random character edits (substitute/insert/delete) — the
    fixture's distractor generator at a fixed edit count."""
    chars = list(label)
    for _ in range(k):
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


def test_classifier_holdout_mutated_labels(ray_session):
    """Harder held-out set (VERDICT r2 item 9): EVERY training label
    mutated, so the exact-surface memory cannot answer; the word-shape
    features + symspell-1 fuzzy token gazetteer must. Bars: >= 0.95 on
    single-edit mutations (the realistic typo model the fuzzy index
    targets), >= 0.80 on the fixture's own 1-3-edit distractor model
    (round-2 trigram-only model measured 0.74 there)."""
    import random

    from tabbyray.fixtures import ensure_fixture
    from tabbyray.kb import load_kb
    from tabbyray.ner_model import classify, kb_training_pairs, train_model

    fix = ensure_fixture("conformance", seed=7, n_pages=60, n_entities=800)
    kb = load_kb(os.path.join(fix, "kb.parquet"))
    pairs = kb_training_pairs(kb)
    model = train_model(pairs)

    rng = random.Random(99)
    hits1 = sum(classify(model, _mutate_k(rng, label, 1)) == fam
                for label, fam in pairs)
    acc1 = hits1 / len(pairs)
    assert acc1 >= 0.95, acc1

    rng = random.Random(99)
    hits_mixed = sum(
        classify(model, _mutate_k(rng, label, rng.randint(1, 3))) == fam
        for label, fam in pairs)
    acc_mixed = hits_mixed / len(pairs)
    assert acc_mixed >= 0.80, acc_mixed

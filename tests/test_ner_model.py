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

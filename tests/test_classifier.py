"""Naive Bayes as dataflow: learns real signal on a crafted corpus,
deterministic argmax, and full-coverage output."""

from __future__ import annotations

from flink_ecommerce_spark.operators.classifier import nb_lang_scores
from flink_ecommerce_spark.schemas import DOCUMENTS_SCHEMA

# two classes with genuinely different vocabularies + shared filler
EN = [
    "the quick brown fox jumps over the lazy dog common words here",
    "a brown dog and a quick fox share the meadow common words here",
    "lazy dogs sleep while quick foxes run common words here",
]
DE = [
    "der schnelle braune fuchs springt ueber den faulen hund common words here",
    "ein brauner hund und ein schneller fuchs common words here",
    "faule hunde schlafen waehrend schnelle fuechse rennen common words here",
]


def _corpus(spark):
    rows = [(i, t, "en", "s", 1) for i, t in enumerate(EN)]
    rows += [(100 + i, t, "de", "s", 1) for i, t in enumerate(DE)]
    return spark.createDataFrame(rows, DOCUMENTS_SCHEMA)


def test_nb_separates_real_classes(spark):
    """Training docs classify back to their own class when the
    classes actually differ — the smoothed per-class vocabularies
    dominate the shared filler."""
    preds = {r["doc_id"]: r["pred_lang"] for r in nb_lang_scores(_corpus(spark)).collect()}
    assert all(preds[i] == "en" for i in range(len(EN)))
    assert all(preds[100 + i] == "de" for i in range(len(DE)))


def test_nb_scores_every_document_once(spark):
    out = nb_lang_scores(_corpus(spark)).collect()
    assert len(out) == len(EN) + len(DE)
    assert all(r["score_micro"] < 0 for r in out)  # log-probs are negative


def test_nb_is_deterministic(spark):
    a = sorted(map(tuple, nb_lang_scores(_corpus(spark)).collect()))
    b = sorted(map(tuple, nb_lang_scores(_corpus(spark)).collect()))
    assert a == b


def test_nb_model_reuse_on_new_batch(spark):
    """The production split: train once (nb_train), score a NEW
    unlabeled batch with the stored model. Unseen words are skipped
    (open-vocabulary convention)."""
    from flink_ecommerce_spark.operators.classifier import (
        nb_classify,
        nb_train,
    )

    loglik, prior = nb_train(_corpus(spark))
    new = spark.createDataFrame(
        [
            (500, "the quick fox and the lazy dog unknownword", "xx", "s", 1),
            (501, "der schnelle fuchs und der faule hund zzz", "xx", "s", 1),
        ],
        DOCUMENTS_SCHEMA,
    )
    preds = {r["doc_id"]: r["pred_lang"] for r in nb_classify(new, loglik, prior).collect()}
    assert preds == {500: "en", 501: "de"}


def test_nb_composed_equals_split(spark):
    """nb_lang_scores == nb_train + nb_classify on the same corpus."""
    from flink_ecommerce_spark.operators.classifier import (
        nb_classify,
        nb_lang_scores,
        nb_train,
    )

    d = _corpus(spark)
    composed = sorted(map(tuple, nb_lang_scores(d).collect()))
    loglik, prior = nb_train(d)
    split = sorted(map(tuple, nb_classify(d, loglik, prior).collect()))
    assert composed == split

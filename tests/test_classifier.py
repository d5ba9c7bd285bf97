"""Logistic-regression quality classifier (operators/classifier.py).

Pins: (1) the distributed integer-micros chain is bit-identical to a plain
numpy reference of the same quantized recurrence; (2) on a linearly
separable concept the trained model reaches training accuracy 1.0 — the
mechanics genuinely learn; (3) guardrails fail fast; (4) every doc scores
exactly once (the bias feature guarantees a margin row even for empty text).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_order_book_spark.operators import classifier as C

MICRO = 1_000_000


def _h64(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)


def _featurize(texts, dim, feature="presence"):
    X = np.zeros((len(texts), dim + 1), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = [w for w in re.split(r"\s+", t.strip().lower()) if w]
        for w in toks:
            j = _h64(w) % dim
            if feature == "presence":
                X[i, j] = 1
            else:
                X[i, j] += 1
        X[i, dim] = 1
    return X


def _np_train(X, y, n_iter, lr):
    """Python reference of the exact quantized recurrence (micros ints)."""
    n, d1 = X.shape
    w = np.zeros(d1, dtype=np.int64)
    grad = np.zeros(d1, dtype=np.int64)
    for _ in range(n_iter):
        mm = X @ w  # exact int margin in micros
        p = 1.0 / (1.0 + np.exp(-(mm / MICRO)))
        err_m = np.floor((p - y) * MICRO + 0.5).astype(np.int64)
        gsum = X.T @ err_m
        grad = np.floor(gsum / float(n) + 0.5).astype(np.int64)
        w = w - np.floor(lr * grad + 0.5).astype(np.int64)
    return grad, w


CORPUS = [
    (0, "good clean prose with varied words", 1),
    (1, "good thoughtful essay on varied topics", 1),
    (2, "good careful writing stays varied", 1),
    (3, "spam spam buy now spam", 0),
    (4, "buy cheap spam now now", 0),
    (5, "now buy spam cheap deal", 0),
    (6, "good varied sentences read well", 1),
    (7, "cheap deal spam buy now", 0),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t, y) for i, t, y in CORPUS], "doc_id long, text string, y int"
    )


def test_step_matches_numpy_reference(docs):
    dim = 8
    X = _featurize([t for _, t, _ in CORPUS], dim)
    y = np.array([float(lab) for _, _, lab in CORPUS])
    for n_iter in (1, 3):
        grad_ref, w_ref = _np_train(X, y, n_iter, lr=0.5)
        step = C.logreg_train(docs, n_iter=n_iter, dim=dim, lr=0.5).toPandas()
        step = step.sort_values("j", ignore_index=True)
        assert list(step["grad_micro"]) == list(grad_ref)
        assert list(step["w_next_micro"]) == list(w_ref)


def test_count_features_match_numpy(docs):
    dim = 8
    X = _featurize([t for _, t, _ in CORPUS], dim, feature="count")
    y = np.array([float(lab) for _, _, lab in CORPUS])
    _, w_ref = _np_train(X, y, 2, lr=0.5)
    step = C.logreg_train(docs, n_iter=2, dim=dim, lr=0.5, feature="count").toPandas()
    assert list(step.sort_values("j")["w_next_micro"]) == list(w_ref)


def test_separable_concept_reaches_perfect_accuracy(docs):
    """'spam'/'buy'/'now' vs 'good'/'varied' is linearly separable; the
    trained model must classify its own training set perfectly."""
    dim = 32
    step = C.logreg_train(docs, n_iter=12, dim=dim, lr=8.0)
    w = C.collect_weights(step, dim)
    scored = C.logreg_score(docs, w).toPandas().sort_values("doc_id")
    labels = [lab for _, _, lab in CORPUS]
    assert list(scored["pred"]) == labels
    # scores are actually separated, not borderline ties
    pos = scored[scored["pred"] == 1]["score_micro"]
    neg = scored[scored["pred"] == 0]["score_micro"]
    assert pos.min() - neg.max() > 100_000


def test_every_doc_scores_once_even_empty_text(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    out = C.logreg_score(df, [0] * 9).toPandas()
    assert sorted(out["doc_id"]) == [1, 2, 3]
    # zero weights -> sigmoid(bias*0)=0.5 for every doc
    assert set(out["score_micro"]) == {500_000}


def test_guardrails(spark, docs):
    with pytest.raises(ValueError, match="dim must be > 0"):
        C.doc_features(docs, dim=0)
    with pytest.raises(ValueError, match="feature must be"):
        C.doc_features(docs, feature="tfidf")
    with pytest.raises(ValueError, match="n_iter must be > 0"):
        C.logreg_train(docs, n_iter=0)
    with pytest.raises(ValueError, match="max_collect_weights"):
        C.logreg_train(docs, dim=100, max_collect_weights=50)
    empty = spark.createDataFrame([], "doc_id long, text string, y int")
    with pytest.raises(ValueError, match="labels is empty"):
        C.logreg_train(empty, n_iter=1)


def test_score_threshold_is_integer_compare(docs):
    w = [0] * 33
    out = C.logreg_score(docs, w, threshold=0.5).toPandas()
    assert set(out["pred"]) == {1}  # 500000 >= 500000
    out2 = C.logreg_score(docs, w, threshold=0.5000006).toPandas()
    assert set(out2["pred"]) == {0}


def test_reliability_table_exact_buckets(spark):
    from polars_order_book_spark.operators.classifier import reliability_table

    scored = spark.createDataFrame(
        [(1, 50_000, 0), (2, 149_999, 0), (3, 150_000, 0), (4, 999_999, 1),
         (5, 1_000_000, 1)],
        "doc_id long, score_micro long, pred int",
    )
    labels = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 0), (4, 1), (5, 1)], "doc_id long, y int"
    )
    rows = {r["bucket"]: r for r in
            reliability_table(scored, labels, n_buckets=10).collect()}
    # bin width 100_000: 50_000 -> bucket 0; 149_999 and 150_000 -> bucket 1;
    # 999_999 -> bucket 9; 1_000_000 clamps to the last bucket (9)
    assert set(rows) == {0, 1, 9}
    assert rows[0]["n"] == 1 and rows[0]["n_pos"] == 0
    assert rows[0]["sum_score_micro"] == 50_000
    assert rows[1]["n"] == 2 and rows[1]["n_pos"] == 1
    assert rows[1]["sum_score_micro"] == 299_999
    assert rows[1]["pos_rate"] == 0.5
    assert rows[9]["n"] == 2 and rows[9]["n_pos"] == 2
    assert rows[9]["mean_score"] == (999_999 + 1_000_000) / (2 * 1_000_000)


def test_reliability_table_guard(spark):
    from polars_order_book_spark.operators.classifier import reliability_table

    df = spark.createDataFrame([(1, 1, 0)], "doc_id long, score_micro long, pred int")
    lab = spark.createDataFrame([(1, 1)], "doc_id long, y int")
    with pytest.raises(ValueError, match="n_buckets"):
        reliability_table(df, lab, n_buckets=0)

"""Quality classifier (distributed logreg) + stratified exact-k sample."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from anofox_forecast_spark.webtext.classifier import (
    accuracy,
    fit_logreg,
    hashed_features,
    score_formula_weights,
    score_logreg,
)
from anofox_forecast_spark.webtext.pipeline import stratified_sample

GOOD = "excellent thorough insightful rigorous clear structured detailed careful"
BAD = "spam click buy cheap winner casino free pills"


def _labeled_docs(spark, n=300, flip=0.0):
    rng = random.Random(7)
    rows = []
    for i in range(n):
        lab = i % 2
        vocab = (GOOD if lab else BAD).split()
        text = " ".join(rng.choice(vocab) for _ in range(30))
        if rng.random() < flip:
            lab = 1 - lab
        rows.append((i, text, lab))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_logreg_learns_separable(spark):
    df = _labeled_docs(spark)
    model = fit_logreg(
        df, "doc_id", "text", "label", n_buckets=1 << 14, epochs=12, lr=2.0
    )
    scored = score_logreg(df, "doc_id", "text", model)
    assert accuracy(scored, df, "doc_id", "label") >= 0.98
    # micro-quantized ints end to end
    assert all(isinstance(v, int) for v in model["weights"].values())
    assert isinstance(model["bias_micro"], int)


def test_logreg_deterministic_under_partitioning(spark):
    df = _labeled_docs(spark, n=200)
    m1 = fit_logreg(
        df.repartition(3), "doc_id", "text", "label",
        n_buckets=1 << 14, epochs=6, lr=1.0,
    )
    m2 = fit_logreg(
        df.repartition(11), "doc_id", "text", "label",
        n_buckets=1 << 14, epochs=6, lr=1.0,
    )
    # integer-quantized gradients/weights: bit-identical, not just close
    assert m1["weights"] == m2["weights"]
    assert m1["bias_micro"] == m2["bias_micro"]


def test_logreg_exact_token_mode(spark):
    df = _labeled_docs(spark, n=200)
    model = fit_logreg(
        df, "doc_id", "text", "label", hashed=False, epochs=10, lr=2.0
    )
    # weights keyed by token string; every learned key is a real token
    vocab = set((GOOD + " " + BAD).split())
    assert set(model["weights"]) <= vocab
    scored = score_logreg(df, "doc_id", "text", model)
    assert accuracy(scored, df, "doc_id", "label") >= 0.98


def test_logreg_l2_shrinks_weights(spark):
    df = _labeled_docs(spark, n=200)
    m0 = fit_logreg(df, "doc_id", "text", "label", epochs=6, lr=1.0, l2=0.0)
    m1 = fit_logreg(df, "doc_id", "text", "label", epochs=6, lr=1.0, l2=0.1)
    n0 = sum(abs(v) for v in m0["weights"].values())
    n1 = sum(abs(v) for v in m1["weights"].values())
    assert n1 < n0


def test_score_empty_doc_gets_bias_margin(spark):
    df = spark.createDataFrame(
        [(1, "good words here", 1), (2, "", 0), (3, "...!!!", 0)],
        "doc_id long, text string, label int",
    )
    model = {"weights": {}, "bias_micro": 250_000, "hashed": True,
             "n_buckets": 1 << 14}
    out = {r["id"]: r for r in score_logreg(df, "doc_id", "text", model).collect()}
    assert len(out) == 3
    # empty / punctuation-only docs still scored, margin == bias
    assert out[2]["margin_micro"] == 250_000
    assert out[3]["margin_micro"] == 250_000
    assert out[2]["pred"] is True


def test_hashed_features_counts(spark):
    df = spark.createDataFrame(
        [(1, "aa bb aa"), (2, "aa")], "doc_id long, text string"
    )
    rows = hashed_features(df, "doc_id", "text", hashed=False).collect()
    got = {(r["id"], r["bucket"]): r["cnt"] for r in rows}
    assert got == {(1, "aa"): 2, (1, "bb"): 1, (2, "aa"): 1}


def test_formula_weights_margin_exact(spark):
    df = spark.createDataFrame([(1, "ab abc")], "doc_id long, text string")
    out = score_formula_weights(df, "doc_id", "text").collect()[0]

    def wm(tok):
        return (len(tok.encode()) * 1103515245 + 12345) % 2000001 - 1000000

    assert out["margin_micro"] == wm("ab") + wm("abc")


def test_fit_raises_on_empty(spark):
    df = spark.createDataFrame([], "doc_id long, text string, label int")
    with pytest.raises(ValueError):
        fit_logreg(df, "doc_id", "text", "label", epochs=1)


# --- stratified_sample -----------------------------------------------------


def _grouped(spark, sizes=(40, 25, 3)):
    rows = []
    i = 0
    for g, n in enumerate(sizes):
        for _ in range(n):
            rows.append((i, f"g{g}"))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_stratified_exact_k(spark):
    df = _grouped(spark)
    out = stratified_sample(df, "doc_id", "source", k=10).collect()
    by = {}
    for r in out:
        by.setdefault(r["source"], []).append(r)
    assert len(by["g0"]) == 10 and len(by["g1"]) == 10
    assert len(by["g2"]) == 3  # smaller group keeps everything
    for rows in by.values():
        assert sorted(r["rk"] for r in rows) == list(range(len(rows)))


def test_stratified_monotone_in_k_and_seeded(spark):
    df = _grouped(spark, sizes=(60,))
    k5 = {r["doc_id"] for r in stratified_sample(df, "doc_id", "source", 5).collect()}
    k9 = {r["doc_id"] for r in stratified_sample(df, "doc_id", "source", 9).collect()}
    assert k5 <= k9  # rank-based keep is monotone in k
    s1 = {r["doc_id"] for r in
          stratified_sample(df, "doc_id", "source", 5, seed=1).collect()}
    assert s1 != k5  # seed changes the draw
    again = {r["doc_id"] for r in
             stratified_sample(df.repartition(7), "doc_id", "source", 5).collect()}
    assert again == k5  # layout-independent


def test_stratified_k_validation(spark):
    with pytest.raises(ValueError):
        stratified_sample(_grouped(spark), "doc_id", "source", 0)

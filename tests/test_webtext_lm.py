"""LM scoring operators: bigram perplexity (CCNet-style) and DSIR
importance log-weights (webtext/lm.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from anofox_forecast_spark.webtext.lm import dsir_log_weights, lm_perplexity

DOCS = [
    (0, "a b a b", "en"),
    (1, "a b c", "en"),
    (2, "x y z z", "zh"),
    (3, "", "en"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


# ---------------------------------------------------------------------------
# lm_perplexity


def test_lm_perplexity_hand_computed(spark):
    """Self-trained bigram LM on the toy corpus, doc 1 checked against
    the formula by hand (micro-nat quantization replayed in Python)."""
    out = {r["id"]: r for r in lm_perplexity(_docs(spark), "doc_id", "text").collect()}
    # training stream: a b a b a b c x y z z  -> T=11, V=6
    # unigrams: a3 b3 c1 x1 y1 z2; bigrams: ab3 ba1 bc1 xy1 yz1 zz1
    T, V = 11, 6
    cu = {"a": 3, "b": 3, "c": 1, "x": 1, "y": 1, "z": 2}
    cb = {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1, ("x", "y"): 1,
          ("y", "z"): 1, ("z", "z"): 1}

    def u6_first(w):
        return round(math.log((T + V) / (cu.get(w, 0) + 1.0)) * 1e6)

    def u6_bi(v, w):
        return round(math.log((cu.get(v, 0) + V) / (cb.get((v, w), 0) + 1.0)) * 1e6)

    # doc 1 = "a b c": first a, bigrams (a,b), (b,c)
    s = u6_first("a") + u6_bi("a", "b") + u6_bi("b", "c")
    want = round(s / 1e6 / 3, 6)
    assert out[1]["n_tokens"] == 3
    assert out[1]["avg_nll"] == pytest.approx(want, abs=1e-9)
    assert out[1]["ppl"] == pytest.approx(round(math.exp(s / 1e6 / 3), 6), abs=1e-9)


def test_lm_perplexity_empty_doc_null(spark):
    out = {r["id"]: r for r in lm_perplexity(_docs(spark), "doc_id", "text").collect()}
    assert out[3]["n_tokens"] == 0
    assert out[3]["avg_nll"] is None and out[3]["ppl"] is None


def test_lm_perplexity_train_score_split(spark):
    """Scoring a corpus with unseen tokens against a separate training
    corpus: every non-empty doc still gets a finite score (add-one
    smoothing covers OOV), and common-token docs score lower NLL."""
    docs = _docs(spark)
    train = docs.filter("doc_id <= 1")  # knows only a b c
    out = {r["id"]: r for r in
           lm_perplexity(docs, "doc_id", "text", train_df=train).collect()}
    assert all(out[i]["avg_nll"] is not None for i in (0, 1, 2))
    # doc 0 is pure in-distribution, doc 2 is fully OOV
    assert out[0]["avg_nll"] < out[2]["avg_nll"]


def test_lm_perplexity_vocab_size_unk(spark):
    """vocab_size=2 keeps {a, b} (top counts, lexical tie-break) and maps
    the rest to <unk>; scores stay finite and deterministic."""
    docs = _docs(spark)
    a = lm_perplexity(docs, "doc_id", "text", vocab_size=2).orderBy("id").collect()
    b = lm_perplexity(docs, "doc_id", "text", vocab_size=2).orderBy("id").collect()
    assert a == b
    # doc 2 ("x y z z") is entirely <unk> under V=2: all four tokens map
    # to the same symbol, so its bigrams are (<unk>,<unk>) x3 -> one
    # distinct conditional, and the doc still scores
    assert a[2]["avg_nll"] is not None
    # unrestricted vocab must differ from the collapsed one
    full = lm_perplexity(docs, "doc_id", "text").orderBy("id").collect()
    assert full[2]["avg_nll"] != a[2]["avg_nll"]


# ---------------------------------------------------------------------------
# dsir_log_weights


def test_dsir_self_target_is_zero(spark):
    """target == raw makes both distributions identical, so every delta
    is exactly 0 micro-nats and every log_w is exactly 0.0."""
    docs = _docs(spark)
    out = dsir_log_weights(docs, docs, "doc_id", "text").collect()
    assert all(r["log_w"] == 0.0 for r in out if r["n_grams"] > 0)


def test_dsir_prefers_target_like_docs(spark):
    docs = _docs(spark)
    tgt = docs.filter("lang = 'en'")
    out = {r["id"]: r["log_w"] for r in
           dsir_log_weights(docs, tgt, "doc_id", "text").collect()}
    # docs 0/1 share the target's grams; doc 2 shares none
    assert out[0] > out[2] and out[1] > out[2]


def test_dsir_gram_count_and_empty(spark):
    out = {r["id"]: r for r in
           dsir_log_weights(_docs(spark), _docs(spark), "doc_id", "text").collect()}
    # "a b a b" -> 4 unigrams + 3 bigrams
    assert out[0]["n_grams"] == 7
    assert out[3]["n_grams"] == 0 and out[3]["log_w"] is None


def test_lm_perplexity_hashed_equals_exact(spark):
    """hashed=True replaces term strings with xxhash64 keys; absent
    collisions (certain at this size) scores are bit-identical."""
    docs = _docs(spark)
    exact = lm_perplexity(docs, "doc_id", "text").orderBy("id").collect()
    hashed = lm_perplexity(docs, "doc_id", "text", hashed=True).orderBy("id").collect()
    assert exact == hashed


def test_dsir_hashed_mode(spark):
    """hash_buckets bounds the feature space: n_grams per doc unchanged
    (every gram still emits one hashed feature), output deterministic."""
    docs = _docs(spark)
    tgt = docs.filter("lang = 'en'")
    exact = {r["id"]: r["n_grams"] for r in
             dsir_log_weights(docs, tgt, "doc_id", "text").collect()}
    h1 = dsir_log_weights(docs, tgt, "doc_id", "text", hash_buckets=64).orderBy("id").collect()
    h2 = dsir_log_weights(docs, tgt, "doc_id", "text", hash_buckets=64).orderBy("id").collect()
    assert h1 == h2
    assert {r["id"]: r["n_grams"] for r in h1} == exact
    assert all(r["log_w"] is not None for r in h1 if r["n_grams"] > 0)

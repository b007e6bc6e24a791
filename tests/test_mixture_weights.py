"""Temperature-smoothed domain mixture weights."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from anofox_forecast_spark.webtext.pipeline import mixture_weights


def _corpus(spark):
    # domains with 1 : 4 : 16 doc mass, 10 tokens per doc
    rows = []
    i = 0
    for d, n in (("small", 5), ("mid", 20), ("big", 80)):
        for _ in range(n):
            rows.append((i, d, "w " * 9 + "w"))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_tau_one_is_proportional(spark):
    out = {r["domain"]: r for r in
           mixture_weights(_corpus(spark), "doc_id", "source", tau=1.0).collect()}
    assert out["big"]["n_docs"] == 80 and out["big"]["n_units"] == 80
    total = 5 + 20 + 80
    for d, n in (("small", 5), ("mid", 20), ("big", 80)):
        assert out[d]["weight"] == pytest.approx(n / total, abs=1e-6)


def test_tau_smoothing_upweights_small(spark):
    prop = {r["domain"]: r["weight"] for r in
            mixture_weights(_corpus(spark), "doc_id", "source", tau=1.0).collect()}
    sm = {r["domain"]: r["weight"] for r in
          mixture_weights(_corpus(spark), "doc_id", "source", tau=0.5).collect()}
    flat = {r["domain"]: r["weight"] for r in
            mixture_weights(_corpus(spark), "doc_id", "source", tau=0.0).collect()}
    assert sm["small"] > prop["small"] and sm["big"] < prop["big"]
    # tau=0 → uniform over domains
    for w in flat.values():
        assert w == pytest.approx(1 / 3, abs=1e-6)
    # sqrt law at tau=0.5 over 5:20:80 → 1:2:4
    denom = math.sqrt(5) + math.sqrt(20) + math.sqrt(80)
    assert sm["mid"] == pytest.approx(math.sqrt(20) / denom, abs=1e-6)


def test_token_units_and_epochs(spark):
    out = {r["domain"]: r for r in
           mixture_weights(_corpus(spark), "doc_id", "source", text_col="text",
                           tau=1.0, token_budget=1050).collect()}
    assert out["small"]["n_units"] == 50  # 5 docs x 10 tokens
    # budget == corpus size and tau=1 → every domain read exactly once
    for r in out.values():
        assert r["epochs"] == pytest.approx(1.0, abs=1e-5)


def test_tau_validation(spark):
    with pytest.raises(ValueError):
        mixture_weights(_corpus(spark), "doc_id", "source", tau=-0.1)

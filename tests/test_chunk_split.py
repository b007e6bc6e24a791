"""Document chunking + deterministic corpus splits."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from anofox_forecast_spark.webtext.pipeline import chunk_documents, split_corpus


def test_chunk_covers_all_tokens_with_overlap(spark):
    words = " ".join(f"w{i}" for i in range(25))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    out = sorted(
        chunk_documents(df, "doc_id", "text", max_tokens=10, overlap=2).collect(),
        key=lambda r: r["chunk_id"],
    )
    # stride 8: chunks at 0, 8, 16 -> 3 chunks; ceil((25-2)/8) = 3
    assert [r["chunk_id"] for r in out] == [0, 1, 2]
    assert out[0]["chunk_text"].split() == [f"w{i}" for i in range(10)]
    assert out[1]["chunk_text"].split() == [f"w{i}" for i in range(8, 18)]
    assert out[2]["chunk_text"].split() == [f"w{i}" for i in range(16, 25)]
    assert out[2]["n_tokens_chunk"] == 9  # short tail kept


def test_chunk_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "only three words"), (2, ""), (3, "...")],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in
           chunk_documents(df, "doc_id", "text", max_tokens=10).collect()}
    assert len(out) == 3  # one chunk per doc, nothing dropped
    assert out[1]["n_tokens_chunk"] == 3
    assert out[2]["n_tokens_chunk"] == 0 and out[2]["chunk_text"] == ""
    assert out[3]["n_tokens_chunk"] == 0


def test_chunk_no_overlap_partitions_tokens(spark):
    words = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", max_tokens=7).collect()
    toks = []
    for r in sorted(out, key=lambda r: r["chunk_id"]):
        toks.extend(r["chunk_text"].split())
    assert toks == [f"w{i}" for i in range(20)]  # exact disjoint cover


def test_chunk_validation_and_plan(spark):
    df = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", max_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", max_tokens=5, overlap=5)
    plan = chunk_documents(df, "doc_id", "text")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_split_disjoint_exhaustive_deterministic(spark):
    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    fr = {"train": 0.8, "valid": 0.1, "test": 0.1}
    out = split_corpus(df, "doc_id", fr, seed=5).collect()
    assert len(out) == 1000
    by = {}
    for r in out:
        by.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by) == {"train", "valid", "test"}  # no NULLs at sum=1
    assert sum(len(v) for v in by.values()) == 1000
    # roughly proportional (LCG uniformity at n=1000)
    assert 700 <= len(by["train"]) <= 900
    # layout-independent
    again = {r["doc_id"]: r["split"] for r in
             split_corpus(df.repartition(7), "doc_id", fr, seed=5).collect()}
    for name, ids in by.items():
        assert all(again[i] == name for i in ids)
    # different seed reshuffles membership
    other = {r["doc_id"]: r["split"] for r in
             split_corpus(df, "doc_id", fr, seed=6).collect()}
    assert any(other[i] != "train" for i in by["train"])


def test_split_partial_fractions_leave_null(spark):
    df = spark.range(200).select(F.col("id").alias("doc_id"))
    out = split_corpus(df, "doc_id", {"eval": 0.1}, seed=1).collect()
    n_eval = sum(1 for r in out if r["split"] == "eval")
    n_null = sum(1 for r in out if r["split"] is None)
    assert n_eval + n_null == 200 and n_eval > 0


def test_split_validation(spark):
    df = spark.range(5).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        split_corpus(df, "doc_id", {"a": 0.9, "b": 0.2})
    with pytest.raises(ValueError):
        split_corpus(df, "doc_id", {"a": -0.1})

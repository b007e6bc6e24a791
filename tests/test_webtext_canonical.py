from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from anofox_forecast_spark.webtext.dedup import canonical_docs


def _frames(spark):
    docs = spark.createDataFrame(
        [
            (1, "short"),
            (2, "the longest text in the cluster"),
            (3, "mid length"),
            (4, "a singleton untouched by any pair"),
            (5, "tie"),
            (6, "pie"),  # same byte length as doc 5
        ],
        ["doc_id", "text"],
    )
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (5, 5), (6, 5)], ["id", "component"]
    )
    return docs, comp


def test_canonical_longest_and_singletons(spark):
    docs, comp = _frames(spark)
    out = {r["doc_id"]: r for r in
           canonical_docs(docs, "doc_id", "text", comp).collect()}
    assert len(out) == 6  # full verdict: every doc gets a row
    # cluster {1,2,3}: doc 2 is longest -> canonical
    for i in (1, 2, 3):
        assert out[i]["component"] == 1
        assert out[i]["canonical_id"] == 2
        assert out[i]["n_members"] == 3
        assert out[i]["keep"] == (i == 2)
    # singleton keeps itself
    assert out[4]["component"] == 4 and out[4]["keep"] and out[4]["n_members"] == 1
    # byte-length tie {5,6} -> smallest id wins
    assert out[5]["keep"] and not out[6]["keep"]
    assert out[6]["canonical_id"] == 5


def test_canonical_keep_first(spark):
    docs, comp = _frames(spark)
    out = {r["doc_id"]: r for r in
           canonical_docs(docs, "doc_id", "text", comp, keep="first").collect()}
    # smallest id per component regardless of length
    assert out[2]["canonical_id"] == 1 and not out[2]["keep"]
    assert out[1]["keep"]
    with pytest.raises(ValueError):
        canonical_docs(docs, "doc_id", "text", comp, keep="best")


def test_canonical_byte_length_not_code_units(spark):
    # U+1F600 is 4 UTF-8 bytes / 2 UTF-16 code units / 1 code point:
    # byte semantics must make it beat a 3-byte ASCII doc
    docs = spark.createDataFrame(
        [(1, "abc"), (2, "\U0001F600")], ["doc_id", "text"]
    )
    comp = spark.createDataFrame([(1, 1), (2, 1)], ["id", "component"])
    out = {r["doc_id"]: r for r in
           canonical_docs(docs, "doc_id", "text", comp).collect()}
    assert out[1]["canonical_id"] == 2 and out[2]["keep"]


def test_canonical_plan_window_free(spark):
    docs, comp = _frames(spark)
    plan = (
        canonical_docs(docs, "doc_id", "text", comp)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # arg-max must ride the hash aggregate (map-side combine), never a
    # window (hot components would serialize onto one reducer)
    assert "Window" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

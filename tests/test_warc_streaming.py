"""Streaming WARC ingest: binaryFile file-source stream → mapInPandas
record parse → memory sink. The continuous-crawl ingestion shape — new
WARC segments land in a directory and records flow straight into the
pipeline; the parser is the SAME mapInPandas pass as batch (stateless,
so Structured Streaming runs it per micro-batch unchanged)."""

from __future__ import annotations

from pyspark.sql import functions as F

from anofox_forecast_spark.sources.warc import (
    parse_warc_records,
    synthesize_warc,
)


def _write_segment(path, seg, n):
    recs = [
        {
            "url": f"https://host{seg}/doc/{i}",
            "date": "2026-01-01T00:00:00Z",
            "body": f"<html><body>doc {seg}-{i}</body></html>",
        }
        for i in range(n)
    ]
    with open(path, "wb") as f:
        f.write(synthesize_warc(recs))


def test_streaming_warc_ingest_matches_batch(spark, tmp_path):
    src = str(tmp_path / "warc_in")
    (tmp_path / "warc_in").mkdir()
    # two segments → the file source treats each as streamed input
    _write_segment(f"{src}/seg0.warc", 0, 7)
    _write_segment(f"{src}/seg1.warc", 1, 5)

    # binaryFile's schema is fixed but streaming sources still demand it
    # explicitly
    bin_schema = ("path string, modificationTime timestamp, "
                  "length long, content binary")
    stream = (
        spark.readStream.format("binaryFile")
        .schema(bin_schema)
        .option("pathGlobFilter", "*.warc")
        .load(src)
    )
    recs = parse_warc_records(stream, "path", "content")
    assert recs.isStreaming

    q = (
        recs.writeStream.format("memory")
        .queryName("warc_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql("select * from warc_stream")
    assert got.count() == 12
    batch = parse_warc_records(
        spark.read.format("binaryFile").load(src), "path", "content"
    )
    cols = ["record_no", "warc_type", "url", "warc_date", "http_status"]
    xg = got.agg(F.bit_xor(F.xxhash64(*cols, F.sha2("payload", 256)))).collect()[0][0]
    xb = batch.agg(F.bit_xor(F.xxhash64(*cols, F.sha2("payload", 256)))).collect()[0][0]
    assert xg == xb
    # http envelope unwrapped in-stream
    assert got.filter(F.col("http_status") == 200).count() == 12


def test_streaming_quality_classifier_scoring(spark, tmp_path):
    """score_logreg is a stateless plan (explode -> broadcast weight
    lookup -> groupBy), so the SAME operator scores a document stream
    per micro-batch; stream == batch on identical input."""
    from anofox_forecast_spark.webtext.classifier import score_logreg

    src = str(tmp_path / "docs_stream")
    rows = [(i, ("good text here " if i % 2 else "spam junk ") * 3)
            for i in range(40)]
    ddl = "doc_id long, text string"
    spark.createDataFrame(rows[:20], ddl).coalesce(1).write.mode(
        "append").parquet(src)
    spark.createDataFrame(rows[20:], ddl).coalesce(1).write.mode(
        "append").parquet(src)

    model = {
        "weights": {"good": 500_000, "spam": -500_000, "junk": -250_000},
        "bias_micro": 10_000, "hashed": False,
    }
    stream = spark.readStream.schema(ddl).parquet(src)
    scored = score_logreg(stream, "doc_id", "text", model)
    assert scored.isStreaming

    q = (
        scored.writeStream.format("memory")
        .queryName("clf_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r["id"]: r for r in spark.sql("select * from clf_stream").collect()}
    want = {r["id"]: r for r in score_logreg(
        spark.createDataFrame(rows, ddl), "doc_id", "text", model).collect()}
    assert len(got) == 40
    assert {i: g["margin_micro"] for i, g in got.items()} == {
        i: w["margin_micro"] for i, w in want.items()}
    assert all(got[i]["pred"] == want[i]["pred"] for i in got)

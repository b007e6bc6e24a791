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

"""Structured Streaming tier rollup: file-source stream → memory sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from anofox_forecast_spark.rollup.tiers import rollup_pages
from anofox_forecast_spark.sources.pages import synthesize_pages
from anofox_forecast_spark.streaming import streaming_rollup
from anofox_forecast_spark.streaming.rollup_stream import PAGES_DDL


def test_streaming_rollup_matches_batch(spark, tmp_path):
    pages = synthesize_pages(spark, n_pages=3000, n_hosts=5, weeks=1)
    src = str(tmp_path / "pages_stream")
    pages.write.parquet(src)

    stream = spark.readStream.schema(PAGES_DDL).parquet(src)
    tier = streaming_rollup(stream, "1h", watermark="1 hour")
    assert tier.isStreaming

    q = (
        tier.writeStream.format("memory")
        .queryName("t1h_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql("select * from t1h_stream")
    want = rollup_pages(pages, "1h")
    assert got.count() == want.count()
    cols = ["lang", "host", "bucket_start", "crawl_count", "text_bytes"]
    ga = got.agg(F.bit_xor(F.xxhash64(*cols))).collect()[0][0]
    wa = want.agg(F.bit_xor(F.xxhash64(*cols))).collect()[0][0]
    assert ga == wa

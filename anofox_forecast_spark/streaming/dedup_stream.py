"""Streaming exact dedup for live document ingestion (driver-prompt dedup
modality × SURVEY §2.14 streaming; no reference counterpart).

Batch exact_dedup (webtext/dedup.py:45) is a hash-groupBy; its streaming
twin keeps FIRST-seen documents as they arrive and drops re-crawls of
identical content. Built on ``dropDuplicatesWithinWatermark``: the state
store holds one entry per content hash and evicts entries older than the
watermark horizon, so state is bounded by (unique docs per horizon), not
by the full corpus — the property that makes this runnable forever on a
100-TB/day ingest. Re-crawls farther apart than the horizon re-emit; the
batch pipeline's exact_dedup is the catch-all compaction for those, the
same division of labor as streaming_rollup vs the incremental rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    docs_stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-occurrence pass-through of a document stream, keyed by
    sha2(text). Adds a ``content_hash`` column; rows whose hash was
    already seen within the watermark horizon are dropped.
    """
    return (
        docs_stream
        .withColumn("content_hash", F.sha2(F.col(text_col), 256))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )

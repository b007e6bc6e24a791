"""Training-corpus shard export: the sink at the end of the webtext
pipeline (clean → dedup → pack → SHUFFLE → **write shards + manifest**).

What a trainer needs from the writer (public practice: WebDataset /
Megatron / T5 sharded corpora): (1) a DETERMINISTIC doc→shard
assignment fixed by (id, seed) alone — resuming a failed export or
re-running on a re-partitioned input must produce the identical
corpus; (2) one file per shard so a data-loader worker maps 1:1 onto
shards; (3) an integrity manifest (per-shard doc/byte counts + an
order-independent content checksum) the loader can verify before a
multi-day training run reads 100 TB.

Spark shape: shard = :func:`~anofox_forecast_spark.webtext.pipeline.
corpus_shuffle`'s LCG high-bit assignment (engine-portable, DuckDB
twin); ``repartition(n_shards, shard)`` puts every shard wholly inside
one task (hash collisions may co-locate two shards in a task —
``partitionBy`` still emits one file per shard value); rows are sorted
by position within the shard so file order IS the read order. The
manifest is one hash aggregate — ``bit_xor(xxhash64(...))`` is
commutative, so the checksum is layout- and order-independent (ANSI
``sum`` of hashes would overflow; bit_xor is the repo-wide checksum
idiom). No reference counterpart (driver-prompt training-pipeline
operator; the reference's sinks are tier/forecast parquet stores).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .pipeline import _shuffle_keyed


def _sharded(df: DataFrame, id_col: str, n_shards: int, seed: int) -> DataFrame:
    # assignment computed INLINE on the full row (corpus_shuffle's exact
    # key/shard/pos contract) — joining the 3-column assignment back to
    # the corpus would cost two more full-corpus Exchanges
    return _shuffle_keyed(df, id_col, n_shards, seed)


def shard_manifest(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_shards: int = 64,
    seed: int = 0,
) -> DataFrame:
    """(shard, n_docs, n_bytes, content_xxh): the per-shard integrity
    record. n_docs/n_bytes are engine-portable (DuckDB twin through the
    LCG shard assignment); content_xxh is the order-independent
    bit_xor-of-xxhash64 fingerprint :func:`verify_shards` re-checks
    after a read-back. One join to the assignment + ONE hash aggregate.
    """
    lab = _sharded(df, id_col, n_shards, seed)
    return (
        lab.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.octet_length(F.col(text_col)).cast("long")).alias("n_bytes"),
            F.bit_xor(
                F.xxhash64(F.col(id_col), F.col(text_col), F.col("pos"))
            ).alias("content_xxh"),
        )
    )


def export_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    n_shards: int = 64,
    seed: int = 0,
) -> DataFrame:
    """Write the corpus as ``path/shard=K/`` parquet (one file per
    shard, rows in shuffle order) plus ``path/_manifest/`` and return
    the manifest. Deterministic: same (input, n_shards, seed) → same
    shard membership, same in-file order, same manifest — regardless
    of the input's partitioning (export resume = re-run).

    At 100 TB pick ``n_shards >> executors`` (shards are the read
    parallelism for the trainer AND the write parallelism here); one
    task writes one shard's file, so shard size — not corpus size —
    bounds task memory/output.
    """
    lab = _sharded(df, id_col, n_shards, seed)
    (
        lab.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    manifest = shard_manifest(df, id_col, text_col, n_shards, seed)
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "_manifest")
    )
    return manifest


def verify_shards(
    spark: SparkSession, path: str, id_col: str, text_col: str
) -> DataFrame:
    """Re-read an exported corpus and check every shard against its
    manifest: (shard, n_docs_ok, n_bytes_ok, content_ok, ok). The
    pre-flight a trainer runs before pointing a 1000-GPU job at the
    corpus — one scan of the shards, one broadcast join to the tiny
    manifest (shard count ≪ doc count)."""
    got = (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("g_docs"),
            F.sum(F.octet_length(F.col(text_col)).cast("long")).alias("g_bytes"),
            F.bit_xor(
                F.xxhash64(F.col(id_col), F.col(text_col), F.col("pos"))
            ).alias("g_xxh"),
        )
    )
    man = spark.read.parquet(os.path.join(path, "_manifest"))
    j = got.join(F.broadcast(man), "shard", "full")
    return j.select(
        "shard",
        (F.col("g_docs") == F.col("n_docs")).alias("n_docs_ok"),
        (F.col("g_bytes") == F.col("n_bytes")).alias("n_bytes_ok"),
        (F.col("g_xxh") == F.col("content_xxh")).alias("content_ok"),
        (
            F.coalesce(F.col("g_docs") == F.col("n_docs"), F.lit(False))
            & F.coalesce(F.col("g_bytes") == F.col("n_bytes"), F.lit(False))
            & F.coalesce(F.col("g_xxh") == F.col("content_xxh"), F.lit(False))
        ).alias("ok"),
    )

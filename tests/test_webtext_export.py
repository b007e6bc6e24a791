"""Sharded corpus export sink: determinism, one-file-per-shard,
manifest integrity, verify round-trip."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from anofox_forecast_spark.webtext.export import (
    export_shards,
    shard_manifest,
    verify_shards,
)


def _docs(spark, n=120):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc body "), F.col("id").cast("string")).alias("text"),
    )


def test_export_roundtrip_and_verify(spark, tmp_path):
    path = str(tmp_path / "corpus")
    man = export_shards(_docs(spark), path, "doc_id", "text", n_shards=8, seed=3)
    rows = man.collect()
    assert sum(r["n_docs"] for r in rows) == 120
    # every shard = exactly one parquet data file
    for r in rows:
        files = [
            f for f in glob.glob(os.path.join(path, f"shard={r['shard']}", "*"))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (r["shard"], files)
    v = verify_shards(spark, path, "doc_id", "text").collect()
    assert len(v) == len(rows) and all(r["ok"] for r in v)


def test_export_deterministic_under_layout(spark, tmp_path):
    d = _docs(spark)
    m1 = shard_manifest(d.repartition(3), "doc_id", "text", n_shards=8, seed=3)
    m2 = shard_manifest(d.repartition(11), "doc_id", "text", n_shards=8, seed=3)
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))


def test_export_in_file_order_is_shuffle_order(spark, tmp_path):
    path = str(tmp_path / "ordered")
    export_shards(_docs(spark), path, "doc_id", "text", n_shards=4, seed=1)
    for shard_dir in glob.glob(os.path.join(path, "shard=*")):
        pdf = spark.read.parquet(shard_dir).toPandas()
        # parquet preserves row-group order: file order == pos order
        assert list(pdf.sort_index()["pos"]) == sorted(pdf["pos"])
        assert list(pdf["pos"]) == list(range(len(pdf)))


def test_verify_detects_corruption(spark, tmp_path):
    path = str(tmp_path / "corrupt")
    export_shards(_docs(spark), path, "doc_id", "text", n_shards=4, seed=1)
    # tamper: rewrite one shard with one doc's text flipped
    victim = sorted(glob.glob(os.path.join(path, "shard=*")))[0]
    pdf = spark.read.parquet(victim).toPandas()
    pdf.loc[0, "text"] = "TAMPERED"
    for f in glob.glob(os.path.join(victim, "*.parquet")):
        os.remove(f)
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(victim)
    v = {r["shard"]: r for r in verify_shards(spark, path, "doc_id", "text").collect()}
    bad_shard = int(victim.rsplit("=", 1)[1])
    assert v[bad_shard]["content_ok"] is False and v[bad_shard]["ok"] is False
    assert v[bad_shard]["n_docs_ok"] is True  # counts intact, content caught
    ok_shards = [s for s, r in v.items() if s != bad_shard]
    assert all(v[s]["ok"] for s in ok_shards)

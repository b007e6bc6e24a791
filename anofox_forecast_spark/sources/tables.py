"""Loaders for the driver-provided parquet tables (/root/testdata/sf*)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    d = sf_dir or DEFAULT_SF_DIR
    return spark.read.parquet(f"{d}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    for t in TABLES:
        path = f"{sf_dir or DEFAULT_SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(t)

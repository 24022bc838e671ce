"""Parquet table sources over the fixture star schema (TESTDATA.md).

Lazy ``spark.read.parquet`` scans (SURVEY.md §2.1 S1) — Catalyst gets
column pruning and predicate pushdown for free; nothing is materialized
until an action runs. At cluster scale the same call distributes file
splits across executors (``spark.sql.files.maxPartitionBytes`` governs
split size).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) parquet, which Spark's reader
        # rejects. Read nanos as long (runtime-settable legacy conf),
        # then rebuild a micros timestamp column — lossless at the
        # granularities any query here uses.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
            )
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition to the cluster's parallelism.

    For CPU-heavy per-row pipelines (tokenize/shingle/hash) sitting on
    a skinny scan: a small parquet file arrives as 1 split, which
    serializes the expensive expressions on one core. The shuffle of
    the raw rows is cheap relative to the per-row compute it
    parallelizes. No-op cost consideration at real scale, where the
    scan already has many splits — keep the repartition anyway; AQE
    coalesces if partitions are already balanced.
    """
    if df.isStreaming:
        # .rdd is illegal on a streaming frame, and micro-batch
        # parallelism is the source's concern — pass through so batch
        # operator bodies (signature_frame etc.) compose onto streams.
        return df
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)

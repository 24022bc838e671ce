"""Structured Streaming WARC ingestion: the continuous twin of
``sources.warc.read_warc_docs``.

Crawl segments land in a directory as ``.warc.gz`` files; the stream
picks up new files via the binaryFile file source and parses them
executor-side through the SAME ``extract_warc_frame`` mapInPandas
body the batch path uses — one extraction definition, two execution
modes. Parsing is stateless per file, so the stream holds no state
and its memory profile is one Arrow batch per task regardless of how
long the crawl has been running.

Sink idempotency matches streaming/pdf.py: each epoch writes its own
``epoch=N`` directory with overwrite, so an at-least-once
foreachBatch replay replaces its own output instead of duplicating.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from parquet_extractor_spark.sources.warc import extract_warc_frame

_BINARY_FILE_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("modificationTime", TimestampType(), False),
        StructField("length", LongType(), False),
        StructField("content", BinaryType(), True),
    ]
)


def read_warc_stream(
    spark: SparkSession, directory: str, pattern: str = "*.warc*"
) -> DataFrame:
    """File-source stream over a WARC landing directory."""
    return (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", pattern)
        .load(directory)
        .select("path", "content")
    )


def run_warc_ingest_stream(
    spark: SparkSession,
    warc_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    timeout_s: int = 120,
) -> DataFrame:
    """Drain the WARC landing directory once (availableNow) through
    record parsing into a parquet table; returns the written table
    re-read as a batch frame (epoch appears as a partition column)."""
    docs = extract_warc_frame(read_warc_stream(spark, warc_dir))

    def _sink(batch: DataFrame, epoch: int) -> None:
        batch.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={epoch}")
        )

    query = (
        docs.writeStream.foreachBatch(_sink)
        .option(
            "checkpointLocation",
            os.path.join(checkpoint_dir, "warc_ingest"),
        )
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(timeout_s):
        query.stop()
        raise TimeoutError(
            f"warc ingest stream did not drain within {timeout_s}s"
        )
    return spark.read.option("basePath", out_dir).parquet(out_dir)

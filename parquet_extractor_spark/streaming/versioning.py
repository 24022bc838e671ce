"""Streaming snapshot diff: a CDC-style changelog as the new corpus
version arrives.

The batch ``corpus_version_diff`` compares two complete snapshots; in
a rolling pipeline the new version LANDS INCREMENTALLY, and the
useful artifact is a per-document changelog emitted as files arrive:
added / modified / unchanged, classified by a stream-static LEFT join
of the arriving v2 docs against the previous snapshot's digest table
(a bounded, broadcastable side — digests, not text). The join is
stateless, so the stream holds no state and no watermark; 'removed'
is inherently invisible to an insert stream (only the batch
full-outer diff reports it), which the equality test encodes.

Sink idempotency matches the other streaming modules: per-epoch
overwrite directories.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from parquet_extractor_spark.operators.versioning import (
    classify_v2_against_v1,
    snapshot_v1,
    snapshot_v2,
)
from parquet_extractor_spark.sources.tables import load_table
from parquet_extractor_spark.streaming.documents import (
    read_documents_stream,
)


def run_version_diff_stream(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    timeout_s: int = 120,
) -> DataFrame:
    """Drain the documents landing dir once (availableNow) through the
    v2-snapshot projection and the stream-static classification join;
    returns the written changelog re-read as a batch frame."""
    v1 = snapshot_v1(load_table(spark, sf_dir, "documents"))
    v2_stream = snapshot_v2(read_documents_stream(spark, sf_dir))
    changelog = classify_v2_against_v1(v2_stream, v1)

    def _sink(batch: DataFrame, epoch: int) -> None:
        batch.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={epoch}")
        )

    query = (
        changelog.writeStream.foreachBatch(_sink)
        .option(
            "checkpointLocation",
            os.path.join(checkpoint_dir, "version_diff"),
        )
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(timeout_s):
        query.stop()
        raise TimeoutError(
            f"version diff stream did not drain within {timeout_s}s"
        )
    return spark.read.option("basePath", out_dir).parquet(out_dir)


def run_versioned_table_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    table_dir: str,
    timeout_s: int = 120,
) -> list[int]:
    """Continuously commit a document stream into a snapshot-versioned
    table (sinks/versioned.py): each micro-batch becomes ONE append
    snapshot, tagged with its epoch id so an at-least-once foreachBatch
    REPLAY is a no-op instead of a duplicate commit — exactly-once
    table commits on top of an at-least-once sink contract. Returns
    the committed snapshot ids."""
    from parquet_extractor_spark.sinks.versioned import commit_snapshot

    stream = read_documents_stream(spark, source_dir)
    committed: list[int] = []

    def _sink(batch: DataFrame, epoch: int) -> None:
        committed.append(
            commit_snapshot(
                batch, table_dir, mode="append", tag=f"epoch-{epoch}"
            )
        )

    query = (
        stream.writeStream.foreachBatch(_sink)
        .option(
            "checkpointLocation",
            os.path.join(checkpoint_dir, "versioned_table"),
        )
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(timeout_s):
        query.stop()
        raise TimeoutError(
            f"versioned table stream did not drain within {timeout_s}s"
        )
    return committed

"""Incremental (streaming) entity resolution: new records arrive in
micro-batches and are linked against a persistent cluster state —
the production form of record linkage, where the customer master
grows continuously and re-clustering the full history per arrival is
not an option.

Per micro-batch:

1. shingle the arriving records and compute their prefix grams under
   the HASH total order (operators/entities.hash_prefix_grams) — a
   data-independent order, so prefixes stored in state at ANY earlier
   epoch remain a valid prefix-filter side against every future
   batch (the lemma needs one common total order; the batch form's
   frequency order drifts with the data and is only safe one-shot);
2. candidate pairs = batch-prefix ⋈ state-prefix (on the gram) plus
   the batch's own prefix self-join — never batch × state;
3. exact trigram-Jaccard verification on the carried gram arrays;
4. min-label components over {batch records} ∪ {touched state
   CLUSTERS} — state clusters act as supernodes (an edge to any
   member is an edge to its label), so a new record linking two old
   clusters merges them transitively, and labels stay "min rec_id of
   the component" exactly as the batch operator defines them;
5. the state table is rewritten as ONE epoch-tagged OVERWRITE
   snapshot (sinks/versioned.py): replay is a detected no-op (tag
   check BEFORE any recompute — matching against post-advance state
   would mis-link), history is time-travelable ("the customer master
   as of cycle K").

Equality contract (pinned in tests/test_streaming.py): after
draining ANY partition of the records into ordered batches, the
final state's clustering and golden records equal the one-shot batch
``entity_resolution`` over the same records — arrival order cannot
change the resolved entities.

Scale shape: per cycle the work is (batch prefixes) ⋈ (state
prefixes) — candidate-bounded, proportional to the day's arrivals
times prefix selectivity, never to the master's size; the state
carries 8-byte-bounded prefix grams per record, O(records) rows. The
full-table OVERWRITE rewrite per epoch is the fixture-scale
simplification: a production deployment partitions the state by
cluster-hash and rewrites only touched partitions (same manifest
mechanics; the snapshot sink already supports per-file manifests).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_extractor_spark.operators.entities import (
    _min_label_components,
    _with_grams,
    hash_prefix_grams,
    verify_candidate_pairs,
)

STATE_SCHEMA = (
    "rec_id BIGINT, name STRING, cluster BIGINT, "
    "grams ARRAY<STRING>, prefix ARRAY<STRING>"
)


def _grammed_with_prefix(records: DataFrame) -> DataFrame:
    """(rec_id, name, grams, prefix) for arriving records — prefix
    under the hash order, stored so future batches join against it
    without recomputing state-side windows."""
    grammed = _with_grams(records)
    prefix = (
        hash_prefix_grams(grammed)
        .groupBy("rec_id")
        .agg(F.collect_list("gram").alias("prefix"))
    )
    return grammed.join(prefix, "rec_id")


def resolve_increment(
    state: DataFrame | None, batch: DataFrame
) -> DataFrame:
    """One resolution step: link ``batch`` (rec_id, name) against
    ``state`` (STATE_SCHEMA rows or None) and return the NEW full
    state frame. Pure DataFrame logic — shared by the streaming sink
    and any batch backfill."""
    new = _grammed_with_prefix(batch)
    new_prefix = new.select("rec_id", F.explode("prefix").alias("gram"))

    if state is None:
        state_rows = None
        cross_edges = None
    else:
        state_prefix = state.select(
            "rec_id", "cluster", F.explode("prefix").alias("gram")
        )
        cross_cands = (
            new_prefix.alias("a")
            .join(state_prefix.alias("b"), "gram")
            .select(
                F.col("a.rec_id").alias("rec_a"),
                F.col("b.rec_id").alias("rec_b"),
            )
            .distinct()
        )
        cross_pairs = verify_candidate_pairs(
            cross_cands,
            new.select("rec_id", "grams"),
            state.select("rec_id", "grams"),
        )
        # state records collapse to their cluster supernode
        cross_edges = (
            cross_pairs.join(
                state.select(
                    F.col("rec_id").alias("rec_b"),
                    F.col("cluster").alias("dst"),
                ),
                "rec_b",
            )
            .select(F.col("rec_a").alias("src"), "dst")
            .distinct()
        )
        state_rows = state

    within_cands = (
        new_prefix.alias("a")
        .join(new_prefix.alias("b"), "gram")
        .filter(F.col("a.rec_id") < F.col("b.rec_id"))
        .select(
            F.col("a.rec_id").alias("rec_a"),
            F.col("b.rec_id").alias("rec_b"),
        )
        .distinct()
    )
    within_pairs = verify_candidate_pairs(
        within_cands,
        new.select("rec_id", "grams"),
        new.select("rec_id", "grams"),
    )
    within_edges = within_pairs.select(
        F.col("rec_a").alias("src"), F.col("rec_b").alias("dst")
    )

    batch_nodes = new.select("rec_id")
    if cross_edges is not None:
        touched_clusters = cross_edges.select(
            F.col("dst").alias("rec_id")
        ).distinct()
        nodes = batch_nodes.union(touched_clusters)
        edges = within_edges.union(cross_edges)
    else:
        nodes = batch_nodes
        edges = within_edges

    labels = _min_label_components(nodes, edges)

    new_labeled = new.join(labels, "rec_id").select(
        "rec_id", "name", F.col("cluster"), "grams", "prefix"
    )
    if state_rows is None:
        return new_labeled
    # relabel touched state clusters; untouched rows pass through
    remap = labels.select(
        F.col("rec_id").alias("cluster"),
        F.col("cluster").alias("new_cluster"),
    )
    old_relabeled = (
        state_rows.join(remap, "cluster", "left")
        .select(
            "rec_id",
            "name",
            F.coalesce("new_cluster", "cluster").alias("cluster"),
            "grams",
            "prefix",
        )
    )
    return old_relabeled.unionByName(new_labeled)


def run_entity_resolution_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    state_table_dir: str,
    timeout_s: int = 180,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drain a records landing directory (parquet files of
    (rec_id BIGINT, name STRING, city STRING)) into the persistent
    cluster state, one epoch-tagged OVERWRITE snapshot per
    micro-batch. Returns the final state frame."""
    from parquet_extractor_spark.sinks.versioned import (
        commit_snapshot,
        read_snapshot,
        snapshots,
    )

    stream = (
        spark.readStream.schema(
            "rec_id BIGINT, name STRING, city STRING"
        )
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )

    def _sink(batch: DataFrame, epoch: int) -> None:
        tag = f"epoch-{epoch}"
        if any(m.get("tag") == tag for m in snapshots(state_table_dir)):
            return  # replay: resolving against advanced state mis-links
        try:
            state = read_snapshot(spark, state_table_dir)
        except FileNotFoundError:
            state = None
        new_state = resolve_increment(
            state, batch.select("rec_id", "name")
        )
        commit_snapshot(
            new_state, state_table_dir, mode="overwrite", tag=tag
        )

    query = (
        stream.writeStream.foreachBatch(_sink)
        .option(
            "checkpointLocation",
            os.path.join(checkpoint_dir, "entity_resolution"),
        )
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(timeout_s):
        query.stop()
        raise TimeoutError(
            f"entity resolution stream did not drain within {timeout_s}s"
        )
    return read_snapshot(spark, state_table_dir)

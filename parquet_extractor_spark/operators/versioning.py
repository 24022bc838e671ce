"""Dataset versioning: diff two corpus snapshots by content hash.

A rolling training-data pipeline re-materializes its corpus on every
crawl/curation cycle and must answer "what changed since the last
snapshot?" before deciding whether downstream tiers (dedup index,
tokenizer counts, mixing weights) need rebuilding. The corpus-scale
primitive is a full outer join of the two snapshots on the document
key comparing a content DIGEST — the batch cousin of the reference's
skip-existing sink (reference api.py:248-254, which diffs one output
directory against incoming rows by filename).

Scale shape: each snapshot is reduced MAP-SIDE to
(doc_id, source, md5(text)) before the join, so the shuffle carries
~50-byte rows, never document bodies; the join itself is a plain
hash join on the snapshot key that AQE re-plans per-partition. At
100 TB the diff costs two scans + one skinny shuffle — no text ever
moves.

The two snapshots are derived deterministically from the fixture's
``documents`` table so the query is self-contained and
oracle-checkable. Membership comes from the PORTABLE HASH of the
doc_id, not the raw id — the fixture assigns ``source = src(doc_id
% 20)``, so raw-modulus membership would make whole sources
"added"/"removed" and degenerate the per-source report. With
h = portable_hash64(doc_id): v1 drops h ≡ 0 (mod 10), v2 drops
h ≡ 9 (mod 10) and revises the text of h ≡ 0 (mod 7) — yielding
all four change classes (added / removed / modified / unchanged)
spread across every source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_extractor_spark.functions.text import portable_hash64
from parquet_extractor_spark.sources.tables import load_table


def snapshot_v1(docs: DataFrame) -> DataFrame:
    """First snapshot from any documents frame: (doc_id, source,
    digest). Pure column expressions — stream-safe."""
    h = portable_hash64(F.col("doc_id").cast("string"))
    return docs.where(h % 10 != 0).select(
        "doc_id", "source", F.md5("text").alias("digest")
    )


def snapshot_v2(docs: DataFrame) -> DataFrame:
    """Second snapshot: drops a different decile and revises the text
    of hash-ids ≡ 0 (mod 7). Pure column expressions — stream-safe."""
    h = portable_hash64(F.col("doc_id").cast("string"))
    revised = F.when(
        h % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
    ).otherwise(F.col("text"))
    return docs.where(h % 10 != 9).select(
        "doc_id", "source", F.md5(revised).alias("digest")
    )


def classify_v2_against_v1(v2: DataFrame, v1: DataFrame) -> DataFrame:
    """Per-document changelog for the v2 side: added / modified /
    unchanged, from a LEFT join of v2 against v1's digests. This is
    the stream-safe half of the diff (a stream of arriving v2 docs
    joined stream-static against the previous snapshot's digest
    table); 'removed' is inherently invisible to an insert stream and
    only the batch full-outer form reports it."""
    j = v2.alias("v2").join(
        v1.alias("v1"), F.col("v2.doc_id") == F.col("v1.doc_id"), "left"
    )
    return j.select(
        F.col("v2.doc_id").alias("doc_id"),
        F.col("v2.source").alias("source"),
        F.when(F.col("v1.doc_id").isNull(), "added")
        .when(F.col("v1.digest") != F.col("v2.digest"), "modified")
        .otherwise("unchanged")
        .alias("change_type"),
    )


def _snapshots(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    docs = load_table(spark, sf_dir, "documents")
    return snapshot_v1(docs), snapshot_v2(docs)


def corpus_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, change_type) document counts between two corpus
    snapshots: added / removed / modified / unchanged.

    Digest-compare full outer join on the document key; text is
    reduced to md5 map-side in each snapshot's projection, so the
    exchange ships (doc_id, source, 32-hex digest) only. The grouped
    rollup after the join is a partial-agg groupBy on low-cardinality
    keys. Output: (source, change_type, n_docs).
    """
    v1, v2 = _snapshots(spark, sf_dir)
    j = v1.alias("v1").join(
        v2.alias("v2"), F.col("v1.doc_id") == F.col("v2.doc_id"), "full_outer"
    )
    classified = j.select(
        F.coalesce(F.col("v1.source"), F.col("v2.source")).alias("source"),
        F.when(F.col("v1.doc_id").isNull(), "added")
        .when(F.col("v2.doc_id").isNull(), "removed")
        .when(F.col("v1.digest") != F.col("v2.digest"), "modified")
        .otherwise("unchanged")
        .alias("change_type"),
    )
    return (
        classified.groupBy("source", "change_type")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("source", "change_type")
    )


CORPUS_VERSION_DIFF_SQL = r"""
WITH hashed AS (
    SELECT doc_id, source, text,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
               AS BIGINT) AS h
    FROM documents
),
v1 AS (
    SELECT doc_id, source, md5(text) AS digest
    FROM hashed WHERE h % 10 != 0
),
v2 AS (
    SELECT doc_id, source,
           md5(CASE WHEN h % 7 = 0 THEN text || ' v2' ELSE text END)
               AS digest
    FROM hashed WHERE h % 10 != 9
),
classified AS (
    SELECT coalesce(v1.source, v2.source) AS source,
           CASE WHEN v1.doc_id IS NULL THEN 'added'
                WHEN v2.doc_id IS NULL THEN 'removed'
                WHEN v1.digest != v2.digest THEN 'modified'
                ELSE 'unchanged' END AS change_type
    FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
)
SELECT source, change_type, count(*) AS n_docs
FROM classified
GROUP BY source, change_type
ORDER BY source, change_type
"""

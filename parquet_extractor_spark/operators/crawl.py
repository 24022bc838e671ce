"""Crawl analytics over WARC record frames.

Operates on the output of ``sources.warc.read_warc_docs`` (or its
streaming twin) — the first questions a crawl operator asks of a new
segment before it enters curation:

* ``domain_stats`` — per-registrable-domain page counts, HTTP success
  rate, byte volume, and text yield. Host extraction is the JVM-side
  ``parse_url`` (no Python in the per-row path); "registrable domain"
  is the last two host labels (a documented simplification of the
  Public Suffix List — swap a broadcast PSL table in where exactness
  matters).
* ``latest_capture_per_uri`` — re-fetch dedup: a crawler captures the
  same URI across segments; keep only the newest capture per
  normalized URI (row_number over a URI-partitioned window ordered by
  WARC-Date descending, ties broken by record identity for
  determinism).

Scale shape: both are single-shuffle plans over the already-parsed
record frame — domain_stats is a partial+final agg keyed by domain
(bounded by the web's domain count, heavy-tail skew absorbed by AQE);
latest_capture dedup partitions by URI hash, and no partition exceeds
one URI's capture history. Neither touches payload text beyond
``length()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _host(col: str = "target_uri") -> F.Column:
    # try_parse_url, not parse_url: a crawl always contains junk URIs
    # and host extraction must yield NULL there, never throw
    return F.lower(F.try_parse_url(F.col(col), F.lit("HOST")))


def registrable_domain(col: str = "target_uri") -> F.Column:
    """Last two labels of the URI host ('news.example.co' →
    'example.co'); NULL for records without a parseable host."""
    parts = F.split(_host(col), r"\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1)),
    ).otherwise(_host(col))


def domain_stats(records: DataFrame) -> DataFrame:
    """Per-domain crawl report over response records: pages, distinct
    URIs, 2xx rate (micro units), total record bytes, documents with
    extracted text, and total text chars."""
    resp = records.where(
        (F.col("warc_type") == "response") & F.col("target_uri").isNotNull()
    )
    return (
        resp.select(
            registrable_domain().alias("domain"),
            "target_uri",
            "http_status",
            "n_bytes",
            "text",
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("pages"),
            F.count_distinct("target_uri").cast("bigint").alias("uris"),
            F.floor(
                F.sum(
                    F.when(
                        (F.col("http_status") >= 200)
                        & (F.col("http_status") < 300),
                        1,
                    ).otherwise(0)
                )
                * 1_000_000
                / F.count(F.lit(1))
            )
            .cast("bigint")
            .alias("ok_rate_micro"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.count("text").cast("bigint").alias("docs_with_text"),
            F.sum(F.coalesce(F.length("text"), F.lit(0)))
            .cast("bigint")
            .alias("text_chars"),
        )
        .orderBy("domain")
    )


def latest_capture_per_uri(records: DataFrame) -> DataFrame:
    """Newest capture per URI across segments (re-fetch dedup): keeps
    one row per target_uri — max WARC-Date, ties broken by record_id
    then (path, record_seq) so the survivor is deterministic."""
    resp = records.where(
        (F.col("warc_type") == "response") & F.col("target_uri").isNotNull()
    )
    w = Window.partitionBy("target_uri").orderBy(
        F.desc("warc_date"),
        F.desc("record_id"),
        F.desc("path"),
        F.desc("record_seq"),
    )
    return (
        resp.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )

"""Benchmark decontamination: flag corpus documents that share word
n-grams with a held-out benchmark set.

The real-world shape this models: evaluation benchmarks are tiny
relative to a 100 TB training corpus, so the benchmark's distinct
n-gram set is collected and BROADCAST; the corpus side streams through
a map-side hash probe and never shuffles for the membership test. The
only corpus-wide exchanges are the per-doc partial-aggregated counts
(one row per doc). This is the standard 13-gram-overlap
decontamination recipe (GPT-3 appendix C / Gopher §A.5.2) with n
scaled down to the fixture's short synthetic docs.

The "benchmark" here is a deterministic slice of the documents table
(doc_id % 50 == 0) — self-contained and reproducible in the DuckDB
oracle; swapping in a real benchmark table changes one line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_extractor_spark.functions.text import tokenize, word_ngrams
from parquet_extractor_spark.sources.tables import load_table, spread

DECONTAM_NGRAM = 4
BENCH_MOD = 50


def ngram_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents sharing ≥1 distinct word 4-gram with the benchmark
    slice, with their contamination fraction (shared / total distinct
    grams). Benchmark gram set → distinct → broadcast; corpus side is
    scan + map-side probe + one partial agg keyed by doc_id."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_ngrams(tokenize("text"), DECONTAM_NGRAM))
        ).alias("g"),
    )
    bench = (
        grams.filter((F.col("doc_id") % BENCH_MOD) == 0).select("g").distinct()
    )
    corpus = grams.filter((F.col("doc_id") % BENCH_MOD) != 0)
    totals = corpus.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hits = (
        corpus.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        hits.join(totals, "doc_id")
        .select(
            "doc_id",
            "n_shared",
            "n_grams",
            F.round(F.col("n_shared") / F.col("n_grams"), 4).alias(
                "contamination_frac"
            ),
        )
        .orderBy("doc_id")
    )


NGRAM_DECONTAMINATION_SQL = rf"""
WITH toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(
               regexp_replace(lower(text), '[^\w\s]', ' ', 'g'), '\s+'),
               x -> x != '') AS tokens
    FROM documents
),
pos AS (
    SELECT doc_id, tokens,
           unnest(generate_series(
               1, greatest(len(tokens) - {DECONTAM_NGRAM - 1}, 1))) AS i
    FROM toks
),
grams AS (
    SELECT DISTINCT doc_id,
           array_to_string(tokens[i:i+{DECONTAM_NGRAM - 1}], ' ') AS g
    FROM pos
),
bench AS (
    SELECT DISTINCT g FROM grams WHERE doc_id % {BENCH_MOD} = 0
),
corpus AS (
    SELECT doc_id, g FROM grams WHERE doc_id % {BENCH_MOD} <> 0
),
totals AS (
    SELECT doc_id, count(*) AS n_grams FROM corpus GROUP BY 1
),
hits AS (
    SELECT doc_id, count(*) AS n_shared
    FROM corpus JOIN bench USING (g)
    GROUP BY 1
)
SELECT doc_id, n_shared, n_grams,
       round(n_shared / n_grams, 4) AS contamination_frac
FROM hits JOIN totals USING (doc_id)
ORDER BY doc_id
"""

"""Similarity search over the embeddings table (array<float>, dim 64).

Two tiers:

- **Brute-force cosine top-k** — the exactness baseline. Query set is
  broadcast; every partition scores its local shard against all
  queries (classic map-side cross product), then per-query top-k via
  window. At 100 TB the scan is embarrassingly parallel and the only
  shuffle is the tiny (n_queries × k) candidate set — the win is that
  `zip_with`/`aggregate` keep the dot product inside codegen, no
  Python, no UDF.

- **Sign-LSH bucketed ANN** — axis-aligned sign quantization of the
  leading SIGN_BITS dimensions forms a deterministic bucket id (a
  special case of random-hyperplane LSH, reproducible in the DuckDB
  oracle). Candidates are only same-bucket vectors → the cross product
  shrinks by ~2^SIGN_BITS. Recall is traded for a bounded shuffle;
  probing neighboring buckets (Hamming ≤ 1) is the standard recall
  knob, left as the multi-probe variant.

All arithmetic is cast to double BEFORE summation in both engines so
the oracle compares bit-identical left-to-right folds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from parquet_extractor_spark.sources.tables import load_table

TOP_K = 5
N_QUERIES = 5  # vec_id < 5 are the query vectors
SIGN_BITS = 4
# max same-bucket cosine in the fixture is ~0.51; 0.35 yields a
# meaningful (non-empty) near-dup set for the oracle comparison
NEAR_DUP_THRESHOLD = 0.35


def _dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as a left-to-right fold over doubles (codegen'd)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for the first N_QUERIES vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = (
        load_table(spark, sf_dir, "embeddings")
        .alias("e")
        .join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


# DuckDB fold: list_zip→struct arithmetic is awkward; an equivalent
# exact form is sum over unnested parallel lists (DuckDB zips parallel
# unnests positionally). Summation order over unnest is list order, and
# all terms are doubles → matches Spark's fold bit-for-bit at round(6).
KNN_BRUTEFORCE_SQL = rf"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS q_emb
    FROM embeddings WHERE vec_id < {N_QUERIES}
),
pairs AS (
    SELECT q.query_id,
           e.vec_id AS neighbor_id,
           round(
             list_sum(list_transform(range(1, len(e.embedding) + 1),
                 i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(q.q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
           6) AS cosine_sim
    FROM embeddings e JOIN q ON e.vec_id != q.query_id
),
ranked AS (
    SELECT query_id, neighbor_id, cosine_sim,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, cosine_sim, rank
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def _sign_bucket(emb: Column) -> Column:
    """Bucket id from the signs of the first SIGN_BITS dims."""
    terms = []
    for i in range(SIGN_BITS):
        terms.append(
            F.when(F.element_at(emb, i + 1) >= 0, F.lit(2 ** i)).otherwise(F.lit(0))
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("int")


def ann_sign_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign
    bucket. Join key = bucket id → hash-partitioned candidate join
    instead of a full cross product."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", _sign_bucket(F.col("embedding"))
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    pairs = (
        emb.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


def _bucket_sql(col: str) -> str:
    terms = " + ".join(
        f"CASE WHEN {col}[{i + 1}] >= 0 THEN {2 ** i} ELSE 0 END"
        for i in range(SIGN_BITS)
    )
    return f"CAST({terms} AS INTEGER)"


ANN_SIGN_LSH_SQL = rf"""
WITH emb AS (
    SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
    FROM embeddings
),
q AS (
    SELECT vec_id AS query_id, embedding AS q_emb, bucket AS q_bucket
    FROM emb WHERE vec_id < {N_QUERIES}
),
pairs AS (
    SELECT q.query_id,
           e.vec_id AS neighbor_id,
           round(
             list_sum(list_transform(range(1, len(e.embedding) + 1),
                 i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(q.q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
           6) AS cosine_sim
    FROM emb e JOIN q ON e.bucket = q.q_bucket AND e.vec_id != q.query_id
),
ranked AS (
    SELECT query_id, neighbor_id, cosine_sim,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, cosine_sim, rank
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection (dedup tier 5):
    same-bucket pairs with cosine above threshold. Bucketed join keeps
    the pair space tractable; exact variant = drop the bucket equality."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", _sign_bucket(F.col("embedding"))
    )
    a = emb.alias("a")
    b = emb.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(
                cosine(F.col("a.embedding"), F.col("b.embedding")), 6
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= NEAR_DUP_THRESHOLD)
        .orderBy(F.desc("cosine_sim"), F.asc("vec_a"), F.asc("vec_b"))
    )


EMBEDDING_NEAR_DUP_SQL = rf"""
WITH emb AS (
    SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
    FROM embeddings
),
pairs AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(
             list_sum(list_transform(range(1, len(a.embedding) + 1),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
           6) AS cosine_sim
    FROM emb a JOIN emb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine_sim
FROM pairs WHERE cosine_sim >= {NEAR_DUP_THRESHOLD}
ORDER BY cosine_sim DESC, vec_a ASC, vec_b ASC
"""

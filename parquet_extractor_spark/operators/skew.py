"""Skew-mitigation join utilities.

AQE's skew-join splitting handles most skew transparently (it is on in
session.py), but two cases still need explicit treatment at 100 TB:

1. a *broadcast-too-big, hopelessly-skewed* key distribution on a
   shuffle join — handled by **salting**: the skewed side gets a
   random salt in [0, SALT), the other side is replicated SALT times,
   and the join key becomes (key, salt), spreading each hot key over
   SALT reducers;
2. a *repeated* join against the same huge table — handled by
   **bucketing** (sinks/dataset.write_bucketed): pay one shuffle at
   write time, then every subsequent equi-join on the bucket key runs
   shuffle-free.

Salting trades a SALT× blow-up of the smaller side for even reducer
load; use it when one side is orders of magnitude smaller but still
over the broadcast threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 8


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = DEFAULT_SALT,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the skewed side salted.

    ``skewed`` rows get a uniform salt in [0, salt); ``other`` rows are
    exploded into all `salt` copies. Result equals
    ``skewed.join(other, on, how)`` for inner/left joins (each skewed
    row matches exactly the copies carrying its salt). The join key
    becomes (on, _salt), so one hot key's rows land on `salt` distinct
    reducers instead of one.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_l = skewed.withColumn(
        "_salt", (F.rand(seed) * salt).cast("int")
    )
    replicated_r = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_l.join(replicated_r, [on, "_salt"], how)
    return out.drop("_salt")


SKEW_KEY_COLUMNS = ("l_orderkey", "l_partkey", "l_suppkey")
SKEW_TOP_KEYS = 5


def join_key_skew(spark, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic over the fact table — the measurement
    behind every "salt it / bucket it / leave it" decision this module
    automates. For each candidate lineitem join key: distinct-key
    count, total rows, the heaviest key's row count, the max/mean
    ratio (1.0 = perfectly uniform; the factor the slowest reducer is
    overloaded by on an unsalted shuffle join), and the top heavy keys.

    One scan of the three key columns; a 3-way explode tags each row
    with (key_column, key), then ONE partial+final agg per (column,
    key) and a bounded per-column top-k window. Exact integer counts
    → the ratio divides two exact doubles, identical in any engine.

    Scale: shuffle carries (column, key) partial counts — 3× the key
    cardinality, not 3× the rows; the heavy-key window sees only
    per-key counts and the output is 3 rows.
    """
    from parquet_extractor_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    tagged = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("key_column"),
                        F.col(c).cast("long").alias("key"),
                    )
                    for c in SKEW_KEY_COLUMNS
                ]
            )
        ).alias("t")
    ).select("t.key_column", "t.key")
    counts = tagged.groupBy("key_column", "key").agg(
        F.count(F.lit(1)).alias("c")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("key_column").orderBy(F.desc("c"), "key")
    top = (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= SKEW_TOP_KEYS)
        .groupBy("key_column")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_rn", "key"))
                    ),
                    lambda s: s.key.cast("string"),
                ),
                ",",
            ).alias("top_keys")
        )
    )
    stats = counts.groupBy("key_column").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("total_rows"),
        F.max("c").alias("max_count"),
    )
    return (
        stats.join(top, "key_column")
        .select(
            "key_column",
            "n_keys",
            "total_rows",
            "max_count",
            F.round(
                F.col("max_count").cast("double")
                * F.col("n_keys").cast("double")
                / F.col("total_rows").cast("double"),
                6,
            ).alias("skew_ratio"),
            "top_keys",
        )
        .orderBy("key_column")
    )


# the UNION ALL arms generate from SKEW_KEY_COLUMNS so the oracle
# cannot drift from the Spark side when the column list changes
_SKEW_TAGGED_SQL = "\n    UNION ALL\n    ".join(
    f"SELECT '{c}' AS key_column, {c} AS key FROM lineitem"
    for c in SKEW_KEY_COLUMNS
)

JOIN_KEY_SKEW_SQL = rf"""
WITH tagged AS (
    {_SKEW_TAGGED_SQL}
),
counts AS (
    SELECT key_column, key, count(*) AS c
    FROM tagged GROUP BY 1, 2
),
top AS (
    SELECT key_column,
           array_to_string(list(CAST(key AS VARCHAR) ORDER BY rn), ',')
               AS top_keys
    FROM (
        SELECT key_column, key,
               row_number() OVER (PARTITION BY key_column
                                  ORDER BY c DESC, key) AS rn
        FROM counts
    )
    WHERE rn <= {SKEW_TOP_KEYS}
    GROUP BY key_column
),
stats AS (
    SELECT key_column,
           count(*) AS n_keys,
           CAST(sum(c) AS BIGINT) AS total_rows,
           CAST(max(c) AS BIGINT) AS max_count
    FROM counts GROUP BY 1
)
SELECT key_column, n_keys, total_rows, max_count,
       round(CAST(max_count AS DOUBLE) * CAST(n_keys AS DOUBLE)
             / CAST(total_rows AS DOUBLE), 6) AS skew_ratio,
       top_keys
FROM stats JOIN top USING (key_column)
ORDER BY key_column
"""

"""Spot-check relational queries against DuckDB at sf0.001 (fast
subset of the driver's full t2 gate; tools/check_oracle.py covers all
queries at sf0.01)."""

import math

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SPOT = [
    "corpus_stats",
    "q1_pricing_summary",
    "q5_region_revenue",
    "top_order_per_customer",
    "events_hourly",
    "dedup_exact",
    "minhash_signatures",
    "language_id",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q21_waiting_suppliers",
    "q22_prospect_customers",
]


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


@pytest.mark.parametrize("name", SPOT)
def test_query_matches_duckdb_oracle(spark, duck, sf_small, name):
    sdf = entrymod.queries()[name](spark, sf_small)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    rel = duck.execute(entrymod.oracle_sql()[name])
    dcols = [d[0] for d in rel.description]
    drows = rel.fetchall()

    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    sidx = sorted(range(len(scols)), key=lambda i: scols[i])
    didx = sorted(range(len(dcols)), key=lambda i: dcols[i])
    snorm = sorted(tuple(_norm(r[i]) for i in sidx) for r in srows)
    dnorm = sorted(tuple(_norm(r[i]) for i in didx) for r in drows)
    assert snorm == dnorm


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["document_count"] > 0


def test_every_query_has_oracle_or_is_flagged(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = set(qs) - set(oracles)
    # queries with no SQL-expressible oracle (driver records rows-only);
    # each needs a dedicated accuracy/behavior test in this suite
    flagged_rows_only = {"events_approx_users"}
    assert missing == flagged_rows_only


def test_events_approx_users_accuracy(spark, sf_small):
    """approx_count_distinct at rsd=0.02 must land within 5% of exact."""
    from parquet_extractor_spark.operators.relational import events_approx_users
    from parquet_extractor_spark.sources.tables import load_table

    approx = {
        r.event_type: r.approx_users
        for r in events_approx_users(spark, sf_small).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_small, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(1, 0.05 * n)

"""Deequ-style profiling + constraint suite: generic behavior on a
planted frame, fixture sanity, and plan shape (one scan, no joins in
the profile)."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_extractor_spark.operators.profiling import (
    column_profile,
    events_profile,
    orders_constraint_checks,
)


def test_column_profile_planted_frame(spark):
    df = spark.createDataFrame(
        [
            (1, "aa", 2.5),
            (2, None, -1.25),
            (2, "bbbb", None),
        ],
        "k bigint, s string, v double",
    )
    p = {r.column: r for r in column_profile(df).collect()}
    assert set(p) == {"k", "s", "v"}
    k = p["k"]
    assert (k.n_rows, k.n_nulls, k.n_distinct) == (3, 0, 2)
    assert k.min_micro == 1_000_000 and k.max_micro == 2_000_000
    assert k.avg_len_micro is None
    s = p["s"]
    assert (s.n_nulls, s.n_distinct) == (1, 2)
    assert s.min_micro is None
    assert s.avg_len_micro == 3_000_000  # (2+4)/2 chars
    v = p["v"]
    assert v.min_micro == -1_250_000 and v.max_micro == 2_500_000
    assert v.dtype_class == "float"


def test_column_profile_int32_above_micro_overflow(spark):
    """int/smallint columns widen to bigint BEFORE the ×1e6 micro
    scaling: values above ~2147 overflowed 32-bit arithmetic (error
    under ANSI, silent wrap otherwise)."""
    df = spark.createDataFrame(
        [(100000,), (3000,), (-50000,)], "n int"
    )
    p = {r.column: r for r in column_profile(df).collect()}
    n = p["n"]
    assert n.min_micro == -50_000_000_000
    assert n.max_micro == 100_000_000_000
    assert n.dtype_class == "int"


def test_column_profile_is_single_scan(spark):
    df = spark.createDataFrame([(1, "x")], "a bigint, b string")
    plan = column_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # one scan + aggs + explode, never joins


def test_events_profile_fixture_sanity(spark, sf_small):
    p = {r.column: r for r in events_profile(spark, sf_small).collect()}
    assert set(p) == {
        "event_id", "ts", "user_id", "event_type", "value", "props",
    }
    n = p["event_id"].n_rows
    assert all(r.n_rows == n for r in p.values())
    assert p["event_id"].n_distinct == n  # event_id is the key
    assert p["ts"].dtype_class == "timestamp"
    assert p["ts"].min_micro <= p["ts"].max_micro


def test_orders_constraints_pass_on_fixture_and_catch_violations(
    spark, sf_small
):
    rows = {r.constraint: r for r in
            orders_constraint_checks(spark, sf_small).collect()}
    assert len(rows) == 7
    assert all(r.passed and r.violations == 0 for r in rows.values())

    # doctor the table: constraint evaluation must catch each class
    from parquet_extractor_spark.sources.tables import load_table

    orders = load_table(spark, sf_small, "orders")
    bad = orders.limit(2).select(
        # both planted rows share a key absent from the base table
        F.lit(10**12).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("bigint").alias("o_custkey"),  # null FK
        F.lit("X").alias("o_orderstatus"),  # out of domain
        F.lit(-5.0).alias("o_totalprice"),  # out of range
        F.lit("1985-01-01").cast("timestamp").alias("o_orderdate"),
        F.lit("1-URGENT").alias("o_orderpriority"),
    )
    doctored = orders.unionByName(bad)
    import parquet_extractor_spark.operators.profiling as prof

    orig = prof.load_table
    prof.load_table = lambda sp, sf, t: (
        doctored if t == "orders" else orig(sp, sf, t)
    )
    try:
        v = {r.constraint: r.violations for r in
             orders_constraint_checks(spark, sf_small).collect()}
    finally:
        prof.load_table = orig
    assert v["unique_o_orderkey"] == 1  # two rows, one surviving key
    assert v["non_null_o_custkey"] == 2
    assert v["o_totalprice_positive"] == 2
    assert v["o_orderstatus_domain"] == 2
    assert v["o_orderdate_in_window"] == 2
    # null FK rows do not join customer: they are orphans too
    assert v["o_custkey_references_customer"] == 2


def test_cli_profile(spark, sf_small, capsys):
    import json

    from parquet_extractor_spark.cli import main as cli_main

    rc = cli_main(["profile", sf_small, "--table", "orders"])
    assert rc == 0
    rows = [json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert {r["column"] for r in rows} == {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    }
    assert all(r["n_nulls"] == 0 for r in rows)


def test_orders_benford_audit_recomputed_locally(spark, sf_small):
    """Python recompute of the first-digit counts from integer cents;
    the Benford constants must sum to exactly 1e6 and shares to
    ~1e6."""
    import duckdb

    from parquet_extractor_spark.operators.profiling import (
        BENFORD_MICRO,
        orders_benford_audit,
    )

    assert sum(BENFORD_MICRO) == 1_000_000
    amounts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT o_totalprice FROM '{sf_small}/orders.parquet' "
            "WHERE o_totalprice > 0"
        ).fetchall()
    ]
    from collections import Counter

    want = Counter(int(str(round(a * 100))[0]) for a in amounts)
    got = orders_benford_audit(spark, sf_small).collect()
    assert [r.digit for r in got] == list(range(1, 10))
    total = sum(want.values())
    for r in got:
        assert r.n_amounts == want.get(r.digit, 0)
        assert r.obs_share_micro == r.n_amounts * 1_000_000 // total
        assert r.abs_diff_micro == abs(
            r.obs_share_micro - r.benford_micro
        )
    assert sum(r.n_amounts for r in got) == total

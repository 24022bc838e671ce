from pyspark.sql import functions as F

from parquet_extractor_spark.operators.skew import salted_join
from parquet_extractor_spark.sources.tables import load_table


def test_salted_join_equals_plain_join(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    customer = load_table(spark, sf_small, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = (
        orders.join(customer, "o_custkey")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("tot"))
    )
    salted = (
        salted_join(orders, customer, "o_custkey")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("tot"))
    )
    a = {(r.o_custkey): (r.n, round(r.tot, 2)) for r in plain.collect()}
    b = {(r.o_custkey): (r.n, round(r.tot, 2)) for r in salted.collect()}
    assert a == b


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    right = spark.createDataFrame([(1, "x")], "k int, w string")
    rows = sorted(
        (r.k, r.w) for r in salted_join(left, right, "k", how="left").collect()
    )
    assert rows == [(1, "x"), (2, None), (3, None)]


def test_bucketed_join_has_no_shuffle(spark, sf_small, tmp_path):
    """Two tables bucketed on the join key: the join plan contains no
    Exchange — the pay-once shuffle happened at write time."""
    from parquet_extractor_spark.plans.explain import formatted_plan
    from parquet_extractor_spark.sinks.dataset import write_bucketed

    orders = load_table(spark, sf_small, "orders")
    customer = load_table(spark, sf_small, "customer")
    write_bucketed(orders, "orders_b", ["o_custkey"], n_buckets=8)
    write_bucketed(
        customer.select(F.col("c_custkey").alias("o_custkey"), "c_acctbal"),
        "customer_b",
        ["o_custkey"],
        n_buckets=8,
    )
    # disable auto-broadcast: at fixture scale the planner would
    # broadcast the dimension and never consult bucketing; at real
    # scale both sides are over the threshold, which is the scenario
    # bucketing exists for.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(
            spark.table("customer_b"), "o_custkey"
        )
        plan = formatted_plan(joined)
        assert "Exchange" not in plan  # neither shuffle nor broadcast
        assert "SortMergeJoin" in plan
        assert joined.count() == orders.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_join_key_skew_report(spark, sf_small):
    from parquet_extractor_spark.operators.skew import (
        SKEW_KEY_COLUMNS,
        join_key_skew,
    )

    rows = {r.key_column: r for r in join_key_skew(spark, sf_small).collect()}
    assert set(rows) == set(SKEW_KEY_COLUMNS)
    li = load_table(spark, sf_small, "lineitem")
    n = li.count()
    for col, r in rows.items():
        assert r.total_rows == n
        assert r.n_keys == li.select(col).distinct().count()
        top = r.top_keys.split(",")
        assert 1 <= len(top) <= 5
        # heaviest key recomputed directly
        heavy = (
            li.groupBy(col)
            .count()
            .orderBy(F.desc("count"), col)
            .first()
        )
        assert int(top[0]) == heavy[col]
        assert r.max_count == heavy["count"]
        assert r.skew_ratio >= 1.0


def test_range_clustered_layout_enables_file_pruning(spark, sf_small, tmp_path):
    """Layout evidence: the same documents written range-clustered on
    doc_id let a min/max reader open ~1-2 of 8 files per narrow range
    probe, while the unsorted layout pins every probe at 100% of
    files. Both layouts must read back identically."""
    from parquet_extractor_spark.sinks.dataset import (
        file_pruning_report,
        write_range_clustered,
    )
    from parquet_extractor_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    unsorted_dir = str(tmp_path / "unsorted")
    clustered_dir = str(tmp_path / "clustered")
    # shuffle rows round-robin so each unsorted file spans the domain
    docs.repartition(8).write.parquet(unsorted_dir)
    write_range_clustered(docs, clustered_dir, "doc_id", 8)

    probes = [(0, 24), (200, 240), (480, 499)]
    flat = {
        (r.probe_lo, r.probe_hi): r
        for r in file_pruning_report(
            spark, unsorted_dir, "doc_id", probes
        ).collect()
    }
    clus = {
        (r.probe_lo, r.probe_hi): r
        for r in file_pruning_report(
            spark, clustered_dir, "doc_id", probes
        ).collect()
    }
    for p in probes:
        assert flat[p].n_files == 8 and clus[p].n_files == 8
        assert flat[p].scan_fraction_micro == 1_000_000, p
        assert clus[p].n_files_hit <= 2, (p, clus[p])

    # layout must not change the data
    a = sorted(r.doc_id for r in spark.read.parquet(unsorted_dir).collect())
    b = sorted(
        r.doc_id for r in spark.read.parquet(clustered_dir).collect()
    )
    assert a == b

    # and Spark's own scan pushes the range predicate down on the
    # clustered layout (row-group skipping applies on top of the
    # file-level pruning the report quantifies)
    plan = (
        spark.read.parquet(clustered_dir)
        .filter("doc_id >= 200 and doc_id <= 240")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "GreaterThanOrEqual(doc_id,200)" in plan

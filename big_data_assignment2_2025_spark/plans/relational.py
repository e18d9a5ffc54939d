"""Relational operator surface over the TPC-H-ish synthetic tables
(SURVEY.md §7 step 3): filters/projections, every join flavor, hash
aggregations, distinct, set ops, sort/limit/top-k, grouping sets/rollup/
cube, pivot/unpivot, window functions, subquery patterns.

Everything is stock DataFrame API — Catalyst supplies pushdown, pruning,
join selection (broadcast hints added where a side is provably small) and
TakeOrderedAndProject for top-k.

Float determinism contract (applies to every oracle-checked query here):
- SUM over non-integral doubles goes through ``decimal`` on BOTH sides —
  decimal addition is exact, so the result does not depend on Spark's
  partial-aggregation order, and the final cast-to-double is identical in
  Spark and DuckDB.
- ``l_quantity`` is integral-valued, so plain double sums are exact.
- Orderings that feed LIMIT carry a full tie-break key set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..sources.readers import load_table


def _dec(col, p=12, s=2):
    return F.col(col).cast(f"decimal({p},{s})")


# ---------------------------------------------------------------------------
# Aggregation pipelines
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy filter + 8-agg groupBy (SURVEY.md A1-A7
    analogue on the synthetic star schema).

    Money aggregates are carried as EXACT integer sums (cents for the
    base price, the natural 1e-4/1e-6 fixed-point for the discount/tax
    products) and converted to one frozen double division at the end.
    The previous spelling summed exact DECIMALs and cast the SUM to
    double — but the two engines round that decimal->double conversion
    differently on 1-ulp boundary values, which the r11 10x oracle
    sweep caught on sum_charge (invisible at sf0.1: smaller sums, a
    boundary value never materialized). Integer sums never hit a
    conversion boundary: qty/count values are exact in double, and each
    money column is ONE bigint->double division on both engines.

    Overflow headroom (ADVICE r12): the e4/e6 fixed-point rows are
    ~1e9/~1e11 each, so a single BIGINT sum would wrap at roughly
    sf>=1500 / sf>=100 (Spark wraps silently non-ANSI; DuckDB promotes
    to HUGEINT then errors on the cast back — the engines diverge
    exactly where a bigger sweep would land next). Each of those sums
    is therefore split PER ROW into (value div scale, value mod scale)
    and summed as two small BIGINTs — hi <= ~1.5e5/row, lo < scale —
    recombined as ONE int->double add + divide at the end. Both partial
    sums stay exactly representable in double far past sf100k, and the
    recombination is the same two IEEE ops on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    # exact per-row fixed-point: cents, then the discount/tax products
    # stay integral at scale 1e-4 / 1e-6 (cents x cents)
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    tax_c = F.round(F.col("l_tax") * 100).cast("long")
    disc_price_e4 = price_c * (100 - disc_c)          # scale 1e-4
    charge_e6 = disc_price_e4 * (100 + tax_c)          # scale 1e-6
    # per-row hi/lo split: (x - x % s) / s is exactly integral, and the
    # double division is exact (multiple of s, < 2^53)
    dp_lo = disc_price_e4 % 10000
    dp_hi = ((disc_price_e4 - dp_lo) / 10000).cast("long")
    ch_lo = charge_e6 % 1000000
    ch_hi = ((charge_e6 - ch_lo) / 1000000).cast("long")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            (F.sum(price_c) / 100.0).alias("sum_base_price"),
            (F.sum(dp_hi) + F.sum(dp_lo) / 10000.0).alias("sum_disc_price"),
            (F.sum(ch_hi) + F.sum(ch_lo) / 1000000.0).alias("sum_charge"),
            (F.sum("l_quantity") / F.count("*")).alias("avg_qty"),
            (F.sum(price_c) / (F.count("*") * 100.0)).alias("avg_price"),
            (F.sum(disc_c) / (F.count("*") * 100.0)).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = """
WITH li AS (
  SELECT l_returnflag, l_linestatus, l_quantity,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
         CAST(round(l_discount * 100) AS BIGINT) AS disc_c,
         CAST(round(l_tax * 100) AS BIGINT) AS tax_c
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'),
fx AS (
  SELECT l_returnflag, l_linestatus, l_quantity, price_c, disc_c,
         price_c * (100 - disc_c) AS dp_e4,
         price_c * (100 - disc_c) * (100 + tax_c) AS ch_e6
  FROM li)
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       CAST(SUM(price_c) AS BIGINT) / 100.0 AS sum_base_price,
       CAST(SUM(dp_e4 // 10000) AS BIGINT)
         + CAST(SUM(dp_e4 % 10000) AS BIGINT) / 10000.0 AS sum_disc_price,
       CAST(SUM(ch_e6 // 1000000) AS BIGINT)
         + CAST(SUM(ch_e6 % 1000000) AS BIGINT) / 1000000.0 AS sum_charge,
       SUM(l_quantity) / COUNT(*) AS avg_qty,
       CAST(SUM(price_c) AS BIGINT) / (COUNT(*) * 100.0) AS avg_price,
       CAST(SUM(disc_c) AS BIGINT) / (COUNT(*) * 100.0) AS avg_disc,
       COUNT(*) AS count_order
FROM fx
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + top-10 (TakeOrderedAndProject). Revenue ranked on
    the exact decimal sum; tie-broken by orderkey."""
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("2000-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    revenue = F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4, 2))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("rev_dec"))
        .orderBy(F.col("rev_dec").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            F.col("rev_dec").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


Q3_SQL = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '2000-03-15'
  AND l_shipdate  > TIMESTAMP '1997-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) DESC,
         l_orderkey ASC
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way star join: dims broadcast, facts shuffle once (TPC-H Q5 shape)."""
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4, 2))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .where(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(revenue.cast("double").alias("revenue"))
    )


Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
GROUP BY n_name
"""


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
        F.max(_dec("o_totalprice")).cast("double").alias("max_price"),
        F.min(_dec("o_totalprice")).cast("double").alias("min_price"),
    )


AGG_DISTINCT_SQL = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price,
       CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS min_price
FROM orders GROUP BY o_orderpriority
"""


def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy + HAVING (post-aggregation filter)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.count("*").alias("n_lines"), F.sum("l_quantity").alias("total_qty"))
        .where(F.col("n_lines") > 30)
    )


HAVING_SQL = """
SELECT l_partkey, COUNT(*) AS n_lines, SUM(l_quantity) AS total_qty
FROM lineitem GROUP BY l_partkey HAVING COUNT(*) > 30
"""


def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("sum_qty")
    )


ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )


CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .na.fill(0, ["O", "F", "P"])
    )


PIVOT_SQL = """
SELECT c_mktsegment,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def unpivot_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot via stack() (SURVEY.md common-pattern list)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.expr(
            "stack(2, 'size', CAST(p_size AS DOUBLE), 'retailprice', p_retailprice)"
        ).alias("attr", "val"),
    )


UNPIVOT_SQL = """
SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
UNION ALL
SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part
"""


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order counts including zero-order customers (Q13 shape)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


JOIN_LEFT_SQL = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS: customers having at least one 'F' order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS: parts never shipped."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return part.join(li, part.p_partkey == li.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


JOIN_ANTI_SQL = """
SELECT p_partkey, p_name FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
"""


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer: nations present in customer vs supplier bases."""
    cust_n = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_cust"))
    )
    supp_n = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_supp"))
    )
    return cust_n.join(
        supp_n, cust_n.c_nationkey == supp_n.s_nationkey, "full_outer"
    ).select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


JOIN_FULL_SQL = """
WITH c AS (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust,
       COALESCE(n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
"""


def cross_join_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global scalar folded into a filter via crossJoin(broadcast(...)) —
    the J4 pattern (reference lit(total_docs)); MAX is exact on doubles so
    the comparison is deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    mx = li.agg(F.max("l_extendedprice").alias("max_price"))
    return (
        orders.crossJoin(F.broadcast(mx))
        .where(F.col("o_totalprice") > F.col("max_price"))
        .select("o_orderkey", "o_totalprice")
    )


CROSS_SCALAR_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_totalprice > (SELECT MAX(l_extendedprice) FROM lineitem)
"""


def correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders strictly above their customer's max other... simplified:
    orders equal to their customer's most expensive order (per-group max,
    exact double comparison)."""
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.groupBy("o_custkey").agg(F.max("o_totalprice").alias("cust_max"))
    return (
        orders.join(mx, "o_custkey")
        .where(F.col("o_totalprice") == F.col("cust_max"))
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


CORRELATED_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice FROM orders o
WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                      WHERE o2.o_custkey = o.o_custkey)
"""


# ---------------------------------------------------------------------------
# Filters / projections / set ops / dedup / top-k
# ---------------------------------------------------------------------------

def filter_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sargable IN-list + range predicate (the P3/P4 pattern) — pushed to
    the parquet scan."""
    part = load_table(spark, sf_dir, "part")
    return part.where(
        F.col("p_brand").isin("Brand#1", "Brand#3") & (F.col("p_size") >= 5)
    ).select("p_partkey", "p_name", "p_brand", "p_size")


FILTER_IN_SQL = """
SELECT p_partkey, p_name, p_brand, p_size FROM part
WHERE p_brand IN ('Brand#1', 'Brand#3') AND p_size >= 5
"""


def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.where(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.unionByName(b)


SET_UNION_SQL = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION ALL
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.where(F.col("c_acctbal") > 0).select("c_custkey")
    return a.intersect(b)


SET_INTERSECT_SQL = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT c_custkey FROM customer WHERE c_acctbal > 0
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.select("c_custkey").exceptAll(
        orders.select(F.col("o_custkey").alias("c_custkey"))
    ).distinct()


SET_EXCEPT_SQL = """
SELECT DISTINCT c_custkey FROM (
  SELECT c_custkey FROM customer
  EXCEPT ALL
  SELECT o_custkey AS c_custkey FROM orders
)
"""


def dedup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select("c_nationkey", "c_mktsegment").distinct()


DEDUP_DISTINCT_SQL = """
SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
"""


def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k -> TakeOrderedAndProject, no full sort."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(15)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15
"""


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per market segment (row_number)."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rn")
    )


WINDOW_TOPK_SQL = """
SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
  FROM customer
) WHERE rn <= 3
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running quantity per supplier over ship order (cumulative frame).
    l_quantity is integral -> exact double accumulation on both engines.

    The synthetic lineitem does NOT have unique (l_orderkey,
    l_linenumber) pairs (~20% duplicated), so the order key carries
    l_quantity too: rows that still tie then hold EQUAL quantities, so
    every tie permutation yields the same running values and the output
    multiset is engine-independent. Caught by the r12 skew-fixture
    sweep — hot suppliers concentrated the duplicate pairs into one
    window partition and the old ordering diverged cross-engine."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 3)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum("l_quantity").over(w).alias("running_qty"),
    )


WINDOW_RUNNING_SQL = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       SUM(l_quantity) OVER (PARTITION BY l_suppkey
                             ORDER BY l_shipdate, l_orderkey, l_linenumber,
                                      l_quantity
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
FROM lineitem WHERE l_suppkey <= 3
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Previous/next order price per customer over order date."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 20)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
    )


WINDOW_LAG_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       LAG(o_totalprice, 1)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
       LEAD(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
FROM orders WHERE o_custkey <= 20
"""


def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return part.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


WINDOW_RANK_SQL = """
SELECT p_brand, p_partkey, p_retailprice,
       RANK()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank,
       DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_dense_rank
FROM part
"""


# ---------------------------------------------------------------------------
# Scalar function surface
# ---------------------------------------------------------------------------

def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).cast("int").alias("brand_num"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
    )


STRING_SQL = """
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       LENGTH(p_name) AS name_len,
       SUBSTRING(p_type, 1, 5) AS type_prefix,
       CONCAT_WS('|', p_brand, p_type) AS brand_type,
       CAST(regexp_extract(p_brand, '#(\\d+)', 1) AS INTEGER) AS brand_num,
       LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       REPLACE(p_type, ' ', '_') AS type_snake
FROM part
"""


def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.lit("2001-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_2001"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
    )


DATE_SQL = """
SELECT o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
       CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS order_month,
       CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS order_day,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS order_quarter,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-01-01') AS INTEGER) AS days_to_2001,
       CAST(o_orderdate AS DATE) + 30 AS due_date,
       strftime(o_orderdate, '%Y-%m') AS year_month
FROM orders WHERE o_orderkey <= 500
"""


def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.abs("c_acctbal").alias("abs_bal"),
        F.floor("c_acctbal").cast("long").alias("floor_bal"),
        F.ceil("c_acctbal").cast("long").alias("ceil_bal"),
        F.round(F.sqrt(F.abs("c_acctbal")), 6).alias("sqrt_bal"),
        F.round(F.log(F.abs(F.col("c_acctbal")) + 1.0), 6).alias("ln_bal"),
        # x*x, not pow(x,2): IEEE multiply is correctly rounded on every
        # engine, while Java Math.pow vs libm pow differ by 1 ulp on ~1e-3
        # of inputs (16/15k customers at sf0.1)
        (F.col("c_acctbal") * F.col("c_acctbal")).alias("bal_sq"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_pos"),
        F.sign("c_acctbal").alias("bal_sign"),
    )


MATH_SQL = """
SELECT c_custkey,
       ABS(c_acctbal) AS abs_bal,
       CAST(FLOOR(c_acctbal) AS BIGINT) AS floor_bal,
       CAST(CEIL(c_acctbal) AS BIGINT) AS ceil_bal,
       ROUND(SQRT(ABS(c_acctbal)), 6) AS sqrt_bal,
       ROUND(LN(ABS(c_acctbal) + 1.0), 6) AS ln_bal,
       c_acctbal * c_acctbal AS bal_sq,
       GREATEST(c_acctbal, 0.0) AS bal_pos,
       CAST(SIGN(c_acctbal) AS DOUBLE) AS bal_sign
FROM customer
"""


def case_when_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debtor")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("(default)")
        ).alias("segment_or_default"),
        F.col("c_acctbal").isNull().cast("int").alias("bal_is_null"),
    )


CASE_SQL = """
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debtor'
            WHEN c_acctbal < 1000 THEN 'low'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END AS bal_band,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(default)') AS segment_or_default,
       CAST(c_acctbal IS NULL AS INTEGER) AS bal_is_null
FROM customer
"""


def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles/median per group (Spark ``percentile`` == DuckDB
    ``quantile_cont`` with linear interpolation) plus stddev — the numeric
    profiling aggregates the reference lacks entirely (SURVEY §2.4)."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.5)"), 4).alias("median_price"),
            F.round(F.expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.9)"), 4).alias("p90_price"),
            F.round(F.stddev_samp(price), 4).alias("sd_price"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


PERCENTILE_SQL = """
SELECT l_returnflag,
       round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 4) AS median_price,
       round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9), 4) AS p90_price,
       round(stddev_samp(CAST(l_extendedprice AS DOUBLE)), 4) AS sd_price,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style MERGE INTO emulation (operators/merge.py): a staging set of
    updates (every 10th order gets +100.00 and status 'U') and inserts
    (negated keys for orderkey % 17 == 3) merged into orders in ONE
    full-outer shuffle join. Updates are additive (+100.0 is an exact IEEE
    double op) so no cross-engine rounding is involved."""
    from ..operators.merge import merge_upsert

    orders = load_table(spark, sf_dir, "orders")
    target = orders.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        "o_orderstatus",
    )
    updates = target.where(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") + F.lit(100.0)).alias("o_totalprice"),
        F.lit("U").alias("o_orderstatus"),
    )
    inserts = target.where(F.col("o_orderkey") % 17 == 3).select(
        (-F.col("o_orderkey")).alias("o_orderkey"),
        "o_custkey",
        "o_totalprice",
        F.lit("N").alias("o_orderstatus"),
    )
    staging = updates.unionByName(inserts)
    return merge_upsert(target, staging, on=["o_orderkey"])


MERGE_UPSERT_SQL = """
WITH target AS (
  SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
         o_orderstatus
  FROM orders),
staging AS (
  SELECT o_orderkey, o_custkey, o_totalprice + 100.0 AS o_totalprice,
         'U' AS o_orderstatus
  FROM target WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT -o_orderkey, o_custkey, o_totalprice, 'N'
  FROM target WHERE o_orderkey % 17 = 3)
SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
       COALESCE(s.o_custkey, t.o_custkey) AS o_custkey,
       COALESCE(s.o_totalprice, t.o_totalprice) AS o_totalprice,
       COALESCE(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
       CASE WHEN t.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL
              THEN 'update'
            WHEN t.o_orderkey IS NULL THEN 'insert'
            ELSE 'keep' END AS merge_action
FROM target t FULL OUTER JOIN staging s ON t.o_orderkey = s.o_orderkey
"""


def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — ntile / percent_rank / cume_dist over
    customer balances per market segment — computed WITHOUT a per-segment
    window: a segment is ~20% of the customer dimension and grows with the
    data, so ``Window.partitionBy(c_mktsegment)`` is a straggler at 1e9
    customers. ``operators.ranking.with_partitioned_ranks`` delivers the
    exact per-segment rank and segment size with every window partitioned
    by (segment, range-bucket); the three distribution functions are then
    closed-form in (rank, n): the ordering key includes custkey so the
    order is total, making rank == row_number and percent_rank/cume_dist
    the exact rationals (rank-1)/(n-1) and rank/n in the same IEEE double
    division DuckDB performs. The metric key is exact integer cents
    (acctbal has 2 decimals), monotone with the (acctbal, custkey) order.
    """
    from ..operators.ranking import (
        NtileSpec,
        _tile_of_rank_col,
        with_partitioned_ranks,
    )

    cust = load_table(spark, sf_dir, "customer")
    ranked = with_partitioned_ranks(
        cust,
        "c_mktsegment",
        NtileSpec(
            "bal",
            F.round(F.col("c_acctbal") * 100).cast("long"),
            [F.col("c_acctbal").asc(), F.col("c_custkey").asc()],
        ),
        rank_col="__r",
        count_col="__n",
    )
    r, n = F.col("__r"), F.col("__n")
    return ranked.select(
        "c_custkey",
        "c_mktsegment",
        _tile_of_rank_col(r, n, 4).alias("bal_quartile"),
        F.round(
            F.when(n > 1, (r - 1).cast("double") / (n - 1)).otherwise(0.0), 6
        ).alias("bal_pct_rank"),
        F.round(r.cast("double") / n, 6).alias("bal_cume_dist"),
    )


WINDOW_DISTRIBUTION_SQL = """
SELECT c_custkey, c_mktsegment,
       NTILE(4) OVER w AS bal_quartile,
       round(PERCENT_RANK() OVER w, 6) AS bal_pct_rank,
       round(CUME_DIST() OVER w, 6) AS bal_cume_dist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
"""


def array_hof_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column — transform,
    filter, aggregate (left fold), slice — all JVM-side codegen expressions,
    zero UDFs. Float math stays portable because both engines fold
    left-to-right over the same double-cast elements (and results are
    rounded to 6)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("vec_sum"),
        F.round(
            F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x), 6
        ).alias("vec_sumsq"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_positive"),
        F.round(
            F.aggregate(F.slice(v, 1, 8), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("head8_sum"),
    )


ARRAY_HOF_SQL = """
WITH v AS (
  SELECT vec_id, len(embedding) AS dim,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
  FROM embeddings)
SELECT vec_id, dim,
       round(list_reduce(list_prepend(0.0, vd), (a, x) -> a + x), 6) AS vec_sum,
       round(list_reduce(list_prepend(0.0, vd), (a, x) -> a + x * x), 6) AS vec_sumsq,
       len(list_filter(vd, x -> x > 0)) AS n_positive,
       round(list_reduce(list_prepend(0.0, vd[1:8]), (a, x) -> a + x), 6) AS head8_sum
FROM v
"""


def stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price per return flag —
    computed from EXACT integer moment sums, not ``F.corr``.

    Native corr/covar are single-pass float accumulations whose result
    depends on partition/summation order, so they can never hash-match a
    serial engine. Here the 2-decimal price is scaled to integer cents
    (correlation is scale-invariant, the factor cancels), all five moment
    sums are exact integers (decimal(38,0) on Spark, HUGEINT on DuckDB —
    different exact representations of the SAME integers), and the closing
    float formula runs the identical IEEE op sequence on both engines.
    Distributed-wise this is ONE map-side-combinable aggregation — exactly
    what F.corr does internally, minus the order sensitivity.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = li.groupBy("l_returnflag").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum(d("x")).alias("sx"),
        F.sum(d("y")).alias("sy"),
        F.sum(d("x") * d("y")).alias("sxy"),
        F.sum(d("x") * d("x")).alias("sx2"),
        F.sum(d("y") * d("y")).alias("sy2"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varx = (F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")).cast("double")
    vary = (F.col("n") * F.col("sy2") - F.col("sy") * F.col("sy")).cast("double")
    # no presentation orderBy: it would add a rangepartitioning exchange for
    # a 3-row result (the gate compares order-insensitively)
    return m.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_rows"),
        F.round(num / (F.sqrt(varx) * F.sqrt(vary)), 6).alias("qty_price_corr"),
    )


STATS_CORR_SQL = """
WITH s AS (
  SELECT l_returnflag,
         CAST(l_quantity AS BIGINT) AS x,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem),
m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx,
         SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sx2,
         SUM(CAST(y AS HUGEINT) * y) AS sy2
  FROM s GROUP BY l_returnflag)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_rows,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sx2 - sx * sx AS DOUBLE))
                * sqrt(CAST(n * sy2 - sy * sy AS DOUBLE))), 6) AS qty_price_corr
FROM m
ORDER BY l_returnflag
"""


def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution shape: candidate pairs via a blocking key (nation),
    verified by edit distance — the classic fuzzy-dedup plan. The equi-join
    on the block key is what makes this scale (never an unblocked N²
    cross-product; same principle as the LSH band join in operators/dedup);
    levenshtein runs only inside blocks."""
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_name"
    )
    a = sup.select(
        F.col("s_suppkey").alias("k1"),
        F.col("s_nationkey").alias("nation"),
        F.col("s_name").alias("n1"),
    )
    b = sup.select(
        F.col("s_suppkey").alias("k2"),
        F.col("s_nationkey").alias("nation"),
        F.col("s_name").alias("n2"),
    )
    return (
        a.join(b, "nation")
        .where(F.col("k1") < F.col("k2"))
        .withColumn("edit_dist", F.levenshtein("n1", "n2"))
        .where(F.col("edit_dist") <= 2)
        .select("nation", "k1", "k2", "edit_dist")
    )


FUZZY_NAME_SQL = """
SELECT a.s_nationkey AS nation, a.s_suppkey AS k1, b.s_suppkey AS k2,
       levenshtein(a.s_name, b.s_name) AS edit_dist
FROM supplier a JOIN supplier b
  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 2
"""


def gini_balance_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration coefficient of positive account balances per
    market segment — the inequality metric of a numeric distribution, via
    the sorted-rank formula G = (2*Σ(i*x_i) - (n+1)*Σx) / (n*Σx).

    Portability: balances are 2-decimal -> exact integer cents; ranks come
    from a total-order window; numerator and denominator are computed fully
    in int64 (no overflow: rank*cents <= 3e10 per row) so the ONLY float
    operation is the final division — bit-identical everywhere. One window
    shuffle + one aggregation on the same key."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 0)
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("cents").asc(), F.col("c_custkey").asc()
    )
    ranked = cust.select(
        "c_mktsegment", "c_custkey", cents.alias("cents")
    ).withColumn("i", F.row_number().over(w).cast("long"))
    agg = ranked.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s0"),
        F.sum(F.col("i") * F.col("cents")).alias("s1"),
    )
    num = 2 * F.col("s1") - (F.col("n") + 1) * F.col("s0")
    den = F.col("n") * F.col("s0")
    return agg.select(
        "c_mktsegment",
        F.col("n").alias("n_customers"),
        F.round(num.cast("double") / den.cast("double"), 6).alias("gini"),
    ).orderBy("c_mktsegment")


GINI_SQL = """
WITH c AS (
  SELECT c_mktsegment, c_custkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer WHERE c_acctbal > 0),
r AS (
  SELECT c_mktsegment, cents,
         CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                 ORDER BY cents ASC, c_custkey ASC) AS BIGINT) AS i
  FROM c),
a AS (
  SELECT c_mktsegment, COUNT(*) AS n, SUM(cents) AS s0, SUM(i * cents) AS s1
  FROM r GROUP BY c_mktsegment)
SELECT c_mktsegment, n AS n_customers,
       round(CAST(2 * s1 - (n + 1) * s0 AS DOUBLE)
             / CAST(n * s0 AS DOUBLE), 6) AS gini
FROM a
ORDER BY c_mktsegment
"""


def division_full_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division ("for all"): suppliers who supply EVERY size-1
    part of Brand#1. Expressed as count-matching — distinct supplied target
    parts per supplier == total target parts — which is one broadcast of a
    single scalar plus one aggregation, instead of the textbook double
    NOT EXISTS (two correlated anti-joins)."""
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") == 1)
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey")
    total = part.agg(F.count("*").alias("n_target"))
    covered = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.countDistinct("l_partkey").alias("n_supplied"))
    )
    return (
        covered.crossJoin(F.broadcast(total))
        .where(F.col("n_supplied") == F.col("n_target"))
        .select(F.col("l_suppkey").alias("s_suppkey"), "n_supplied")
    )


DIVISION_SQL = """
WITH target AS (
  SELECT p_partkey FROM part WHERE p_brand = 'Brand#1' AND p_size = 1),
covered AS (
  SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_supplied
  FROM lineitem JOIN target ON l_partkey = p_partkey
  GROUP BY l_suppkey)
SELECT l_suppkey AS s_suppkey, n_supplied
FROM covered
WHERE n_supplied = (SELECT COUNT(*) FROM target)
"""


def revenue_growth_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: monthly sums in exact integer cents,
    lag window over months, growth ratio as the single float op. The window
    runs over an already-aggregated ~tens-of-rows frame — the shuffle heavy
    lifting happened in the month rollup."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("rev_cents")
        )
    )
    w = Window.orderBy("month")
    return (
        monthly.withColumn("prev_cents", F.lag("rev_cents").over(w))
        .select(
            "month",
            "rev_cents",
            F.round(
                F.col("rev_cents").cast("double")
                / F.col("prev_cents").cast("double")
                - 1.0,
                6,
            ).alias("growth"),
        )
        .orderBy("month")
    )


REVENUE_GROWTH_SQL = """
WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1)
SELECT month, rev_cents,
       round(CAST(rev_cents AS DOUBLE)
             / CAST(LAG(rev_cents) OVER (ORDER BY month) AS DOUBLE) - 1.0,
             6) AS growth
FROM m
ORDER BY month
"""


def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: part pairs co-occurring in the same order,
    kept when seen in >= 3 orders, top-25 by support. The self-join key is
    the order — pair fan-out is bounded by order size squared (TPC-H orders
    hold <= 7 lineitems), so the join is linear in orders, never parts²."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.select("l_orderkey", F.col("l_partkey").alias("part1"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part2"))
    return (
        a.join(b, "l_orderkey")
        .where(F.col("part1") < F.col("part2"))
        .groupBy("part1", "part2")
        .agg(F.count("*").alias("n_orders"))
        .where(F.col("n_orders") >= 3)
        .orderBy(F.col("n_orders").desc(), F.col("part1").asc(), F.col("part2").asc())
        .limit(25)
    )


BASKET_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part1, b.l_partkey AS part2, COUNT(*) AS n_orders
FROM li a JOIN li b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING COUNT(*) >= 3
ORDER BY n_orders DESC, part1 ASC, part2 ASC
LIMIT 25
"""


def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer scoring: recency (days since last order), frequency
    (order count), monetary (exact cent sum), each cut into quartiles over
    a TOTAL order (custkey tiebreak) — the standard marketing segmentation
    rollup.

    Scale shape: the quartiles are positional-NTILE-exact but computed via
    ``operators.ranking.with_global_ntiles`` — range-bucket boundaries from
    ``percentile_approx`` embedded as literals, per-bucket counts folded
    into literal rank offsets, ``row_number`` over windows PARTITIONED by
    bucket. No unpartitioned window anywhere, so the customer dimension is
    never funneled through a single sort; the oracle keeps plain NTILE and
    the results are bit-identical (the positional tile rule is engine-
    independent given the total order)."""
    from ..operators.ranking import NtileSpec, with_global_ntiles

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "monetary_cents"
        ),
    )
    scored = with_global_ntiles(
        per_cust,
        [
            # recency (a few thousand distinct dates) and frequency (a few
            # dozen distinct counts) are tie-heavy -> composite boundaries
            # via sub_key so tie groups split across buckets; monetary is
            # near-unique and metric-only boundaries suffice
            NtileSpec(
                "r_score",
                -F.unix_date("last_order"),
                [F.col("last_order").desc(), F.col("o_custkey").asc()],
                sub_key=F.col("o_custkey"),
            ),
            NtileSpec(
                "f_score",
                -F.col("frequency"),
                [F.col("frequency").desc(), F.col("o_custkey").asc()],
                sub_key=F.col("o_custkey"),
            ),
            NtileSpec(
                "m_score",
                -F.col("monetary_cents"),
                [F.col("monetary_cents").desc(), F.col("o_custkey").asc()],
            ),
        ],
        n_tiles=4,
    )
    return scored.select(
        F.col("o_custkey").alias("c_custkey"),
        "frequency",
        "monetary_cents",
        "r_score",
        "f_score",
        "m_score",
    )


RFM_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         MAX(CAST(o_orderdate AS DATE)) AS last_order,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
  FROM orders GROUP BY o_custkey)
SELECT o_custkey AS c_custkey, frequency, monetary_cents,
       NTILE(4) OVER (ORDER BY last_order DESC, o_custkey ASC) AS r_score,
       NTILE(4) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_score,
       NTILE(4) OVER (ORDER BY monetary_cents DESC, o_custkey ASC) AS m_score
FROM per_cust
"""


QUERIES = {
    "array_hof_funcs": array_hof_funcs,
    "basket_part_pairs": basket_part_pairs,
    "division_full_coverage": division_full_coverage,
    "rfm_segmentation": rfm_segmentation,
    "fuzzy_name_match": fuzzy_name_match,
    "gini_balance_by_segment": gini_balance_by_segment,
    "revenue_growth_mom": revenue_growth_mom,
    "stats_corr": stats_corr,
    "window_distribution": window_distribution,
    "merge_upsert_orders": merge_upsert_orders,
    "percentile_stats": percentile_stats,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_revenue": q5_region_revenue,
    "agg_distinct": agg_distinct,
    "having_filter": having_filter,
    "rollup_agg": rollup_agg,
    "cube_agg": cube_agg,
    "grouping_sets": grouping_sets,
    "pivot_status_by_segment": pivot_status_by_segment,
    "unpivot_part_attrs": unpivot_part_attrs,
    "join_left_outer": join_left_outer,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_full_outer": join_full_outer,
    "cross_join_scalar": cross_join_scalar,
    "correlated_scalar_subquery": correlated_scalar_subquery,
    "filter_in_list": filter_in_list,
    "set_union_all": set_union_all,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "dedup_distinct": dedup_distinct,
    "topk_orders": topk_orders,
    "window_topk_per_group": window_topk_per_group,
    "window_running_sum": window_running_sum,
    "window_lag_lead": window_lag_lead,
    "window_rank_dense": window_rank_dense,
    "string_funcs": string_funcs,
    "date_funcs": date_funcs,
    "math_funcs": math_funcs,
    "case_when_null": case_when_null,
}

ORACLES = {
    "array_hof_funcs": ARRAY_HOF_SQL,
    "basket_part_pairs": BASKET_SQL,
    "division_full_coverage": DIVISION_SQL,
    "rfm_segmentation": RFM_SQL,
    "fuzzy_name_match": FUZZY_NAME_SQL,
    "gini_balance_by_segment": GINI_SQL,
    "revenue_growth_mom": REVENUE_GROWTH_SQL,
    "stats_corr": STATS_CORR_SQL,
    "window_distribution": WINDOW_DISTRIBUTION_SQL,
    "merge_upsert_orders": MERGE_UPSERT_SQL,
    "percentile_stats": PERCENTILE_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_region_revenue": Q5_SQL,
    "agg_distinct": AGG_DISTINCT_SQL,
    "having_filter": HAVING_SQL,
    "rollup_agg": ROLLUP_SQL,
    "cube_agg": CUBE_SQL,
    "grouping_sets": GROUPING_SETS_SQL,
    "pivot_status_by_segment": PIVOT_SQL,
    "unpivot_part_attrs": UNPIVOT_SQL,
    "join_left_outer": JOIN_LEFT_SQL,
    "join_semi": JOIN_SEMI_SQL,
    "join_anti": JOIN_ANTI_SQL,
    "join_full_outer": JOIN_FULL_SQL,
    "cross_join_scalar": CROSS_SCALAR_SQL,
    "correlated_scalar_subquery": CORRELATED_SQL,
    "filter_in_list": FILTER_IN_SQL,
    "set_union_all": SET_UNION_SQL,
    "set_intersect": SET_INTERSECT_SQL,
    "set_except": SET_EXCEPT_SQL,
    "dedup_distinct": DEDUP_DISTINCT_SQL,
    "topk_orders": TOPK_SQL,
    "window_topk_per_group": WINDOW_TOPK_SQL,
    "window_running_sum": WINDOW_RUNNING_SQL,
    "window_lag_lead": WINDOW_LAG_SQL,
    "window_rank_dense": WINDOW_RANK_SQL,
    "string_funcs": STRING_SQL,
    "date_funcs": DATE_SQL,
    "math_funcs": MATH_SQL,
    "case_when_null": CASE_SQL,
}

"""Second tranche of TPC-H-shaped relational queries (round 2): the join /
subquery physical shapes round 1 did not yet exercise — EXISTS semi-join with
a non-equi residual, top-k over a 4-way star, left-outer count distribution,
conditional-aggregate ratios, HAVING-subquery IN-joins, disjunctive predicate
pushdown, scalar-subquery filters against an aggregate view, and a correlated
per-group average filter.

Shapes follow TPC-H Q4/Q10/Q12/Q13/Q14/Q15/Q17/Q18/Q19/Q22 (adapted to the
synthetic star schema's columns — reference parity target is the *operator
shape*, cf. reference app/query.py's join/agg pipeline, not the benchmark
text). Float determinism follows the contract in plans/relational.py:
decimal-exact money sums, integer-exact thresholds, full tie-break keys
before every LIMIT, and CAST(... AS BIGINT) on every DuckDB integer SUM
(HUGEINT otherwise reaches the driver as float).

Scale notes (100 TB): every query here keeps the big fact tables
(lineitem/orders) on the shuffle side and broadcasts only provably-small
inputs — dimension tables (part/customer at TPC-H proportions are ~1/30 and
~1/4 of lineitem; at true warehouse scale part/customer would exceed the
broadcast threshold and AQE falls back to shuffle joins, which these plans
tolerate because the join keys are the tables' natural keys) and
single-row aggregate scalars (always broadcast-safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table


def _dec(col, p=12, s=2):
    return F.col(col).cast(f"decimal({p},{s})")


def _revenue():
    """Exact decimal disc-price sum: SUM(extendedprice * (1 - discount))."""
    return F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4, 2))
    )


_REV_SQL = """SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))"""


# ---------------------------------------------------------------------------
# Q4 shape: EXISTS semi-join with a non-equi residual condition
# ---------------------------------------------------------------------------

def q4_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders (one quarter) having ANY line shipped >120 days after the order
    date, counted by priority. EXISTS compiles to a LeftSemi hash join on
    l_orderkey with the date comparison as a residual — one pass over each
    table, no fact-fact shuffle duplication."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 120 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-01-01'
  AND o_orderdate <  TIMESTAMP '1998-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 120 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q10 shape: returned-revenue customer ranking over a 4-way star
# ---------------------------------------------------------------------------

def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue on returned lineitems ('R' flag) in one
    year: lineitem⋈orders shuffle join, customer/nation broadcast, decimal
    revenue, TakeOrderedAndProject for the limit."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_revenue().cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, n_name, CAST({_REV_SQL} AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1998-01-01'
  AND o_orderdate <  TIMESTAMP '1999-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q12 shape: conditional 0/1 aggregate split by a dimension of the other table
# ---------------------------------------------------------------------------

def q12_priority_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per linestatus, counts of lines on high- vs low-priority orders in a
    shipdate year — the classic CASE-WHEN-inside-SUM map-side-combinable
    split (TPC-H Q12 with linestatus standing in for shipmode)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate <  TIMESTAMP '1999-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# ---------------------------------------------------------------------------
# Q13 shape: left-outer join + two-level aggregation (count distribution)
# ---------------------------------------------------------------------------

def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of orders-per-customer including zero-order customers:
    LEFT OUTER customer→orders, COUNT(o_orderkey) per customer (NULL-aware:
    unmatched rows count 0), then a second aggregation over the counts."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q14 shape: conditional-aggregate ratio (promo revenue share)
# ---------------------------------------------------------------------------

def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of one month's revenue coming from PROMO-type parts — the
    numerator is a CASE-gated copy of the denominator sum, so ONE aggregate
    pass computes both. part is broadcast into the lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-07-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    disc = _dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4, 2))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast("decimal(14,4)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(disc).cast("double"),
                6,
            ).alias("promo_share_pct")
        )
    )


Q14_SQL = f"""
SELECT round(100.0
             * CAST(SUM(CASE WHEN p_type = 'PROMO'
                             THEN CAST(l_extendedprice AS DECIMAL(12,2))
                                  * (CAST(1 AS DECIMAL(4,2))
                                     - CAST(l_discount AS DECIMAL(4,2)))
                             ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
             / CAST({_REV_SQL} AS DOUBLE),
             6) AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1998-06-01'
  AND l_shipdate <  TIMESTAMP '1998-07-01'
"""


# ---------------------------------------------------------------------------
# Q15 shape: scalar-subquery filter against an aggregate view (top supplier)
# ---------------------------------------------------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) whose one-year revenue equals the global maximum. Revenue
    is kept as an exact integer (decimal sum x 10^4) so the max-equality
    filter is deterministic on both engines. The per-supplier aggregate is computed ONCE and reused for both
    the max scalar (broadcast) and the final join — at 100 TB the revenue
    view is the expensive part; the max+filter adds no extra fact scan."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    # the decimal revenue sum has scale 4, so *10^4 is exactly integral —
    # *100 would leave 2 fractional digits and Spark's cast-to-long TRUNCATES
    # where DuckDB's CAST rounds (a real 1-unit mismatch, caught by the gate)
    rev = li.groupBy("l_suppkey").agg(
        (_revenue() * 10000).cast("long").alias("total_rev_e4")
    )
    max_rev = rev.agg(F.max("total_rev_e4").alias("max_cents"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(max_rev), rev.total_rev_e4 == max_rev.max_cents)
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev_e4")
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, CAST({_REV_SQL} * 10000 AS BIGINT) AS total_rev_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    AND l_shipdate <  TIMESTAMP '1999-01-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_rev_e4
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_rev_e4 = (SELECT MAX(total_rev_e4) FROM rev)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q17 shape: correlated per-group average filter (small-quantity orders)
# ---------------------------------------------------------------------------

def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue lost if small-quantity lines (< 50% of the
    part's mean quantity) of one brand were not filled. The correlated
    scalar subquery decorrelates to a per-part aggregate joined back to
    lineitem — quantities are integral doubles, so AVG is sum/count exact
    and the comparison is deterministic cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    per_part = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part.withColumnRenamed("l_partkey", "pp_key"),
              F.col("l_partkey") == F.col("pp_key"))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 6).alias(
                "avg_yearly"
            )
        )
    )


Q17_SQL = """
SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0,
             6) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (SELECT 0.5 * AVG(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


# ---------------------------------------------------------------------------
# Q18 shape: HAVING-subquery IN-join (large-volume orders)
# ---------------------------------------------------------------------------

def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds 250, with customer context. The
    IN (GROUP BY ... HAVING) subquery becomes an aggregate → inner-join
    back to orders; sum_qty is an exact integral double."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders
JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q19 shape: disjunctive multi-attribute predicate (OR-of-ANDs pushdown)
# ---------------------------------------------------------------------------

def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue over an OR of three (brand, size-range, quantity-range)
    clauses — Catalyst extracts the common l_partkey=p_partkey conjunct as
    the join key and keeps the disjunction as a residual filter, instead of
    a cross product."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.where(clause).agg(_revenue().cast("double").alias("revenue"))


Q19_SQL = f"""
SELECT CAST({_REV_SQL} AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q22 shape: scalar-subquery threshold + anti-join (idle rich customers)
# ---------------------------------------------------------------------------

def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average balance and no recent order, by segment.
    The global average is computed in exact integer cents (sum/count — no
    float accumulation-order dependence), broadcast as a scalar; the NOT
    EXISTS is a left-anti join against recent orders."""
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "bal_cents", F.round(F.col("c_acctbal") * 100).cast("long")
    )
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0)
        .agg(
            (F.sum("bal_cents").cast("double") / F.count("*")).alias("avg_cents")
        )
    )
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).where(
        F.col("bal_cents") > F.col("avg_cents")
    )
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return (
        idle.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.sum("bal_cents").alias("total_bal_cents"),
        )
        .orderBy("c_mktsegment")
    )


Q22_SQL = """
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS total_bal_cents
FROM customer
WHERE CAST(round(c_acctbal * 100) AS BIGINT) >
      (SELECT CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
              / COUNT(*)
       FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


QUERIES = {
    "q4_late_order_priority": q4_late_order_priority,
    "q10_returned_revenue": q10_returned_revenue,
    "q12_priority_linestatus": q12_priority_linestatus,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q14_promo_revenue_share": q14_promo_revenue_share,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q18_large_volume_orders": q18_large_volume_orders,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q22_idle_rich_customers": q22_idle_rich_customers,
}

ORACLES = {
    "q4_late_order_priority": Q4_SQL,
    "q10_returned_revenue": Q10_SQL,
    "q12_priority_linestatus": Q12_SQL,
    "q13_order_count_distribution": Q13_SQL,
    "q14_promo_revenue_share": Q14_SQL,
    "q15_top_supplier": Q15_SQL,
    "q17_small_qty_revenue": Q17_SQL,
    "q18_large_volume_orders": Q18_SQL,
    "q19_disjunctive_revenue": Q19_SQL,
    "q22_idle_rich_customers": Q22_SQL,
}

"""Third tranche of TPC-H-shaped relational queries (round 2): the nine
benchmark shapes tranches 1-2 left out — Q2/Q6/Q7/Q8/Q9/Q11/Q16/Q20/Q21.

The synthetic star schema has no ``partsupp`` table, so the four
partsupp-based queries (Q2/Q11/Q16/Q20) are adapted to use the distinct
``(l_partkey, l_suppkey)`` pairs of ``lineitem`` as the supply relation —
the *physical shapes* (min-per-group join-back, global-fraction HAVING,
distinct-count with supplier exclusion, correlated-threshold semi-join) are
preserved exactly. Reference parity target is the operator surface of
app/query.py's scan→filter→join→agg→top-k pipeline (reference has no TPC-H
of its own); these tranches prove the same engine covers the full benchmark
shape space.

Float determinism follows the contract in plans/relational.py: money in
exact integer cents or DECIMAL sums, integer-exact thresholds, full
tie-break keys before every LIMIT, CAST(... AS BIGINT) on every DuckDB
integer SUM (HUGEINT reaches the driver as float otherwise).

Scale notes (100 TB): lineitem is always the probe side; part / supplier /
nation / region and single-row scalars are broadcast. The derived supply
relation (distinct part-supp pairs) is itself a fact-scale aggregate — it
shuffles once on its natural key and every later use joins on that same key,
so no second fact shuffle is introduced. Q21's two self-joins run on the
(orderkey)-grouped residual of a filtered fact scan: at 1000 executors both
sides hash-partition on l_orderkey and co-locate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table


def _dec(col, p=12, s=2):
    return F.col(col).cast(f"decimal({p},{s})")


def _revenue():
    return F.sum(
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4, 2))
    )


_REV_SQL = """SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))"""


# ---------------------------------------------------------------------------
# Q6 shape: single-table conjunctive range filter + scalar aggregate
# ---------------------------------------------------------------------------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue increase if discounts in [0.05, 0.07] on small quantities had
    been eliminated: the canonical pushdown probe — every predicate reaches
    the parquet scan (shipdate min/max row-group skipping, discount and
    quantity range filters), then ONE partial+final agg with no shuffle of
    raw rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
            & (_dec("l_discount", 4, 2) >= F.lit(0.05).cast("decimal(4,2)"))
            & (_dec("l_discount", 4, 2) <= F.lit(0.07).cast("decimal(4,2)"))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount", 4, 2))
            .cast("double")
            .alias("revenue")
        )
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate <  TIMESTAMP '1999-01-01'
  AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN CAST(0.05 AS DECIMAL(4,2))
                                           AND CAST(0.07 AS DECIMAL(4,2))
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q2 shape: min-per-group join-back (min-cost supplier per part in a region)
# ---------------------------------------------------------------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each STANDARD small part, the EUROPE supplier(s) offering the
    lowest observed price. The supply relation is derived from lineitem
    (min extendedprice in exact cents per part-supplier pair); the
    correlated MIN subquery decorrelates to a per-part aggregate joined back
    to the offers — the offers view is computed once and feeds both sides.
    Supplier/nation/region are broadcast; the only fact-scale shuffle is the
    offers groupBy on (partkey, suppkey)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )

    eur_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("s_acctbal") * 100).cast("long").alias("bal_cents"),
            "n_name",
        )
    )
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "offer_cents"
        )
    )
    eur_offers = offers.join(
        F.broadcast(eur_supp), offers.l_suppkey == eur_supp.s_suppkey
    )
    min_per_part = eur_offers.groupBy("l_partkey").agg(
        F.min("offer_cents").alias("min_cents")
    )
    return (
        eur_offers.join(
            min_per_part.withColumnRenamed("l_partkey", "mp_key"),
            (F.col("l_partkey") == F.col("mp_key"))
            & (F.col("offer_cents") == F.col("min_cents")),
        )
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select(
            "bal_cents",
            "s_name",
            "n_name",
            "p_partkey",
            F.col("offer_cents").alias("min_offer_cents"),
        )
        .orderBy(F.desc("bal_cents"), "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = """
WITH offers AS (
  SELECT l_partkey AS p_key, l_suppkey AS s_key,
         CAST(MIN(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS offer_cents
  FROM lineitem GROUP BY 1, 2),
eur AS (
  SELECT o.p_key, o.offer_cents, s_name,
         CAST(round(s_acctbal * 100) AS BIGINT) AS bal_cents, n_name
  FROM offers o
  JOIN supplier ON s_suppkey = o.s_key
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE')
SELECT bal_cents, s_name, n_name, p_partkey, offer_cents AS min_offer_cents
FROM eur JOIN part ON p_partkey = eur.p_key
WHERE p_type = 'STANDARD' AND p_size <= 10
  AND offer_cents = (SELECT MIN(e2.offer_cents) FROM eur e2
                     WHERE e2.p_key = eur.p_key)
ORDER BY bal_cents DESC, s_name, p_partkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q7 shape: bidirectional nation-pair volume (two aliased nation joins)
# ---------------------------------------------------------------------------

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping volume between NATION_1 and NATION_2 (both directions) per
    shipdate year. The nation dimension joins twice under different aliases
    (supplier side, customer side); the disjunctive pair filter is applied
    after both joins. lineitem⋈orders is the only fact-fact shuffle;
    customer joins shuffle-side at warehouse scale while supplier/nation
    broadcast."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_revenue().cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year, CAST(SUM(vol) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS vol
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1999-01-01'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))) t
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Q8 shape: market-share ratio (conditional sum over a 6-way star)
# ---------------------------------------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_5's share of ECONOMY-part revenue sold to ASIA customers, per
    order year: numerator is a CASE-gated copy of the denominator inside ONE
    aggregate pass over the joined star. All dimensions broadcast; the
    lineitem⋈orders equi-join carries the fact rows exactly once."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_rkey")
    )
    vol = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4, 2)
    )
    gated = F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(
        F.lit(0).cast("decimal(16,4)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_rkey") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(gated).cast("double") / F.sum(vol).cast("double"), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT year(o_orderdate) AS o_year,
       round(CAST(SUM(CASE WHEN n1.n_name = 'NATION_5'
                           THEN CAST(l_extendedprice AS DECIMAL(12,2))
                                * (CAST(1 AS DECIMAL(4,2))
                                   - CAST(l_discount AS DECIMAL(4,2)))
                           ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(4,2))
                           - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE),
             6) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '2000-01-01'
GROUP BY o_year
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Q9 shape: product-line profit by supplier nation and year
# ---------------------------------------------------------------------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on LARGE parts per supplier nation per order year, where cost
    is modeled as half the part's retail price per unit (the schema has no
    ps_supplycost). All arithmetic stays in DECIMAL until the final cast so
    both engines sum identical exact values."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "LARGE")
    amount = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4, 2)
    ) - F.lit(0.5).cast("decimal(2,1)") * _dec("p_retailprice") * _dec("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("profit"))
        .orderBy("n_name", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name, year(o_orderdate) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                - CAST(0.5 AS DECIMAL(2,1))
                  * CAST(p_retailprice AS DECIMAL(12,2))
                  * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type = 'LARGE'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""


# ---------------------------------------------------------------------------
# Q11 shape: global-fraction HAVING (important supply values)
# ---------------------------------------------------------------------------

def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose supply value from NATION_3/NATION_4 suppliers exceeds
    0.1% of the total such value. The per-part aggregate is computed once;
    the global total is a second aggregate OVER THE PER-PART RESULT (tiny),
    broadcast back as a scalar — the fact table is scanned exactly once."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_4")
    )
    nat_supp = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    vals = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "value_cents"
            )
        )
    )
    total = vals.agg(F.sum("value_cents").alias("total_cents"))
    return (
        vals.crossJoin(F.broadcast(total))
        .where(F.col("value_cents") > F.lit(0.001) * F.col("total_cents"))
        .select(F.col("l_partkey").alias("p_partkey"), "value_cents")
        .orderBy(F.desc("value_cents"), "p_partkey")
    )


Q11_SQL = """
WITH vals AS (
  SELECT l_partkey,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_3', 'NATION_4')
  GROUP BY l_partkey)
SELECT l_partkey AS p_partkey, value_cents
FROM vals
WHERE value_cents > 0.001 * (SELECT CAST(SUM(value_cents) AS BIGINT) FROM vals)
ORDER BY value_cents DESC, p_partkey
"""


# ---------------------------------------------------------------------------
# Q16 shape: distinct supplier count per part attrs, with supplier exclusion
# ---------------------------------------------------------------------------

def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many distinct suppliers serve each (brand, type, size) bucket,
    excluding one brand, PROMO parts, and suppliers in arrears (negative
    balance — the schema's stand-in for TPC-H's complaint comment match).
    The supply relation is the distinct part-supp pairs of lineitem; the
    exclusion is a broadcast anti-join BEFORE the expensive distinct-count
    shuffle so excluded rows never enter it."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#21")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size") <= 25)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(F.broadcast(bad_supp), pairs.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#21' AND p_type <> 'PROMO' AND p_size <= 25
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q20 shape: correlated-threshold semi-join (suppliers with excess stock)
# ---------------------------------------------------------------------------

def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers holding 'excess' supply of SMALL parts: for some part they
    supply, their all-time shipped quantity exceeds 4x their 1998 shipped
    quantity (and they did ship in 1998) — TPC-H Q20's availqty > 1/2
    year-qty threshold re-expressed on the derived supply relation. Both
    the total and the year-gated sum come out of ONE aggregate pass
    (CASE-gated column), then a semi-join selects the suppliers."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "SMALL")
    supp = load_table(spark, sf_dir, "supplier")
    qty98 = F.when(
        F.year("l_shipdate") == 1998, F.col("l_quantity")
    ).otherwise(F.lit(0.0))
    per_pair = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum("l_quantity").cast("long").alias("qty_total"),
            F.sum(qty98).cast("long").alias("qty_1998"),
        )
        .where((F.col("qty_1998") > 0) & (F.col("qty_total") > 4 * F.col("qty_1998")))
    )
    return (
        supp.join(
            per_pair, supp.s_suppkey == per_pair.l_suppkey, "left_semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'SMALL'
  GROUP BY l_partkey, l_suppkey
  HAVING CAST(SUM(CASE WHEN year(l_shipdate) = 1998
                       THEN l_quantity ELSE 0 END) AS BIGINT) > 0
     AND CAST(SUM(l_quantity) AS BIGINT) >
         4 * CAST(SUM(CASE WHEN year(l_shipdate) = 1998
                           THEN l_quantity ELSE 0 END) AS BIGINT))
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q21 shape: EXISTS + NOT EXISTS double self-join (sole late supplier)
# ---------------------------------------------------------------------------

def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the SOLE late shipper (>60 days after order date)
    on finished multi-supplier orders. The EXISTS (another supplier on the
    order) becomes a left-semi self-join and the NOT EXISTS (another LATE
    supplier) a left-anti self-join against the same late-lines view — both
    hash-partition on l_orderkey, so the two self-joins co-locate with no
    extra fact shuffle beyond the first."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key")
    ).distinct()
    late_others = late.select(
        F.col("l_orderkey").alias("o3_key"), F.col("l_suppkey").alias("s3_key")
    ).distinct()
    sole_late = (
        late.join(
            others,
            (F.col("o2_key") == F.col("l_orderkey"))
            & (F.col("s2_key") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("o3_key") == F.col("l_orderkey"))
            & (F.col("s3_key") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    return (
        sole_late.join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders   ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q16_supplier_count": q16_supplier_count,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
}

ORACLES = {
    "q2_min_cost_supplier": Q2_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_profit": Q9_SQL,
    "q11_important_parts": Q11_SQL,
    "q16_supplier_count": Q16_SQL,
    "q20_excess_suppliers": Q20_SQL,
    "q21_waiting_suppliers": Q21_SQL,
}

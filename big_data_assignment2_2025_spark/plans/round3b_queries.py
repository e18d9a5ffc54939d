"""Round-3 second batch: time-hierarchy rollup, per-language top terms, and
user-LTV decile segmentation — three shapes that combine existing operator
families (rollup × date functions, text × windows, window distribution ×
monetary aggregation) into the composite queries an analytics team actually
ships. Determinism: integer cents/counts everywhere; ntile and rank windows
are fully tie-broken."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.text import tokenize
from ..sources.readers import load_table


def orders_quarter_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue ROLLUP over the (year, quarter) time hierarchy — subtotal
    rows per year and a grand total in one aggregation pass (no re-scan per
    level; Spark expands grouping sets map-side). Cents-exact."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return (
        base.rollup("yr", "qtr")
        .agg(
            # grouping() must be computed inside the rollup aggregate
            F.grouping("yr").cast("int").alias("g_yr"),
            F.grouping("qtr").cast("int").alias("g_qtr"),
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("rev_cents"),
        )
        .select("yr", "qtr", "g_yr", "g_qtr", "n_orders", "rev_cents")
    )


QUARTER_ROLLUP_SQL = """
SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
       CAST(GROUPING(year(o_orderdate)) AS INTEGER) AS g_yr,
       CAST(GROUPING(quarter(o_orderdate)) AS INTEGER) AS g_qtr,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS rev_cents
FROM orders
GROUP BY ROLLUP (year(o_orderdate), quarter(o_orderdate))
"""


def top_terms_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms by document frequency per language (ties broken
    alphabetically) — the vocabulary census a corpus pipeline runs per
    stratum. Tokenize → per-(lang, term) distinct-doc counts → rank window
    over the aggregated (small) relation. The window rides the aggregate,
    never the token stream."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", "doc_id", F.explode(tokenize("text")).alias("term")
    ).distinct()
    df_by_lang = toks.groupBy("lang", "term").agg(
        F.count("*").alias("n_docs")
    )
    w = W.partitionBy("lang").orderBy(F.desc("n_docs"), "term")
    return (
        df_by_lang.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("lang", "rnk", "term", "n_docs")
    )


TOP_TERMS_SQL = """
WITH toks AS (
  SELECT DISTINCT lang, doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_'']+')) AS term
  FROM documents),
df AS (
  SELECT lang, term, COUNT(*) AS n_docs FROM toks GROUP BY lang, term),
ranked AS (
  SELECT lang, term, n_docs,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_docs DESC, term) AS rnk
  FROM df)
SELECT lang, CAST(rnk AS BIGINT) AS rnk, term, CAST(n_docs AS BIGINT) AS n_docs
FROM ranked WHERE rnk <= 5
"""


def user_ltv_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifetime-value decile segmentation: users bucketed into 10 spend
    deciles (purchase cents, positional deciles over a fully tie-broken
    order), then per-decile totals — the monetization report shape. The
    decile is deterministic because the ORDER BY is a total order (cents
    desc, user_id) over the per-user aggregate.

    Scale shape: NTILE-exact deciles WITHOUT the global single-partition
    sort, via ``operators.ranking.with_global_ntiles`` (literal range-bucket
    boundaries -> partitioned row_number + literal offsets -> positional
    tile formula). The oracle keeps plain NTILE; results are bit-identical."""
    from ..operators.ranking import NtileSpec, with_global_ntiles

    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
        )
    )
    deciled = with_global_ntiles(
        per_user,
        [
            NtileSpec(
                "decile",
                -F.col("cents"),
                [F.desc("cents"), F.col("user_id").asc()],
            )
        ],
        n_tiles=10,
    )
    return (
        deciled.groupBy("decile")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("cents").alias("decile_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .orderBy("decile")
    )


LTV_DECILES_SQL = """
WITH per_user AS (
  SELECT user_id,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
deciled AS (
  SELECT user_id, cents,
         ntile(10) OVER (ORDER BY cents DESC, user_id) AS decile
  FROM per_user)
SELECT CAST(decile AS INTEGER) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(cents) AS BIGINT) AS decile_cents,
       CAST(MIN(cents) AS BIGINT) AS min_cents,
       CAST(MAX(cents) AS BIGINT) AS max_cents
FROM deciled GROUP BY decile ORDER BY decile
"""


def orders_page_two(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless pagination: page 2 of the order book (rows 11-20 by price
    desc) via ORDER BY + OFFSET + LIMIT — deterministic because the sort is
    a total order (price cents desc, key). Spark plans offset+limit as a
    single TakeOrdered of offset+limit rows, so the cost is the page
    horizon, not the table. (Real pagination at depth uses keyset
    predicates — `WHERE (cents, key) < last_seen` — which this total order
    makes possible; OFFSET is the operator-parity shape.)"""
    orders = load_table(spark, sf_dir, "orders")
    ranked = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).orderBy(F.desc("cents"), "o_orderkey")
    return ranked.offset(10).limit(10)


PAGE_TWO_SQL = """
SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
FROM orders
ORDER BY cents DESC, o_orderkey
LIMIT 10 OFFSET 10
"""


QUERIES = {
    "orders_page_two": orders_page_two,
    "orders_quarter_rollup": orders_quarter_rollup,
    "top_terms_per_lang": top_terms_per_lang,
    "user_ltv_deciles": user_ltv_deciles,
}

ORACLES = {
    "orders_page_two": PAGE_TWO_SQL,
    "orders_quarter_rollup": QUARTER_ROLLUP_SQL,
    "top_terms_per_lang": TOP_TERMS_SQL,
    "user_ltv_deciles": LTV_DECILES_SQL,
}

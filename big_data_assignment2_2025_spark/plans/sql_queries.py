"""The spark.sql surface: register the star schema as temp views and run
plain ANSI SQL against them — how a SQL-first user consumes this engine.

The flagship property here: the query string handed to ``spark.sql`` IS the
oracle string (one dialect-neutral text, two engines). Any aggregate that
would be float-order-sensitive is expressed in exact integer cents so the
shared text is also hash-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (idempotent) so
    ``spark.sql(...)`` works against the same names the DuckDB oracle sees."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


# One text, two engines: runs verbatim under Spark SQL AND DuckDB.
SQL_REGION_ROLLUP = """
SELECT r_name, n_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def sql_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_REGION_ROLLUP)


QUERIES = {
    "sql_region_rollup": sql_region_rollup,
}

ORACLES = {
    "sql_region_rollup": SQL_REGION_ROLLUP,
}

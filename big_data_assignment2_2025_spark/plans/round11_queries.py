"""Round-11 queries: deletion vectors / merge-on-read gates from the
r10 verdict.

The snapshot store (``sources/snapshots.py``) gained the last
Delta/Iceberg verb it was missing: row-level DELETE and MERGE that mask
rows with POSITION-DELETE files (``_metadata.file_path`` +
``_metadata.row_index`` addresses) instead of rewriting members. These
gates pin the full narrative cross-engine over one staged store:

- ``storage_delete_vectors``: v3 = ``delete_where(priority = '5-LOW')``
  — the member list is UNCHANGED and zero data directories are added
  (both pinned as columns), yet reads mask exactly the predicate's
  rows; v2 time-travels to the pre-delete row set.
- ``storage_merge_on_read``: v4 = ``merge_on_read`` (upserts re-pricing
  ``k % 5 = 0`` keys, deletes for ``k % 7 = 0`` others) over the
  DV-bearing store — matched rows masked, post-images appended, a key
  deleted at v3 and upserted at v4 re-inserts with non-key columns
  NULL (the partial-update contract with no target row). v5 =
  ``compact`` — the aggregate must be IDENTICAL at v4 (DV-masked read)
  and v5 (DVs physically materialized away), pinning both read paths
  to one oracle.

No reference counterpart; lakehouse extensions per SURVEY.md §7.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import (
    derived_cache_ok,
    fixture_fingerprint,
    load_table,
    mark_derived_cache,
)
from ..sources.snapshots import SnapshotStore

#: the staged-store splits (shared by the Spark and SQL sides)
_DV_MOD = 3        # v1 = k % 3 != 0, v2 appends k % 3 == 0
_DV_PRIO = "5-LOW"  # v3 deletes this priority
_UPS_MOD = 5       # v4 upserts k % 5 == 0 (price -> 1.0)
_DEL_MOD = 7       # v4 deletes k % 7 == 0 (minus the upsert keys)
#: sentinel for the NULL priority of re-inserted rows (group-by key on
#: both engines without NULL-ordering divergence)
_REINS = "REINSERTED"
#: v6 update: double the price of this priority (exact in binary floats)
_UPD_PRIO = "3-MEDIUM"


def _staged_dv_store(spark: SparkSession, sf_dir: str) -> SnapshotStore:
    """Per-fixture snapshot store exercising the row-level verbs:
    v1 overwrite + v2 append (orders split by key mod), v3
    ``delete_where`` (deletion vector, no rewrite), v4
    ``merge_on_read`` (mask + append, no rewrite), v5 ``compact``
    (materializes every DV away), v6 ``update_where`` (mask + post-image
    append over the compacted member), v7 ``compact_masked`` (targeted
    materialization: only the heavily-masked member rewrites).
    Fingerprint-gated like every staged store; the dir name carries a
    recipe version because the fixture fingerprint can't see
    builder-code changes."""
    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    base = os.path.join(tempfile.gettempdir(), f"snapdv3_{tag}")
    fprint = fixture_fingerprint(sf_dir)
    if not derived_cache_ok(base, fprint):
        if os.path.exists(base):
            shutil.rmtree(base)
        store = SnapshotStore(base)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        )
        store.commit(
            orders.where(F.col("o_orderkey") % _DV_MOD != 0),
            mode="overwrite",
            stats_cols=["o_orderkey"],
        )
        store.commit(
            orders.where(F.col("o_orderkey") % _DV_MOD == 0),
            mode="append",
            stats_cols=["o_orderkey"],
        )
        store.delete_where(
            spark, F.col("o_orderpriority") == _DV_PRIO
        )
        ups = orders.where(F.col("o_orderkey") % _UPS_MOD == 0).select(
            "o_orderkey",
            F.lit(1.0).alias("o_totalprice"),
            F.lit("upsert").alias("_op"),
        )
        dels = orders.where(
            (F.col("o_orderkey") % _DEL_MOD == 0)
            & (F.col("o_orderkey") % _UPS_MOD != 0)
        ).select(
            "o_orderkey",
            F.lit(0.0).alias("o_totalprice"),
            F.lit("delete").alias("_op"),
        )
        store.merge_on_read(
            spark, ups.unionAll(dels), keys=["o_orderkey"]
        )
        store.compact(spark)
        store.update_where(
            spark,
            F.col("o_orderpriority") == _UPD_PRIO,
            {"o_totalprice": F.col("o_totalprice") * 2},
        )
        store.compact_masked(spark, max_masked_fraction=0.15)
        with open(os.path.join(base, "_SUCCESS"), "w"):
            pass
        mark_derived_cache(base, fprint)
    return SnapshotStore(base)


def storage_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE via a deletion vector: v3 masks every
    ``5-LOW`` row while ADDING ZERO data directories and keeping the
    member list bit-identical to v2 — ``n_members``/``n_added`` pin the
    zero-rewrite claim, the per-version row count + price sum pin the
    masking, and v2 pins time travel to the pre-delete rows. Scale: the
    delete wrote O(matched rows); reads pay one (file, pos) anti-join
    on the two dirty members and nothing on clean ones."""
    store = _staged_dv_store(spark, sf_dir)
    m2, m3 = store.manifest(2), store.manifest(3)
    out = None
    for v, doc in ((2, m2), (3, m3)):
        agg = store.read(spark, v).agg(
            F.count("*").alias("n_rows"),
            (
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                )
                / 100.0
            ).alias("sum_price"),
        )
        part = agg.select(
            F.lit(v).alias("version"),
            F.lit(doc["mode"]).alias("mode"),
            F.lit(len(doc["members"])).alias("n_members"),
            F.lit(len(doc["added"])).alias("n_added"),
            F.lit(int(doc["members"] == m2["members"])).alias(
                "same_members_as_v2"
            ),
            "n_rows",
            "sum_price",
        )
        out = part if out is None else out.unionAll(part)
    return out.orderBy("version")


DELETE_VECTORS_SQL = f"""
SELECT CAST(2 AS INTEGER) AS version, 'append' AS mode,
       CAST(2 AS INTEGER) AS n_members, CAST(1 AS INTEGER) AS n_added,
       CAST(1 AS INTEGER) AS same_members_as_v2,
       COUNT(*) AS n_rows, CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         / 100.0 AS sum_price
FROM orders
UNION ALL
SELECT 3, 'delete', 2, 0, 1, COUNT(*),
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
FROM orders WHERE o_orderpriority <> '{_DV_PRIO}'
ORDER BY version
"""


def storage_merge_on_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read over a DV-bearing table, then compaction: the
    per-priority aggregate at v4 (DV-masked read: matched rows masked
    by position deletes, post-images appended, prior 5-LOW deletions
    still in force, keys deleted-then-upserted re-inserted with NULL
    priority) must be IDENTICAL at v5 (compact physically materialized
    every DV away) — one oracle gates both the logical read path and
    the materialization. v4's manifest pins the MoR shape: no member
    rewritten, exactly the upsert member added."""
    store = _staged_dv_store(spark, sf_dir)
    doc4 = store.manifest(4)
    out = None
    for v in (4, 5):
        part = (
            store.read(spark, v)
            .groupBy(
                F.coalesce(
                    F.col("o_orderpriority"), F.lit(_REINS)
                ).alias("prio")
            )
            .agg(
                F.count("*").alias("n_rows"),
                (
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                )
                / 100.0
            ).alias("sum_price"),
            )
            .select(
                F.lit(v).alias("version"),
                F.lit(int(bool(doc4.get("merge_on_read")))).alias("mor"),
                F.lit(int("rewrote" not in doc4)).alias("zero_rewrites"),
                F.lit(len(doc4["added"])).alias("n_added_v4"),
                "prio",
                "n_rows",
                "sum_price",
            )
        )
        out = part if out is None else out.unionAll(part)
    return out.orderBy("version", "prio")


MERGE_ON_READ_SQL = f"""
WITH base AS (
  SELECT o_orderkey AS k, o_orderpriority AS pr, o_totalprice AS p
  FROM orders),
v3 AS (SELECT * FROM base WHERE pr <> '{_DV_PRIO}'),
final AS (
  -- surviving v3 rows: v4 deletes drop them, upserts re-price them
  SELECT k, pr, CASE WHEN k % {_UPS_MOD} = 0 THEN 1.0 ELSE p END AS p
  FROM v3 WHERE NOT (k % {_DEL_MOD} = 0 AND k % {_UPS_MOD} <> 0)
  UNION ALL
  -- keys deleted at v3 and upserted at v4: re-insert, priority NULL
  SELECT k, NULL, 1.0 FROM base
  WHERE k % {_UPS_MOD} = 0 AND pr = '{_DV_PRIO}'),
agg AS (
  SELECT COALESCE(pr, '{_REINS}') AS prio, COUNT(*) AS n_rows,
         CAST(SUM(CAST(round(p * 100) AS BIGINT)) AS BIGINT) / 100.0
           AS sum_price
  FROM final GROUP BY COALESCE(pr, '{_REINS}'))
SELECT CAST(v.version AS INTEGER) AS version, CAST(1 AS INTEGER) AS mor,
       CAST(1 AS INTEGER) AS zero_rewrites,
       CAST(1 AS INTEGER) AS n_added_v4,
       agg.prio, agg.n_rows, agg.sum_price
FROM agg CROSS JOIN (SELECT 4 AS version UNION ALL SELECT 5) v
ORDER BY version, prio
"""


#: the v4/v5 final state as a SQL CTE body (shared by the MoR and
#: UPDATE oracles — v6 applies the price-doubling on top of it)
_FINAL_CTE = f"""
base AS (
  SELECT o_orderkey AS k, o_orderpriority AS pr, o_totalprice AS p
  FROM orders),
v3 AS (SELECT * FROM base WHERE pr <> '{_DV_PRIO}'),
final AS (
  SELECT k, pr, CASE WHEN k % {_UPS_MOD} = 0 THEN 1.0 ELSE p END AS p
  FROM v3 WHERE NOT (k % {_DEL_MOD} = 0 AND k % {_UPS_MOD} <> 0)
  UNION ALL
  SELECT k, NULL, 1.0 FROM base
  WHERE k % {_UPS_MOD} = 0 AND pr = '{_DV_PRIO}')
"""


def storage_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level ``UPDATE ... SET`` via the deletion-vector path: v6
    doubles the price of every ``3-MEDIUM`` row OVER THE COMPACTED
    member — matched rows masked by one position-delete file, their
    post-images appended as one member (``n_added`` pins it), nothing
    rewritten. The per-priority aggregate against the relational
    rebuild gates the masking + post-image union; the v5 aggregate in
    ``storage_merge_on_read`` already pins the pre-update state, so the
    pair proves the update touched exactly the matched rows."""
    store = _staged_dv_store(spark, sf_dir)
    doc6 = store.manifest(6)
    return (
        store.read(spark, 6)
        .groupBy(
            F.coalesce(F.col("o_orderpriority"), F.lit(_REINS)).alias(
                "prio"
            )
        )
        .agg(
            F.count("*").alias("n_rows"),
            (
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                )
                / 100.0
            ).alias("sum_price"),
        )
        .select(
            F.lit(doc6["mode"]).alias("mode"),
            F.lit(len(doc6["added"])).alias("n_added_v6"),
            "prio",
            "n_rows",
            "sum_price",
        )
        .orderBy("prio")
    )


UPDATE_WHERE_SQL = f"""
WITH {_FINAL_CTE},
updated AS (
  SELECT k, pr,
         CASE WHEN pr = '{_UPD_PRIO}' THEN p * 2 ELSE p END AS p
  FROM final)
SELECT 'update' AS mode, CAST(1 AS INTEGER) AS n_added_v6,
       COALESCE(pr, '{_REINS}') AS prio, COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(p * 100) AS BIGINT)) AS BIGINT) / 100.0
           AS sum_price
FROM updated GROUP BY COALESCE(pr, '{_REINS}')
ORDER BY prio
"""


def storage_compact_masked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Targeted deletion-vector materialization: v7 rewrites ONLY the
    heavily-masked compacted member (one rewrote, one added, the clean
    post-image member carried verbatim) and clears its DV — the
    aggregate must be IDENTICAL to v6's DV-masked read, and the
    bookkeeping columns pin the scoped-rewrite shape plus the
    manifest-only telemetry that drove it (``masked_stats`` at v6)."""
    store = _staged_dv_store(spark, sf_dir)
    doc7 = store.manifest(7)
    ms6 = store.masked_stats(6)
    return (
        store.read(spark, 7)
        .groupBy(
            F.coalesce(F.col("o_orderpriority"), F.lit(_REINS)).alias(
                "prio"
            )
        )
        .agg(
            F.count("*").alias("n_rows"),
            (
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                )
                / 100.0
            ).alias("sum_price"),
        )
        .select(
            F.lit(doc7["mode"]).alias("mode"),
            F.lit(len(doc7["rewrote"])).alias("n_rewrote"),
            F.lit(len(doc7["added"])).alias("n_added"),
            F.lit(int(not doc7.get("deletes"))).alias("dv_cleared"),
            F.lit(len(ms6)).alias("n_masked_members_v6"),
            "prio",
            "n_rows",
            "sum_price",
        )
        .orderBy("prio")
    )


COMPACT_MASKED_SQL = f"""
WITH {_FINAL_CTE},
updated AS (
  SELECT k, pr,
         CASE WHEN pr = '{_UPD_PRIO}' THEN p * 2 ELSE p END AS p
  FROM final)
SELECT 'compact_masked' AS mode, CAST(1 AS INTEGER) AS n_rewrote,
       CAST(1 AS INTEGER) AS n_added, CAST(1 AS INTEGER) AS dv_cleared,
       CAST(1 AS INTEGER) AS n_masked_members_v6,
       COALESCE(pr, '{_REINS}') AS prio, COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(p * 100) AS BIGINT)) AS BIGINT) / 100.0
           AS sum_price
FROM updated GROUP BY COALESCE(pr, '{_REINS}')
ORDER BY prio
"""


def storage_dv_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE HISTORY with deletion-vector maintenance telemetry
    (``SnapshotStore.history()``, r11 verdict #4): one row per version
    of the DV store's 7-commit narrative with ``n_dv_members`` (members
    currently masked by position-delete files) and ``masked_rows``
    (their cumulative masked total) — all from manifests alone, zero
    data scans. The oracle recomputes every masked count relationally:
    v3 masks the 5-LOW rows across both members, v4 adds the matched
    upsert/delete rows, compaction clears everything, v6 masks exactly
    the 3-MEDIUM rows of the compacted member, and the targeted v7
    rewrite clears the map again. This is the readout an operator
    watches to schedule ``compact_masked`` — pinned cross-engine so the
    manifest telemetry can never drift from the row-level truth."""
    store = _staged_dv_store(spark, sf_dir)
    rows = [
        (
            h["version"], h["mode"], h["n_members"], h["n_added"],
            h["n_dv_members"], h["masked_rows"],
        )
        for h in store.history()
    ]
    return spark.createDataFrame(
        rows,
        "version int, mode string, n_members int, n_added int, "
        "n_dv_members int, masked_rows long",
    ).orderBy("version")


DV_HISTORY_SQL = f"""
WITH base AS (
  SELECT o_orderkey AS k, o_orderpriority AS pr FROM orders),
d3 AS (SELECT COUNT(*) AS n FROM base WHERE pr = '{_DV_PRIO}'),
m4 AS (
  SELECT COUNT(*) AS n FROM base
  WHERE pr <> '{_DV_PRIO}'
    AND (k % {_UPS_MOD} = 0
         OR (k % {_DEL_MOD} = 0 AND k % {_UPS_MOD} <> 0))),
u6 AS (
  SELECT COUNT(*) AS n FROM base
  WHERE pr = '{_UPD_PRIO}'
    AND NOT (k % {_DEL_MOD} = 0 AND k % {_UPS_MOD} <> 0))
SELECT CAST(1 AS INTEGER) AS version, 'overwrite' AS mode,
       CAST(1 AS INTEGER) AS n_members, CAST(1 AS INTEGER) AS n_added,
       CAST(0 AS INTEGER) AS n_dv_members, CAST(0 AS BIGINT) AS masked_rows
UNION ALL SELECT 2, 'append', 2, 1, 0, 0
UNION ALL SELECT 3, 'delete', 2, 0, 2, (SELECT n FROM d3)
UNION ALL SELECT 4, 'merge', 3, 1, 2,
          (SELECT n FROM d3) + (SELECT n FROM m4)
UNION ALL SELECT 5, 'compact', 1, 1, 0, 0
UNION ALL SELECT 6, 'update', 2, 1, 1, (SELECT n FROM u6)
UNION ALL SELECT 7, 'compact_masked', 2, 1, 0, 0
ORDER BY version
"""


QUERIES = {
    "storage_delete_vectors": storage_delete_vectors,
    "storage_merge_on_read": storage_merge_on_read,
    "storage_update_where": storage_update_where,
    "storage_compact_masked": storage_compact_masked,
    "storage_dv_history": storage_dv_history,
}

ORACLES = {
    "storage_delete_vectors": DELETE_VECTORS_SQL,
    "storage_merge_on_read": MERGE_ON_READ_SQL,
    "storage_update_where": UPDATE_WHERE_SQL,
    "storage_compact_masked": COMPACT_MASKED_SQL,
    "storage_dv_history": DV_HISTORY_SQL,
}

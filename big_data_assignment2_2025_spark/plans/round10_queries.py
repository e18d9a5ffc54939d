"""Round-10 queries: scale-hardening gates from the r9 verdict.

- **snapshot-store schema evolution** (``storage_schema_evolution``):
  additive add-column over the manifest store — v1 commits a 3-column
  documents subset, v2 is a SCHEMA-ONLY ``add_column`` (same members, no
  data), v3 appends rows that carry the new column. The gate reads all
  three versions across the evolution boundary: v1 time-travels to the
  PRE-evolution schema (3 columns — no retroactive column), v2 shows the
  evolved 4-column schema with every row NULL-backfilled, v3 mixes
  backfilled old members with scored new rows. Manifest-schema reads
  (``spark.read.schema(...)``) do the backfill by name with zero
  per-file footer merging — the 100 TB path (``mergeSchema`` is
  O(files) metadata reads).
- **scale-aware SemDeDup** (``embedding_semdedup_scaled``): the r9 probe
  measured 10.01x (quadratic) within-cell pair growth at a 10x corpus
  with the fixed 8-cell quantizer, and ~10x (linear) with k scaled to the
  corpus — SemDeDup's own regime (Abbas et al. 2023 use k ∝ n, e.g. 50k
  clusters on LAION-440M). ``semantic_dedup`` now derives
  ``k = ceil(n / 50)`` by default; this gate pins that derivation
  cross-engine at every fixture (k=10 at 500 vectors, k=40 at 2000).
  The fixed-k twin ``embedding_semdedup`` stays as the oracle-stable
  baseline-tier query.

No reference counterpart; analytics extensions per SURVEY.md §7.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import TARGET_CELL_ROWS, semantic_dedup
from ..sources.readers import (
    derived_cache_ok,
    fixture_fingerprint,
    load_table,
    mark_derived_cache,
)
from ..sources.snapshots import SnapshotStore

from .similarity_queries import COSINE_SQL_TEMPLATE as _COSINE


def _cos(qv: str, cv: str) -> str:
    return _COSINE.replace("QV", qv).replace("CV", cv)


def embedding_semdedup_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the scale-aware quantizer: n_cells derived from the
    corpus count (k = ceil(n / 50)), within-cell cosine >= 0.4 to a
    lower-id cellmate marks a semantic duplicate. This is the production
    default — fixed k makes within-cell pairs quadratic in the corpus
    (measured in tools/scale_probe.py); scaling k with n keeps them
    linear."""
    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, n_cells=None, threshold=0.4)


SEMDEDUP_SCALED_SQL = f"""
WITH params AS (
  SELECT GREATEST(1, CAST(CEIL(COUNT(*) / {TARGET_CELL_ROWS}.0) AS BIGINT)) AS k
  FROM embeddings),
cents AS (
  SELECT vec_id AS cell, embedding AS cent
  FROM (SELECT vec_id, embedding,
               ROW_NUMBER() OVER (ORDER BY vec_id) AS r
        FROM embeddings), params
  WHERE r <= params.k),
assign AS (
  SELECT vec_id, cv, cell FROM (
    SELECT e.vec_id, e.embedding AS cv, ct.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             {_cos('ct.cent', 'e.embedding')} DESC, ct.cell ASC) AS r
    FROM embeddings e CROSS JOIN cents ct) WHERE r <= 1),
dup_counts AS (
  SELECT a.cell, b.vec_id, COUNT(*) AS n_dup_lower
  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE {_cos('a.cv', 'b.cv')} >= 0.4
  GROUP BY a.cell, b.vec_id)
SELECT s.cell, s.vec_id,
       CAST(COALESCE(d.n_dup_lower, 0) AS BIGINT) AS n_dup_lower,
       CAST(CASE WHEN d.n_dup_lower IS NULL THEN 1 ELSE 0 END AS INTEGER) AS kept
FROM assign s LEFT JOIN dup_counts d ON s.cell = d.cell AND s.vec_id = d.vec_id
"""


#: the evolution split: v1 = doc_id % 3 != 0, v3 appends doc_id % 3 == 0
_EVO_MOD = 3
#: deterministic integer "score" both engines compute bit-for-bit
_EVO_SCORE = 97


def _staged_evolution_store(spark: SparkSession, sf_dir: str) -> SnapshotStore:
    """Per-fixture snapshot store with an additive evolution boundary:
    v1 overwrite (3 columns, two thirds of documents), v2 schema-only
    ``add_column('tox_score', 'bigint')``, v3 append (the remaining
    third, carrying the new column). Fingerprint-gated like every derived
    copy (``bucketed_table`` discipline)."""
    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    base = os.path.join(tempfile.gettempdir(), f"snapevo_{tag}")
    fprint = fixture_fingerprint(sf_dir)
    if not derived_cache_ok(base, fprint):
        if os.path.exists(base):
            shutil.rmtree(base)
        store = SnapshotStore(base)
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        store.commit(
            docs.where(F.col("doc_id") % _EVO_MOD != 0), mode="overwrite"
        )
        store.add_column("tox_score", "bigint")
        store.commit(
            docs.where(F.col("doc_id") % _EVO_MOD == 0).withColumn(
                "tox_score", (F.col("n_chars") % _EVO_SCORE).cast("long")
            ),
            mode="append",
        )
        with open(os.path.join(base, "_SUCCESS"), "w"):
            pass
        mark_derived_cache(base, fprint)
    return SnapshotStore(base)


def storage_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-version stats across an additive schema-evolution boundary:
    v1 (pre-evolution) must time-travel to the OLD 3-column schema — the
    later column does not retroactively appear; v2 (schema-only alter)
    shows the 4-column schema with the new column NULL on every
    backfilled row; v3 (post-evolution append) mixes NULL-backfilled old
    members with scored new rows. ``n_cols`` gates the per-version
    schema width, ``schema_version`` the manifest bookkeeping."""
    store = _staged_evolution_store(spark, sf_dir)
    out = None
    for v in (1, 2, 3):
        df = store.read(spark, v)
        sv = store.manifest(v)["schema_version"]
        if "tox_score" in df.columns:
            agg = df.agg(
                F.count("*").alias("n_rows"),
                F.count("tox_score").alias("n_scored"),
                F.sum("tox_score").cast("long").alias("sum_score"),
            )
        else:
            agg = df.agg(F.count("*").alias("n_rows")).select(
                "n_rows",
                F.lit(None).cast("long").alias("n_scored"),
                F.lit(None).cast("long").alias("sum_score"),
            )
        part = agg.select(
            F.lit(v).alias("version"),
            F.lit(sv).alias("schema_version"),
            F.lit(len(df.columns)).alias("n_cols"),
            "n_rows",
            "n_scored",
            "sum_score",
        )
        out = part if out is None else out.unionAll(part)
    return out.orderBy("version")


SCHEMA_EVOLUTION_SQL = f"""
SELECT CAST(1 AS INTEGER) AS version, CAST(1 AS INTEGER) AS schema_version,
       CAST(3 AS INTEGER) AS n_cols, COUNT(*) AS n_rows,
       CAST(NULL AS BIGINT) AS n_scored, CAST(NULL AS BIGINT) AS sum_score
FROM documents WHERE doc_id % {_EVO_MOD} <> 0
UNION ALL
SELECT 2, 2, 4, COUNT(*), CAST(0 AS BIGINT), CAST(NULL AS BIGINT)
FROM documents WHERE doc_id % {_EVO_MOD} <> 0
UNION ALL
SELECT 3, 2, 4, COUNT(*),
       COUNT(CASE WHEN doc_id % {_EVO_MOD} = 0 THEN 1 END),
       CAST(SUM(CASE WHEN doc_id % {_EVO_MOD} = 0
                     THEN n_chars % {_EVO_SCORE} END) AS BIGINT)
FROM documents
ORDER BY version
"""


#: the partition-evolution split mirrors the schema-evolution gate's
_PSPEC_PRIORITY = "1-URGENT"


def _staged_partition_store(spark: SparkSession, sf_dir: str) -> SnapshotStore:
    """Per-fixture snapshot store with a partition-spec evolution
    boundary: v1 overwrite (unpartitioned, two thirds of orders, stats
    on o_orderkey), v2 spec-only ``set_partition_spec(identity(
    o_orderpriority))``, v3 append (the remaining third — split into one
    member per priority, partition values in the manifest), v4
    ``compact()`` (rewrites EVERYTHING under the current spec — the
    pre-spec member migrates into partition members, Iceberg's
    rewrite-to-new-spec move). Fingerprint-gated like every derived
    copy."""
    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    base = os.path.join(tempfile.gettempdir(), f"snappspec_{tag}")
    fprint = fixture_fingerprint(sf_dir)
    if not derived_cache_ok(base, fprint):
        if os.path.exists(base):
            shutil.rmtree(base)
        store = SnapshotStore(base)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        )
        store.commit(
            orders.where(F.col("o_orderkey") % _EVO_MOD != 0),
            mode="overwrite",
            stats_cols=["o_orderkey"],
        )
        store.set_partition_spec([("o_orderpriority", "identity")])
        store.commit(
            orders.where(F.col("o_orderkey") % _EVO_MOD == 0),
            mode="append",
            stats_cols=["o_orderkey"],
        )
        store.compact(spark)
        with open(os.path.join(base, "_SUCCESS"), "w"):
            pass
        mark_derived_cache(base, fprint)
    return SnapshotStore(base)


def storage_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec evolution across four versions, with the pruning
    WITNESSED in the gate itself: ``n_members`` is each version's member
    count and ``n_planned`` the members a priority point-read actually
    opens (``planned_members_point``) — v1/v2 pre-spec (1 member, read
    conservatively), v3 mixed-spec (6 members, planned 2: the pre-spec
    member + the one matching partition), v4 post-compaction (5
    partition members, planned 1). Row counts and the priority slice's
    price sum must survive every boundary unchanged — pruning is a
    superset filter, never a row filter."""
    store = _staged_partition_store(spark, sf_dir)
    out = None
    for v in (1, 2, 3, 4):
        doc = store.manifest(v)
        planned = store.planned_members_point(
            spark, "o_orderpriority", _PSPEC_PRIORITY, version=v
        )
        pri = store.read_point(
            spark, "o_orderpriority", _PSPEC_PRIORITY, version=v
        ).agg(
            F.count("*").alias("n_pri"),
            F.round(F.sum("o_totalprice"), 2).alias("pri_price"),
        )
        part = pri.select(
            F.lit(v).alias("version"),
            F.lit(len(doc["members"])).alias("n_members"),
            F.lit(len(planned)).alias("n_planned"),
            F.lit(store.read(spark, v).count()).cast("long").alias("n_rows"),
            "n_pri",
            "pri_price",
        )
        out = part if out is None else out.unionAll(part)
    return out.orderBy("version")


PARTITION_EVOLUTION_SQL = f"""
WITH pre AS (
  SELECT COUNT(*) AS n,
         COUNT(CASE WHEN o_orderpriority = '{_PSPEC_PRIORITY}' THEN 1 END) AS np,
         ROUND(SUM(CASE WHEN o_orderpriority = '{_PSPEC_PRIORITY}'
                        THEN o_totalprice END), 2) AS pp
  FROM orders WHERE o_orderkey % {_EVO_MOD} <> 0),
com AS (
  SELECT COUNT(*) AS n,
         COUNT(CASE WHEN o_orderpriority = '{_PSPEC_PRIORITY}' THEN 1 END) AS np,
         ROUND(SUM(CASE WHEN o_orderpriority = '{_PSPEC_PRIORITY}'
                        THEN o_totalprice END), 2) AS pp
  FROM orders)
SELECT CAST(1 AS INTEGER) AS version, CAST(1 AS INTEGER) AS n_members,
       CAST(1 AS INTEGER) AS n_planned, pre.n AS n_rows,
       pre.np AS n_pri, pre.pp AS pri_price FROM pre
UNION ALL
SELECT 2, 1, 1, pre.n, pre.np, pre.pp FROM pre
UNION ALL
SELECT 3, 6, 2, com.n, com.np, com.pp FROM com
UNION ALL
SELECT 4, 5, 1, com.n, com.np, com.pp FROM com
ORDER BY version
"""


def _staged_cdf_store(spark: SparkSession, sf_dir: str) -> SnapshotStore:
    """Per-fixture store exercising the change feed: v1 overwrite (two
    thirds of orders), v2 append (the last third), v3 MERGE — upserts
    zeroing price to 1.0 for o_orderkey % 5 == 0, deletes for
    % 7 == 0 (minus the upsert keys: a MERGE batch is one row per key).
    Fingerprint-gated like every staged store."""
    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    base = os.path.join(tempfile.gettempdir(), f"snapcdf_{tag}")
    fprint = fixture_fingerprint(sf_dir)
    if not derived_cache_ok(base, fprint):
        if os.path.exists(base):
            shutil.rmtree(base)
        store = SnapshotStore(base)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        )
        store.commit(
            orders.where(F.col("o_orderkey") % _EVO_MOD != 0),
            mode="overwrite",
            stats_cols=["o_orderkey"],
        )
        store.commit(
            orders.where(F.col("o_orderkey") % _EVO_MOD == 0),
            mode="append",
            stats_cols=["o_orderkey"],
        )
        ups = orders.where(F.col("o_orderkey") % 5 == 0).select(
            "o_orderkey",
            F.lit(1.0).alias("o_totalprice"),
            F.lit("upsert").alias("_op"),
        )
        dels = orders.where(
            (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 5 != 0)
        ).select(
            "o_orderkey",
            F.lit(0.0).alias("o_totalprice"),
            F.lit("delete").alias("_op"),
        )
        store.merge(spark, ups.unionAll(dels), keys=["o_orderkey"])
        with open(os.path.join(base, "_SUCCESS"), "w"):
            pass
        mark_derived_cache(base, fprint)
    return SnapshotStore(base)


def storage_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed across an append + a MERGE (Delta CDF):
    ``read_changes(1, 3)`` surfaces the v2 append as ``insert`` rows and
    replays v3's recorded pre/post images — update_preimage carries the
    pre-merge prices, update_postimage the partial-updated rows (price
    1.0, priority inherited from the target), deletes the dropped rows'
    last values, and no-op deletes emit nothing. The per-type aggregate
    pins all four row classes cross-engine. O(changed data): the feed
    never opens v1's members."""
    store = _staged_cdf_store(spark, sf_dir)
    return (
        store.read_changes(spark, 1, 3)
        .groupBy("_change_type")
        .agg(
            F.count("*").alias("n_rows"),
            (
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                )
                / 100.0
            ).alias("sum_price"),
        )
        .orderBy("_change_type")
    )


CHANGE_FEED_SQL = f"""
WITH o AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders)
SELECT 'delete' AS _change_type, COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(p * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS sum_price
FROM o WHERE k % 7 = 0 AND k % 5 <> 0
UNION ALL
SELECT 'insert', COUNT(*),
       CAST(SUM(CAST(round(p * 100) AS BIGINT)) AS BIGINT) / 100.0
FROM o WHERE k % {_EVO_MOD} = 0
UNION ALL
SELECT 'update_postimage', COUNT(*),
       CAST(COUNT(*) * 100 AS BIGINT) / 100.0
FROM o WHERE k % 5 = 0
UNION ALL
SELECT 'update_preimage', COUNT(*),
       CAST(SUM(CAST(round(p * 100) AS BIGINT)) AS BIGINT) / 100.0
FROM o WHERE k % 5 = 0
ORDER BY _change_type
"""


def storage_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The version log as a metadata table (Delta ``DESCRIBE HISTORY`` /
    Iceberg ``snapshots``): one row per committed version with its mode,
    member/added counts, schema version and partition-spec id — all read
    from manifests alone (bounded by commit count, zero data scans).
    Over the staged partition store this pins the full evolution
    narrative cross-engine: overwrite -> spec-only alter -> partitioned
    append -> spec-migrating compaction."""
    store = _staged_partition_store(spark, sf_dir)
    rows = [
        (
            h["version"], h["mode"], h["n_members"], h["n_added"],
            h["n_dv_members"], h["masked_rows"],
            h["schema_version"], h["spec_id"],
        )
        for h in store.history()
    ]
    return spark.createDataFrame(
        rows,
        "version int, mode string, n_members int, n_added int, "
        "n_dv_members int, masked_rows long, "
        "schema_version int, spec_id int",
    ).orderBy("version")


STORAGE_HISTORY_SQL = """
SELECT CAST(1 AS INTEGER) AS version, 'overwrite' AS mode,
       CAST(1 AS INTEGER) AS n_members, CAST(1 AS INTEGER) AS n_added,
       CAST(0 AS INTEGER) AS n_dv_members, CAST(0 AS BIGINT) AS masked_rows,
       CAST(1 AS INTEGER) AS schema_version, CAST(0 AS INTEGER) AS spec_id
UNION ALL SELECT 2, 'alter', 1, 0, 0, 0, 1, 1
UNION ALL SELECT 3, 'append', 6, 5, 0, 0, 1, 1
UNION ALL SELECT 4, 'compact', 5, 5, 0, 0, 1, 1
ORDER BY version
"""


def storage_datasource_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The store through the FORMAT API (``spark.read.format(
    "snapshotstream")``, sources/snapshot_source.py): a Python
    DataSource batch reader whose partitions are the manifest's member
    files — one Arrow-backfilled scan per file, time travel as
    ``.option("version", N)``. Over the staged partition store's latest
    (post-compaction) version the per-priority aggregate must equal the
    raw orders aggregate: the format-API path reads exactly what the
    native ``store.read()`` path reads."""
    from ..sources.snapshot_source import SnapshotStreamDataSource

    store = _staged_partition_store(spark, sf_dir)
    spark.dataSource.register(SnapshotStreamDataSource)
    df = spark.read.format("snapshotstream").option(
        "path", store.base_dir
    ).load()
    return (
        df.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            (
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                )
                / 100.0
            ).alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


DATASOURCE_READ_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         / 100.0 AS sum_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


QUERIES = {
    "embedding_semdedup_scaled": embedding_semdedup_scaled,
    "storage_schema_evolution": storage_schema_evolution,
    "storage_partition_evolution": storage_partition_evolution,
    "storage_history": storage_history,
    "storage_datasource_read": storage_datasource_read,
    "storage_change_feed": storage_change_feed,
}

ORACLES = {
    "embedding_semdedup_scaled": SEMDEDUP_SCALED_SQL,
    "storage_schema_evolution": SCHEMA_EVOLUTION_SQL,
    "storage_partition_evolution": PARTITION_EVOLUTION_SQL,
    "storage_history": STORAGE_HISTORY_SQL,
    "storage_datasource_read": DATASOURCE_READ_SQL,
    "storage_change_feed": CHANGE_FEED_SQL,
}

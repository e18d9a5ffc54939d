"""Avro source/sink, gated behind a runtime capability probe.

Avro is the one mainstream interchange format Spark ships only as an
*external* module (``org.apache.spark:spark-avro_2.13``); the jar is not on
the classpath in this container and there is no network to fetch it
(SURVEY.md §9.8, VERDICT r4 next-round #8). The reference never touches
Avro either, so this is a forward-compatibility surface, not a parity
requirement: the moment the jar appears (``spark.jars.packages`` on a real
cluster), ``read_avro``/``write_avro`` work unchanged; until then they fail
fast with an actionable message instead of Spark's generic
"Failed to find data source: avro" stack trace.

At 100 TB the format choice matters: Avro is a row-major format with no
column pruning or predicate pushdown, so the reader here is the *ingest*
edge (accept upstream Avro drops), and the documented pattern is
``read_avro(...)`` -> immediate parquet re-materialization, never repeated
analytical scans over the Avro files themselves.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession

# WeakKeyDictionary, NOT id(spark)-keyed: a stopped session's object address
# can be reused by a NEW SparkSession after garbage collection, which would
# serve a stale cached verdict. Weak keys also let dead sessions drop out of
# the cache instead of pinning them.
_probe_cache: "weakref.WeakKeyDictionary[SparkSession, bool]" = (
    weakref.WeakKeyDictionary()
)

#: Error markers meaning "the avro data source is not on the classpath".
#: Spark 4 raises errorClass FAILED_FIND_DATA_SOURCE (its message text
#: carries the class name); older releases raise the legacy message
#: "Failed to find data source". Match both — the legacy text alone is
#: version-fragile.
_MISSING_SOURCE_MARKERS = ("Failed to find data source", "FAILED_FIND_DATA_SOURCE")


def avro_available(spark: SparkSession) -> bool:
    """True iff the ``avro`` data source resolves in this session.

    A ``Class.forName`` probe is NOT sufficient: the Spark 4 core jar
    carries ``org.apache.spark.sql.avro.AvroFileFormat`` as a stub (so the
    built-in error message can say "Avro is built-in but external"), so the
    class loads while ``format("avro")`` still fails. The reliable probe is
    functional — attempt a schema'd load of a nonexistent path and
    distinguish "failed to find data source" (module absent — matched via
    error class AND legacy message text) from a path-not-found error
    (module present, path bogus). Cached per live session object."""
    if spark not in _probe_cache:
        try:
            spark.read.format("avro").schema("__probe int").load(
                "/nonexistent/__avro_capability_probe__"
            )
            _probe_cache[spark] = True
        except Exception as e:  # AnalysisException either way; inspect which
            err = str(e)
            # Spark 4 name is getCondition; getErrorClass is the deprecated
            # 3.x spelling — accept either.
            probe = getattr(e, "getCondition", None) or getattr(
                e, "getErrorClass", None
            )
            cls = (probe() if probe else None) or ""
            _probe_cache[spark] = not (
                any(m in err for m in _MISSING_SOURCE_MARKERS)
                or "FAILED_FIND_DATA_SOURCE" in cls
            )
    return _probe_cache[spark]


def _require_avro(spark: SparkSession) -> None:
    if not avro_available(spark):
        raise RuntimeError(
            "Avro support needs the external spark-avro module "
            "(org.apache.spark:spark-avro_2.13:<spark-version>) on the "
            "classpath; add it via spark.jars.packages. It is not bundled "
            "with Spark and is absent in this container."
        )


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Read an Avro dataset. Schema comes from the embedded writer schema;
    pass the result straight to a parquet sink for analytical reuse —
    Avro scans are row-major and support no column pruning."""
    _require_avro(spark)
    return spark.read.format("avro").load(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write an Avro dataset (interchange edge for downstream row-oriented
    consumers — Kafka-ecosystem tooling, schema-registry pipelines)."""
    _require_avro(df.sparkSession)
    df.write.mode(mode).format("avro").save(path)

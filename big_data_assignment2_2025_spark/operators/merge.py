"""Delta-style ``MERGE INTO`` (upsert) emulation on plain DataFrames.

The reference engine is append/overwrite-only (SURVEY.md §2 S8) and this
container has no Delta Lake / Iceberg, so MERGE is expressed the way every
lakehouse engine ultimately executes it: ONE full-outer shuffle join between
target and staging on the merge key, then per-column ``coalesce`` to pick
the surviving value:

- key in both          -> UPDATE  (source values win; null source cols keep
                                   the target value, i.e. partial updates)
- key only in source   -> INSERT
- key only in target   -> KEEP    (untouched rows pass through)

Scale notes (100 TB target):
- This is a single shuffle on the merge key — the minimum possible for an
  unpartitioned upsert. With a small staging set Catalyst/AQE will broadcast
  it and the target never shuffles at all; assert nothing that forbids that.
- On a real lakehouse table you'd prune first (join staging keys against
  file-level min/max to rewrite only touched files). The join below is
  exactly the per-file rewrite step of that plan, so the operator composes
  with partition pruning unchanged.
- ``eqNullSafe`` on keys so a null key in both sides matches itself rather
  than silently duplicating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, on: list[str]) -> DataFrame:
    """Merge ``source`` into ``target`` on key columns ``on``.

    Returns the merged table (all target columns, source values winning on
    matches) plus a ``merge_action`` column in {'update','insert','keep'}.
    Source must contain the key columns; any other shared column is updated,
    target-only columns pass through (null on inserted rows).
    """
    missing = [k for k in on if k not in source.columns]
    if missing:
        raise ValueError(f"source is missing merge key column(s): {missing}")
    # `t.k is null` can't flag inserts when the key itself is null, so carry
    # explicit presence markers through the join instead.
    t = target.withColumn("_t_present", F.lit(True)).alias("t")
    s = source.withColumn("_s_present", F.lit(True)).alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in on]
    joined = t.join(s, cond, "full_outer")

    out = []
    for c in target.columns:
        if c in source.columns:
            out.append(F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c))
        else:
            out.append(F.col(f"t.{c}").alias(c))
    action = (
        F.when(F.col("_t_present") & F.col("_s_present"), F.lit("update"))
        .when(F.col("_t_present").isNull(), F.lit("insert"))
        .otherwise(F.lit("keep"))
        .alias("merge_action")
    )
    return joined.select(*out, action)

"""Temporal join operators Spark lacks as built-ins: as-of join and banded
range join. No reference counterpart (the reference is pure batch BM25);
these are the time-series primitives a large-scale event pipeline needs
(SURVEY.md §2.3 "Not present: ... range/as-of joins" → extension).

Both are compositions of stock DataFrame ops (SURVEY build rule: prefer
composition over mapInPandas over mapPartitions):

- **as-of join**: union the two sides, sort by (key, time) with right rows
  ordered before left rows at equal times, and carry the right payload
  forward with ``last(ignorenulls)`` over a running window. ONE shuffle on
  the key — no N×M pair blow-up, no per-key driver loop, and skew-safe via
  AQE. This is the standard distributed as-of formulation (e.g. how
  Flink/kdb-style asof is expressed on shuffle engines).
- **banded range join**: equi-join on (key, time-bucket) after exploding the
  left side to the buckets its interval overlaps, then exact range filter.
  Turns an unbounded theta-join into an equi-join whose fan-out is
  ``interval / band`` buckets per row — the planner-friendly shape at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    time_col: str,
    right_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.time <= left.time`` within the same ``on`` key (backward as-of,
    inclusive; the kdb/pandas `merge_asof` default). ``direction="forward"``
    instead attaches the EARLIEST right row with ``right.time >=
    left.time`` — same single-shuffle carry-forward plan run over
    descending time. Left rows with no match keep NULLs.

    ``right`` must be unique per (on, time_col) or the match among equal
    times is unspecified — pre-aggregate the right side if needed.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = [c for c in left.columns if c not in (on, time_col)]
    l_tagged = left.select(
        F.col(on),
        F.col(time_col),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(on),
        F.col(time_col),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    # right rows sort before left rows at equal timestamps => inclusive
    # match; forward scans time descending so "last seen right" = next right
    t_order = (
        F.col(time_col).asc() if direction == "backward" else F.col(time_col).desc()
    )
    w = (
        W.partitionBy(on)
        .orderBy(t_order, F.col("_is_left").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged)
    for c in right_cols:
        carried = carried.withColumn(
            f"{c}{suffix}", F.last(f"{c}{suffix}", ignorenulls=True).over(w)
        )
    return carried.where(F.col("_is_left") == 1).drop("_is_left")


def range_join_banded(
    left: DataFrame,
    right: DataFrame,
    on: str,
    time_col: str,
    lower: int = 0,
    upper: int = 600,
    band: int = 600,
) -> DataFrame:
    """Pairs (l, r) with same key and ``r.time - l.time`` in [lower, upper]
    (seconds). Left/right must expose integer-second ``time_col``.

    Scale shape: the left row's window [t+lower, t+upper] overlaps
    ``(upper - lower) / band + 1`` bands; exploding to those band keys makes
    the join a pure equi-join on (key, band) — shuffle-partitionable, AQE
    skew-splittable — with the exact range predicate applied after.
    Output: key, l_time, r_time plus remaining columns suffixed _l/_r.
    """
    n_bands = (upper - lower) // band + 1
    l = left.select(
        F.col(on),
        F.col(time_col).alias("l_time"),
        *[F.col(c).alias(f"{c}_l") for c in left.columns if c not in (on, time_col)],
    ).withColumn(
        "_band",
        F.explode(
            F.sequence(
                F.floor((F.col("l_time") + F.lit(lower)) / F.lit(band)).cast("long"),
                F.floor((F.col("l_time") + F.lit(upper)) / F.lit(band)).cast("long"),
            )
        ),
    )
    assert n_bands >= 1
    r = right.select(
        F.col(on),
        F.col(time_col).alias("r_time"),
        *[F.col(c).alias(f"{c}_r") for c in right.columns if c not in (on, time_col)],
    ).withColumn("_band", F.floor(F.col("r_time") / F.lit(band)).cast("long"))
    return (
        l.join(r, [on, "_band"])
        .where(
            (F.col("r_time") - F.col("l_time") >= lower)
            & (F.col("r_time") - F.col("l_time") <= upper)
        )
        .drop("_band")
        .distinct()
    )

"""Z-order (Morton) keys — multi-dimensional clustering for file skipping.

The reference stores its index clustered by ONE key (`(corpus_name, term)`
partition keys, ``app/cassandra/schema.cql:5-19``), which prunes perfectly
on that key and not at all on any other. A 100 TB fact table usually has
TWO OR MORE selective dimensions (part and supplier, user and day); sorting
by either one leaves box queries on the pair scanning everything outside
the leading prefix. Interleaving the dimensions' bits into one Morton key
and range-clustering files BY THAT KEY gives every file a tight [min, max]
zkey envelope, and any axis-aligned box maps to one zkey range — this is
exactly what Delta's ``OPTIMIZE ZORDER BY`` and Iceberg's sort-order
z-transform do (public technique: Morton 1966; Bayer's UB-tree).

Key correctness property (what makes the pruned read a SUPERSET prune):
``zkey`` is monotone in each coordinate with the other fixed — each
coordinate's bits sit at fixed positions in their original order — so for
a box ``[x1, x2] x [y1, y2]`` every inside point satisfies
``zkey(x1, y1) <= zkey(x, y) <= zkey(x2, y2)``. The z-range may also
admit points OUTSIDE the box (the curve jumps); the exact box predicate is
always re-applied after pruning, so correctness never depends on the
envelope being tight (same contract as ``SnapshotStore.read_where``).

Everything is integer bit arithmetic (shiftright/and/shiftleft folds), so
Spark and DuckDB compute identical keys — the gate hashes them directly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key2(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative integer
    columns into one BIGINT: bit i of ``x`` lands at position 2i, bit i of
    ``y`` at 2i+1. Pure codegen fold — no UDF, no shuffle."""
    x, y = F.col(x) if isinstance(x, str) else x, (
        F.col(y) if isinstance(y, str) else y
    )
    xl, yl = x.cast("long"), y.cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftright(xl, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(yl, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return key


def zorder_key2_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical Morton key as portable SQL (DuckDB oracle side)."""
    terms = []
    for i in range(bits):
        terms.append(
            f"((({x} >> {i}) & 1) << {2 * i})"
            f" + ((({y} >> {i}) & 1) << {2 * i + 1})"
        )
    return "(" + " + ".join(terms) + ")"

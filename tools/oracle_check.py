"""Local mimic of the driver's DuckDB-oracle correctness gate.

Runs every query in the registry on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, schema (column names) and
an order-insensitive value hash. Floats are compared exactly AND with a
report of the max abs diff so we can see whether a mismatch is real or an
ulp/rounding artifact.

Usage:  python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from big_data_assignment2_2025_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v):
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        # DuckDB HUGEINT/DECIMAL results reach the driver as floats (Arrow
        # decimal128 -> pandas float64), so mimic that here: an un-cast
        # SUM(BIGINT) must FAIL locally exactly like it fails the driver gate.
        return repr(float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _hash_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_norm_cell(r[i]) for i in idx) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\x02")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    from big_data_assignment2_2025_spark.plans import ORACLES, QUERIES

    unknown = only - set(QUERIES)
    if unknown:
        print(f"ERROR: unknown queries: {sorted(unknown)}")
        sys.exit(2)

    failures = []
    ran = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        ran += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        sql = ORACLES.get(name)
        if sql is None:
            print(f"SKIP  {name}: no oracle (rows-only check: {len(srows)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            tbl = con.execute(sql).arrow()
            ocols = tbl.schema.names
            orows = [tuple(d[c] for c in ocols) for d in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue

        problems = []
        import pyarrow as pa

        for field in tbl.schema:
            if pa.types.is_decimal(field.type):
                problems.append(
                    f"oracle column '{field.name}' is {field.type} (DuckDB "
                    "HUGEINT/DECIMAL -> driver normalizes as float); wrap it "
                    "in CAST(... AS BIGINT/DOUBLE) in the oracle SQL"
                )
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema spark={sorted(scols)} duckdb={sorted(ocols)}")
        if not problems:
            hs, ho = _hash_rows(scols, srows), _hash_rows(ocols, orows)
            if hs != ho:
                problems.append("value-hash mismatch")
                # diagnostics: show first differing normalized rows
                idx_s = sorted(range(len(scols)), key=lambda i: scols[i])
                idx_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("\x01".join(_norm_cell(r[i]) for i in idx_s) for r in srows)
                lo = sorted("\x01".join(_norm_cell(r[i]) for i in idx_o) for r in orows)
                for a, b in zip(ls, lo):
                    if a != b:
                        problems.append(f"  spark : {a[:200]}")
                        problems.append(f"  duckdb: {b[:200]}")
                        break
        status = "OK  " if not problems else "FAIL"
        print(f"{status}  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
        for p in problems:
            print(f"      {p}")
        if problems:
            failures.append(name)

    print()
    print(f"{ran - len(failures)}/{ran} queries match; failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

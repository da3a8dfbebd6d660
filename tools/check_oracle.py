"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf0.01, compare row count + column names + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entry_mod
from joi_spark.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    import numpy as np
    import pandas as pd
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (np.floating, float)):
        # round-trip repr, the same strictness as the driver's value
        # hash — a 1-ulp or dtype (int64 vs float64) cross-engine
        # difference is a FAIL here.
        return repr(float(v))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_rows(df):
    """Canonicalize a pandas frame the way the driver does: sort columns
    by name, normalize every cell dtype-sensitively (a DuckDB HUGEINT
    that pandas renders as float64 must NOT equal Spark's int64)."""
    cols = sorted(df.columns)
    return sorted(tuple(norm(v) for v in row)
                  for row in df[cols].itertuples(index=False, name=None))


def check_queries(spark, sf_dir: str, only=None) -> int:
    """Run the gate comparison for ``only`` (or all) queries; prints a
    line per query, returns the failure count.  Importable so pytest
    can smoke the rotation tail with the shared session."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = sorted(sdf.columns)
        # the driver's canonicalizer pandas-sorts rows; list/map cells
        # are unhashable there — flag them here so the local gate
        # matches the driver's (round-2 quality_filter lesson)
        bad = [f.name for f in sdf.schema.fields
               if f.dataType.typeName() in ("array", "map", "struct")]
        if bad and name in oracles:
            failures += 1
            print(f"{name}: FAIL non-scalar oracle columns {bad} "
                  f"(driver canonicalizer would crash)")
            continue
        spdf = sdf.toPandas()
        sset = frame_rows(spdf)
        if name not in oracles:
            print(f"{name}: rows-only ({len(sset)} rows, no oracle)")
            continue
        opdf = con.execute(oracles[name]).df()
        ocols = sorted(opdf.columns)
        oset = frame_rows(opdf)
        ok_cols = scols == ocols
        ok_cnt = len(sset) == len(oset)
        ok_vals = sset == oset
        srows, orows = sset, oset
        status = "OK" if (ok_cols and ok_cnt and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{name}: {status} spark={len(srows)} duck={len(orows)} "
              f"cols={'ok' if ok_cols else f'{scols} vs {ocols}'}")
        if not ok_vals and ok_cols and ok_cnt:
            sonly = [r for r in sset if r not in set(oset)][:3]
            oonly = [r for r in oset if r not in set(sset)][:3]
            print(f"  spark-only: {sonly}")
            print(f"  duck-only:  {oonly}")
        elif not ok_cnt:
            sonly = [r for r in sset if r not in set(oset)][:3]
            oonly = [r for r in oset if r not in set(sset)][:3]
            print(f"  spark-only: {sonly}")
            print(f"  duck-only:  {oonly}")
    return failures


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    failures = check_queries(spark, sf_dir, only)
    # smoke entry()
    if not only:
        e = entry_mod.entry(spark)
        print(f"entry(): {e.count()} rows, schema={e.columns}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

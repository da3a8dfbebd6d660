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
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
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
        srows = sdf.collect()
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
        sset = sorted(tuple(norm(r[c]) for c in scols) for r in srows)
        if name not in oracles:
            print(f"{name}: rows-only ({len(srows)} rows, no oracle)")
            continue
        ocur = con.execute(oracles[name])
        ocols_raw = [d[0] for d in ocur.description]
        orows = ocur.fetchall()
        ocols = sorted(ocols_raw)
        idx = [ocols_raw.index(c) for c in ocols]
        oset = sorted(tuple(norm(r[i]) for i in idx) for r in orows)
        ok_cols = scols == ocols
        ok_cnt = len(srows) == len(orows)
        ok_vals = sset == oset
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
    # smoke entry()
    if not only:
        e = entry_mod.entry(spark)
        print(f"entry(): {e.count()} rows, schema={e.columns}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count, schema width, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from featuregenerator_spark.session import get_spark


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [tuple(sorted(cols))] + out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"{name:32s} SPARK-ERROR {str(e)[:200]}")
            failures.append((name, "spark error"))
            continue
        if name not in oracles:
            print(f"{name:32s} rows-only: {len(srows)} rows")
            if len(srows) == 0:
                failures.append((name, "0 rows"))
            continue
        res = con.sql(oracles[name])
        dcols = res.columns
        drows = res.fetchall()
        ok_rows = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        sn = norm_rows(scols, srows)
        dn = norm_rows(dcols, drows)
        ok_vals = sn == dn
        status = "OK " if (ok_rows and ok_cols and ok_vals) else "FAIL"
        print(
            f"{name:32s} {status} rows {len(srows)}/{len(drows)} "
            f"cols {scols if not ok_cols else 'match'} vals {'match' if ok_vals else 'DIFF'}"
        )
        if status == "FAIL":
            failures.append((name, "mismatch"))
            if not ok_vals and ok_rows and ok_cols:
                for i, (a, b) in enumerate(zip(sn, dn)):
                    if a != b:
                        print(f"   first diff row {i}:\n   spark: {a}\n   duck : {b}")
                        break
    print(f"\n{len(failures)} failures: {[f[0] for f in failures]}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

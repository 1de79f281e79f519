"""Local replica of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB at sf0.01, compare row
count, sorted column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)  # exact — mirror a bit-exact driver hash
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def frame_repr(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")

    import __spark_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name:35s} rows-only: {len(srows)} rows")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        sc, sr = frame_repr(scols, srows)
        dc, dr = frame_repr(dcols, drows)
        ok = sc == dc and sr == dr
        n_ok += ok
        n_bad += not ok
        print(f"{name:35s} {'OK ' if ok else 'MISMATCH'} spark={len(sr)} duck={len(dr)}")
        if not ok:
            if sc != dc:
                print("  cols spark:", sc, "\n  cols duck :", dc)
            else:
                sset, dset = set(sr), set(dr)
                for r in list(sset - dset)[:5]:
                    print("  spark-only:", r)
                for r in list(dset - sset)[:5]:
                    print("  duck-only :", r)
    print(f"\n{n_ok} OK, {n_bad} mismatched")
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()

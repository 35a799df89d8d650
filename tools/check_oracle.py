"""Side-by-side Spark-vs-DuckDB oracle check, mimicking the driver's
CORRECTNESS gate: for each key in queries() with an oracle_sql() entry, run
both, sort columns by name and rows by value, and compare.

Usage: python tools/check_oracle.py [--exact] [sf_dir] [query ...]

--exact compares floats at full double precision (repr) instead of the
default 6-significant-digit normalization -- the closest local stand-in for
the driver's value hash.
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


EXACT = False


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v) if EXACT else f"{v:.6g}"
    return str(v)


def main():
    global EXACT
    argv = list(sys.argv[1:])
    if argv and argv[0] == "--exact":
        EXACT = True
        argv = argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            print(f"SKIP {name} (rows-only)")
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"ERR  {name}: {type(ex).__name__}: {str(ex)[:200]}")
            n_fail += 1
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} != {ocols}")
            n_fail += 1
            continue
        srows = sorted(
            tuple(norm(v) for v in row)
            for row in sdf[scols].itertuples(index=False, name=None)
        )
        orows = sorted(
            tuple(norm(v) for v in row)
            for row in odf[ocols].itertuples(index=False, name=None)
        )
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows {len(srows)} != {len(orows)}")
            n_fail += 1
            continue
        bad = [
            (a, b) for a, b in zip(srows, orows) if a != b
        ]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; "
                  f"first: spark={bad[0][0]} oracle={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

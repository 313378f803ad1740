"""Oracle-check a subset of declared queries the way the driver does.

Usage: python scripts/oracle_rows.py [--sf sf0.001] q1 q2 ...
       python scripts/oracle_rows.py --sf sf0.01 --all

Vanilla local[8] session (driver-shaped), DuckDB oracle, order-insensitive
row multiset + schema comparison with the same normalization the verify
skill documents.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def main() -> None:
    args = sys.argv[1:]
    sf = "sf0.001"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        args = args[:i] + args[i + 2 :]
    run_all = "--all" in args
    names = [a for a in args if a != "--all"]

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    sf_dir = f"/root/testdata/{sf}"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, osql = e.queries(), e.oracle_sql()
    if run_all:
        names = list(qs)
    bad = 0
    for name in names:
        if name not in qs:
            print(f"!! unknown {name}", file=sys.stderr)
            bad += 1
            continue
        try:
            sdf = qs[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            if name not in osql:
                print(f"{name}\trows-only\t{len(srows)}")
                continue
            rel = con.sql(osql[name])
            drows = rel.fetchall()
            scols = sdf.columns
            dcols = [d[0] for d in rel.description]
            so = sorted(range(len(scols)), key=lambda i: scols[i])
            do = sorted(range(len(dcols)), key=lambda i: dcols[i])

            def key(t):
                return tuple((x is None, str(x)) for x in t)

            sms = sorted(
                (tuple(norm(r[i]) for i in so) for r in srows), key=key
            )
            dms = sorted(
                (tuple(norm(r[i]) for i in do) for r in drows), key=key
            )
            ok = sorted(scols) == sorted(dcols) and sms == dms
            print(f"{name}\t{'OK' if ok else 'MISMATCH'}\t{len(srows)}")
            if not ok:
                bad += 1
                for a, b in list(zip(sms, dms))[:3]:
                    if a != b:
                        print(f"  spark: {a}\n  duck:  {b}")
        except Exception as ex:  # noqa: BLE001
            print(f"{name}\tERROR\t{type(ex).__name__}: {ex}")
            bad += 1
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

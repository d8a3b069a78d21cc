"""Local mimic of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet tables; compare
row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [name_substring ...] [--sf DIR]
                                    [--extras | --all]

--extras checks only the extra_queries() registry (queries beyond the
driver's 50-entry gate); --all checks both registries.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical string rendering so float64 vs object etc. don't false-alarm
    def render(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "\0NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    out = df.map(render)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    skip = set()
    for i, a in enumerate(argv):
        if a == "--sf":
            if i + 1 >= len(argv):
                sys.exit("usage: check_oracle.py [name ...] [--sf DIR] [--extras|--all]")
            sf_dir = argv[i + 1]
            skip = {i, i + 1}  # drop the flag AND its value by POSITION
    args = [a for i, a in enumerate(argv) if not a.startswith("--") and i not in skip]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    import __spark_entry__ as entrymod

    if "--extras" in sys.argv:
        qs, oracles = entrymod.extra_queries(), entrymod.extra_oracle_sql()
    elif "--all" in sys.argv:
        qs = {**entrymod.queries(), **entrymod.extra_queries()}
        oracles = {**entrymod.oracle_sql(), **entrymod.extra_oracle_sql()}
    else:
        qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = [n for n in qs if not args or any(a in n for a in args)]
    failed = []
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            if name not in oracles:
                print(f"  {name:32s} rows={len(sdf)} (no oracle — rows-only)")
                continue
            odf = con.sql(oracles[name]).df()
            a, b = canon(sdf), canon(odf)
            if list(a.columns) != list(b.columns):
                failed.append(name)
                print(f"✗ {name:32s} COLUMNS spark={list(a.columns)} oracle={list(b.columns)}")
                continue
            if len(a) != len(b):
                failed.append(name)
                print(f"✗ {name:32s} ROWS spark={len(a)} oracle={len(b)}")
                continue
            neq = (a.values != b.values).any(axis=1)
            if neq.any():
                failed.append(name)
                i = neq.argmax()
                print(f"✗ {name:32s} VALUES {int(neq.sum())}/{len(a)} rows differ; first at {i}:")
                print("   spark :", a.iloc[i].to_dict())
                print("   oracle:", b.iloc[i].to_dict())
            else:
                print(f"✓ {name:32s} rows={len(a)}")
        except Exception as e:
            failed.append(name)
            print(f"✗ {name:32s} ERROR {type(e).__name__}: {str(e)[:300]}")
    print(f"\n{len(names)-len(failed)}/{len(names)} passed")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

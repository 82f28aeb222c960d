"""Local replica of the driver's correctness gate: run each queries() entry
via Spark and its oracle_sql() via DuckDB at a given sf dir, compare
row-count, column names, and order-insensitive values (exact match after
canonicalization). Usage: python tools/check_oracle.py [sf_dir] [q1 q2 ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        if isinstance(v, float):
            return f"{v:.10g}"
        if isinstance(v, (list, tuple)):
            return str([norm(x) for x in v])
        return str(v)

    out = df.map(norm)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from politics_crawler_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"{name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            continue
        if sql is None:
            print(f"{name}: rows-only, spark rows={len(sdf)}")
            continue
        try:
            ddf = con.sql(sql).df()
        except Exception as e:
            failures.append(name)
            print(f"{name}: DUCKDB ERROR {str(e)[:300]}")
            continue
        ok_rows = len(sdf) == len(ddf)
        ok_cols = sorted(sdf.columns) == sorted(ddf.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            a, b = canon(sdf), canon(ddf)
            ok_vals = a.equals(b)
            if not ok_vals:
                diff = (a != b).any(axis=1)
                print(f"{name}: VALUE MISMATCH ({int(diff.sum())} rows)")
                print("spark:", a[diff].head(3).to_dict("records"))
                print("duck :", b[diff].head(3).to_dict("records"))
        else:
            print(f"{name}: rows {len(sdf)} vs {len(ddf)}, cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(f"{name}: {status} rows={len(sdf)}")
    print("FAILURES:", failures or "none")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/local_compare.py <verify_out_dir> <sf_dir> [query ...]

Reads each <verify_out_dir>/<query> spark parquet result plus
<verify_out_dir>/oracle_sql.json, runs every oracle SQL in DuckDB over
views of the sf parquet tables, and compares rows / schema (column
names, sorted) / values (columns sorted by name, rows sorted by all
columns — the driver's protocol, including its pandas sort_values step
so unsortable column types are caught here, not by the driver).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def main() -> int:
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"{name}: NO SPARK RESULT ({type(e).__name__}: {e})")
            n_bad += 1
            continue
        try:
            ora_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE ERR {type(e).__name__}: "
                  f"{str(e)[:200]}")
            n_bad += 1
            continue
        rows_ok = len(spark_df) == len(ora_df)
        schema_ok = sorted(spark_df.columns) == sorted(ora_df.columns)
        vals_ok = False
        err = None
        if rows_ok and schema_ok:
            try:
                s, o = canon(spark_df), canon(ora_df)
                vals_ok = all(
                    cells_equal(s.iat[i, j], o.iat[i, j])
                    for i in range(len(s)) for j in range(len(s.columns)))
            except Exception as e:
                err = f"{type(e).__name__}: {str(e)[:200]}"
        if rows_ok and schema_ok and vals_ok:
            print(f"{name}: OK ({len(spark_df)} rows)")
        else:
            n_bad += 1
            print(f"{name}: FAIL rows={rows_ok} "
                  f"({len(spark_df)} vs {len(ora_df)}) schema={schema_ok} "
                  f"vals={vals_ok}" + (f" err={err}" if err else ""))
            if not schema_ok:
                print(f"  spark cols: {sorted(spark_df.columns)}")
                print(f"  ora cols:   {sorted(ora_df.columns)}")
    print(f"\n{'ALL GREEN' if n_bad == 0 else f'{n_bad} FAILURES'}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())

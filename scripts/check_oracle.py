#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dump (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name and rows by all columns, and
compares cell-by-cell. Exit 1 on any mismatch.

Driver-side tooling only (duckdb/pandas are not available to the Scala
library) — this script exists so oracle drift is caught before commit.
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


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
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    failures = []
    for name, sql in sorted(oracles.items()):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            failures.append((name, "no spark output dir"))
            continue
        try:
            got = canon(con.sql(
                f"SELECT * FROM '{spark_path}/*.parquet'").df())
            want = canon(con.sql(sql).df())
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"query error: {e}"))
            continue
        if list(got.columns) != list(want.columns):
            failures.append(
                (name, f"columns differ: spark={list(got.columns)} "
                       f"oracle={list(want.columns)}"))
            continue
        if len(got) != len(want):
            failures.append(
                (name, f"row count differs: spark={len(got)} oracle={len(want)}"))
            continue
        bad = None
        for ci, c in enumerate(got.columns):
            gv, wv = got[c].tolist(), want[c].tolist()
            for ri in range(len(gv)):
                if not cells_equal(gv[ri], wv[ri]):
                    bad = (c, ri, gv[ri], wv[ri])
                    break
            if bad:
                break
        if bad:
            c, ri, g, w = bad
            failures.append(
                (name, f"cell mismatch col={c} row={ri}: spark={g!r} oracle={w!r}"))
        else:
            print(f"  OK   {name}: {len(got)} rows")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    print(f"{len(oracles) - len(failures)}/{len(oracles)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

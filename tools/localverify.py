#!/usr/bin/env python3
"""Local dev mirror of the driver's correctness gate.

Usage:  python3 tools/localverify.py <outDir> <sfDir>
  where <outDir> was produced by `sbt "runMain graft.Verify <sfDir> <outDir>"`.

For each <outDir>/<name> parquet result: run <outDir>/oracle_sql.json[name]
in DuckDB with the sf tables registered as views, sort columns by name and
rows by all values, and compare cell-by-cell. This is dev tooling only — the
shipped engine is the Scala library (no Python/duckdb dependency).
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, kind="mergesort", na_position="first").reset_index(drop=True)
    return df


def cells_equal(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)


def main(out_dir, sf_dir):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = out / name
        if not res_dir.exists():
            print(f"MISSING {name}: no Spark result dir")
            n_fail += 1
            continue
        try:
            spark_df = canon(con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df())
            duck_df = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"ERROR   {name}: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL    {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL    {name}: rows {len(spark_df)} vs {len(duck_df)}")
            n_fail += 1
            continue
        bad = None
        for c in spark_df.columns:
            sa, da = spark_df[c].tolist(), duck_df[c].tolist()
            for i, (x, y) in enumerate(zip(sa, da)):
                xn = x is None or (isinstance(x, float) and math.isnan(x))
                yn = y is None or (isinstance(y, float) and math.isnan(y))
                if xn and yn:
                    continue
                if xn != yn or not cells_equal(x, y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"FAIL    {name}: col={c} row={i} spark={x!r} duck={y!r}")
            n_fail += 1
        else:
            print(f"PASS    {name} ({len(spark_df)} rows)")
            n_pass += 1
    # queries without an oracle -> rows-only smoke
    for d in sorted(out.iterdir()):
        if d.is_dir() and d.name not in oracle:
            n = len(con.sql(f"SELECT * FROM '{d}/*.parquet'").df())
            print(f"ROWS    {d.name}: {n} rows (no oracle)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local dev mirror of the driver's correctness gate — DRIVER-STRICT.

Usage:  python3 tools/localverify.py <outDir> <sfDir> [--negctl <name>]
  where <outDir> was produced by `sbt "runMain graft.Verify <sfDir> <outDir>"`.

For each <outDir>/<name> parquet result: run <outDir>/oracle_sql.json[name]
in DuckDB with the sf tables registered as views, canonicalize BOTH sides
(columns sorted by name, rows sorted by canonical cell strings), and compare
a sha256 over the canonical cells. Strictness contract (r12 — the r11
pandas version float-coerced DECIMALs, which masked the ev_rfm class):

  * results are fetched as Arrow, never pandas — DECIMAL stays Decimal,
    never a lossy float64;
  * decimals compare as exact strings (scale included: 30.750000 at
    DECIMAL(38,6) != 30.75 at DECIMAL(18,2), same as the driver's hash);
  * doubles/floats compare BITWISE (struct.pack '>d'), so a last-ulp
    divergence fails here exactly as it fails there; NaN canonicalizes to
    one token, -0.0 stays distinct from 0.0;
  * every query prints its canonical hash for both engines.

--negctl <name> deliberately corrupts the named query's Spark-side first
cell before hashing — the negative control proving the comparator can see
a single-cell divergence (expected output: exactly one FAIL).

This is dev tooling only — the shipped engine is the Scala library (no
Python/duckdb dependency).
"""
import decimal
import hashlib
import json
import math
import struct
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_cell(v):
    """Canonical string for one cell. Exact for decimals, bitwise for
    floats, recursive for arrays/structs — a difference the driver's hash
    can see must change this string."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return "f:" + struct.pack(">d", v).hex()
    if isinstance(v, decimal.Decimal):
        return "d:" + str(v)
    if isinstance(v, int):
        return "i:" + str(v)
    if isinstance(v, (bytes, bytearray)):
        return "b:" + bytes(v).hex()
    if isinstance(v, list):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={canon_cell(v[k])}" for k in sorted(v)) + "}"
    return "s:" + str(v)


def canon_table(arrow_tbl):
    """-> (sorted column names, row-sorted list of canonical-string rows)."""
    cols = sorted(arrow_tbl.column_names)
    pyl = arrow_tbl.select(cols).to_pylist()
    rows = sorted(tuple(canon_cell(r[c]) for c in cols) for r in pyl)
    return cols, rows


def table_hash(cols, rows):
    h = hashlib.sha256()
    h.update("".join(cols).encode())
    for r in rows:
        h.update(b"\x02")
        h.update("".join(r).encode())
    return h.hexdigest()[:16]


def first_diff(cols, a_rows, b_rows):
    for i, (ra, rb) in enumerate(zip(a_rows, b_rows)):
        for c, x, y in zip(cols, ra, rb):
            if x != y:
                return i, c, x, y
    return None


def main(argv):
    out_dir, sf_dir = argv[0], argv[1]
    negctl = argv[argv.index("--negctl") + 1] if "--negctl" in argv else None
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
            s_tbl = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").arrow()
            d_tbl = con.sql(oracle[name]).arrow()
        except Exception as e:
            print(f"ERROR   {name}: {e}")
            n_fail += 1
            continue
        s_cols, s_rows = canon_table(s_tbl)
        d_cols, d_rows = canon_table(d_tbl)
        if negctl == name and s_rows:
            r0 = list(s_rows[0])
            r0[0] = r0[0] + "☢"  # corrupt one cell: the negative control
            s_rows[0] = tuple(r0)
        if s_cols != d_cols:
            print(f"FAIL    {name}: columns {s_cols} vs {d_cols}")
            n_fail += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL    {name}: rows {len(s_rows)} vs {len(d_rows)}")
            n_fail += 1
            continue
        sh, dh = table_hash(s_cols, s_rows), table_hash(d_cols, d_rows)
        if sh != dh:
            i, c, x, y = first_diff(s_cols, s_rows, d_rows)
            print(f"FAIL    {name}: hash {sh} vs {dh}; first diff col={c} "
                  f"row={i} spark={x!r} duck={y!r}")
            n_fail += 1
        else:
            print(f"PASS    {name} ({len(s_rows)} rows, hash {sh})")
            n_pass += 1
    # queries without an oracle -> rows-only smoke
    for d in sorted(out.iterdir()):
        if d.is_dir() and d.name not in oracle:
            n = con.sql(f"SELECT COUNT(*) FROM '{d}/*.parquet'").fetchone()[0]
            print(f"ROWS    {d.name}: {n} rows (no oracle)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

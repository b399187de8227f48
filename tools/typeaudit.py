#!/usr/bin/env python3
"""Gate-output type-convention audit (dev tooling, driver-independent).

Convention (VERDICT r8 #3, adopted round 9): every correctness-gate query
emits ONLY these column types:

    BIGINT (int64) | DOUBLE (float64) | DECIMAL(p, s<=6) | STRING | BOOLEAN
    | DATE | TIMESTAMP

Rationale: the r7/r8 red-row saga (`tx_token_entropy`) was isolated to a
DECIMAL(20,7) output column — the battery's only scale-7 emission — after
the arithmetic was proven engine-identical. Wide-scale decimals are the one
representation with engine-variant rendering/hash behavior in the driver's
compare; integers, doubles produced by a single exact-quotient, and
scale<=6 decimals have a single cross-engine representation in practice
(every passing query uses them).

Usage:  python3 tools/typeaudit.py <verifyOutDir>
  where <verifyOutDir> was produced by `sbt "runMain graft.Verify ..."`.

Prints one line per violating column; exits 0 iff the battery conforms.
"""
import json
import sys
from pathlib import Path

import pyarrow.parquet as pq
import pyarrow as pa


ALLOWED = {"int64", "double", "string", "large_string", "bool",
           "date32[day]", "int32"}


def col_ok(t: pa.DataType) -> bool:
    s = str(t)
    if s in ALLOWED:
        return True
    if pa.types.is_timestamp(t):
        return True
    if pa.types.is_decimal(t):
        return t.scale <= 6
    return False


def main(out_dir):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    names = sorted(d.name for d in out.iterdir()
                   if d.is_dir() and (d / "_SUCCESS").exists())
    bad = 0
    n_cols = 0
    for name in names:
        files = list((out / name).glob("*.parquet"))
        if not files:
            continue
        schema = pq.read_schema(files[0])
        for field in schema:
            n_cols += 1
            if not col_ok(field.type):
                bad += 1
                print(f"VIOLATION {name}.{field.name}: {field.type}")
    print(f"== {len(names)} queries ({len(oracle)} oracled), "
          f"{n_cols} output columns, {bad} violations ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))

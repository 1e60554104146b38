#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
For each <outDir>/<name> parquet result, runs <outDir>/oracle_sql.json's
SQL in DuckDB over the sfDir tables and compares: columns sorted by
name, rows sorted, values compared exactly (floats to 1e-12 rel).
Dev-only tool; the real gate is driver-side.
"""
import json, sys, math
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def values_equal(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return abs(a - b) <= 1e-12 * max(abs(a), abs(b), 1.0)
    return str(a) == str(b)

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name in sorted(oracle):
        res_path = out_dir / name
        if not res_path.exists():
            print(f"FAIL {name}: no spark result written")
            failures += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{res_path}/*.parquet')").df()
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        got = got.reindex(sorted(got.columns, key=str.lower), axis=1)
        want = want.reindex(sorted(want.columns, key=str.lower), axis=1)
        if [c.lower() for c in got.columns] != [c.lower() for c in want.columns]:
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                a, b = got[c].iloc[i], want[c].iloc[i]
                anull = a is None or (isinstance(a, float) and math.isnan(a))
                bnull = b is None or (isinstance(b, float) and math.isnan(b))
                try:
                    import pandas as pd
                    anull = bool(pd.isna(a)) if not isinstance(a, (list, tuple)) else False
                    bnull = bool(pd.isna(b)) if not isinstance(b, (list, tuple)) else False
                except Exception:
                    pass
                if anull and bnull:
                    continue
                if anull != bnull or not values_equal(a, b):
                    bad = (i, c, a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} oracle={b!r}")
            failures += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    sys.exit(1 if failures else 0)

main()

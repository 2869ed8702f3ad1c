#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (NOT part of the library).

Usage: python scripts/check.py [sf_dir] [out_dir] [--skip-verify]

1. Runs `sbt "runMain graft.Verify <sf_dir> <out_dir>"` (unless --skip-verify).
2. For each query result parquet, runs the matching oracle SQL in DuckDB over
   views of the same testdata parquet tables, and compares:
   column names (sorted), row count, and exact cell values after sorting rows.
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and format stably
        if v == 0:
            return "0"
        return repr(v)
    return str(v)

def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/graft_verify"
    if "--skip-verify" not in sys.argv:
        import shutil
        shutil.rmtree(out_dir, ignore_errors=True)
        r = subprocess.run(
            ["sbt", f'runMain graft.Verify {sf_dir} {out_dir}'],
            cwd="/root/repo", capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-4000:]); print(r.stderr[-4000:])
            sys.exit(1)
        for line in r.stderr.splitlines():
            if "[verify]" in line:
                print(line)
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    results = {}
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got.fetchall())}"
            continue
        try:
            exp = con.sql(oracle[name])
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            results[name] = f"SCHEMA_MISMATCH spark={gcols} oracle={ecols}"
            continue
        grows = sorted([tuple(norm(v) for v in r) for r in
                        got.select(", ".join(f'"{c}"' for c in gcols)).fetchall()])
        erows = sorted([tuple(norm(v) for v in r) for r in
                        exp.select(", ".join(f'"{c}"' for c in ecols)).fetchall()])
        if len(grows) != len(erows):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(grows)} oracle={len(erows)}"
            continue
        if grows != erows:
            bad = [(g, e) for g, e in zip(grows, erows) if g != e][:3]
            results[name] = f"VALUE_MISMATCH ({sum(1 for g,e in zip(grows,erows) if g!=e)}/{len(grows)} rows) e.g. {bad}"
            continue
        results[name] = f"OK rows={len(grows)}"
    npass = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("ROWS_ONLY"))
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v.startswith('OK') or v.startswith('ROWS_ONLY') else 'FAIL'} {k}: {v}")
    print(f"== {npass}/{len(results)} pass")
    sys.exit(0 if npass == len(results) else 2)

main()

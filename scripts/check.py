#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (NOT part of the library).

Usage: python scripts/check.py [sf_dir] [out_dir] [--skip-verify] [--only=q1,q2]

Faithful to the driver harness (CORRECTNESS_r01.json semantics):
1. Runs `sbt "runMain graft.Verify <sf_dir> <out_dir>"` (unless --skip-verify).
2. Loads BOTH the Spark result parquet and the DuckDB oracle result into
   *pandas* frames, sorts columns by name, `sort_values` over all columns
   (this raises TypeError on ARRAY columns, exactly like the driver), and
   compares rendered cell values. DuckDB HUGEINT results become float64 in
   pandas and render "9.0" vs Spark's "9" — a real driver mismatch this
   script must reproduce, so values are rendered from the pandas dtypes.
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if type(v).__module__ == "numpy" and hasattr(v, "item"):
        v = v.item()  # numpy scalar -> python (repr of np.float64 differs)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return repr(v)
    return str(v)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/graft_verify"
    only = None
    for i, a in enumerate(sys.argv[1:]):
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
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
    # spill OUTSIDE the work tree: DuckDB's default temp_directory is
    # cwd-relative .tmp, and an 8.5 GB spill file got committed in r11
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
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
        if only and name not in only:
            continue
        try:
            gdf = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        except Exception as e:
            results[name] = f"SPARK_READ_ERROR {e}"
            continue
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(gdf)}"
            continue
        try:
            edf = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        gcols, ecols = sorted(gdf.columns), sorted(edf.columns)
        if gcols != ecols:
            results[name] = f"SCHEMA_MISMATCH spark={gcols} oracle={ecols}"
            continue
        # driver-faithful: pandas sort_values over every column (raises
        # TypeError: unhashable type on ARRAY cells — a real driver ERR)
        try:
            gdf = gdf[gcols].sort_values(by=gcols).reset_index(drop=True)
            edf = edf[ecols].sort_values(by=ecols).reset_index(drop=True)
        except Exception as e:
            results[name] = f"SORT_ERROR ({type(e).__name__}) {e}"
            continue
        if len(gdf) != len(edf):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(gdf)} oracle={len(edf)}"
            continue
        grows = [tuple(norm(v) for v in r) for r in gdf.itertuples(index=False)]
        erows = [tuple(norm(v) for v in r) for r in edf.itertuples(index=False)]
        if grows != erows:
            bad = [(g, e) for g, e in zip(grows, erows) if g != e][:3]
            nbad = sum(1 for g, e in zip(grows, erows) if g != e)
            results[name] = f"VALUE_MISMATCH ({nbad}/{len(grows)} rows) e.g. {bad}"
            continue
        results[name] = f"OK rows={len(grows)}"
    npass = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("ROWS_ONLY"))
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v.startswith('OK') or v.startswith('ROWS_ONLY') else 'FAIL'} {k}: {v}")
    print(f"== {npass}/{len(results)} pass")
    sys.exit(0 if npass == len(results) else 2)


main()

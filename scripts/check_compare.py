#!/usr/bin/env python3
"""Compare-only leg of scripts/check.py with a PER-ORACLE TIMEOUT and
incremental output — for big-sf sweeps where a handful of DuckDB oracles
(iterative CTEs, all-pairs) are super-linear in data size and would
otherwise stall the whole gate silently (round-11: one oracle burned 60+
CPU-minutes at sf1). A timed-out oracle is reported as ORACLE_TIMEOUT —
an explicitly-named exception, not a pass.

Usage: python scripts/check_compare.py <sf_dir> <out_dir> [timeout_sec] [--only=a,b]
"""
import json, math, sys, threading
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if type(v).__module__ == "numpy" and hasattr(v, "item"):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return repr(v)
    return str(v)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir, out_dir = args[0], args[1]
    timeout = float(args[2]) if len(args) > 2 else 180.0
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
    con = duckdb.connect()
    # spill OUTSIDE the work tree: DuckDB's default temp_directory is
    # cwd-relative .tmp, and an 8.5 GB spill file got committed in r11
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())

    def timed_sql(sql):
        """Run sql on a FRESH cursor; interrupt from a watchdog on timeout.

        The cursor (not the shared connection) is interrupted, so a timer
        that fires in the window between the result returning and
        timer.cancel() can never leak the interrupt into the NEXT oracle
        (which would be misreported as ORACLE_TIMEOUT). Returns
        (df, late): late=True means the result arrived but the budget was
        exceeded — callers must report that as a timeout, not a pass."""
        cur = con.cursor()
        fired = threading.Event()
        timer = threading.Timer(timeout, lambda: (fired.set(), cur.interrupt()))
        timer.start()
        try:
            return cur.sql(sql).df(), fired.is_set()
        finally:
            timer.cancel()
            cur.close()

    results = {}
    npass = 0
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
        else:
            if name not in oracle:
                results[name] = f"ROWS_ONLY rows={len(gdf)}"
            else:
                try:
                    edf, late = timed_sql(oracle[name])
                    if late:
                        results[name] = f"ORACLE_TIMEOUT >{timeout:.0f}s (completed late)"
                        edf = None
                except Exception as e:
                    interrupted = "INTERRUPT" in str(e).upper() or "interrupted" in str(e).lower()
                    results[name] = (f"ORACLE_TIMEOUT >{timeout:.0f}s" if interrupted
                                     else f"ORACLE_SQL_ERROR {e}")
                    edf = None
                if edf is not None:
                    gcols, ecols = sorted(gdf.columns), sorted(edf.columns)
                    if gcols != ecols:
                        results[name] = f"SCHEMA_MISMATCH spark={gcols} oracle={ecols}"
                    else:
                        try:
                            gdf = gdf[gcols].sort_values(by=gcols).reset_index(drop=True)
                            edf = edf[ecols].sort_values(by=ecols).reset_index(drop=True)
                            if len(gdf) != len(edf):
                                results[name] = f"ROWCOUNT_MISMATCH spark={len(gdf)} oracle={len(edf)}"
                            else:
                                # vectorized per-column compare with the SAME
                                # semantics as check.py's norm()-tuple loop
                                # (which is O(rows) pure python — minutes per
                                # multi-million-row sf1 result): float cols
                                # bit-compare with NaN==NaN and +0==-0, any
                                # dtype disagreement falls back to norm()
                                # strings so HUGEINT-float renders still
                                # mismatch exactly like the driver
                                bad_col = None
                                for c in gcols:
                                    a, b = gdf[c], edf[c]
                                    if a.dtype.kind == "f" and b.dtype.kind == "f":
                                        ok_col = bool(((a == b) | (a.isna() & b.isna())).all())
                                    elif a.dtype == b.dtype and a.dtype.kind in "iub":
                                        ok_col = a.equals(b)
                                    else:
                                        ok_col = a.map(norm).equals(b.map(norm))
                                    if not ok_col:
                                        bad_col = c
                                        break
                                if bad_col is not None:
                                    a = gdf[bad_col].map(norm)
                                    b = edf[bad_col].map(norm)
                                    mism = a != b
                                    ex = [(x, y) for x, y in
                                          zip(a[mism].head(2), b[mism].head(2))]
                                    results[name] = (f"VALUE_MISMATCH col={bad_col} "
                                                     f"({int(mism.sum())}/{len(a)} rows) e.g. {ex}")
                                else:
                                    results[name] = f"OK rows={len(gdf)}"
                        except Exception as e:
                            results[name] = f"SORT_ERROR ({type(e).__name__}) {e}"
        v = results[name]
        ok = v.startswith("OK") or v.startswith("ROWS_ONLY")
        npass += 1 if ok else 0
        print(f"{'PASS' if ok else 'FAIL'} {name}: {v}", flush=True)
    print(f"== {npass}/{len(results)} pass", flush=True)
    sys.exit(0 if npass == len(results) else 2)


main()

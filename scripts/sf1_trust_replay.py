#!/usr/bin/env python3
"""Resumable exact sf1 replay for stat_trustworthiness_batched (VERDICT r13 item 3).

The r13 DuckDB flat-lane replay is exact but its inequality join
(a.id <> b.id) plans as a SINGLE-THREADED nested-loop in DuckDB — 85 min
at sf1 without finishing. This replay computes the IDENTICAL number in
numpy with the SAME IEEE-754 operation order, chunked over anchors, each
chunk's penalty persisted to a state file so the run is resumable across
sessions, and parallelized over processes.

Exactness argument (why this is the same number, not an approximation):
  - d_orig = ((a.f1-b.f1)^2 + (a.f2-b.f2)^2) + ... is a LEFT-ASSOCIATED
    flat sum of 64 double lanes in the SQL replay. Here: acc = t1;
    acc += t_l for l = 2..64, each t_l = (a_l-b_l)*(a_l-b_l) an
    elementwise float64 op. numpy elementwise ops are plain IEEE double
    ops (no FMA fusion, no reassociation), so every element of acc is
    bit-identical to the SQL fold. Same for the 8-lane d_emb.
  - top-5 per anchor by (d_emb, j) lexicographic = the SQL
    row_number() OVER (ORDER BY d_emb, b.id) <= 5.
  - r_orig = 1 + #{j != i : (d_orig[j], j) < (d_orig[s], s_j)} — integer
    counts of exact double comparisons, associativity-free.
  - sum(greatest(r_orig-5, 0)) is an integer sum, exact.
  - The final float expression AND round(.., 6) are evaluated in DuckDB
    itself with n and S as literals, so rounding semantics are DuckDB's
    own (identical to the shipped oracle's final SELECT).

Usage: python scripts/sf1_trust_replay.py <sf_dir> <spark_dump_dir> [state_dir]
  <spark_dump_dir> must contain stat_trustworthiness_batched/*.parquet
  (a Verify dump). state_dir defaults to /tmp/sf1_trust_state_<basename>.
Exits 0 on PASS, 1 on FAIL, 2 if chunks remain (never happens unless
interrupted — rerun to resume).
"""
import json
import multiprocessing as mp
import os
import sys
from pathlib import Path

import duckdb
import numpy as np

K = 5
EMB_LANES = 8
CHUNK = 2000

# globals shared with forked workers (copy-on-write)
_F = None  # n x 64 float64, original space
_E = None  # n x 8  float64, embedded space (first 8 lanes)


def _load(sf_dir):
    con = duckdb.connect()
    rows = con.sql(
        "SELECT vec_id, list_transform(embedding, f -> CAST(f AS DOUBLE)) "
        f"FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    # the SQL replay's el table is keyed by vec_id directly; dense ids
    # 0..n-1 let us use row index == id (assert, don't assume)
    assert (ids == np.arange(len(ids))).all(), "vec_id not dense 0..n-1"
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    assert mat.shape[1] == 64
    return mat


def _pair_dist(block, full, lanes):
    """Left-associated lane sum, bit-identical to SQL t1+t2+...+tn."""
    d = block[:, 0:1] - full[:, 0]
    acc = d * d
    for l in range(1, lanes):
        d = block[:, l : l + 1] - full[:, l]
        acc += d * d
    return acc


def _chunk_penalty(args):
    lo, hi = args
    F, E = _F, _E
    n = F.shape[0]
    de = _pair_dist(E[lo:hi], E, EMB_LANES)
    do = _pair_dist(F[lo:hi], F, 64)
    rows = hi - lo
    idx = np.arange(lo, hi)
    de[np.arange(rows), idx] = np.inf  # exclude j == i
    do[np.arange(rows), idx] = np.inf
    penalty = 0
    jcol = np.arange(n)
    for r in range(rows):
        order = np.lexsort((jcol, de[r]))[:K]  # top-K by (d_emb, j)
        dr = do[r]
        for s_j in order:
            ds = dr[s_j]
            r_orig = 1 + int(np.count_nonzero(dr < ds)) + int(
                np.count_nonzero((dr == ds) & (jcol < s_j)))
            if r_orig > K:
                penalty += r_orig - K
    return lo, hi, penalty


def main():
    sf_dir = sys.argv[1]
    dump_dir = sys.argv[2]
    state_dir = Path(sys.argv[3] if len(sys.argv) > 3 else
                     f"/tmp/sf1_trust_state_{Path(sf_dir).name}")
    state_dir.mkdir(parents=True, exist_ok=True)

    global _F, _E
    _F = _load(sf_dir)
    _E = np.ascontiguousarray(_F[:, :EMB_LANES])
    n = _F.shape[0]

    todo = []
    for lo in range(0, n, CHUNK):
        hi = min(lo + CHUNK, n)
        if not (state_dir / f"chunk_{lo}_{hi}.json").exists():
            todo.append((lo, hi))
    total_chunks = (n + CHUNK - 1) // CHUNK
    print(f"[trust] n={n} chunks={total_chunks} todo={len(todo)} "
          f"state={state_dir}", flush=True)

    if todo:
        procs = min(len(todo), max(1, (os.cpu_count() or 8) // 2))
        with mp.Pool(procs) as pool:
            for lo, hi, pen in pool.imap_unordered(_chunk_penalty, todo):
                tmp = state_dir / f".chunk_{lo}_{hi}.tmp"
                tmp.write_text(json.dumps({"lo": lo, "hi": hi, "penalty": pen}))
                tmp.rename(state_dir / f"chunk_{lo}_{hi}.json")  # atomic
                print(f"[trust] chunk {lo}:{hi} penalty={pen}", flush=True)

    files = sorted(state_dir.glob("chunk_*.json"))
    if len(files) != total_chunks:
        print(f"[trust] INCOMPLETE: {len(files)}/{total_chunks} chunks")
        sys.exit(2)
    S = sum(json.loads(f.read_text())["penalty"] for f in files)

    # final expression + round in DuckDB — same semantics as the oracle SQL
    con = duckdb.connect()
    got = con.sql(
        f"SELECT round(1.0 - (2.0 / (CAST({n} AS DOUBLE) * {K} "
        f"* (2 * CAST({n} AS DOUBLE) - 3 * {K} - 1))) * {S}, 6)").fetchone()[0]
    want = con.sql(
        f"SELECT * FROM '{dump_dir}/stat_trustworthiness_batched/*.parquet'"
    ).fetchone()[0]
    ok = got == want
    print(f"{'PASS' if ok else 'FAIL'} stat_trustworthiness_batched/"
          f"numpy-lane-exact-replay: {got} vs spark {want} (S={S}, n={n})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

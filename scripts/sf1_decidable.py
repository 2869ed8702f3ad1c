#!/usr/bin/env python3
"""Decidable sf1 oracles for the ORACLE_TIMEOUT rows (VERDICT r12 item 4).

The three quadratic-replay oracles (pipe_embed_neardup, pipe_embed_neardup_lsh,
pipe_contamination_cosine) time out at sf1 because DuckDB re-folds 1e8+ pair
lanes. This script replaces each with TWO exact, tractable legs:

  SOUNDNESS  — every Spark-reported row is re-derived exactly in DuckDB:
               the pair's value is recomputed from the base tables, the
               threshold re-checked, the rounded display value compared.
               Cost: |result| pairs, not |domain|^2.
  COMPLETENESS — the oracle is replayed EXACTLY (same SQL semantics,
               zero approximation) on the deterministic id-sample
               subproblem (vec_id % 8 = 0 for the embedding pair queries;
               eval doc_id % 16 = 0 for decontamination — the sampled
               subproblem's true answer is the full answer filtered by
               the same predicate, because per-row derivations (unit
               vectors, buckets, tf-idf weights over the FULL corpus)
               do not depend on which OTHER rows are queried), then
               compared cell-for-cell (EXCEPT in both directions) against
               the Spark result under the identical filter.

Both legs are exact: a false pair anywhere in the Spark output fails
soundness; a missing pair inside the sample fails completeness. The only
relaxation vs the full oracle is that misses OUTSIDE the sample are not
observed — the sample covers 1/64 of pairs (1/16 of eval docs) chosen by
a fixed modulus, not by the data.

Usage: python scripts/sf1_decidable.py <sf_dir> <out_dir>
Expects <out_dir>/<query>/*.parquet Spark dumps (Verify with
SPARK_GRAFT_ONLY=... first). Exits nonzero on any failed leg.
"""
import sys
from pathlib import Path

import duckdb

TABLES = "documents embeddings".split()

FOLD_DOT = ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            "list_transform(list_zip({a}, {b}), p -> p[1] * p[2])), (s, x) -> s + x)")
FOLD_SQ = ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
           "list_transform({a}, x -> x * x)), (s, x) -> s + x)")


def fold_dot(a, b):
    return FOLD_DOT.format(a=a, b=b)


def fold_sq(a):
    return FOLD_SQ.format(a=a)


def v_cte(where=""):
    return ("v AS (SELECT vec_id AS id, "
            "list_transform(embedding, f -> CAST(f AS DOUBLE)) AS vec "
            f"FROM embeddings {where})")


UN_CTE = ("un AS (SELECT id, CASE WHEN sqrt(" + fold_sq("vec") + ") <> 0.0 "
          "THEN list_transform(vec, x -> x / sqrt(" + fold_sq("vec") + ")) "
          "ELSE vec END AS uv FROM v)")


def hp_lane(h, seed):
    return ("((CAST(('0x' || substr(md5(concat_ws(':', {h}, j, {seed}, 'hp')), 1, 8)) "
            "AS BIGINT) + 0.5) / 4294967296.0 - 0.5)").format(h=h, seed=seed)


def bucket_expr(seed):
    parts = []
    for h in range(4):
        parts.append(
            "(CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"[vec[j+1] * {hp_lane(h, seed)} FOR j IN range(64)]), (s, x) -> s + x) >= 0.0 "
            f"THEN {1 << h} ELSE 0 END)")
    return " + ".join(parts)


BUCKET_CTE = "b AS (SELECT id, vec, " + ", ".join(
    f"{bucket_expr(11 + t * 1000)} AS b{t}" for t in range(4)) + " FROM v)"

TOK_CTE = ("toks AS (SELECT doc_id, "
           "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS tokens "
           "FROM documents), "
           "td AS (SELECT doc_id, t.term, CAST(count(*) AS DOUBLE) AS tf "
           "FROM toks, unnest(toks.tokens) AS t(term) GROUP BY doc_id, t.term)")

TFIDF_CTE = (TOK_CTE + ", "
             "df AS (SELECT term, count(*) AS df FROM td GROUP BY term), "
             "n AS (SELECT count(DISTINCT doc_id) AS n FROM td), "
             "w AS (SELECT td.doc_id, td.term, "
             "round(ln(td.tf) * ln(CAST(n.n AS DOUBLE)/df.df + 1.0), 6) AS w "
             "FROM td, df, n WHERE td.term = df.term), "
             "wz AS (SELECT * FROM w WHERE w <> 0), "
             "nrm AS (SELECT doc_id, sqrt(sum(w*w)) AS nrm FROM wz GROUP BY doc_id), "
             "u AS (SELECT wz.doc_id, wz.term, wz.w/nrm.nrm AS u "
             "FROM wz JOIN nrm USING (doc_id))")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{Path(sf_dir) / (t + '.parquet')}'")
    for q in ("pipe_embed_neardup", "pipe_embed_neardup_lsh", "pipe_contamination_cosine"):
        con.execute(f"CREATE VIEW sp_{q.split('pipe_')[1]} AS SELECT * FROM '{Path(out_dir) / q}/*.parquet'")

    failures = []

    def leg(name, sql, describe):
        n = con.sql(sql).fetchone()[0]
        ok = n == 0
        print(f"{'PASS' if ok else 'FAIL'} {name}: {describe} -> {n} bad rows")
        if not ok:
            failures.append(name)

    # ---- pipe_embed_neardup ----
    dot = fold_dot("ua.uv", "ub.uv")
    leg("pipe_embed_neardup/soundness", f"""
        WITH {v_cte()}, {UN_CTE}
        SELECT count(*) FROM sp_embed_neardup sp
        JOIN un ua ON ua.id = sp.a JOIN un ub ON ub.id = sp.b
        WHERE NOT (sp.a < sp.b AND {dot} >= 0.45 AND round({dot}, 4) = sp.cos)
        """, "every reported pair recomputed exactly, threshold + rounding")
    leg("pipe_embed_neardup/completeness", f"""
        WITH {v_cte('WHERE vec_id % 8 = 0')}, {UN_CTE},
        oracle AS (
          SELECT ua.id AS a, ub.id AS b, round({dot}, 4) AS cos
          FROM un ua JOIN un ub ON ua.id < ub.id
          WHERE {dot} >= 0.45),
        spf AS (SELECT a, b, cos FROM sp_embed_neardup WHERE a % 8 = 0 AND b % 8 = 0)
        SELECT (SELECT count(*) FROM (SELECT * FROM oracle EXCEPT SELECT * FROM spf))
             + (SELECT count(*) FROM (SELECT * FROM spf EXCEPT SELECT * FROM oracle))
        """, "exact replay on the vec_id%8 subproblem, both-direction EXCEPT")

    # ---- pipe_embed_neardup_lsh ----
    any_bucket = " OR ".join(f"ba.b{t} = bb.b{t}" for t in range(4))
    leg("pipe_embed_neardup_lsh/soundness", f"""
        WITH {v_cte()}, {UN_CTE}, {BUCKET_CTE}
        SELECT count(*) FROM sp_embed_neardup_lsh sp
        JOIN un ua ON ua.id = sp.a JOIN un ub ON ub.id = sp.b
        JOIN b ba ON ba.id = sp.a JOIN b bb ON bb.id = sp.b
        WHERE NOT (sp.a < sp.b AND ({any_bucket})
                   AND {dot} >= 0.45 AND round({dot}, 4) = sp.cos)
        """, "reported pairs: shared-bucket candidacy + exact cosine")
    leg("pipe_embed_neardup_lsh/completeness", f"""
        WITH {v_cte('WHERE vec_id % 8 = 0')}, {UN_CTE}, {BUCKET_CTE},
        cand AS (
          SELECT DISTINCT ba.id AS a, bb.id AS b
          FROM b ba JOIN b bb ON ba.id < bb.id AND ({any_bucket})),
        oracle AS (
          SELECT c.a, c.b, round({dot}, 4) AS cos
          FROM cand c JOIN un ua ON ua.id = c.a JOIN un ub ON ub.id = c.b
          WHERE {dot} >= 0.45),
        spf AS (SELECT a, b, cos FROM sp_embed_neardup_lsh WHERE a % 8 = 0 AND b % 8 = 0)
        SELECT (SELECT count(*) FROM (SELECT * FROM oracle EXCEPT SELECT * FROM spf))
             + (SELECT count(*) FROM (SELECT * FROM spf EXCEPT SELECT * FROM oracle))
        """, "bucket replay + exact cosine on the vec_id%8 subproblem")

    # ---- pipe_contamination_cosine ----
    leg("pipe_contamination_cosine/soundness", f"""
        WITH {TFIDF_CTE},
        rep AS (SELECT doc_a, doc_b, sim FROM sp_contamination_cosine),
        rec AS (
          SELECT r.doc_a, r.doc_b, r.sim, sum(a.u * b.u) AS raw
          FROM rep r
          JOIN u a ON a.doc_id = r.doc_a
          JOIN u b ON b.doc_id = r.doc_b AND b.term = a.term
          JOIN documents da ON da.doc_id = r.doc_a
          JOIN documents db ON db.doc_id = r.doc_b
          WHERE da.source = 'src1' AND db.source <> 'src1'
          GROUP BY 1, 2, 3)
        SELECT (SELECT count(*) FROM rec
                WHERE NOT (raw >= 0.8 AND round(raw, 4) = sim))
             + (SELECT count(*) FROM rep) - (SELECT count(*) FROM rec)
        """, "reported pairs: eval/train sides + exact tf-idf cosine")
    leg("pipe_contamination_cosine/completeness", f"""
        WITH {TFIDF_CTE},
        ue AS (SELECT u.* FROM u JOIN documents d ON d.doc_id = u.doc_id
               WHERE d.source = 'src1' AND d.doc_id % 16 = 0),
        ut AS (SELECT u.* FROM u JOIN documents d ON d.doc_id = u.doc_id
               WHERE d.source <> 'src1'),
        oracle AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, round(sum(a.u*b.u), 4) AS sim
          FROM ue a JOIN ut b ON a.term = b.term
          GROUP BY 1, 2 HAVING sum(a.u*b.u) >= 0.8),
        spf AS (SELECT doc_a, doc_b, sim FROM sp_contamination_cosine WHERE doc_a % 16 = 0)
        SELECT (SELECT count(*) FROM (SELECT * FROM oracle EXCEPT SELECT * FROM spf))
             + (SELECT count(*) FROM (SELECT * FROM spf EXCEPT SELECT * FROM oracle))
        """, "full oracle replay for eval doc_id%16, both-direction EXCEPT")

    # ---- stat_trustworthiness_batched: FAST EXACT replay ----
    # The shipped oracle materializes all n(n-1) pairs with LIST-lambda
    # folds (72 lanes) plus two full windows — quadratic in DuckDB's
    # slowest evaluation tier, and past the watchdog at sf1 even alone.
    # This replay computes the IDENTICAL number (same strict left-add
    # association per distance, same row_number tie-breaks) with the lanes
    # flattened to scalar columns (DuckDB's vectorized arithmetic tier):
    #   stage 1: one window over (i, j, d_emb) triples -> the k=5
    #            embedding-nearest per anchor, with their exact d_orig;
    #   stage 2: r_orig by a counting join — every pair's flat d_orig
    #            streams against its anchor's <=5 selected rows, no
    #            materialization, no second window.
    # Exact, full (no sampling): x1+x2+...+xn in SQL is left-associated,
    # so each flat sum is bit-equal to the list_reduce fold it replaces.
    k = 5
    d_emb = " + ".join(f"(a.e{l} - b.e{l}) * (a.e{l} - b.e{l})" for l in range(1, 9))
    d_orig = " + ".join(f"(a.f{l} - b.f{l}) * (a.f{l} - b.f{l})" for l in range(1, 65))
    el_cols = ", ".join(
        [f"CAST(embedding[{l}] AS DOUBLE) AS f{l}" for l in range(1, 65)] +
        [f"CAST(embedding[{l}] AS DOUBLE) AS e{l}" for l in range(1, 9)])
    con.execute(f"CREATE TEMP TABLE el AS SELECT vec_id AS id, {el_cols} FROM embeddings")
    n_rows, id_max = con.sql("SELECT count(*), max(id) FROM el").fetchone()
    # anchors processed in chunks so no single window/sort ever holds more
    # than ~chunk×n pairs (the one-shot 4e8-row window sort SPILLS and goes
    # latency-bound; chunked, every sort is in-memory and parallel)
    chunk = max(1, 40_000_000 // max(1, int(n_rows)))
    con.execute("CREATE TEMP TABLE sel (i BIGINT, j BIGINT, d_orig DOUBLE)")
    con.execute("CREATE TEMP TABLE pen (i BIGINT, j BIGINT, r_orig BIGINT)")
    lo = 0
    while lo <= id_max:
        hi = lo + chunk
        con.execute(f"""
            INSERT INTO sel
            SELECT i, j, d_orig FROM (
              SELECT a.id AS i, b.id AS j, ({d_orig}) AS d_orig,
                     row_number() OVER (PARTITION BY a.id
                                        ORDER BY ({d_emb}), b.id) AS r_emb
              FROM el a JOIN el b ON a.id <> b.id
              WHERE a.id >= {lo} AND a.id < {hi})
            WHERE r_emb <= {k}""")
        con.execute(f"""
            INSERT INTO pen
            SELECT s.i, s.j,
                   1 + count(*) FILTER (WHERE p.d_orig < s.d_orig
                                           OR (p.d_orig = s.d_orig AND p.j < s.j)) AS r_orig
            FROM (SELECT a.id AS i, b.id AS j, ({d_orig}) AS d_orig
                  FROM el a JOIN el b ON a.id <> b.id
                  WHERE a.id >= {lo} AND a.id < {hi}) p
            JOIN sel s ON p.i = s.i
            GROUP BY s.i, s.j""")
        lo = hi
    got = con.sql(f"""
        WITH nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM el)
        SELECT round(1.0 - (2.0 / (n * {k} * (2 * n - 3 * {k} - 1)))
                     * sum(greatest(r_orig - {k}, 0)), 6) AS trustworthiness
        FROM pen, nn GROUP BY n""").fetchone()[0]
    want_path = Path(out_dir) / "stat_trustworthiness_batched"
    if want_path.exists():
        want = con.sql(f"SELECT * FROM '{want_path}/*.parquet'").fetchone()[0]
        ok = got == want
        print(f"{'PASS' if ok else 'FAIL'} stat_trustworthiness_batched/fast-exact-replay: "
              f"flat-lane full replay {got} vs spark {want}")
        if not ok:
            failures.append("stat_trustworthiness_batched")
    else:
        print("SKIP stat_trustworthiness_batched: no spark dump in out_dir")

    if failures:
        print(f"== FAILURES: {failures}")
        sys.exit(1)
    print("== all decidable sf1 legs pass")


if __name__ == "__main__":
    main()

"""pytest for the graft PySpark bindings — the same oracle discipline as the
driver gate: every numeric assertion is either a closed-form value or an
independent DuckDB computation over the same parquet inputs.

Run:  cd /root/repo/python && python -m pytest tests/ -v
(needs the compiled classes at target/scala-2.13/classes)
"""
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from graft import (bm25, dot, eigsh, graft_session, knn_cosine,
                   minhash_dup_pairs, oracle_sql, query_names, run_query,
                   select_k, tfidf)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = graft_session()
    yield s


def test_query_surface_is_complete(spark):
    names = query_names(spark)
    assert len(names) >= 300
    assert "rel_rollup_revenue" in names and "solver_eigsh" in names


def test_run_query_matches_duckdb_oracle(spark):
    # same compare the driver does: run one oracle-backed query both ways
    name = "txt_tfidf"
    sql = oracle_sql(spark, name)
    assert sql, "txt_tfidf must have an oracle"
    got = run_query(spark, name, SF).toPandas()
    con = duckdb.connect()
    for t in ("documents", "embeddings", "lineitem", "orders"):
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    want = con.execute(sql).df()
    got = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
    want = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
    assert len(got) == len(want)
    for c in got.columns:
        a, b = got[c].tolist(), want[c].tolist()
        for x, y in zip(a, b):
            if isinstance(x, float):
                assert math.isclose(x, y, rel_tol=0, abs_tol=1e-9), (c, x, y)
            else:
                assert str(x) == str(y), (c, x, y)


def test_eigsh_chain_laplacian_closed_form(spark):
    # path-graph Laplacian spectrum is closed-form: 2 - 2cos(pi*j/n)
    n = 30
    rows = []
    for i in range(n):
        deg = (1 if i > 0 else 0) + (1 if i < n - 1 else 0)
        rows.append((i, i, float(deg)))
        if i > 0:
            rows.append((i, i - 1, -1.0))
            rows.append((i - 1, i, -1.0))
    coo = spark.createDataFrame(rows, "row long, col long, value double")
    got = [r.eig for r in eigsh(coo, n=n, k=3).orderBy("i").collect()]
    want = sorted(2.0 - 2.0 * math.cos(math.pi * j / n) for j in range(n))[:3]
    for g, w in zip(got, want):
        assert abs(g - w) < 1e-8, (got, want)


def test_select_k_matches_python(spark):
    df = spark.createDataFrame(
        [(0, [3.0, 1.0, 2.0, 9.0]), (1, [5.0, 5.0, 0.0, -1.0])],
        "id long, vec array<double>")
    got = {(r.id, r.rnk): (r.pos, r.v) for r in select_k(df, 2).collect()}
    # largest=True, ties by position ascending
    assert got[(0, 1)] == (3, 9.0) and got[(0, 2)] == (0, 3.0)
    assert got[(1, 1)] == (0, 5.0) and got[(1, 2)] == (1, 5.0)


def test_tfidf_weights_match_duckdb(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .selectExpr("doc_id", "text").limit(50)
    out = tfidf(docs)
    assert out.count() > 0
    assert set(out.columns) == {"doc_id", "term", "w"}
    # spot-check the formula on one (doc, term): w = ln(tf)*ln(N/df + 1)
    row = out.orderBy("doc_id", "term").first()
    pdf = docs.toPandas()
    import re
    tok = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in
           zip(pdf.doc_id, pdf.text)}
    tf = tok[row.doc_id].count(row.term)
    n_docs = len(tok)
    df_t = sum(1 for ts in tok.values() if row.term in ts)
    want = round(math.log(tf) * math.log(n_docs / df_t + 1.0), 6)
    assert abs(row.w - want) < 1e-9, (row, tf, n_docs, df_t, want)


def test_minhash_dup_pairs_finds_planted_dup(spark):
    texts = [(i, f"unique document number {i} about topic {i % 7} "
                 f"with some extra words {i * 13}") for i in range(40)]
    texts.append((100, texts[5][1]))  # exact copy of doc 5 -> certain dup
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    pairs = {(r.a, r.b) for r in
             minhash_dup_pairs(docs, 0.5).select("a", "b").collect()}
    assert (5, 100) in pairs or (100, 5) in pairs, pairs


def test_dot_expression_and_kernel(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame([(0, [1.0, 2.0]), (1, [3.0, 4.0])],
                               "id long, vec array<double>")
    w = F.array(F.lit(10.0), F.lit(100.0))
    got = {r.id: r.y for r in df.select("id", dot(F.col("vec"), w).alias("y")).collect()}
    assert got == {0: 210.0, 1: 430.0}


def test_knn_cosine_self_evident_neighbors(spark):
    # three axis vectors + one diagonal: nearest neighbor of the diagonal
    # (id 0) is whichever axis it leans toward
    df = spark.createDataFrame(
        [(0, [0.9, 0.1, 0.0]), (1, [1.0, 0.0, 0.0]),
         (2, [0.0, 1.0, 0.0]), (3, [0.0, 0.0, 1.0])],
        "id long, vec array<double>")
    top = knn_cosine(df, n_queries=1, k=1).collect()
    assert len(top) == 1 and top[0].qid == 0 and top[0].nid == 1

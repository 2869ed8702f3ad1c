#!/usr/bin/env python3
"""Generate a larger synthetic testdata directory with the SAME schemas and
value shapes as the driver's /root/testdata/sf* fixtures (scripts-only tool,
NOT part of the library; the driver's own data is read-only and stops at
sf0.1 — this exists so the correctness gate and bench can be exercised at
sf1 = 10x, VERDICT r10 item 4).

Everything is hash-deterministic (no RNG state): rerunning produces
byte-identical tables. The correctness gate compares Spark vs DuckDB on the
SAME parquet, so generated data is as oracle-valid as driver data; only the
distributions matter, and those mirror the sf0.1 measurements documented
inline.

Usage: python scripts/gen_sf.py [multiplier] [out_dir]
       python scripts/gen_sf.py 10 /tmp/graft_sf1     # sf1 (10x sf0.1)
"""
import sys
import duckdb

M = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
SRC = "/root/testdata/sf0.1"

N_CUST = int(15000 * M)
N_SUPP = int(1000 * M)
N_PART = int(20000 * M)
N_ORD = int(150000 * M)
N_LINE = int(600000 * M)
N_EVT = int(100000 * M)
N_DOC = int(5000 * M)
N_EMB = int(2000 * M)
N_USER = int(1500 * M)

con = duckdb.connect()
# spill OUTSIDE the work tree: DuckDB's default temp_directory is
# cwd-relative .tmp, and an 8.5 GB spill file got committed in r11
con.execute("SET temp_directory='/tmp/duckdb_spill'")
con.execute(f"SET threads TO 16")

import os
os.makedirs(OUT, exist_ok=True)


def u(key):  # deterministic uniform in [0,1) from a string-ish key
    return f"((hash({key}) % 1000000 + 1000000) % 1000000) / 1000000.0"


def copy(table, sql):
    con.execute(f"COPY ({sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows")


# dimension tables don't scale: copy verbatim
for t in ("region", "nation"):
    copy(t, f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')")

SEGS = "'AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY'"
copy("customer", f"""
SELECT i AS c_custkey,
  printf('Customer#%09d', i::INT) AS c_name,
  (hash(i, 'cn') % 25)::INTEGER AS c_nationkey,
  round({u("i, 'ca'")} * 10999.65 - 999.85, 2) AS c_acctbal,
  [{SEGS}][(hash(i, 'cs') % 5 + 1)::INT] AS c_mktsegment
FROM range({N_CUST}) t(i)""")

copy("supplier", f"""
SELECT i AS s_suppkey,
  printf('Supplier#%09d', i::INT) AS s_name,
  (hash(i, 'sn') % 25)::INTEGER AS s_nationkey,
  round({u("i, 'sa'")} * 10999.65 - 999.85, 2) AS s_acctbal
FROM range({N_SUPP}) t(i)""")

ADJ = "'large','hot','blue','red','green','small','cold','dark','light','shiny'"
NOUN = "'ring','bolt','gear','pipe','valve','wheel','screw','plate','rod','cap'"
PTYPE = "'ECONOMY','LARGE','STANDARD','MEDIUM','SMALL','PROMO'"
copy("part", f"""
SELECT i AS p_partkey,
  [{ADJ}][(hash(i, 'pa') % 10 + 1)::INT] || ' ' ||
    [{NOUN}][(hash(i, 'pn') % 10 + 1)::INT] AS p_name,
  'Brand#' || (hash(i, 'pb') % 20 + 1)::INT AS p_brand,
  [{PTYPE}][(hash(i, 'pt') % 6 + 1)::INT] AS p_type,
  (hash(i, 'ps') % 50 + 1)::INTEGER AS p_size,
  round(900.0 + {u("i, 'pr'")} * 99.9, 2) AS p_retailprice
FROM range({N_PART}) t(i)""")

PRIO = "'1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'"
# orderdate: day-granular uniform over 1995-01-01 .. 2001-08-01 (2404 days)
copy("orders", f"""
SELECT i AS o_orderkey,
  (hash(i, 'oc') % {N_CUST})::BIGINT AS o_custkey,
  ['O','P','F'][(hash(i, 'os') % 3 + 1)::INT] AS o_orderstatus,
  round(1001.91 + {u("i, 'ot'")} * 498991.27, 2) AS o_totalprice,
  TIMESTAMP '1995-01-01' + INTERVAL ((hash(i, 'od') % 2404)::INT) DAY AS o_orderdate,
  [{PRIO}][(hash(i, 'op') % 5 + 1)::INT] AS o_orderpriority
FROM range({N_ORD}) t(i)""")

# lineitem: orderkey = hash % N_ORD gives Poisson(4) lines/order like the
# source's 1..10 spread; linenumber = rank within the order
copy("lineitem", f"""
WITH base AS (
  SELECT i, (hash(i, 'lo') % {N_ORD})::BIGINT AS l_orderkey FROM range({N_LINE}) t(i))
SELECT l_orderkey,
  (hash(i, 'lp') % {N_PART})::BIGINT AS l_partkey,
  (hash(i, 'ls') % {N_SUPP})::BIGINT AS l_suppkey,
  (row_number() OVER (PARTITION BY l_orderkey ORDER BY i))::INTEGER AS l_linenumber,
  (hash(i, 'lq') % 50 + 1)::DOUBLE AS l_quantity,
  round(900.68 + {u("i, 'le'")} * 104099.23, 2) AS l_extendedprice,
  (hash(i, 'ld') % 11)::DOUBLE / 100.0 AS l_discount,
  (hash(i, 'lt') % 9)::DOUBLE / 100.0 AS l_tax,
  ['A','N','R'][(hash(i, 'lr') % 3 + 1)::INT] AS l_returnflag,
  ['O','F'][(hash(i, 'll') % 2 + 1)::INT] AS l_linestatus,
  TIMESTAMP '1995-01-01' + INTERVAL ((hash(i, 'od2') % 2404)::INT) DAY
    + INTERVAL ((hash(i, 'lsd') % 95 + 1)::INT) DAY AS l_shipdate
FROM base""")

# events: 30 days of 2024-01, 5 types, exp-ish value, {"k": n} props
copy("events", f"""
SELECT i AS event_id,
  TIMESTAMP '2024-01-01' + INTERVAL ((hash(i, 'ets') % 2591999)::INT) SECOND
    + INTERVAL ((hash(i, 'etu') % 1000000)::INT) MICROSECOND AS ts,
  (hash(i, 'eu') % {N_USER})::BIGINT AS user_id,
  ['view','click','purchase','signup','error'][(hash(i, 'et') % 5 + 1)::INT] AS event_type,
  round(least(-50.0 * ln(greatest({u("i, 'ev'")}, 1e-6)), 690.0), 2) AS value,
  '{{"k": ' || (hash(i, 'ek') % 100)::INT || '}}' AS props
FROM range({N_EVT}) t(i)""")

# documents: same 31-word vocabulary as the source corpus (extracted, not
# invented), 8..100 words per doc, ~0.16% planted exact duplicates, the
# source's language/source mix
vocab = [r[0] for r in con.execute(f"""
  SELECT DISTINCT unnest(string_split(text, ' ')) AS w
  FROM read_parquet('{SRC}/documents.parquet') ORDER BY 1""").fetchall() if r[0]]
vlist = ",".join(f"'{w}'" for w in vocab)
V = len(vocab)
copy("documents", f"""
WITH seeds AS (
  SELECT i, CASE WHEN i % 625 = 624 THEN i - 1 ELSE i END AS s
  FROM range({N_DOC}) t(i)),
texts AS (
  SELECT i, s, list_aggregate(
    [ [{vlist}][(hash(s, 'w', j, (hash(s,'skew',j) % 3)) % {V} + 1)::INT]
      FOR j IN range((hash(s, 'dl') % 93 + 8)::INT) ], 'string_agg', ' ') AS text
  FROM seeds)
SELECT i AS doc_id, text,
  ['en','en','en','en','es','de','fr','zh','es','de'][(hash(i, 'dg') % 10 + 1)::INT] AS lang,
  'src' || (hash(i, 'dsrc') % 20)::INT AS source,
  length(text)::BIGINT AS n_chars
FROM texts""")

# embeddings: 64-lane random unit vectors with RANDOM labels (the source
# data's same-label mean cosine is ~0.001 — labels are NOT geometric
# clusters) plus ~1.6% planted near-duplicate pairs (every 64th vector is
# a small perturbation of its predecessor — the source has a comparable
# handful of >=0.45-cosine pairs per 200 vectors)
copy("embeddings", f"""
WITH seeds AS (
  SELECT i, CASE WHEN i % 64 = 63 THEN i - 1 ELSE i END AS s,
    CASE WHEN i % 64 = 63 THEN 0.2 ELSE 0.0 END AS perturb
  FROM range({N_EMB}) t(i)),
raw AS (
  SELECT i, (hash(i, 'el') % 10)::INTEGER AS label,
    [sqrt(-2*ln(greatest({u("s, 'eg', j")}, 1e-9))) *
       cos(2*pi()*{u("s, 'eg2', j")})
     + perturb * sqrt(-2*ln(greatest({u("i, 'ep', j")}, 1e-9))) *
       cos(2*pi()*{u("i, 'ep2', j")}) FOR j IN range(64)] AS v
  FROM seeds),
normed AS (
  SELECT i, label, sqrt(list_sum([x*x FOR x IN v])) AS nrm, v FROM raw)
SELECT i AS vec_id,
  CAST([x / nrm FOR x IN v] AS FLOAT[]) AS embedding,
  label
FROM normed""")

print("done ->", OUT)

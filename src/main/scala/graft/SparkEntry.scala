package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is a deterministic DataFrame pipeline over the
  * testdata tables in `dir`; `oracleSql` holds the equivalent DuckDB SQL.
  * Column names are aliased identically on both sides (the driver sorts
  * columns by name before hashing). Float aggregates are rounded to a
  * declared precision inside the query (SURVEY.md §7 hard-parts policy).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.top3PerMktsegment(spark, "/root/testdata/sf0.001")

  private def groups: Seq[graft.queries.QueryGroup] = Seq(
    RelationalQueries, graft.queries.MatrixQueries, graft.queries.SparseTextQueries,
    graft.queries.StatsQueries, graft.queries.RandomLabelQueries,
    graft.queries.PipelineQueries, graft.queries.SolverQueries,
    graft.queries.DistanceQueries, graft.queries.MaskQueries)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(_.q).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.map(_.sql).reduce(_ ++ _)
}

private object RelationalQueries extends graft.queries.QueryGroup {
  /** Shared Morton-code CTE for the z-order oracles: min-max extremes,
    * integer grid scaling (floor division), magic-number bit spread. Ends
    * with `s4(l_partkey, l_suppkey, xd, yd)` where z = xd | (yd << 1). */
  val zorderCte: String =
    """WITH ext AS (
      |  SELECT CAST(min(l_partkey) AS BIGINT) AS pmin, CAST(max(l_partkey) AS BIGINT) AS pmax,
      |         CAST(min(l_suppkey) AS BIGINT) AS smin, CAST(max(l_suppkey) AS BIGINT) AS smax
      |  FROM lineitem),
      |g AS (
      |  SELECT l_partkey, l_suppkey,
      |    CASE WHEN pmax = pmin THEN 0
      |         ELSE ((CAST(l_partkey AS BIGINT) - pmin) * 65535) // (pmax - pmin) END AS xi,
      |    CASE WHEN smax = smin THEN 0
      |         ELSE ((CAST(l_suppkey AS BIGINT) - smin) * 65535) // (smax - smin) END AS yi
      |  FROM lineitem, ext),
      |s1 AS (SELECT l_partkey, l_suppkey,
      |        ((xi | (xi << 8)) & 16711935) AS xa, ((yi | (yi << 8)) & 16711935) AS ya FROM g),
      |s2 AS (SELECT l_partkey, l_suppkey,
      |        ((xa | (xa << 4)) & 252645135) AS xb, ((ya | (ya << 4)) & 252645135) AS yb FROM s1),
      |s3 AS (SELECT l_partkey, l_suppkey,
      |        ((xb | (xb << 2)) & 858993459) AS xc, ((yb | (yb << 2)) & 858993459) AS yc FROM s2),
      |s4 AS (SELECT l_partkey, l_suppkey,
      |        ((xc | (xc << 1)) & 1431655765) AS xd, ((yc | (yc << 1)) & 1431655765) AS yd FROM s3)
      |""".stripMargin

  /** Hilbert xy→d oracle: the SAME 8 unrolled rotate-and-descend rounds
    * the Spark side runs (quadrant CASE = (3rx)⊕ry, reflect against the
    * full 255 grid, swap when ry=0), one CTE stage per round. Ends with
    * `h8(l_partkey, l_suppkey, d, x, y)`. */
  val hilbertCte: String = {
    val base =
      """WITH ext AS (
        |  SELECT CAST(min(l_partkey) AS BIGINT) AS pmin, CAST(max(l_partkey) AS BIGINT) AS pmax,
        |         CAST(min(l_suppkey) AS BIGINT) AS smin, CAST(max(l_suppkey) AS BIGINT) AS smax
        |  FROM lineitem),
        |h0 AS (
        |  SELECT l_partkey, l_suppkey, CAST(0 AS BIGINT) AS d,
        |    CASE WHEN pmax = pmin THEN 0
        |         ELSE ((CAST(l_partkey AS BIGINT) - pmin) * 255) // (pmax - pmin) END AS x,
        |    CASE WHEN smax = smin THEN 0
        |         ELSE ((CAST(l_suppkey AS BIGINT) - smin) * 255) // (smax - smin) END AS y
        |  FROM lineitem, ext)""".stripMargin
    val stages = Seq(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L).zipWithIndex.map {
      case (s, i) =>
        s"""h${i + 1} AS (SELECT l_partkey, l_suppkey,
           |  d + ${s * s} * (CASE WHEN (x & $s) > 0 AND (y & $s) > 0 THEN 2
           |      WHEN (x & $s) > 0 THEN 3 WHEN (y & $s) > 0 THEN 1 ELSE 0 END) AS d,
           |  CASE WHEN (y & $s) = 0 THEN (CASE WHEN (x & $s) > 0 THEN 255 - y ELSE y END) ELSE x END AS x,
           |  CASE WHEN (y & $s) = 0 THEN (CASE WHEN (x & $s) > 0 THEN 255 - x ELSE x END) ELSE y END AS y
           |  FROM h$i)""".stripMargin
    }.mkString(",\n")
    base + ",\n" + stages + "\n"
  }

  val q: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_top3_mktsegment" -> ((s, d) => Relational.top3PerMktsegment(s, d)),
    "rel_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "rel_revenue_per_nation" -> ((s, d) => Relational.revenuePerNation(s, d)),
    "rel_join_semi" -> ((s, d) => Relational.customersWithOrders(s, d)),
    "rel_join_anti" -> ((s, d) => Relational.customersWithoutEvents(s, d)),
    "rel_asof_last_signup" -> ((s, d) => Relational.lastSignupBeforeEvent(s, d)),
    "rel_asof_native" -> ((s, d) => Relational.lastSignupNative(s, d)),
    "rel_range_join_clicks" -> ((s, d) => Relational.clicksBeforePurchase(s, d)),
    "rel_interval_join_global" -> ((s, d) => Relational.globalAttributionClicks(s, d)),
    "rel_rollup_revenue" -> ((s, d) => Relational.rollupRevenue(s, d)),
    "rel_pivot" -> ((s, d) => Relational.pivotQuantity(s, d)),
    "rel_latest_per_key" -> ((s, d) => Relational.latestEventPerUser(s, d)),
    "rel_json_extract" -> ((s, d) => Relational.eventPropsExtract(s, d)),
    "rel_salted_skew_join" -> ((s, d) => Relational.saltedSkewJoin(s, d)),
    "rel_zorder_layout" -> ((s, d) => Relational.zorderLayout(s, d)),
    "rel_zorder_skip" -> ((s, d) => Relational.zorderSkipStats(s, d)),
    "rel_hilbert_layout" -> ((s, d) => Relational.hilbertLayout(s, d)),
    "rel_profile" -> ((s, d) => Relational.profileTable(s, d)),
    "rel_profile_sketch" -> ((s, d) => Relational.profileTableSketch(s, d)),
    "rel_window_frames" -> ((s, d) => Relational.supplierRunningRevenue(s, d)),
    "rel_cube" -> ((s, d) => Relational.cubeQuantity(s, d)),
    "rel_count_distinct" -> ((s, d) => Relational.distinctPartsPerFlag(s, d)),
    "rel_set_ops" -> ((s, d) => Relational.customerSetOps(s, d)),
    "rel_approx_distinct" -> ((s, d) => Relational.approxDistinctParts(s, d)),
    "rel_approx_distinct_union" -> ((s, d) => Relational.approxDistinctUnion(s, d)),
    "rel_event_funnel" -> ((s, d) => Relational.eventFunnel(s, d)),
    "rel_cohort_retention" -> ((s, d) => Relational.cohortRetention(s, d)),
    "rel_event_transitions" -> ((s, d) => Relational.eventTransitions(s, d)),
    "rel_sessionize" -> ((s, d) => Relational.sessionize(s, d, 30)),
    // connector round-trips: the ORACLE reads the original parquet, so a
    // quoting/escaping/null bug in the CSV/JSON path breaks the hash
    "rel_csv_roundtrip" -> ((s, d) => graft.sources.Connectors.csvRoundTrip(s, d)),
    "rel_json_roundtrip" -> ((s, d) => graft.sources.Connectors.jsonRoundTrip(s, d)),
    "rel_orc_roundtrip" -> ((s, d) => graft.sources.Connectors.orcRoundTrip(s, d)),
  )

  val sql: Map[String, String] = Map(
    "rel_top3_mktsegment" ->
      """WITH rev AS (
        |  SELECT c_mktsegment, c_custkey,
        |         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
        |             (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS rev_c4
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2)
        |SELECT c_mktsegment, c_custkey,
        |       round((CASE WHEN rev_c4 < 0 THEN -((50 - rev_c4) // 100)
        |              ELSE (rev_c4 + 50) // 100 END) / 100.0, 2) AS revenue, rnk
        |FROM (SELECT c_mktsegment, c_custkey, rev_c4,
        |             row_number() OVER (PARTITION BY c_mktsegment
        |                                ORDER BY rev_c4 DESC, c_custkey) AS rnk
        |      FROM rev)
        |WHERE rnk <= 3""".stripMargin,
    "rel_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0, 2) AS sum_base,
        |  round((CASE WHEN sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
        |                       (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) < 0
        |         THEN -((50 - sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
        |                          (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))) // 100)
        |         ELSE (sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
        |                   (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) + 50) // 100 END)
        |        / 100.0, 2) AS sum_disc_price,
        |  round(sum(CAST(round(l_discount * 100, 0) AS BIGINT)) / 100.0 / count(*), 6) AS avg_disc,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "rel_revenue_per_nation" ->
      """SELECT r_name, n_name,
        |  round((CASE WHEN sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
        |                       (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) < 0
        |         THEN -((50 - sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
        |                          (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))) // 100)
        |         ELSE (sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
        |                   (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) + 50) // 100 END)
        |        / 100.0, 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2""".stripMargin,
    "rel_join_semi" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "rel_join_anti" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)""".stripMargin,
    "rel_asof_last_signup" ->
      """SELECT e.event_id, max(s.ts) AS last_signup_ts, count(*) AS n_prior_signups
        |FROM events e JOIN events s
        |  ON s.user_id = e.user_id AND s.event_type = 'signup' AND s.ts <= e.ts
        |GROUP BY 1""".stripMargin,
    "rel_range_join_clicks" ->
      """SELECT p.event_id AS purchase_id, count(*) AS n_clicks,
        |  round(sum(c.value), 4) AS click_value
        |FROM events p JOIN events c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND c.user_id = p.user_id
        |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
        |GROUP BY 1""".stripMargin,
    "rel_rollup_revenue" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  round(sum(o_totalprice), 2) AS total, count(*) AS cnt
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    // pivot as declared conditional aggregates — the plan Spark compiles
    // a value-listed pivot to
    "rel_pivot" ->
      """SELECT l_linestatus,
        |  round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS A,
        |  round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS N,
        |  round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS R
        |FROM lineitem GROUP BY 1""".stripMargin,
    "rel_latest_per_key" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
        |  epoch_us(ts) AS last_ts_us
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1""".stripMargin,
    // deterministic HLL (md5 registers, integer-scaled sum — see
    // Relational.approxDistinctParts): the estimate is a pure function of
    // the value set, so both engines derive the identical integer
    "rel_approx_distinct" -> {
      // the α·m²·2⁴⁹ numerator as ONE Scala-computed double whose
      // round-trip decimal repr lands DuckDB on the same bits the Spark
      // literal carries
      val numer = 0.7213 / (1.0 + 1.079 / 4096) * 4096.0 * 4096.0 * math.pow(2.0, 49)
      s"""WITH h AS (
         |  SELECT l_returnflag,
         |    CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         |  FROM lineitem),
         |regs AS (
         |  SELECT l_returnflag, h & 4095 AS bucket,
         |    max(CASE WHEN h >> 12 = 0 THEN 49
         |             ELSE 49 - length(bin(h >> 12)) END) AS rank
         |  FROM h GROUP BY 1, 2),
         |agg AS (
         |  SELECT l_returnflag,
         |    sum(CAST(1 AS BIGINT) << (49 - rank)) AS s_hit,
         |    4096 - count(*) AS zeros
         |  FROM regs GROUP BY 1),
         |est AS (
         |  SELECT l_returnflag, zeros,
         |    $numer / CAST(s_hit + zeros * (CAST(1 AS BIGINT) << 49) AS DOUBLE) AS raw
         |  FROM agg)
         |SELECT e.l_returnflag,
         |  CAST(CASE WHEN raw <= 10240.0 AND zeros > 0
         |    THEN round(4096.0 * ln(4096.0 / zeros)) ELSE round(raw) END AS BIGINT)
         |    AS approx_parts,
         |  x.exact_parts
         |FROM est e JOIN (
         |  SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts
         |  FROM lineitem GROUP BY 1) x USING (l_returnflag)""".stripMargin
    },
    // sketch-union identity: register-wise max across flags == rescan of
    // the union slice; same register replay as rel_approx_distinct
    "rel_approx_distinct_union" -> {
      val numer = 0.7213 / (1.0 + 1.079 / 4096) * 4096.0 * 4096.0 * math.pow(2.0, 49)
      def est(src: String, name: String): String =
        s"""est_$name AS (
           |  SELECT CAST(CASE WHEN raw <= 10240.0 AND zeros > 0
           |    THEN round(4096.0 * ln(4096.0 / zeros)) ELSE round(raw) END AS BIGINT)
           |    AS $name
           |  FROM (
           |    SELECT zeros, $numer / CAST(s_hit + zeros * (CAST(1 AS BIGINT) << 49) AS DOUBLE) AS raw
           |    FROM (
           |      SELECT sum(CAST(1 AS BIGINT) << (49 - rank)) AS s_hit,
           |        4096 - count(*) AS zeros
           |      FROM $src)))""".stripMargin
      s"""WITH h AS (
         |  SELECT l_returnflag,
         |    CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
         |base AS (
         |  SELECT l_returnflag, h & 4095 AS bucket,
         |    CASE WHEN h >> 12 = 0 THEN 49 ELSE 49 - length(bin(h >> 12)) END AS rk
         |  FROM h),
         |byflag AS (SELECT l_returnflag, bucket, max(rk) AS rank FROM base GROUP BY 1, 2),
         |merged AS (SELECT bucket, max(rank) AS rank FROM byflag GROUP BY 1),
         |rescan AS (SELECT bucket, max(rk) AS rank FROM base GROUP BY 1),
         |${est("merged", "approx_union")},
         |${est("rescan", "approx_rescan")},
         |ex AS (SELECT count(DISTINCT l_partkey) AS exact_union FROM lineitem
         |       WHERE l_returnflag IN ('A', 'R'))
         |SELECT approx_union, approx_rescan, exact_union
         |FROM est_approx_union, est_approx_rescan, ex""".stripMargin
    },
    // custom-operator as-of join: last signup at-or-before each event
    "rel_asof_native" ->
      """SELECT e.event_id, epoch_us(max(s.ts)) AS last_signup_us
        |FROM events e JOIN events s
        |  ON s.event_type = 'signup' AND s.user_id = e.user_id AND s.ts <= e.ts
        |GROUP BY 1""".stripMargin,
    // keyless interval join: clicks from ANY user in the hour before each
    // tracked purchase (epoch-micros arithmetic — the shared ts convention)
    "rel_interval_join_global" ->
      """SELECT p.event_id AS wid, count(*) AS n_clicks,
        |  round(sum(c.value), 4) AS click_value
        |FROM events p JOIN events c
        |  ON p.event_type = 'purchase' AND p.event_id < 2000
        |  AND c.event_type = 'click'
        |  AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
        |  AND epoch_us(c.ts) < epoch_us(p.ts)
        |GROUP BY 1""".stripMargin,
    "rel_window_frames" ->
      """WITH c AS (
        |  SELECT *, CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
        |  FROM lineitem WHERE l_suppkey < 5)
        |SELECT l_suppkey, l_orderkey, l_linenumber,
        |  round(sum(cents) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS UNBOUNDED PRECEDING) / 100.0, 2) AS running_rev,
        |  rank() OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rnk,
        |  round(coalesce(lag(l_extendedprice) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber), 0.0), 2) AS prev_price,
        |  round(sum(cents) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) / 100.0
        |   / count(*) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS ma3
        |FROM c""".stripMargin,
    "rel_cube" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS qty,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "rel_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY 1""".stripMargin,
    "rel_event_funnel" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
        |    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        |  FROM events GROUP BY user_id)
        |SELECT count(*) AS n_users,
        |  CAST(sum(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_click,
        |  CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
        |       AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
        |FROM pu""".stripMargin,
    "rel_cohort_retention" ->
      """WITH e AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
        |f AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY 1)
        |SELECT epoch_us(cohort) AS cohort_us,
        |  (epoch_us(wk) - epoch_us(cohort)) // 604800000000 AS week_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    // per-user lag ordered by epoch-micros (the Spark ts convention) —
    // keyed window; p is a ratio of exact integer counts
    "rel_event_transitions" ->
      """WITH r AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events),
        |c AS (SELECT prev, event_type AS next, count(*) AS n
        |      FROM r WHERE prev IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev, sum(n) AS tot FROM c GROUP BY 1)
        |SELECT c.prev, c.next, c.n,
        |  round(c.n / CAST(t.tot AS DOUBLE), 6) + 0.0 AS p
        |FROM c JOIN t USING (prev)""".stripMargin,
    // 30-min-gap sessions per user: running count of gap breaks, then an
    // all-integer per-session summary (epoch-microsecond arithmetic)
    "rel_sessionize" ->
      """WITH r AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events),
        |f AS (SELECT user_id, event_id, us,
        |    CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS ns
        |  FROM r),
        |s AS (SELECT user_id, us,
        |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess
        |  FROM f)
        |SELECT user_id, sess, count(*) AS n_events, min(us) AS start_us,
        |  max(us) - min(us) AS dur_us
        |FROM s GROUP BY 1, 2""".stripMargin,
    // connector oracles read the ORIGINAL parquet — the round-trip must
    // reproduce it exactly through the CSV/JSON parse path
    "rel_csv_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n, CAST(sum(c_custkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acct_cents
        |FROM customer GROUP BY 1""".stripMargin,
    "rel_json_roundtrip" ->
      """SELECT n_regionkey, count(*) AS n_nations,
        |  CAST(sum(n_nationkey) AS BIGINT) AS key_sum
        |FROM nation GROUP BY 1""".stripMargin,
    "rel_orc_roundtrip" ->
      """SELECT s_nationkey, count(*) AS n, CAST(sum(s_suppkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS acct_cents
        |FROM supplier GROUP BY 1""".stripMargin,
    "rel_set_ops" ->
      """WITH b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |s AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
        |      WHERE o_totalprice > 150000.0)
        |SELECT 'intersect' AS op, c_custkey FROM (SELECT * FROM b INTERSECT SELECT * FROM s)
        |UNION ALL
        |SELECT 'except' AS op, c_custkey FROM (SELECT * FROM b EXCEPT SELECT * FROM s)
        |UNION ALL
        |SELECT 'union' AS op, c_custkey FROM (SELECT * FROM b UNION SELECT * FROM s)""".stripMargin,
    "rel_salted_skew_join" ->
      """SELECT l_orderkey % 3 AS hot_key,
        |  round(sum(l_quantity * (l_orderkey % 3 + 1)), 2) AS weighted_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1""".stripMargin,
    // Z-order layout: Morton-interleave (l_partkey, l_suppkey) on a 2^16
    // grid, cut the curve into 64 equal z-ranges, report each bucket's
    // bounding box. Pure integer arithmetic (floor division, magic-number
    // bit spread) so both engines compute identical codes bit-for-bit.
    "rel_zorder_layout" -> (RelationalQueries.zorderCte +
      """SELECT (xd | (yd << 1)) >> 26 AS bucket, count(*) AS cnt,
        |  CAST(min(l_partkey) AS BIGINT) AS min_pk, CAST(max(l_partkey) AS BIGINT) AS max_pk,
        |  CAST(min(l_suppkey) AS BIGINT) AS min_sk, CAST(max(l_suppkey) AS BIGINT) AS max_sk
        |FROM s4 GROUP BY 1""".stripMargin),
    // skip-fraction of the layout for a mid-range suppkey-only predicate:
    // a bucket is scanned iff its [min_sk, max_sk] box intersects the
    // window [smin + 2/5 span, smin + 3/5 span]
    "rel_zorder_skip" -> (RelationalQueries.zorderCte +
      """, layout AS (
        |  SELECT (xd | (yd << 1)) >> 26 AS bucket, count(*) AS cnt,
        |    CAST(min(l_suppkey) AS BIGINT) AS min_sk, CAST(max(l_suppkey) AS BIGINT) AS max_sk
        |  FROM s4 GROUP BY 1),
        |win AS (
        |  SELECT smin + ((smax - smin) * 2) // 5 AS lo,
        |         smin + ((smax - smin) * 3) // 5 AS hi
        |  FROM ext)
        |SELECT count(*) AS n_buckets,
        |  CAST(sum(CASE WHEN max_sk >= lo AND min_sk <= hi THEN 1 ELSE 0 END) AS BIGINT) AS n_scanned,
        |  CAST(sum(CASE WHEN max_sk >= lo AND min_sk <= hi THEN 0 ELSE 1 END) AS BIGINT) AS n_pruned,
        |  round(sum(CASE WHEN max_sk >= lo AND min_sk <= hi THEN 0 ELSE 1 END) * 1.0
        |    / count(*), 4) + 0.0 AS skip_frac,
        |  round(sum(CASE WHEN max_sk >= lo AND min_sk <= hi THEN cnt ELSE 0 END) * 1.0
        |    / sum(cnt), 4) + 0.0 AS scanned_row_frac
        |FROM layout, win""".stripMargin),
    "rel_json_extract" ->
      """SELECT event_id, upper(event_type) AS type_u, CAST(ts AS DATE) AS day,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 = 0""".stripMargin,
    // Hilbert-curve layout: 8 unrolled xy→d rounds on the 256 grid, curve
    // cut into 64 equal d-ranges, per-bucket bounding boxes — all integer
    // arithmetic, bit-for-bit across engines
    "rel_hilbert_layout" -> (RelationalQueries.hilbertCte +
      """SELECT d >> 10 AS bucket, count(*) AS cnt,
        |  CAST(min(l_partkey) AS BIGINT) AS min_pk, CAST(max(l_partkey) AS BIGINT) AS max_pk,
        |  CAST(min(l_suppkey) AS BIGINT) AS min_sk, CAST(max(l_suppkey) AS BIGINT) AS max_sk
        |FROM h8 GROUP BY 1""".stripMargin),
    // one-pass profiling: the UNION ALL oracle re-derives each column's
    // row the engine's single Expand-aggregate emits
    "rel_profile" -> Seq("l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount").map(c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows, count($c) AS n_nonnull,
         |  count(DISTINCT $c) AS n_distinct, CAST(min($c) AS DOUBLE) AS min_v,
         |  CAST(max($c) AS DOUBLE) AS max_v, round(avg($c), 4) AS mean_v
         |FROM lineitem""".stripMargin).mkString("\nUNION ALL\n"),
    // sketch profiling: the distinct column is the deterministic HLL
    // register replay (same math as rel_approx_distinct) — per column
    "rel_profile_sketch" -> {
      val numer = 0.7213 / (1.0 + 1.079 / 4096) * 4096.0 * 4096.0 * math.pow(2.0, 49)
      Seq("l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount").map(c =>
        s"""SELECT '$c' AS col_name, s.n_rows, s.n_nonnull, e.nd_sketch,
           |  s.min_v, s.max_v, s.mean_v
           |FROM (SELECT count(*) AS n_rows, count($c) AS n_nonnull,
           |        CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v,
           |        round(avg($c), 4) AS mean_v FROM lineitem) s,
           |     (SELECT CAST(CASE WHEN raw <= 10240.0 AND zeros > 0
           |        THEN round(4096.0 * ln(4096.0 / zeros)) ELSE round(raw) END AS BIGINT)
           |        AS nd_sketch
           |      FROM (SELECT zeros,
           |          $numer / CAST(s_hit + zeros * (CAST(1 AS BIGINT) << 49) AS DOUBLE) AS raw
           |        FROM (SELECT sum(CAST(1 AS BIGINT) << (49 - rank)) AS s_hit,
           |            4096 - count(*) AS zeros
           |          FROM (SELECT h & 4095 AS bucket,
           |              max(CASE WHEN h >> 12 = 0 THEN 49
           |                  ELSE 49 - length(bin(h >> 12)) END) AS rank
           |            FROM (SELECT CAST(('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 15))
           |                    AS BIGINT) AS h
           |                  FROM lineitem WHERE $c IS NOT NULL)
           |            GROUP BY 1)))) e""".stripMargin).mkString("\nUNION ALL\n")
    },
  )
}

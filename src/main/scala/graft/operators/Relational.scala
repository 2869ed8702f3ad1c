package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational surface of the engine: scan → join → aggregate → window top-k.
  *
  * The reference has no relational joins (SURVEY.md §2.4) — these are the
  * Catalyst built-ins declared as engine surface, plus the join shapes its
  * matrix products lower to. Scale notes per query:
  *  - dimension tables (region/nation/customer/supplier/part) are broadcast —
  *    at 100 TB the fact table (lineitem) never shuffles for these joins;
  *  - per-group top-k uses window rank, whose shuffle is keyed by the group
  *    column only (the reference's batched select_k, matrix/select_k.cuh:75).
  */
object Relational {

  /** HALF_UP 10⁻⁴-dollar units → cents, sign-aware (ADVICE r12): Spark's
    * `div` truncates toward zero while DuckDB's `//` floors, so the naive
    * `(x + 50) div 100` diverges between engine and oracle on NEGATIVE
    * sums. Half-away-from-zero via the mirrored form keeps the dividend
    * nonnegative on both branches, where truncation == floor — the engines
    * agree for every sign, and the value is unchanged for the nonnegative
    * sums TPC-H data produces. The SQL twins in SparkEntry carry the same
    * CASE expression. */
  private def halfUpC4(x: String): String =
    s"if(($x) < 0, -((50 - ($x)) div 100), (($x) + 50) div 100)"

  /** Flagship: per-mktsegment top-3 customers by revenue.
    * lineitem ⋈ orders ⋈ customer → groupBy-sum → window top-k
    * (SURVEY.md §7 phase 1; select_k mapping of matrix/select_k.cuh:75).
    */
  def top3PerMktsegment(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    // revenue accumulates in EXACT integer 10⁻⁴-dollar units (prices and
    // discounts are 2-decimal by construction): a float Σ ep·(1−disc) is
    // accumulation-order sensitive, and at sf1 DuckDB's parallel SUM
    // landed one customer's revenue on the other side of a half-cent
    // boundary BETWEEN TWO RUNS of the same oracle (round-12 sweep
    // finding — the oracle flapped, not Spark). Integer units make the
    // sum and the rank order bit-exact on both engines; display = the
    // identical halfup-to-cents + /100.0 path rel_window_frames uses.
    val revC4 = sum(round(col("l_extendedprice") * 100, 0).cast("long") *
      (lit(100L) - round(col("l_discount") * 100, 0).cast("long")))
    val rev = li
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_custkey"))
      .agg(revC4.as("rev_c4"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("rev_c4").desc, col("c_custkey").asc)
    rev.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 3)
      .select(col("c_mktsegment"), col("c_custkey"),
        round(expr(halfUpC4("rev_c4")) / 100.0, 2).as("revenue"), col("rnk"))
  }

  /** TPC-H Q1-shaped pricing summary: the `map_reduce` / grouped-fold shape
    * (reference: linalg/map_reduce.cuh:86 fused with a keyed reduction).
    * Partial aggregation is map-side; one shuffle on the 6-valued group key.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    // same integer-cents accumulation as top3PerMktsegment: these are the
    // suite's LARGEST float sums (1M+ rows per group at sf1), where
    // parallel-sum accumulation order can flap the rounded display digit
    val epC = round(col("l_extendedprice") * 100, 0).cast("long")
    val dP = round(col("l_discount") * 100, 0).cast("long")
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(epC) / 100.0, 2).as("sum_base"),
        round(expr(halfUpC4("sum((cast(round(l_extendedprice * 100, 0) as bigint)) * " +
          "(100 - cast(round(l_discount * 100, 0) as bigint)))")) / 100.0, 2)
          .as("sum_disc_price"),
        round(sum(dP) / lit(100.0) / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("cnt"))
  }

  /** Revenue per nation through the full dimension chain; dims broadcast. */
  def revenuePerNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      // integer-cents accumulation (see top3PerMktsegment) — exact and
      // order-insensitive on both engines
      .agg(round(expr(halfUpC4("sum((cast(round(l_extendedprice * 100, 0) as bigint)) * " +
        "(100 - cast(round(l_discount * 100, 0) as bigint)))")) / 100.0, 2)
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Left-semi join: customers having at least one order (EXISTS). */
  def customersWithOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
  }

  /** Left-anti join: customers with no events (NOT EXISTS). */
  def customersWithoutEvents(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val e = Tables.events(spark, dir)
    c.join(e, c("c_custkey") === e("user_id"), "left_anti")
      .select(col("c_custkey"), col("c_acctbal"))
  }

  /** As-of-shaped self-join: per event, the most recent 'signup' event of the
    * same user at or before it (declared via max-aggregate so ties are
    * deterministic; DuckDB's ASOF JOIN computes the same relation).
    * Keyed by user_id — the shuffle co-locates each user's history, the
    * distributed shape an as-of merge needs at 100 TB.
    */
  def lastSignupBeforeEvent(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val s = e.where(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
    e.join(s, e("user_id") === col("s_user") && col("s_ts") <= e("ts"))
      .groupBy(col("event_id"))
      .agg(max(col("s_ts")).as("last_signup_ts"), count(lit(1)).as("n_prior_signups"))
  }

  /** Range join: per purchase event, clicks of the same user in the
    * preceding hour — the band-predicate join shape.
    */
  def clicksBeforePurchase(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val p = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c = e.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("value").as("c_value"))
    p.join(c, col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") < col("p_ts"))
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_clicks"), round(sum(col("c_value")), 4).as("click_value"))
  }

  /** The as-of join through the CUSTOM OPERATOR (graft.plans.AsOfJoin:
    * logical node + planner strategy + merge-sweep SparkPlan): same
    * semantics as [[lastSignupBeforeEvent]]'s inequality-join + max, but
    * one O(|L|+|R|) sweep per co-partition — no inflation, no window.
    * Emits epoch-micros (the shared ts convention). */
  def lastSignupNative(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val s = e.where(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
    graft.plans.AsOfJoin(e, s, "user_id", "s_user", "ts", "s_ts")
      .where(col("s_ts").isNotNull)
      .select(col("event_id"), unix_micros(col("s_ts")).as("last_signup_us"))
  }

  /** KEYLESS interval join via bucket replication — the scale path for
    * range predicates with no equi-key (clicksBeforePurchase has the user
    * key, so Spark already sort-merge-joins it; a global-window join has
    * nothing to hash on and degenerates to BroadcastNestedLoopJoin).
    * Intervals explode to the time buckets they overlap (×(span/bucket+1)
    * replication — the classic trade), points carry their single bucket,
    * and the join becomes a plain equi-join on bucket + residual range
    * filter. Each (point, interval) match meets in EXACTLY one bucket
    * (the point's), so no dedup pass is needed. Inputs in epoch-micros
    * longs: (pt, ...) × (wid, lo, hi), hi exclusive. */
  def intervalJoinBucketed(points: DataFrame, intervals: DataFrame,
      bucketMicros: Long): DataFrame = {
    val p = points.withColumn("b", floor(col("pt") / bucketMicros))
    val iv = intervals.withColumn("b",
      explode(sequence(floor(col("lo") / bucketMicros),
        floor((col("hi") - 1) / bucketMicros))))
    iv.join(p, Seq("b"))
      .where(col("pt") >= col("lo") && col("pt") < col("hi"))
      .drop("b")
  }

  /** Global attribution windows: clicks from ANY user falling in the hour
    * before each tracked purchase — the keyless interval join
    * [[intervalJoinBucketed]] exists for, aggregated per window. */
  def globalAttributionClicks(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val clicks = e.where(col("event_type") === "click")
      .select(unix_micros(col("ts")).as("pt"), col("value"))
    val windows = e.where(col("event_type") === "purchase" && col("event_id") < 2000)
      .select(col("event_id").as("wid"),
        (unix_micros(col("ts")) - 3600000000L).as("lo"),
        unix_micros(col("ts")).as("hi"))
    intervalJoinBucketed(clicks, windows, 3600000000L)
      .groupBy(col("wid"))
      .agg(count(lit(1)).as("n_clicks"), round(sum(col("value")), 4).as("click_value"))
  }

  /** Analytic window frames: running revenue + rank/lag per supplier over a
    * unique (shipdate, orderkey, linenumber) order — the frame-spec surface
    * (SURVEY §2.6, declared free; required by the select_k/shift mappings).
    */
  def supplierRunningRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).where(col("l_suppkey") < 5)
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    // frame sums accumulate in integer CENTS (prices are 2-decimal by
    // construction, so cents are exact longs): a float frame-sum is
    // engine-accumulation-order sensitive and at sf1 one 3-row average
    // landed on a half-cent boundary where Spark and DuckDB rounded
    // apart (round-11 sweep finding) — summing longs makes the window
    // arithmetic bit-exact on BOTH engines, with one identical float
    // division at the end
    val cents = round(col("l_extendedprice") * 100, 0).cast("long")
    val frame3 = w.rowsBetween(-2, 0)
    li.select(
      col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
      round(sum(cents)
        .over(w.rowsBetween(Window.unboundedPreceding, 0)) / 100.0, 2).as("running_rev"),
      rank().over(w).as("rnk"),
      round(lag(col("l_extendedprice"), 1, 0.0).over(w), 2).as("prev_price"),
      round(sum(cents).over(frame3) / 100.0
        / count(lit(1)).over(frame3), 2).as("ma3"))
  }

  /** Set operations (union/intersect/except surface, SURVEY §2.7 —
    * absent in the reference, Catalyst built-ins): big spenders vs
    * BUILDING-segment customers, one row per (op, custkey).
    */
  def customerSetOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val building = c.where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val bigSpenders = o.where(col("o_totalprice") > 150000.0)
      .select(col("o_custkey").as("c_custkey")).distinct()
    building.intersect(bigSpenders).select(lit("intersect").as("op"), col("c_custkey"))
      .unionByName(building.except(bigSpenders)
        .select(lit("except").as("op"), col("c_custkey")))
      .unionByName(building.union(bigSpenders).distinct()
        .select(lit("union").as("op"), col("c_custkey")))
  }

  /** HyperLogLog distinct-count estimate, DETERMINISTIC ACROSS ENGINES
    * (unlike `approx_count_distinct`, whose HLL++ registers are
    * implementation-specific): md5-derived 60-bit hash per value, p=12
    * (m=4096 registers, standard error ≈ 1.04/√m ≈ 1.6 %), register =
    * max rank of the 48-bit suffix where rank = leading zeros + 1
    * computed as 49 − length(bin(w)) — integer-exact on both engines, no
    * libm log2. The register sum is INTEGER-scaled (Σ 2^(49−M_j) plus
    * 2^49 per empty register, a BIGINT) so no float summation order
    * exists anywhere; the estimate is one scalar expression both engines
    * derive from the same register table: α_m·m²·2^49/S, with
    * small-range linear counting m·ln(m/V) below 2.5m (Flajolet et al.
    * 2007). The estimate is a pure function of the VALUE SET — mergeable
    * (register max is associative+commutative), partition-invariant, and
    * hash-checkable in the driver gate. */
  def approxDistinctParts(spark: SparkSession, dir: String): DataFrame = {
    val m = 4096
    val h = conv(substring(md5(col("l_partkey").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val regs = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), h.as("h"))
      .select(col("l_returnflag"), (col("h").bitwiseAND(lit(m - 1L))).as("bucket"),
        shiftright(col("h"), 12).as("w"))
      .groupBy(col("l_returnflag"), col("bucket"))
      .agg(max(when(col("w") === 0L, 49)
        .otherwise(lit(49) - length(bin(col("w"))))).as("rank"))
    val alpha = 0.7213 / (1.0 + 1.079 / m) // bias constant, m ≥ 128
    regs.groupBy(col("l_returnflag"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 49 - rank)")).as("s_hit"),
        (lit(m) - count(lit(1))).as("zeros"))
      .select(col("l_returnflag"), col("zeros"),
        (lit(alpha * m.toDouble * m.toDouble * math.pow(2.0, 49)) /
          (col("s_hit") + col("zeros") * lit(1L << 49)).cast("double")).as("raw"))
      .select(col("l_returnflag"),
        when(col("raw") <= 2.5 * m && col("zeros") > 0,
          round(lit(m.toDouble) * log(lit(m.toDouble) / col("zeros").cast("double"))))
          .otherwise(round(col("raw"))).cast("long").as("approx_parts"))
      .join(Tables.lineitem(spark, dir).groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts")), Seq("l_returnflag"))
  }

  /** HLL sketch UNION — the mergeability that lets per-day / per-shard
    * sketches roll up at 100 TB without rescanning rows: the distinct
    * count of the A∪R slice derived by REGISTER-WISE MAX of the two
    * flags' register tables equals (exactly — the register math is a
    * pure function of the value set) the estimate from a direct rescan
    * of the union slice. One row out: both estimates plus the exact
    * union count, hash-proving the merge identity in-data. */
  def approxDistinctUnion(spark: SparkSession, dir: String): DataFrame = {
    val m = 4096
    val h = conv(substring(md5(col("l_partkey").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val base = Tables.lineitem(spark, dir)
      .where(col("l_returnflag").isin("A", "R"))
      .select(col("l_returnflag"), (h.bitwiseAND(lit(m - 1L))).as("bucket"),
        shiftright(h, 12).as("w"))
    val rankAgg = max(when(col("w") === 0L, 49)
      .otherwise(lit(49) - length(bin(col("w"))))).as("rank")
    def estimate(regs: DataFrame, name: String): DataFrame = {
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      regs.agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 49 - rank)")).as("s_hit"),
          (lit(m) - count(lit(1))).as("zeros"))
        .select(col("zeros"),
          (lit(alpha * m.toDouble * m.toDouble * math.pow(2.0, 49)) /
            (col("s_hit") + col("zeros") * lit(1L << 49)).cast("double")).as("raw"))
        .select(when(col("raw") <= 2.5 * m && col("zeros") > 0,
          round(lit(m.toDouble) * log(lit(m.toDouble) / col("zeros").cast("double"))))
          .otherwise(round(col("raw"))).cast("long").as(name))
    }
    val byFlag = base.groupBy(col("l_returnflag"), col("bucket")).agg(rankAgg)
    val merged = byFlag.groupBy(col("bucket")).agg(max(col("rank")).as("rank"))
    val rescan = base.groupBy(col("bucket")).agg(rankAgg)
    estimate(merged, "approx_union")
      .crossJoin(estimate(rescan, "approx_rescan"))
      .crossJoin(Tables.lineitem(spark, dir)
        .where(col("l_returnflag").isin("A", "R"))
        .agg(countDistinct(col("l_partkey")).as("exact_union")))
  }

  /** Cube aggregation over two dimensions (grouping-sets surface). */
  def cubeQuantity(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("qty"), count(lit(1)).as("cnt"))

  /** Exact distinct counts per group (countDistinct surface). */
  def distinctPartsPerFlag(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))

  /** Rollup aggregation (grouping-sets surface, free in Catalyst). */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice")), 2).as("total"), count(lit(1)).as("cnt"))

  /** Pivot / crosstab (the wide-format report every BI layer asks of an
    * engine): quantity summed per linestatus, one column per return
    * flag. With the pivot values DECLARED, Catalyst compiles this to a
    * single pass of conditional aggregates — same plan as the CASE-sum
    * oracle, no distinct-values pre-query and no second shuffle. */
  def pivotQuantity(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(round(sum(col("l_quantity")), 2))

  /** Latest-row-per-key compaction (the CDC/upsert dedup every incremental
    * ingest runs before merge): each user's most recent event, ties broken
    * by event_id — WindowGroupLimit gives per-partition heaps, so the
    * exchange carries the group key only, never a full sort. */
  def latestEventPerUser(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"),
        unix_micros(col("ts")).as("last_ts_us"))
  }

  /** Funnel / event-sequence analysis: per user, earliest signup → click →
    * purchase in strict temporal order; counts users reaching each stage —
    * the sequence-match analytic a product/training pipeline runs over
    * event logs. Pure per-key aggregation: one shuffle on user_id.
    */
  def eventFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val perUser = e.groupBy(col("user_id")).agg(
      min(when(col("event_type") === "signup", col("ts"))).as("t_signup"),
      min(when(col("event_type") === "click", col("ts"))).as("t_click"),
      min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
    perUser.agg(
      count(lit(1)).as("n_users"),
      sum(when(col("t_signup").isNotNull, 1).otherwise(0)).as("n_signup"),
      sum(when(col("t_signup").isNotNull &&
        col("t_click") > col("t_signup"), 1).otherwise(0)).as("n_signup_click"),
      sum(when(col("t_signup").isNotNull &&
        col("t_click") > col("t_signup") &&
        col("t_purchase") > col("t_click"), 1).otherwise(0)).as("n_full_funnel"))
  }

  /** Cohort retention: users grouped by first-seen week (their cohort),
    * activity counted per (cohort, week offset) — the classic retention
    * triangle. Two keyed aggregates and one equi-join on user_id; the
    * week offset is integer-microsecond arithmetic (`div`), never float
    * division two engines could round apart. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val first = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
    e.join(first, Seq("user_id"))
      .select(col("user_id"), col("cohort"),
        expr("(unix_micros(wk) - unix_micros(cohort)) div 604800000000").as("week_offset"))
      .groupBy(col("cohort"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(unix_micros(col("cohort")).as("cohort_us"), col("week_offset"),
        col("n_users"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * order each user's events by (ts, event_id), lag one step within the
    * user, count (prev_type → type) transitions, and row-normalize into
    * transition probabilities. The window is PARTITIONED by user (bounded
    * per-key sequences — the allowed keyed-window shape); the count table
    * is ≤ |types|² rows, so the normalizing row-sum join is a broadcast.
    * This is the sequence-model summary a curation pipeline derives from
    * interaction logs (session flow, next-event prediction priors). */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(spark, dir)
      .withColumn("prev", lag(col("event_type"), 1).over(byUser))
      .where(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("n"))
    val totals = steps.groupBy(col("prev")).agg(sum(col("n")).as("tot"))
    steps.join(broadcast(totals), Seq("prev"))
      .select(col("prev"), col("next"), col("n"),
        (round(col("n") / col("tot").cast("double"), 6) + 0.0).as("p"))
  }

  /** Gap-based sessionization SUMMARY: a new session starts when the gap
    * to the user's previous event exceeds `gapMinutes`; the session id is
    * the running count of session starts within the user. This is the
    * row-LABELING counterpart of the session_window AGGREGATE
    * (StreamingOps.sessionTotals) — labels let later stages join
    * arbitrary per-event data back to its session. Both windows are
    * keyed by user (bounded per-key sequences); the arithmetic is
    * epoch-microsecond integers end-to-end, so the summary hashes
    * identically on any engine. */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val gapUs = gapMinutes * 60L * 1000000L
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag(col("us"), 1).over(byUser))
      .withColumn("ns", when(col("prev").isNull ||
        col("us") - col("prev") > gapUs, 1L).otherwise(0L))
      .withColumn("sess", sum(col("ns")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess"))
      .agg(count(lit(1)).as("n_events"), min(col("us")).as("start_us"),
        (max(col("us")) - min(col("us"))).as("dur_us"))
  }

  /** Salted join for skewed keys: the fact side salts its hot key into
    * `nSalts` sub-keys; the dimension is replicated once per salt, so each
    * hot key's rows spread over nSalts tasks instead of one straggler.
    * Semantically identical to the plain join (the oracle runs unsalted).
    * Demo fixture: hot_key = l_orderkey % 3 (three massive keys).
    */
  def saltedSkewJoin(spark: SparkSession, dir: String, nSalts: Int = 8): DataFrame = {
    val fact = Tables.lineitem(spark, dir)
      .select(pmod(col("l_orderkey"), lit(3)).as("hot_key"),
        col("l_quantity"),
        pmod(col("l_orderkey") + col("l_linenumber"), lit(nSalts)).as("salt"))
    val dim = spark.range(3).select(col("id").as("hot_key"),
        (col("id") + 1).cast("double").as("factor"))
      .crossJoin(spark.range(nSalts).select(col("id").as("salt")))
    fact.join(dim, Seq("hot_key", "salt"))
      .groupBy(col("hot_key"))
      .agg(round(sum(col("l_quantity") * col("factor")), 2).as("weighted_qty"),
        count(lit(1)).as("n"))
  }

  /** Morton (Z-order) interleave of a 16-bit grid coordinate into the even
    * bit positions of a 32-bit code — the classic magic-number spread, all
    * integer ops so Spark and the SQL oracle agree bit-for-bit.
    */
  def spreadBits16(v: Column): Column = {
    def step(x: Column, shift: Int, mask: Long): Column =
      x.bitwiseOR(shiftleft(x, shift)).bitwiseAND(lit(mask))
    val a = step(v.bitwiseAND(lit(0xFFFFL)), 8, 0x00FF00FFL)
    val b = step(a, 4, 0x0F0F0F0FL)
    val c = step(b, 2, 0x33333333L)
    step(c, 1, 0x55555555L)
  }

  /** Z-value for a 2-d point on a 2^bits grid spanning [xmin,xmax]×[ymin,ymax]
    * (inclusive): min-max scale each dim to the grid with pure INTEGER
    * arithmetic (floor division — float scaling would not replicate across
    * engines), then interleave. */
  def zvalue(x: Column, y: Column, xmin: Column, xmax: Column,
      ymin: Column, ymax: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    // exact integer floor-division (SQL `div`): double `/` + floor can round
    // up across an integer boundary and disagree with the oracle's `//`
    def intDiv(a: Column, b: Column): Column = ColumnBridge.column(
      IntegralDivide(ColumnBridge.expression(a), ColumnBridge.expression(b)))
    def gridCoord(v: Column, lo: Column, hi: Column): Column =
      when(hi === lo, lit(0L)).otherwise(
        intDiv((v.cast("long") - lo.cast("long")) * 65535L,
          hi.cast("long") - lo.cast("long")))
    spreadBits16(gridCoord(x, xmin, xmax))
      .bitwiseOR(shiftleft(spreadBits16(gridCoord(y, ymin, ymax)), 1))
  }

  /** Z-order data layout (the multi-dimensional clustering OPTIMIZE ZORDER
    * performs on 100 TB tables): order rows by the Morton interleave of
    * (l_partkey, l_suppkey) and cut the curve into `nBuckets` equal z-ranges
    * — each bucket is a would-be file. The returned per-bucket bounding
    * boxes are the layout's whole point: a scan filtered on EITHER dimension
    * prunes every bucket whose [min,max] misses the predicate, which a
    * single-column sort gives for one dimension only. At scale the identical
    * plan writes files instead of stats:
    * `df.repartitionByRange(n, $"z").sortWithinPartitions("z").write...` —
    * the range exchange is the only shuffle, and parquet min/max footers
    * materialize exactly these bounding boxes for free. Extremes are
    * attached as a 1-row broadcast (scalar attach pattern), so the whole
    * query is scan → broadcast attach → one keyed aggregate.
    */
  def zorderLayout(spark: SparkSession, dir: String, nBuckets: Int = 64): DataFrame = {
    require(nBuckets > 0 && (nBuckets & (nBuckets - 1)) == 0,
      s"nBuckets must be a power of two (bucket = z >> shift), got $nBuckets")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
    val ext = li.agg(
      min(col("l_partkey")).as("pmin"), max(col("l_partkey")).as("pmax"),
      min(col("l_suppkey")).as("smin"), max(col("l_suppkey")).as("smax"))
    val shift = 32 - (63 - java.lang.Long.numberOfLeadingZeros(nBuckets.toLong))
    li.crossJoin(broadcast(ext))
      .select(shiftright(zvalue(col("l_partkey"), col("l_suppkey"),
        col("pmin"), col("pmax"), col("smin"), col("smax")), shift).as("bucket"),
        col("l_partkey"), col("l_suppkey"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"),
        min(col("l_partkey")).cast("long").as("min_pk"),
        max(col("l_partkey")).cast("long").as("max_pk"),
        min(col("l_suppkey")).cast("long").as("min_sk"),
        max(col("l_suppkey")).cast("long").as("max_sk"))
  }

  /** Data-skipping payoff of the Z-order layout, quantified: for a mid-range
    * predicate on l_suppkey ALONE (the second interleaved dimension — the one
    * a single-column partkey sort would NOT localize), count how many of the
    * 64 curve buckets can be pruned purely from their bounding boxes.
    * The predicate window is [smin + 2/5·span, smin + 3/5·span], derived with
    * the same integer arithmetic on both engines. A bucket is scanned iff its
    * [min_sk, max_sk] intersects the window; everything else is skipped
    * without reading a row — exactly the parquet-footer pruning the layout
    * buys at 100 TB. Emits one row: bucket totals, scanned/pruned counts,
    * the skip fraction, and the fraction of ROWS inside scanned buckets. */
  def zorderSkipStats(spark: SparkSession, dir: String, nBuckets: Int = 64): DataFrame = {
    val layout = zorderLayout(spark, dir, nBuckets)
    val li = Tables.lineitem(spark, dir).select(col("l_suppkey"))
    val ext = li.agg(min(col("l_suppkey")).cast("long").as("smin"),
      max(col("l_suppkey")).cast("long").as("smax"))
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    def intDiv(a: Column, b: Column): Column = ColumnBridge.column(
      IntegralDivide(ColumnBridge.expression(a), ColumnBridge.expression(b)))
    val lo = col("smin") + intDiv((col("smax") - col("smin")) * 2L, lit(5L))
    val hi = col("smin") + intDiv((col("smax") - col("smin")) * 3L, lit(5L))
    val scanned = (col("max_sk") >= col("lo")) && (col("min_sk") <= col("hi"))
    layout.crossJoin(broadcast(ext.select(lo.as("lo"), hi.as("hi"))))
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(scanned, 1L).otherwise(0L)).as("n_scanned"),
        sum(when(!scanned, 1L).otherwise(0L)).as("n_pruned"),
        (round(sum(when(!scanned, 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 4) + 0.0).as("skip_frac"),
        (round(sum(when(scanned, col("cnt")).otherwise(0L)).cast("double") /
          sum(col("cnt")), 4) + 0.0).as("scanned_row_frac"))
  }

  /** One round of the Hilbert rotate-and-descend recurrence
    * (d += s²·quadrant; reflect+swap into the subsquare frame when ry=0).
    * Quadrant is the CASE form of (3·rx)⊕ry — identical CASE on both
    * engines, no XOR portability concerns. Applied as CHAINED projections
    * (one select per round): CollapseProject leaves non-cheap CASEs
    * un-inlined, so the plan stays linear in rounds instead of the
    * exponential tree one nested expression would build. Coordinates are
    * reflected against the FULL grid (n−1 = 255): higher bits flipped this
    * way are never re-read (each later round masks a strictly lower bit),
    * so the quadrant sequence matches the per-subsquare (s−1) form
    * bit-for-bit — and the oracle replays the same choice. */
  private def hilbertRound(df: DataFrame, s: Long): DataFrame = {
    val bx = col("hx").bitwiseAND(lit(s)) =!= 0L
    val by = col("hy").bitwiseAND(lit(s)) =!= 0L
    val quad = when(bx && by, 2L).when(bx && !by, 3L)
      .when(!bx && by, 1L).otherwise(0L)
    val nx = when(!by, when(bx, lit(255L) - col("hy")).otherwise(col("hy")))
      .otherwise(col("hx"))
    val ny = when(!by, when(bx, lit(255L) - col("hx")).otherwise(col("hx")))
      .otherwise(col("hy"))
    val payload = df.columns.filterNot(Set("hx", "hy", "hd")).map(col)
    df.select(payload :+ (col("hd") + lit(s * s) * quad).as("hd") :+
      nx.as("hx") :+ ny.as("hy"): _*)
  }

  /** Test seam: the raw 256-grid xy→d map — adds `hd` to a frame carrying
    * grid coords (hx, hy) ∈ [0,255]². HilbertSpec certifies bijection +
    * unit-step adjacency over all 65536 cells through exactly this path. */
  private[graft] def hilbertCode(df: DataFrame): DataFrame =
    Seq(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L)
      .foldLeft(df.withColumn("hd", lit(0L)))(hilbertRound)

  /** Hilbert-curve data layout (the Z-order follow-on: same
    * repartitionByRange-on-the-curve-code write shape, better locality —
    * every consecutive pair of curve cells is grid-ADJACENT, which Morton
    * violates at every power-of-two seam). (l_partkey, l_suppkey) scaled
    * to a 256×256 grid with pure integer arithmetic, 8 unrolled rounds of
    * the xy→d recurrence, curve cut into `nBuckets` equal d-ranges, and
    * each bucket reports its row count + bounding box — the parquet-footer
    * stats the layout buys at 100 TB. One broadcast extremes attach + one
    * keyed aggregate, exactly the z-order plan. HilbertSpec proves the
    * curve itself: the 65536-cell map is a bijection with unit-step
    * adjacency. */
  def hilbertLayout(spark: SparkSession, dir: String, nBuckets: Int = 64): DataFrame = {
    require(nBuckets > 0 && (nBuckets & (nBuckets - 1)) == 0,
      s"nBuckets must be a power of two, got $nBuckets")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    def intDiv(a: Column, b: Column): Column = ColumnBridge.column(
      IntegralDivide(ColumnBridge.expression(a), ColumnBridge.expression(b)))
    def gridCoord(v: Column, lo: Column, hi: Column): Column =
      when(hi === lo, lit(0L)).otherwise(
        intDiv((v.cast("long") - lo.cast("long")) * 255L,
          hi.cast("long") - lo.cast("long")))
    val li = Tables.lineitem(spark, dir).select(col("l_partkey"), col("l_suppkey"))
    val ext = li.agg(
      min(col("l_partkey")).as("pmin"), max(col("l_partkey")).as("pmax"),
      min(col("l_suppkey")).as("smin"), max(col("l_suppkey")).as("smax"))
    val g = li.crossJoin(broadcast(ext)).select(
      col("l_partkey"), col("l_suppkey"),
      gridCoord(col("l_partkey"), col("pmin"), col("pmax")).as("hx"),
      gridCoord(col("l_suppkey"), col("smin"), col("smax")).as("hy"))
    val coded = hilbertCode(g)
    val shift = 16 - (63 - java.lang.Long.numberOfLeadingZeros(nBuckets.toLong))
    coded
      .select(shiftright(col("hd"), shift).as("bucket"),
        col("l_partkey"), col("l_suppkey"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"),
        min(col("l_partkey")).cast("long").as("min_pk"),
        max(col("l_partkey")).cast("long").as("max_pk"),
        min(col("l_suppkey")).cast("long").as("min_sk"),
        max(col("l_suppkey")).cast("long").as("max_sk"))
  }

  /** One-pass table profiling (the ANALYZE-TABLE statistics every
    * cost-based layer feeds on): per-column non-null count, exact distinct
    * count, min/max, mean — computed in a SINGLE aggregate over the scan.
    * The multi-column count(DISTINCT) plans as one Expand + one shuffle
    * (partial aggregation still map-side-combines each replicate), so the
    * whole profile is one job regardless of column count; at 100 TB the
    * exact distincts would swap to the HLL sketch (`rel_approx_distinct`'s
    * deterministic register form) with the same single-pass shape. Output
    * is unpivoted to one row per column via `stack` — a driver-free
    * projection of the 1-row aggregate. */
  def profileTable(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount")
    val li = Tables.lineitem(spark, dir).select(cols.map(col): _*)
    val aggs = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("double").as(s"min_$c"),
        max(col(c)).cast("double").as(s"max_$c"),
        // integer keys divide exactly; the double columns round like every
        // other float aggregate in the suite
        round(avg(col(c)), 4).as(s"avg_$c"))
    }
    val one = li.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', nn_$c, nd_$c, min_$c, max_$c, avg_$c").mkString(", ")
    one.select(col("n_rows"), expr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_nonnull, n_distinct, min_v, max_v, mean_v)"))
      .select(col("col_name"), col("n_rows"), col("n_nonnull"),
        col("n_distinct"), col("min_v"), col("max_v"), col("mean_v"))
  }

  /** [[profileTable]]'s 100 TB form: per-column distincts come from the
    * deterministic HLL register sketch (same register math as
    * [[approxDistinctParts]]) instead of exact count(DISTINCT) — so the
    * Expand (6× row replication feeding one distinct-keyed shuffle) is
    * replaced by an unpivot into (column, value) rows and TWO cascaded
    * keyed aggregates: (column, bucket) partials map-side-combine to at
    * most 5×4096 register rows, then a 5-row final. Shuffle volume is
    * REGISTERS, not values — the property that lets per-shard profiles
    * merge without rescans. Stats (count/min/max/mean) ride the same two
    * aggregates as mergeable partials. */
  def profileTableSketch(spark: SparkSession, dir: String): DataFrame = {
    val m = 4096
    val cols = Seq("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount")
    val li = Tables.lineitem(spark, dir).select(cols.map(col): _*)
    val unp = li.select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(c).cast("double").as("v"),
          col(c).cast("string").as("s"))): _*)).as("e"))
      .select(col("e.c").as("col_name"), col("e.v").as("v"), col("e.s").as("s"))
    val h = conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long")
    val lvl1 = unp
      .select(col("col_name"), col("v"),
        when(col("s").isNotNull, h.bitwiseAND(lit(m - 1L))).as("bucket"),
        when(col("s").isNotNull, shiftright(h, 12)).as("w"))
      .groupBy(col("col_name"), col("bucket"))
      .agg(count(lit(1)).as("cnt"), count(col("v")).as("nn"),
        min(col("v")).as("mn"), max(col("v")).as("mx"), sum(col("v")).as("sm"),
        max(when(col("w") === 0L, 49)
          .otherwise(lit(49) - length(bin(col("w"))))).as("rank"))
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    lvl1.groupBy(col("col_name"))
      .agg(sum(col("cnt")).as("n_rows"), sum(col("nn")).as("n_nonnull"),
        min(col("mn")).as("min_v"), max(col("mx")).as("max_v"),
        round(sum(col("sm")) / sum(col("nn")), 4).as("mean_v"),
        sum(when(col("bucket").isNotNull,
          expr("shiftleft(CAST(1 AS BIGINT), 49 - rank)"))).as("s_hit"),
        (lit(m) - count(col("bucket"))).as("zeros"))
      .select(col("col_name"), col("n_rows"), col("n_nonnull"),
        col("zeros"), col("min_v"), col("max_v"), col("mean_v"),
        (lit(alpha * m.toDouble * m.toDouble * math.pow(2.0, 49)) /
          (col("s_hit") + col("zeros") * lit(1L << 49)).cast("double")).as("raw"))
      .select(col("col_name"), col("n_rows"), col("n_nonnull"),
        when(col("raw") <= 2.5 * m && col("zeros") > 0,
          round(lit(m.toDouble) * log(lit(m.toDouble) / col("zeros").cast("double"))))
          .otherwise(round(col("raw"))).cast("long").as("nd_sketch"),
        col("min_v"), col("max_v"), col("mean_v"))
  }

  /** Scalar string/date/JSON function surface over events (SURVEY.md §2.3 —
    * absent in the reference, declared free Catalyst-native engine surface).
    */
  def eventPropsExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        upper(col("event_type")).as("type_u"),
        to_date(col("ts")).as("day"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .where(col("k") % 7 === 0)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ArrayMath

/** Statistics & model-evaluation metrics (SURVEY.md §2.5, §2.9).
  * Every metric is one aggregation pipeline: partial-aggregated map-side,
  * merged on a handful of keys — the `main_op/reduce_op/final_op` triple of
  * reference linalg/reduce.cuh:148 expressed as Catalyst aggregates.
  *
  * Label fixture: truth = embeddings.label (0..9), pred = vec_id % 10 —
  * deterministic and oracle-reproducible.
  */
object StatsOps {

  /** (truth, pred) pairs derived deterministically from embeddings. */
  def labelPairs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select(
      col("vec_id").as("id"),
      col("label").cast("long").as("truth"),
      pmod(col("vec_id"), lit(10)).as("pred"))

  /** accuracy: fraction pred == truth — reference: stats/accuracy.cuh:49. */
  def accuracy(spark: SparkSession, dir: String): DataFrame =
    labelPairs(spark, dir).agg(
      round(avg(when(col("pred") === col("truth"), 1.0).otherwise(0.0)), 6).as("accuracy"))

  /** contingency_matrix: cross-tab counts —
    * reference: stats/contingency_matrix.cuh:114. */
  def contingency(spark: SparkSession, dir: String): DataFrame =
    labelPairs(spark, dir).groupBy(col("truth"), col("pred")).agg(count(lit(1)).as("cnt"))

  /** Shannon entropy of the truth labeling — reference: stats/entropy.cuh:58. */
  def entropy(spark: SparkSession, dir: String): DataFrame = {
    val counts = labelPairs(spark, dir).groupBy(col("truth")).agg(count(lit(1)).as("c"))
    counts.agg(sum(col("c")).as("n"), sum(col("c") * log(col("c"))).as("clogc"))
      .select(round(log(col("n")) - col("clogc") / col("n"), 6).as("entropy"))
  }

  /** mutual_info_score: MI of two labelings from the contingency matrix —
    * reference: stats/mutual_info_score.cuh:59.
    * MI = Σ_ij (n_ij/n) · ln(n·n_ij / (a_i·b_j)).
    */
  def mutualInfo(spark: SparkSession, dir: String): DataFrame = {
    val ct = contingency(spark, dir)
    val ai = ct.groupBy(col("truth")).agg(sum(col("cnt")).as("a"))
    val bj = ct.groupBy(col("pred")).agg(sum(col("cnt")).as("b"))
    val n = ct.agg(sum(col("cnt")).as("n"))
    ct.join(broadcast(ai), Seq("truth")).join(broadcast(bj), Seq("pred"))
      .crossJoin(broadcast(n))
      .agg(round(sum((col("cnt") / col("n")) *
        log(col("n") * col("cnt") / (col("a") * col("b")))), 6).as("mi"))
  }

  /** rand_index + adjusted_rand_index (pair-counting agreement) —
    * reference: stats/rand_index.cuh:49, adjusted_rand_index.cuh:61. */
  def randIndex(spark: SparkSession, dir: String): DataFrame = {
    val ct = contingency(spark, dir).cache()
    val sij = ct.agg(sum(col("cnt") * (col("cnt") - 1) / 2).as("sij"),
      sum(col("cnt")).as("n"))
    val si = ct.groupBy(col("truth")).agg(sum(col("cnt")).as("a"))
      .agg(sum(col("a") * (col("a") - 1) / 2).as("si"))
    val sj = ct.groupBy(col("pred")).agg(sum(col("cnt")).as("b"))
      .agg(sum(col("b") * (col("b") - 1) / 2).as("sj"))
    sij.crossJoin(si).crossJoin(sj)
      .select(
        round((col("n") * (col("n") - 1) / 2 + col("sij") * 2 - col("si") - col("sj"))
          / (col("n") * (col("n") - 1) / 2), 6).as("rand_index"),
        round((col("sij") - col("si") * col("sj") / (col("n") * (col("n") - 1) / 2)) /
          ((col("si") + col("sj")) / 2 - col("si") * col("sj") / (col("n") * (col("n") - 1) / 2)),
          6).as("ari"))
  }

  /** homogeneity / completeness / v_measure from conditional entropies —
    * reference: stats/homogeneity_score.cuh:62, completeness_score.cuh:59,
    * v_measure.cuh:62.
    * H(C|K) = −Σ_ij (n_ij/n)·ln(n_ij/b_j); h = 1 − H(C|K)/H(C).
    */
  def vMeasure(spark: SparkSession, dir: String): DataFrame = {
    val ct = contingency(spark, dir).cache()
    val ai = ct.groupBy(col("truth")).agg(sum(col("cnt")).as("a"))
    val bj = ct.groupBy(col("pred")).agg(sum(col("cnt")).as("b"))
    val n = ct.agg(sum(col("cnt")).as("n"))
    val joined = ct.join(broadcast(ai), Seq("truth"))
      .join(broadcast(bj), Seq("pred")).crossJoin(broadcast(n))
    val hck = joined.agg((-sum((col("cnt") / col("n")) * log(col("cnt") / col("b")))).as("hck"))
    val hkc = joined.agg((-sum((col("cnt") / col("n")) * log(col("cnt") / col("a")))).as("hkc"))
    val hc = ai.crossJoin(broadcast(n))
      .agg((-sum((col("a") / col("n")) * log(col("a") / col("n")))).as("hc"))
    val hk = bj.crossJoin(broadcast(n))
      .agg((-sum((col("b") / col("n")) * log(col("b") / col("n")))).as("hk"))
    val h = (lit(1.0) - col("hck") / col("hc")).as("homogeneity")
    val c = (lit(1.0) - col("hkc") / col("hk")).as("completeness")
    hck.crossJoin(hkc).crossJoin(hc).crossJoin(hk)
      .select(h, c)
      .select(round(col("homogeneity"), 6).as("homogeneity"),
        round(col("completeness"), 6).as("completeness"),
        round(lit(2.0) * col("homogeneity") * col("completeness")
          / (col("homogeneity") + col("completeness")), 6).as("v_measure"))
  }

  /** KL divergence between truth and pred label distributions —
    * reference: stats/kl_divergence.cuh:54 (Σ p·ln(p/q)). */
  def klDivergence(spark: SparkSession, dir: String): DataFrame = {
    val lp = labelPairs(spark, dir)
    val p = lp.groupBy(col("truth").as("k")).agg(count(lit(1)).as("pc"))
    val qd = lp.groupBy(col("pred").as("k")).agg(count(lit(1)).as("qc"))
    val n = lp.agg(count(lit(1)).as("n"))
    p.join(qd, Seq("k")).crossJoin(broadcast(n))
      .agg(round(sum((col("pc") / col("n")) * log(col("pc").cast("double") / col("qc"))), 6).as("kl"))
  }

  /** r2_score + regression metrics (MAE/MSE/median-AE) for a deterministic
    * prediction pair: y = row sum of vec, ŷ = 2 × sum of first 32 lanes —
    * reference: stats/r2_score.cuh:63, regression_metrics.cuh:67.
    */
  def regressionPair(spark: SparkSession, dir: String): DataFrame =
    Tables.vectors(spark, dir).select(
      col("id"),
      ArrayMath.rowSum(col("vec")).as("y"),
      (ArrayMath.rowSum(expr("slice(vec, 1, 32)")) * 2.0).as("yhat"))

  def r2Score(spark: SparkSession, dir: String): DataFrame = {
    val p = regressionPair(spark, dir)
    val m = p.agg(avg(col("y")).as("ybar"))
    p.crossJoin(broadcast(m))
      .agg(sum(pow(col("y") - col("yhat"), 2)).as("ssres"),
        sum(pow(col("y") - col("ybar"), 2)).as("sstot"))
      .select(round(lit(1.0) - col("ssres") / col("sstot"), 6).as("r2"))
  }

  def regressionMetrics(spark: SparkSession, dir: String): DataFrame =
    regressionPair(spark, dir)
      .agg(
        round(avg(abs(col("y") - col("yhat"))), 6).as("mae"),
        round(avg(pow(col("y") - col("yhat"), 2)), 6).as("mse"),
        round(expr("percentile(abs(y - yhat), 0.5)"), 6).as("median_ae"))

  /** Fixed-width histogram of l_quantity — reference: stats/histogram.cuh:52.
    * Bin = floor((x − lo)/width); pure group-by, map-side combinable. */
  def histogram(spark: SparkSession, dir: String, lo: Double, width: Double): DataFrame =
    Tables.lineitem(spark, dir)
      .select(floor((col("l_quantity") - lo) / width).cast("long").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))

  /** Single-pass per-column mean+var (meanvar) over lineitem numerics —
    * reference: stats/meanvar.cuh:39 (mergeable (n, Σx, Σx²) partials —
    * exactly what Catalyst's avg/var_samp partials maintain). */
  def meanVar(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).agg(
      round(avg(col("l_quantity")), 6).as("qty_mean"),
      round(var_samp(col("l_quantity")), 6).as("qty_var"),
      round(avg(col("l_extendedprice")), 4).as("price_mean"),
      round(var_samp(col("l_extendedprice")), 2).as("price_var"),
      round(avg(col("l_discount")), 6).as("disc_mean"),
      round(var_samp(col("l_discount")), 6).as("disc_var"))

  /** Per-column min/max — reference: stats/minmax.cuh:49. */
  def minMax(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).agg(
      round(min(col("l_quantity")), 4).as("qty_min"),
      round(max(col("l_quantity")), 4).as("qty_max"),
      round(min(col("l_extendedprice")), 4).as("price_min"),
      round(max(col("l_extendedprice")), 4).as("price_max"))

  /** weighted_mean: Σ(w·x)/Σw — reference: stats/weighted_mean.cuh:36. */
  def weightedMean(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).agg(
      round(sum(col("l_quantity") * col("l_extendedprice")) / sum(col("l_quantity")), 4)
        .as("wmean_price"))

  /** Covariance matrix (3×3) of (l_quantity, l_extendedprice, l_discount) —
    * reference: stats/cov.cuh:38. Emitted as COO (i, j, cov). At large d the
    * scale path is a gram-matrix TypedImperativeAggregate (SURVEY §4); for
    * d=3 the pairwise covar_samp aggregate is one pass.
    */
  def covariance(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val aggs = for { i <- cols.indices; j <- cols.indices if i <= j } yield
      round(covar_samp(col(cols(i)), col(cols(j))), 4).as(s"c_${i}_$j")
    val wide = li.agg(aggs.head, aggs.tail: _*)
    val entries = for { i <- cols.indices; j <- cols.indices if i <= j } yield
      struct(lit(i).as("i"), lit(j).as("j"), col(s"c_${i}_$j").as("cov"))
    wide.select(explode(array(entries: _*)).as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"), col("e.cov").as("cov"))
  }

  /** Spearman rank correlation with AVERAGE ranks for ties (the textbook
    * convention): avg_rank(v) = #\{values < v\} + (#\{values = v\}+1)/2,
    * built from the per-value count table with a DISTRIBUTED prefix sum
    * (RankUtils — no global window even when the value domain is
    * row-sized, e.g. prices), joined back value-keyed, then Pearson corr
    * of the two rank columns. Everything is a keyed aggregate/join; the
    * only ordered structure is the range-partitioned prefix sum. */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    def avgRanks(c: String): DataFrame = {
      val counts = df.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
      RankUtils.globalPrefixSum(counts, Seq(col("v")), col("cnt"), "cum")
        .select(col("v").as(c),
          (col("cum") - col("cnt") + (col("cnt") + 1) / 2.0).as(s"rank_$c"))
    }
    df.select(col(xCol), col(yCol))
      .join(avgRanks(xCol), Seq(xCol))
      .join(avgRanks(yCol), Seq(yCol))
      .agg((round(corr(col(s"rank_$xCol"), col(s"rank_$yCol")), 6) + 0.0)
        .as("spearman"))
  }

  /** cluster_dispersion: Σ_k n_k·‖c_k − c‖² over label clusters —
    * reference: stats/dispersion.cuh:40. Centroids via lane explode +
    * two-level aggregation; everything stays keyed by (label, pos).
    */
  def clusterDispersion(spark: SparkSession, dir: String): DataFrame = {
    val lanes = Tables.vectors(spark, dir)
      .select(col("label"), posexplode(col("vec")).as(Seq("pos", "x")))
    val cent = lanes.groupBy(col("label"), col("pos"))
      .agg(avg(col("x")).as("ck"), count(lit(1)).as("nk"))
    val glob = lanes.groupBy(col("pos")).agg(avg(col("x")).as("c"))
    cent.join(broadcast(glob), Seq("pos"))
      .agg(round(sum(col("nk") * pow(col("ck") - col("c"), 2)), 4).as("dispersion"))
  }

  /** Exact quantiles (linear interpolation) of a measure column — the
    * select/radix-based quantile primitive of the reference's select_k
    * family. Shape: distributed range-partitioned sort + global index
    * (`zipWithIndex` — one count job over partition sizes), then a
    * filter to the ≤ 2·|qs| boundary positions and linear interpolation
    * on the driver. This is the TeraSort selection shape: no
    * value→count hash map ever materializes (Spark's exact `percentile`
    * aggregate builds one per task and merges them — measured 3× slower
    * here and memory-bound by distinct-value count at scale), and the
    * sort is the same keyed range exchange a 1000-executor sort uses.
    * approx_percentile stays the sketch path when one pass must suffice.
    */
  def quantiles(spark: SparkSession, dir: String, qs: Seq[Double]): DataFrame = {
    val vals = Tables.lineitem(spark, dir)
      .select(col("l_extendedprice").cast("double"))
      .where(col("l_extendedprice").isNotNull)
      .rdd.map(_.getDouble(0))
    // n from the cheap pre-sort scan; the sorted lineage executes once
    // (zipWithIndex's size job materializes the sort shuffle, the boundary
    // filter below reuses it as a skipped stage)
    val n = vals.count()
    if (n == 0) {
      // match the percentile aggregate's empty-input behavior: no rows
      return spark.createDataFrame(Seq.empty[(Int, Double)]).toDF("i", "v")
    }
    val sorted = vals.sortBy(identity).zipWithIndex()
      .map { case (v, i) => (i, v) }
    val targets = qs.flatMap { q =>
      val p = q * (n - 1)
      Seq(math.floor(p).toLong, math.ceil(p).toLong)
    }.distinct.toSet
    val bc = spark.sparkContext.broadcast(targets)
    val picked = sorted.filter { case (i, _) => bc.value.contains(i) }
      .collect().toMap
    val rows = qs.zipWithIndex.map { case (q, i) =>
      val p = q * (n - 1)
      val lo = picked(math.floor(p).toLong)
      val hi = picked(math.ceil(p).toLong)
      val frac = p - math.floor(p)
      (i, BigDecimal(lo + (hi - lo) * frac)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    spark.createDataFrame(rows).toDF("i", "v")
  }

  /** Mergeable APPROXIMATE quantiles via a deterministic HDR-style
    * log-linear histogram sketch — the one-pass 100 TB quantile path
    * beside [[quantiles]]' exact sort, the same pairing the repo gives
    * count-distinct (exact groupBy vs the explicit HLL). Non-negative
    * integer values bucket by (exponent, 5-bit mantissa):
    *
    *   v < 32            → bucket = v                      (exact)
    *   else e = bitlen(v)−1 → bucket = (e−4)·32 + (v >> (e−5)) − 32
    *
    * so every bucket spans ≤ 1/32 relative range and the sketch is a
    * few hundred counts no matter how large n is. The build is ONE
    * map-side-combinable aggregate (counts merge across executors /
    * days / shards — that mergeability is what approx_percentile's GK
    * sketch buys, here with bit-exact determinism instead of
    * order-dependent compression). Quantile q = lower bound of the
    * first bucket whose cumulative count reaches ceil(q·n), all
    * integer arithmetic — replayed identically by the SQL oracle.
    * The cumulative window runs over the ≤ ~700-row sketch, not data.
    */
  /** HDR bucket id of a non-negative BIGINT column named `v` (see
    * [[quantileSketch]]); shared with the streaming sketch twin. The
    * codegen'd [[graft.functions.HdrBucket]] — two integer ops per row;
    * the declarative `length(bin(v))` twin allocates a string per row
    * and lives on in the property suite as the equivalence oracle. */
  def hdrBucket: Column = graft.functions.HdrBucket.bucket(col("v"))

  /** [[hdrBucket]] with the sketch's non-negative domain enforced LOUDLY:
    * a negative v maps to a NULL bucket, which would sort first in the
    * cumulative window and silently skew the low quantiles — fail the
    * job instead (the streaming twin filters at its gate already). */
  def hdrBucketChecked: Column =
    when(col("v") < 0L, raise_error(concat(
      lit("quantile sketch domain error: negative input v="), col("v").cast("string"))))
      .otherwise(hdrBucket)

  /** The declarative twin (string-exponent form) — property-tested equal
    * to [[hdrBucket]] on every v ≥ 0; the SQL oracles replay this shape. */
  def hdrBucketDeclarative: Column = when(col("v") < 32L, col("v")).otherwise(
    (length(bin(col("v"))).cast("long") - 5L) * 32L +
      expr("v div CAST(power(2, length(bin(v)) - 6) AS BIGINT)") - 32L)

  /** Lower bound of an HDR bucket (the sketch's quantile estimate).
    * Built from the passed Column (bucket ids are ≤ ~1900 so the
    * floor-division and power stay exact in double): the earlier
    * `expr("... bucket div 32 ...")` string form silently name-coupled
    * to a column literally called `bucket`. */
  def hdrLowerBound(bucket: Column): Column = {
    val e = (floor(bucket / lit(32L)).cast("long") - 1L).cast("double")
    when(bucket < 32L, bucket).otherwise(
      (bucket % 32L + 32L) * pow(lit(2.0), e).cast("long"))
  }

  def quantileSketch(values: DataFrame,
      qs: Seq[(Long, Long)] = Seq((1L, 2L), (9L, 10L), (99L, 100L), (999L, 1000L))): DataFrame = {
    val spark = values.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val sketch = values.select(hdrBucketChecked.as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    val cum = sketch.withColumn("cum", sum(col("cnt")).over(
      Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = sketch.agg(sum(col("cnt")).as("n"))
    val ranks = qs.toDF("num", "den").crossJoin(broadcast(tot))
      .select(col("num"), col("den"),
        expr("(num * n + den - 1) div den").as("rank"))
    val est = hdrLowerBound(col("bucket"))
    ranks.join(cum, col("cum") >= col("rank"))
      .groupBy(col("num"), col("den"), col("rank"))
      .agg(min(col("bucket")).as("bucket"))
      .select((col("num").cast("double") / col("den")).as("q"),
        col("rank"), est.cast("long").as("est"))
  }

  /** Per-GROUP quantile sketches — [[quantileSketch]] keyed by a group
    * column (the production shape: percentiles per tenant / source /
    * day). The sketch build stays one map-side-combinable aggregate,
    * now keyed (group, bucket); the cumulative pick runs per group over
    * each group's ≤ ~700 cells. Input: (g, v). Output: (g, q, rank, est). */
  def quantileSketchBy(values: DataFrame,
      qs: Seq[(Long, Long)] = Seq((1L, 2L), (9L, 10L), (99L, 100L))): DataFrame = {
    val spark = values.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val sketch = values.select(col("g"), hdrBucketChecked.as("bucket"))
      .groupBy(col("g"), col("bucket")).agg(count(lit(1)).as("cnt"))
    val cum = sketch.withColumn("cum", sum(col("cnt")).over(
      Window.partitionBy(col("g")).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = sketch.groupBy(col("g")).agg(sum(col("cnt")).as("n"))
    val ranks = qs.toDF("num", "den").crossJoin(broadcast(tot))
      .select(col("g"), col("num"), col("den"),
        expr("(num * n + den - 1) div den").as("rank"))
    ranks.join(cum, Seq("g")).where(col("cum") >= col("rank"))
      .groupBy(col("g"), col("num"), col("den"), col("rank"))
      .agg(min(col("bucket")).as("bucket"))
      .select(col("g"), (col("num").cast("double") / col("den")).as("q"),
        col("rank"), hdrLowerBound(col("bucket")).cast("long").as("est"))
  }

  /** HDR sketch MERGE identity, proven in-data (the quantile counterpart
    * of the HLL register union): build one sketch per half of the corpus
    * (split by row parity — any shard split works), SUM the bucket
    * counts, and the quantiles derived from the merged sketch equal the
    * direct whole-corpus sketch's — exactly, because bucket counts are
    * plain addends. This is why per-day / per-shard sketches roll up at
    * 100 TB without rescanning rows. Output: (q, rank, est_merged,
    * est_direct) — the two estimate columns are equal by construction. */
  def quantileSketchMerge(values: DataFrame,
      qs: Seq[(Long, Long)] = Seq((1L, 2L), (9L, 10L), (99L, 100L))): DataFrame = {
    val halves = values.select((col("v") % 2L).as("g"), col("v"))
    val merged = halves.select(col("g"), hdrBucketChecked.as("bucket"))
      .groupBy(col("g"), col("bucket")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("cnt")) // the MERGE
    val direct = values.select(hdrBucketChecked.as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    def pick(sketch: DataFrame, name: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val spark = values.sparkSession
      import spark.implicits._
      val cum = sketch.withColumn("cum", sum(col("cnt")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val tot = sketch.agg(sum(col("cnt")).as("n"))
      qs.toDF("num", "den").crossJoin(broadcast(tot))
        .select(col("num"), col("den"), expr("(num * n + den - 1) div den").as("rank"))
        .join(cum, col("cum") >= col("rank"))
        .groupBy(col("num"), col("den"), col("rank"))
        .agg(min(col("bucket")).as("bucket"))
        .select(col("num"), col("den"), col("rank"),
          hdrLowerBound(col("bucket")).cast("long").as(name))
    }
    pick(merged, "est_merged")
      .join(pick(direct, "est_direct"), Seq("num", "den", "rank"))
      .select((col("num").cast("double") / col("den")).as("q"),
        col("rank"), col("est_merged"), col("est_direct"))
  }

  /** popc: total population count over a bigint column —
    * reference: util/popc.cuh:23, core/bitset.hpp:124 (bitset.count). */
  def popCount(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(sum(bit_count(col("l_orderkey"))).as("popc"))

  /** information_criterion (AIC/AICc/BIC) per label from the Gaussian MLE
    * log-likelihood of lane 0 — reference: stats/information_criterion.cuh:85,
    * IC_Type stats_types.hpp:63. k=2 parameters (μ, σ²).
    */
  def informationCriterion(spark: SparkSession, dir: String): DataFrame = {
    val x0 = Tables.vectors(spark, dir)
      .select(col("label"), element_at(col("vec"), 1).as("x"))
    val k = 2.0
    x0.groupBy(col("label"))
      .agg(count(lit(1)).cast("double").as("n"), var_pop(col("x")).as("v"))
      .select(col("label"),
        (lit(-0.5) * col("n") * (log(lit(2 * math.Pi) * col("v")) + 1.0)).as("ll"),
        col("n"))
      .select(col("label"),
        round(lit(2 * k) - col("ll") * 2.0, 4).as("aic"),
        round(lit(2 * k) - col("ll") * 2.0
          + lit(2 * k * (k + 1)) / (col("n") - k - 1), 4).as("aicc"),
        round(log(col("n")) * k - col("ll") * 2.0, 4).as("bic"))
  }

  /** Mean silhouette score over the first 100 vectors —
    * reference: stats/silhouette_score.cuh:91. Blocked cross-join of
    * pairwise distances (the batched variant's strategy), then per-point
    * a(i)/b(i) aggregation.
    */
  def silhouette(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.vectors(spark, dir).where(col("id") < 100)
      .select(col("id"), col("vec"), col("label"))
    val a = v.select(col("id").as("i"), col("vec").as("va"), col("label").as("la"))
    val b = v.select(col("id").as("j"), col("vec").as("vb"), col("label").as("lb"))
    val pair = a.join(broadcast(b), col("i") =!= col("j"))
      .select(col("i"), col("la"), col("lb"),
        sqrt(greatest(ArrayMath.foldSum(ArrayMath.sub(col("va"), col("vb")), x => x * x), lit(0.0)))
          .as("dist"))
    silhouetteFromPairs(pair)
  }

  /** a(i)/b(i) tail shared by the plain and batched silhouette forms:
    * per-(point, other-label) mean distance, then the standard
    * (b−a)/max(a,b) average. Everything after the pair stage is n·k
    * rows, map-side partially aggregated. */
  private def silhouetteFromPairs(pair: DataFrame): DataFrame = {
    val perCluster = pair.groupBy(col("i"), col("la"), col("lb"))
      .agg(avg(col("dist")).as("mean_d"))
    val ai = perCluster.where(col("la") === col("lb"))
      .select(col("i"), col("mean_d").as("a_i"))
    val bi = perCluster.where(col("la") =!= col("lb"))
      .groupBy(col("i")).agg(min(col("mean_d")).as("b_i"))
    ai.join(bi, Seq("i"))
      .select(col("i"), ((col("b_i") - col("a_i")) / greatest(col("a_i"), col("b_i"))).as("s"))
      .agg(round(avg(col("s")), 6).as("silhouette"))
  }

  /** silhouette_score_batched: the scale path — reference:
    * stats/silhouette_score.cuh:137 (`silhouette_score_batched` exists
    * precisely because the plain form materializes the full n×n pass;
    * the batched kernel walks the distance matrix in fixed-size tiles).
    * Spark-first tiling: assign every point a block id (`id mod nB`, so
    * blocks are balanced under any id distribution), replicate the LEFT
    * side once per block, and join on the block id — an EQUI-join, so
    * candidate generation is a hash/merge join whose per-task build side
    * is ONE block (≤ blockRows rows), never the whole right side and
    * never a CartesianProduct. Total pair work is still n² (silhouette's
    * exact semantics — mean distances have no sketchable shortcut), but
    * memory per task is bounded by the tile and the post-pair shuffle is
    * n·k after map-side partial aggregation.
    */
  def silhouetteBatched(v: DataFrame, blockRows: Long): DataFrame = {
    val n = v.count()
    val nB = math.max(1L, (n + blockRows - 1) / blockRows)
    val left = v.select(col("id").as("i"), col("vec").as("va"), col("label").as("la"))
      .withColumn("bj", explode(sequence(lit(0L), lit(nB - 1))))
    val right = v.select(col("id").as("j"), col("vec").as("vb"), col("label").as("lb"),
      pmod(col("id"), lit(nB)).as("bj"))
    val pair = left.join(right, Seq("bj")).where(col("i") =!= col("j"))
      .select(col("i"), col("la"), col("lb"),
        sqrt(greatest(ArrayMath.foldSum(ArrayMath.sub(col("va"), col("vb")), x => x * x), lit(0.0)))
          .as("dist"))
    silhouetteFromPairs(pair)
  }

  /** Pearson chi-squared independence test + Cramér's V over the
    * (truth, pred) contingency matrix — the hypothesis-test companion of
    * [[contingency]]/[[mutualInfo]] (reference: stats/contingency_matrix
    * .cuh:114 exposes the cross-tab; the test statistic is its standard
    * consumer). Uses the observed-cells-only identity
    *   χ² = n·(Σ_obs o²/(a_i·b_j) − 1)
    * (zero-observed cells contribute exactly their expectation e, and
    * Σ_all e = n), so the full r×c cell grid is never generated — the
    * whole test is the contingency aggregate, two broadcast margins and
    * one scalar fold, linear in OBSERVED cells at any scale. */
  def chiSquared(spark: SparkSession, dir: String): DataFrame =
    chiSquaredFrom(contingency(spark, dir))

  /** [[chiSquared]] on a caller-supplied contingency table
    * (truth, pred, cnt). */
  def chiSquaredFrom(ctIn: DataFrame): DataFrame = {
    val ct = ctIn.localCheckpoint(true)
    val ai = ct.groupBy(col("truth")).agg(sum(col("cnt")).as("a"))
    val bj = ct.groupBy(col("pred")).agg(sum(col("cnt")).as("b"))
    val dims = ct.agg(sum(col("cnt")).cast("double").as("n"),
      countDistinct(col("truth")).as("r"), countDistinct(col("pred")).as("c"))
    ct.join(broadcast(ai), Seq("truth")).join(broadcast(bj), Seq("pred"))
      .crossJoin(broadcast(dims))
      .agg(sum(col("cnt") * col("cnt") / (col("a") * col("b"))).as("s"),
        max(col("n")).as("n"), max(col("r")).as("r"), max(col("c")).as("c"))
      .select(
        (round(col("n") * (col("s") - 1), 4) + 0.0).as("chi2"),
        ((col("r") - 1) * (col("c") - 1)).as("dof"),
        (round(sqrt((col("s") - 1) / least(col("r") - 1, col("c") - 1)), 6) + 0.0)
          .as("cramers_v"))
  }

  /** Two-sample Kolmogorov–Smirnov test — the distribution-drift gate a
    * curation pipeline runs between corpus slices (old vs new crawl, one
    * source vs the rest): D = sup_x |F₁(x) − F₂(x)|. Distributed shape:
    * ONE per-value count table with a conditional count per side, a
    * RankUtils range-partitioned prefix sum per side (never a global
    * window), and a scalar max — the same discrete-ECDF formulation both
    * engines compute exactly, ties included. Returns D, the scaled
    * statistic z = D·√(n₁n₂/(n₁+n₂)) and its asymptotic two-sided
    * p-value 2·exp(−2z²). `inG1` must be a non-null boolean expression. */
  def ksTest(df: DataFrame, valueCol: String, inG1: Column): DataFrame = {
    val counts = df
      .select(col(valueCol).as("v"), inG1.cast("long").as("g"))
      .groupBy(col("v"))
      .agg(sum(col("g")).as("c1"), sum(lit(1L) - col("g")).as("c2"))
    val cum = RankUtils.globalPrefixSum(
      RankUtils.globalPrefixSum(counts, Seq(col("v")), col("c1"), "cum1"),
      Seq(col("v")), col("c2"), "cum2")
    val tot = counts.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    // n₁·n₂ in double: the long product overflows past ~3e9 rows/side
    val z = col("d") *
      sqrt(col("n1").cast("double") * col("n2") / (col("n1") + col("n2")))
    cum.crossJoin(broadcast(tot))
      .agg(max(abs(col("cum1") / col("n1") - col("cum2") / col("n2"))).as("d"),
        max(col("n1")).as("n1"), max(col("n2")).as("n2"))
      .select(col("n1"), col("n2"), (round(col("d"), 6) + 0.0).as("d"),
        (round(z, 6) + 0.0).as("z"),
        (round(least(lit(1.0), lit(2.0) * exp(lit(-2.0) * z * z)), 6) + 0.0)
          .as("p_value"))
  }

  /** Welch's unequal-variance t-test + Cohen's d effect size — the
    * parametric mean-shift companion of [[ksTest]]/[[mannWhitneyU]]:
    *   t = (x̄₁−x̄₂)/√(s₁²/n₁+s₂²/n₂),  ν by Welch–Satterthwaite,
    *   d = (x̄₁−x̄₂)/s_pooled.
    * One conditional-moment aggregate (n, Σx, Σx² per side — the same
    * mergeable partials every meanvar in this file uses), then closed
    * forms in a projection. */
  def welchTTest(df: DataFrame, valueCol: String, inG1: Column): DataFrame = {
    val m = df.select(col(valueCol).cast("double").as("x"),
        inG1.cast("long").as("g"))
      .agg(sum(col("g")).as("n1"), sum(lit(1L) - col("g")).as("n2"),
        sum(col("x") * col("g")).as("s1"),
        sum(col("x") * (lit(1L) - col("g"))).as("s2"),
        sum(col("x") * col("x") * col("g")).as("q1"),
        sum(col("x") * col("x") * (lit(1L) - col("g"))).as("q2"))
    val mean1 = col("s1") / col("n1")
    val mean2 = col("s2") / col("n2")
    val var1 = (col("q1") - col("s1") * col("s1") / col("n1")) / (col("n1") - 1)
    val var2 = (col("q2") - col("s2") * col("s2") / col("n2")) / (col("n2") - 1)
    val se1 = var1 / col("n1")
    val se2 = var2 / col("n2")
    val pooled = sqrt(((col("n1") - 1) * var1 + (col("n2") - 1) * var2) /
      (col("n1") + col("n2") - 2))
    m.select(col("n1"), col("n2"),
      (round((mean1 - mean2) / sqrt(se1 + se2), 6) + 0.0).as("t"),
      (round((se1 + se2) * (se1 + se2) /
        (se1 * se1 / (col("n1") - 1) + se2 * se2 / (col("n2") - 1)), 4) + 0.0).as("df"),
      (round((mean1 - mean2) / pooled, 6) + 0.0).as("cohens_d"))
  }

  /** Population stability index — the binned drift score a production
    * pipeline alarms on between a reference and a current slice:
    *   PSI = Σ_bins (p_b − q_b)·ln(p_b/q_b)
    * with Laplace-smoothed bin shares p_b = (c_b+1)/(n+B) so empty bins
    * never produce ±∞ (the standard practical guard). The split is the
    * exact midpoint of the value-time range in MICROSECONDS (integer
    * arithmetic — both engines compute the identical boundary), bins
    * are fixed-width clamped like [[histogram]]. One scan, one B-key
    * aggregate, one broadcast of the 2-row totals — trivially 100 TB
    * safe. Rule of thumb the output enables: <0.1 stable, >0.25 act. */
  def psi(events: DataFrame, valueCol: String, tsCol: String,
      lo: Double, width: Double, bins: Int): DataFrame = {
    val mid = events.select(unix_micros(col(tsCol)).as("us"))
      .agg(expr("(min(us) + max(us)) div 2").as("mid"))
    val binned = events.crossJoin(broadcast(mid))
      .select(
        least(lit(bins - 1L), greatest(lit(0L),
          floor((col(valueCol) - lo) / width).cast("long"))).as("bin"),
        when(unix_micros(col(tsCol)) <= col("mid"), 1L).otherwise(0L).as("ref"))
      .groupBy(col("bin"))
      .agg(sum(col("ref")).as("cr"), sum(lit(1L) - col("ref")).as("cc"))
    val tot = binned.agg(sum(col("cr")).as("nr"), sum(col("cc")).as("nc"))
    // full B-bin spine: a bin empty in both slices still contributes
    // (its smoothed shares differ whenever n_ref != n_cur)
    val spine = events.sparkSession.range(bins).select(col("id").as("bin"))
    val full = spine.join(binned, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("cc"), lit(0L)).as("cc"))
    full.crossJoin(broadcast(tot))
      .select(col("cr"), col("cc"), col("nr"), col("nc"),
        ((col("cr") + 1) / (col("nr") + lit(bins)).cast("double")).as("p"),
        ((col("cc") + 1) / (col("nc") + lit(bins)).cast("double")).as("q"))
      .agg(max(col("nr")).as("n_ref"), max(col("nc")).as("n_cur"),
        (round(sum((col("p") - col("q")) * log(col("p") / col("q"))), 6) + 0.0).as("psi"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) two-sample test — the rank-based
    * drift/shift gate beside [[ksTest]] (sensitive to location shift
    * where KS is sup-norm). Tie-corrected normal approximation:
    *   U₁ = R₁ − n₁(n₁+1)/2,   μ = n₁n₂/2,
    *   σ² = n₁n₂/12 · ((n+1) − Σ(t³−t)/(n(n−1)))
    * with R₁ the average-rank sum of group 1 (same per-value count table
    * + RankUtils prefix sum as [[spearman]] — ties handled exactly, no
    * global window, no per-row rank materialization: everything folds
    * from the value-keyed count table). */
  def mannWhitneyU(df: DataFrame, valueCol: String, inG1: Column): DataFrame = {
    val counts = df
      .select(col(valueCol).as("v"), inG1.cast("long").as("g"))
      .groupBy(col("v"))
      .agg(sum(col("g")).as("c1"), sum(lit(1L) - col("g")).as("c2"))
      .withColumn("c", col("c1") + col("c2"))
    val r = RankUtils.globalPrefixSum(counts, Seq(col("v")), col("c"), "cum")
      .select(col("c1"), col("c2"), col("c"),
        (col("cum") - col("c") + (col("c") + 1) / 2.0).as("rank"))
    r.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
        sum(col("c1") * col("rank")).as("r1"),
        sum(col("c").cast("double") * col("c") * col("c") - col("c")).as("ties"))
      .select(col("n1"), col("n2"),
        (col("r1") - col("n1").cast("double") * (col("n1") + 1) / 2.0).as("u1"),
        col("ties"), (col("n1") + col("n2")).as("n"))
      .select(col("n1"), col("n2"), (col("u1") + 0.0).as("u1"),
        (col("n1").cast("double") * col("n2") - col("u1") + 0.0).as("u2"),
        (round((col("u1") - col("n1").cast("double") * col("n2") / 2.0) /
          sqrt(col("n1").cast("double") * col("n2") / 12.0 *
            ((col("n") + 1) - col("ties") / (col("n").cast("double") * (col("n") - 1)))), 6)
          + 0.0).as("z"))
  }

  /** ROC AUC of a score column against a binary condition — the
    * threshold-free ranking form of the accuracy/confusion metrics above
    * (stats/accuracy.cuh:38 family). AUC is exactly the rank-sum
    * statistic: AUC = U₁/(n₊·n₋) with U₁ from the average-rank sum of
    * the positives, so the whole metric folds from the per-score count
    * table + one RankUtils distributed prefix sum — identical machinery
    * to [[mannWhitneyU]]/[[spearman]], tie-exact, no per-row rank
    * materialization, no global window. Scale: the shuffle carries one
    * row per DISTINCT score, the prefix sum one boundary row per
    * partition. Also emits the Gini coefficient 2·AUC−1. */
  def rocAuc(df: DataFrame, scoreCol: String, isPos: Column): DataFrame = {
    val counts = df
      .select(col(scoreCol).as("v"), isPos.cast("long").as("g"))
      .groupBy(col("v"))
      .agg(sum(col("g")).as("c1"), sum(lit(1L) - col("g")).as("c2"))
      .withColumn("c", col("c1") + col("c2"))
    val r = RankUtils.globalPrefixSum(counts, Seq(col("v")), col("c"), "cum")
      .select(col("c1"), col("c2"),
        (col("cum") - col("c") + (col("c") + 1) / 2.0).as("rank"))
    r.agg(sum(col("c1")).as("n_pos"), sum(col("c2")).as("n_neg"),
        sum(col("c1") * col("rank")).as("r1"))
      .select(col("n_pos"), col("n_neg"),
        ((col("r1") - col("n_pos").cast("double") * (col("n_pos") + 1) / 2.0) /
          (col("n_pos").cast("double") * col("n_neg"))).as("auc"))
      .select(col("n_pos"), col("n_neg"),
        (round(col("auc"), 6) + 0.0).as("auc"),
        (round(lit(2.0) * col("auc") - 1.0, 6) + 0.0).as("gini"))
  }

  /** Proper-scoring-rule losses of a probabilistic classifier: log-loss
    * (cross-entropy) and Brier score over (p, y) pairs — one stateless
    * map + one aggregate, the canonical model-eval companion to
    * [[rocAuc]]'s ranking view. Input frame: `p` DOUBLE ∈ (0,1),
    * `y` LONG ∈ {0,1}. */
  def classificationLoss(scored: DataFrame): DataFrame =
    scored.agg(count(lit(1)).as("n"),
      (round(-avg(col("y") * log(col("p")) +
        (lit(1L) - col("y")) * log(lit(1.0) - col("p"))), 6) + 0.0).as("logloss"),
      (round(avg(pow(col("p") - col("y"), 2)), 6) + 0.0).as("brier"))

  /** Reliability diagram + expected calibration error: equal-width bins
    * over predicted probability, per-bin confidence (mean p) vs accuracy
    * (mean y), ECE = Σ (n_b/N)·|acc_b − conf_b|. One keyed aggregate over
    * ≤ `bins` groups + a broadcast of the bin table back under the ECE
    * fold — the drift-gate shape ([[psi]]) applied to model calibration.
    * Output: one row per OCCUPIED bin with the shared `ece` repeated. */
  def calibration(scored: DataFrame, bins: Int = 10): DataFrame = {
    val b = scored
      .select(least(lit(bins - 1L),
          floor(col("p") * bins).cast("long")).as("bin"),
        col("p"), col("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), avg(col("p")).as("conf"),
        avg(col("y").cast("double")).as("acc"))
    val ece = b.agg((sum(col("n") * abs(col("acc") - col("conf"))) /
        sum(col("n"))).as("ece"))
    b.crossJoin(broadcast(ece))
      .select(col("bin"), col("n"),
        (round(col("conf"), 6) + 0.0).as("conf"),
        (round(col("acc"), 6) + 0.0).as("acc"),
        (round(col("ece"), 6) + 0.0).as("ece"))
  }

  /** Kendall's τ-b rank correlation for DISCRETE value domains: fold the
    * data to the joint (x, y, cnt) cell table, then count concordant /
    * discordant pairs by a cell-level self-join — O(m²) in the number of
    * distinct cells, never O(n²) in rows (50×11 cells here; the row
    * count only enters through the cnt products). Tie terms n₁/n₂ come
    * from the marginal count tables. τ-b = (C−D)/√((n₀−n₁)(n₀−n₂)).
    * For continuous domains [[spearman]] is the scale path (prefix-sum
    * ranks); Kendall on row-distinct values would need an inversion
    * count, which this operator deliberately does not attempt. */
  def kendallTau(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).cast("double").as("cnt"))
      .localCheckpoint(true)
    val a = cells.select(col("x").as("xa"), col("y").as("ya"), col("cnt").as("ca"))
    val b = cells.select(col("x").as("xb"), col("y").as("yb"), col("cnt").as("cb"))
    val pairs = a.join(broadcast(b), col("xa") < col("xb"))
      .agg(sum(when(col("ya") < col("yb"), col("ca") * col("cb")).otherwise(0.0)).as("c"),
        sum(when(col("ya") > col("yb"), col("ca") * col("cb")).otherwise(0.0)).as("d"))
    val tx = cells.groupBy(col("x")).agg(sum(col("cnt")).as("t"))
      .agg(sum(col("t") * (col("t") - 1) / 2.0).as("n1"))
    val tyAgg = cells.groupBy(col("y")).agg(sum(col("cnt")).as("t"))
      .agg(sum(col("t") * (col("t") - 1) / 2.0).as("n2"))
    val n = cells.agg(sum(col("cnt")).as("n"))
    pairs.crossJoin(broadcast(tx)).crossJoin(broadcast(tyAgg))
      .crossJoin(broadcast(n))
      .select(col("c").cast("long").as("concordant"),
        col("d").cast("long").as("discordant"),
        (round((col("c") - col("d")) /
          sqrt((col("n") * (col("n") - 1) / 2.0 - col("n1")) *
               (col("n") * (col("n") - 1) / 2.0 - col("n2"))), 6) + 0.0).as("tau_b"))
  }

  /** Exact quantiles (linear interpolation on (n−1) positions, the
    * quantile_cont convention) of an arbitrary double RDD — the
    * TeraSort-selection core of [[quantiles]] exposed for reuse:
    * range-partitioned sort + zipWithIndex, boundary rows only to the
    * driver. */
  private[operators] def exactQuantilesOf(
      vals: org.apache.spark.rdd.RDD[Double], qs: Seq[Double]): Seq[Double] = {
    val n = vals.count()
    require(n > 0, "exactQuantilesOf: empty input")
    // persist the sorted run (r15, guide §1.2 — don't sort twice):
    // zipWithIndex's internal per-partition count materializes the sort
    // once, and without the persist the filter().collect() re-fetched the
    // shuffle and re-sorted every partition a second time
    val sortedV = vals.sortBy(identity)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sorted = sortedV.zipWithIndex()
        .map { case (v, i) => (i, v) }
      val targets = qs.flatMap { q =>
        val p = q * (n - 1)
        Seq(math.floor(p).toLong, math.ceil(p).toLong)
      }.distinct.toSet
      val bc = vals.sparkContext.broadcast(targets)
      val picked = sorted.filter { case (i, _) => bc.value.contains(i) }
        .collect().toMap
      qs.map { q =>
        val p = q * (n - 1)
        val lo = picked(math.floor(p).toLong)
        val hi = picked(math.ceil(p).toLong)
        lo + (hi - lo) * (p - math.floor(p))
      }
    } finally sortedV.unpersist(false)
  }

  /** Robust location/scale summary: median, IQR, MAD (median absolute
    * deviation from the median) and the 5/95-winsorized mean — the
    * outlier-resistant profile a curation pipeline gates on where
    * mean/stddev are skew-fragile. Two distributed exact-quantile passes
    * (the second over |x − median|) + one clamped aggregate; each pass
    * is the [[quantiles]] TeraSort shape, so only boundary rows ever
    * reach the driver. */
  def robustStats(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val vals = df.select(col(valueCol).cast("double"))
      .where(col(valueCol).isNotNull)
      .rdd.map(_.getDouble(0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val Seq(q05, q25, q50, q75, q95) =
        exactQuantilesOf(vals, Seq(0.05, 0.25, 0.5, 0.75, 0.95))
      val mad = exactQuantilesOf(vals.map(v => math.abs(v - q50)), Seq(0.5)).head
      val wm = df.select(col(valueCol).cast("double").as("x"))
        .where(col("x").isNotNull)
        .agg(avg(least(greatest(col("x"), lit(q05)), lit(q95))).as("wmean"),
          count(lit(1)).as("n"))
      wm.select(col("n"),
        (round(lit(q50), 4) + 0.0).as("median"),
        (round(lit(q75 - q25), 4) + 0.0).as("iqr"),
        (round(lit(mad), 4) + 0.0).as("mad"),
        (round(col("wmean"), 4) + 0.0).as("winsor_mean"))
    } finally vals.unpersist(false)
  }

  /** Ranking-quality metrics over per-key candidate lists: NDCG@k and
    * MRR. Relevance arrives as a grade column; ranking is by score
    * descending with a deterministic id tie-break. All windows are
    * PARTITIONED by the query key (bounded per-key lists — the allowed
    * keyed-window shape), DCG/IDCG fold per key, and the final mean is
    * one aggregate: the metric pipeline is #keys-parallel at any scale.
    * MRR counts keys with no relevant item as reciprocal rank 0 (the
    * convention that keeps the denominator = all queries). */
  def ndcgMrr(df: DataFrame, keyCol: String, scoreCol: String,
      idCol: String, grade: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(keyCol).as("g"), col(scoreCol).as("s"),
      col(idCol).as("id"), grade.cast("double").as("rel"))
    val byScore = Window.partitionBy(col("g"))
      .orderBy(col("s").desc, col("id"))
    val byRel = Window.partitionBy(col("g"))
      .orderBy(col("rel").desc, col("id"))
    val ranked = base
      .withColumn("r", row_number().over(byScore))
      .withColumn("ri", row_number().over(byRel))
    val perKey = ranked.groupBy(col("g")).agg(
      sum(when(col("r") <= k,
        (pow(lit(2.0), col("rel")) - 1.0) / log2(col("r") + 1.0)).otherwise(0.0)).as("dcg"),
      sum(when(col("ri") <= k,
        (pow(lit(2.0), col("rel")) - 1.0) / log2(col("ri") + 1.0)).otherwise(0.0)).as("idcg"),
      min(when(col("rel") >= 3.0, col("r"))).as("first_rel"))
    perKey.agg(count(lit(1)).as("n_keys"),
      (round(avg(when(col("idcg") > 0.0, col("dcg") / col("idcg"))
        .otherwise(0.0)), 6) + 0.0).as("mean_ndcg"),
      (round(avg(coalesce(lit(1.0) / col("first_rel"), lit(0.0))), 6) + 0.0).as("mrr"))
  }

  /** Autocorrelation function of a GLOBALLY ordered series at lags
    * 1..maxLag: r(k) = Σ(vₜ−μ)(vₜ₊ₖ−μ) / Σ(vₜ−μ)² — the standard
    * time-series drift/seasonality diagnostic. The global order comes
    * from ONE RankUtils TeraSort rank (never a bare window); each lag is
    * then a rank-shifted EQUI-join (the probe side exploded ×maxLag), so
    * the whole ACF is rank + join + one keyed aggregate, shuffle-bounded
    * by n·maxLag rows. μ is a broadcast 1-row aggregate. */
  def acf(series: DataFrame, sortCols: Seq[Column], valueCol: Column,
      maxLag: Int): DataFrame = {
    val ranked = RankUtils.globalRowNumber(
        series.select(sortCols :+ valueCol.as("v"): _*), sortCols, "rn")
      .select(col("rn"), col("v")).localCheckpoint(true)
    val mu = broadcast(ranked.agg(avg(col("v")).as("mu")))
    val den = ranked.crossJoin(mu)
      .agg(sum((col("v") - col("mu")) * (col("v") - col("mu"))).as("den"))
    val probe = ranked.select(
        explode(sequence(lit(1L), lit(maxLag.toLong))).as("lag"),
        col("rn"), col("v").as("vl"))
      .select(col("lag"), (col("rn") + col("lag")).as("rn"), col("vl"))
    ranked.join(probe, Seq("rn")).crossJoin(mu)
      .groupBy(col("lag"))
      .agg(sum((col("v") - col("mu")) * (col("vl") - col("mu"))).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), (round(col("num") / col("den"), 6) + 0.0).as("acf"))
  }

  /** Benjamini–Hochberg FDR control over a family of per-group mean
    * tests — the multiple-comparison step every drift/quality monitor
    * needs once it fans out over segments (the m-hypotheses sequel to
    * the single-test [[ttest]]/[[ksTest]] rows). Per group: a z-score of
    * the group mean against the global mean (population σ from the same
    * pass), two-sided p via the LOGISTIC approximation of Φ
    * (p = 2/(1+exp(1.702·|z|)), max |err| &lt; 0.0095 — the procedure
    * under test is BH, not the tail model; both engines evaluate it
    * identically). Then the BH machinery: rank p ascending, reject all
    * ranks ≤ argmax{k : p(k) ≤ α·k/m}, and adjusted
    * p(i) = min_{j≥i}(p(j)·m/j) ∧ 1 as a suffix-min window. The
    * data-sized work is ONE keyed aggregate; every window below runs on
    * the m-row hypothesis table (bounded, aggregated input). */
  def bhFdr(df: DataFrame, key1: Column, key2: Column, valueCol: Column,
      alpha: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.select(key1.as("k1"), key2.as("k2"), valueCol.as("v"))
      .groupBy(col("k1"), col("k2"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        sum(col("v") * col("v")).as("s2"))
    val tot = df.select(valueCol.as("v"))
      .agg(count(lit(1)).as("tn"), sum(col("v")).as("ts"),
        sum(col("v") * col("v")).as("ts2"))
    val withP = g.crossJoin(broadcast(tot))
      .withColumn("mu", col("ts") / col("tn"))
      .withColumn("sd", sqrt(col("ts2") / col("tn") - col("mu") * col("mu")))
      .withColumn("z",
        (col("s") / col("n") - col("mu")) / (col("sd") / sqrt(col("n"))))
      .withColumn("p", lit(2.0) / (lit(1.0) + exp(lit(1.702) * abs(col("z")))))
      .select(col("k1"), col("k2"), col("n"), col("p"))
    // everything below operates on the m-row hypothesis table
    val m = Window.partitionBy()
    val ranked = withP
      .withColumn("rn", row_number().over(
        Window.orderBy(col("p"), col("k1"), col("k2"))))
      .withColumn("m", count(lit(1)).over(m))
    val k = ranked
      .withColumn("kmax", max(when(
        col("p") <= lit(alpha) * col("rn") / col("m"), col("rn"))
        .otherwise(lit(0L))).over(m))
    k.withColumn("padj", least(lit(1.0),
        min(col("p") * col("m") / col("rn")).over(
          Window.orderBy(col("rn").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .select(col("k1"), col("k2"), col("n"),
        (round(col("p"), 6) + 0.0).as("p"),
        (round(col("padj"), 6) + 0.0).as("padj"),
        (col("rn") <= col("kmax")).as("rejected"))
  }

  /** Poisson bootstrap confidence interval for the mean of an integer
    * column — the STREAMING-friendly bootstrap (Chamandy et al. 2012,
    * "Estimating uncertainty for massive data streams"): instead of
    * resampling n rows with replacement (which needs global coordination),
    * row i's multiplicity in replicate b is an independent Poisson(1)
    * draw, here the deterministic counter-hash inverse-CDF on
    * u = h32(id:b:boot)/1e6, so any engine replays the same resample.
    * ONE pass: explode ×B inside the map stage, aggregate per replicate —
    * map-side combine collapses each task to B partial (Σcnt·x, Σcnt)
    * rows, so the shuffle is tasks×B rows, never rows×B. Both sums are
    * exact integers, every replicate mean is an exact integer ratio, and
    * the CI is the nearest-rank percentile over the B-row replicate-mean
    * table (a bounded window over aggregated input). */
  def bootstrapCI(df: DataFrame, idCol: String, valueCol: String,
      reps: Int, loRank: Int, hiRank: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // cumulative Poisson(1): P(0)=e^-1, P(<=1)=2e^-1, P(<=2)=2.5e^-1...
    val cdf = Seq(0.36787944117144233, 0.7357588823428847,
      0.9196986029286058, 0.9810118431238462, 0.9963401531726563)
    val x = df.select(col(idCol).cast("long").as("id"),
      col(valueCol).cast("long").as("x"))
    val u = (pmod(TextOps.h32(concat_ws(":", col("id"), col("b"), lit("boot"))),
      lit(1000000L)).cast("double") / 1000000.0)
    val cnt = cdf.zipWithIndex.foldRight(lit(5L): Column) {
      case ((t, k), rest) => when(u < t, k.toLong).otherwise(rest)
    }
    val means = x
      .select(col("id"), col("x"), explode(sequence(lit(0), lit(reps - 1))).as("b"))
      .select(col("x"), col("b"), cnt.as("c"))
      .groupBy(col("b"))
      .agg(sum(col("c") * col("x")).as("sx"), sum(col("c")).as("sc"))
      .select(col("b"), (col("sx").cast("double") / col("sc")).as("m"))
    val ranked = means
      .withColumn("rk", row_number().over(Window.orderBy(col("m"), col("b"))))
    val bounds = ranked.agg(
      sum(when(col("rk") === loRank, col("m"))).as("lo"),
      sum(when(col("rk") === hiRank, col("m"))).as("hi"))
    val est = x.agg((sum(col("x")).cast("double") / count(lit(1))).as("est"))
    est.crossJoin(broadcast(bounds))
      .select((round(col("est"), 6) + 0.0).as("est"),
        (round(col("lo"), 6) + 0.0).as("lo"),
        (round(col("hi"), 6) + 0.0).as("hi"),
        lit(reps.toLong).as("reps"))
  }

  /** Isotonic (monotone non-decreasing) calibration of predicted
    * probabilities over `bins` equal-width score bins — the
    * pool-adjacent-violators fit via its MINIMAX closed form:
    * fit(i) = max_{j≤i} min_{k≥i} mean(y over bins j..k), the weighted
    * PAV solution without any sequential pooling loop (Robertson/Wright/
    * Dykstra, Order Restricted Statistical Inference, Thm 1.4.4). The
    * data-sized pass is ONE keyed aggregate to the ≤bins bin table;
    * everything after (prefix sums, the bins² interval means, the
    * max-of-min fold) runs on that bounded table, so the windows below
    * sit over aggregated input — the allowed bounded-window shape. The
    * isotonic fit is the monotone counterpart of [[calibration]]'s raw
    * reliability diagram. */
  def isotonicCalibration(scored: DataFrame, bins: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = scored
      .select(least(lit(bins - 1L), floor(col("p") * bins).cast("long")).as("bin"),
        col("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).cast("double").as("w"),
        sum(col("y").cast("double")).as("s"))
    // prefix sums over the ≤bins-row aggregate (bounded window)
    val pre = b
      .withColumn("cw", sum(col("w")).over(Window.orderBy(col("bin"))))
      .withColumn("cs", sum(col("s")).over(Window.orderBy(col("bin"))))
      .localCheckpoint(true)
    val lo = pre.select(col("bin").as("j"), (col("cw") - col("w")).as("cw0"),
      (col("cs") - col("s")).as("cs0"))
    val hi = pre.select(col("bin").as("k"), col("cw").as("cw1"), col("cs").as("cs1"))
    val ivl = lo.join(hi, col("j") <= col("k"))
      .select(col("j"), col("k"),
        ((col("cs1") - col("cs0")) / (col("cw1") - col("cw0"))).as("m"))
    val bad = pre.select(col("bin").as("i"), col("w"), (col("s") / col("w")).as("raw"))
    val inner = bad.join(ivl, col("j") <= col("i") && col("i") <= col("k"))
      .groupBy(col("i"), col("w"), col("raw"), col("j"))
      .agg(min(col("m")).as("mn"))
    inner.groupBy(col("i"), col("w"), col("raw"))
      .agg(max(col("mn")).as("iso"))
      .select(col("i").as("bin"), col("w").cast("long").as("n"),
        (round(col("raw"), 6) + 0.0).as("raw"),
        (round(col("iso"), 6) + 0.0).as("iso"))
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.StatsOps
import graft.Tables

/** Stats & model-evaluation metric queries (SURVEY.md §2.9) with DuckDB
  * oracles. Label fixture: truth=embeddings.label, pred=vec_id%10.
  */
object StatsQueries extends QueryGroup {

  private val lpCte =
    """WITH lp AS (
      |  SELECT vec_id AS id, CAST(label AS BIGINT) AS truth, vec_id % 10 AS pred
      |  FROM embeddings)""".stripMargin

  private val ctCte =
    s"""$lpCte,
       |ct AS (SELECT truth, pred, count(*) AS cnt FROM lp GROUP BY 1, 2),
       |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM ct),
       |ai AS (SELECT truth, CAST(sum(cnt) AS DOUBLE) AS a FROM ct GROUP BY truth),
       |bj AS (SELECT pred, CAST(sum(cnt) AS DOUBLE) AS b FROM ct GROUP BY pred)""".stripMargin

  private val pairCte =
    """WITH p AS (
      |  SELECT vec_id AS id,
      |    list_sum(list_transform(embedding, f -> CAST(f AS DOUBLE))) AS y,
      |    2.0 * list_sum(list_transform(embedding[1:32], f -> CAST(f AS DOUBLE))) AS yhat
      |  FROM embeddings)""".stripMargin

  val q: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_accuracy" -> ((s, d) => StatsOps.accuracy(s, d)),
    "stat_contingency" -> ((s, d) => StatsOps.contingency(s, d)),
    "stat_entropy" -> ((s, d) => StatsOps.entropy(s, d)),
    "stat_mutual_info" -> ((s, d) => StatsOps.mutualInfo(s, d)),
    "stat_rand_index" -> ((s, d) => StatsOps.randIndex(s, d)),
    "stat_v_measure" -> ((s, d) => StatsOps.vMeasure(s, d)),
    "stat_kl" -> ((s, d) => StatsOps.klDivergence(s, d)),
    "stat_r2" -> ((s, d) => StatsOps.r2Score(s, d)),
    "stat_regression" -> ((s, d) => StatsOps.regressionMetrics(s, d)),
    "stat_histogram" -> ((s, d) => StatsOps.histogram(s, d, 0.0, 5.0)),
    "stat_meanvar" -> ((s, d) => StatsOps.meanVar(s, d)),
    "stat_minmax" -> ((s, d) => StatsOps.minMax(s, d)),
    "stat_weighted_mean" -> ((s, d) => StatsOps.weightedMean(s, d)),
    "stat_cov" -> ((s, d) => StatsOps.covariance(s, d)),
    // Spearman with textbook average-rank ties; ranks from a distributed
    // prefix sum over the per-value count table, never a global window
    "stat_spearman" -> ((s, d) =>
      StatsOps.spearman(Tables.lineitem(s, d), "l_quantity", "l_extendedprice")),
    // chi-squared independence + Cramér's V from observed contingency
    // cells only (zero cells folded in closed form — no r×c grid)
    "stat_chi2" -> ((s, d) => StatsOps.chiSquared(s, d)),
    // two-sample KS drift gate: doc-length distribution of the 'en'
    // slice vs the rest; discrete ECDFs from distributed prefix sums
    "stat_ks" -> ((s, d) => StatsOps.ksTest(
      Tables.documents(s, d), "n_chars", col("lang") === "en")),
    // rank-sum companion of the KS gate (location-shift sensitive),
    // tie-corrected normal approximation, same fixture
    "stat_mwu" -> ((s, d) => StatsOps.mannWhitneyU(
      Tables.documents(s, d), "n_chars", col("lang") === "en")),
    // PSI drift: first vs second half of event time, 10 clamped
    // value bins, Laplace-smoothed shares
    "stat_psi" -> ((s, d) => StatsOps.psi(
      Tables.events(s, d), "value", "ts", 0.0, 50.0, 10)),
    // parametric mean-shift test + effect size on the same en-vs-rest
    // doc-length fixture as stat_ks / stat_mwu
    "stat_ttest" -> ((s, d) => StatsOps.welchTTest(
      Tables.documents(s, d), "n_chars", col("lang") === "en")),
    "stat_dispersion" -> ((s, d) => StatsOps.clusterDispersion(s, d)),
    "stat_silhouette" -> ((s, d) => StatsOps.silhouette(s, d)),
    "stat_silhouette_batched" -> ((s, d) => StatsOps.silhouetteBatched(
      graft.Tables.vectors(s, d).where(col("id") < 100)
        .select(col("id"), col("vec"), col("label")), 32L)),
    "stat_popc" -> ((s, d) => StatsOps.popCount(s, d)),
    "stat_quantiles" -> ((s, d) =>
      StatsOps.quantiles(s, d, Seq(0.25, 0.5, 0.75, 0.95))),
    // mergeable one-pass quantile sketch (HDR log-linear buckets) over
    // price cents — the approximate scale path beside the exact sort
    "stat_quantile_sketch" -> ((s, d) =>
      StatsOps.quantileSketch(
        graft.Tables.lineitem(s, d)
          .where(col("l_extendedprice").isNotNull)
          .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v")))),
    // merge identity in-data: per-half sketches summed == direct sketch
    "stat_quantile_sketch_merge" -> ((s, d) =>
      StatsOps.quantileSketchMerge(
        graft.Tables.lineitem(s, d)
          .where(col("l_extendedprice").isNotNull)
          .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v")))),
    // the keyed form: sketches per return flag (percentiles-per-tenant)
    "stat_quantile_sketch_by" -> ((s, d) =>
      StatsOps.quantileSketchBy(
        graft.Tables.lineitem(s, d)
          .where(col("l_extendedprice").isNotNull)
          .select(col("l_returnflag").as("g"),
            expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v")))),
    "stat_info_criterion" -> ((s, d) => StatsOps.informationCriterion(s, d)),
    "stat_trustworthiness" -> ((s, d) => graft.operators.SpectralOps.trustworthiness(s, d)),
    "stat_trustworthiness_batched" -> ((s, d) =>
      graft.operators.SpectralOps.trustworthinessBatched(s, d)),
    // threshold-free ranking metric: AUC from the tie-exact rank-sum
    // (the MWU machinery), score=value vs purchase-or-not
    "stat_auc" -> ((s, d) => StatsOps.rocAuc(
      Tables.events(s, d), "value", col("event_type") === "purchase")),
    // proper scoring rules of a deterministic sigmoid "model" on the
    // same fixture: cross-entropy + Brier
    "stat_logloss" -> ((s, d) =>
      StatsOps.classificationLoss(scoredEvents(s, d))),
    // reliability diagram + ECE, 10 equal-width probability bins
    "stat_calibration" -> ((s, d) =>
      StatsOps.calibration(scoredEvents(s, d), 10)),
    // Kendall τ-b over the discrete (quantity, discount) joint cells —
    // O(cells²), never O(rows²); spearman is the continuous-domain path
    "stat_kendall" -> ((s, d) => StatsOps.kendallTau(
      Tables.lineitem(s, d), "l_quantity", "l_discount")),
    // robust location/scale: median, IQR, MAD, 5/95-winsorized mean —
    // two TeraSort-shape exact-quantile passes + one clamped aggregate
    "stat_robust" -> ((s, d) => StatsOps.robustStats(
      Tables.lineitem(s, d), "l_extendedprice")),
    // isotonic (PAV) calibration via the minimax closed form on 10 score
    // bins — all ratios of exact integer sums, so both engines agree
    // bit-for-bit before the final round
    "stat_isotonic" -> ((s, d) =>
      StatsOps.isotonicCalibration(scoredEvents(s, d), 10)),
    // Poisson bootstrap CI of mean(n_chars): 200 counter-hash replicates,
    // nearest-rank 2.5%/97.5% — every replicate mean is an exact integer
    // ratio, so the whole row is bit-exact across engines
    "stat_bootstrap" -> ((s, d) => StatsOps.bootstrapCI(
      Tables.documents(s, d), "doc_id", "n_chars", 200, 5, 195)),
    // ACF of the value series in (ts, event_id) order, lags 1..5:
    // TeraSort rank + rank-shifted equi-join, no global window
    "stat_acf" -> ((s, d) => StatsOps.acf(
      Tables.events(s, d).select(unix_micros(col("ts")).as("us"),
        col("event_id"), col("value")),
      Seq(col("us"), col("event_id")), col("value"), 5)),
    // BH-FDR over the (event_type × epoch-day-of-week) mean-value family;
    // one keyed aggregate, then all windows on the ~70-row table
    "stat_bh_fdr" -> ((s, d) => StatsOps.bhFdr(Tables.events(s, d),
      col("event_type"),
      pmod((col("ts").cast("long") / lit(86400)).cast("long"), lit(7L)),
      col("value"), 0.05)),
    // ranking quality per user: NDCG@10 + MRR, graded relevance from
    // event_type, keyed windows only
    "stat_ndcg" -> ((s, d) => StatsOps.ndcgMrr(
      Tables.events(s, d), "user_id", "value", "event_id",
      when(col("event_type") === "purchase", 3.0)
        .when(col("event_type") === "click", 2.0)
        .when(col("event_type") === "view", 1.0).otherwise(0.0), 10)),
  )

  /** Deterministic sigmoid scores over events: p = σ((value−50)/25),
    * y = 1[purchase] — the shared fixture of stat_logloss /
    * stat_calibration. */
  private def scoredEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      (lit(1.0) / (lit(1.0) + exp(-(col("value") - 50.0) / 25.0))).as("p"),
      (col("event_type") === "purchase").cast("long").as("y"))

  val sql: Map[String, String] = Map(
    "stat_accuracy" ->
      s"""$lpCte
         |SELECT round(avg(CASE WHEN pred = truth THEN 1.0 ELSE 0.0 END), 6) AS accuracy
         |FROM lp""".stripMargin,
    "stat_contingency" ->
      s"""$lpCte
         |SELECT truth, pred, count(*) AS cnt FROM lp GROUP BY 1, 2""".stripMargin,
    "stat_entropy" ->
      s"""$lpCte,
         |c AS (SELECT truth, CAST(count(*) AS DOUBLE) AS c FROM lp GROUP BY truth)
         |SELECT round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy FROM c""".stripMargin,
    "stat_mutual_info" ->
      s"""$ctCte
         |SELECT round(sum((ct.cnt / tot.n) * ln(tot.n * ct.cnt / (ai.a * bj.b))), 6) AS mi
         |FROM ct, tot, ai, bj
         |WHERE ct.truth = ai.truth AND ct.pred = bj.pred""".stripMargin,
    "stat_rand_index" ->
      s"""$ctCte,
         |s AS (SELECT
         |  (SELECT sum(cnt*(cnt-1)/2.0) FROM ct) AS sij,
         |  (SELECT sum(a*(a-1)/2.0) FROM ai) AS si,
         |  (SELECT sum(b*(b-1)/2.0) FROM bj) AS sj,
         |  (SELECT n FROM tot) AS n)
         |SELECT
         |  round((n*(n-1)/2.0 + 2*sij - si - sj) / (n*(n-1)/2.0), 6) AS rand_index,
         |  round((sij - si*sj/(n*(n-1)/2.0)) /
         |        ((si + sj)/2.0 - si*sj/(n*(n-1)/2.0)), 6) AS ari
         |FROM s""".stripMargin,
    "stat_v_measure" ->
      s"""$ctCte,
         |hx AS (SELECT
         |  -(SELECT sum((ct.cnt/tot.n) * ln(ct.cnt/bj.b)) FROM ct, tot, bj
         |     WHERE ct.pred = bj.pred) AS hck,
         |  -(SELECT sum((ct.cnt/tot.n) * ln(ct.cnt/ai.a)) FROM ct, tot, ai
         |     WHERE ct.truth = ai.truth) AS hkc,
         |  -(SELECT sum((a/n) * ln(a/n)) FROM ai, tot) AS hc,
         |  -(SELECT sum((b/n) * ln(b/n)) FROM bj, tot) AS hk),
         |hcv AS (SELECT 1.0 - hck/hc AS h, 1.0 - hkc/hk AS c FROM hx)
         |SELECT round(h, 6) AS homogeneity, round(c, 6) AS completeness,
         |       round(2.0*h*c/(h+c), 6) AS v_measure
         |FROM hcv""".stripMargin,
    "stat_kl" ->
      s"""$lpCte,
         |p AS (SELECT truth AS k, CAST(count(*) AS DOUBLE) AS pc FROM lp GROUP BY 1),
         |qd AS (SELECT pred AS k, CAST(count(*) AS DOUBLE) AS qc FROM lp GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM lp)
         |SELECT round(sum((pc/n.n) * ln(pc/qc)), 6) AS kl
         |FROM p, qd, n WHERE p.k = qd.k""".stripMargin,
    "stat_r2" ->
      s"""$pairCte,
         |m AS (SELECT avg(y) AS ybar FROM p)
         |SELECT round(1.0 - sum((y-yhat)*(y-yhat)) / sum((y-ybar)*(y-ybar)), 6) AS r2
         |FROM p, m""".stripMargin,
    "stat_regression" ->
      s"""$pairCte
         |SELECT round(avg(abs(y-yhat)), 6) AS mae,
         |       round(avg((y-yhat)*(y-yhat)), 6) AS mse,
         |       round(quantile_cont(abs(y-yhat), 0.5), 6) AS median_ae
         |FROM p""".stripMargin,
    "stat_histogram" ->
      """SELECT CAST(floor(l_quantity / 5.0) AS BIGINT) AS bin, count(*) AS cnt
        |FROM lineitem GROUP BY 1""".stripMargin,
    "stat_meanvar" ->
      """SELECT round(avg(l_quantity), 6) AS qty_mean,
        |  round(var_samp(l_quantity), 6) AS qty_var,
        |  round(avg(l_extendedprice), 4) AS price_mean,
        |  round(var_samp(l_extendedprice), 2) AS price_var,
        |  round(avg(l_discount), 6) AS disc_mean,
        |  round(var_samp(l_discount), 6) AS disc_var
        |FROM lineitem""".stripMargin,
    "stat_minmax" ->
      """SELECT round(min(l_quantity), 4) AS qty_min, round(max(l_quantity), 4) AS qty_max,
        |  round(min(l_extendedprice), 4) AS price_min,
        |  round(max(l_extendedprice), 4) AS price_max
        |FROM lineitem""".stripMargin,
    "stat_weighted_mean" ->
      """SELECT round(sum(l_quantity * l_extendedprice) / sum(l_quantity), 4) AS wmean_price
        |FROM lineitem""".stripMargin,
    "stat_cov" ->
      """SELECT 0 AS i, 0 AS j, round(covar_samp(l_quantity, l_quantity), 4) AS cov FROM lineitem
        |UNION ALL SELECT 0, 1, round(covar_samp(l_quantity, l_extendedprice), 4) FROM lineitem
        |UNION ALL SELECT 0, 2, round(covar_samp(l_quantity, l_discount), 4) FROM lineitem
        |UNION ALL SELECT 1, 1, round(covar_samp(l_extendedprice, l_extendedprice), 4) FROM lineitem
        |UNION ALL SELECT 1, 2, round(covar_samp(l_extendedprice, l_discount), 4) FROM lineitem
        |UNION ALL SELECT 2, 2, round(covar_samp(l_discount, l_discount), 4) FROM lineitem""".stripMargin,
    // χ² = n·(Σ_obs o²/(a·b) − 1); V = sqrt((s−1)/min(r−1,c−1))
    "stat_chi2" ->
      s"""$ctCte,
         |s AS (SELECT sum(ct.cnt * ct.cnt / (ai.a * bj.b)) AS s,
         |             (SELECT n FROM tot) AS n,
         |             count(DISTINCT ct.truth) AS r,
         |             count(DISTINCT ct.pred) AS c
         |      FROM ct JOIN ai ON ai.truth = ct.truth
         |              JOIN bj ON bj.pred = ct.pred)
         |SELECT round(n * (s - 1), 4) + 0.0 AS chi2,
         |       (r - 1) * (c - 1) AS dof,
         |       round(sqrt((s - 1) / least(r - 1, c - 1)), 6) + 0.0 AS cramers_v
         |FROM s""".stripMargin,
    "stat_ks" ->
      """WITH c AS (
        |  SELECT n_chars AS v,
        |         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c1,
        |         sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS c2
        |  FROM documents GROUP BY 1),
        |cum AS (SELECT v, sum(c1) OVER (ORDER BY v) AS cum1,
        |               sum(c2) OVER (ORDER BY v) AS cum2 FROM c),
        |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |               CAST(sum(c2) AS BIGINT) AS n2 FROM c),
        |dd AS (SELECT max(abs(cum1 / CAST(n1 AS DOUBLE) - cum2 / CAST(n2 AS DOUBLE))) AS d,
        |              max(n1) AS n1, max(n2) AS n2
        |       FROM cum, tot)
        |SELECT n1, n2, round(d, 6) + 0.0 AS d,
        |  round(d * sqrt(n1 * CAST(n2 AS DOUBLE) / (n1 + n2)), 6) + 0.0 AS z,
        |  round(least(1.0, 2.0 * exp(-2.0 * d * sqrt(n1 * CAST(n2 AS DOUBLE) / (n1 + n2))
        |                                  * (d * sqrt(n1 * CAST(n2 AS DOUBLE) / (n1 + n2))))), 6)
        |    + 0.0 AS p_value
        |FROM dd""".stripMargin,
    // identical naive-moment formulas on both sides (NOT var_samp —
    // Welford vs Σx² would differ in the last ulps)
    "stat_ttest" ->
      """WITH m AS (SELECT
        |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |  CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS n2,
        |  sum(CAST(n_chars AS DOUBLE) * (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)) AS s1,
        |  sum(CAST(n_chars AS DOUBLE) * (CASE WHEN lang = 'en' THEN 0 ELSE 1 END)) AS s2,
        |  sum(CAST(n_chars AS DOUBLE) * n_chars * (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)) AS q1,
        |  sum(CAST(n_chars AS DOUBLE) * n_chars * (CASE WHEN lang = 'en' THEN 0 ELSE 1 END)) AS q2
        |  FROM documents),
        |d AS (SELECT n1, n2,
        |  s1 / n1 - s2 / n2 AS dm,
        |  ((q1 - s1 * s1 / n1) / (n1 - 1)) / n1 AS se1,
        |  ((q2 - s2 * s2 / n2) / (n2 - 1)) / n2 AS se2,
        |  sqrt(((n1 - 1) * ((q1 - s1 * s1 / n1) / (n1 - 1)) +
        |        (n2 - 1) * ((q2 - s2 * s2 / n2) / (n2 - 1))) / (n1 + n2 - 2)) AS pooled
        |  FROM m)
        |SELECT n1, n2,
        |  round(dm / sqrt(se1 + se2), 6) + 0.0 AS t,
        |  round((se1 + se2) * (se1 + se2) /
        |        (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)), 4) + 0.0 AS df,
        |  round(dm / pooled, 6) + 0.0 AS cohens_d
        |FROM d""".stripMargin,
    "stat_psi" ->
      """WITH mid AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events),
        |b AS (SELECT least(9, greatest(0, CAST(floor(value / 50.0) AS BIGINT))) AS bin,
        |             CASE WHEN epoch_us(ts) <= mid.mid THEN 1 ELSE 0 END AS ref
        |      FROM events, mid),
        |g AS (SELECT bin, sum(ref) AS cr, sum(1 - ref) AS cc FROM b GROUP BY 1),
        |t AS (SELECT CAST(sum(cr) AS BIGINT) AS nr, CAST(sum(cc) AS BIGINT) AS nc FROM g),
        |f AS (SELECT s.bin, COALESCE(g.cr, 0) AS cr, COALESCE(g.cc, 0) AS cc
        |      FROM (SELECT unnest(range(10)) AS bin) s LEFT JOIN g USING (bin))
        |SELECT max(nr) AS n_ref, max(nc) AS n_cur,
        |  round(sum(((cr + 1) / CAST(nr + 10 AS DOUBLE) - (cc + 1) / CAST(nc + 10 AS DOUBLE)) *
        |            ln(((cr + 1) / CAST(nr + 10 AS DOUBLE)) /
        |               ((cc + 1) / CAST(nc + 10 AS DOUBLE)))), 6) + 0.0 AS psi
        |FROM f, t""".stripMargin,
    // U₁ from the average-rank sum over the per-value count table;
    // every intermediate is a dyadic rational < 2^53, so the float sums
    // are exact and order-independent in both engines
    "stat_mwu" ->
      """WITH c AS (
        |  SELECT n_chars AS v,
        |         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c1,
        |         sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS c2
        |  FROM documents GROUP BY 1),
        |r AS (SELECT c1, c2, c1 + c2 AS c,
        |             sum(c1 + c2) OVER (ORDER BY v) - (c1 + c2) + (c1 + c2 + 1) / 2.0 AS rank
        |      FROM c),
        |a AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
        |             sum(c1 * rank) AS r1,
        |             sum(CAST(c AS DOUBLE) * c * c - c) AS ties
        |      FROM r)
        |SELECT n1, n2,
        |  r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0 + 0.0 AS u1,
        |  CAST(n1 AS DOUBLE) * n2 - (r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0) + 0.0 AS u2,
        |  round((r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0 - CAST(n1 AS DOUBLE) * n2 / 2.0) /
        |        sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0 *
        |             ((n1 + n2 + 1) - ties / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1)))), 6)
        |    + 0.0 AS z
        |FROM a""".stripMargin,
    "stat_spearman" ->
      """WITH rx AS (SELECT l_quantity AS v, count(*) AS cnt FROM lineitem GROUP BY 1),
        |rxx AS (SELECT v, sum(cnt) OVER (ORDER BY v) - cnt + (cnt + 1) / 2.0 AS r FROM rx),
        |ry AS (SELECT l_extendedprice AS v, count(*) AS cnt FROM lineitem GROUP BY 1),
        |ryy AS (SELECT v, sum(cnt) OVER (ORDER BY v) - cnt + (cnt + 1) / 2.0 AS r FROM ry)
        |SELECT round(corr(rxx.r, ryy.r), 6) + 0.0 AS spearman
        |FROM lineitem l
        |JOIN rxx ON rxx.v = l.l_quantity
        |JOIN ryy ON ryy.v = l.l_extendedprice""".stripMargin,
    "stat_dispersion" ->
      """WITH lanes AS (
        |  SELECT label, generate_subscripts(embedding, 1) AS pos,
        |         unnest(list_transform(embedding, f -> CAST(f AS DOUBLE))) AS x
        |  FROM embeddings),
        |cent AS (SELECT label, pos, avg(x) AS ck, count(*) AS nk
        |         FROM lanes GROUP BY 1, 2),
        |gm AS (SELECT pos, avg(x) AS c FROM lanes GROUP BY pos)
        |SELECT round(sum(nk * (ck - c) * (ck - c)), 4) AS dispersion
        |FROM cent JOIN gm ON cent.pos = gm.pos""".stripMargin,
    "stat_popc" ->
      "SELECT CAST(sum(bit_count(l_orderkey)) AS BIGINT) AS popc FROM lineitem",
    "stat_quantiles" ->
      """SELECT 0 AS i, round(quantile_cont(l_extendedprice, 0.25), 4) AS v FROM lineitem
        |UNION ALL SELECT 1, round(quantile_cont(l_extendedprice, 0.5), 4) FROM lineitem
        |UNION ALL SELECT 2, round(quantile_cont(l_extendedprice, 0.75), 4) FROM lineitem
        |UNION ALL SELECT 3, round(quantile_cont(l_extendedprice, 0.95), 4) FROM lineitem""".stripMargin,
    // HDR-sketch replay: identical (exponent, 5-bit mantissa) bucketing,
    // integer ceil-rank pick, lower-bound decode
    "stat_quantile_sketch" ->
      """WITH v AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |b AS (
        |  SELECT CASE WHEN v < 32 THEN v
        |    ELSE (length(bin(v)) - 5) * 32
        |         + v // CAST(power(2, length(bin(v)) - 6) AS BIGINT) - 32 END AS bucket
        |  FROM v),
        |s AS (SELECT bucket, count(*) AS cnt FROM b GROUP BY 1),
        |c AS (SELECT bucket, cnt,
        |        sum(cnt) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM s),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM s),
        |qs AS (SELECT * FROM (VALUES (1, 2), (9, 10), (99, 100), (999, 1000)) q(num, den)),
        |r AS (SELECT num, den, (num * n + den - 1) // den AS rank FROM qs, tot),
        |pick AS (SELECT num, den, rank, min(bucket) AS bucket
        |         FROM r JOIN c ON c.cum >= r.rank GROUP BY 1, 2, 3)
        |SELECT CAST(num AS DOUBLE) / den AS q, rank,
        |  CAST(CASE WHEN bucket < 32 THEN bucket
        |       ELSE (bucket % 32 + 32) * CAST(power(2, bucket // 32 - 1) AS BIGINT)
        |       END AS BIGINT) AS est
        |FROM pick""".stripMargin,
    // merge replay: both estimate columns derive from the same buckets,
    // so the oracle computes one estimate and emits it twice
    "stat_quantile_sketch_merge" ->
      """WITH v AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |b AS (
        |  SELECT CASE WHEN v < 32 THEN v
        |    ELSE (length(bin(v)) - 5) * 32
        |         + v // CAST(power(2, length(bin(v)) - 6) AS BIGINT) - 32 END AS bucket
        |  FROM v),
        |s AS (SELECT bucket, count(*) AS cnt FROM b GROUP BY 1),
        |c AS (SELECT bucket, cnt,
        |        sum(cnt) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM s),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM s),
        |qs AS (SELECT * FROM (VALUES (1, 2), (9, 10), (99, 100)) q(num, den)),
        |r AS (SELECT num, den, (num * n + den - 1) // den AS rank FROM qs, tot),
        |pick AS (SELECT num, den, rank, min(bucket) AS bucket
        |         FROM r JOIN c ON c.cum >= r.rank GROUP BY 1, 2, 3)
        |SELECT CAST(num AS DOUBLE) / den AS q, rank,
        |  CAST(CASE WHEN bucket < 32 THEN bucket
        |       ELSE (bucket % 32 + 32) * CAST(power(2, bucket // 32 - 1) AS BIGINT)
        |       END AS BIGINT) AS est_merged,
        |  CAST(CASE WHEN bucket < 32 THEN bucket
        |       ELSE (bucket % 32 + 32) * CAST(power(2, bucket // 32 - 1) AS BIGINT)
        |       END AS BIGINT) AS est_direct
        |FROM pick""".stripMargin,
    "stat_quantile_sketch_by" ->
      """WITH v AS (
        |  SELECT l_returnflag AS g, CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |b AS (
        |  SELECT g, CASE WHEN v < 32 THEN v
        |    ELSE (length(bin(v)) - 5) * 32
        |         + v // CAST(power(2, length(bin(v)) - 6) AS BIGINT) - 32 END AS bucket
        |  FROM v),
        |s AS (SELECT g, bucket, count(*) AS cnt FROM b GROUP BY 1, 2),
        |c AS (SELECT g, bucket, cnt,
        |        sum(cnt) OVER (PARTITION BY g ORDER BY bucket
        |                       ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM s),
        |tot AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n FROM s GROUP BY 1),
        |qs AS (SELECT * FROM (VALUES (1, 2), (9, 10), (99, 100)) q(num, den)),
        |r AS (SELECT g, num, den, (num * n + den - 1) // den AS rank FROM qs, tot),
        |pick AS (SELECT r.g, num, den, rank, min(bucket) AS bucket
        |         FROM r JOIN c ON c.g = r.g AND c.cum >= r.rank
        |         GROUP BY 1, 2, 3, 4)
        |SELECT g, CAST(num AS DOUBLE) / den AS q, rank,
        |  CAST(CASE WHEN bucket < 32 THEN bucket
        |       ELSE (bucket % 32 + 32) * CAST(power(2, bucket // 32 - 1) AS BIGINT)
        |       END AS BIGINT) AS est
        |FROM pick""".stripMargin,
    "stat_trustworthiness" -> {
      def foldD(a: String, b: String) =
        s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip($a, $b), p -> (p[1]-p[2])*(p[1]-p[2]))), (s, x) -> s + x)"
      val n = 100; val k = 5
      val norm = 2.0 / (n.toDouble * k * (2 * n - 3 * k - 1))
      s"""WITH v AS (
         |  SELECT vec_id AS id, list_transform(embedding, f -> CAST(f AS DOUBLE)) AS vec,
         |         list_transform(embedding[1:8], f -> CAST(f AS DOUBLE)) AS emb
         |  FROM embeddings WHERE vec_id < $n),
         |pairs AS (
         |  SELECT a.id AS i, b.id AS j,
         |    ${foldD("a.vec", "b.vec")} AS d_orig,
         |    ${foldD("a.emb", "b.emb")} AS d_emb
         |  FROM v a JOIN v b ON a.id <> b.id),
         |ranked AS (
         |  SELECT i, j,
         |    row_number() OVER (PARTITION BY i ORDER BY d_orig, j) AS r_orig,
         |    row_number() OVER (PARTITION BY i ORDER BY d_emb, j) AS r_emb
         |  FROM pairs)
         |SELECT round(1.0 - $norm * sum(greatest(r_orig - $k, 0)), 6) AS trustworthiness
         |FROM ranked WHERE r_emb <= $k""".stripMargin
    },
    // full-table twin of the batched kNN form: same formula, n = all rows,
    // norm computed from count(*) so the oracle tracks the table size
    "stat_trustworthiness_batched" -> {
      def foldD(a: String, b: String) =
        s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip($a, $b), p -> (p[1]-p[2])*(p[1]-p[2]))), (s, x) -> s + x)"
      val k = 5
      s"""WITH v AS (
         |  SELECT vec_id AS id, list_transform(embedding, f -> CAST(f AS DOUBLE)) AS vec,
         |         list_transform(embedding[1:8], f -> CAST(f AS DOUBLE)) AS emb
         |  FROM embeddings),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM v),
         |pairs AS (
         |  SELECT a.id AS i, b.id AS j,
         |    ${foldD("a.vec", "b.vec")} AS d_orig,
         |    ${foldD("a.emb", "b.emb")} AS d_emb
         |  FROM v a JOIN v b ON a.id <> b.id),
         |ranked AS (
         |  SELECT i, j,
         |    row_number() OVER (PARTITION BY i ORDER BY d_orig, j) AS r_orig,
         |    row_number() OVER (PARTITION BY i ORDER BY d_emb, j) AS r_emb
         |  FROM pairs)
         |SELECT round(1.0 - (2.0 / (n * $k * (2 * n - 3 * $k - 1)))
         |  * sum(greatest(r_orig - $k, 0)), 6) AS trustworthiness
         |FROM ranked, nn WHERE r_emb <= $k GROUP BY n""".stripMargin
    },
    "stat_info_criterion" ->
      """WITH x0 AS (
        |  SELECT label, CAST(embedding[1] AS DOUBLE) AS x FROM embeddings),
        |m AS (SELECT label, CAST(count(*) AS DOUBLE) AS n, var_pop(x) AS v
        |      FROM x0 GROUP BY label),
        |ll AS (SELECT label, n, -0.5 * n * (ln(2 * pi() * v) + 1.0) AS ll FROM m)
        |SELECT label,
        |  round(4.0 - 2.0 * ll, 4) AS aic,
        |  round(4.0 - 2.0 * ll + 12.0 / (n - 3.0), 4) AS aicc,
        |  round(2.0 * ln(n) - 2.0 * ll, 4) AS bic
        |FROM ll""".stripMargin,
    "stat_silhouette" -> silhouetteSql,
    // the plain form IS the batched form's oracle (same semantics, tiled
    // execution) — identical SQL on the same n=100 fixture
    "stat_silhouette_batched" -> silhouetteSql,
    // AUC = U1/(n+·n−) from the average-rank sum over per-score counts
    // (same tie-exact replay as stat_mwu); gini from the unrounded auc
    "stat_auc" ->
      """WITH c AS (
        |  SELECT value AS v,
        |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c1,
        |         sum(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) AS c2
        |  FROM events GROUP BY 1),
        |r AS (SELECT c1, c2,
        |             sum(c1 + c2) OVER (ORDER BY v) - (c1 + c2) + (c1 + c2 + 1) / 2.0 AS rank
        |      FROM c),
        |a AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
        |             sum(c1 * rank) AS r1 FROM r),
        |u AS (SELECT n1, n2,
        |             (r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0) /
        |             (CAST(n1 AS DOUBLE) * n2) AS auc FROM a)
        |SELECT n1 AS n_pos, n2 AS n_neg,
        |  round(auc, 6) + 0.0 AS auc,
        |  round(2.0 * auc - 1.0, 6) + 0.0 AS gini
        |FROM u""".stripMargin,
    "stat_logloss" ->
      s"""WITH s AS ($scoredSql)
         |SELECT count(*) AS n,
         |  round(-avg(y * ln(p) + (1 - y) * ln(1.0 - p)), 6) + 0.0 AS logloss,
         |  round(avg((p - y) * (p - y)), 6) + 0.0 AS brier
         |FROM s""".stripMargin,
    "stat_calibration" ->
      s"""WITH s AS ($scoredSql),
         |b AS (SELECT least(9, CAST(floor(p * 10) AS BIGINT)) AS bin,
         |             count(*) AS n, avg(p) AS conf, avg(CAST(y AS DOUBLE)) AS acc
         |      FROM s GROUP BY 1),
         |e AS (SELECT sum(n * abs(acc - conf)) / sum(n) AS ece FROM b)
         |SELECT bin, n, round(conf, 6) + 0.0 AS conf, round(acc, 6) + 0.0 AS acc,
         |  round(ece, 6) + 0.0 AS ece
         |FROM b, e""".stripMargin,
    // τ-b from the joint-cell self-join; all pair products are exact
    // integer-valued doubles, so the sums are order-independent
    "stat_kendall" ->
      """WITH cells AS (
        |  SELECT l_quantity AS x, l_discount AS y, CAST(count(*) AS DOUBLE) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |p AS (SELECT sum(CASE WHEN a.y < b.y THEN a.cnt * b.cnt ELSE 0 END) AS c,
        |             sum(CASE WHEN a.y > b.y THEN a.cnt * b.cnt ELSE 0 END) AS d
        |      FROM cells a JOIN cells b ON a.x < b.x),
        |tx AS (SELECT sum(t * (t - 1) / 2.0) AS n1
        |       FROM (SELECT sum(cnt) AS t FROM cells GROUP BY x)),
        |ty AS (SELECT sum(t * (t - 1) / 2.0) AS n2
        |       FROM (SELECT sum(cnt) AS t FROM cells GROUP BY y)),
        |n AS (SELECT sum(cnt) AS n FROM cells)
        |SELECT CAST(c AS BIGINT) AS concordant, CAST(d AS BIGINT) AS discordant,
        |  round((c - d) / sqrt((n.n * (n.n - 1) / 2.0 - n1) *
        |                       (n.n * (n.n - 1) / 2.0 - n2)), 6) + 0.0 AS tau_b
        |FROM p, tx, ty, n""".stripMargin,
    "stat_robust" ->
      """WITH v AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem
        |           WHERE l_extendedprice IS NOT NULL),
        |q AS (SELECT quantile_cont(x, 0.05) AS q05, quantile_cont(x, 0.25) AS q25,
        |             quantile_cont(x, 0.5) AS q50, quantile_cont(x, 0.75) AS q75,
        |             quantile_cont(x, 0.95) AS q95 FROM v),
        |m AS (SELECT quantile_cont(abs(x - (SELECT q50 FROM q)), 0.5) AS mad FROM v)
        |SELECT count(*) AS n,
        |  round((SELECT q50 FROM q), 4) + 0.0 AS median,
        |  round((SELECT q75 - q25 FROM q), 4) + 0.0 AS iqr,
        |  round((SELECT mad FROM m), 4) + 0.0 AS mad,
        |  round(avg(least(greatest(x, (SELECT q05 FROM q)), (SELECT q95 FROM q))), 4)
        |    + 0.0 AS winsor_mean
        |FROM v""".stripMargin,
    // global-order lags replayed with a plain window (single-node engine);
    // r(k) = Σ(v_t−μ)(v_{t+k}−μ) / Σ(v_t−μ)²
    // r is referenced THREE times (d, and both sides of n's self-join):
    // without AS MATERIALIZED DuckDB re-evaluates the 1M-row window per
    // reference inside the join — >120 s at sf1 vs 0.8 s materialized
    // (the round-7 multi-ref CTE lesson, re-learned on this oracle)
    "stat_acf" ->
      """WITH r AS MATERIALIZED (SELECT value AS v,
        |    row_number() OVER (ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |m AS (SELECT avg(v) AS mu FROM r),
        |d AS (SELECT sum((v - mu) * (v - mu)) AS den FROM r CROSS JOIN m),
        |n AS (SELECT t.lag, sum((a.v - mu) * (b.v - mu)) AS num
        |      FROM r a CROSS JOIN range(1, 6) t(lag)
        |      JOIN r b ON b.rn = a.rn - t.lag CROSS JOIN m
        |      GROUP BY 1)
        |SELECT lag, round(num / den, 6) + 0.0 AS acf
        |FROM n CROSS JOIN d""".stripMargin,
    // same logistic-Φ pseudo-p per (type, dow) z-score, then the BH
    // rank/threshold/suffix-min machinery on the bounded family
    "stat_bh_fdr" ->
      """WITH e AS (SELECT event_type AS k1,
        |    (epoch_us(ts) // 86400000000) % 7 AS k2, value AS v FROM events),
        |g AS (SELECT k1, k2, count(*) AS n, sum(v) AS s, sum(v * v) AS s2
        |      FROM e GROUP BY 1, 2),
        |t AS (SELECT count(*) AS tn, sum(v) AS ts, sum(v * v) AS ts2 FROM e),
        |p0 AS (SELECT k1, k2, n,
        |    2.0 / (1.0 + exp(1.702 * abs((s / n - ts / tn) /
        |      (sqrt(ts2 / tn - (ts / tn) * (ts / tn)) / sqrt(n))))) AS p
        |  FROM g CROSS JOIN t),
        |r AS (SELECT *, row_number() OVER (ORDER BY p, k1, k2) AS rn,
        |             count(*) OVER () AS m FROM p0),
        |k AS (SELECT *, max(CASE WHEN p <= 0.05 * rn / m THEN rn ELSE 0 END)
        |             OVER () AS kmax FROM r),
        |a AS (SELECT *, least(1.0, min(p * m / rn) OVER (ORDER BY rn DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS padj FROM k)
        |SELECT k1, k2, n, round(p, 6) + 0.0 AS p, round(padj, 6) + 0.0 AS padj,
        |       rn <= kmax AS rejected
        |FROM a""".stripMargin,
    // same Poisson(1) inverse-CDF on u = h32(id:b:boot)/1e6; integer
    // Σc·x / Σc per replicate, nearest-rank order (m, b)
    "stat_bootstrap" ->
      """WITH x AS (SELECT doc_id AS id, n_chars AS x FROM documents),
        |r AS (SELECT id, x, t.b AS b,
        |    (CAST(('0x' || substr(md5(concat_ws(':', id, t.b, 'boot')), 1, 8))
        |      AS BIGINT) % 1000000) / 1000000.0 AS u
        |  FROM x CROSS JOIN range(200) t(b)),
        |c AS (SELECT b, x,
        |    CASE WHEN u < 0.36787944117144233 THEN 0
        |         WHEN u < 0.7357588823428847 THEN 1
        |         WHEN u < 0.9196986029286058 THEN 2
        |         WHEN u < 0.9810118431238462 THEN 3
        |         WHEN u < 0.9963401531726563 THEN 4 ELSE 5 END AS c
        |  FROM r),
        |m AS (SELECT b, CAST(sum(c * x) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS m
        |      FROM c GROUP BY 1),
        |rk AS (SELECT m, row_number() OVER (ORDER BY m, b) AS rk FROM m),
        |bd AS (SELECT sum(CASE WHEN rk = 5 THEN m END) AS lo,
        |              sum(CASE WHEN rk = 195 THEN m END) AS hi FROM rk),
        |e AS (SELECT CAST(sum(x) AS DOUBLE) / count(*) AS est FROM x)
        |SELECT round(est, 6) + 0.0 AS est, round(lo, 6) + 0.0 AS lo,
        |  round(hi, 6) + 0.0 AS hi, CAST(200 AS BIGINT) AS reps
        |FROM e CROSS JOIN bd""".stripMargin,
    // fit(i) = max_{j<=i} min_{k>=i} mean(y over bins j..k): interval
    // means from cumulative sums over the <=10-row bin table; every mean
    // is a ratio of exact integers, so no float-order risk anywhere
    "stat_isotonic" ->
      s"""WITH sc AS ($scoredSql),
         |b AS (SELECT least(9, CAST(floor(p * 10) AS BIGINT)) AS bin,
         |             CAST(count(*) AS DOUBLE) AS w, sum(CAST(y AS DOUBLE)) AS sy
         |      FROM sc GROUP BY 1),
         |pre AS (SELECT bin, w, sy,
         |               sum(w) OVER (ORDER BY bin) AS cw,
         |               sum(sy) OVER (ORDER BY bin) AS cs
         |        FROM b),
         |ivl AS (SELECT l.bin AS j, h.bin AS k,
         |               (h.cs - (l.cs - l.sy)) / (h.cw - (l.cw - l.w)) AS m
         |        FROM pre l JOIN pre h ON l.bin <= h.bin),
         |mn AS (SELECT p.bin AS i, p.w, p.sy / p.w AS raw, v.j, min(v.m) AS mn
         |       FROM pre p JOIN ivl v ON v.j <= p.bin AND p.bin <= v.k
         |       GROUP BY 1, 2, 3, 4)
         |SELECT i AS bin, CAST(w AS BIGINT) AS n, round(raw, 6) + 0.0 AS raw,
         |       round(max(mn), 6) + 0.0 AS iso
         |FROM mn GROUP BY 1, 2, 3""".stripMargin,
    "stat_ndcg" ->
      """WITH e AS (
        |  SELECT user_id AS g, value AS s, event_id AS id,
        |    CASE event_type WHEN 'purchase' THEN 3.0 WHEN 'click' THEN 2.0
        |                    WHEN 'view' THEN 1.0 ELSE 0.0 END AS rel
        |  FROM events),
        |r AS (SELECT g, rel,
        |        row_number() OVER (PARTITION BY g ORDER BY s DESC, id) AS r,
        |        row_number() OVER (PARTITION BY g ORDER BY rel DESC, id) AS ri
        |      FROM e),
        |pk AS (SELECT g,
        |    sum(CASE WHEN r <= 10 THEN (power(2.0, rel) - 1) / log2(r + 1.0)
        |             ELSE 0 END) AS dcg,
        |    sum(CASE WHEN ri <= 10 THEN (power(2.0, rel) - 1) / log2(ri + 1.0)
        |             ELSE 0 END) AS idcg,
        |    min(CASE WHEN rel >= 3.0 THEN r END) AS fr
        |  FROM r GROUP BY 1)
        |SELECT count(*) AS n_keys,
        |  round(avg(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END), 6) + 0.0 AS mean_ndcg,
        |  round(avg(coalesce(1.0 / fr, 0.0)), 6) + 0.0 AS mrr
        |FROM pk""".stripMargin,
  )

  /** SQL twin of [[scoredEvents]] (lazy: referenced during `sql` init). */
  private lazy val scoredSql: String =
    """SELECT 1.0 / (1.0 + exp(-((value - 50.0) / 25.0))) AS p,
      |       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |FROM events""".stripMargin

  private lazy val silhouetteSql: String =
      """WITH v AS (
        |  SELECT vec_id AS id, list_transform(embedding, f -> CAST(f AS DOUBLE)) AS vec,
        |         label
        |  FROM embeddings WHERE vec_id < 100),
        |pair AS (
        |  SELECT a.id AS i, a.label AS la, b.label AS lb,
        |    sqrt(list_sum(list_transform(list_zip(a.vec, b.vec),
        |         p -> (p[1]-p[2])*(p[1]-p[2])))) AS dist
        |  FROM v a JOIN v b ON a.id <> b.id),
        |pc AS (SELECT i, la, lb, avg(dist) AS mean_d FROM pair GROUP BY 1, 2, 3),
        |a_i AS (SELECT i, mean_d AS a FROM pc WHERE la = lb),
        |b_i AS (SELECT i, min(mean_d) AS b FROM pc WHERE la <> lb GROUP BY i)
        |SELECT round(avg((b - a) / greatest(a, b)), 6) AS silhouette
        |FROM a_i JOIN b_i ON a_i.i = b_i.i""".stripMargin
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    // same extensions the gates run (Bench/Verify/Explain): specs must
    // exercise the session users get, fused kernels included
    .withExtensions(new graft.plans.GraftExtensions)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  val sf: String = "/root/testdata/sf0.001"
}

/** Smoke-level contract tests: every declared query runs and returns a
  * deterministic, non-degenerate result on sf0.001. Numeric parity vs the
  * DuckDB oracle is checked by scripts/check.py (mirrors the driver gate).
  */
class EntrySpec extends AnyFunSuite {
  import TestSpark._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("exact quantiles at q=0 and q=1 return the exact min/max") {
    import org.apache.spark.sql.functions._
    val r = graft.operators.StatsOps.quantiles(spark, sf, Seq(0.0, 1.0))
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    val mm = graft.Tables.lineitem(spark, sf)
      .agg(min(col("l_extendedprice")), max(col("l_extendedprice"))).head()
    assert(r(0) == BigDecimal(mm.getDouble(0)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r(1) == BigDecimal(mm.getDouble(1)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("sort-based exact quantiles agree with the percentile aggregate") {
    import org.apache.spark.sql.functions._
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    val ours = graft.operators.StatsOps.quantiles(spark, sf, qs)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val ref = graft.Tables.lineitem(spark, sf)
      .agg(percentile(col("l_extendedprice"), array(qs.map(lit(_)): _*)).as("p"))
      .select(explode(col("p"))).collect().map(_.getDouble(0))
    qs.indices.foreach { i =>
      assert(math.abs(ours(i) - ref(i)) < 5e-5,
        s"q=${qs(i)}: ${ours(i)} vs percentile ${ref(i)}")
    }
  }

  test("quantile sketch brackets every exact quantile within its bucket width") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sf)
      .where(col("l_extendedprice").isNotNull)
      .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"))
    val got = graft.operators.StatsOps.quantileSketch(li).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 4)
    val vals = li.collect().map(_.getLong(0)).sorted
    got.foreach { case (q, rank, est) =>
      val exact = vals(rank.toInt - 1) // the sketch's own ceil-rank target
      // est is the LOWER BOUND of the bucket holding the rank-th value;
      // bucket width = lo/(m+32) <= lo/32, so the bracket is tight
      assert(est <= exact, s"q=$q: est $est above exact $exact")
      assert(exact - est <= math.max(1L, est / 32L),
        s"q=$q: exact $exact beyond bucket width of est $est")
    }
  }

  test("axpySum equals vectorSum of the per-row scaled array") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (1 to 257).map(i =>
        (Array.tabulate(7)(j => (i * 7 + j) * 0.37 - 3.1), i * 0.01 - 1.0))
      .toDF("v", "w").repartition(3).localCheckpoint(true)
    val fused = df.agg(graft.functions.VectorAgg.axpySum(col("v"), col("w")))
      .head().getSeq[Double](0)
    val ref = df.agg(graft.functions.VectorAgg.vectorSum(
        graft.functions.ArrayMath.scale(col("v"), col("w"))))
      .head().getSeq[Double](0)
    assert(fused.length == 7)
    fused.zip(ref).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
        s"$a vs $b")
    }
  }

  test("withLoopKnobs restores session confs, including on failure") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    graft.GraftSession.withLoopKnobs(spark, 10L) {
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "1")
      assert(spark.conf.get("spark.sql.codegen.wholeStage") == "false")
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
    assert(spark.conf.get("spark.sql.codegen.wholeStage") != "false")
    intercept[RuntimeException] {
      graft.GraftSession.withLoopKnobs(spark, 10L) {
        throw new RuntimeException("boom")
      }
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
      "confs must restore when the body throws")
  }

  test("every query key has distinct non-null schema and runs on sf0.001") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.columns.distinct.length == df.columns.length, s"$name repeated column names")
      df.count() // must execute without throwing
    }
  }

  test("oracle keys are a subset of query keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracleSql without query: $extra")
  }

  test("no query-key collisions across groups (map merge would silently drop)") {
    val groups = Seq(
      graft.queries.MatrixQueries.q, graft.queries.SparseTextQueries.q,
      graft.queries.StatsQueries.q, graft.queries.RandomLabelQueries.q,
      graft.queries.PipelineQueries.q, graft.queries.SolverQueries.q,
      graft.queries.DistanceQueries.q)
    val groupTotal = groups.map(_.size).sum
    val merged = groups.map(_.keySet).reduce(_ ++ _).size
    assert(groupTotal == merged, "duplicate query keys across groups")
    // and the relational group (defined in SparkEntry) must not collide either
    assert(SparkEntry.queries.size ==
      merged + (SparkEntry.queries.keySet -- groups.map(_.keySet).reduce(_ ++ _)).size)
  }

  test("top3 per segment has exactly <=3 rows per segment, ranked") {
    val rows = SparkEntry.queries("rel_top3_mktsegment")(spark, sf).collect()
    val bySeg = rows.groupBy(_.getString(0))
    assert(bySeg.values.forall(_.length <= 3))
    assert(rows.forall(_.getInt(3) <= 3))
  }

  test("approx_count_distinct is within 5% of exact") {
    SparkEntry.queries("rel_approx_distinct")(spark, sf).collect().foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("queries are deterministic across re-execution") {
    val df1 = SparkEntry.queries("rel_pricing_summary")(spark, sf).collect().map(_.toString).sorted
    val df2 = SparkEntry.queries("rel_pricing_summary")(spark, sf).collect().map(_.toString).sorted
    assert(df1.sameElements(df2))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the co-located-join story: two tables bucketed by the join key
  * hash-join WITHOUT a shuffle exchange on either side — the pre-partitioned
  * big-big join strategy for 100 TB fact-fact joins (SURVEY §2.4 scale
  * notes; the alternative to broadcast when neither side is small).
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed fact-fact join plans with zero shuffle exchanges") {
    // uses the default warehouse (./spark-warehouse, gitignored)
    val nBuckets = 4
    Tables.lineitem(spark, sf)
      .write.mode("overwrite").bucketBy(nBuckets, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    Tables.orders(spark, sf)
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .write.mode("overwrite").bucketBy(nBuckets, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("ord_bucketed")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), Seq("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("l_quantity")).as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join key must never be re-shuffled: bucket layout already
      // provides the required distribution on both sides (only the final
      // aggregation exchange on o_orderstatus is allowed)
      assert(plan.contains("SortMergeJoin"), s"expected bucket SMJ:\n$plan")
      assert(!plan.contains("hashpartitioning(l_orderkey"),
        s"bucketed join still shuffles on the key:\n$plan")
      // and the result matches the unbucketed join
      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("l_quantity")).as("qty"))
        .collect().map(r => r.getString(0) -> math.round(r.getDouble(1))).toMap
      val got = joined.collect().map(r => r.getString(0) -> math.round(r.getDouble(1))).toMap
      assert(got == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("dynamic partition pruning: a dim filter prunes fact partitions at runtime") {
    // the third scan-reduction mechanism next to static pushdown and
    // z-order skipping: the fact table is PARTITIONED by the join key's
    // dimension attribute, and Spark injects a runtime subquery filter
    // (dynamicpruning#...) so only partitions matching the FILTERED dim
    // rows are read — at 100 TB this is the difference between scanning
    // one date/segment directory and scanning the table
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Tables.lineitem(spark, sf)
      .write.mode("overwrite").partitionBy("l_returnflag")
      .parquet(s"$dir/li_part")
    try {
      val fact = spark.read.parquet(s"$dir/li_part")
      // the filter sits on a NON-join dim attribute: a literal equality on
      // the join key itself would be constant-propagated onto the fact's
      // partition column and pruned STATICALLY (verified — Spark does it),
      // which is great but isn't the runtime mechanism under test. The dim
      // must also be file-backed: over a LocalRelation the optimizer
      // folds the filter into the literal rows and the DPP rule no longer
      // sees a selective predicate to transplant
      import spark.implicits._
      Seq(("A", "keep"), ("N", "drop"), ("R", "keep"))
        .toDF("rf", "category")
        .write.mode("overwrite").parquet(s"$dir/dim")
      val dim = spark.read.parquet(s"$dir/dim")
        .where(col("category") === "keep")
      val joined = fact.join(dim, col("l_returnflag") === col("rf"))
        .agg(sum(col("l_quantity")).as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"expected a dynamic partition pruning subquery in:\n$plan")
      // and the pruned result equals the direct filter
      val got = math.round(joined.collect()(0).getDouble(0))
      val expected = math.round(Tables.lineitem(spark, sf)
        .where(col("l_returnflag").isin("A", "R"))
        .agg(sum(col("l_quantity"))).collect()(0).getDouble(0))
      assert(got == expected)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("z-order write path: range partitions carry disjoint z-ranges and tight boxes") {
    // the write-side form of rel_zorder_layout: repartitionByRange on the
    // z-value makes each output partition (= would-be file) own a disjoint
    // slice of the Morton curve, so parquet min/max footers prune on BOTH
    // dimensions. Assert the two properties the layout exists for.
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf).select(
      col("l_partkey").cast("long").as("l_partkey"),
      col("l_suppkey").cast("long").as("l_suppkey"))
    val ext = li.agg(
      min(col("l_partkey")).as("pmin"), max(col("l_partkey")).as("pmax"),
      min(col("l_suppkey")).as("smin"), max(col("l_suppkey")).as("smax"))
    val z = li.crossJoin(broadcast(ext))
      .select(graft.operators.Relational.zvalue(col("l_partkey"), col("l_suppkey"),
        col("pmin"), col("pmax"), col("smin"), col("smax")).as("z"),
        col("l_partkey"))
    val parts = z.repartitionByRange(8, col("z")).sortWithinPartitions("z")
      .select(org.apache.spark.sql.functions.spark_partition_id().as("p"),
        col("z"), col("l_partkey"))
      .groupBy(col("p"))
      .agg(min(col("z")).as("zlo"), max(col("z")).as("zhi"),
        min(col("l_partkey")).as("plo"), max(col("l_partkey")).as("phi"))
      .collect().sortBy(_.getAs[Long]("zlo"))
    assert(parts.length > 1, "range partitioner collapsed to one partition")
    // disjoint, ordered z-ranges across partitions
    parts.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("zhi") <= b.getAs[Long]("zlo"),
        s"overlapping z-ranges: $a vs $b")
    }
    // tight per-partition boxes: every partition's partkey span must be a
    // strict subset of the global span (single-column sort on suppkey
    // would leave partkey spans ~global in every file)
    val gl = li.agg(min(col("l_partkey")), max(col("l_partkey"))).head()
    val span = (gl.getLong(1) - gl.getLong(0)).max(1L)
    val tight = parts.count { r =>
      (r.getAs[Long]("phi") - r.getAs[Long]("plo")).toDouble / span < 0.6 }
    assert(tight >= parts.length / 2,
      s"z-order did not localize partkey: ${parts.mkString("; ")}")
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    // SCALE.md claims skew is handled by salting OR AQE's runtime skew
    // split; rel_salted_skew_join proves the first, this proves the
    // second: one hot key holding half the fact rows must come out of
    // AQE's re-plan as a skew-split sort-merge join, without any manual
    // salting in the query.
    import org.apache.spark.sql.functions._
    val saved = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled").map(k => k -> spark.conf.get(k))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    // tiny thresholds so the fixture's hot partition counts as skewed
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      // ~95% of fact rows land on key 0 — one shuffle partition dwarfs
      // the median no matter how the other 49 keys hash
      val fact = spark.range(1050000).select(
        when(col("id") < 1000000L, 0L).otherwise(pmod(col("id"), lit(50L))).as("k"),
        col("id").as("v"))
      val dim = spark.range(50).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      // global aggregate, not groupBy(k): a keyed aggregate downstream
      // REQUIRES hashpartitioning(k), and AQE (rightly) refuses to break
      // that distribution by splitting the skewed partition unless
      // forceOptimizeSkewedJoin is set — the global agg's partial phase
      // has no distribution requirement, so the split is free
      val joined = fact.join(dim, Seq("k")).agg(sum(col("v") + col("w")).as("s"))
      // collect() drives THIS dataset's QueryExecution (count() would
      // execute a derived plan and leave this one un-finalized)
      assert(joined.collect().head.getLong(0) > 0L)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not split the hot partition:\n${p.take(3000)}")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("zvalue is the exact Morton interleave: even bits = x, odd bits = y") {
    // on the identity grid ([0,65535] -> gridCoord(v)=v) the z-value must
    // satisfy the DEFINITION of the Morton code bit-for-bit — not just be
    // self-consistent with the oracle's copy of the same magic numbers
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L), (1L, 2L))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.operators.Relational.zvalue(col("x"), col("y"),
          lit(0L), lit(65535L), lit(0L), lit(65535L)).as("z"))
      .collect()
    got.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      (0 until 16).foreach { i =>
        assert(((z >> (2 * i)) & 1L) == ((x >> i) & 1L),
          s"even bit $i of z=$z != bit $i of x=$x")
        assert(((z >> (2 * i + 1)) & 1L) == ((y >> i) & 1L),
          s"odd bit $i of z=$z != bit $i of y=$y")
      }
    }
  }

  test("bucketed interval join equals the direct range predicate, incl. boundaries") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // points on a fine grid; intervals deliberately spanning 0, 1, and 2
    // bucket boundaries, touching lo (inclusive) and hi (exclusive)
    val pts = (0L until 200L).map(i => (i * 7L, i.toDouble)).toDF("pt", "value")
    val ivs = Seq((1L, 0L, 10L), (2L, 95L, 105L), (3L, 100L, 300L),
      (4L, 7L, 8L), (5L, 1393L, 1400L)).toDF("wid", "lo", "hi")
    val got = graft.operators.Relational.intervalJoinBucketed(pts, ivs, 100L)
      .select(col("wid"), col("pt")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (w, lo, hi) <- Seq((1L, 0L, 10L), (2L, 95L, 105L), (3L, 100L, 300L),
        (4L, 7L, 8L), (5L, 1393L, 1400L))
      i <- 0L until 200L
      p = i * 7L if p >= lo && p < hi
    } yield (w, p)).toSet
    assert(got == want, s"diff: ${(got diff want) ++ (want diff got)}")
  }
}

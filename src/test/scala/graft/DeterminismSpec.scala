package graft

import org.scalatest.funsuite.AnyFunSuite

/** Declared-output determinism under a different shuffle-partition count —
  * the engine contract that float results (already rounded to declared
  * precision inside each query) do not depend on physical parallelism,
  * mirroring the reference's counter-based-RNG reproducibility guarantee
  * (random/rng_state.hpp) extended to aggregation order.
  */
class DeterminismSpec extends AnyFunSuite {
  import TestSpark._

  private val probes = Seq(
    "rel_pricing_summary", "rel_top3_mktsegment", "mat_colstats",
    "mat_reduce_rows_by_key", "txt_bm25", "stat_v_measure",
    "pipe_simhash", "rng_normal")

  test("representative queries are identical under 4 vs 11 shuffle partitions") {
    probes.foreach { name =>
      val fn = SparkEntry.queries(name)
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val a = fn(spark, sf).collect().map(_.toString).sorted
      spark.conf.set("spark.sql.shuffle.partitions", "11")
      val b = fn(spark, sf).collect().map(_.toString).sorted
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      assert(a.sameElements(b), s"$name differs across partition counts")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ArrayMath._

/** Property-style invariants for the expression layer, evaluated over the
  * real embeddings (mirrors the reference's parameterized gtest sweeps,
  * cpp/tests/linalg/reduce.cu).
  */
class ArrayMathSpec extends AnyFunSuite {
  import TestSpark._

  // NOT cached: caching registers the exact `vectors` plan subtree, and
  // Catalyst splices the InMemoryRelation into ANY concurrent suite's
  // query over the same table — ColumnarSeamSpec's kernel-rule test then
  // (correctly) sees no columnar scan to match (r12 suite-run flake).
  // sf0.001 data; the re-reads are microseconds.
  private lazy val v = graft.Tables.vectors(spark, sf)

  test("norm inequalities hold on every row: linf <= l2 <= l1 <= sqrt(d)*l2") {
    val bad = v.select(
      l1(col("vec")).as("n1"), l2(col("vec")).as("n2"), linf(col("vec")).as("ni"),
      size(col("vec")).as("d"))
      .where(col("ni") > col("n2") + 1e-9 ||
        col("n2") > col("n1") + 1e-9 ||
        col("n1") > sqrt(col("d")) * col("n2") + 1e-9)
    assert(bad.count() == 0)
  }

  test("triangle inequality: l2(a+b) <= l2(a) + l2(b)") {
    val bad = v.select(
      l2(add(col("vec"), reverse(col("vec")))).as("lhs"),
      (l2(col("vec")) * 2).as("rhs")) // l2(reverse(v)) == l2(v)
      .where(col("lhs") > col("rhs") + 1e-9)
    assert(bad.count() == 0)
  }

  test("L2-normalized rows have unit norm") {
    val bad = v.select(
      abs(l2(normalize(col("vec"), l2(col("vec")))) - 1.0).as("err"))
      .where(col("err") > 1e-9)
    assert(bad.count() == 0)
  }

  test("threshold is idempotent and never increases L0") {
    val t1 = threshold(col("vec"), lit(0.5))
    val bad = v.select(
      l0(threshold(t1, lit(0.5))).as("twice"), l0(t1).as("once"), l0(col("vec")).as("raw"))
      .where(col("twice") =!= col("once") || col("once") > col("raw"))
    assert(bad.count() == 0)
  }

  test("dot is symmetric and consistent with l2: dot(a,a) = l2(a)^2") {
    val bad = v.select(
      abs(dot(col("vec"), reverse(col("vec")))
        - dot(reverse(col("vec")), col("vec"))).as("asym"),
      abs(dot(col("vec"), col("vec")) - pow(l2(col("vec")), 2)).as("mismatch"))
      .where(col("asym") > 1e-9 || col("mismatch") > 1e-9)
    assert(bad.count() == 0)
  }

  test("discrete RNG matches weight distribution within 3 sigma") {
    import graft.operators.RandomOps
    val n = 20000
    val counts = spark.range(n)
      .select(RandomOps.discrete(col("id"), 7, "d", Seq(0.1, 0.2, 0.3, 0.4)).as("c"))
      .groupBy(col("c")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    Seq(0.1, 0.2, 0.3, 0.4).zipWithIndex.foreach { case (p, i) =>
      val expect = n * p
      val sigma = math.sqrt(n * p * (1 - p))
      assert(math.abs(counts(i) - expect) < 3 * sigma,
        s"cat $i: ${counts(i)} vs $expect")
    }
  }
}

package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.operators.RandomOps

/** Property tests for the counter-hash RNG layer: range contracts and
  * stream decorrelation hold for ARBITRARY (id, seed, stream) triples —
  * the Philox-style guarantee of the reference's RNG (reproducible,
  * launch-shape-independent draws) pinned by ScalaCheck. Each property
  * evaluates one generated batch through the real session (the same
  * path production queries run), so codegen is in the loop.
  */
object RngProps extends Properties("CounterRng") {

  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.DataFrame

  private val idsGen = Gen.listOfN(64, Gen.chooseNum(0L, 10000000L))
  private val seedGen = Gen.chooseNum(0L, 1000000L)
  private val streamGen = Gen.identifier.map(s => if (s.isEmpty) "s" else s.take(12))

  private def idsDf(ids: List[Long]): DataFrame = {
    import spark.implicits._
    ids.toDF("id")
  }

  property("hashU lands in [0, 1) for arbitrary ids/seeds/streams") =
    forAll(idsGen, seedGen, streamGen) { (ids, seed, st) =>
      val us = idsDf(ids)
        .select(RandomOps.hashU(col("id"), seed, st).as("u"))
        .collect().map(_.getDouble(0))
      Prop(us.forall(u => u >= 0.0 && u < 1.0)) :| s"out of range: ${us.filterNot(u => u >= 0.0 && u < 1.0).take(3).mkString(",")}"
    }

  property("uniform(lo, hi) lands in [lo, hi)") =
    forAll(idsGen, seedGen, Gen.chooseNum(-100.0, 100.0),
      Gen.chooseNum(0.001, 50.0)) { (ids, seed, lo, w) =>
      val us = idsDf(ids)
        .select(RandomOps.uniform(col("id"), seed, "p", lo, lo + w).as("u"))
        .collect().map(_.getDouble(0))
      Prop(us.forall(u => u >= lo && u < lo + w))
    }

  property("uniformInt(lo, hi) lands in [lo, hi)") =
    forAll(idsGen, seedGen, Gen.chooseNum(-50L, 50L),
      Gen.chooseNum(1L, 1000L)) { (ids, seed, lo, w) =>
      val vs = idsDf(ids)
        .select(RandomOps.uniformInt(col("id"), seed, "p", lo, lo + w).as("v"))
        .collect().map(_.getLong(0))
      Prop(vs.forall(v => v >= lo && v < lo + w))
    }

  property("bernoulli respects p = 0 and p = 1 exactly") =
    forAll(idsGen, seedGen) { (ids, seed) =>
      val rows = idsDf(ids).select(
        RandomOps.bernoulli(col("id"), seed, "b", 0.0).as("z"),
        RandomOps.bernoulli(col("id"), seed, "b", 1.0).as("o"))
        .collect()
      Prop(rows.forall(r => r.getInt(0) == 0 && r.getInt(1) == 1))
    }

  property("distinct streams decorrelate (draws not all equal)") =
    forAll(Gen.chooseNum(0L, 10000000L), seedGen) { (id, seed) =>
      val draws = idsDf(List(id)).select(
        (0 until 8).map(i => RandomOps.hashU(col("id"), seed, s"s$i").as(s"u$i")): _*)
        .collect().head.toSeq.map(_.asInstanceOf[Double])
      Prop(draws.distinct.length > 1)
    }

  property("scaledBernoulli emits only ±scale; p = 0 and p = 1 are exact") =
    forAll(idsGen, seedGen, Gen.chooseNum(0.5, 10.0)) { (ids, seed, sc) =>
      val rows = idsDf(ids).select(
        RandomOps.scaledBernoulli(col("id"), seed, "sb", 0.5, sc).as("v"),
        RandomOps.scaledBernoulli(col("id"), seed, "sb", 0.0, sc).as("z"),
        RandomOps.scaledBernoulli(col("id"), seed, "sb", 1.0, sc).as("o")).collect()
      Prop(rows.forall(r => math.abs(r.getDouble(0)) == sc &&
        r.getDouble(1) == sc && r.getDouble(2) == -sc))
    }

  property("normalInt(mu, 0) is exactly trunc(mu); sigma shifts stay finite") =
    forAll(idsGen, seedGen, Gen.chooseNum(-500.0, 500.0)) { (ids, seed, mu) =>
      val rows = idsDf(ids).select(
        RandomOps.normalInt(col("id"), seed, "ni", mu, 0.0).as("k0"),
        RandomOps.normalInt(col("id"), seed, "ni", mu, 3.0).as("k3")).collect()
      Prop(rows.forall(r => r.getLong(0) == mu.toLong &&
        math.abs(r.getLong(1) - mu) < 3.0 * 40 + 1))
    }
}

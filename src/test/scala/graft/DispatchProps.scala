package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters
import org.apache.spark.sql.functions._
import graft.operators.{LabelOps, SolverOps}

/** Size-dispatch equivalence, property-tested: the driver-local fast
  * paths (union-find CC, Kruskal MST) must produce EXACTLY the result of
  * the distributed paths (pointer-jumping rounds, Borůvka rounds) on
  * arbitrary random graphs — not just the fixtures the specs pin. Each
  * sample runs both paths through the live session (forcing the
  * distributed branch with localThreshold = -1), so this is the actual
  * dispatch seam under test. Kept to few samples — each is a full
  * iterative Spark job.
  */
object DispatchProps extends Properties("SizeDispatch") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val edgeGen: Gen[List[(Long, Long)]] =
    Gen.choose(5, 40).flatMap { n =>
      Gen.choose(n - 1, 3 * n).flatMap { m =>
        Gen.listOfN(m, for {
          a <- Gen.choose(0L, n.toLong - 1)
          b <- Gen.choose(0L, n.toLong - 1)
          if a != b
        } yield (a, b))
      }
    }.suchThat(_.nonEmpty)

  property("connected components: local union-find == distributed pointer-jumping") =
    forAll(edgeGen) { edges =>
      import spark.implicits._
      val df = edges.toDF("src", "dst")
      def labels(threshold: Long) =
        LabelOps.connectedComponents(df, localThreshold = threshold)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val local = labels(Long.MaxValue)
      val dist = labels(-1L)
      Prop(local == dist) :| s"local=$local dist=$dist"
    }

  property("MST: local Kruskal == distributed Boruvka (same tie-break)") =
    forAll(edgeGen) { edges =>
      import spark.implicits._
      // deterministic distinct-ish weights from the endpoints; symmetric
      val df = edges.toDF("src", "dst")
        .select(col("src"), col("dst"),
          (pmod(col("src") * 31 + col("dst") * 17, lit(97L)).cast("double") / 97.0
            + lit(0.001)).as("value"))
      val sym = df.unionByName(
        df.select(col("dst").as("src"), col("src").as("dst"), col("value")))
      def forest(threshold: Long) =
        SolverOps.boruvkaMst(sym, localThreshold = threshold)
          .collect().map(r => (r.getLong(0), r.getLong(1),
            math.rint(r.getDouble(2) * 1e9))).toSet
      val local = forest(Long.MaxValue)
      val dist = forest(-1L)
      Prop(local == dist) :| s"local=$local dist=$dist"
    }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsOfJoin

/** The custom as-of join operator: semantics on hand-built cases,
  * equivalence with the declarative inequality-join + max form on real
  * events data, and the planned physical shape. */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("as-of picks the last right row with ts <= left ts, per key") {
    import spark.implicits._
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"), (3L, 9L, "d"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 5L, 100.0), (1L, 15L, 200.0), (1L, 25L, 300.0),
      (2L, 5L, 400.0), (2L, 6L, 500.0))
      .toDF("rk", "rt", "v")
    val got = AsOfJoin(l, r, "k", "rk", "t", "rt")
      .select(col("tag"), col("rt"), col("v")).collect()
      .map(x => x.getString(0) -> (if (x.isNullAt(1)) null else (x.getLong(1), x.getDouble(2)))).toMap
    assert(got("a") == ((5L, 100.0)))   // 15 > 10, so the 5 row
    assert(got("b") == ((15L, 200.0)))  // 25 > 20
    assert(got("c") == ((5L, 400.0)))   // equal ts matches (<=)
    assert(got("d") == null)            // key 3 has no right rows
  }

  test("as-of equals the declarative inequality join + argmax on events") {
    val e = Tables.events(spark, sf)
    val s = e.where(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
    val native = AsOfJoin(e, s, "user_id", "s_user", "ts", "s_ts")
      .where(col("s_ts").isNotNull)
      .select(col("event_id"), col("s_ts"))
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    val decl = e.join(s, e("user_id") === col("s_user") && col("s_ts") <= e("ts"))
      .groupBy(col("event_id")).agg(max(col("s_ts")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    assert(native == decl, s"native ${native.size} rows vs declarative ${decl.size}")
    assert(native.nonEmpty)
  }

  test("planned shape: AsOfJoinExec over sorted, hash-clustered children") {
    import spark.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L, 1.0)).toDF("rk", "rt", "v")
    val p = AsOfJoin(l, r, "k", "rk", "t", "rt")
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"custom exec not planned:\n$p")
    assert(p.contains("Sort"), "required child ordering not enforced")
  }

  test("duplicate attributes across sides are rejected (no dedup pass for custom nodes)") {
    val e = Tables.events(spark, sf)
    intercept[IllegalArgumentException] {
      AsOfJoin(e, e, "user_id", "user_id", "ts", "ts")
    }
  }
}

package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/** Plan-SHAPE snapshot regression (NOTES round-5 candidate #3): PlanSpec
  * guards specific known failure modes; this suite pins the WHOLE
  * physical tree (node class names only — no ids, sizes, or expression
  * text) for the headline queries, so ANY shape change — a join strategy
  * flip, a lost partial aggregate, an extra exchange, codegen falling
  * out — fails a spec with a line diff instead of surfacing as a bench
  * regression two rounds later.
  *
  * Snapshots live in src/test/resources/plan_snapshots/<query>.txt.
  * After an INTENTIONAL plan change, regenerate with
  * `GRAFT_UPDATE_PLAN_SNAPSHOTS=1 sbt "testOnly graft.PlanSnapshotSpec"`
  * and review the diff in git like any other source change. Captured
  * with AQE off (the static plan EnsureRequirements produces — AQE
  * re-plans at runtime from exactly this tree) on the fixed sf0.001
  * data, so the shape is deterministic.
  */
class PlanSnapshotSpec extends AnyFunSuite {
  import TestSpark._

  private val tracked = Seq(
    "rel_top3_mktsegment", "rel_asof_native", "rel_window_frames",
    "pipe_minhash_lsh", "pipe_embed_neardup", "pipe_semantic_dedup",
    "pipe_ann_lsh", "sp_spmm", "sp_laplacian", "dist_knn_graph",
    "mat_gemv_native", "mat_gemv_topk", "mat_l2q_topk", "txt_tfidf")

  private val snapDir = new File("src/test/resources/plan_snapshots")
  private val update = sys.env.contains("GRAFT_UPDATE_PLAN_SNAPSHOTS")

  /** Class-name tree, one node per line, two-space indent per level —
    * line diffs read like the plan. */
  private def sig(p: SparkPlan, depth: Int = 0): String = {
    val name = p.getClass.getSimpleName.stripSuffix("$")
    val self = ("  " * depth) + name
    (self +: p.children.map(sig(_, depth + 1))).mkString("\n")
  }

  private def capture(name: String): String = {
    spark.catalog.clearCache()
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try sig(SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan) + "\n"
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  tracked.foreach { name =>
    test(s"plan shape unchanged: $name") {
      val got = capture(name)
      val f = new File(snapDir, s"$name.txt")
      if (update || !f.exists()) {
        snapDir.mkdirs()
        Files.write(Paths.get(f.getPath), got.getBytes(StandardCharsets.UTF_8))
        info(s"snapshot ${if (update) "updated" else "created"}: ${f.getPath}")
      } else {
        val want = new String(Files.readAllBytes(Paths.get(f.getPath)), StandardCharsets.UTF_8)
        if (got != want) {
          val g = got.linesIterator.toVector
          val w = want.linesIterator.toVector
          val firstDiff = g.zipAll(w, "<end>", "<end>").indexWhere { case (a, b) => a != b }
          fail(s"plan shape changed for $name at line ${firstDiff + 1}:\n" +
            s"  expected: ${w.lift(firstDiff).getOrElse("<end>")}\n" +
            s"  got:      ${g.lift(firstDiff).getOrElse("<end>")}\n" +
            s"full tree now:\n$got\nif intentional: GRAFT_UPDATE_PLAN_SNAPSHOTS=1 " +
            "sbt \"testOnly graft.PlanSnapshotSpec\" and commit the diff")
        }
      }
    }
  }
}

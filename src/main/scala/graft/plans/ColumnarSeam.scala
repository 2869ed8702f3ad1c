package graft.plans

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.{ColumnarRule => SparkColumnarRule}

/** The GPU-pluggability seam, made concrete (NOTES "GPU-pluggability"
  * design note): accelerator plugins attach through
  * `SparkSessionExtensions.injectColumnar`, replacing scans/joins/
  * aggregates with columnar implementations. This probe is the minimal
  * honest inhabitant of that seam — it walks every physical plan at the
  * exact hook an accelerator would use and records which operator classes
  * crossed it, WITHOUT altering execution (both transitions are
  * identity). ColumnarSeamSpec asserts the hook fires and results are
  * byte-identical with it installed, which is precisely the contract a
  * real columnar backend must meet; swapping this probe for one that
  * returns columnar replacements is the documented accelerator path.
  */
object ColumnarSeamProbe {
  val plansSeen = new AtomicLong(0)
  /** Distinct SparkPlan node class names observed at the seam. */
  val nodesSeen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def reset(): Unit = { plansSeen.set(0); nodesSeen.clear() }
}

class ColumnarSeamRule extends SparkColumnarRule {
  override def preColumnarTransitions: org.apache.spark.sql.catalyst.rules.Rule[SparkPlan] =
    new org.apache.spark.sql.catalyst.rules.Rule[SparkPlan] {
      override def apply(plan: SparkPlan): SparkPlan = {
        ColumnarSeamProbe.plansSeen.incrementAndGet()
        plan.foreach(n => ColumnarSeamProbe.nodesSeen.add(n.getClass.getSimpleName))
        plan // identity: observe, never rewrite
      }
    }
}

/** Extensions variant that wires BOTH the optimizer rules and the
  * columnar seam probe — what a deployment with an accelerator plugin
  * would look like structurally. */
class GraftExtensionsWithSeam extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    new GraftExtensions().apply(ext)
    ext.injectColumnar(_ => new ColumnarSeamRule)
  }
}

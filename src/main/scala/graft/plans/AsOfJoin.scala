package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN as a first-class operator — the whole-operator tier of the
  * extension ladder (custom LogicalPlan + SparkStrategy + SparkPlan via
  * `injectPlannerStrategy`), for the one join shape Spark has no native
  * operator for: "attach the LAST right row with rightTs ≤ leftTs per
  * key" (reference semantics: the `rel_asof_last_signup` query, which
  * the declarative form answers with an inflating inequality join + a
  * re-aggregating window/group — every prior right row materializes per
  * left row before the max collapses them).
  *
  * Physical shape: both sides hash-clustered on the key and sorted by
  * (key, ts) — declared through `requiredChildDistribution` /
  * `requiredChildOrdering`, so EnsureRequirements plans the exchanges
  * and sorts (AQE-visible, co-partitioned like a SortMergeJoin). Each
  * zipped partition pair is then ONE forward merge sweep: O(|L| + |R|)
  * per partition, constant memory (a single buffered right row), no
  * intermediate inflation. At 100 TB this is the same cost class as a
  * sort-merge join minus the many-to-many expansion.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; injected by
  * [[GraftExtensions]] next to the fusion rules. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  @inline private def cmp(a: Any, b: Any): Int =
    if (a == null && b == null) 0
    else if (a == null) -1
    else if (b == null) 1
    else a.asInstanceOf[Comparable[Any]].compareTo(b)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyRef = BindReferences.bindReference(leftKey: Expression, left.output)
    val lTsRef = BindReferences.bindReference(leftTs: Expression, left.output)
    val rKeyRef = BindReferences.bindReference(rightKey: Expression, right.output)
    val rTsRef = BindReferences.bindReference(rightTs: Expression, right.output)
    val nRight = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      // right rows are buffered across next() calls — copy out of the
      // shuffle reader's reused UnsafeRow buffer
      var rNext: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
      var matchRow: InternalRow = null
      var matchKey: Any = null
      lIter.map { l =>
        val lk = lKeyRef.eval(l)
        val lt = lTsRef.eval(l)
        if (lk == null || lt == null) {
          joined(l, nullRight)
        } else {
          if (matchRow != null && cmp(matchKey, lk) != 0) { matchRow = null }
          var advancing = true
          while (advancing && rNext != null) {
            val rk = rKeyRef.eval(rNext)
            val kc = cmp(rk, lk)
            if (kc < 0) {
              // right key behind the left cursor: never needed again
              rNext = if (rIter.hasNext) rIter.next().copy() else null
            } else if (kc == 0) {
              val rt = rTsRef.eval(rNext)
              if (rt != null && cmp(rt, lt) <= 0) {
                matchRow = rNext; matchKey = rk
                rNext = if (rIter.hasNext) rIter.next().copy() else null
              } else if (rt == null) {
                // null ts sorts first and can never satisfy ts <= leftTs
                rNext = if (rIter.hasNext) rIter.next().copy() else null
              } else advancing = false
            } else advancing = false
          }
          joined(l, if (matchRow != null) matchRow else nullRight)
        }
      }
    }
  }
}

/** Column-name API — resolves names against the ANALYZED child plans and
  * materializes the custom node (the one `private[sql]` touch, via
  * GraftSqlShim). The right side's columns MUST be named apart from the
  * left's (alias them): a custom node gets no DeduplicateRelations pass,
  * so a self-join with shared exprIds would alias attributes across
  * sides. Enforced here. */
object AsOfJoin {
  def apply(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTs: String, rightTs: String): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(",")}"))
    val dupIds = lPlan.outputSet.intersect(rPlan.outputSet)
    require(dupIds.isEmpty,
      s"as-of sides share attributes ${dupIds.mkString(",")} — alias the right side first")
    GraftSqlShim.ofRows(left.sparkSession,
      AsOfJoinPlan(lPlan, rPlan, attr(lPlan, leftKey), attr(rPlan, rightKey),
        attr(lPlan, leftTs), attr(rPlan, rightTs)))
  }
}

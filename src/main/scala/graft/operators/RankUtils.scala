package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row_number — the TeraSort shape shared by the
  * total-order operators (sorted-neighborhood rank, budget cumsum, exact
  * quantiles): range-partition on the sort key, rank WITHIN each
  * partition in parallel, add broadcast per-partition row-count offsets.
  * A bare `Window.orderBy(...)` with no partition key moves every row to
  * ONE task — correct, and a bottleneck at any real scale. The produced
  * rank is a pure function of the total order, so partitioner boundary
  * placement cannot change it.
  */
object RankUtils {

  /** Appends `out` = 1-based global rank of each row under `sortCols`
    * (which must be a total order for determinism). Materializes the
    * ranked prefix once (localCheckpoint) because the offset pass and
    * the caller both consume it. */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
      out: String = "rn", parts: Int = 0): DataFrame = {
    val p = if (parts > 0) parts
      else math.max(1, df.sparkSession.sparkContext.defaultParallelism / 4)
    val local = df.repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__rnl", row_number().over(
        Window.partitionBy(col("__pid")).orderBy(sortCols: _*)))
      .localCheckpoint(true)
    val counts = local.groupBy(col("__pid")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ids = counts.keys.toSeq.sorted
    val offsets = ids.zip(ids.map(counts).scanLeft(0L)(_ + _)).toMap
    val offCol = ids.foldLeft(lit(0L)) { (acc, pid) =>
      when(col("__pid") === pid, lit(offsets(pid))).otherwise(acc)
    }
    local.withColumn(out, col("__rnl").cast("long") + offCol)
      .drop("__pid", "__rnl")
  }
}

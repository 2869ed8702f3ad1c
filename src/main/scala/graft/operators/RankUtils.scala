package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed total-order machinery — the TeraSort shape shared by every
  * operator whose semantics are a function of a global sort (sorted-
  * neighborhood rank, budget cumsum, exact quantiles, label densification,
  * row shift): range-partition on the sort key, compute WITHIN each
  * partition in parallel, then stitch partitions with per-partition
  * boundary state (row counts / running totals / last row) that is only
  * O(#partitions) — collected once and joined back as a BROADCAST table,
  * never an O(p) when-chain expression (which at thousands of partitions
  * becomes an O(p)-deep per-row expression and can blow codegen method
  * limits). A bare `Window.orderBy(...)` with no partition key moves every
  * row to ONE task — correct, and a bottleneck at any real scale. All
  * outputs are pure functions of the total order, so partitioner boundary
  * placement cannot change them.
  *
  * Sort columns must be ascending EXPRESSIONS (negate a column to sort
  * descending, e.g. `-col("score")`) — `.desc` markers are not supported
  * because the boundary aggregation orders by the same expressions.
  */
object RankUtils {

  private def numParts(df: DataFrame, parts: Int): Int =
    if (parts > 0) parts
    else math.max(1, df.sparkSession.sparkContext.defaultParallelism / 4)

  /** Range-partition + in-partition sort + partition id — the common
    * prefix of every total-order operator here. */
  private def ranged(df: DataFrame, sortCols: Seq[Column], p: Int): DataFrame =
    df.repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())

  /** Joins a tiny driver-computed (pid -> long) table back as a broadcast
    * hash join keyed on `__pid` — the scale-safe replacement for folding
    * the lookup into a when-chain expression. */
  private def joinOffsets(local: DataFrame, byPid: Map[Int, Long], out: String): DataFrame = {
    val spark = local.sparkSession
    import spark.implicits._
    val offs = byPid.toSeq.sortBy(_._1).toDF("__pid", out)
    local.join(broadcast(offs), Seq("__pid"))
  }

  /** Exclusive scan of a per-pid total: offset(pid) = Σ totals of lower pids. */
  private def exclusiveScan(totals: Map[Int, Long]): Map[Int, Long] = {
    val ids = totals.keys.toSeq.sorted
    ids.zip(ids.map(totals).scanLeft(0L)(_ + _)).toMap
  }

  /** Appends `out` = 1-based global rank of each row under `sortCols`
    * (which must be a total order for determinism). Materializes the
    * ranked prefix once (localCheckpoint) because the offset pass and
    * the caller both consume it. */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
      out: String = "rn", parts: Int = 0): DataFrame = {
    val local = ranged(df, sortCols, numParts(df, parts))
      .withColumn("__rnl", row_number().over(
        Window.partitionBy(col("__pid")).orderBy(sortCols: _*)))
      .localCheckpoint(true)
    val counts = local.groupBy(col("__pid")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    joinOffsets(local, exclusiveScan(counts), "__off")
      .withColumn(out, col("__rnl").cast("long") + col("__off"))
      .drop("__pid", "__rnl", "__off")
  }

  /** Appends `out` = inclusive global running sum of `value` (a non-null
    * BIGINT expression — counters/costs) in `sortCols` order: in-partition
    * window cumsum in parallel, plus the broadcast exclusive scan of the
    * per-partition totals. The cumsum shape of [[globalRowNumber]]. */
  def globalPrefixSum(df: DataFrame, sortCols: Seq[Column], value: Column,
      out: String = "cum", parts: Int = 0): DataFrame = {
    val local = ranged(df.withColumn("__v", value.cast("long")), sortCols, numParts(df, parts))
      .withColumn("__cuml", sum(col("__v")).over(
        Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint(true)
    val totals = local.groupBy(col("__pid")).agg(sum(col("__v")).as("t")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    joinOffsets(local, exclusiveScan(totals), "__off")
      .withColumn(out, col("__cuml") + col("__off"))
      .drop("__pid", "__v", "__cuml", "__off")
  }

  /** Appends `out` = `value` of the PREVIOUS row in `sortCols` order
    * (`default` for the globally first row) — a global lag(1) without a
    * global window: lag within each range partition in parallel, then fill
    * each partition's first row from ONE boundary row per predecessor
    * partition (the per-partition last `value`, O(p) rows collected and
    * broadcast back). `value` must be a non-null DOUBLE expression — a
    * null would be indistinguishable from the partition-boundary fill. */
  def globalLag(df: DataFrame, sortCols: Seq[Column], value: Column,
      out: String = "lag", default: Column = lit(null), parts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val local = ranged(df.withColumn("__v", value.cast("double")), sortCols, numParts(df, parts))
      .withColumn("__lagl", lag(col("__v"), 1).over(
        Window.partitionBy(col("__pid")).orderBy(sortCols: _*)))
      .localCheckpoint(true)
    // one boundary row per non-empty partition: its last value in sort order
    val lasts = local.groupBy(col("__pid"))
      .agg(max_by(col("__v"), struct(sortCols: _*)).as("last")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // predecessor fill for pid i = last value of the nearest non-empty lower pid
    val ids = lasts.keys.toSeq.sorted
    val fills: Seq[(Int, Option[Double])] =
      ids.zip(None +: ids.init.map(p => Some(lasts(p))))
    val offs = fills.toDF("__pid", "__bnd")
    local.join(broadcast(offs), Seq("__pid"))
      .withColumn(out, coalesce(col("__lagl"), col("__bnd"), default))
      .drop("__pid", "__v", "__lagl", "__bnd")
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (see TESTDATA.md / FIXTURES.md)
  * plus the canonical encodings from SURVEY.md §1.5:
  *
  *  - dense matrix  -> `(id BIGINT, vec ARRAY<DOUBLE>)`  (one row per matrix row)
  *  - sparse matrix -> COO table `(row BIGINT, col BIGINT, value DOUBLE)`
  *
  * The COO-as-relational-table encoding mirrors the reference's own note that a
  * COO structure is an "edge list" (reference: cpp/include/raft/core/coo_matrix.hpp:87);
  * under it, spmm/degree/transpose/symmetrize become plain SQL (SURVEY.md §2.4).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS). Depending on the Spark build the
    * column surfaces either as LongType (when the legacy nanosAsLong conf is
    * honored) or as TIMESTAMP_NTZ (current 4.1.x jars ignore the conf and read
    * nanos directly, truncating to micros). Branch on the ACTUAL read schema so
    * both environments yield the same `ts TIMESTAMP` column (session TZ is UTC,
    * so the NTZ -> TZ cast is value-identical).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => // already a zoned timestamp (or future reader behavior): normalize via cast
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Dense-matrix canonical form: embeddings as (id, vec ARRAY<DOUBLE>, label).
    * Maps the reference's `device_matrix_view<float>` input shape
    * (cpp/include/raft/core/device_mdspan.hpp:98) onto a row-per-record table.
    */
  def vectors(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir).select(
      col("vec_id").as("id"),
      // array-level Cast (codegen-able) — a transform() lambda here would
      // knock every downstream projection out of whole-stage codegen
      col("embedding").cast("array<double>").as("vec"),
      col("label"))

  /** Sparse COO canonical form derived from lineitem:
    * row = l_orderkey, col = l_partkey, value = sum(l_quantity).
    * Duplicate (row,col) entries are pre-summed so the matrix is canonical
    * (the reference requires sorted/deduped COO for most sparse ops,
    * cpp/include/raft/sparse/op/sort.cuh:31).
    */
  def cooOrdersParts(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .groupBy(col("l_orderkey").as("row"), col("l_partkey").as("col"))
      .agg(sum(col("l_quantity")).as("value"))
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Source/sink connectors beyond the primary Parquet path (SURVEY §2.1
  * "file formats" row — the reference itself ships no file IO; these are
  * the formats a Spark deployment of the library meets in practice).
  * Each round-trip writes under the build directory (never the read-only
  * testdata), reads back through the format's full parse path (schema
  * inference off — explicit DDL, the production posture), and the driver
  * oracle checks the aggregate against the original table, so quoting/
  * escaping/null round-trip fidelity is what's actually asserted.
  */
object Connectors {

  // Unique per invocation: concurrent drivers (bench + correctness, or a
  // re-invoked query lambda) must not race on one Overwrite directory.
  private def tmpDir(name: String) =
    s"target/tmp/connectors/$name-${java.util.UUID.randomUUID()}"

  /** CSV round-trip: customer → CSV → read with explicit schema →
    * rollup. The DOUBLE acctbal exercises float print/parse fidelity;
    * the money sum goes through per-row integer cents so the check is
    * order-independent and exact on both engines. */
  def csvRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("customer_csv")
    Tables.customer(spark, dir)
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(out)
    spark.read
      .schema("c_custkey BIGINT, c_name STRING, c_nationkey INT, " +
        "c_acctbal DOUBLE, c_mktsegment STRING")
      .option("header", "true").csv(out)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("c_custkey")).as("key_sum"),
        sum(round(col("c_acctbal") * 100).cast("long")).as("acct_cents"))
  }

  /** JSON-lines round-trip: nation → json → read with explicit schema →
    * per-region rollup (ordered by key via the group-by result). */
  def jsonRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("nation_json")
    Tables.nation(spark, dir)
      .write.mode(SaveMode.Overwrite).json(out)
    spark.read
      .schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT, n_comment STRING")
      .json(out)
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_nations"), sum(col("n_nationkey")).as("key_sum"))
  }

  /** ORC round-trip: supplier → ORC → read back → per-nation rollup.
    * ORC is the second columnar format a warehouse deployment meets
    * (predicate pushdown and column pruning work the same as Parquet —
    * the read back through a typed scan asserts the binary round-trip,
    * the money sum goes through integer cents as in the CSV check). */
  def orcRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("supplier_orc")
    Tables.supplier(spark, dir)
      .write.mode(SaveMode.Overwrite).orc(out)
    spark.read.orc(out)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("s_suppkey")).as("key_sum"),
        sum(round(col("s_acctbal") * 100).cast("long")).as("acct_cents"))
  }
}

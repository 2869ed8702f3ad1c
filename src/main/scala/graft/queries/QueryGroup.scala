package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-facing queries + their DuckDB oracle SQL.
  * Keys present in `q` but absent from `sql` get the driver's weaker
  * rows-only check (used for ops not expressible in ANSI SQL, e.g.
  * hash-RNG generators).
  */
trait QueryGroup {
  def q: Map[String, (SparkSession, String) => DataFrame]
  def sql: Map[String, String]
}


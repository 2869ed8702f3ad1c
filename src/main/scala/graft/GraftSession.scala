package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory for the engine (the `RaftSession` of
  * SURVEY.md §7): AQE on, shuffle partitions sized to cores (not 200),
  * UTC, nanos-tolerant parquet reads. Local by default; pass a cluster
  * master in deployment.
  */
object GraftSession {
  def create(cores: Int = 32, appName: String = "graft",
      master: String = ""): SparkSession = {
    val m = if (master.nonEmpty) master else s"local[$cores]"
    val spark = SparkSession.builder()
      .master(m)
      .appName(appName)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

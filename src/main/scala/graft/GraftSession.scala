package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's session config — Verify/Bench/Explain all
  * build through here so load-bearing flags (nanosAsLong for the
  * TIMESTAMP(NANOS) events parquet, the extensions wiring) cannot drift
  * between entry points.
  */
object GraftSession {
  def build(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")
      // events.parquet carries TIMESTAMP(NANOS) — read as raw int64 nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

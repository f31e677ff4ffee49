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
    // Shuffle partitions must scale with DATA, not cores: at the shipped
    // SFs 32 (= cores) is right, but the ×100 scale smoke put 45M distinct
    // groups through 32 partitions and the spilling aggregation thrashed
    // for half an hour before dying. AQE coalesces small partitions but
    // never splits big ones, so the upper bound has to be set here —
    // a real deployment derives it from input bytes / target partition
    // size; the smoke passes GRAFT_SHUFFLE_PARTITIONS explicitly.
    val shufflePartitions = sys.env.getOrElse("GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
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

package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) — read as raw int64 nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM once (codegen compiler, parquet reader, shuffle, join
    // machinery) so the first timed query doesn't absorb session startup.
    // Warm against the bench's OWN data dir — a hardcoded path could be
    // absent and silently skip the warmup, skewing the first timed query.
    try SparkEntry.queries("combine")(spark, sfDir).count()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // "sf" as the numeric scale factor when the dir encodes one (sf0.1 →
    // 0.1). The pattern requires a leading digit and at most one dot so a
    // dir like sf0.1.bak can't produce invalid JSON; the quoted fallback
    // escapes the path.
    val sf = "sf([0-9]+(?:\\.[0-9]+)?)".r.findFirstMatchIn(sfDir)
      .map(_.group(1))
      .getOrElse("\"" + sfDir.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":$sf}""")
    spark.stop()
  }
}

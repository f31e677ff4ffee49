package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. An optional 3rd
  * arg (comma-separated names) restricts the dump to those queries — a
  * local iteration aid; the driver always runs the 2-arg full form. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, only) = args match {
      case Array(a, b)        => (a, b, None)
      case Array(a, b, names) => (a, b, Some(names.split(",").toSet))
    }
    val spark = GraftSession.build("graft-verify", Some(sfDir))
    new java.io.File(outDir).mkdirs()
    // GRAFT_VERIFY_FIXTURES=1: obtain every persisted fixture BEFORE the
    // dump, so the queries run their FIXTURE-SERVED paths under the full
    // DuckDB hash gate (the driver runs without it and gates the inline
    // rebuild paths — together the two runs gate both sides of every
    // fixture ≡ rebuilt equivalence at any SF).
    if (sys.env.get("GRAFT_VERIFY_FIXTURES").contains("1")) {
      operators.Similarity.ivfPqIndexWrite(spark, sfDir)
      operators.Similarity.rankedTopKWrite(spark, sfDir)
      operators.Similarity.semanticModelWrite(spark, sfDir)
      operators.Graph.edgeFixtureWrite(spark, sfDir)
      operators.Dedup.baseIndexWrite(spark, sfDir)
      operators.Dedup.pairFixtureWrite(spark, sfDir)
      operators.TextAnalysis.gramFixtureWrite(spark, sfDir)
      operators.TextAnalysis.bigramFixtureWrite(spark, sfDir)
      Scratch.release(spark)
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        // per-query scratch persists die with the query (Scratch scaladoc)
        Scratch.release(spark)
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // end-of-session memo teardown (pair frames, component labels,
    // bucketed-table readiness) — see Dedup.releaseSession
    operators.Dedup.releaseSession(spark)
    operators.Similarity.releaseSession(spark)
    operators.Graph.releaseSession(spark)
    operators.TextAnalysis.releaseSession(spark)
    sources.Ingest.releaseSession(spark)
    spark.stop()
  }
}

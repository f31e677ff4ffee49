package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every capability is declared once as a [[Q]] in its operator module and
  * registered here; `queries`/`oracleSql` are derived views so a query and
  * its DuckDB oracle can never drift apart.
  */
object SparkEntry {

  /** All implemented capabilities (SURVEY.md §2 inventory + extensions). */
  def registry: Seq[Q] =
    operators.Analytics.all ++ operators.TextAnalysis.all ++
      operators.Dedup.all ++ operators.Similarity.all ++
      operators.Multimodal.all ++ operators.Sampling.all ++
      operators.AsofJoin.all ++ operators.Graph.all ++ operators.Layout.all ++
      operators.DataQuality.all ++ sources.Ingest.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Analytics.combine.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a named query over a testdata scale-factor dir,
  * optionally paired with ANSI SQL the driver runs in DuckDB as an oracle
  * (SURVEY.md §5). `oracle = None` → driver records a rows-only check.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}

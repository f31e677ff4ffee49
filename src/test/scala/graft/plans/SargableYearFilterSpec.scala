package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The injected optimizer rule must (a) make `year(col) cmp N` filters reach
  * the parquet scan as pushed range predicates and (b) never change results
  * — checked per comparison shape against the un-rewritten evaluation.
  */
class SargableYearFilterSpec extends SparkSpec {

  private def lineitem: DataFrame =
    graft.sources.Tables.load(spark, sf("sf0.001"), "lineitem")

  private val shapes: Seq[(String, org.apache.spark.sql.Column)] = Seq(
    "ge" -> (year(col("l_shipdate")) >= 1996),
    "gt" -> (year(col("l_shipdate")) > 1996),
    "le" -> (year(col("l_shipdate")) <= 1996),
    "lt" -> (year(col("l_shipdate")) < 1996),
    "eq" -> (year(col("l_shipdate")) === 1996),
    "rev_ge" -> (lit(1996) >= year(col("l_shipdate"))),
    "rev_eq" -> (lit(1996) === year(col("l_shipdate"))))

  test("year() comparisons become pushed range filters on the scan") {
    shapes.foreach { case (name, cond) =>
      val p = lineitem.filter(cond).queryExecution.executedPlan.toString
      assert(!p.contains("year("), s"$name: year() survived optimization\n$p")
      assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)")
        || p.contains("GreaterThanOrEqual(l_shipdate")
        || p.contains("LessThan(l_shipdate"), s"$name: nothing pushed\n$p")
    }
  }

  test("rewritten filters return exactly the un-rewritten rows") {
    // reference rows: evaluate year() AFTER collecting, outside the optimizer
    val years = lineitem.select(year(col("l_shipdate")).as("y")).collect()
      .map(_.getInt(0))
    def expected(f: Int => Boolean) = years.count(f).toLong
    val got = shapes.map { case (n, c) => n -> lineitem.filter(c).count() }.toMap
    assert(got("ge") === expected(_ >= 1996))
    assert(got("gt") === expected(_ > 1996))
    assert(got("le") === expected(_ <= 1996))
    assert(got("lt") === expected(_ < 1996))
    assert(got("eq") === expected(_ == 1996))
    assert(got("rev_ge") === expected(1996 >= _))
    assert(got("rev_eq") === expected(1996 == _))
    assert(got("ge") > 0 && got("lt") > 0, "degenerate test data split")
  }

  test("out-of-range year literals are left unrewritten and still run") {
    // LocalDate.of(2000000000, ...) would throw during optimization if the
    // rule rewrote these; they must keep the original (valid) predicate
    assert(lineitem.filter(year(col("l_shipdate")) < 2000000000).count() ===
      lineitem.count())
    assert(lineitem.filter(year(col("l_shipdate")) > -500).count() ===
      lineitem.count())
    assert(lineitem.filter(year(col("l_shipdate")) === Int.MaxValue).count() === 0)
  }

  test("extension-injected SQL functions resolve without manual registration") {
    import spark.implicits._
    val v = spark.sql("SELECT race_time_seconds('1:34.570') AS s").as[Double].head()
    assert(math.abs(v - 94.570) < 1e-9)
    assert(spark.sql("SELECT hyperplane_buckets(array(1L, 2L, 3L)) AS b")
      .count() === 1)
  }
}

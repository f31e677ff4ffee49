package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dynamic partition pruning over the day-partitioned events copy: the
  * fact scan must carry a RUNTIME `dynamicpruning` subquery in its
  * PartitionFilters (a static IN list would mean constraint propagation
  * precomputed the dim — not the optimization under test), and the pruned
  * scan's answer must equal a scalar replay of the unpartitioned
  * semantics.
  */
class DppJoinSpec extends SparkSpec {

  import spark.implicits._

  private val dir = sf("sf0.001")
  private val DayNanos = 86400L * 1000000000L

  test("dpp_join: the fact scan's partition filter is dynamic") {
    val plan = Ingest.dppJoin.run(spark, dir)
      .queryExecution.executedPlan.toString
    val partitionFilterLines = plan.linesIterator
      .filter(_.contains("PartitionFilters")).toSeq
    assert(partitionFilterLines.nonEmpty,
      s"no partitioned scan in the plan:\n$plan")
    assert(partitionFilterLines.exists(_.contains("dynamicpruning")),
      s"partition filters are static:\n${partitionFilterLines.mkString("\n")}")
  }

  test("dpp_join: the partition column reads back as STRING, not an inferred int") {
    val fact = spark.read
      .schema("event_type STRING, value DOUBLE, pd STRING")
      .parquet(Ingest.dppEventsCopy(spark, dir))
    assert(fact.schema("pd").dataType === org.apache.spark.sql.types.StringType)
  }

  test("dpp_join: pruned result equals the unpartitioned replay, and prunes") {
    val ev = Tables.load(spark, dir, "events")
      .select(expr(s"(ts - pmod(ts, ${DayNanos}L)) div ${DayNanos}L").as("day"),
        $"event_type", $"value")
      .as[(Long, String, Double)].collect().toSeq
    val purch = ev.filter(_._2 == "purchase")
    val byDay = purch.groupBy(_._1).map { case (d, rs) => d -> rs.size.toLong }
    val nd = byDay.size.toLong
    val tot = purch.size.toLong
    val sel = byDay.collect { case (d, np) if np * nd > tot => d }.toSet
    val expect = ev.filter(r => sel(r._1)).groupBy(_._1).toSeq
      .map { case (d, rs) =>
        (d, rs.size.toLong,
          rs.map(r => BigDecimal(r._3).setScale(2, BigDecimal.RoundingMode.HALF_UP))
            .sum.toDouble)
      }.sortBy(_._1)
    val got = Ingest.dppJoin.run(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === expect)
    // the above-mean threshold must actually drop days, or the "pruning"
    // plan gate above is gating a join that reads everything anyway
    assert(sel.size < byDay.size,
      s"dim selected all ${byDay.size} days — nothing to prune")
    graft.Scratch.release(spark)
  }
}

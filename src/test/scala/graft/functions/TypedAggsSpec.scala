package graft.functions

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The typed Aggregator must agree exactly with the DataFrame DECIMAL-sum
  * formulation at any partitioning (merge-order independence).
  */
class TypedAggsSpec extends SparkSpec {

  import spark.implicits._

  test("the REGISTERED stratifiedAgg query equals the window-based stratified sample") {
    // exercises the exact operator SparkEntry registers, not a spec-local
    // re-implementation that could drift from it
    val viaAgg = graft.operators.Sampling.stratifiedAgg.run(spark, sf("sf0.001"))
      .as[(String, Long)].collect().toSet
    val viaWindow = graft.operators.Sampling.stratified.run(spark, sf("sf0.001"))
      .as[(String, Long)].collect().toSet
    assert(viaAgg === viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("minKByDigest selection is independent of partitioning/merge order") {
    import org.apache.spark.sql.functions.md5
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    def select(parts: Int): Set[(String, Long)] = docs
      .select($"source", md5($"text").as("dig"), $"doc_id")
      .as[(String, String, Long)]
      .repartition(parts) // partial merges must not change the selection
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(TypedAggs.minKByDigest(5).toColumn.name("ids"))
      .flatMap { case (src, top) => top.ids.map(src -> _) }
      .collect().toSet
    assert(select(1) === select(7))
  }

  test("minKByDigest on one giant stratum picks the K lexicographic minima") {
    // the degenerate shape the aggregator exists for: ONE stratum holding
    // the whole input — the buffer must stay K-bounded through every
    // partial and still select exactly the K smallest (digest, id) pairs
    val n = 20000
    val md = java.security.MessageDigest.getInstance("MD5")
    def dig(i: Int): String =
      md.digest(s"doc#$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = (0 until n).map(i => ("all", dig(i), i.toLong))
    val got = rows.toDF("k", "dig", "id")
      .as[(String, String, Long)]
      .repartition(13)
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(TypedAggs.minKByDigest(5).toColumn.name("ids"))
      .collect()
    val expect = rows.map(r => (r._2, r._3)).sorted.take(5).map(_._2)
    assert(got.length === 1 && got.head._1 === "all")
    assert(got.head._2.ids === expect)
  }

  test("typed moneyStats equals the untyped exact-decimal aggregation") {
    val orders = Tables.load(spark, sf("sf0.001"), "orders")
    val typed = orders.select($"o_custkey", $"o_totalprice")
      .as[(Long, Double)]
      .repartition(7) // arbitrary partitioning must not change results
      .groupByKey(_._1)
      .agg(TypedAggs.moneyStats[(Long, Double)](_._2).toColumn.name("s"))
      .select($"key".as("cust"), $"s.n".as("n"), $"s.sum".as("sum"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val untyped = orders.groupBy($"o_custkey")
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast(DecimalType(18, 2))).cast("double").as("sum"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(typed.keySet === untyped.keySet)
    typed.foreach { case (k, (n, s)) =>
      assert(untyped(k)._1 === n, s"count for $k")
      assert(math.abs(untyped(k)._2 - s) < 1e-9, s"sum for $k")
    }
  }
}

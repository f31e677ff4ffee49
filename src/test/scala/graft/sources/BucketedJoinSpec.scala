package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** The plan half of the bucketed-join capability (the result half is
  * oracle-gated as `bucketed_join`): both sides pre-bucketed on the join
  * key means the join subtree must contain ZERO shuffle exchanges — the
  * write-time shuffle replaces every join-time shuffle.
  */
class BucketedJoinSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("bucketed tables join without any shuffle exchange under the join") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // plain physical tree (no AQE stage wrappers) for exact traversal,
      // and the at-scale regime (neither side broadcastable) — bucketing
      // exists for joins too big to broadcast
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Ingest.bucketedJoin.run(spark, dir)
      val plan = df.queryExecution.executedPlan
      val joins = plan.collect { case j: SortMergeJoinExec => j }
      assert(joins.size === 1, s"expected one SMJ, plan:\n$plan")
      val shufflesUnderJoin = joins.head.collect { case e: ShuffleExchangeExec => e }
      assert(shufflesUnderJoin.isEmpty,
        s"bucket-to-bucket join must not reshuffle, plan:\n$plan")
      // the scans really are bucketed reads
      assert(plan.toString.contains("SelectedBucketsCount"),
        s"expected bucketed scans, plan:\n$plan")
      // and the result still matches the raw-table join
      import spark.implicits._
      val got = df.as[(String, Long, Double)].collect().toSeq
      val raw = Tables.load(spark, dir, "orders")
        .join(Tables.load(spark, dir, "customer"),
          org.apache.spark.sql.functions.col("o_custkey") ===
            org.apache.spark.sql.functions.col("c_custkey"))
        .groupBy($"c_mktsegment")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_orders"),
          org.apache.spark.sql.functions.sum($"o_totalprice".cast("decimal(18,2)"))
            .cast("double").as("revenue"))
        .orderBy($"c_mktsegment")
        .as[(String, Long, Double)].collect().toSeq
      assert(got === raw)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }
}

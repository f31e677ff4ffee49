package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ObservabilitySpec extends SparkSpec {

  import spark.implicits._

  private val dir = sf("sf0.001")

  test("observe folds audit metrics into the action's own pass") {
    val base = graft.sources.Tables.load(spark, dir, "orders")
    val audited = Observability.audited(
      base, "orders_audit", "o_custkey", "o_totalprice")
    val ((rows, mn, mx), obs) = Observability.withMetrics(spark, "orders_audit") {
      val r = audited.agg(
        count(lit(1)), min($"o_totalprice"), max($"o_totalprice"))
        .as[(Long, Double, Double)].collect()(0)
      r
    }
    val m = obs.find(_.name == "orders_audit")
      .getOrElse(fail(s"orders_audit metrics never arrived: $obs")).metrics
    assert(m("n_rows") === rows)
    assert(m("n_null_keys") === 0L)
    assert(m("min_value") === mn && m("max_value") === mx)
  }

  test("observe adds no exchange and no extra scan to the plan") {
    val base = graft.sources.Tables.load(spark, dir, "orders")
      .select($"o_custkey", $"o_totalprice")
    val plain = base.queryExecution.executedPlan.toString
    val decorated = Observability.audited(
      base, "shape_audit", "o_custkey", "o_totalprice")
      .queryExecution.executedPlan.toString
    def scans(p: String) = p.linesIterator.count(_.contains("Scan parquet"))
    def exchanges(p: String) = p.linesIterator.count(_.contains("Exchange"))
    assert(scans(decorated) === scans(plain))
    assert(exchanges(decorated) === exchanges(plain))
  }

  test("the same audited transform surfaces metrics per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventsStream
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventsStream.Event]
    val audited = Observability.audited(
      input.toDF(), "stream_audit", "user_id", "value")
    val query = audited.writeStream.format("memory")
      .queryName("obs_stream_out").start()
    try {
      input.addData(
        EventsStream.Event(java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
          1L, "click", 2.0),
        EventsStream.Event(java.sql.Timestamp.valueOf("2024-01-01 10:01:00"),
          2L, "view", 8.0))
      query.processAllAvailable()
      val obs = query.recentProgress
        .flatMap(p => Option(p.observedMetrics.get("stream_audit")))
        .filter(_.getAs[Long]("n_rows") > 0)
      assert(obs.nonEmpty, "no micro-batch carried the observed metrics")
      assert(obs.map(_.getAs[Long]("n_rows")).sum === 2L)
      assert(obs.last.getAs[Double]("max_value") === 8.0)
    } finally query.stop()
  }

  test("a null-key batch surfaces through the audit metrics") {
    val bad = Seq((Some(1L), 5.0), (None, 7.0), (Some(3L), 9.0))
      .toDF("k", "v")
    val (_, obs) = Observability.withMetrics(spark, "bad_batch") {
      Observability.audited(bad, "bad_batch", "k", "v").count()
    }
    val m = obs.find(_.name == "bad_batch")
      .getOrElse(fail(s"bad_batch metrics never arrived: $obs")).metrics
    assert(m("n_rows") === 3L)
    assert(m("n_null_keys") === 1L)
  }
}

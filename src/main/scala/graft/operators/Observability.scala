package graft.operators

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

/** In-flight pipeline observability — `Dataset.observe` metrics.
  *
  * A 100 TB job cannot afford a second pass to learn what it just
  * processed, and a `.count()` after the fact recomputes the plan (or
  * forces a cache). `observe` attaches named aggregates to a plan node;
  * the executors fold them INTO the normal pass (an `AggregatingAccumulator`
  * riding the task results), and the driver surfaces them through
  * `QueryExecutionListener` when the action completes — row counts, null
  * counts, value ranges for free, the data-quality heartbeat a production
  * pipeline exports per batch. The same API is the Structured Streaming
  * per-micro-batch metrics surface (`StreamingQueryProgress.observedMetrics`),
  * so one instrumented transform serves both engines.
  *
  * The reference has no observability surface at all (its DAG prints row
  * counts driver-side by re-collecting — `Lucas files/finalversion:329`
  * area); this module is the engine-native replacement: zero extra scans,
  * zero extra shuffles, metrics defined next to the transform they audit.
  */
object Observability {

  /** One captured observation: query-local metric name → row. */
  final case class Observed(name: String, metrics: Map[String, Any])

  /** Attach the standard ingest-audit metrics to `df` under `name`:
    * row count, null-key count, and value min/max — the per-batch
    * heartbeat. Pure plan decoration: adds NO exchange, NO extra scan
    * (spec-asserted); the aggregates fold map-side into whatever action
    * the caller runs.
    */
  def audited(df: DataFrame, name: String, keyCol: String,
      valueCol: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_rows"),
      sum(when(col(keyCol).isNull, 1L).otherwise(0L)).as("n_null_keys"),
      min(col(valueCol)).as("min_value"),
      max(col(valueCol)).as("max_value"))

  /** Listener that collects every completed action's observed metrics.
    * Register once per session (`withMetrics`), drain from the returned
    * queue: `onSuccess` fires on the driver after each action, so tests
    * and batch drivers read a complete, ordered log. Thread-safe —
    * listener callbacks arrive on the listener bus thread.
    */
  final class MetricsLog extends QueryExecutionListener {
    val log = new ConcurrentLinkedQueue[Observed]()

    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row: Row) =>
        log.add(Observed(name,
          row.schema.fieldNames.zip(row.toSeq).toMap))
      }

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()
  }

  /** One micro-batch's state-store footprint for one stateful operator:
    * rows held, bytes used, and the provider-specific custom metrics
    * (RocksDB surfaces sst/memtable sizes here — the capacity signal an
    * off-heap store is chosen FOR).
    */
  final case class StateSnapshot(batchId: Long, operator: String,
      numRowsTotal: Long, numRowsUpdated: Long, memoryUsedBytes: Long,
      custom: Map[String, Long])

  /** Per-micro-batch STATE metrics — the streaming counterpart of
    * [[MetricsLog]]: every progress event's `stateOperators` block is
    * captured as [[StateSnapshot]]s, so a pipeline owner watches state
    * rows/bytes grow and shrink per batch (the watermark-eviction
    * heartbeat; for RocksDB also the off-heap footprint) without a
    * second pass — Spark already computed the numbers, this listener
    * just refuses to drop them. Register/drain/unregister via
    * [[withStateMetrics]].
    */
  final class StateMetricsLog
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    val log = new ConcurrentLinkedQueue[StateSnapshot]()

    override def onQueryStarted(event: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(event: QueryProgressEvent): Unit =
      event.progress.stateOperators.foreach { op =>
        log.add(StateSnapshot(event.progress.batchId, op.operatorName,
          op.numRowsTotal, op.numRowsUpdated, op.memoryUsedBytes,
          scala.jdk.CollectionConverters.MapHasAsScala(op.customMetrics)
            .asScala.map { case (k, v) => k -> v.longValue() }.toMap))
      }
  }

  /** Run `body` with a fresh [[StateMetricsLog]] attached, draining and
    * detaching on the way out. The listener bus is asynchronous —
    * streaming tests should `processAllAvailable()` inside `body`, and
    * the helper still polls briefly for the last progress event to land.
    */
  def withStateMetrics[A](spark: SparkSession)(
      body: => A): (A, Seq[StateSnapshot]) = {
    val l = new StateMetricsLog
    spark.streams.addListener(l)
    try {
      val a = body
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (l.log.isEmpty && System.nanoTime() < deadline) Thread.sleep(20)
      (a, scala.jdk.CollectionConverters.IteratorHasAsScala(
        l.log.iterator).asScala.toSeq)
    } finally spark.streams.removeListener(l)
  }

  /** Run `body` with a fresh [[MetricsLog]] registered, unregistering on
    * the way out (listener leaks accumulate across a 100+-query session).
    * Returns (body result, drained observations). The listener bus is
    * asynchronous, so the helper polls briefly — for the NAMED metric the
    * caller is waiting on, not a raw count: if `body` runs several
    * actions, an unrelated observation arriving first must not end the
    * wait while the wanted one is still on the bus.
    */
  def withMetrics[A](spark: SparkSession, expectName: String)(
      body: => A): (A, Seq[Observed]) = {
    val l = new MetricsLog
    spark.listenerManager.register(l)
    def seen: Boolean = {
      val it = l.log.iterator()
      var found = false
      while (!found && it.hasNext) found = it.next().name == expectName
      found
    }
    try {
      val a = body
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!seen && System.nanoTime() < deadline) Thread.sleep(20)
      (a, scala.jdk.CollectionConverters.IteratorHasAsScala(
        l.log.iterator).asScala.toSeq)
    } finally spark.listenerManager.unregister(l)
  }
}

package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.operators.Observability
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** RocksDB state-store option + per-micro-batch state metrics (r8 verdict
  * task #8): the same transforms produce identical results on the default
  * on-heap provider and on RocksDB, RocksDB is PROVABLY engaged (its
  * provider-specific custom metrics appear in the progress), and the
  * [[Observability.StateMetricsLog]] surfaces state rows/bytes per batch.
  */
class StateStoreSpec extends SparkSpec {

  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  private val fixture = Seq(
    EventsStream.Event(ts(0, 10), 1L, "click", 1.0),
    EventsStream.Event(ts(2, 0), 2L, "click", 2.0),
    EventsStream.Event(ts(6, 0), 1L, "view", 5.0),
    EventsStream.Event(ts(20, 0), 3L, "click", 1.0))

  /** Run windowedCounts over the fixture in two micro-batches, return
    * (closed windows, every per-batch state snapshot).
    */
  private def runWindowed(queryName: String)
      : (Set[(Timestamp, String, Long)], Seq[Observability.StateSnapshot]) = {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventsStream.Event]
    val ((_, rows), snaps) = Observability.withStateMetrics(spark) {
      val query = EventsStream.windowedCounts(input.toDF())
        .writeStream.format("memory").queryName(queryName)
        .outputMode(OutputMode.Append).start()
      try {
        input.addData(fixture(0), fixture(1), fixture(2))
        query.processAllAvailable()
        input.addData(fixture(3)) // advances watermark, closes windows
        query.processAllAvailable()
        (query, spark.table(queryName)
          .select($"bucket_start", $"event_type", $"n")
          .as[(Timestamp, String, Long)].collect().toSet)
      } finally query.stop()
    }
    (rows, snaps)
  }

  test("windowedCounts is provider-agnostic: RocksDB results equal on-heap results") {
    val (onHeap, heapSnaps) = runWindowed("state_heap_out")
    val (rocks, rockSnaps) = StateStores.withRocksDB(spark) {
      runWindowed("state_rocks_out")
    }
    assert(rocks === onHeap, "provider choice must not change results")
    assert(onHeap.contains((ts(0), "click", 2L)))
    // RocksDB was genuinely engaged: its provider-specific metrics are in
    // the progress (the on-heap provider has no rocksdb* keys)
    assert(rockSnaps.exists(_.custom.keys.exists(_.startsWith("rocksdb"))),
      s"expected rocksdb custom metrics, got: ${rockSnaps.map(_.custom.keys)}")
    assert(!heapSnaps.exists(_.custom.keys.exists(_.startsWith("rocksdb"))))
  }

  test("StateMetricsLog surfaces state rows/bytes per micro-batch") {
    val (_, snaps) = runWindowed("state_metrics_out")
    assert(snaps.nonEmpty, "every stateful micro-batch must snapshot")
    // the fixture's three distinct (window, type) groups all pass through
    // state: the peak held-row count is exactly 3
    assert(snaps.map(_.numRowsTotal).max === 3L,
      s"peak state rows should be the 3 open groups: $snaps")
    assert(snaps.forall(_.memoryUsedBytes > 0L),
      "state bytes must be reported, not zero")
    // the flush batch EVICTS the closed windows: the final snapshot holds
    // strictly fewer rows than the peak
    val byBatch = snaps.groupBy(_.batchId)
    val last = byBatch(byBatch.keys.max)
    assert(last.forall(_.numRowsTotal < 3L),
      s"watermark eviction must shrink state: $snaps")
  }
}

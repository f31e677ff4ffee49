package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming CEP: greedy consume-once view→click→purchase matching with
  * watermark-sealed event-time ordering (the stateful twin of the batch
  * `events_cep` anchor counter).
  */
class CepStreamSpec extends SparkSpec {

  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  private def us(t: Timestamp): Long =
    (t.getTime / 1000L) * 1000000L + (t.getNanos / 1000L)

  private val Band = 30L * 60L * 1000000L // 30 min in micros

  private def start(input: MemoryStream[EventsStream.Event], name: String) =
    EventsStream.cepStream(input.toDS(), Band)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()

  private def matches(name: String): Set[(Long, Long, Long, Long)] =
    spark.table(name)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("emits a match only after the watermark seals it; consume-once holds") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventsStream.Event]
    val query = start(input, "cep_out")
    try {
      input.addData(
        EventsStream.Event(ts(0), 1L, "view", 1.0),
        EventsStream.Event(ts(5), 1L, "click", 1.0),
        EventsStream.Event(ts(10), 1L, "purchase", 9.0),
        // a SECOND purchase in band of the same click: the first match
        // consumed the pattern, so this one must not match
        EventsStream.Event(ts(12), 1L, "purchase", 9.0))
      query.processAllAvailable()
      // nothing sealed yet: the watermark still trails the events
      assert(matches("cep_out").isEmpty,
        "matches must wait for the watermark, not fire on arrival")
      // heartbeat far in the future advances the watermark past everything
      input.addData(EventsStream.Event(ts(59), 99L, "view", 0.0))
      query.processAllAvailable()
      assert(matches("cep_out") ===
        Set((1L, us(ts(0)), us(ts(5)), us(ts(10)))))
    } finally query.stop()
  }

  test("out-of-order arrivals take their event-time place before matching") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventsStream.Event]
    val query = start(input, "cep_ooo")
    try {
      // click and purchase arrive FIRST; the view arrives a batch later
      // but with the EARLIEST event time — the sealed-sort must restore
      // view → click → purchase before the matcher runs
      input.addData(
        EventsStream.Event(ts(5), 2L, "click", 1.0),
        EventsStream.Event(ts(8), 2L, "purchase", 5.0))
      query.processAllAvailable()
      input.addData(EventsStream.Event(ts(1), 2L, "view", 1.0))
      query.processAllAvailable()
      input.addData(EventsStream.Event(ts(59), 99L, "view", 0.0))
      query.processAllAvailable()
      assert(matches("cep_ooo") ===
        Set((2L, us(ts(1)), us(ts(5)), us(ts(8)))))
    } finally query.stop()
  }

  test("band expiry restarts the pattern; a later view re-anchors") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventsStream.Event]
    val query = start(input, "cep_band")
    try {
      input.addData(
        // view at 10:00, click 35 min later: out of band → anchor dies
        EventsStream.Event(ts(0), 3L, "view", 1.0),
        EventsStream.Event(ts(35), 3L, "click", 1.0),
        // fresh view + in-band click + in-band purchase → one match
        EventsStream.Event(ts(40), 3L, "view", 1.0),
        EventsStream.Event(ts(45), 3L, "click", 1.0),
        EventsStream.Event(ts(50), 3L, "purchase", 7.0))
      query.processAllAvailable()
      // heartbeat at 11:30 → watermark 11:20, sealing everything above
      input.addData(EventsStream.Event(
        Timestamp.valueOf("2024-01-01 11:30:00"), 99L, "view", 0.0))
      query.processAllAvailable()
      assert(matches("cep_band") ===
        Set((3L, us(ts(40)), us(ts(45)), us(ts(50)))))
    } finally query.stop()
  }

  test("cepStream on RocksDB state matches the on-heap provider") {
    // the matcher's buffered-events + scalar-anchor state must behave
    // identically on the off-heap provider a 100 TB/day deployment runs
    def run(name: String): Set[(Long, Long, Long, Long)] = {
      implicit val sq = spark.sqlContext
      val input = MemoryStream[EventsStream.Event]
      val query = start(input, name)
      try {
        input.addData(
          EventsStream.Event(ts(5), 7L, "click", 1.0),
          EventsStream.Event(ts(8), 7L, "purchase", 5.0))
        query.processAllAvailable()
        input.addData(EventsStream.Event(ts(1), 7L, "view", 1.0))
        query.processAllAvailable()
        input.addData(EventsStream.Event(ts(59), 99L, "view", 0.0))
        query.processAllAvailable()
        matches(name)
      } finally query.stop()
    }
    val onHeap = run("cep_heap")
    val rocks = StateStores.withRocksDB(spark) { run("cep_rocks") }
    assert(rocks === onHeap)
    assert(onHeap === Set((7L, us(ts(1)), us(ts(5)), us(ts(8)))))
  }
  test("dormant anchors evict once the watermark passes their band") {
    // user 11 leaves only an abandoned view; once the watermark passes
    // view + band, its scalar state must be REMOVED, not pinned forever
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventsStream.Event]
    val (_, snaps) = graft.operators.Observability.withStateMetrics(spark) {
      val query = start(input, "cep_evict")
      try {
        input.addData(EventsStream.Event(ts(0), 11L, "view", 1.0))
        query.processAllAvailable()
        // two heartbeats march the watermark far past view + 30min band
        input.addData(EventsStream.Event(
          Timestamp.valueOf("2024-01-01 12:00:00"), 99L, "view", 0.0))
        query.processAllAvailable()
        input.addData(EventsStream.Event(
          Timestamp.valueOf("2024-01-01 14:00:00"), 99L, "view", 0.0))
        query.processAllAvailable()
      } finally query.stop()
    }
    assert(matches("cep_evict").isEmpty)
    assert(snaps.nonEmpty)
    // user 11's abandoned anchor is gone; at most the last heartbeat's
    // own (younger-than-band) state may remain
    val last = snaps.groupBy(_.batchId).maxBy(_._1)._2
    assert(last.forall(_.numRowsTotal <= 1L),
      s"dormant CEP state must evict: $snaps")
  }
}

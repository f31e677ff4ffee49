package graft.streaming

import graft.SparkSpec
import org.apache.spark.api.java.Optional
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, TestGroupState}

/** The streaming near-dup candidate generator must agree with the batch
  * MinHash pipeline over the same documents (same md5-chunk hash family),
  * and must emit a pair as soon as its second member ARRIVES — across
  * micro-batches, not only within one.
  */
class NearDupStreamSpec extends SparkSpec {

  import spark.implicits._

  private val base = Seq(
    0L -> "the quick brown fox jumps over the lazy dog and runs far away today",
    1L -> "completely different words about spark catalyst optimizer rules and plans",
    2L -> "a third document mentioning weather stations and formula one races only",
    3L -> "the quick brown fox jumps over the lazy dog and runs far away today",
    4L -> "the quick brown fox jumps over the lazy dog and runs far away tonight")

  test("stream candidates equal the batch MinHash candidates over the same docs") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    // NoTimeout: a pending processing-time timeout keeps the no-data
    // micro-batch loop spinning, deadlocking processAllAvailable; the
    // TTL path is unit-tested below with TestGroupState instead
    val query = NearDupStream.candidates(
      input.toDF().toDF("doc_id", "text"), GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append).start()
    try {
      // the near-dups of doc 0 arrive in LATER batches: the pair must be
      // produced by bucket state, not by same-batch co-grouping
      input.addData(base(0), base(1))
      query.processAllAvailable()
      input.addData(base(2), base(3))
      query.processAllAvailable()
      input.addData(base(4))
      query.processAllAvailable()
      val got = spark.table("neardup_out")
        .select($"id1", $"id2").distinct()
        .as[(Long, Long)].collect().toSet
      val expect = graft.operators.Dedup
        .minhashCandidates(base.toDF("doc_id", "text"))
        .as[(Long, Long)].collect().toSet
      assert(got === expect, s"stream=$got batch=$expect")
      // sanity on content: the exact copy and the one-word edit of doc 0
      assert(got.contains((0L, 3L)) && got.contains((0L, 4L)))
      assert(!got.exists { case (a, b) => a == 1L || b == 1L || a == 2L || b == 2L })
    } finally query.stop()
  }

  test("the near-dup registry runs unmodified on RocksDB with identical candidates") {
    // the per-bucket registry is THE state that outgrows a heap at
    // 100 TB/day — prove the off-heap provider is a pure conf flip:
    // same transform, same cross-batch candidate pairs, RocksDB
    // provably engaged via its provider metrics
    implicit val sq = spark.sqlContext
    val (got, snaps) = StateStores.withRocksDB(spark) {
      graft.operators.Observability.withStateMetrics(spark) {
        val input = MemoryStream[(Long, String)]
        val query = NearDupStream.candidates(
          input.toDF().toDF("doc_id", "text"), GroupStateTimeout.NoTimeout)
          .writeStream.format("memory").queryName("neardup_rocks_out")
          .outputMode(OutputMode.Append).start()
        try {
          input.addData(base(0), base(1))
          query.processAllAvailable()
          input.addData(base(2), base(3))
          query.processAllAvailable()
          input.addData(base(4))
          query.processAllAvailable()
          spark.table("neardup_rocks_out")
            .select($"id1", $"id2").distinct()
            .as[(Long, Long)].collect().toSet
        } finally query.stop()
      }
    }
    val expect = graft.operators.Dedup
      .minhashCandidates(base.toDF("doc_id", "text"))
      .as[(Long, Long)].collect().toSet
    assert(got === expect, s"rocksdb stream=$got batch=$expect")
    assert(snaps.exists(_.custom.keys.exists(_.startsWith("rocksdb"))),
      s"RocksDB must be the engaged provider: ${snaps.map(_.custom.keys)}")
    // the registry's state footprint is visible per batch
    assert(snaps.exists(_.numRowsTotal > 0L))
  }

  test("idle bucket state is evicted on processing-time timeout") {
    val state = TestGroupState.create[NearDupStream.BucketState](
      Optional.of(NearDupStream.BucketState(List(7L, 3L))),
      GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = Optional.empty(), hasTimedOut = true)
    val out = NearDupStream.bucketStep(usesTimeout = true, "30 minutes")(
      (0, "bk"), Iterator.empty, state)
    assert(out.isEmpty, "a timed-out bucket must not emit candidates")
    assert(state.isRemoved, "timeout must evict the bucket state")
  }

  test("the live path re-arms the TTL so every bucket eventually expires") {
    val state = TestGroupState.create[NearDupStream.BucketState](
      Optional.of(NearDupStream.BucketState(List(3L))),
      GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = Optional.empty(), hasTimedOut = false)
    val out = NearDupStream.bucketStep(usesTimeout = true, "30 minutes")(
      (2, "bk"), Iterator(NearDupStream.BandedDoc(2, "bk", 9L)), state).toSeq
    // the new arrival still pairs with the surviving member...
    assert(out === Seq(NearDupStream.NearDupCandidate(3L, 9L, 2)))
    assert(state.isUpdated && state.get.ids.toSet === Set(3L, 9L))
    // ...and the bucket re-armed its eviction clock relative to batch time
    assert(state.getTimeoutTimestampMs.isPresent &&
      state.getTimeoutTimestampMs.get() === 1000L + 30L * 60L * 1000L)
  }

  test("hhStream candidates cover every batch heavy hitter; exact pass restores equality") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val docRows = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    val query = NearDupStream.hhStream(
        input.toDF().toDF("doc_id", "text"), shards = 8, k = 64)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode(OutputMode.Update).start()
    val candidates = try {
      val chunks = docRows.grouped((docRows.size + 2) / 3).toSeq
      chunks.foreach { c => input.addData(c: _*); query.processAllAvailable() }
      // latest seq-stamped snapshot per shard = final sketch state
      spark.table("hh_out").as[NearDupStream.MgShard].collect()
        .groupBy(_.shard).values.map(_.maxBy(_.seq)).flatMap(_.ws).toSet
    } finally query.stop()
    assert(candidates.nonEmpty && candidates.size <= 8 * 64,
      "state must stay shards x k bounded")
    // batch truth: the exact heavy hitters over the same corpus
    val exact = graft.operators.TextAnalysis.heavyHitters.run(spark, dir)
      .select($"w", $"c").as[(String, Long)].collect().toMap
    assert(exact.nonEmpty, "fixture corpus must have heavy hitters")
    assert(exact.keySet.subsetOf(candidates),
      s"MG superset guarantee broken: ${exact.keySet -- candidates}")
    // exact pass 2 over the streamed candidates == the batch output
    val toks = graft.sources.Tables.load(spark, dir, "documents")
      .select(explode(split($"text", " ")).as("w"))
    val n = toks.count()
    val restored = toks.filter($"w".isInCollection(candidates))
      .groupBy($"w").agg(count(lit(1)).as("c"))
      .filter($"c" * 35 > n)
      .as[(String, Long)].collect().toMap
    assert(restored === exact, "exact pass over candidates must equal batch")
  }
}

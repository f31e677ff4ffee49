package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

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
    val query = NearDupStream.candidates(
      input.toDF().toDF("doc_id", "text"))
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
}

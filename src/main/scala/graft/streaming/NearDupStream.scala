package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online near-duplicate candidate detection over a DOCUMENT stream — the
  * streaming twin of the batch MinHash pipeline
  * ([[graft.operators.Dedup.minhashCandidates]]): as documents arrive,
  * each is banded map-side (no shuffle, no cross-row dependency) with the
  * IDENTICAL md5-chunk hash family the batch side uses, then a stateful
  * per-bucket registry emits a candidate pair the moment a new document
  * lands in a band bucket that already holds others. A training-data
  * ingest pipeline runs exactly this shape to reject near-dups at intake
  * instead of re-clustering the whole corpus per batch.
  *
  * Semantics vs batch: for any prefix of the stream whose buckets stay
  * under the cap, the DISTINCT (id1, id2) set equals the batch candidate
  * set over the same documents (asserted in NearDupStreamSpec). Pairs are
  * emitted at-least-once (a pair co-banded in two buckets emits twice,
  * where batch dedups globally — downstream exact rescoring dedups
  * naturally). The hot-bucket guard differs by necessity: batch drops
  * oversized buckets retroactively; a stream cannot retract, so emission
  * stops once a bucket reaches the cap (prefix semantics).
  *
  * Scale notes: banding is pure per-row expression work; the only shuffle
  * is the groupByKey on (band, bkey) — slim rows, same key the batch
  * band-join shuffles on. State per bucket is a capped id list; a
  * production deployment adds a timeout/TTL if bucket keys are unbounded
  * over time.
  */
object NearDupStream {

  // public: Catalyst's generated (de)serializers instantiate these
  case class BandedDoc(band: Int, bkey: String, doc_id: Long)
  case class NearDupCandidate(id1: Long, id2: Long, band: Int)
  case class BucketState(ids: List[Long])

  /** Same guard value as the batch side's hot-bucket cap. */
  private final val MaxBucket = 1000

  /** Map-side banding: word-3-gram shingles → 4 seeded md5 digest arrays
    * → per-band key = concat of the digest's four 8-hex-char chunk
    * minima. Band b consumes digest seed b, so this is chunk-for-chunk
    * the batch [[graft.operators.Dedup.minhashSignatures]] family (min
    * over the shingle multiset == min over the distinct set, so the batch
    * `.distinct()` needs no per-row counterpart). Pure scalar expressions
    * — streaming-safe, zero shuffle.
    */
  def banded(docs: DataFrame): DataFrame = {
    val withDigests = (0 until 4).foldLeft(
      docs
        .withColumn("toks", split(col("text"), " "))
        .withColumn("sh", when(size(col("toks")) >= 3,
          expr("transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
          .otherwise(array(concat_ws(" ", col("toks")))))) { (df, k) =>
      df.withColumn(s"d$k", expr(s"transform(sh, s -> md5(concat('mh$k#', s)))"))
    }
    val bandKeys = (0 until 4).map { b =>
      concat((0 until 4).map { j =>
        array_min(expr(s"transform(d$b, x -> substring(x, ${j * 8 + 1}, 8))"))
      }: _*)
    }
    withDigests
      .select(col("doc_id"), posexplode(array(bandKeys: _*)).as(Seq("band", "bkey")))
  }

  /** Stateful per-bucket candidate emission. */
  def candidates(docs: DataFrame): Dataset[NearDupCandidate] = {
    import docs.sparkSession.implicits._
    banded(docs).as[BandedDoc]
      .groupByKey(b => (b.band, b.bkey))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, String), rows: Iterator[BandedDoc],
            state: GroupState[BucketState]) =>
          val seen = state.getOption.map(_.ids).getOrElse(Nil)
          // List is the encoder-friendly stored form; membership and size
          // go through a Set + counter so a near-cap bucket costs O(ids)
          // per micro-batch, not O(ids²) of list scans
          val seenSet = scala.collection.mutable.Set.from(seen)
          val fresh = rows.map(_.doc_id).toSeq.distinct.filterNot(seenSet)
          val out = Seq.newBuilder[NearDupCandidate]
          var acc = seen
          var accSize = seen.size
          fresh.foreach { id =>
            if (accSize < MaxBucket)
              acc.foreach { o =>
                out += NearDupCandidate(math.min(id, o), math.max(id, o), key._1)
              }
            acc = id :: acc
            accSize += 1
            seenSet += id
          }
          state.update(BucketState(acc.take(MaxBucket)))
          out.result().iterator
      }
  }
}

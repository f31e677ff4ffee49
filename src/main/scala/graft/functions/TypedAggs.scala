package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` surface (SURVEY.md §2.10: the reference's user-level
  * aggregation state as the type-safe API). The buffer carries an exact
  * scaled-integer sum (cents) so merge order — which Spark does not
  * guarantee across partials — cannot change the result, the same
  * determinism contract as the DataFrame queries' DECIMAL sums.
  */
object TypedAggs {

  /** (count, exact sum, mean) over a 2-decimal money field. */
  case class MoneyStats(n: Long, sum: Double, mean: Double)

  // public: Catalyst's generated (de)serializer accesses it reflectively
  case class Buf(n: Long, cents: Long)

  /** Exact money statistics: fold doubles as scaled longs, divide once at
    * the end. Usable as `ds.groupByKey(...).agg(TypedAggs.moneyStats(_.x))`.
    */
  def moneyStats[IN](f: IN => Double): Aggregator[IN, _, MoneyStats] =
    new Aggregator[IN, Buf, MoneyStats] {
      override def zero: Buf = Buf(0L, 0L)
      override def reduce(b: Buf, a: IN): Buf =
        Buf(b.n + 1, b.cents + math.round(f(a) * 100))
      override def merge(x: Buf, y: Buf): Buf = Buf(x.n + y.n, x.cents + y.cents)
      override def finish(b: Buf): MoneyStats = {
        val sum = b.cents.toDouble / 100
        MoneyStats(b.n, sum, if (b.n == 0) 0.0 else sum / b.n)
      }
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[MoneyStats] = Encoders.product[MoneyStats]
    }

  // public: Catalyst's generated (de)serializers access these reflectively
  case class KPair(digest: String, id: Long)
  case class KBuf(pairs: Seq[KPair])
  case class TopIds(ids: Seq[Long])

  /** Partial top-K by (digest, id): the buffer never holds more than K
    * pairs, so map-side combine ships K rows per group per partition — the
    * scalable form of a per-stratum quota (vs. a window sort that funnels
    * each stratum's full row set through one task; see
    * graft.operators.Sampling.stratified). Selection order matches the
    * window formulation exactly: ascending (digest, id).
    *
    * The buffer keeps its pairs SORTED ascending as an invariant, so the
    * per-row path is O(1) for the overwhelmingly common case (a full
    * buffer rejecting a row ≥ its max) and one bounded insertion
    * otherwise — not a full re-sort per row — and `merge` is a K-bounded
    * merge of two sorted runs. Product encoders (not Kryo): the buffer
    * crosses the exchange as plain Tungsten rows.
    */
  def minKByDigest(k: Int): Aggregator[(String, Long), KBuf, TopIds] =
    new Aggregator[(String, Long), KBuf, TopIds] {
      private def lt(d: String, id: Long, p: KPair): Boolean = {
        val c = d.compareTo(p.digest)
        c < 0 || (c == 0 && id < p.id)
      }
      override def zero: KBuf = KBuf(Vector.empty)
      override def reduce(b: KBuf, a: (String, Long)): KBuf = {
        val (d, id) = a
        val ps = b.pairs
        if (ps.size >= k && !lt(d, id, ps.last)) b
        else {
          val idx = ps.indexWhere(p => lt(d, id, p))
          val ins =
            if (idx < 0) ps :+ KPair(d, id)
            else (ps.take(idx) :+ KPair(d, id)) ++ ps.drop(idx)
          KBuf(ins.take(k))
        }
      }
      override def merge(x: KBuf, y: KBuf): KBuf = {
        val xs = x.pairs; val ys = y.pairs
        val out = Vector.newBuilder[KPair]
        var n = 0; var i = 0; var j = 0
        while (n < k && (i < xs.size || j < ys.size)) {
          val takeX = j >= ys.size ||
            (i < xs.size && lt(xs(i).digest, xs(i).id, ys(j)))
          if (takeX) { out += xs(i); i += 1 } else { out += ys(j); j += 1 }
          n += 1
        }
        KBuf(out.result())
      }
      override def finish(b: KBuf): TopIds = TopIds(b.pairs.map(_.id))
      override def bufferEncoder: Encoder[KBuf] = Encoders.product[KBuf]
      override def outputEncoder: Encoder[TopIds] = Encoders.product[TopIds]
    }

  // public: Catalyst's generated (de)serializers access these reflectively
  case class MGBuf(ws: Seq[String], cs: Seq[Long])
  case class MGOut(ws: Seq[String])

  /** Misra–Gries heavy-hitter CANDIDATE sketch: at most `k` counters per
    * buffer, so map-side partial aggregation ships O(k) state per partition
    * regardless of stream length — the scalable first pass of the exact
    * two-pass heavy-hitter query (graft.operators.TextAnalysis
    * .heavyHitters).
    *
    * Guarantee (the only property the consumer relies on): any item with
    * true frequency > n/(k+1) survives in the final buffer — each
    * decrement retires k+1 distinct occurrences, so an item can be evicted
    * at most n/(k+1) times. The merge subtracts the (k+1)-largest count
    * when the union overflows, which preserves the same undercount bound
    * (Agarwal et al., "Mergeable Summaries", PODS'12). The candidate SET
    * depends on partition order and is NOT deterministic — determinism is
    * restored by the exact verification pass that follows; nothing
    * order-dependent ever reaches query output.
    */
  def misraGries(k: Int): Aggregator[String, MGBuf, MGOut] =
    new Aggregator[String, MGBuf, MGOut] {
      override def zero: MGBuf = MGBuf(Vector.empty, Vector.empty)
      override def reduce(b: MGBuf, w: String): MGBuf = {
        val i = b.ws.indexOf(w)
        if (i >= 0) MGBuf(b.ws, b.cs.updated(i, b.cs(i) + 1))
        else if (b.ws.size < k) MGBuf(b.ws :+ w, b.cs :+ 1L)
        else {
          // full and absent: decrement every counter, drop exhausted ones
          val kept = b.ws.lazyZip(b.cs).collect {
            case (kw, c) if c > 1 => (kw, c - 1)
          }.toVector
          MGBuf(kept.map(_._1), kept.map(_._2))
        }
      }
      override def merge(x: MGBuf, y: MGBuf): MGBuf = {
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        x.ws.lazyZip(x.cs).foreach { case (w, c) => m(w) = m.getOrElse(w, 0L) + c }
        y.ws.lazyZip(y.cs).foreach { case (w, c) => m(w) = m.getOrElse(w, 0L) + c }
        if (m.size <= k) MGBuf(m.keys.toVector, m.values.toVector)
        else {
          val cut = m.values.toVector.sorted(Ordering[Long].reverse)(k)
          val kept = m.iterator.collect {
            case (w, c) if c > cut => (w, c - cut)
          }.toVector
          MGBuf(kept.map(_._1), kept.map(_._2))
        }
      }
      override def finish(b: MGBuf): MGOut = MGOut(b.ws)
      override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
      override def outputEncoder: Encoder[MGOut] = Encoders.product[MGOut]
    }

  /** Live bloom-filter buffer: the filter object stays a JVM object for
    * the whole partition fold (typed-aggregation buffers serialize only at
    * partial-output boundaries, not per row), so insertion is one hash per
    * row with zero copying. Java serialization, not a product encoder —
    * `BloomFilter` is Serializable and its bitset crosses the exchange
    * once per partition.
    */
  class BloomBuf(var n: Long,
      val bf: org.apache.spark.util.sketch.BloomFilter) extends Serializable

  // public: Catalyst's generated deserializer instantiates it reflectively
  case class BloomBuilt(n: Long, bytes: Array[Byte])

  /** Count + bloom-insert over strings in ONE pass (the two-scan
    * count-then-build shape needs the count only to SIZE the filter; a
    * fixed `capacity` prior removes that dependency). An input that
    * overflows `capacity` degrades the filter's fpp, never its one-sided
    * guarantee — callers that confirm-join afterwards stay exact either
    * way, and `n` in the result lets them detect overflow and re-size if
    * the degraded selectivity ever matters.
    */
  def bloomBuild(capacity: Long, fpp: Double)
      : Aggregator[String, BloomBuf, BloomBuilt] =
    new Aggregator[String, BloomBuf, BloomBuilt] {
      override def zero: BloomBuf = new BloomBuf(0L,
        org.apache.spark.util.sketch.BloomFilter.create(capacity, fpp))
      override def reduce(b: BloomBuf, s: String): BloomBuf = {
        b.bf.putString(s); b.n += 1; b
      }
      override def merge(x: BloomBuf, y: BloomBuf): BloomBuf = {
        x.bf.mergeInPlace(y.bf); x.n += y.n; x
      }
      override def finish(b: BloomBuf): BloomBuilt = {
        val bos = new java.io.ByteArrayOutputStream()
        b.bf.writeTo(bos)
        BloomBuilt(b.n, bos.toByteArray)
      }
      override def bufferEncoder: Encoder[BloomBuf] =
        Encoders.javaSerialization[BloomBuf]
      override def outputEncoder: Encoder[BloomBuilt] =
        Encoders.product[BloomBuilt]
    }

  // public: Catalyst's generated (de)serializer accesses it reflectively.
  // Empty array = the zero buffer (allocated lazily on first reduce so the
  // per-partition zero costs nothing when a partition is empty).
  case class GramBuf(g: Array[Long])

  /** Exact Gram-matrix accumulation (Xᵀ·X over quantized integer vectors):
    * the buffer is the dims·(dims+1)/2 upper triangle as one long array,
    * updated in place per row and merged element-wise — so a GLOBAL
    * aggregate ships exactly one ~2 KB partial per partition to the final
    * combine, never a corpus row. This is the one-pass reduction behind
    * covariance/PCA/linear-model normal equations at any corpus size.
    *
    * Exactness: int64 sums of per-row products — order-independent under
    * any partitioning, replayable in SQL. With |x| ≤ 2·10⁴ a cell
    * overflows int64 only past ~2·10¹⁰ rows; beyond that, shard the
    * aggregate and merge shard matrices in wider arithmetic.
    */
  case class GramOut(g: Seq[Long])

  def gramUpper(dims: Int): Aggregator[Seq[Long], GramBuf, GramOut] =
    new Aggregator[Seq[Long], GramBuf, GramOut] {
      private val cells = dims * (dims + 1) / 2
      override def zero: GramBuf = GramBuf(Array.emptyLongArray)
      override def reduce(b: GramBuf, qv: Seq[Long]): GramBuf = {
        val arr = if (b.g.length == cells) b.g else new Array[Long](cells)
        val x = qv.toArray
        var idx = 0
        var i = 0
        while (i < dims) {
          val xi = x(i)
          var j = i
          while (j < dims) {
            arr(idx) += xi * x(j)
            idx += 1
            j += 1
          }
          i += 1
        }
        GramBuf(arr)
      }
      override def merge(a: GramBuf, b: GramBuf): GramBuf =
        if (a.g.length == 0) b
        else if (b.g.length == 0) a
        else {
          var idx = 0
          while (idx < cells) { a.g(idx) += b.g(idx); idx += 1 }
          a
        }
      override def finish(b: GramBuf): GramOut =
        GramOut(if (b.g.length == cells) b.g.toSeq else Seq.fill(cells)(0L))
      override def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
      override def outputEncoder: Encoder[GramOut] = Encoders.product[GramOut]
    }
}

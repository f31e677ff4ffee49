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

  /** Partial top-K by (digest, id): the buffer never holds more than K
    * pairs, so map-side combine ships K rows per group per partition — the
    * scalable form of a per-stratum quota (vs. a window sort that funnels
    * each stratum's full row set through one task; see
    * graft.operators.Sampling.stratified). Selection order matches the
    * window formulation exactly: ascending (digest, id).
    */
  def minKByDigest(k: Int): Aggregator[(String, Long), Seq[(String, Long)], Seq[Long]] =
    new Aggregator[(String, Long), Seq[(String, Long)], Seq[Long]] {
      override def zero: Seq[(String, Long)] = Nil
      private def trim(b: Seq[(String, Long)]): Seq[(String, Long)] =
        b.sorted.take(k)
      override def reduce(b: Seq[(String, Long)], a: (String, Long)): Seq[(String, Long)] =
        trim(b :+ a)
      override def merge(x: Seq[(String, Long)], y: Seq[(String, Long)]): Seq[(String, Long)] =
        trim(x ++ y)
      override def finish(b: Seq[(String, Long)]): Seq[Long] = b.sorted.map(_._2)
      override def bufferEncoder: Encoder[Seq[(String, Long)]] =
        Encoders.kryo[Seq[(String, Long)]]
      override def outputEncoder: Encoder[Seq[Long]] = Encoders.kryo[Seq[Long]]
    }
}

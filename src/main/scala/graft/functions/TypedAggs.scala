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
}

package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, LongType}

/** Measured-occupancy input to the LSH geometry auto-sizing (r9 verdict
  * task #6 — the `derivedWatermarkDelay` philosophy applied to bucket
  * geometry: measure the corpus, derive the knob, keep the env override).
  *
  * [[LshPlanes]] sizes bits from the corpus ROW COUNT alone, which
  * implicitly assumes near-uniform bucket occupancy. Real corpora skew:
  * duplicated / clustered embeddings pile into few buckets, and the
  * within-bucket pair cost Σ C(s,2) — the term `dedup_bucket_stats`
  * PRICES per band — grows with E[s²], not with the average. This module
  * measures that concentration with a FIXED 8-bit instrument geometry
  * (its own md5 tensor, salt `probe#b#i`), deliberately independent of
  * [[LshPlanes]]: measuring with the production planes would initialize —
  * and therefore freeze — the very geometry the measurement exists to
  * size. The derivation consuming the measurement lives in
  * [[LshPlanes.derivedGeometry]].
  */
object ProbePlanes {
  val Bits = 8 // 256 instrument buckets — enough resolution, tiny aggregate
  val Dims = 64

  /** ±1 tensor flattened [b][i] — the [[LshPlanes.signs]] md5 derivation
    * in its own seed namespace, so instrument and production geometries
    * stay independent at any setting. */
  val signs: Array[Long] =
    Array.tabulate(Bits * Dims) { idx =>
      val b = idx / Dims
      val i = idx % Dims
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(s"probe#$b#$i".getBytes("UTF-8"))
      if (((digest(0) >> 4) & 1) == 1) 1L else -1L
    }

  def bucket(qv: Array[Long]): Long = {
    val d = math.min(qv.length, Dims)
    var out = 0L
    var b = 0
    while (b < Bits) {
      val base = b * Dims
      var proj = 0L
      var i = 0
      while (i < d) {
        proj += qv(i) * signs(base + i)
        i += 1
      }
      out = (out << 1) | (if (proj > 0) 1L else 0L)
      b += 1
    }
    out
  }

  /** JVM entry shared by interpreted eval and generated code. */
  def bucketOf(qv: ArrayData): Long = bucket(qv.toLongArray())
}

/** `probe_bucket(array<long>) -> long` — the instrument hash, registered
  * session-wide by [[graft.plans.GraftSparkExtensions]]. Codegen'd so the
  * measurement pass is one whole-stage scan like every other signature
  * kernel.
  */
case class ProbeBucket(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "probe_bucket"

  override def nullSafeEval(input: Any): Any =
    ProbePlanes.bucketOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ProbePlanes.bucketOf($c);")

  override protected def withNewChildInternal(newChild: Expression): ProbeBucket =
    copy(child = newChild)
}

object LshSizing {

  /** Bucket-concentration factor of an embeddings frame under the
    * instrument geometry: Σ s² over per-bucket counts s, normalized by
    * the same statistic's expectation for UNIFORM random occupancy at
    * this n and B = 2^8 (n²/B + n — the Poisson baseline, so dispersion
    * that mere balls-in-bins chance produces reads as ≈ 1.0). A corpus of
    * near-identical vectors collapses into few buckets and reads ≫ 1;
    * within-bucket pair cost scales by exactly this factor relative to
    * the uniform assumption the row-count sizing makes. `None` on an
    * empty frame (deploy-before-data — same contract as
    * `measuredLatenessMicros`).
    *
    * One codegen'd scan + one 256-group aggregate; callers measure on a
    * deterministic modulo sample when the corpus is large (concentration
    * is a ratio — scale-invariant under uniform sampling).
    */
  def measuredSkew(embeddings: DataFrame): Option[Double] = {
    val counts = embeddings
      .select(expr(
        """probe_bucket(transform(embedding,
          |  x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)))"""
          .stripMargin).as("b"))
      .groupBy("b").count()
    val row = counts
      .agg(expr("sum(count * count)").as("s2"), expr("sum(count)").as("n"))
      .first()
    if (row.isNullAt(0)) None
    else {
      val s2 = row.getLong(0).toDouble
      val n = row.getLong(1).toDouble
      val buckets = (1L << ProbePlanes.Bits).toDouble
      Some(s2 / (n * n / buckets + n))
    }
  }
}

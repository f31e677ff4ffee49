package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** IVF coarse-quantizer support: cosine of a quantized vector against every
  * centroid, as one codegen'd JVM call (`centroid_sims(qv, centroids)` →
  * `array<double>`). The centroid matrix arrives as a plan literal — the
  * "model" of the coarse quantizer — so assignment and probe selection are
  * pure map-side expressions: zero shuffles over the corpus at 100 TB.
  */
object IvfMath {
  /** cos(v, cᵢ) for each centroid; 0.0 for zero-norm inputs. Double math is
    * IEEE-deterministic on every JVM, and each similarity is a single
    * per-row reduction (no cross-partition float accumulation order).
    */
  def sims(v: ArrayData, cents: ArrayData): ArrayData = {
    val q = v.toLongArray()
    var nv = 0.0
    var i = 0
    while (i < q.length) { nv += q(i).toDouble * q(i); i += 1 }
    val nrmV = math.sqrt(nv)
    val k = cents.numElements()
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cv = cents.getArray(c).toLongArray()
      val d = math.min(q.length, cv.length)
      var dot = 0.0
      var nc = 0.0
      var j = 0
      while (j < d) {
        dot += q(j).toDouble * cv(j)
        nc += cv(j).toDouble * cv(j)
        j += 1
      }
      out(c) = if (nrmV == 0.0 || nc == 0.0) 0.0 else dot / (nrmV * math.sqrt(nc))
      c += 1
    }
    new GenericArrayData(out)
  }
}

case class CentroidSims(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "centroid_sims"

  override def nullSafeEval(v: Any, c: Any): Any =
    IvfMath.sims(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.IvfMath.sims($v, $c);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CentroidSims = copy(left = newLeft, right = newRight)
}

object IvfExpressions {
  /** No-op when already injected session-wide by GraftSparkExtensions
    * (avoids a replaced-function warning per query).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("centroid_sims")))
      reg.createOrReplaceTempFunction(
        "centroid_sims", exprs => CentroidSims(exprs(0), exprs(1)), "built-in")
  }
}

package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain_bloom(serialized_filter, str)` — probe a
  * [[org.apache.spark.util.sketch.BloomFilter]] against a string column,
  * inside whole-stage codegen.
  *
  * The filter argument must be FOLDABLE (a literal carrying the serialized
  * sketch): it is deserialized once per plan into a codegen reference
  * object, so the per-row cost is exactly the filter's k hash probes — no
  * per-row deserialization, no UDF boundary. This is the engine's scale
  * lever for membership prefilters whose build side outgrows a broadcast
  * hash set (e.g. the n-gram set of a large eval corpus in
  * decontamination): the sketch is orders of magnitude smaller than the
  * exact set, ships once per executor inside the plan, and the (bounded,
  * one-sided) false positives are removed by a downstream exact join over
  * the few surviving rows.
  */
case class BloomMightContainStr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "might_contain_bloom"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (BINARY, STRING), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "the serialized bloom filter must be a foldable BINARY expression")
    else TypeCheckResult.TypeCheckSuccess

  /** Deserialized once per plan (lazily, on first use per JVM). */
  @transient private lazy val bloom: BloomFilter = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  // BinaryExpression.eval null-propagates: a null filter or null probe
  // yields null before nullSafeEval is reached.
  override def nullSafeEval(filterBytes: Any, str: Any): Any =
    bloom.mightContainBinary(str.asInstanceOf[UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (bloom == null) {
      // statically-null filter → constant-null boolean
      return ev.copy(code =
        code"""boolean ${ev.isNull} = true;
              |boolean ${ev.value} = false;""".stripMargin)
    }
    val bloomRef = ctx.addReferenceObj("bloomFilter", bloom, classOf[BloomFilter].getName)
    val rGen = right.genCode(ctx)
    ev.copy(code =
      code"""${rGen.code}
            |boolean ${ev.isNull} = ${rGen.isNull};
            |boolean ${ev.value} = false;
            |if (!${ev.isNull}) {
            |  ${ev.value} = $bloomRef.mightContainBinary(${rGen.value}.getBytes());
            |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

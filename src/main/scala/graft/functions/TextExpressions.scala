package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** JVM-callable text kernels shared by interpreted eval and generated
  * code (the [[RaceTimeParse]] pattern).
  */
object TextKernels {

  /** Number of matches of `[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]` in `s` — the
    * BPE-ish pre-tokenizer count `text_tokens` declares — computed in ONE
    * linear pass over the UTF-8 bytes instead of running a regex engine
    * per row (measured ×100: the regex alternation was ~90% of the
    * query, 10.9 s vs 1.0 s for the same scan without it).
    *
    * Equivalence argument (holds under BOTH java.util.regex leftmost-first
    * and RE2 semantics, so Spark and the DuckDB oracle agree): every
    * codepoint of the input is consumed by exactly one alternative or
    * skipped —
    *   - ASCII letters group into MAXIMAL runs (the greedy `[A-Za-z]+`;
    *     no other alternative can consume a letter), one match per run;
    *   - ASCII digits match `[0-9]` singly (the negated class excludes
    *     them, so alternation order cannot differ);
    *   - U+0020 is excluded from every alternative — skipped;
    *   - every OTHER codepoint (punctuation, controls, all non-ASCII)
    *     matches the negated class singly — in UTF-8 that is exactly one
    *     LEAD byte (continuation bytes `10xxxxxx` are skipped), and both
    *     regex engines count supplementary characters as one codepoint.
    * So count = letter-run starts + digits + other-non-space codepoints.
    */
  def bpeTokenCount(s: UTF8String): Long = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var i = 0
    var count = 0L
    var prevLetter = false
    while (i < n) {
      val ub = Platform.getByte(base, off + i) & 0xff
      if (ub < 0x80) {
        if ((ub >= 'A' && ub <= 'Z') || (ub >= 'a' && ub <= 'z')) {
          if (!prevLetter) count += 1L
          prevLetter = true
        } else {
          prevLetter = false
          if (ub != ' ') count += 1L // digit or other non-space ASCII: one match each
        }
      } else {
        prevLetter = false
        if ((ub & 0xc0) != 0x80) count += 1L // lead byte = one non-ASCII codepoint
      }
      i += 1
    }
    count
  }
}

/** Native Catalyst expression for the `text_tokens` pre-tokenizer count —
  * SQL `bpe_token_count(text)`: the single-pass kernel above inside
  * whole-stage codegen, replacing `size(regexp_extract_all(text,
  * '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'))`. NULL-propagating like the regex
  * chain it replaces (regexp_extract_all(NULL) is NULL and ANSI
  * size(NULL) is NULL). Parity with the regex form is property-asserted
  * in TextKernelsSpec; the DuckDB oracle keeps the regex as the
  * independent replay.
  */
case class BpeTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(input: Any): Any =
    TextKernels.bpeTokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.TextKernels.bpeTokenCount($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

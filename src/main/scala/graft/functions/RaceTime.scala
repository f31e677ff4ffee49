package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Race-time scalar functions (SURVEY.md §2.3 F1/F2).
  *
  * The reference parses `"H:MM:SS.mmm"` / `"M:SS.mmm"` / `"+gap"` /
  * `"+M:SS.mmm"` / `"N/A"` lap- and finish-time strings driver-side in
  * Python (`Lucas files/finalversion:33-53`) and formats seconds back to
  * `"HH:MM:SS.ss"` (`finalversion:55-63`). Here both are distributed,
  * codegen-friendly column functions:
  *
  *   - [[RaceTime.secondsCol]]: composed from built-in expressions only —
  *     every operator stays inside whole-stage codegen.
  *   - [[RaceTimeSeconds]]: the same semantics as a single native Catalyst
  *     `Expression` with `doGenCode`, registered as SQL `race_time_seconds`.
  *
  * Unlike the reference (which raises `ValueError` on malformed input,
  * `finalversion:52-53`), both return null for unparseable strings —
  * at 100 TB a single bad row must not kill the job; nulls are filterable.
  */
object RaceTime {

  /** `"M:SS.mmm" | "H:MM:SS.mmm" | "+gap" | "N/A"` → seconds (Double), built
    * from built-in expressions only (fully codegen'd, no UDF).
    */
  def secondsCol(c: Column): Column = {
    // exactly ONE leading '+' is the gap marker (finalversion:37) — ltrim
    // would eat '++' typos that the native expression rejects, and the two
    // paths must agree input-for-input (asserted in RaceTimeSpec)
    val t = regexp_replace(c, "^\\+", "")
    val parts = split(t, ":")
    val n = size(parts)
    // try_cast, not cast: under Spark 4's default ANSI mode a malformed
    // fragment must yield null (the engine's documented lenient semantics),
    // not kill the job.
    val p = (i: Int) => element_at(parts, i).try_cast("double")
    when(c.isNull || c === "N/A", lit(null).cast("double"))
      .when(n === 3, p(1) * 3600 + p(2) * 60 + p(3))
      .when(n === 2, p(1) * 60 + p(2))
      .when(n === 1, p(1))
      .otherwise(lit(null).cast("double"))
  }

  /** Seconds → `"HH:MM:SS.ss"` (reference `format_time`, finalversion:55-63).
    * Null-safe: format_string is NOT null-propagating (it would print the
    * literal text "null:null:..."), so null seconds must short-circuit.
    */
  def formatCol(c: Column): Column =
    when(c.isNull, lit(null).cast("string"))
      .otherwise(format_string("%02d:%02d:%05.2f",
        floor(c / 3600).cast("int"),
        floor(pmod(c, lit(3600)) / 60).cast("int"),
        pmod(c, lit(60))))

  /** Register SQL functions backed by the native expressions below.
    * No-op when the function already exists (GraftSparkExtensions injects
    * it session-wide) — re-registering is harmless but floods stderr with
    * a replaced-function warning per query.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("race_time_seconds")))
      reg.createOrReplaceTempFunction(
        "race_time_seconds", exprs => RaceTimeSeconds(exprs.head), "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("race_time_format")))
      reg.createOrReplaceTempFunction(
        "race_time_format", exprs => RaceTimeFormat(exprs.head), "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("race_time_str")))
      reg.createOrReplaceTempFunction(
        "race_time_str", exprs => RaceTimeStr(exprs(0), exprs(1), exprs(2)),
        "built-in")
  }
}

/** JVM-callable core shared by interpreted eval and generated code. */
object RaceTimeParse {
  def parseOrNull(s: UTF8String): java.lang.Double =
    if (s == null) null else parseString(s.toString)

  /** Fragment parse aligned with Spark's string→double cast, which is
    * Java parseDouble on the trimmed string (accepts sign, exponent, and
    * Java-ism suffixes like "23d" — verified empirically in RaceTimeSpec's
    * adversarial-shapes test, where the composed try_cast path and this
    * one must agree input-for-input).
    */
  private def fragOrNull(raw: String): java.lang.Double =
    try java.lang.Double.valueOf(raw.trim.toDouble)
    catch { case _: NumberFormatException => null }

  def parseString(raw: String): java.lang.Double = {
    if (raw == null || raw == "N/A") return null
    val str = if (raw.startsWith("+")) raw.substring(1) else raw
    val parts = str.split(":", -1)
    def frag(i: Int): java.lang.Double = fragOrNull(parts(i))
    parts.length match {
      case 3 =>
        val (h, m, sec) = (frag(0), frag(1), frag(2))
        if (h == null || m == null || sec == null) null
        else java.lang.Double.valueOf(h * 3600 + m * 60 + sec)
      case 2 =>
        val (m, sec) = (frag(0), frag(1))
        if (m == null || sec == null) null
        else java.lang.Double.valueOf(m * 60 + sec)
      case 1 => frag(0)
      case _ => null
    }
  }

  def format(sec: Double): String = {
    val h = math.floor(sec / 3600).toInt
    val m = math.floor((sec % 3600) / 60).toInt
    "%02d:%02d:%05.2f".formatLocal(java.util.Locale.ROOT, h, m, sec % 60)
  }

  /** Allocation-light `"HH:MM:SS.ss"` formatter — the JVM core behind the
    * native [[RaceTimeFormat]] expression. Semantics are the COMPOSED
    * [[RaceTime.formatCol]]'s, replayed exactly for every finite input:
    * pmod (sign-safe, like the composed pmod calls), and the `%05.2f`
    * fraction rounded HALF-UP on the double's SHORTEST decimal
    * representation (`Double.toString`) — which is what
    * `java.util.Formatter`'s `%f` actually rounds (it goes through
    * `sun.misc.FormattedFloatingDecimal`, i.e. the shortest repr, NOT the
    * exact binary expansion: 0.015 prints "0.02" under Formatter but its
    * exact expansion 0.01499999999999999944… would round to "0.01").
    * Reproduced via BigDecimal(Double.toString(s)).setScale instead of a
    * per-row Formatter (pattern parse + locale machinery), which is what
    * made format_string the hottest expression in the racetime projection
    * (~9 s of the ×100 query). Verified mismatch-free against Formatter
    * over dense grids in RaceTimeFormatProps + RaceTimeSpec.
    * NaN/±Inf return null (the composed path's ANSI int cast would ERROR
    * there; a formatter must not kill a 100 TB job — documented easing,
    * spec-pinned).
    */
  def formatFast(x: Double): UTF8String = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return null
    @inline def pmod(a: Double, n: Double): Double = ((a % n) + n) % n
    val h = math.floor(x / 3600d).toLong
    val m = math.floor(pmod(x, 3600d) / 60d).toLong
    val s = pmod(x, 60d)
    // shortest-repr BigDecimal, NOT new BigDecimal(s): Formatter rounds
    // the shortest decimal representation half-up (see Scaladoc above)
    val frac = new java.math.BigDecimal(java.lang.Double.toString(s))
      .setScale(2, java.math.RoundingMode.HALF_UP).toPlainString
    val sb = new java.lang.StringBuilder(12)
    if (h >= 0 && h < 10) sb.append('0')
    sb.append(h).append(':')
    if (m >= 0 && m < 10) sb.append('0')
    sb.append(m).append(':')
    var pad = 5 - frac.length
    while (pad > 0) { sb.append('0'); pad -= 1 }
    sb.append(frac)
    UTF8String.fromString(sb.toString)
  }
}

/** JVM core of [[RaceTimeStr]] — `'%d:%02d.%03d'` from three ints in ONE
  * buffer fill. Byte-for-byte the semantics of the composed
  * `concat(cast(q), ':', lpad(cast(o), 2, '0'), '.', lpad(cast(p), 3, '0'))`
  * it replaces in the racetime projection, INCLUDING the two non-printf
  * edges of that form (pinned in RaceTimeSpec so a future field change
  * fails loudly instead of silently diverging — round-16 ADVICE):
  * Spark's `lpad(s, n, '0')` TRUNCATES to the first n chars when s is
  * LONGER than n (printf `%0nd` widens), and `cast(int as string)` of a
  * negative renders `-k` (so a -5 o-field becomes "-5", 2 chars, no pad).
  * The racetime fields are modulo-bounded non-negative, so the forms
  * agree there; the replication is for honesty at the boundaries.
  */
object RaceTimeStrBuild {
  private def appendPadded(sb: java.lang.StringBuilder, v: Int, n: Int): Unit = {
    val s = java.lang.String.valueOf(v)
    if (s.length >= n) sb.append(s, 0, n) // lpad truncation semantics
    else {
      var pad = n - s.length
      while (pad > 0) { sb.append('0'); pad -= 1 }
      sb.append(s)
    }
  }

  def build(q: Int, o: Int, p: Int): UTF8String = {
    val sb = new java.lang.StringBuilder(18)
    sb.append(q).append(':')
    appendPadded(sb, o, 2)
    sb.append('.')
    appendPadded(sb, p, 3)
    UTF8String.fromString(sb.toString)
  }
}

/** Native fused `'%d:%02d.%03d'` formatter (SQL `race_time_str`): the
  * racetime board query's t_str projection as ONE codegen'd static call
  * instead of a 9-node concat/cast/lpad chain (each node allocating its
  * own UTF8String per row at 60M rows ×100). Null-safe on all three
  * children via [[TernaryExpression]]'s default null propagation — the
  * composed concat form was null-propagating too, so the swap preserves
  * the NULL row behavior (spec-pinned).
  */
case class RaceTimeStr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullable: Boolean = true
  override def prettyName: String = "race_time_str"

  override def nullSafeEval(q: Any, o: Any, p: Any): Any =
    RaceTimeStrBuild.build(q.asInstanceOf[Int], o.asInstanceOf[Int],
      p.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, o, p) =>
      s"${ev.value} = graft.functions.RaceTimeStrBuild.build($q, $o, $p);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): RaceTimeStr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Native Catalyst expression for race-time parsing (SURVEY.md §7.3): one
  * null-safe place for the `'N/A'` sentinel, participates in whole-stage
  * codegen via a static JVM call instead of falling back to interpreted eval.
  */
case class RaceTimeSeconds(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "race_time_seconds"

  override def nullSafeEval(input: Any): Any =
    RaceTimeParse.parseOrNull(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("parsed")
      s"""
      java.lang.Double $tmp = graft.functions.RaceTimeParse.parseOrNull($c);
      if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): RaceTimeSeconds =
    copy(child = newChild)
}

/** Native Catalyst expression for race-time FORMATTING (the F2 twin of
  * [[RaceTimeSeconds]]): seconds → `"HH:MM:SS.ss"` as a single codegen'd
  * static call — see [[RaceTimeParse.formatFast]] for the exactness
  * contract vs the composed [[RaceTime.formatCol]] (parity spec-asserted
  * on random grids and printf edge shapes in RaceTimeSpec). Registered as
  * SQL `race_time_format`.
  */
case class RaceTimeFormat(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullable: Boolean = true
  override def prettyName: String = "race_time_format"

  override def nullSafeEval(input: Any): Any =
    RaceTimeParse.formatFast(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("fmt")
      s"""
      org.apache.spark.unsafe.types.UTF8String $tmp =
        graft.functions.RaceTimeParse.formatFast($c);
      if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): RaceTimeFormat =
    copy(child = newChild)
}

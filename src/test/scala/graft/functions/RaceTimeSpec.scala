package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** F1/F2 scalar semantics (SURVEY.md §2.3; cases from FIXTURES.md §A8). */
class RaceTimeSpec extends SparkSpec {

  private val cases: Seq[(String, Option[Double])] = Seq(
    "1:37:33.584" -> Some(5853.584), // H:MM:SS.mmm
    "1:34.570" -> Some(94.570), // M:SS.mmm
    "+5.598" -> Some(5.598), // gap without colon
    "+1:07.219" -> Some(67.219), // gap with colon
    "N/A" -> None,
    "not a time" -> None) // reference raises; engine yields null (doc'd)

  private def viaSpark(expr: String => org.apache.spark.sql.Column,
      inputs: Seq[String]): Seq[Option[Double]] = {
    import spark.implicits._
    // keep input order: parse alongside the input, collect pairs
    val m = inputs.toDF("s").select(col("s"), expr("s").as("v"))
      .as[(String, Option[Double])].collect().toMap
    inputs.map(m)
  }

  private def assertCases(got: Seq[Option[Double]]): Unit =
    got.zip(cases).foreach { case (g, (in, exp)) =>
      exp match {
        case Some(e) => assert(g.exists(v => math.abs(v - e) < 1e-9),
          s"input $in: got $g expected $e")
        case None => assert(g.isEmpty, s"input $in: got $g expected null")
      }
    }

  test("composed-builtin parser matches the reference cases") {
    assertCases(viaSpark(s => RaceTime.secondsCol(col(s)), cases.map(_._1)))
  }

  test("native RaceTimeSeconds expression matches the reference cases") {
    RaceTime.register(spark)
    assertCases(viaSpark(s => expr(s"race_time_seconds($s)"), cases.map(_._1)))
  }

  test("native expression and composed builtins agree on a generated grid") {
    RaceTime.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val inputs = Seq.fill(200) {
      rnd.nextInt(4) match {
        case 0 => f"${rnd.nextInt(60)}%d:${rnd.nextInt(60)}%02d.${rnd.nextInt(1000)}%03d"
        case 1 => f"+${rnd.nextInt(10)}%d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d.000"
        case 2 => f"+${rnd.nextDouble() * 100}%.3f"
        case _ => "N/A"
      }
    }
    val df = inputs.toDF("s")
      .select(RaceTime.secondsCol(col("s")).as("a"), expr("race_time_seconds(s)").as("b"))
    assert(df.filter(!(col("a") <=> col("b"))).count() === 0)
  }

  test("composed and native parsers agree on adversarial shapes") {
    RaceTime.register(spark)
    import spark.implicits._
    // double '+', Java-suffix numbers, whitespace, exponent forms, empties
    val inputs = Seq("+++1:23.000", "++5.5", "1:23d", "23f", " 23 ", "1e3",
      "+1e2", "1:2:3:4", "", ":", "1:", ":5", "-5.0", "+-3", "1: 30.5")
    val df = inputs.toDF("s")
      .select(col("s"), RaceTime.secondsCol(col("s")).as("a"),
        expr("race_time_seconds(s)").as("b"))
    val diff = df.filter(!(col("a") <=> col("b"))).collect()
    assert(diff.isEmpty, diff.mkString("; "))
  }

  test("format matches the reference zero-padded HH:MM:SS.ss shape") {
    import spark.implicits._
    // FIXTURES.md §A8: 5853.584 → "01:37:33.58"
    val got = Seq(5853.584, 0.0, 59.999, 3661.0).toDF("x")
      .select(RaceTime.formatCol(col("x"))).as[String].collect()
    assert(got(0) === "01:37:33.58")
    assert(got(1) === "00:00:00.00")
    assert(got(3) === "01:01:01.00")
  }

  test("native race_time_format ≡ composed formatCol on grids and printf edges") {
    import spark.implicits._
    // random grid over the domain plus the printf-sensitive shapes: values
    // whose exact binary expansion sits near a 2-decimal rounding boundary
    // (x.xx5-looking doubles — 2.125 IS exactly representable), carry
    // cases that round the fraction to "60.00", zero, and negatives
    // (pmod keeps the fraction positive; the hour goes negative).
    val rnd = new scala.util.Random(11)
    val grid = Seq.fill(5000)(rnd.nextDouble() * 35999.99) ++
      Seq(0.0, 2.125, 0.005, 0.015, 59.995, 59.999, 3599.995, 3599.999,
        60.0, 3600.0, 86399.994, -0.5, -3600.25, -59.999)
    val rows = grid.toDF("x")
      .select(RaceTime.formatCol(col("x")).as("a"),
        call_function("race_time_format", col("x")).as("b"))
      .as[(String, String)].collect()
    rows.foreach { case (a, b) => assert(a === b, s"composed=$a native=$b") }
    // null propagates; NaN/Inf yield null from the native form (the
    // composed ANSI cast would error — the native formatter's documented
    // lenience: a bad row must not kill the job)
    val edge = Seq(Option.empty[Double], Some(Double.NaN),
      Some(Double.PositiveInfinity)).toDF("x")
      .select(call_function("race_time_format", col("x"))).as[Option[String]].collect()
    assert(edge.forall(_.isEmpty))
  }

  test("racetime's numeric sort keys replay the declared ORDER BY t_str exactly") {
    // The registered query sorts on numeric keys derived from t_str's
    // printf fields (nothing string-typed crosses the range exchange);
    // the DECLARED order is (l_orderkey, l_linenumber, t_str) with t_str
    // compared lexicographically. Assert the shipped row order equals a
    // driver-side re-sort by the declared keys — guarding the tie groups
    // ((okey, lineno) is NOT unique in testdata) against a future gate
    // that compares row order.
    val rows = graft.operators.Analytics.racetime.run(spark, sf("sf0.001"))
      .select(col("l_orderkey"), col("l_linenumber"), col("t_str"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getString(2)))
    val declared = rows.sortBy(identity)
    assert(rows.toSeq === declared.toSeq)
    // and the fixture genuinely exercises ties with lex-vs-numeric risk
    assert(rows.groupBy(r => (r._1, r._2)).exists(_._2.length > 1))
  }

  /** The round-17 packed sort key must order EXACTLY like the 5-key tuple
    * it replaces — exhaustive over the full bounded-field domain (okey
    * boundary values × lineno 1..7 × q60 0..59 × pmod 0..99), driver-side
    * so the claim is about the arithmetic itself, not one corpus. */
  test("racetime's packed sort key is order-isomorphic to the 5-key tuple") {
    def lexq1(q: Int) = if (q < 10) q else q / 10
    def lexq2(q: Int) = if (q < 10) 10 else q % 10
    def packed(okey: Long, lineno: Int, q: Int, pmod: Int): Long =
      okey * 262144L + lineno * 32768L + lexq1(q) * 2048L +
        lexq2(q) * 128L + pmod
    val domain = for {
      okey <- Seq(0L, 1L, 9999900000000L) // incl. the documented headroom edge
      lineno <- 1 to 7
      q <- 0 until 60
      pmod <- 0 until 100 by 3 // stride keeps it ~85k tuples; q is exhaustive
    } yield (okey, lineno, q, pmod)
    val byTuple = domain.sortBy { case (o, l, q, p) =>
      (o, l, lexq1(q), lexq2(q), p)
    }
    val byPacked = domain.sortBy { case (o, l, q, p) => packed(o, l, q, p) }
    assert(byTuple === byPacked)
  }

  test("parse∘format round-trips to 2-decimal precision") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val secs = Seq.fill(200)(rnd.nextDouble() * 35999.99)
    val rows = secs.toDF("x")
      .select(col("x"), RaceTime.secondsCol(RaceTime.formatCol(col("x"))).as("rt"))
      .as[(Double, Double)].collect()
    rows.foreach { case (x, rt) =>
      // %05.2f rounds to 2 decimals → max drift 0.005
      assert(math.abs(x - rt) < 0.005 + 1e-9, s"$x → $rt")
    }
  }

  /** The three t_str forms racetime has shipped — printf, concat/lpad, and
    * the fused native race_time_str — pinned equal AT THE FIELD BOUNDARIES
    * and beyond them (round-16 ADVICE: the concat/lpad ≡ printf invariant
    * held only under unchecked range assumptions; this makes any future
    * field change fail here instead of silently corrupting t_str). Beyond
    * the modulo ranges the concat and fused forms STAY identical to each
    * other (lpad truncation semantics) while printf widens — asserted
    * separately so the documented divergence is pinned too. */
  test("fused race_time_str ≡ concat/lpad ≡ printf on field boundaries; NULL propagates") {
    RaceTime.register(spark)
    import spark.implicits._
    val fields = Seq(// (q, o, p) — boundaries and representatives
      (0, 0, 0), (9, 9, 90), (10, 10, 100), (59, 59, 990), (59, 0, 0),
      (0, 59, 990), (1, 2, 30), (42, 7, 500))
    val df = fields.toDF("q", "o", "p").select(
      format_string("%d:%02d.%03d", col("q"), col("o"), col("p")).as("printf"),
      concat(col("q").cast("string"), lit(":"),
        lpad(col("o").cast("string"), 2, "0"), lit("."),
        lpad(col("p").cast("string"), 3, "0")).as("composed"),
      expr("race_time_str(q, o, p)").as("fused"))
    val bad = df.filter(!(col("printf") <=> col("composed")) ||
      !(col("printf") <=> col("fused"))).collect()
    assert(bad.isEmpty, bad.mkString("; "))
    // OUT-OF-RANGE fields: fused must track the concat/lpad form exactly
    // (truncation, negatives) even where printf widens
    val wide = Seq((123, 123, 1234), (-5, -5, -50), (60, 60, 1000))
      .toDF("q", "o", "p").select(
        concat(col("q").cast("string"), lit(":"),
          lpad(col("o").cast("string"), 2, "0"), lit("."),
          lpad(col("p").cast("string"), 3, "0")).as("composed"),
        expr("race_time_str(q, o, p)").as("fused"))
    val wbad = wide.filter(!(col("composed") <=> col("fused"))).collect()
    assert(wbad.isEmpty, wbad.mkString("; "))
    // NULL in any field → NULL out, like the concat form it replaced
    val nulls = spark.sql(
      "SELECT race_time_str(CAST(NULL AS INT), 1, 2) AS a," +
        " race_time_str(1, CAST(NULL AS INT), 2) AS b," +
        " race_time_str(1, 2, CAST(NULL AS INT)) AS c").collect()(0)
    assert(nulls.isNullAt(0) && nulls.isNullAt(1) && nulls.isNullAt(2))
  }

  /** racetime's round-17 numeric secs — q·60 + (o·1000+p)/1000.0 — must be
    * BITWISE equal to both parse paths on the full field grid: the one
    * division is the same single correctly-rounded operation as
    * parseDouble("oo.ppp"), and the remaining ops (exact q·60, one final
    * add) are shared with the composed split/try_cast chain. 60×60×100 =
    * 360k rows, exhaustive over every value racetime can produce. */
  test("numeric secs ≡ composed parse ≡ native parse on the exhaustive field grid") {
    RaceTime.register(spark)
    val grid = spark.range(0, 360000).selectExpr(
      "CAST(id % 60 AS INT) AS q",
      "CAST((id div 60) % 60 AS INT) AS o",
      "CAST(((id div 3600) % 100) * 10 AS INT) AS p")
      .selectExpr("race_time_str(q, o, p) AS t_str",
        "q * 60.0 + CAST(o * 1000 + p AS DOUBLE) / 1000.0 AS numeric")
    val df = grid.select(col("numeric"),
      RaceTime.secondsCol(col("t_str")).as("composed"),
      expr("race_time_seconds(t_str)").as("native"))
    // === not <=>+tolerance: the claim is bitwise equality
    assert(df.filter(col("numeric") =!= col("composed") ||
      col("numeric") =!= col("native")).count() === 0)
  }
}

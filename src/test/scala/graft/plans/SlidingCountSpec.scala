package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native sliding-count exec: constructed-fixture semantics (window
  * edges, ties, nulls, cross-partition pairs), plan shape (SlidingCount
  * over ONE range exchange, no Generate/band explode), and full parity
  * with the composed banded-join formulation on real data.
  */
class SlidingCountSpec extends SparkSpec {

  import spark.implicits._

  test("sliding count: brute-force parity on a fixture spanning partitions") {
    // 400 rows over a span >> window with clustered bursts — the range
    // exchange (4 test partitions) puts boundary pairs on the fringe path
    val rows = (0 until 400).map { i =>
      val t = (i / 4).toLong * 100L + (i % 4).toLong * 30L
      (i.toLong, t)
    }
    val W = 75L
    val df = rows.toDF("id", "t")
    val got = SlidingCountNode.slidingCount(df, "id", "t", W, "n")
      .as[(Long, Long)].collect().toMap
    val expect = rows.map { case (i, t) =>
      i -> rows.count { case (j, u) => j != i && math.abs(u - t) <= W }.toLong
    }.toMap
    assert(got === expect)
    // sanity: the fixture actually has near pairs and isolated rows
    assert(expect.values.max > 0)
  }

  test("sliding count: exact window edges, duplicate times, null time") {
    val df = Seq(
      (1L, Some(0L)),    // 2 within +10 (t=10 twice); t=11 is outside
      (2L, Some(10L)),   // duplicates both count
      (3L, Some(10L)),
      (4L, Some(21L)),   // 11 from t=10: outside W=10... within of t=21: t=10? |21-10|=11 > 10; only pairs with t in [11,31]
      (5L, Option.empty[Long]))
      .toDF("id", "t")
    val got = SlidingCountNode.slidingCount(df, "id", "t", 10L, "n")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 0L, 5L -> 0L))
  }

  test("sliding count: many partitions, partitions narrower than 2W (all fringe)") {
    // Force a fine range partitioning whose per-partition time span is
    // BELOW 2W, so every row is fringe and every cross-partition pair
    // resolves through the distributed bucket-group path — the degenerate
    // regime the fringe shuffle must still count exactly.
    val rows = (0 until 600).map(i => (i.toLong, i.toLong * 3L))
    val W = 40L // partition span ≈ 600·3/24 = 75 < 2W = 80
    val df = rows.toDF("id", "t").repartitionByRange(24, col("t"))
    val got = SlidingCountNode.slidingCount(df, "id", "t", W, "n")
      .as[(Long, Long)].collect().toMap
    val expect = rows.map { case (i, t) =>
      i -> rows.count { case (j, u) => j != i && math.abs(u - t) <= W }.toLong
    }.toMap
    assert(got === expect)
    assert(expect.values.max >= 26) // dense fixture: real window counts
  }

  test("sliding count: negative and sign-straddling times bucket correctly") {
    // the fringe pair shuffle keys on floorDiv(t, W) — a truncating
    // division here would split the bucket at 0 and lose pairs that
    // straddle the sign boundary; fixture forces cross-partition pairs
    // with t < 0, t = 0, and t > 0 inside one window
    val rows = (-300 until 300).map(i => (i.toLong + 1000L, i.toLong * 7L))
    val W = 50L
    val df = rows.toDF("id", "t").repartitionByRange(12, col("t"))
    val got = SlidingCountNode.slidingCount(df, "id", "t", W, "n")
      .as[(Long, Long)].collect().toMap
    val expect = rows.map { case (i, t) =>
      i -> rows.count { case (j, u) => j != i && math.abs(u - t) <= W }.toLong
    }.toMap
    assert(got === expect)
  }

  test("sliding count: duplicate ids among fringe rows fail fast") {
    // Two rows share id 7 and land near partition boundaries (every row
    // is fringe at this scale) — the unique-id contract guard must abort
    // instead of silently double-applying cross-partition extras.
    val df = Seq((7L, 0L), (7L, 10L), (1L, 5L), (2L, 1000L), (3L, 1010L))
      .toDF("id", "t").repartitionByRange(3, col("t"))
    val ex = intercept[Exception] {
      SlidingCountNode.slidingCount(df, "id", "t", 50L, "n").collect()
    }
    def messages(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(t => Option(t.getMessage).toSeq ++ messages(t.getCause))
    assert(messages(ex).exists(_.contains("duplicate id")), ex.toString)
  }

  test("sliding count: fringe cap failure fails fast and names the knob") {
    // 1500-row all-fringe fixture (every partition spans < 2W): with the
    // cap forced to its 1000 floor via the injectable session conf, the
    // exec must refuse to run rather than degrade, and the error must
    // name the ops knob.
    val rows = (0 until 1500).map(i => (i.toLong, i.toLong))
    val df = rows.toDF("id", "t").repartitionByRange(8, col("t"))
    spark.conf.set("graft.sliding.fringeMax", "1000")
    try {
      val ex = intercept[Exception] {
        SlidingCountNode.slidingCount(df, "id", "t", 2000L, "n").collect()
      }
      def messages(e: Throwable): Seq[String] =
        Option(e).toSeq.flatMap(t => Option(t.getMessage).toSeq ++ messages(t.getCause))
      assert(messages(ex).exists(m =>
        m.contains("GRAFT_SLIDING_FRINGE_MAX") && m.contains("graft.sliding.fringeMax")),
        ex.toString)
    } finally spark.conf.unset("graft.sliding.fringeMax")
    // happy path with the cap back at its default: exact result (each row
    // sees all 1499 others — everything is within W AND on a fringe)
    val got = SlidingCountNode.slidingCount(df, "id", "t", 2000L, "n")
      .as[(Long, Long)].collect().toMap
    assert(got.size === 1500 && got.values.forall(_ === 1499L))
  }

  test("sliding count: malformed fringe cap conf fails loudly, not default") {
    spark.conf.set("graft.sliding.fringeMax", "lots")
    try {
      val df = Seq((1L, 0L), (2L, 5L)).toDF("id", "t")
      val ex = intercept[Exception] {
        SlidingCountNode.slidingCount(df, "id", "t", 10L, "n").collect()
      }
      def messages(e: Throwable): Seq[String] =
        Option(e).toSeq.flatMap(t => Option(t.getMessage).toSeq ++ messages(t.getCause))
      assert(messages(ex).exists(_.contains("must be an integer")), ex.toString)
    } finally spark.conf.unset("graft.sliding.fringeMax")
  }

  test("sliding count plan: native exec over ONE range exchange, no band explode") {
    val dir = sf("sf0.001")
    val q = graft.operators.AsofJoin.bandJoin.run(spark, dir)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("SlidingCount"), s"native exec missing:\n$plan")
    assert(!plan.contains("Generate explode"),
      s"band explode still present:\n$plan")
    assert("Exchange rangepartitioning".r.findAllIn(plan).size >= 1, plan)
  }

  test("prox_incr_merge plan: two native execs, seam filters pushed to the scans") {
    val dir = sf("sf0.001")
    val q = graft.operators.AsofJoin.proxIncr.run(spark, dir)
    val plan = q.queryExecution.executedPlan.toString
    assert("SlidingCount".r.findAllIn(plan).size >= 2,
      s"both half counts must use the native exec:\n$plan")
    // the seam's half filters must reach the parquet scans as pushed
    // range predicates on ts — the corpus-size-invariance claim
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(pushed.exists(l =>
      l.contains("GreaterThan") || l.contains("LessThan")), pushed.mkString("\n"))
    graft.Scratch.release(spark)
  }

  test("sliding count parity: native ≡ composed banded join on real events") {
    val dir = sf("sf0.001")
    val BandMicros = graft.operators.AsofJoin.BandMicrosForSpec
    val ev = graft.sources.Tables.load(spark, dir, "events")
      .select(col("event_id"), graft.sources.Tables.nanosToMicros("ts").as("t"))
    val native = graft.operators.AsofJoin.bandJoin.run(spark, dir)
      .as[(Long, Long)].collect().toSeq
    val probes = ev.select(col("event_id"), col("t"),
      explode(sequence(
        expr(s"(t - ${BandMicros}L) div ${BandMicros}L"),
        expr(s"(t + ${BandMicros}L) div ${BandMicros}L"))).as("band"))
    val build = ev.select(col("event_id").as("b_id"), col("t").as("b_t"),
      expr(s"t div ${BandMicros}L").as("band"))
    val counts = probes.join(build, Seq("band"))
      .filter(col("b_id") =!= col("event_id") &&
        abs(col("b_t") - col("t")) <= BandMicros)
      .groupBy(col("event_id")).agg(count(lit(1)).as("n_near"))
    val composed = ev.select(col("event_id")).join(counts, Seq("event_id"), "left")
      .withColumn("n_near", coalesce(col("n_near"), lit(0L)))
      .orderBy(col("event_id"))
      .as[(Long, Long)].collect().toSeq
    assert(native === composed)
    assert(native.nonEmpty && native.exists(_._2 > 0))
    graft.Scratch.release(spark)
  }
}

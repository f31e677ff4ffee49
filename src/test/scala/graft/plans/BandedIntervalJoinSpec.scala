package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The banded-interval-join rule must turn a bare inequality join into an
  * equi-join plan WITHOUT changing its result — including across the epoch
  * boundary where truncating division would misband negative times.
  */
class BandedIntervalJoinSpec extends SparkSpec {

  import spark.implicits._

  private val W = 600L * 1000000L

  test("a bare time-proximity join plans as a hash join on bands, not a nested loop") {
    val ev = graft.sources.Tables.load(spark, sf("sf0.001"), "events")
      .select($"event_id", graft.sources.Tables.nanosToMicros("ts").as("t"))
    val other = ev.select($"event_id".as("b_id"), $"t".as("b_t"))
    val joined = ev.join(other,
      abs($"b_t" - $"t") <= W && $"b_id" =!= $"event_id")
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval join fell back to a nested loop:\n$p")
    assert(p.contains("__band"), s"band rewrite did not fire:\n$p")
    // result parity: per-event neighbor counts must equal the manually
    // banded formulation (independently spec'd against an O(n²) replay)
    val got = joined.groupBy($"event_id").count()
      .as[(Long, Long)].collect().toMap
    val expect = graft.operators.AsofJoin.bandJoin.run(spark, sf("sf0.001"))
      .filter($"n_near" > 0).as[(Long, Long)].collect().toMap
    assert(got === expect)
  }

  test("pre-1970 timestamps band correctly (floor, not truncate-toward-zero)") {
    // times straddling 0: pairs (-W+1, 0) and (0, W-1) are in range; a
    // truncating band would put -1 and +1 in the SAME band 0 while pushing
    // -W+1 out of the probe range computed for 0
    val ts = Seq(-W + 1L, -1L, 0L, 1L, W - 1L, 3 * W)
    val rows = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val l = rows.toDF("id", "t")
    val r = rows.toDF("b_id", "b_t")
    val joined = l.join(r, abs($"b_t" - $"t") <= W && $"b_id" =!= $"id")
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("__band"), s"rewrite did not fire on the fixture:\n$p")
    val got = joined.select($"id", $"b_id").as[(Long, Long)].collect().toSet
    val expect = (for {
      (ta, a) <- ts.zipWithIndex; (tb, b) <- ts.zipWithIndex
      if a != b && math.abs(tb - ta) <= W
    } yield (a.toLong, b.toLong)).toSet
    assert(got === expect)
  }

  test("values adjacent to Long.MinValue band without overflow") {
    // the naive floor `(e - pmod(e, w)) div w` wraps for e within W of
    // Long.MinValue (pmod is positive there), which either throws under
    // ANSI or hands Sequence a start > stop — a query that ran fine as a
    // nested loop would crash after the rewrite. True differences between
    // these fixture values stay ≤ 3W, so the predicate itself never wraps
    // and nested-loop semantics are well-defined to compare against.
    val base = Long.MinValue
    val ts = Seq(base, base + 1L, base + W - 1L, base + W, base + 3 * W)
    val rows = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val l = rows.toDF("id", "t")
    val r = rows.toDF("b_id", "b_t")
    val joined = l.join(r, abs($"b_t" - $"t") <= W && $"b_id" =!= $"id")
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("__band"), s"rewrite did not fire on the fixture:\n$p")
    val got = joined.select($"id", $"b_id").as[(Long, Long)].collect().toSet
    val expect = (for {
      (ta, a) <- ts.zipWithIndex; (tb, b) <- ts.zipWithIndex
      if a != b && math.abs(tb - ta) <= W
    } yield (a.toLong, b.toLong)).toSet
    assert(got === expect)
  }

  test("outer equi-key range joins keep Spark's native plan (inner-only scope)") {
    // range_join is a LEFT join: banding an outer join would need
    // probe-side dedup of unmatched rows, so the rule must leave it alone
    val p = graft.SparkEntry.queries("range_join")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("__band"), s"rule fired on an outer join:\n$p")
  }

  private def withExcludedRule[A](f: => A): A = {
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "graft.plans.BandedIntervalJoin")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("keyed interval window bands on (key, band) and matches the unbanded result") {
    // the attribution shape: equi key + one-sided [0, W] window on LONGS.
    // Fixture includes boundary hits (exactly 0 and exactly W apart),
    // out-of-window pairs, cross-key pairs, and a pre-1970 window.
    val l = Seq((1L, 0L), (1L, W), (2L, 5L), (3L, -W), (4L, 100L))
      .toDF("k", "t")
    val r = Seq((1L, 0L), (1L, W - 1L), (1L, W), (1L, 2 * W + 1L),
      (2L, 5L + W), (2L, 6L + W), (3L, -W + 3L), (5L, 100L))
      .toDF("bk", "bt")
    def joined = l.join(r,
      $"k" === $"bk" && $"bt" >= $"t" && $"bt" <= $"t" + W)
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("__band"), s"keyed interval window did not band:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"banding lost the equi join:\n$p")
    val banded = joined.select($"k", $"t", $"bt").as[(Long, Long, Long)]
      .collect().toSet
    val unbanded = withExcludedRule {
      joined.select($"k", $"t", $"bt").as[(Long, Long, Long)].collect().toSet
    }
    assert(banded === unbanded)
    assert(banded.contains((1L, 0L, 0L)) && banded.contains((1L, 0L, W)),
      "inclusive window boundaries lost")
    assert(!banded.exists { case (k, t, bt) => bt - t > W || bt < t },
      "out-of-window pair survived")
  }

  test("NULL times drop (not crash) in banded joins whose window straddles zero") {
    // regression: the clamp in safeShift was Least/Greatest, which SKIP
    // null inputs — a NULL time clamped to the long-range edge constant
    // and the probe Sequence tried to explode ~2^64/w bands:
    // COLLECTION_SIZE_LIMIT_EXCEEDED at runtime (reproduced). Needs a
    // window with BOTH bounds nonzero (a [0, W] window shifts nothing on
    // the zero side — events_clickjoin's shape was safe) AND constraint
    // propagation off: with it on, the inferred isnotnull filters from
    // the null-intolerant bounds happen to drop NULL rows below the
    // Generate and MASK the bug. The If-based clamp propagates the NULL
    // itself, so correctness no longer leans on that optimizer behavior.
    val prev = spark.conf.get("spark.sql.constraintPropagation.enabled")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    try {
      val l = Seq((1L, Some(0L)), (1L, None), (2L, Some(5L)))
        .toDF("k", "t")
      val r = Seq((1L, Some(100L)), (1L, None), (2L, Some(5L + W)))
        .toDF("bk", "bt")
      // symmetric ±W window spelled as two one-sided bounds → both lo and
      // hi nonzero after normalization
      def joined = l.join(r,
        $"k" === $"bk" && $"bt" >= $"t" - W && $"bt" <= $"t" + W)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("__band"), s"straddling keyed window did not band:\n$p")
      val got = joined.select($"k", $"t", $"bt").as[(Long, Long, Long)]
        .collect().toSet
      assert(got === Set((1L, 0L, 100L), (2L, 5L, 5L + W)),
        "NULL-time rows must drop; in-window pairs must survive")
      // keyless abs form with NULLs must also run and drop the null rows
      val l2 = Seq((1L, Some(0L)), (2L, None)).toDF("id", "t")
      val r2 = Seq((10L, Some(50L)), (11L, None)).toDF("b_id", "b_t")
      val got2 = l2.join(r2, abs($"b_t" - $"t") <= W)
        .select($"id", $"b_id").as[(Long, Long)].collect().toSet
      assert(got2 === Set((1L, 10L)))
    } finally spark.conf.set("spark.sql.constraintPropagation.enabled", prev)
  }

  test("a lone one-sided bound must NOT band (no self-pairing into a width-0 window)") {
    // regression: the window finder once paired `bt >= t` with ITSELF,
    // fabricating a [0,0] window whose band equality silently dropped
    // almost every matching row
    val l = Seq((1L, 0L), (1L, 50L)).toDF("k", "t")
    val r = Seq((1L, 10L), (1L, 60L)).toDF("bk", "bt")
    val joined = l.join(r, $"k" === $"bk" && $"bt" >= $"t")
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("__band"), s"unbounded interval banded:\n$p")
    assert(joined.count() === 3L) // (0,10), (0,60), (50,60)
  }

  test("timestamp-typed windows band on epoch micros (the events_clickjoin shape)") {
    val ev = Seq(
      (1L, "click", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (1L, "purchase", java.sql.Timestamp.valueOf("2024-01-01 10:05:00")),
      (1L, "purchase", java.sql.Timestamp.valueOf("2024-01-01 10:10:00")),
      (1L, "purchase", java.sql.Timestamp.valueOf("2024-01-01 10:10:01")),
      (2L, "purchase", java.sql.Timestamp.valueOf("2024-01-01 10:05:00")))
      .toDF("user_id", "event_type", "ts")
    val joined = graft.streaming.EventsStream.clickPurchaseJoin(
      ev.withColumn("value", lit(1.0)))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("__band"), s"timestamp window did not band:\n$p")
    val got = joined.select($"purchase_ts").as[java.sql.Timestamp]
      .collect().map(_.toString).toSet
    assert(got === Set("2024-01-01 10:05:00.0", "2024-01-01 10:10:00.0"),
      s"banded timestamp join returned wrong rows: $got")
  }
}

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

  test("joins with an equi-key keep Spark's native hash/sort-merge plan") {
    val p = graft.SparkEntry.queries("range_join")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("__band"), s"rule fired on an equi-key join:\n$p")
  }
}

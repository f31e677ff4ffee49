package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AQE skew-join handling (`OptimizeSkewedJoin`) — the runtime half of the
  * engine's skew posture. The 100 TB story has two layers: manual salting
  * where the skew is KNOWN (skew_agg), and AQE's runtime split where it is
  * not — a sort-merge join whose shuffle statistics reveal one oversized
  * partition gets that partition split into advisory-sized slices, each
  * joined against a duplicated copy of the other side's matching partition.
  * This spec pins (a) that the session leaves the feature ON (a conf drift
  * disabling it would otherwise pass every test and only surface as a
  * straggler executor at scale), (b) the plan shape — the join marked
  * skew=true with a skewed AQEShuffleRead below it — on a deliberately
  * hot-keyed join, and (c) result equality with the unsplit plan (the
  * split is a pure physical rewrite; any row difference is a bug).
  *
  * The RuntimeFilterSpec fixture pattern: thresholds are lowered only
  * inside the fixture so spec-scale data exhibits the statistics shape a
  * 100 TB hot key produces; production keeps the defaults.
  */
class SkewJoinSpec extends SparkSpec {

  import spark.implicits._

  private def withSkewJoinTuned[A](skewEnabled: Boolean)(f: => A): A = {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> skewEnabled.toString,
      // a partition is "skewed" when it exceeds factor × median AND this
      // byte floor — the default 256 MB floor can never trip at spec
      // scale, so lower only the floor (the factor stays the production
      // default: the spec's hot key must win by RATIO, not by rigging)
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      // coalescing hides the skew statistics at this scale by merging the
      // small partitions the median is computed from
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // force the sort-merge path: a broadcast join has no skew to split
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.join.preferSortMergeJoin" -> "true")
    val saved = keys.map { case (k, _) => k -> conf.getOption(k) }
    keys.foreach { case (k, v) => conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  /** ~190k of 200k fact rows share key 7 (one hot partition, the rest
    * spread over 96 cold keys); the dim side carries every key once.
    * Deterministic (range-derived), no data files needed. The readout is
    * a GLOBAL aggregate on purpose: OptimizeSkewedJoin (unforced) only
    * splits when no downstream operator requires the join's hash
    * distribution — a groupBy on the join key would ride the join
    * exchange and veto the split, which is correct behavior, not skew
    * coverage.
    */
  private def skewedJoin(): DataFrame = {
    val fact = spark.range(200000L).select(
      when($"id" % 20 =!= 0, lit(7L)).otherwise($"id" % 96 + 100L).as("k"),
      $"id".as("v"))
    val dim = spark.range(300L).select($"id".as("k"), ($"id" * 10).as("w"))
    fact.join(dim, "k")
      .agg(sum($"v").as("sv"), sum($"w").as("sw"), count(lit(1)).as("n"))
  }

  test("session leaves AQE skew-join reachable (conf-drift guard)") {
    // both must hold on the UNTOUCHED session: adaptive execution on and
    // skew handling not disabled — the exact drift that would silently
    // re-expose 100 TB runs to stragglers while every test stays green
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
  }

  test("a hot-keyed sort-merge join gets its skewed partition split, results unchanged") {
    // collect on the frame ITSELF (`.as[...]` would wrap a fresh
    // QueryExecution and leave this one unexecuted — isFinalPlan=false,
    // no runtime rewrites to observe)
    def run(df: DataFrame): (String, Set[(Long, Long, Long)]) = {
      val rows = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      (df.queryExecution.executedPlan.toString, rows)
    }
    val (skewPlan, skewRows) = withSkewJoinTuned(skewEnabled = true) {
      run(skewedJoin())
    }
    // OptimizeSkewedJoin marks the join and installs a skewed shuffle
    // read below it; both markers must be present in the FINAL adaptive
    // plan (the rewrite happens at runtime, from real shuffle statistics)
    assert(skewPlan.contains("skew=true"),
      s"OptimizeSkewedJoin did not fire:\n$skewPlan")
    assert(skewPlan.contains("AQEShuffleRead skewed"),
      s"no skewed shuffle read installed:\n$skewPlan")
    val (plainPlan, plainRows) = withSkewJoinTuned(skewEnabled = false) {
      run(skewedJoin())
    }
    assert(!plainPlan.contains("skew=true"))
    // the split is a physical-only rewrite: byte-identical results
    assert(skewRows === plainRows)
    // and exactly the arithmetic truth — the duplicated dim partitions
    // the split installs must not double-count a single row
    val keys = (0L until 200000L).map(id =>
      if (id % 20 != 0) 7L else id % 96 + 100L)
    val expected = (keys.zipWithIndex.map(_._2.toLong).sum,
      keys.map(_ * 10).sum, 200000L)
    assert(skewRows === Set(expected))
  }
}

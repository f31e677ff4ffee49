package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage decomposition instrument for board queries (round-16 task #5:
  * racetime has sat at the top of the ×100 board for three rounds flagged
  * "audited floor" without a published breakdown). Runs each stage of a
  * query's pipeline in isolation — same session config as Bench, full
  * `toRdd` materialization semantics — and prints one JSON line per
  * stage, best-of-2.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> runMain graft.Decomp racetime`
  *
  * Stage algebra for racetime (see Analytics.racetime scaladoc: numeric
  * keys below the range exchange, the whole parse/format chain above it):
  *   scan_project  = scan + narrow numeric projection (no sort)
  *   sort_only     = scan_project + range-partitioner sampling + exchange
  *                   + per-partition sort (no formatting)
  *   format_only   = scan_project + the parse/format projection (no sort)
  *   full          = the registered query
  * So (sort_only − scan_project) prices the global sort machinery,
  * (format_only − scan_project) the projection, and
  * full − sort_only − (format_only − scan_project) ≈ the interaction
  * (string materialization at the sort boundary, GC).
  * format_concat swaps t_str's java.util.Formatter-backed format_string
  * for codegen'd concat/lpad — the candidate lever priced before any
  * query change.
  */
object Decomp {

  private def timed(label: String)(df: => DataFrame): Unit = {
    val ts = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.foreach(_ => ())
      (System.nanoTime() - t0) / 1e9
    }
    println(f"""{"stage":"$label%s","best_s":${ts.min}%.3f,"passes":[${
      ts.map(t => f"$t%.3f").mkString(",")}]}""")
  }

  def main(args: Array[String]): Unit = {
    val which = args.lift(0).getOrElse("racetime")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-decomp", Some(sfDir))
    which match {
      case "racetime" => racetime(spark, sfDir)
      case "dedup_spans" => dedupSpans(spark, sfDir)
      case "dq_audit" => dqAudit(spark, sfDir)
      case "dedup_incr_index" => incrIndex(spark, sfDir)
      case other => sys.error(s"unknown decomposition '$other'")
    }
    spark.stop()
  }

  /** dedup_spans stage pricing (round-17 task 6): the gram fixture is
    * obtained first (store posture, like Bench), the memo is loaded by a
    * non-reported warm pass, then each pipeline prefix is timed
    * best-of-2 — so stage deltas price the doc-frequency pass, the
    * dup-gram join, the per-doc count, and the interval-union window in
    * isolation from the serve cost (reported as its own stage).
    */
  private def dedupSpans(s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val t0 = System.nanoTime()
    operators.TextAnalysis.gramFixtureWrite(s, dir)
    println(f"""{"stage":"fixture_obtain","best_s":${(System.nanoTime() - t0) / 1e9}%.3f}""")
    val stages = operators.TextAnalysis.spanDecompStages(s, dir)
    // warm pass: codegen + parquet reader + the gram memo load, so
    // grams_scan times the MEMO read (the posture every in-run consumer
    // after the first sees), not the one-time load
    stages.head._2().queryExecution.toRdd.foreach(_ => ())
    stages.foreach { case (label, df) => timed(label)(df()) }
  }

  /** dq_audit stage pricing (round-18 task 3): the two named lineitem
    * stages are the exact frames the registered query unions —
    *   li_dim_scan   = broadcast-FK + domain conditional aggregate
    *                   (zero exchanges; prices the two fact scans' IO)
    *   li_key_rollup = order-grain bitmask rollup + orphan join (the one
    *                   fact exchange)
    *   full          = the registered query (adds the three small-table
    *                   check scans + the final union/sort)
    * So (full − li_dim_scan − li_key_rollup) prices the small-table
    * checks, and li_key_rollup − (its scan share) the exchange.
    */
  private def dqAudit(s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    timed("li_dim_scan")(operators.DataQuality.liDimChecks(s, dir))
    timed("li_key_rollup")(operators.DataQuality.liKeyChecks(s, dir))
    timed("full")(operators.DataQuality.audit.run(s, dir))
  }

  /** dedup_incr_index stage pricing (round 18): base index obtained
    * first (the Bench serve posture), then delta_sign prices the
    * signing pass over the post-midpoint half, base_scan the stored
    * index read, bucket_agg the (band, bkey) count + C(sz,2) rollup over
    * the stored entries alone, and full the registered query.
    */
  private def incrIndex(s: org.apache.spark.sql.SparkSession, dir: String): Unit =
    operators.Dedup.incrDecompStages(s, dir).foreach {
      case (label, df) => timed(label)(df())
    }

  private def racetime(s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    operators.Analytics.racetime // touch the registering object
    functions.RaceTime.register(s)
    def base: DataFrame = sources.Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_partkey"))
      .withColumn("q60", floor(col("l_quantity")).cast("int") % 60)
    def sorted(df: DataFrame): DataFrame = df
      .orderBy(col("l_orderkey"), col("l_linenumber"),
        expr("CASE WHEN q60 < 10 THEN q60 ELSE q60 div 10 END"),
        expr("CASE WHEN q60 < 10 THEN 10 ELSE q60 % 10 END"),
        col("l_partkey") % 100)
    // candidate lever (round 17): the 5-key sort packed into ONE long —
    // all trailing fields are bounded non-negative (lineno 1..7, lexq1
    // 0..9, lexq2 0..10, p 0..99), so the packed integer order is
    // isomorphic to the tuple order; the exchange ships one long instead
    // of five sort columns and the sorter compares one word
    // bit budget: lineno 1..7 → 3 bits, lexq1 0..9 → 4, lexq2 0..10 → 4,
    // pmod 0..99 → 7; okey occupies the remaining high bits (fits to
    // ~2^44 of key space, 10⁴× beyond the ×100 corpus)
    def sortedPacked(df: DataFrame): DataFrame = df
      // the SAME packed-key expression the shipped query sorts on — a
      // shared constant so the stage pricing can't desynchronize (r17
      // advice)
      .withColumn("sk", expr(operators.Analytics.RacetimePackedSortKey))
      .orderBy(col("sk")).drop("sk")
    // mirror of the registered post-sort projection (q60 dropped first,
    // the format chain recomputes its fields — identical plan shape)
    def formatted(df: DataFrame, concatTstr: Boolean): DataFrame = {
      val tstr =
        if (concatTstr)
          concat((floor(col("l_quantity")).cast("int") % 60).cast("string"),
            lit(":"),
            lpad((col("l_orderkey") % 60).cast("int").cast("string"), 2, "0"),
            lit("."),
            lpad(((col("l_partkey") % 100) * 10).cast("int").cast("string"), 3, "0"))
        else
          format_string("%d:%02d.%03d",
            floor(col("l_quantity")).cast("int") % 60,
            (col("l_orderkey") % 60).cast("int"),
            ((col("l_partkey") % 100) * 10).cast("int"))
      df.drop("q60")
        .withColumn("t_str", tstr)
        .withColumn("secs", functions.RaceTime.secondsCol(col("t_str")))
        .withColumn("secs_native", expr("race_time_seconds(t_str)"))
        .withColumn("fmt", call_function("race_time_format", col("secs")))
        .select(col("l_orderkey"), col("l_linenumber"), col("t_str"),
          col("secs"), col("secs_native"), col("fmt"))
    }
    // round-17 fused shape: native race_time_str + numeric secs + ONE
    // native parse (the registered query's current projection) — priced
    // against the r16 concat/double-parse stages above
    def formattedFused(df: DataFrame): DataFrame =
      df.drop("q60")
        .withColumn("t_str", call_function("race_time_str",
          floor(col("l_quantity")).cast("int") % 60,
          (col("l_orderkey") % 60).cast("int"),
          ((col("l_partkey") % 100) * 10).cast("int")))
        .withColumn("secs",
          (floor(col("l_quantity")).cast("int") % 60).cast("double") * 60.0 +
            ((col("l_orderkey") % 60).cast("int") * 1000 +
              ((col("l_partkey") % 100) * 10).cast("int")).cast("double") / 1000.0)
        .withColumn("secs_native", expr("race_time_seconds(t_str)"))
        .withColumn("fmt", call_function("race_time_format", col("secs")))
        .select(col("l_orderkey"), col("l_linenumber"), col("t_str"),
          col("secs"), col("secs_native"), col("fmt"))
    // JVM warm pass (codegen, parquet reader) — not reported
    base.queryExecution.toRdd.foreach(_ => ())
    timed("scan_project")(base)
    timed("sort_only")(sorted(base).drop("q60"))
    timed("sort_only_packed")(sortedPacked(base).drop("q60"))
    timed("full_fused_packed")(formattedFused(sortedPacked(base)))
    timed("format_only")(formatted(base, concatTstr = false))
    timed("format_only_concat")(formatted(base, concatTstr = true))
    timed("format_only_fused")(formattedFused(base))
    timed("full")(operators.Analytics.racetime.run(s, dir))
    timed("full_concat")(formatted(sorted(base), concatTstr = true))
    // where does the range partitioner SAMPLE? The r5 fix moved the
    // format projection above the exchange; assert it still holds by
    // printing the Sort's child subtree.
    val plan = operators.Analytics.racetime.run(s, dir)
      .queryExecution.executedPlan.toString
    val hasFormatBelowSort = {
      // the RangePartitioner samples the exchange CHILD: if any format
      // expression appears below the exchange the sampling pass pays it
      val ex = plan.split("\n").dropWhile(!_.contains("Exchange rangepartitioning"))
      ex.exists(l => l.contains("format_string") || l.contains("race_time_format"))
    }
    println(s"""{"check":"format_below_exchange","value":$hasFormatBelowSort}""")
  }
}

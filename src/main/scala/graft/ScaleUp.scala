package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a larger test corpus from an existing scale-factor dir by
  * replicating the per-row tables `factor`× with key offsets — the
  * scale-up smoke harness (run `graft.Bench` against the output dir to
  * check that no query's plan hides a driver-side or single-task
  * bottleneck that only materializes beyond the shipped SFs).
  *
  * Replication preserves the properties the queries exercise:
  *   - referential integrity: `l_orderkey`/`o_orderkey` are offset in
  *     lockstep; `o_custkey`/`user_id` keep their domain so dimension
  *     joins and group cardinalities stay realistic;
  *   - replica 0 is byte-identical to the source, so fixed query sets
  *     (knn/ANN probes on `vec_id < 5`, IVF seed centroids) still exist;
  *   - documents get a per-replica suffix so near-dup structure grows
  *     instead of collapsing into exact-duplicate groups ×factor;
  *   - embeddings are rotated by the replica index — norms and pairwise
  *     geometry within a replica are preserved, but replicas land in
  *     different LSH buckets / IVF lists like genuinely new vectors.
  *
  * Usage: `runMain graft.ScaleUp [srcDir] [outDir] [factor]` (one-shot
  * write to an explicit dir), or [[obtainScaled]] for the content-stamped
  * [[FixtureStore]] path Bench uses (`GRAFT_BENCH_SCALE`): the corpus is
  * generated once per (source data, generator code, factor, knobs) and
  * served to every later session/sandbox from the store.
  */
object ScaleUp {

  private val KeyStride = 100000000L

  /** Embedding width — [[graft.functions.ProbePlanes.Dims]], NOT
    * `LshPlanes.Dims`: touching LshPlanes initializes it and FREEZES the
    * JVM's LSH geometry, and when generation runs inside the bench JVM
    * (the [[obtainScaled]] build path) that would freeze the geometry at
    * the SOURCE corpus' size before the bench session re-hints it for the
    * scaled corpus. ProbePlanes is the instrument module that is
    * deliberately independent of LshPlanes for exactly this reason.
    */
  private def dims: Int = graft.functions.ProbePlanes.Dims

  /** Union of `factor` transformed replicas (replica 0 untransformed). */
  private def replicate(df: DataFrame, factor: Int)(
      transform: (DataFrame, Int) => DataFrame): DataFrame =
    (1 until factor).foldLeft(df) { (acc, r) =>
      acc.unionByName(transform(df, r))
    }

  private def scaleKeysKnob: Boolean =
    sys.env.get("GRAFT_SCALE_KEYS").contains("1")

  /** GRAFT_SCALE_ZIPF=1: replace uniform ×factor replication of the KEYED
    * facts (orders, lineitem, events) with a deterministic per-key
    * Zipf-ish multiplicity, so skew-sensitive queries (skew_agg,
    * window_funcs, events_concurrency, dq_audit's order-grain rollup) can
    * be gated on a corpus where hot keys actually exist — the stretch the
    * verdicts have asked for since round 15. Dimensions, documents, and
    * embeddings keep their plain-mode treatment.
    */
  private def zipfKnob: Boolean =
    sys.env.get("GRAFT_SCALE_ZIPF").contains("1")

  /** Per-key multiplicity with a geometric (Zipf-like) tail, exactly
    * replayable from the key itself (generation must be deterministic —
    * the corpus is a content-stamped fixture): u = xxhash64(key) mod 1024
    * picks a tier t with P(t = k) = 2^−(k+1) (t ≤ 10), and
    * m = max(1, factor·2^t ∕∕ 6). E[2^t] = 6, so E[m] = factor — total
    * row count stays comparable to plain ×factor replication — while the
    * hottest ~1/1024 of keys carry 2¹⁰/6 ≈ 170× the average history and
    * ~1/6 of ALL fact rows land on ~0.1% of keys: real aggregate and
    * window skew, not just a longer uniform corpus. Adds `ri`
    * (0 ≤ ri < m, replica 0 untransformed) for the caller to offset
    * per-row unique keys with.
    */
  private def withZipfRi(df: DataFrame, keyCol: org.apache.spark.sql.Column,
      factor: Int): DataFrame =
    df.withColumn("zu", pmod(xxhash64(keyCol), lit(1024L)))
      .withColumn("ri", explode(expr(
        s"""sequence(CAST(0 AS BIGINT), greatest(CAST(1 AS BIGINT),
           |  (CAST($factor AS BIGINT) * (CASE
           |    WHEN zu < 512 THEN 1L WHEN zu < 768 THEN 2L
           |    WHEN zu < 896 THEN 4L WHEN zu < 960 THEN 8L
           |    WHEN zu < 992 THEN 16L WHEN zu < 1008 THEN 32L
           |    WHEN zu < 1016 THEN 64L WHEN zu < 1020 THEN 128L
           |    WHEN zu < 1022 THEN 256L WHEN zu < 1023 THEN 512L
           |    ELSE 1024L END)) div 6) - 1)""".stripMargin)))
      .drop("zu")

  /** Write the scaled corpus for `src` under `out` (one parquet dir per
    * table). Pure function of (source bytes, this class, factor,
    * [[scaleKeysKnob]], [[dims]]) — the exact tuple [[obtainScaled]]
    * stamps.
    */
  def generate(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    def t(name: String): DataFrame = sources.Tables.load(spark, src, name)
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    // dimensions: copy as-is (at real scale these grow far slower than facts)
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(n => write(t(n), n))

    // GRAFT_SCALE_KEYS=1: also offset the per-entity GROUPING keys
    // (o_custkey, events.user_id) per replica, modeling a key population
    // that GROWS with the corpus instead of per-key histories growing
    // `factor`×. Default OFF: the preserved-domain form keeps dimension
    // join density and replica-0 byte-identity (fixed ANN probes), at the
    // documented cost that per-key window operators (window_funcs,
    // events_concurrency) scale superlinearly — n·log n per key — under
    // replication. With the knob ON those same plans scale linearly,
    // which is the honest 100 TB shape for a growing user base; FK-probe
    // audits (dq_audit) will see replica custkeys as orphans, which is a
    // realistic dirty-data profile, not an error.
    val scaleKeys = scaleKeysKnob
    def maybeOffset(df: DataFrame, r: Int, keyCol: String): DataFrame =
      if (scaleKeys) df.withColumn(keyCol, col(keyCol) + lit(r * KeyStride))
      else df

    val zipf = zipfKnob
    write(
      if (zipf)
        // per-key Zipf multiplicity over o_custkey: a hot customer's
        // whole order history replicates m(custkey)× (custkey domain
        // PRESERVED — the hot key IS the point); each copy gets a unique
        // orderkey. ri ≤ ~170·factor ⇒ offsets ≤ 1.7e12·stride-units,
        // far inside long range and the racetime pack budget.
        withZipfRi(t("orders"), col("o_custkey"), factor)
          .withColumn("o_orderkey", col("o_orderkey") + col("ri") * lit(KeyStride))
          .drop("ri")
      else replicate(t("orders"), factor) { (df, r) =>
        maybeOffset(
          df.withColumn("o_orderkey", col("o_orderkey") + lit(r * KeyStride)),
          r, "o_custkey")
      }, "orders")

    write(
      if (zipf)
        // lineitem follows its order's customer multiplicity in lockstep
        // (referential integrity holds in every copy): a generation-time
        // join recovers o_custkey; orphan lineitems hash a NULL key to
        // one deterministic tier and stay orphans in each copy.
        withZipfRi(
          t("lineitem").join(
            t("orders").select(col("o_orderkey").as("zok"),
              col("o_custkey").as("zck")),
            col("l_orderkey") === col("zok"), "left"),
          col("zck"), factor)
          .withColumn("l_orderkey", col("l_orderkey") + col("ri") * lit(KeyStride))
          .drop("ri", "zok", "zck")
      else replicate(t("lineitem"), factor) { (df, r) =>
        df.withColumn("l_orderkey", col("l_orderkey") + lit(r * KeyStride))
      }, "lineitem")

    // events: each replica shifts one source-span (31 days) later, so the
    // scaled log is a LONGER history at the SAME event rate — replicating
    // into one shared window would multiply time density by `factor`, and
    // any proximity semantics (band_join neighbor counts, session gaps)
    // would grow quadratically with replication instead of linearly with
    // data, which no real workload does
    val SpanNanos = 31L * 24 * 3600 * 1000000000L
    write(
      if (zipf)
        // hot users get m(user_id)× their history; copies cycle through
        // the SAME `factor` time spans as plain mode (pmod(ri, factor) —
        // an unbounded ri·span shift would overflow nanos), so a hot
        // user's per-window event density grows with its multiplicity,
        // which is exactly what "hot user" means to the session/
        // concurrency operators.
        withZipfRi(t("events"), col("user_id"), factor)
          .withColumn("event_id", col("event_id") + col("ri") * lit(KeyStride))
          .withColumn("ts", col("ts") + pmod(col("ri"), lit(factor.toLong)) * lit(SpanNanos))
          .drop("ri")
      else replicate(t("events"), factor) { (df, r) =>
        maybeOffset(
          df.withColumn("event_id", col("event_id") + lit(r * KeyStride))
            .withColumn("ts", col("ts") + lit(r * SpanNanos)),
          r, "user_id")
      }, "events")

    write(replicate(t("documents"), factor) { (df, r) =>
      df.withColumn("doc_id", col("doc_id") + lit(r * KeyStride))
        .withColumn("text", concat(col("text"), lit(s" replica$r")))
        .withColumn("n_chars", length(col("text")))
    }, "documents")

    val d = dims // single source of truth
    write(replicate(t("embeddings"), factor) { (df, r) =>
      val k = r % d
      // rotate the vector left by k — norm-preserving, bucket-scattering —
      // and REVERSE it for replicas ≥ dims: rotation alone aliases at
      // r = dims (replica 64 would be byte-identical to replica 0),
      // reversal doubles the distinct-transform budget to 2·dims replicas
      val rotated = concat(slice(col("embedding"), k + 1, d - k),
        slice(col("embedding"), 1, k))
      df.withColumn("vec_id", col("vec_id") + lit(r * KeyStride))
        .withColumn("embedding",
          if ((r / d) % 2 == 1) reverse(rotated) else rotated)
    }, "embeddings")
  }

  private val AllTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** The scaled corpus as a [[FixtureStore]] fixture — generated once per
    * (source data, ScaleUp class bytes, factor, GRAFT_SCALE_KEYS, dims)
    * and served across sessions and sandboxes, so ×100 anchors no longer
    * depend on a hand-regenerated unversioned `/tmp/scale100_*` dir.
    *
    * Stamping: the producer-code half is [[FixtureStore.classContentStamp]]
    * (this class' bytes), not the whole-jar hash — the corpus build runs
    * minutes and writes GBs, and rebuilding it on every unrelated
    * recompile would tax the whole round. The one real cross-file
    * dependency, `sources.Tables` (declared schemas + loaders), is
    * covered by an extra stamp line of ITS class bytes (round-16 advice
    * closed the former manual-delete trap).
    *
    * The generation session is built against the SOURCE dir and stopped
    * before returning; it never touches LshPlanes (see [[dims]]), so a
    * caller that builds its own session against the scaled dir afterwards
    * (Bench) still auto-sizes LSH geometry for the SCALED corpus.
    */
  def obtainScaled(srcDir: String, factor: Int): String =
    FixtureStore.obtain("scalecorpus", srcDir, AllTables, getClass,
      extra = Seq(s"factor:$factor", s"scaleKeys:$scaleKeysKnob",
        s"zipf:$zipfKnob", s"dims:$dims",
        // the one real cross-file dependency (round-16 advice): generate()
        // reads through sources.Tables' declared schemas/loaders, so a
        // Tables change alters corpus CONTENT — stamp its class bytes too,
        // keeping per-class granularity while closing the manual-delete
        // trap the scaladoc below used to document
        s"tables:${FixtureStore.classContentStamp(sources.Tables.getClass)}"),
      codeStampOverride = Some(FixtureStore.classContentStamp(getClass))) {
      tmp =>
        val s = GraftSession.build("graft-scaleup", Some(srcDir))
        try generate(s, srcDir, tmp, factor)
        finally s.stop()
    }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/scaleup")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark: SparkSession = GraftSession.build("graft-scaleup", Some(src))
    generate(spark, src, out, factor)
    println(s"""{"scaled":"$out","factor":$factor}""")
    spark.stop()
  }
}

package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Data-layout analytics: Z-order (Morton) multidimensional clustering and
  * the file-skipping statistics it buys. At 100 TB the dominant cost of
  * most queries is the scan, and the scan is only cheap if the layout lets
  * min/max file statistics prune; a single-column sort gives perfect
  * pruning on one predicate column and none on any other, while Z-order
  * interleaves the bits of several columns so EVERY interleaved column
  * gets a bounded min/max span per file. This module computes the layout
  * key and measures that bound, with the whole computation — normalization,
  * bit spread, bucket stats — as exact integer arithmetic replayed by the
  * DuckDB oracle.
  */
object Layout {

  /** 16→32-bit Morton spread steps: after the fold, bit i of the input
    * sits at bit 2i of the output. Shared by the Spark expression and the
    * generated oracle SQL — one constant table, two dialect renderings.
    */
  private val SpreadSteps: Seq[(Int, Long)] = Seq(
    (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))

  /** Renders the spread of expression `e`; `shl` renders a left-shift in
    * the target dialect (Spark `shiftleft(x, n)`, DuckDB `(x << n)`).
    */
  private def spread(e: String, shl: (String, Int) => String): String =
    SpreadSteps.foldLeft(e) { case (x, (n, m)) =>
      s"((($x) | ${shl(s"($x)", n)}) & $m)"
    }

  private def sparkShl(e: String, n: Int): String = s"shiftleft($e, $n)"
  private def duckShl(e: String, n: Int): String = s"($e << $n)"

  /** Morton key of two pre-normalized 16-bit values, per dialect. */
  private def morton(a: String, b: String, shl: (String, Int) => String): String =
    s"(${spread(a, shl)} | ${shl(spread(b, shl), 1)})"

  /** Fixed bucketing of the 32-bit Z space: top 6 bits → ≤ 64 buckets
    * regardless of corpus size (a bucket models one file's stats range).
    */
  private val BucketShift = 67108864L // 2^26

  /** Z-order layout statistics over lineitem's (l_partkey, l_suppkey):
    * normalize each key to 16 bits by exact integer scaling against its
    * max, interleave the bits into a 32-bit Morton key, bucket the key
    * space into ≤ 64 fixed ranges (the stand-in for "files" written by a
    * Z-ordered writer), and emit each bucket's row count plus its min/max
    * RECTANGLE in both source dimensions — with the span of each dimension
    * as exact parts-per-million of its domain. The spans are the point:
    * every bucket covers ≲ 1/8 of BOTH key domains (3 high bits of each
    * dimension land in the bucket id), which is precisely the property
    * that lets a predicate on EITHER column prune ~7/8 of the files,
    * where a one-dimensional sort prunes only its own column.
    *
    * Scale shape: everything before the final ≤ 64-row aggregation is
    * map-side arithmetic inside one codegen stage (the max-bounds frame is
    * a broadcast scalar); the writer this models is
    * `repartitionByRange(z)` + within-partition sort — no global sort, no
    * driver participation. LIMITATION (documented, not hidden): bits are
    * interleaved from key RANKS scaled uniformly, so heavily skewed key
    * distributions want quantile-based normalization (the histogram idiom
    * of [[Sampling]]'s winsorize) before the spread; uniform synthetic
    * keys make uniform scaling exact here.
    */
  val zorderStats: Q = {
    val dz = morton("px", "sx", duckShl)
    Q("zorder_stats",
      s"""WITH mx AS (SELECT max(l_partkey) AS pmax, max(l_suppkey) AS smax
         |  FROM lineitem),
         |b AS (SELECT l_partkey, l_suppkey,
         |    (l_partkey * 65536) // (pmax + 1) AS px,
         |    (l_suppkey * 65536) // (smax + 1) AS sx,
         |    pmax, smax
         |  FROM lineitem CROSS JOIN mx),
         |g AS (SELECT $dz // $BucketShift AS zbucket, count(*) AS n,
         |    min(l_partkey) AS p_lo, max(l_partkey) AS p_hi,
         |    min(l_suppkey) AS s_lo, max(l_suppkey) AS s_hi,
         |    max(pmax) AS pm, max(smax) AS sm
         |  FROM b GROUP BY 1)
         |SELECT zbucket, n, p_lo, p_hi, s_lo, s_hi,
         |  ((p_hi - p_lo + 1) * 1000000) // (pm + 1) AS p_span_ppm,
         |  ((s_hi - s_lo + 1) * 1000000) // (sm + 1) AS s_span_ppm
         |FROM g ORDER BY zbucket""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
      val mx = li.agg(max(col("l_partkey")).as("pmax"),
        max(col("l_suppkey")).as("smax"))
      li.crossJoin(broadcast(mx))
        .withColumn("px", expr("(l_partkey * 65536) div (pmax + 1)"))
        .withColumn("sx", expr("(l_suppkey * 65536) div (smax + 1)"))
        .withColumn("zbucket",
          expr(s"${morton("px", "sx", sparkShl)} div $BucketShift"))
        .groupBy(col("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_partkey")).as("p_lo"), max(col("l_partkey")).as("p_hi"),
          min(col("l_suppkey")).as("s_lo"), max(col("l_suppkey")).as("s_hi"),
          max(col("pmax")).as("pm"), max(col("smax")).as("sm"))
        .select(col("zbucket"), col("n"),
          col("p_lo"), col("p_hi"), col("s_lo"), col("s_hi"),
          expr("((p_hi - p_lo + 1) * 1000000) div (pm + 1)").as("p_span_ppm"),
          expr("((s_hi - s_lo + 1) * 1000000) div (sm + 1)").as("s_span_ppm"))
        .orderBy(col("zbucket"))
    }
  }

  private val DayNanos = 86400L * 1000000000L

  /** Compaction planning — the OPTIMIZE half of the small-files problem
    * [[graft.sources.Ingest]]'s spec-gated compactor executes: treat each
    * (event_type, day) partition of `events` as one written file, estimate
    * its serialized size from exact per-row arithmetic (32 fixed bytes +
    * the two variable-width columns), and assign partitions to target-size
    * compaction bins by the standard cumulative-bytes división: within a
    * type, days pack in order and `bin = cum_bytes_before div 16 KiB`.
    * In-order packing (not best-fit) is deliberate: it preserves day
    * locality inside each output file, so time-range predicates still
    * prune after compaction — the property a size-sorted packer destroys.
    *
    * Scale shape: the only data-sized work is one scan collapsing
    * map-side to the (type × day) partition-stats frame; the planning
    * window walks that frame partitioned by type with a day-domain-bounded
    * frame — at 100 TB the plan costs |partitions|, never rows. This is
    * exactly the metadata-only economics of a real table format's
    * OPTIMIZE planner: it reads file statistics, not files.
    */
  val compactPlan: Q = Q("compact_plan",
    s"""WITH p AS (SELECT event_type,
      |    (epoch_ns(ts) - ((epoch_ns(ts) % $DayNanos + $DayNanos) % $DayNanos)) // $DayNanos AS day,
      |    count(*) AS n_rows,
      |    CAST(sum(32 + length(event_type) + length(props)) AS BIGINT) AS est_bytes
      |  FROM events GROUP BY 1, 2),
      |w AS (SELECT event_type, day, n_rows, est_bytes,
      |    coalesce(sum(est_bytes) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      |  FROM p)
      |SELECT event_type, CAST(day AS BIGINT) AS day,
      |  CAST(n_rows AS BIGINT) AS n_rows, est_bytes,
      |  CAST(cb // 16384 AS BIGINT) AS bin
      |FROM w ORDER BY event_type, day""".stripMargin) { (s, dir) =>
    val p = Tables.load(s, dir, "events")
      .select(col("event_type"),
        expr(s"(ts - pmod(ts, ${DayNanos}L)) div ${DayNanos}L").as("day"),
        (lit(32L) + length(col("event_type")) + length(col("props"))).as("rb"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_rows"), sum(col("rb")).as("est_bytes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    p.withColumn("cb", coalesce(sum(col("est_bytes")).over(w), lit(0L)))
      .select(col("event_type"), col("day"), col("n_rows"), col("est_bytes"),
        expr("cb div 16384").as("bin"))
      .orderBy(col("event_type"), col("day"))
  }

  val all: Seq[Q] = Seq(zorderStats, compactPlan)
}

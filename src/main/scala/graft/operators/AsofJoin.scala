package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the canonical operator Spark's built-in
  * join set lacks (SURVEY-adjacent extension; the brief's "compose existing
  * ops if semantics allow" case). For every event, find the user's most
  * recent order at or before the event time.
  *
  * Spark-first formulation: tag both sides, UNION them, and run ONE
  * running-`last` window per key ordered by time — each event row picks up
  * the latest order seen so far in its partition. Cost: a single shuffle
  * on the join key + a per-partition sort, i.e. exactly a sort-merge
  * join's exchange — no range-join explosion, no per-row subquery. This
  * is the standard distributed as-of layout (same shape Flink/kdb use).
  *
  * The DuckDB oracle is the engine's native `ASOF LEFT JOIN` — an
  * independent implementation of the same semantics. The matched ORDER
  * DATE (not orderkey) is emitted so ties among same-timestamp orders
  * can't make the comparison nondeterministic.
  */
object AsofJoin {

  /** One oracle for BOTH as-of formulations (composed window and native
    * exec): DuckDB's own ASOF LEFT JOIN — a third independent
    * implementation of the semantics gating the other two.
    */
  private val asofOracle: String =
    """SELECT e.event_id, e.user_id,
      |  strftime(o.o_orderdate, '%Y-%m-%d') AS matched_odate
      |FROM events e ASOF LEFT JOIN orders o
      |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  val asof: Q = Q("asof_join", asofOracle) { (s, dir) =>
    // common clock: microseconds since epoch (events carry int64 nanos —
    // floor-divide via pmod so pre-1970 values round toward -inf)
    val orders = Tables.load(s, dir, "orders").select(
      col("o_custkey").as("key"),
      unix_micros(col("o_orderdate")).as("t"),
      lit(1).as("is_order"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
      lit(null).cast("long").as("event_id"))
      .filter(col("key").isNotNull)
    val events = Tables.load(s, dir, "events").select(
      col("user_id").as("key"),
      Tables.nanosToMicros("ts").as("t"),
      lit(0).as("is_order"),
      lit(null).cast("string").as("odate"),
      col("event_id"))
      // NULL keys: the window would group them into one partition and
      // match them against NULL-key orders, but the equi-join oracle never
      // matches NULL = NULL — drop them like the join does
      .filter(col("key").isNotNull)
    // at equal t the order sorts FIRST (is_order desc) so `>=` semantics
    // hold; within equal (t, is_order) the window then sees the latest
    // odate-tagged row, but all such rows share the same date → the emitted
    // value is deterministic
    val w = Window.partitionBy(col("key"))
      .orderBy(col("t"), col("is_order").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.unionByName(events)
      .withColumn("matched_odate",
        last(when(col("is_order") === 1, col("odate")), ignoreNulls = true).over(w))
      .filter(col("is_order") === 0)
      .select(col("event_id"), col("key").as("user_id"), col("matched_odate"))
      .orderBy(col("event_id"))
  }

  /** The SAME as-of semantics through the engine's native whole-operator
    * extension ([[graft.plans.AsofJoinNode]] → strategy → merge exec, the
    * brief's option (c)) instead of the composed union+window: one
    * declared key-clustered (key, time)-sorted requirement per side, one
    * streaming merge pass per partition, constant state. Gated by the
    * identical DuckDB ASOF JOIN oracle as [[asof]] — three independent
    * implementations of one semantics must agree bit-for-bit at every SF.
    * Plan shape (exchanges placed by EnsureRequirements, AsofJoinExec in
    * the executed plan) is asserted in NativeAsofJoinSpec.
    */
  val asofNative: Q = Q("asof_native", asofOracle) { (s, dir) =>
    val orders = Tables.load(s, dir, "orders").select(
      col("o_custkey").as("okey"),
      unix_micros(col("o_orderdate")).as("ot"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))
      .filter(col("okey").isNotNull)
    val events = Tables.load(s, dir, "events").select(
      col("event_id"),
      col("user_id").as("key"),
      Tables.nanosToMicros("ts").as("t"))
      .filter(col("key").isNotNull)
    graft.plans.AsofJoinNode
      .asofJoin(events, "key", "t", orders, "okey", "ot", "odate", "matched_odate")
      .select(col("event_id"), col("key").as("user_id"), col("matched_odate"))
      .orderBy(col("event_id"))
  }

  /** Key + range join: per order, how many of the customer's events landed
    * in the 24h after the order. Catalyst plans the equality on the key as
    * the join (hash/sort-merge) and the time bounds as a residual filter —
    * the scalable shape for range predicates WITH an equi-key. (A pure
    * interval-overlap join with no key would need bucketing-by-time-chunk;
    * the events side here is pre-bounded the same way.)
    */
  val rangeJoin: Q = Q("range_join",
    """SELECT o.o_orderkey, count(e.event_id) AS n_events_24h
      |FROM orders o LEFT JOIN events e
      |  ON e.user_id = o.o_custkey
      |  AND e.ts >= o.o_orderdate
      |  AND e.ts < o.o_orderdate + INTERVAL 24 HOURS
      |GROUP BY o.o_orderkey ORDER BY o.o_orderkey""".stripMargin) { (s, dir) =>
    val orders = Tables.load(s, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      unix_micros(col("o_orderdate")).as("t0"))
    val events = Tables.load(s, dir, "events").select(
      col("user_id"), col("event_id"),
      Tables.nanosToMicros("ts").as("et"))
    orders.join(events,
        col("user_id") === col("o_custkey") &&
          col("et") >= col("t0") && col("et") < col("t0") + 86400L * 1000000L,
        "left")
      .groupBy(col("o_orderkey"))
      .agg(count(col("event_id")).as("n_events_24h"))
      .orderBy(col("o_orderkey"))
  }

  private val BandSeconds = 600L
  private val BandMicros = BandSeconds * 1000000L

  /** Exposed for SlidingCountSpec's native-vs-composed parity replay. */
  def BandMicrosForSpec: Long = BandMicros

  /** Banded (bucketed) interval join — the scale path for a time-proximity
    * join with NO equi-key: for every event, count the other events within
    * ±10 minutes. Naively this is a pure inequality join, which Spark can
    * only plan as a nested-loop over the full cross product (O(n²) at any
    * cluster size). The composed-operator rewrite quantizes time into
    * fixed ±window-width bands: each probe row explodes to its ≤3
    * overlapping band ids (map-side, slim rows), the build side keys on
    * its single band, and the band equi-join + residual |Δt| ≤ W filter
    * recovers exactly the interval semantics — a true pair shares exactly
    * one build-side band, so no dedup pass is needed. Shuffle budget: one
    * hash exchange on band id carrying ~3n slim rows; per-band work is
    * (band population)², bounded by time density × W, never n². This is
    * the standard bin-packed range-join optimization, here as a
    * composition of explode + equi-join (the brief's "compose existing
    * ops" preference) rather than a custom strategy.
    */
  val bandJoin: Q = Q("band_join",
    s"""WITH near AS (
       |  SELECT a.event_id AS id, count(*) AS n_near
       |  FROM events a JOIN events b
       |    ON b.ts BETWEEN a.ts - INTERVAL $BandSeconds SECOND
       |                AND a.ts + INTERVAL $BandSeconds SECOND
       |   AND b.event_id != a.event_id
       |  GROUP BY a.event_id)
       |SELECT e.event_id, coalesce(n.n_near, 0) AS n_near
       |FROM events e LEFT JOIN near n ON n.id = e.event_id
       |ORDER BY e.event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
      .select(col("event_id"), Tables.nanosToMicros("ts").as("t"))
    // the native whole-operator path ([[graft.plans.SlidingCountExec]]):
    // ONE range exchange of un-amplified rows + a per-partition two-pointer
    // sliding window + fringe-resolved cross-partition pairs — retiring the
    // composed band rewrite's ×3 probe amplification and its residual
    // filter over every band-mate. The composed form remains available for
    // arbitrary joins via [[graft.plans.BandedIntervalJoin]], and
    // NativeSlidingCountSpec asserts native ≡ composed on real data.
    graft.plans.SlidingCountNode
      .slidingCount(ev, "event_id", "t", BandMicros, "n_near")
      .orderBy(col("event_id"))
  }

  /** SCD type-2 history build — run-length compression of a per-key state
    * stream into versioned validity intervals: for each user, consecutive
    * events with the SAME `event_type` collapse into one row carrying
    * `[effective_from, effective_to)` and a version number; the last
    * version stays open (NULL `effective_to`). This is the change-data-
    * capture → dimension-history operator every warehouse pipeline needs
    * and the temporal complement of [[asof]] (an as-of probe into the
    * produced intervals returns exactly the state current at probe time).
    *
    * Shape: two window passes — change detection (`lag`) and interval
    * stitching (`lead` + `row_number`) — over the SAME (user_id → tus,
    * event_id) partitioning and ordering, with a filter between them; the
    * plan pays ONE exchange + sort for the whole query, the filter and
    * second window run on the already-sorted stream. Ordering ties are
    * impossible (event_id is unique), so every window function is
    * deterministic. Time arithmetic is the shared exact nanos→µs floor
    * ([[Tables.nanosToMicros]] ≡ DuckDB's TIMESTAMP(NANOS)→µs coercion).
    * At 100 TB the cost is exactly a sort-merge regrouping by user — no
    * self-join, no per-version scan; a 1000-executor run shuffles each
    * user's events once and emits the compressed history map-side.
    */
  val scd2: Q = Q("scd2_history",
    """WITH d AS (SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
      |  FROM events),
      |c AS (SELECT user_id, tus, event_id, event_type,
      |    CASE WHEN lag(event_type) OVER w IS NULL
      |           OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0
      |    END AS chg
      |  FROM d WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
      |k AS (SELECT user_id, tus, event_id, event_type FROM c WHERE chg = 1)
      |SELECT user_id,
      |  CAST(row_number() OVER w AS BIGINT) AS version,
      |  event_type AS state, tus AS effective_from,
      |  lead(tus) OVER w AS effective_to
      |FROM k WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
      |ORDER BY user_id, version""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val prev = lag(col("event_type"), 1).over(w)
    Tables.load(s, dir, "events")
      .select(col("user_id"), Tables.nanosToMicros("ts").as("tus"),
        col("event_id"), col("event_type"))
      .withColumn("chg",
        when(prev.isNull || prev =!= col("event_type"), 1).otherwise(0))
      .where(col("chg") === 1)
      .select(col("user_id"),
        row_number().over(w).cast("long").as("version"),
        col("event_type").as("state"),
        col("tus").as("effective_from"),
        lead(col("tus"), 1).over(w).as("effective_to"))
      .orderBy(col("user_id"), col("version"))
  }

  val all: Seq[Q] = Seq(asof, asofNative, rangeJoin, bandJoin, scd2)
}

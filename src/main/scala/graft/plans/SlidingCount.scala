package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, AttributeSet, BindReferences,
  Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  Distribution, OrderedDistribution, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The engine's SECOND whole-operator Catalyst extension (after
  * [[AsofJoinNode]]): a native time-proximity self-count.
  *
  * `band_join`'s semantics — for every row, how many OTHER rows have a
  * time within ±`window` — is a keyless proximity self-join. The composed
  * form ([[BandedIntervalJoin]]'s rewrite, kept as the general-join path)
  * explodes ≤3 band keys per probe row and hash-joins: the probe side is
  * ×3-amplified through the exchange and every band-mate pays the
  * residual filter. This node is the shape a native engine would pick:
  *
  *   - ONE range exchange of the un-amplified rows (declared as
  *     [[OrderedDistribution]] on the time column, so EnsureRequirements
  *     places the same RangePartitioning exchange a global sort gets, and
  *     AQE re-validates it after coalescing);
  *   - a per-partition two-pointer sliding window over the sorted times —
  *     O(n) amortized, zero residual evaluations;
  *   - cross-partition pairs resolved through partition FRINGES (the rows
  *     within `window` of each partition's min/max time): range
  *     partitioning orders partitions, so any pair straddling partitions
  *     p < q has its left row in p's tail fringe and its right row in q's
  *     head fringe (t_a ≥ minT_q − W ≥ maxT_p − W and
  *     t_b ≤ maxT_p + W ≤ minT_q + W). Fringe volume is the row density
  *     of a 2W span per boundary — corpus-size-invariant for a fixed
  *     window over a growing time span, but SUMMED over boundaries it
  *     grows with the partition count, so the fringe pairs are counted
  *     through a keyed shuffle on ⌊t/W⌋ buckets (each bucket group is two
  *     O(n) sliding passes — never a pairwise loop, never a driver-side
  *     data structure beyond the per-id totals), and only the aggregated
  *     per-id extras are collected and broadcast back. A fringe set past
  *     `GRAFT_SLIDING_FRINGE_MAX` (default 5·10⁶ — partitions narrower
  *     than 2W make everything fringe) fails fast toward the composed
  *     banded-join path instead of degrading silently.
  *
  * Output: one (id, n_near) row per input row (rows with NULL time or id
  * match nothing — SQL comparison semantics — and emit 0), so the
  * composed form's count-aggregate + left-join-back collapses into the
  * operator.
  */
case class SlidingCountNode(
    child: LogicalPlan,
    id: Expression,
    time: Expression,
    window: Long,
    idOut: AttributeReference,
    countOut: AttributeReference)
  extends UnaryNode {

  override def output: Seq[Attribute] = Seq(idOut, countOut)
  override def producedAttributes: AttributeSet = AttributeSet(output)

  override protected def withNewChildInternal(newChild: LogicalPlan): SlidingCountNode =
    copy(child = newChild)
}

object SlidingCountNode {

  /** `slidingCount(df, "event_id", "t", W, "n_near")`: one row per input
    * row with the count of OTHER rows whose `timeCol` lies within ±W.
    * Long id and time columns only (the band domain — timestamps convert
    * to epoch micros upstream, as the composed form already requires).
    *
    * Contract: ids must be UNIQUE across rows (the registered query's
    * event_id is a key) — the fringe extras accumulate per id, so two
    * rows sharing an id would each read the id's combined cross-partition
    * total. The composed aggregate+join form merges duplicate ids the
    * same way, but row-local window counts would not. PARTIALLY ENFORCED
    * by a fail-fast duplicate-id check inside the exec's fringe
    * aggregation — it rides an aggregation pass the exec already needs
    * and catches the common case (a duplicate pair with both rows on
    * fringes); a full-corpus uniqueness scan stays the caller's job.
    */
  def slidingCount(df: DataFrame, idCol: String, timeCol: String,
      window: Long, as: String): DataFrame = {
    require(window > 0, s"slidingCount: window must be positive, got $window")
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"slidingCount: no column '$n' in [${plan.output.map(_.name).mkString(", ")}]"))
    val idA = attr(idCol)
    val tA = attr(timeCol)
    require(idA.dataType == LongType && tA.dataType == LongType,
      s"slidingCount: id/time must be BIGINT, got ${idA.dataType}/${tA.dataType}")
    val node = SlidingCountNode(plan, idA, tA, window,
      AttributeReference(idCol, LongType, idA.nullable)(),
      AttributeReference(as, LongType, nullable = false)())
    org.apache.spark.sql.graft.GraftInternal.ofRows(df.sparkSession, node)
  }
}

/** Plans [[SlidingCountNode]] as [[SlidingCountExec]]; injected
  * session-wide by [[GraftSparkExtensions]]. */
object SlidingCountStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: SlidingCountNode =>
      SlidingCountExec(planLater(n.child), n.id, n.time, n.window,
        n.idOut, n.countOut) :: Nil
    case _ => Nil
  }
}

case class SlidingCountExec(
    child: SparkPlan,
    idExpr: Expression,
    timeExpr: Expression,
    window: Long,
    idOut: AttributeReference,
    countOut: AttributeReference)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = Seq(idOut, countOut)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(OrderedDistribution(Seq(SortOrder(timeExpr, Ascending))))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(timeExpr, Ascending)))

  // output attrs are minted here — the child's partitioning expressions
  // are not visible in this operator's output
  override def outputPartitioning: Partitioning =
    UnknownPartitioning(child.outputPartitioning.numPartitions)

  override protected def withNewChildInternal(newChild: SparkPlan): SlidingCountExec =
    copy(child = newChild)

  /** Safe "t2 − t1 ∈ [0, W]" for sorted t1 ≤ t2: the subtraction can only
    * wrap when the true difference exceeds Long.MaxValue ≥ W, so a wrapped
    * (negative) result correctly fails the `d >= 0` guard. */
  @inline private def within(t1: Long, t2: Long): Boolean = {
    val d = t2 - t1
    d >= 0 && d <= window
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val idB = BindReferences.bindReference(idExpr, child.output)
    val tB = BindReferences.bindReference(timeExpr, child.output)
    val w = window
    val rdd = child.execute()
    // --- job 1: extract per-partition fringes (rows within W of the
    // partition's own min/max time) as a DISTRIBUTED (t, id, pid) row
    // set. Bounded by the window's row density per boundary, not the
    // corpus — but the TOTAL grows with partition count (and a partition
    // narrower than 2W is ALL fringe), so nothing data-sized may reach
    // the driver: cross-partition pairs are counted through a keyed
    // shuffle below, and the driver only ever holds the per-id totals.
    val fringeRows: RDD[(Long, Long, Int)] =
      rdd.mapPartitionsWithIndex { (pi, it) =>
        val headT = scala.collection.mutable.ArrayBuffer.empty[Long]
        val headI = scala.collection.mutable.ArrayBuffer.empty[Long]
        val tail = scala.collection.mutable.ArrayDeque.empty[(Long, Long, Long)]
        var firstT = 0L
        var started = false
        var idx = 0L
        while (it.hasNext) {
          val r = it.next()
          val tv = tB.eval(r)
          val iv = idB.eval(r)
          if (tv != null && iv != null) {
            val t = tv.asInstanceOf[Long]
            val i = iv.asInstanceOf[Long]
            if (!started) { firstT = t; started = true }
            if (within(firstT, t)) { headT += t; headI += i }
            tail.append((t, i, idx))
            while (tail.nonEmpty && !within(tail.head._1, t)) tail.removeHead()
            idx += 1L
          }
        }
        if (!started) Iterator.empty
        else {
          // head and tail may overlap when the partition spans < 2W —
          // emit each fringe ROW once, deduping by POSITION (the head is
          // the sorted prefix, so a tail row repeats a head row iff its
          // row index is below the head length; an id-based dedup would
          // silently drop a contract-violating duplicate id and mask the
          // guard below)
          val headLen = headT.length.toLong
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
          headT.indices.foreach(k => out += ((headT(k), headI(k), pi)))
          tail.foreach { case (t, i, k) =>
            if (k >= headLen) out += ((t, i, pi))
          }
          out.iterator
        }
      }
    fringeRows.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // One aggregation pass gives the volume diagnostic AND enforces the
    // unique-id contract (header scaladoc): a duplicate id would silently
    // apply another row's cross-partition total to every row sharing it,
    // so fail fast instead.
    val (nFringe, nDupIds) = fringeRows.map(r => (r._2, 1L))
      .reduceByKey(_ + _)
      .map { case (_, c) => (c, if (c > 1L) 1L else 0L) }
      .fold((0L, 0L))((a, b) => (a._1 + b._1, a._2 + b._2))
    require(nDupIds == 0L,
      s"SlidingCountExec: $nDupIds duplicate id value(s) among fringe rows — " +
        "slidingCount requires globally unique ids (see SlidingCountNode.slidingCount)")
    // Guard the only remaining driver-sized artifact (the per-id extras
    // map, ≤ one entry per fringe row): past the cap the caller should
    // use the composed BandedIntervalJoin path, whose state is fully
    // distributed. The cap binds when partitions are narrower than 2W
    // (everything is fringe) — a degenerate partitioning for this
    // operator, not a data regime it should absorb silently.
    // conf-first so the fail-fast path is test-exercisable (the JVM can't
    // mutate its own env); GRAFT_SLIDING_FRINGE_MAX stays the ops surface
    val maxFringe = graft.Knobs.confInt(
      k => if (conf.contains(k)) Some(conf.getConfString(k)) else None,
      "graft.sliding.fringeMax",
      "GRAFT_SLIDING_FRINGE_MAX", 5000000, 1000, Int.MaxValue).toLong
    logInfo(s"SlidingCountExec: $nFringe fringe rows " +
      s"(window=$w, ${rdd.getNumPartitions} partitions)")
    require(nFringe <= maxFringe,
      s"SlidingCountExec: $nFringe fringe rows exceed GRAFT_SLIDING_FRINGE_MAX=" +
        s"$maxFringe (conf graft.sliding.fringeMax) — partitions are likely " +
        "narrower than 2·window; use the composed banded-join path or raise the cap")
    // --- job 2: count cross-partition pairs DISTRIBUTED, keyed on the
    // W-wide time bucket g = ⌊t/W⌋. A within-W pair spans same or
    // adjacent buckets, so bucket g's group (its own rows plus bucket
    // g+1's, shipped once as "neighbor" copies) sees every pair whose
    // EARLIER row lives in g — counting only pairs whose earlier row is
    // a home row counts each pair exactly once. Within a group, two
    // O(n) sliding-window passes with per-pid counters credit both
    // endpoints (forward: each row k gets its earlier home partners of a
    // different pid; backward: each HOME row k gets its later partners
    // of a different pid) — no pairwise loop anywhere.
    val extrasLocal = new scala.collection.mutable.HashMap[Long, Long]()
    if (nFringe > 0L) {
      val counted = fringeRows.flatMap { case (t, id, pid) =>
        val g = Math.floorDiv(t, w)
        Iterator((g, (t, id, pid, true)), (g - 1L, (t, id, pid, false)))
      }.groupByKey().flatMap { case (_, rowsIt) =>
        val rows = rowsIt.toArray.sortBy(r => (r._1, r._2))
        val out = new java.util.HashMap[Long, Long]()
        val n = rows.length
        // forward: window of earlier rows within W; count home rows per pid
        var cntHome = 0L
        val homePid = new java.util.HashMap[Int, Long]()
        var lo = 0
        var k = 0
        while (k < n) {
          val (tk, idk, pidk, _) = rows(k)
          while (lo < k && tk - rows(lo)._1 > w) {
            if (rows(lo)._4) {
              cntHome -= 1L
              homePid.merge(rows(lo)._3, -1L, java.lang.Long.sum(_, _))
            }
            lo += 1
          }
          val partners = cntHome - homePid.getOrDefault(pidk, 0L)
          if (partners > 0L) out.merge(idk, partners, java.lang.Long.sum(_, _))
          if (rows(k)._4) {
            cntHome += 1L
            homePid.merge(pidk, 1L, java.lang.Long.sum(_, _))
          }
          k += 1
        }
        // backward: window of later rows within W; only HOME rows collect
        var cntAll = 0L
        val allPid = new java.util.HashMap[Int, Long]()
        var hi = n - 1
        k = n - 1
        while (k >= 0) {
          val (tk, idk, pidk, home) = rows(k)
          while (hi > k && rows(hi)._1 - tk > w) {
            cntAll -= 1L
            allPid.merge(rows(hi)._3, -1L, java.lang.Long.sum(_, _))
            hi -= 1
          }
          if (home) {
            val partners = cntAll - allPid.getOrDefault(pidk, 0L)
            if (partners > 0L) out.merge(idk, partners, java.lang.Long.sum(_, _))
          }
          cntAll += 1L
          allPid.merge(pidk, 1L, java.lang.Long.sum(_, _))
          k -= 1
        }
        val b = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        out.forEach((id, c) => b += ((id, c)))
        b.iterator
      }.reduceByKey(_ + _).collect()
      counted.foreach { case (id, c) => extrasLocal.update(id, c) }
    }
    fringeRows.unpersist(blocking = false)
    val extrasB = sparkContext.broadcast(extrasLocal)
    val outSchema = StructType(Seq(
      StructField(idOut.name, LongType, idOut.nullable),
      StructField(countOut.name, LongType, nullable = false)))
    // --- job 2: per-partition two-pointer sliding count + fringe extras
    rdd.mapPartitions { it =>
      val tArr = scala.collection.mutable.ArrayBuilder.make[Long]
      val iArr = scala.collection.mutable.ArrayBuilder.make[Long]
      // NULL time or id rows match nothing; emitted with count 0 at the end
      val nullIds = scala.collection.mutable.ArrayBuffer.empty[Any]
      it.foreach { r =>
        val tv = tB.eval(r)
        val iv = idB.eval(r)
        if (tv != null && iv != null) {
          tArr += tv.asInstanceOf[Long]
          iArr += iv.asInstanceOf[Long]
        } else nullIds += (if (iv == null) null else iv)
      }
      val ts = tArr.result()
      val is = iArr.result()
      val ex = extrasB.value
      val proj = UnsafeProjection.create(outSchema)
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
      var lo = 0
      var hi = 0
      val n = ts.length
      val main = (0 until n).iterator.map { k =>
        while (!within(ts(lo), ts(k))) lo += 1
        if (hi < k) hi = k
        while (hi + 1 < n && within(ts(k), ts(hi + 1))) hi += 1
        row.update(0, is(k))
        row.update(1, (hi - lo).toLong + ex.getOrElse(is(k), 0L))
        proj(row)
      }
      val nulls = nullIds.iterator.map { iv =>
        row.update(0, iv)
        row.update(1, 0L)
        proj(row)
      }
      main ++ nulls
    }
  }
}

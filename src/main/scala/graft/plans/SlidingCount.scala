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
  *     window over a growing time span — collected once and matched
  *     driver-side, broadcast back as per-id extras.
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
    * same way, but row-local window counts would not.
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
    // --- job 1: collect per-partition fringes (rows within W of the
    // partition's own min/max time). Bounded by the window's row density,
    // not the corpus. Runs on the same shuffle output job 2 reads.
    val fringes: Array[(Int, Array[Long], Array[Long])] =
      rdd.mapPartitionsWithIndex { (pi, it) =>
        val headT = scala.collection.mutable.ArrayBuffer.empty[Long]
        val headI = scala.collection.mutable.ArrayBuffer.empty[Long]
        val tail = scala.collection.mutable.ArrayDeque.empty[(Long, Long)]
        var firstT = 0L
        var started = false
        while (it.hasNext) {
          val r = it.next()
          val tv = tB.eval(r)
          val iv = idB.eval(r)
          if (tv != null && iv != null) {
            val t = tv.asInstanceOf[Long]
            val i = iv.asInstanceOf[Long]
            if (!started) { firstT = t; started = true }
            if (within(firstT, t)) { headT += t; headI += i }
            tail.append((t, i))
            while (tail.nonEmpty && !within(tail.head._1, t)) tail.removeHead()
          }
        }
        if (!started) Iterator.empty
        else {
          // head and tail may overlap when the partition spans < 2W; the
          // driver dedups by id (ids need not be unique globally for the
          // local pass, but fringe rows are keyed (pid, t, id) — exact)
          val seen = new java.util.HashSet[Long]()
          headI.foreach(seen.add)
          val extraT = scala.collection.mutable.ArrayBuffer.empty[Long]
          val extraI = scala.collection.mutable.ArrayBuffer.empty[Long]
          tail.foreach { case (t, i) =>
            if (!seen.contains(i)) { extraT += t; extraI += i }
          }
          Iterator.single((pi,
            (headT ++ extraT).toArray, (headI ++ extraI).toArray))
        }
      }.collect()
    // --- driver: count cross-partition pairs over the (tiny) fringe set
    val extras = new java.util.HashMap[Long, Long]()
    if (fringes.nonEmpty) {
      val all = fringes.flatMap { case (pi, ts, is) =>
        ts.indices.map(k => (ts(k), is(k), pi))
      }.sortBy(r => (r._1, r._2))
      var lo = 0
      var i = 0
      while (i < all.length) {
        val (ti, _, pidI) = all(i)
        while (!within(all(lo)._1, ti)) lo += 1
        var j = lo
        while (j < i) {
          if (all(j)._3 != pidI) {
            extras.merge(all(i)._2, 1L, java.lang.Long.sum(_, _))
            extras.merge(all(j)._2, 1L, java.lang.Long.sum(_, _))
          }
          j += 1
        }
        i += 1
      }
    }
    val extrasB = sparkContext.broadcast {
      val m = new scala.collection.mutable.HashMap[Long, Long]()
      extras.forEach((k, v) => m.update(k, v))
      m
    }
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

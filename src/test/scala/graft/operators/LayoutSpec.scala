package graft.operators

import graft.SparkSpec

/** Z-order layout statistics: scalar Morton replay plus the locality bound
  * that IS the operator's reason to exist — every bucket must cover a
  * bounded fraction of BOTH interleaved dimensions (the property min/max
  * file skipping exploits), which no single-column sort provides.
  */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  private val dir = sf("sf0.001")

  private def spread16(x0: Long): Long = {
    var x = x0
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  test("zorder_stats matches a scalar Morton replay and bounds both spans") {
    val rows = graft.sources.Tables.load(spark, dir, "lineitem")
      .select($"l_partkey", $"l_suppkey").as[(Long, Long)].collect()
    val pmax = rows.map(_._1).max
    val smax = rows.map(_._2).max
    val byBucket = rows.groupBy { case (p, sKey) =>
      val px = p * 65536L / (pmax + 1)
      val sx = sKey * 65536L / (smax + 1)
      (spread16(px) | (spread16(sx) << 1)) / 67108864L
    }
    val expect = byBucket.toSeq.map { case (zb, rs) =>
      val (pLo, pHi) = (rs.map(_._1).min, rs.map(_._1).max)
      val (sLo, sHi) = (rs.map(_._2).min, rs.map(_._2).max)
      (zb, rs.size.toLong, pLo, pHi, sLo, sHi,
        (pHi - pLo + 1) * 1000000L / (pmax + 1),
        (sHi - sLo + 1) * 1000000L / (smax + 1))
    }.sortBy(_._1)

    val got = Layout.zorderStats.run(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)

    // the skipping property: ≤ 64 buckets, each covering ≲ 1/8 of BOTH
    // domains (3 high bits of each dimension are pinned by the bucket id).
    // Discreteness slack: a span of k consecutive VALUES can't be narrower
    // than one value, so the bound is 1/8 of the domain plus one value's
    // width in ppm (dominant when the domain is tiny, e.g. ~10 suppliers
    // at sf0.001).
    val pBound = 125000L + 1000000L / (pmax + 1) + 1
    val sBound = 125000L + 1000000L / (smax + 1) + 1
    assert(got.size <= 64)
    assert(got.map(_._2).sum === rows.length.toLong)
    got.foreach { case (zb, _, _, _, _, _, pSpan, sSpan) =>
      assert(pSpan <= pBound, s"bucket $zb p-span $pSpan ppm (bound $pBound)")
      assert(sSpan <= sBound, s"bucket $zb s-span $sSpan ppm (bound $sBound)")
    }
  }

  test("compact_plan matches a scalar packing replay and packs bins full") {
    val dayNanos = 86400L * 1000000000L
    val rows = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", $"ts", $"props").as[(String, Long, String)]
      .collect()
    // scalar replay: per-partition stats, in-day-order cumulative binning
    val parts = rows
      .groupBy { case (t, ts, _) => (t, Math.floorDiv(ts, dayNanos)) }
      .toSeq.map { case ((t, d), rs) =>
        (t, d, rs.size.toLong,
          rs.map { case (ty, _, pr) => 32L + ty.length + pr.length }.sum)
      }
    val expect = parts.groupBy(_._1).toSeq.flatMap { case (_, ps) =>
      val inOrder = ps.sortBy(_._2)
      val cum = inOrder.scanLeft(0L)(_ + _._4)
      inOrder.zip(cum).map { case ((t, d, n, b), cb) => (t, d, n, b, cb / 16384L) }
    }.sortBy(p => (p._1, p._2))

    val got = Layout.compactPlan.run(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)

    // packing invariant: if a later bin exists for a type, everything in
    // bins ≤ k sums to at least (k+1)·16 KiB — bins close only when full
    got.groupBy(_._1).foreach { case (t, ps) =>
      val bins = ps.map(_._5).distinct.sorted
      assert(ps.sortBy(_._2).map(_._5).toSeq ===
        ps.map(_._5).toSeq.sorted, s"$t: bins non-decreasing in day order")
      bins.dropRight(1).foreach { k =>
        val through = ps.filter(_._5 <= k).map(_._4).sum
        assert(through >= (k + 1) * 16384L,
          s"$t: bins <= $k hold $through bytes, expected >= ${(k + 1) * 16384L}")
      }
    }
  }
}

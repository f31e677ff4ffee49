package graft.operators

import graft.SparkSpec

/** Scalar replay of the data-quality audit: recompute every declared
  * constraint driver-side with plain Scala collections and demand exact
  * agreement — including the one check that is NONZERO on this corpus
  * (the composite lineitem key is genuinely non-unique in the testdata),
  * so the suite proves the audit counts real violations rather than
  * echoing zeros.
  */
class DataQualitySpec extends SparkSpec {

  import spark.implicits._

  private val dir = sf("sf0.001")

  test("dq_audit matches a scalar replay of every declared constraint") {
    def tbl(n: String) = graft.sources.Tables.load(spark, dir, n)
    val li = tbl("lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
        $"l_quantity".cast("double"))
      .as[(Long, Long, Long, Long, Double)].collect()
    val orders = tbl("orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice".cast("double"))
      .as[(Long, Long, Double)].collect()
    val custs = tbl("customer").select($"c_custkey", $"c_nationkey")
      .as[(Long, Int)].collect()
    val supps = tbl("supplier").select($"s_suppkey", $"s_nationkey")
      .as[(Long, Int)].collect()
    val parts = tbl("part").select($"p_partkey").as[Long].collect().toSet
    val nats = tbl("nation").select($"n_nationkey").as[Int].collect().toSet

    val okeys = orders.map(_._1).toSet
    val skeys = supps.map(_._1).toSet
    val ckeys = custs.map(_._1).toSet
    val expected = Map(
      "fk_lineitem_orders" -> li.count(r => !okeys(r._1)).toLong,
      "fk_lineitem_part" -> li.count(r => !parts(r._3)).toLong,
      "fk_lineitem_supplier" -> li.count(r => !skeys(r._4)).toLong,
      "pk_dup_lineitem" ->
        (li.length - li.map(r => (r._1, r._2)).distinct.length).toLong,
      "dom_lineitem_nonpos_qty" -> li.count(_._5 <= 0).toLong,
      "fk_orders_customer" -> orders.count(r => !ckeys(r._2)).toLong,
      "pk_dup_orders" ->
        (orders.length - orders.map(_._1).distinct.length).toLong,
      "dom_orders_nonpos_total" -> orders.count(_._3 <= 0).toLong,
      "fk_customer_nation" -> custs.count(r => !nats(r._2)).toLong,
      "pk_dup_customer" ->
        (custs.length - custs.map(_._1).distinct.length).toLong,
      "fk_supplier_nation" -> supps.count(r => !nats(r._2)).toLong,
      "pk_dup_supplier" ->
        (supps.length - supps.map(_._1).distinct.length).toLong)

    val got = DataQuality.audit.run(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(got.map(_._1) === expected.keys.toSeq.sorted,
      "one row per declared check, ordered by check name")
    got.foreach { case (check, n) =>
      assert(n === expected(check), s"check $check")
    }
    // the discriminating check: the corpus' composite lineitem key is
    // non-unique by construction, so the audit must surface REAL
    // violations here — an all-zero result would mean it counts nothing
    assert(got.toMap.apply("pk_dup_lineitem") > 0,
      "testdata's (l_orderkey, l_linenumber) is non-unique — the dup " +
        "check must be nonzero or the audit is vacuous")
  }
  test("dq_audit key rollup: out-of-domain and NULL-key corrections stay exact") {
    // The round-18 codegen split moved the out-of-domain lineno distinct
    // count out of the main aggregate (collect_set forced the whole
    // fact rollup through interpreted ObjectHashAggregate) into a
    // filtered branch joined back null-safely. The real corpus never
    // exercises that branch — this constructed one does: out-of-domain
    // linenos (negative, > 63, duplicated), NULL linenos, a NULL
    // orderkey group carrying a bad lineno, and an orphan order.
    val rows = Seq[(Option[Long], Option[Long])](
      (Some(1L), Some(1L)), (Some(1L), Some(1L)), // dup inside the bitmask domain
      (Some(1L), Some(99L)), (Some(1L), Some(99L)),
      (Some(1L), Some(-5L)),          // out-of-domain: 2 distinct values
      (Some(2L), None), (Some(2L), None), // NULL linenos: one group, one dup
      (None, Some(77L)), (None, Some(77L)), // NULL orderkey w/ bad lineno: dup
      (Some(3L), Some(2L)))           // orphan order (not in okeys)
    val li = rows.toDF("l_orderkey", "l_linenumber")
    val okeys = Seq(1L, 2L).toDF("o_orderkey")
    val got = DataQuality.liKeyChecksOn(li, okeys)
      .as[(Long, Long)].collect().head
    // scalar replay: fk_o = rows whose orderkey ∉ okeys (NULL never
    // matches, like the oracle's LEFT JOIN); dup = n − distinct (okey,
    // lineno) pairs with NULL grouping as its own key
    val expFk = rows.count(r => !r._1.exists(Set(1L, 2L))).toLong
    val expDup = (rows.size - rows.distinct.size).toLong
    assert(got === (expFk, expDup),
      s"liKeyChecksOn=(fk_o, dup) expected ($expFk, $expDup)")
  }

  test("dq_audit plan: PK-dup counts aggregate two-level, no distinct-agg Expand") {
    val plan = DataQuality.audit.run(spark, dir).queryExecution.executedPlan.toString
    // the two-level dup aggregation must not regress to the distinct-agg
    // rewrite (Expand + a second fact-wide exchange keyed by the PK).
    // (At this SF the orders FK join broadcasts, so the PK rollup pays a
    // small exchange of its own; at shuffle-join scale the rollup rides
    // the join's l_orderkey partitioning — ClusteredDistribution on
    // (l_orderkey, l_linenumber) is satisfied by HashPartitioning on the
    // key prefix. The Expand guard is the SF-independent invariant.)
    assert(!plan.contains("Expand"), s"distinct-agg Expand is back:\n$plan")
  }

  test("dq_ldiversity matches a scalar replay and discriminates groups") {
    def tbl(n: String) = graft.sources.Tables.load(spark, dir, n)
    val qi = tbl("customer")
      .select($"c_custkey", $"c_nationkey".cast("long"), $"c_mktsegment",
        $"c_acctbal".cast("double"))
      .as[(Long, Long, String, Double)].collect()
      .map { case (k, nat, seg, bal) =>
        k -> (nat, seg, Math.floorDiv(math.round(bal * 100), 100000L))
      }.toMap
    val rel = tbl("orders").select($"o_custkey", $"o_orderpriority")
      .as[(Long, String)].collect()
      .map { case (c, p) => (qi(c), p) }
    val expected = rel.groupBy(_._1).map { case (g, rows) =>
      val byS = rows.groupBy(_._2).map(_._2.size.toLong)
      g -> (rows.size.toLong, byS.size.toLong,
        byS.max * 1000000L / rows.size)
    }
    val got = DataQuality.ldiversity.run(spark, dir)
      .as[(Long, String, Long, Long, Long, Long, Boolean)].collect()
    assert(got.length === expected.size)
    got.foreach { case (nat, seg, band, n, nd, share, ldiv) =>
      val (en, end, eshare) = expected((nat, seg, band))
      assert((n, nd, share) === (en, end, eshare), s"group ($nat,$seg,$band)")
      assert(ldiv === (nd >= 3L))
    }
    // the audit must discriminate: this corpus has both diverse and
    // homogeneous QI groups, or the gate is echoing a constant
    assert(got.exists(_._7) && got.exists(!_._7),
      "expected a mix of l-diverse and non-diverse groups")
  }

  test("dq_tcloseness matches a scalar TVD replay and discriminates groups") {
    def tbl(n: String) = graft.sources.Tables.load(spark, dir, n)
    val qi = tbl("customer")
      .select($"c_custkey", $"c_nationkey".cast("long"), $"c_mktsegment",
        $"c_acctbal".cast("double"))
      .as[(Long, Long, String, Double)].collect()
      .map { case (k, nat, seg, bal) =>
        k -> (nat, seg, Math.floorDiv(math.round(bal * 100), 100000L))
      }.toMap
    val rel = tbl("orders").select($"o_custkey", $"o_orderpriority")
      .as[(Long, String)].collect()
      .map { case (c, p) => (qi(c), p) }
    val total = rel.length.toLong
    val pPpm: Map[String, Long] = rel.groupBy(_._2)
      .map { case (v, rs) => v -> rs.size.toLong * 1000000L / total }
    val sumP = pPpm.values.sum
    val expected = rel.groupBy(_._1).map { case (g, rows) =>
      val n = rows.size.toLong
      val qPpm = rows.groupBy(_._2).map { case (v, rs) =>
        v -> rs.size.toLong * 1000000L / n
      }
      // present values: |q−p|; absent values: their full global share
      val tvd = (qPpm.map { case (v, q) => math.abs(q - pPpm(v)) }.sum
        + (sumP - qPpm.keys.map(pPpm).sum)) / 2
      g -> (n, tvd)
    }
    val got = DataQuality.tcloseness.run(spark, dir)
      .as[(Long, String, Long, Long, Long, Boolean)].collect()
    assert(got.length === expected.size)
    got.foreach { case (nat, seg, band, n, tvd, close) =>
      val (en, etvd) = expected((nat, seg, band))
      assert((n, tvd) === (en, etvd), s"group ($nat,$seg,$band)")
      assert(close === (tvd <= 200000L))
    }
    // skew discrimination: both near-corpus and skewed groups must occur
    assert(got.exists(_._6) && got.exists(!_._6),
      "expected a mix of t-close and skewed groups")
    graft.Scratch.release(spark)
  }

  test("dq_drift shares sum to ~1e6 ppm per side and counts cover the table") {
    val got = DataQuality.drift.run(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    val total = graft.sources.Tables.load(spark, dir, "orders").count()
    assert(got.map(r => r._2 + r._3).sum === total,
      "every order must land on exactly one side of the split")
    // floor-division shares undershoot by < 1 ppm per bucket
    val sb = got.map(_._4).sum; val sa = got.map(_._5).sum
    assert(sb > 1000000L - got.size && sb <= 1000000L, s"before side: $sb")
    assert(sa > 1000000L - got.size && sa <= 1000000L, s"after side: $sa")
    got.foreach { r =>
      assert(r._6 === math.abs(r._4 - r._5), s"delta must be |share diff|: $r")
    }
  }

  test("dq_outlier_mad: scalar robust-statistics replay per type") {
    val ev = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", $"value").as[(String, Option[Double])].collect()
      .collect { case (t, Some(v)) =>
        (t, BigDecimal(v * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      }.toSeq
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply(((xs.size + 1) / 2) - 1)
    val expect = ev.groupBy(_._1).toSeq.map { case (t, rs) =>
      val vs = rs.map(_._2)
      val med = lowerMedian(vs)
      val devs = vs.map(v => math.abs(v - med))
      val mad = lowerMedian(devs)
      val nOut = devs.count(_ > 3 * mad).toLong
      (t, vs.size.toLong, med, mad, nOut, nOut * 1000000L / vs.size)
    }.sortBy(_._1)
    val got = DataQuality.outlierMad.run(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
    // the fence is meaningful: MAD is nonzero for real-valued data and the
    // outlier fraction stays a small minority
    got.foreach { case (t, n, _, mad, nOut, ppm) =>
      assert(mad >= 0 && nOut <= n / 2, s"type $t: $nOut of $n flagged")
      assert(ppm === nOut * 1000000L / n)
    }
    graft.Scratch.release(spark)
  }

  test("dq_benford: scalar digit replay, expectation sums to exactly 10^6") {
    val prices = graft.sources.Tables.load(spark, dir, "orders")
      .select($"o_totalprice").as[Double].collect().filter(_ > 0)
    def lead(c0: Long): Long = { var c = c0; while (c >= 10) c /= 10; c }
    val digits = prices.map(p =>
      lead(BigDecimal(p * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    val counts = digits.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = digits.length.toLong
    val exp = Map(1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L,
      5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)
    assert(exp.values.sum === 1000000L, "Benford literals must sum to 10^6")
    val rows = counts.toSeq.sortBy(_._1).map { case (d, n) =>
      val obs = n * 1000000L / tot
      (d, n, obs, exp(d.toInt), math.abs(obs - exp(d.toInt)))
    }
    val mad = rows.map(_._5).sum / rows.size
    val expect = rows.map { case (d, n, obs, e, dev) => (d, n, obs, e, dev, mad) }
    val got = DataQuality.benford.run(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
    // the audit covers every order with a positive total
    assert(got.map(_._2).sum === tot)
  }
}

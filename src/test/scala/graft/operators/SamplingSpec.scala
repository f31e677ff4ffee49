package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  import spark.implicits._

  private val dir = sf("sf0.001")

  test("deterministic sample selects the same rows on every run/partitioning") {
    val a = Sampling.deterministic.run(spark, dir).select($"doc_id").as[Long].collect()
    val b = Sampling.deterministic.run(spark, dir).select($"doc_id").as[Long].collect()
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
    // ~1/16 of the corpus, loose bounds
    val total = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(a.length > total / 64 && a.length < total / 4, s"${a.length} of $total")
  }

  test("stratified sample enforces the per-source quota exactly") {
    val perSource = Sampling.stratified.run(spark, dir)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(perSource.nonEmpty)
    perSource.foreach { case (src, n) => assert(n <= 5, s"$src quota exceeded: $n") }
    // sources with ≥5 docs must fill their quota
    val totals = graft.sources.Tables.load(spark, dir, "documents")
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    totals.filter(_._2 >= 5).keys.foreach { src =>
      assert(perSource(src) === 5L, s"$src under-filled: ${perSource.get(src)}")
    }
  }

  test("approx_stats plans sketches only — no exact distinct or exact percentile") {
    // the point of the round-6 rewrite: the benchmarked plan must not pay
    // the exact count(DISTINCT text) shuffle or the exact percentile sort
    // the sketches exist to replace
    val plan = Sampling.approx.run(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("count(distinct"), s"exact distinct in plan:\n$plan")
    assert(!plan.contains("Expand"), s"distinct-rewrite Expand in plan:\n$plan")
    assert(!plan.toLowerCase.contains("percentile(n_chars"),
      s"exact percentile in plan:\n$plan")
    assert(plan.contains("approx_count_distinct") || plan.contains("HyperLogLog"),
      s"HLL sketch missing from plan:\n$plan")
    assert(plan.contains("percentile_approx"), s"KLL-style sketch missing:\n$plan")
  }

  test("approximate aggregates land within their error bounds") {
    // the registered query's own verdicts (what the DuckDB oracle gates on)
    val verdicts = Sampling.approx.run(spark, dir)
      .select($"lang", $"distinct_sane", $"median_sane")
      .as[(String, Boolean, Boolean)].collect()
    assert(verdicts.nonEmpty)
    verdicts.foreach { case (lang, dOk, mOk) =>
      assert(dOk, s"$lang HLL distinct estimate outside [0, 4n]")
      assert(mOk, s"$lang approx median outside the group's [min, max]")
    }
    // The ACCURACY contract lives here, test-side, so the registered query
    // stays sketch-only: exact distinct/percentiles are computed once in
    // this spec and compared against the same sketches the query runs.
    val raw = graft.sources.Tables.load(spark, dir, "documents")
      .groupBy($"lang")
      .agg(approx_count_distinct($"text", 0.02).as("ad"),
        percentile_approx($"n_chars", lit(0.5), lit(1000)).as("am"),
        countDistinct($"text").as("d"),
        expr("percentile(n_chars, 0.5)").as("m"),
        expr("percentile(n_chars, 0.25)").as("p25"),
        expr("percentile(n_chars, 0.75)").as("p75"))
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
    raw.foreach { case (lang, ad, am, d, m, p25, p75) =>
      assert(math.abs(ad - d).toDouble / d < 0.1, s"$lang distinct: $ad vs $d")
      // percentile_approx with accuracy 1000 on small groups is near-exact
      assert(math.abs(am - m) <= math.max(2.0, m * 0.05), s"$lang median: $am vs $m")
      assert(am >= p25 && am <= p75, s"$lang approx median outside exact IQR")
    }
  }

  test("length_buckets quartiles docs per language with element boundaries") {
    val placed = Sampling.lengthBuckets.run(spark, dir)
      .select($"doc_id", $"lang", $"n_chars", $"bucket")
      .as[(Long, String, Long, Int)].collect()
    val corpus = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(placed.length.toLong === corpus)
    assert(placed.forall(p => p._4 >= 0 && p._4 <= 3))
    placed.groupBy(_._2).foreach { case (lang, docs) =>
      // binning is monotone in length
      docs.sortBy(_._3).foldLeft(0) { (prev, d) =>
        assert(d._4 >= prev, s"$lang: bucket decreased as length grew"); d._4
      }
      // quartiles: each bucket holds ≤ ceil(n/4) + ties; no bucket is empty
      // for a language with ≥4 distinct lengths
      val byBucket = docs.groupBy(_._4).view.mapValues(_.length)
      if (docs.map(_._3).distinct.length >= 4)
        assert(byBucket.size === 4, s"$lang: ${byBucket.size} buckets used")
      // percentile_disc: every boundary must be an observed length, so the
      // top of each non-last bucket is a data element by construction
      val lengths = docs.map(_._3).toSet
      (0 to 2).foreach { b =>
        byBucket.toMap.get(b).foreach { _ =>
          val top = docs.filter(_._4 == b).map(_._3).max
          assert(lengths.contains(top))
        }
      }
    }
  }

  test("snapshot_merge classifies every key per the digest rules") {
    val actions = Sampling.snapshotMerge.run(spark, dir)
      .select($"doc_id", $"action").as[(Long, String)].collect()
    assert(actions.map(_._1).distinct.length === actions.length, "keys unique")
    val byPrefix = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", substring(md5($"text"), 1, 1).as("p"))
      .as[(Long, String)].collect()
    val counts = actions.groupBy(_._2).view.mapValues(_.length).toMap
    assert(counts("insert") === byPrefix.count(_._2 == "1"))
    assert(counts("delete") === byPrefix.count(_._2 == "f"))
    assert(counts("update") === byPrefix.count(_._2 == "0"))
    // '1'-prefix docs keep their unchanged original row (noop) AND
    // reappear under a shifted id (insert)
    assert(counts("noop") === byPrefix.count(p => p._2 != "0" && p._2 != "f"))
    // inserted keys live in the negative namespace — disjoint from any
    // non-negative id space at any corpus size
    actions.filter(_._2 == "insert").foreach(a => assert(a._1 < 0L))
  }

  test("split_leakage_safe never puts a near-dup candidate pair across splits") {
    val out = Sampling.splitSafe.run(spark, dir)
      .select($"doc_id", $"cluster_id", $"split")
      .as[(Long, Long, String)].collect()
    val splitOf = out.map(r => r._1 -> r._3).toMap
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    assert(out.length.toLong === docs.count())
    // the leakage guarantee, asserted on the raw EDGES (not the labels the
    // query itself used): every LSH candidate pair shares one split
    val pairs = Dedup.minhashCandidates(docs)
      .select($"id1", $"id2").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(splitOf(a) === splitOf(b), s"pair ($a,$b) straddles splits")
    }
    // docs with no near-dup candidates degrade to exactly the per-doc rule
    val perDoc = Sampling.split.run(spark, dir)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val linked = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    out.filterNot(r => linked(r._1)).foreach { case (id, cid, sp) =>
      assert(cid === id && sp === perDoc(id), s"singleton $id diverged")
    }
  }

  test("pack_sequences placement is a lossless concat-and-chunk map") {
    val placed = Sampling.pack.run(spark, dir)
      .select($"doc_id", $"shard", $"pack", $"off_in_pack", $"tok")
      .as[(Long, String, Long, Long, Long)].collect()
    val corpus = graft.sources.Tables.load(spark, dir, "documents").count()
    // every document placed exactly once
    assert(placed.length.toLong === corpus)
    assert(placed.map(_._1).distinct.length.toLong === corpus)
    placed.foreach { case (id, _, pack, off, tok) =>
      assert(pack >= 0 && off >= 0 && off < 2048, s"doc $id at pack=$pack off=$off")
      assert(tok > 0, s"doc $id counted zero tokens")
    }
    // within a shard the placement IS the exclusive prefix sum of token
    // counts in (digest, doc_id) order — reconstruction needs no other state
    placed.groupBy(_._2).foreach { case (shard, docs) =>
      var run = 0L
      docs.sortBy(d => d._3 * 2048 + d._4).foreach { case (id, _, pack, off, tok) =>
        assert(pack * 2048 + off === run,
          s"shard $shard doc $id starts at ${pack * 2048 + off}, expected $run")
        run += tok
      }
    }
  }
  test("compactChangelog: latest wins, tombstones drop, late events resurrect") {
    val log = Seq(
      // key 1: plain insert
      (1L, 1, "I", "one"),
      // key 2: insert then update — update wins
      (2L, 1, "I", "two"), (2L, 2, "U", "two v2"),
      // key 3: insert then delete — gone
      (3L, 1, "I", "three"), (3L, 2, "D", ""),
      // key 4: insert, delete, then a LATER update — resurrected
      (4L, 1, "I", "four"), (4L, 2, "D", ""), (4L, 3, "U", "four back"),
      // key 5: out-of-ORDER arrival (update row appears before insert in
      // the frame) — seq, not arrival order, decides
      (5L, 7, "U", "five v7"), (5L, 1, "I", "five")
    ).toDF("doc_id", "seq", "op", "text")
    val out = Sampling.compactChangelog(log)
      .select($"doc_id", $"op", $"text", $"n_versions", $"last_seq")
      .as[(Long, String, String, Long, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(!out.contains(3L), "deleted key must not survive compaction")
    assert(out(1L) === ((1L, "I", "one", 1L, 1)))
    assert(out(2L) === ((2L, "U", "two v2", 2L, 2)))
    assert(out(4L) === ((4L, "U", "four back", 3L, 3)),
      "a post-tombstone event must resurrect the key")
    assert(out(5L) === ((5L, "U", "five v7", 2L, 7)))
    // scale shape: compaction is ONE keyed aggregation with a map-side
    // partial — no window, no join, no extra exchange
    val plan = Sampling.compactChangelog(log).queryExecution.executedPlan.toString
    assert("Exchange (hash|range)partitioning".r.findAllIn(plan).size <= 1, plan)
    assert(!plan.contains("Window"), plan)
  }

  test("sample_time_split: per user, every eval event is in the training future") {
    val split = Sampling.timeSplit.run(spark, dir)
      .as[(Long, Long, String)].collect()
    val times = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_id", expr(
        graft.sources.Tables.nanosToMicrosSql("ts")).as("tus"))
      .as[(Long, Long)].collect().toMap
    val byUser = split.groupBy(_._2)
    byUser.values.foreach { evs =>
      val (train, eval0) = evs.partition(_._3 == "train")
      // 80/20 by count (floor rule): train = floor(4n/5)
      assert(train.length === evs.length * 4 / 5)
      if (train.nonEmpty && eval0.nonEmpty)
        assert(train.map(e => times(e._1)).max <=
          eval0.map(e => times(e._1)).min,
          "future leakage: a train event after an eval event")
    }
    assert(split.length === times.size, "every event gets a split")
  }

  test("sample_negatives never samples a positive, ranks contiguously") {
    val neg = Sampling.negatives.run(spark, dir)
      .as[(Long, Long, Long)].collect()
    val pos = graft.sources.Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_partkey")
      .join(graft.sources.Tables.load(spark, dir, "orders")
        .select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".cast("long"), $"l_partkey".cast("long"))
      .as[(Long, Long)].collect().toSet
    neg.foreach { case (cust, _, item) =>
      assert(!pos.contains((cust, item)), s"positive sampled: $cust/$item")
    }
    neg.groupBy(_._1).values.foreach { rs =>
      assert(rs.map(_._2).sorted.toSeq === (1L to rs.length).toSeq,
        "ranks must be contiguous from 1")
      assert(rs.map(_._3).distinct.length === rs.length,
        "negatives must be distinct items")
    }
    // every interacting customer is served (up to collision shortfall)
    assert(neg.groupBy(_._1).size === pos.map(_._1).size)
  }

  test("distinct_sketch: scalar register replay, day-merge identity, estimate fidelity") {
    val events = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", $"ts", $"user_id")
      .as[(String, Long, Long)].collect()
    val dayNs = 86400L * 1000000000L
    // scalar reference registers, built BOTH ways: per-day partials
    // max-merged, and directly from the raw rows — the mergeability
    // identity the operator's whole reason to exist rests on
    def hash(u: Long): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(u.toString.getBytes("UTF-8"))
          .take(6).map(b => f"$b%02x").mkString, 16)
    def rho(h: Long): Long = {
      val rest = h / 64
      if (rest == 0) 43L
      else java.lang.Long.numberOfTrailingZeros(rest) + 1L
    }
    def regs(rows: Seq[(String, Long, Long)]): Map[(String, Long), Long] =
      rows.groupBy(r => (r._1, hash(r._3) % 64))
        .view.mapValues(_.map(r => rho(hash(r._3))).max).toMap
    val direct = regs(events.toSeq)
    val mergedDaily = events.groupBy(e => Math.floorDiv(e._2, dayNs))
      .values.map(d => regs(d.toSeq))
      .foldLeft(Map.empty[(String, Long), Long]) { (acc, m) =>
        (acc.keySet ++ m.keySet).map { k =>
          k -> math.max(acc.getOrElse(k, 0L), m.getOrElse(k, 0L))
        }.toMap
      }
    assert(mergedDaily === direct, "per-day max-merge must equal direct registers")
    val got = Sampling.distinctSketch.run(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    got.foreach { case (ty, _, exact, occupied, sumReg, invFp) =>
      val mine = direct.filter(_._1._1 == ty)
      assert(occupied === mine.size.toLong, s"$ty occupied")
      assert(sumReg === mine.values.sum, s"$ty sum_reg")
      val fp = mine.values.map(r => (1L << 30) / (1L << r)).sum +
        (64 - mine.size) * (1L << 30)
      assert(invFp === fp, s"$ty inv_sum_fp")
      // HLL estimate from the exact fixed-point indicator: alpha·m²/Σ2^-r,
      // with the standard linear-counting switch in the small range
      // (raw < 2.5m and empty buckets remain). m=64 → ~13% standard
      // error; assert a loose 35% band
      val raw = 0.709 * 64 * 64 / (invFp.toDouble / (1L << 30))
      val est =
        if (raw < 160.0 && occupied < 64)
          64.0 * math.log(64.0 / (64 - occupied))
        else raw
      assert(math.abs(est - exact) / exact < 0.35,
        s"$ty estimate $est vs exact $exact")
    }
  }
  test("quantile_sketch: scalar bucket replay, day-merge identity, rank consistency") {
    val events = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", $"ts", $"value")
      .as[(String, Long, Double)].collect()
    val dayNs = 86400L * 1000000000L
    // scalar reference: the shared withQuantBucket arithmetic re-derived
    // independently (numberOfLeadingZeros, not bin-string length)
    def cents(v: Double): Long = math.round(v * 100)
    def bucket(v: Long): Long =
      if (v < 1) 0L
      else {
        val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
        8L * e + ((v - (1L << e)) * 8) / (1L << e)
      }
    def lo(b: Long): Long =
      if (b == 0) 0L
      else {
        val e = (b / 8).toInt
        (1L << e) + ((b % 8) * (1L << e)) / 8
      }
    def regs(rows: Seq[(String, Long, Double)]): Map[(String, Long), Long] =
      rows.groupBy(r => (r._1, bucket(cents(r._3))))
        .view.mapValues(_.size.toLong).toMap
    // day-merge identity: per-day count partials summed ≡ direct counts
    val direct = regs(events.toSeq)
    val mergedDaily = events.groupBy(e => Math.floorDiv(e._2, dayNs))
      .values.map(d => regs(d.toSeq))
      .foldLeft(Map.empty[(String, Long), Long]) { (acc, m) =>
        (acc.keySet ++ m.keySet).map { k =>
          k -> (acc.getOrElse(k, 0L) + m.getOrElse(k, 0L))
        }.toMap
      }
    assert(mergedDaily === direct, "per-day sum-merge must equal direct registers")
    val got = Sampling.quantileSketch.run(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    got.foreach { case (ty, n, _, _, occupied, checksum, p50, p90, p99,
        e50, e90, e99) =>
      val mine = direct.filter(_._1._1 == ty)
      assert(occupied === mine.size.toLong, s"$ty occupied")
      assert(n === mine.values.sum, s"$ty n_events")
      assert(checksum === mine.map { case ((_, b), c) => b * c }.sum,
        s"$ty reg_checksum")
      // rank consistency: the register picked at rank k is the BUCKET of
      // the rank-k value — the sketch answer's lower bound is exactly
      // lo(bucket(exact)), and never exceeds the exact percentile
      Seq((p50, e50), (p90, e90), (p99, e99)).foreach { case (pl, ex) =>
        assert(pl === lo(bucket(ex)), s"$ty sketch register vs exact bucket")
        assert(pl <= ex, s"$ty lower bound must not exceed the exact value")
      }
    }
  }

  test("sketch_cms: estimates never undershoot and the day merge is exact") {
    val out = Sampling.cmsSketch.run(spark, dir).collect()
    assert(out.length === 10)
    out.foreach { r =>
      // the CMS guarantee: every cell ≥ the key's true count
      assert(r.getAs[Long]("overcount") >= 0L,
        s"user ${r.getAs[Long]("user_id")} undershoots")
      assert(r.getAs[Long]("est_cnt") >= r.getAs[Long]("exact_cnt"))
    }
    val occ = out.head.getAs[Long]("occupied")
    val dayRegs = out.head.getAs[Long]("day_registers")
    assert(occ <= Sampling.CmsRows.toLong * Sampling.CmsW,
      "register domain exceeded")
    assert(dayRegs >= occ, "day grain lost")
  }

  test("sketch_cms: day-partial merge reproduces the direct registers") {
    // fold(day partials) must equal the single-pass registers cell for
    // cell — the algebraic identity that makes the sketch mergeable
    val dn = 86400L * 1000000000L
    val e = graft.sources.Tables.load(spark, dir, "events")
      .select($"user_id", expr(s"(ts - pmod(ts, ${dn}L)) div ${dn}L").as("day"))
      .select($"user_id", $"day",
        explode(expr(s"sequence(0, ${Sampling.CmsRows - 1})")).as("r"))
      .withColumn("bucket", expr(Sampling.cmsBucketSpark("r", "user_id")))
    val viaDays = e.groupBy($"day", $"r", $"bucket").agg(count(lit(1)).as("c"))
      .groupBy($"r", $"bucket").agg(sum($"c").as("c"))
      .as[(Int, Long, Long)].collect().map { case (r, b, c) => (r, b) -> c }.toMap
    val direct = e.groupBy($"r", $"bucket").agg(count(lit(1)).as("c"))
      .as[(Int, Long, Long)].collect().map { case (r, b, c) => (r, b) -> c }.toMap
    assert(viaDays === direct)
    assert(direct.nonEmpty)
  }

  test("sample_mixture_plan: the level is the exact water-filling optimum") {
    val out = Sampling.mixturePlan.run(spark, dir).collect()
    assert(out.nonEmpty)
    val supplies = out.map(_.getAs[Long]("supply"))
    val budget = out.head.getAs[Long]("budget")
    val level = out.head.getAs[Long]("level")
    def spent(l: Long): Long = supplies.map(math.min(_, l)).sum
    // L is feasible and maximal: one more token per capped domain busts it
    assert(spent(level) <= budget, "level infeasible")
    assert(spent(level + 1) > budget, "level not maximal")
    out.foreach { r =>
      assert(r.getAs[Long]("alloc") ===
        math.min(r.getAs[Long]("supply"), level))
      assert(r.getAs[Boolean]("capped") === (r.getAs[Long]("supply") > level))
    }
    assert(out.head.getAs[Long]("leftover") === budget - spent(level))
    // small domains are taken whole; at least one large domain caps
    assert(out.exists(_.getAs[Boolean]("capped")), "nothing capped at B=total/2")
  }

  test("join_size_est: scalar sketch replay; CMS bounds, AMS estimates") {
    import spark.implicits._
    def h48(r: Long, k: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$r#$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16)
    }
    def counts(df: org.apache.spark.sql.DataFrame, key: String): Map[Long, Long] =
      df.groupBy(col(key).as("k")).count()
        .as[(Long, Long)].collect().toMap
    val ok = counts(graft.sources.Tables.load(spark, dir, "orders"), "o_custkey")
    val ek = counts(graft.sources.Tables.load(spark, dir, "events"), "user_id")
    // scalar sketches over the same hash: (r, b) -> (signed, unsigned)
    def sketch(kc: Map[Long, Long]): Map[(Long, Long), (Long, Long)] =
      (for { (k, c) <- kc.toSeq; r <- 0L until 5L } yield {
        val h = h48(r, k)
        val sgn = if (((h / 256) % 2) == 1) c else -c
        (r, h % 256) -> (sgn, c)
      }).groupBy(_._1).map { case (rb, cs) =>
        rb -> (cs.map(_._2._1).sum, cs.map(_._2._2).sum)
      }
    val os = sketch(ok); val es = sketch(ek)
    def rows[A](f: Long => A): Seq[A] = (0L until 5L).map(f)
    val f2r = rows(r => os.collect { case ((`r`, _), (v, _)) => v * v }.sum)
    val f2u = rows(r => os.collect { case ((`r`, _), (_, u)) => u * u }.sum)
    val jr = rows(r => os.collect { case ((`r`, b), (v, _)) =>
      v * es.getOrElse((r, b), (0L, 0L))._1 }.sum)
    val ju = rows(r => os.collect { case ((`r`, b), (_, u)) =>
      u * es.getOrElse((r, b), (0L, 0L))._2 }.sum)
    val exactF2 = ok.values.map(c => c * c).sum
    val exactJoin = ok.map { case (k, c) => c * ek.getOrElse(k, 0L) }.sum
    val out = Sampling.joinSizeEst.run(spark, dir).collect().head
    assert(out.getAs[Long]("exact_f2") === exactF2)
    assert(out.getAs[Long]("exact_join") === exactJoin)
    assert(out.getAs[Long]("f2_cms") === f2u.min)
    assert(out.getAs[Long]("join_cms") === ju.min)
    assert(out.getAs[Long]("f2_ams") === f2r.sorted.apply(2))
    assert(out.getAs[Long]("join_ams") === jr.sorted.apply(2))
    // the guarantees: unsigned CMS never undershoots either target
    assert(f2u.min >= exactF2)
    assert(ju.min >= exactJoin)
    graft.Scratch.release(spark)
  }

  test("dv_read: scalar sieve replay; the checksum pins WHICH rows died") {
    import spark.implicits._
    val ids = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id").as[Long].collect().sorted
    val expect = ids.zipWithIndex.map { case (d, i) =>
      (i / 256L, d, (i.toLong % 7) == 0) // shard*256+pos == global rowid
    }.groupBy(_._1).toSeq.map { case (sh, rs) =>
      val live = rs.filter(!_._3)
      (sh, rs.size.toLong, (rs.size - live.size).toLong,
        live.size.toLong, live.map(_._2).sum)
    }.sortBy(_._1)
    val got = Sampling.dvRead.run(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
    // the sieve really fires in every shard and never empties one
    got.foreach { case (sh, tot, del, live, _) =>
      assert(del > 0 && live > 0, s"shard $sh: deleted=$del live=$live")
      assert(del + live === tot)
    }
    graft.Scratch.release(spark)
  }

  test("export_shards: dense enumeration replay, no corpus-wide window") {
    import spark.implicits._
    val q = Sampling.exportShards.run(spark, dir)
    // scale gate (the orders_pareto discipline): any window SORTED on
    // doc_id must be band-partitioned — only the super-band-sized count
    // frame may cross an unpartitioned window
    val docIdWindows = q.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("windowspecdefinition("))
      .filter(l => "doc_id#\\d+L? ASC".r.findFirstIn(l).isDefined)
      .toSeq
    // the filter matches by source column NAME: if a refactor aliases
    // doc_id before the window, an empty match set would pass the gate
    // vacuously — demand the window we mean to gate is actually present
    assert(docIdWindows.nonEmpty,
      "plan gate matched no doc_id-sorted window — regex went stale against the plan")
    docIdWindows.foreach { l =>
      assert(l.contains("band"), s"unpartitioned window over doc_id:\n$l")
    }
    val got = q.as[(Long, Long, Long, Long)].collect().toSeq
    val expect = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id").as[Long].collect().sorted.zipWithIndex
      .map { case (d, i) => (d, i.toLong, i / 256L, i % 256L) }.toSeq
    assert(got === expect)
    // dense: rowids are exactly 0..n-1; shards fill to 256 before opening
    assert(got.map(_._2) === got.indices.map(_.toLong))
    got.groupBy(_._3).toSeq.sortBy(_._1).dropRight(1).foreach {
      case (sh, rs) => assert(rs.size === 256, s"shard $sh not full")
    }
  }

  test("sample_curriculum: exact decile schedule, no corpus-wide window") {
    import spark.implicits._
    val q = Sampling.curriculum.run(spark, dir)
    // scale gate: the only windows sorted on the difficulty key must be
    // band-partitioned (the export_shards discipline)
    val lenWindows = q.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("windowspecdefinition("))
      .filter(l => "n_chars#\\d+L? ASC".r.findFirstIn(l).isDefined)
      .toSeq
    assert(lenWindows.nonEmpty,
      "plan gate matched no n_chars-sorted window — regex went stale")
    lenWindows.foreach { l =>
      assert(l.contains("band"), s"unpartitioned window over n_chars:\n$l")
    }
    val got = q.as[(Long, Long, Long, Long, Long)].collect().toSeq
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect().toSeq
    val n = docs.size.toLong
    val expect = docs.sortBy(x => (x._2, x._1)).zipWithIndex
      .map { case ((d, nc), i) =>
        val r0 = i.toLong
        val dec = r0 * 10 / n
        val step = r0 - (dec * n + 9) / 10
        (d, nc, dec, step, step * 10 + dec)
      }.sortBy(_._5)
    assert(got === expect)
    // schedule positions are globally unique (a total training order) and
    // the deciles are balanced to within one document
    assert(got.map(_._5).distinct.size === got.size)
    val sizes = got.groupBy(_._3).values.map(_.size)
    assert(sizes.max - sizes.min <= 1, s"unbalanced deciles: $sizes")
    // consecutive schedule steps round-robin the difficulty levels: the
    // first 10 scheduled docs cover all 10 deciles
    assert(got.sortBy(_._5).take(10).map(_._3).toSet.size === 10)
  }
}

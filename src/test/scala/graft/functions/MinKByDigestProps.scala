package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property suite for [[TypedAggs.minKByDigest]] — the partial top-K
  * Aggregator whose buffer maintains a sorted-ascending invariant with a
  * bounded two-run merge. The Aggregator's reduce/merge/finish are pure
  * functions, so the properties drive them directly (no Spark session):
  * for ANY input multiset, ANY permutation, ANY partitioning into partial
  * buffers, and ANY merge order of the partials, the selection must equal
  * the specification `pairs.sorted.take(k)` — exactly the invariant Spark
  * relies on when it reduces rows into map-side partials in arbitrary
  * order and merges partials in arbitrary order after the exchange.
  *
  * Digests are drawn from a deliberately tiny alphabet so collisions are
  * common and the (digest, id) tiebreak is exercised, plus occasional
  * realistic long hex strings.
  */
object MinKByDigestProps extends Properties("minKByDigest") {

  private type Pair = (String, Long)

  private val collidingDigest: Gen[String] =
    Gen.choose(0, 7).map(i => f"$i%02x")
  private val longDigest: Gen[String] =
    Gen.listOfN(32, Gen.hexChar).map(_.mkString.toLowerCase)
  private val pairGen: Gen[Pair] = for {
    d <- Gen.frequency(3 -> collidingDigest, 1 -> longDigest)
    id <- Gen.choose(0L, 40L) // small range: duplicate (digest, id) happen
  } yield (d, id)

  private val caseGen: Gen[(List[Pair], Int, Int, Long)] = for {
    pairs <- Gen.listOf(pairGen)
    k <- Gen.choose(1, 8)
    nParts <- Gen.choose(1, 6)
    seed <- Gen.long
  } yield (pairs, k, nParts, seed)

  /** Run the aggregator the way Spark does: shuffle rows, split into
    * partitions, fold each partition's partial with `reduce`, then merge
    * the partials (zero-initialized, shuffled order), then `finish`.
    * Asserts the K-bound on every intermediate buffer along the way.
    */
  private def runAgg(pairs: List[Pair], k: Int, nParts: Int,
      seed: Long): (Seq[Long], Boolean) = {
    val agg = TypedAggs.minKByDigest(k)
    val rng = new scala.util.Random(seed)
    val shuffled = rng.shuffle(pairs)
    // random split points → partitions of random (possibly zero) size
    val parts = Array.fill(nParts)(List.newBuilder[Pair])
    shuffled.foreach(p => parts(rng.nextInt(nParts)) += p)
    var bounded = true
    val partials = parts.toList.map(_.result().foldLeft(agg.zero) { (b, a) =>
      val r = agg.reduce(b, a)
      bounded &&= r.pairs.size <= k
      r
    })
    val merged = rng.shuffle(partials).foldLeft(agg.zero) { (x, y) =>
      val m = agg.merge(x, y)
      bounded &&= m.pairs.size <= k
      m
    }
    (agg.finish(merged).ids, bounded)
  }

  property("equals sorted.take(k) under any permutation/partitioning/merge order") =
    forAll(caseGen) { case (pairs, k, nParts, seed) =>
      val (got, bounded) = runAgg(pairs, k, nParts, seed)
      val expect = pairs.sorted.take(k).map(_._2)
      bounded && got == expect
    }

  property("two independent shufflings/partitionings select identically") =
    forAll(caseGen, Gen.long) { case ((pairs, k, nParts, seed), seed2) =>
      runAgg(pairs, k, nParts, seed)._1 == runAgg(pairs, k, nParts, seed2)._1
    }

  property("merge is commutative on arbitrary partial buffers") =
    forAll(Gen.listOf(pairGen), Gen.listOf(pairGen), Gen.choose(1, 8)) {
      (xs, ys, k) =>
        val agg = TypedAggs.minKByDigest(k)
        val bx = xs.foldLeft(agg.zero)(agg.reduce)
        val by = ys.foldLeft(agg.zero)(agg.reduce)
        agg.merge(bx, by) == agg.merge(by, bx)
    }
}

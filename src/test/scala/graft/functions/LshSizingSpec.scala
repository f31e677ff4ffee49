package graft.functions

import graft.SparkSpec

/** Measured-occupancy LSH sizing: the pure derivation, and the instrument
  * measurement reading ≈1 on a scattered corpus vs ≫1 on a collapsed one
  * — so a skewed corpus re-sizes bits upward while a uniform corpus keeps
  * the row-count geometry.
  */
class LshSizingSpec extends SparkSpec {

  import spark.implicits._

  test("derivedGeometry: default below 4k, row-count base, skew adds bits, cap holds") {
    // every shipped gate corpus (≤4k) keeps the recall-tuned default,
    // whatever the measurement says
    assert(LshPlanes.derivedGeometry(2000L, None) === ((16, 6)))
    assert(LshPlanes.derivedGeometry(2000L, Some(100.0)) === ((16, 6)))
    // the ×10 / ×100 smoke regimes from the row count alone
    assert(LshPlanes.derivedGeometry(20000L, None) === ((8, 11)))
    assert(LshPlanes.derivedGeometry(200000L, None) === ((8, 14)))
    // a near-uniform measurement (Poisson-noise band) changes nothing
    assert(LshPlanes.derivedGeometry(200000L, Some(1.2)) === ((8, 14)))
    // measured concentration s adds ceil(log2(s)) bits: 8× tighter
    // buckets need 3 more bits to restore the uniform pair budget
    assert(LshPlanes.derivedGeometry(200000L, Some(8.0)) === ((8, 17)))
    // the 24-bit cap still holds under extreme skew
    assert(LshPlanes.derivedGeometry(20000000L, Some(1e6))._2 === 24)
  }

  test("measuredSkew: ~1 on a scattered corpus, >>1 on a collapsed one, None on empty") {
    def frame(f: (Long, Int) => Float) =
      (0L until 2000L).map { id =>
        (id, Array.tabulate(64)(i => f(id, i)), 0)
      }.toDF("vec_id", "embedding", "label")
    // scattered: well-mixed pseudo-random components → instrument buckets
    // fill near-uniformly → concentration inside the Poisson band
    val scattered = frame { (id, i) =>
      (scala.util.hashing.MurmurHash3.productHash((id, i)) % 1000) / 100.0f
    }
    val su = LshSizing.measuredSkew(scattered).get
    assert(su < 1.5, s"scattered corpus must read near-uniform: $su")
    // collapsed: every vector identical → one bucket holds everything
    val collapsed = frame { (_, i) => (i % 7) / 3.0f }
    val sc = LshSizing.measuredSkew(collapsed).get
    assert(sc > 50.0, s"collapsed corpus must read heavily concentrated: $sc")
    // the feedback loop: the collapsed measurement re-sizes bits upward,
    // the scattered one keeps the row-count geometry exactly
    assert(LshPlanes.derivedGeometry(200000L, Some(sc))._2 >
      LshPlanes.derivedGeometry(200000L, Some(su))._2)
    assert(LshPlanes.derivedGeometry(200000L, Some(su)) ===
      LshPlanes.derivedGeometry(200000L, None))
    // deploy-before-data: no rows → None, not a crash
    assert(LshSizing.measuredSkew(scattered.filter($"vec_id" < 0L)).isEmpty)
  }
}

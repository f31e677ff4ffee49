package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property suite for [[RaceTimeParse.formatFast]] — the JVM core of the
  * native `race_time_format` expression. Its exactness contract is "the
  * composed formatCol's output, byte for byte, on every finite double":
  * the composed path ends in `format_string("%02d:%02d:%05.2f", …)`, i.e.
  * `java.util.Formatter`, whose `%f` rounds HALF-UP on the double's exact
  * decimal expansion. formatFast reproduces that with BigDecimal.setScale
  * — these properties pin the equivalence against Formatter ITSELF across
  * random magnitudes, exactly-representable rounding boundaries (x.xx5
  * doubles like 2.125), carry-to-"60.00" fractions, and negatives, far
  * beyond the fixed grid in RaceTimeSpec.
  *
  * The reference oracle replays through Formatter on the Spark side and
  * C-printf on the DuckDB side; the registered gate proves THOSE agree on
  * corpus data — this suite proves native ≡ Formatter universally, so the
  * native swap can never be the source of a gate break.
  */
object RaceTimeFormatProps extends Properties("raceTimeFormat") {

  /** The composed formatCol's arithmetic, replayed on the JVM: pmod like
    * Spark's, int casts widened to Long (the composed ANSI int cast only
    * diverges beyond ±2³¹ hours — outside every generator here). */
  private def viaFormatter(x: Double): String = {
    def pmod(a: Double, n: Double): Double = ((a % n) + n) % n
    val h = math.floor(x / 3600d).toLong
    val m = math.floor(pmod(x, 3600d) / 60d).toLong
    "%02d:%02d:%05.2f".formatLocal(java.util.Locale.ROOT, h, m, pmod(x, 60d))
  }

  private val finiteGen: Gen[Double] = Gen.frequency(
    5 -> Gen.choose(0d, 36000d),                       // the domain
    2 -> Gen.choose(-36000d, 0d),                      // negative gaps
    2 -> Gen.choose(0, 2880000).map(_ / 8d),           // eighth-steps: many
                                                       // exactly-representable
                                                       // x.125/x.375/… halfway
                                                       // rounding boundaries
    1 -> Gen.choose(0, 59999).map(ms => 59d + ms / 100000d), // carry → "60.00"
    1 -> Gen.choose(-1e9, 1e9))                        // wild magnitudes

  property("formatFast ≡ java.util.Formatter on finite doubles") =
    forAll(finiteGen) { x =>
      val got = RaceTimeParse.formatFast(x)
      got != null && got.toString == viaFormatter(x)
    }

  property("NaN and infinities yield null (documented lenience)") =
    forAll(Gen.oneOf(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity)) { x =>
      RaceTimeParse.formatFast(x) == null
    }
}

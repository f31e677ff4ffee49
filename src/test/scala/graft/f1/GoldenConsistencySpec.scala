package graft.f1

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Row-level consistency against the reference's committed golden outputs
  * (the parquet files under `/root/reference/Martin files/index`). The
  * reference ships no
  * raw inputs, so a full replay is impossible — but the seven outputs are
  * projections/aggregations of ONE combined frame, which makes their
  * inter-relationships derivable and assertable:
  *
  *   - `filter` must be exactly the distinct (year, city, driverFullName)
  *     projection of `evopoints` — and running OUR `F1Analytics
  *     .filterDistinct` over the golden evopoints frame must reproduce the
  *     golden filter rows bit-for-bit (the row-level link between this
  *     engine's operator and the reference's committed data).
  *   - `constructor` minus its ConstructorName column must equal
  *     `evopoints`; `pitstop` must carry the same (year, date, city,
  *     driver) key set.
  *   - `wins` / `weather2324` / `fastestlap` keys must be subsets of the
  *     season universe, with their own invariants (one row per win, the
  *     2023+ filter, parseable lap-time strings).
  *
  * Complements GoldenSchemaSpec (schema parity) and F1DifferentialSpec
  * (semantic parity on synthesized seasons).
  */
class GoldenConsistencySpec extends SparkSpec {

  import spark.implicits._

  private val goldenDir = "/root/reference/Martin files/index"

  private def golden(name: String): DataFrame =
    spark.read.parquet(s"$goldenDir/$name.parquet")

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("\u0000"))

  test("golden outputs carry the reference's committed row counts") {
    val expected = Map(
      "wins" -> 51L, "fastestlap" -> 50L, "filter" -> 1019L,
      "weather2324" -> 579L, "evopoints" -> 1019L, "constructor" -> 1019L,
      "pitstop" -> 1019L)
    expected.foreach { case (name, n) =>
      assert(golden(name).count() === n, s"$name row count")
    }
  }

  test("our filterDistinct over golden evopoints reproduces golden filter row-for-row") {
    val derived = F1Analytics.filterDistinct(golden("evopoints"))
    assert(rows(derived) === rows(golden("filter")))
  }

  test("constructor minus ConstructorName equals evopoints (multiset)") {
    val proj = golden("constructor")
      .select(col("year"), col("date"), col("driverFullName"),
        col("totalPoints"), col("city"))
    assert(rows(proj) === rows(golden("evopoints")))
  }

  test("pitstop and evopoints agree on the (year, date, city, driver) key multiset") {
    def keys(df: DataFrame) =
      rows(df.select(col("year"), col("date"), col("city"), col("driverFullName")))
    assert(keys(golden("pitstop")) === keys(golden("evopoints")))
    // value sanity on the counted column itself: a pit-stop count is a
    // small non-negative integer (0 happens on red-flag strategy races;
    // >6 would mean the count-join in the reference double-counted)
    val p = golden("pitstop")
    assert(p.filter(col("pitStops") < 0 || col("pitStops") > 6).count() === 0,
      "pitStops outside the physically plausible [0, 6]")
  }

  test("constructor IS evopoints enriched by the driver-season constructor mapping — full rows") {
    // The reference builds `constructor` by joining the combined frame's
    // constructor column back onto the evopoints projection
    // (index_constructor.py). That structure is fully checkable from the
    // committed outputs alone: the (year, driver) → ConstructorName
    // mapping must be FUNCTIONAL (no driver changes team inside a golden
    // season), and enriching evopoints with it — the same broadcast
    // lookup-join shape as this engine's J2 operator — must rebuild the
    // golden constructor frame row-for-row, every column compared.
    val mapping = golden("constructor")
      .select(col("year"), col("driverFullName"), col("ConstructorName"))
      .distinct()
    assert(mapping.groupBy(col("year"), col("driverFullName")).count()
      .filter(col("count") > 1).count() === 0,
      "(year, driver) → constructor is not functional")
    val rebuilt = golden("evopoints")
      .join(broadcast(mapping), Seq("year", "driverFullName"))
      .select(col("year"), col("date"), col("driverFullName"),
        col("ConstructorName"), col("totalPoints"), col("city"))
    assert(rows(rebuilt) === rows(golden("constructor")))
  }

  test("weather2324 IS the 2023+ season universe enriched by per-race weather — full rows") {
    // weather2324's weather columns must be constant per race (they come
    // from ONE Meteostat daily row per (year, city) in the reference),
    // its key set must be exactly `filter` restricted to year ≥ 2023, and
    // the broadcast enrichment of that universe with the per-race weather
    // frame must reproduce the golden output row-for-row — the aggregate
    // values recomputed through the combined-frame structure, not just
    // key-set membership.
    val wcols = Seq("temp_min", "temp_max", "temp_avg", "precipitation", "wspd")
    val race = golden("weather2324")
      .select((Seq("year", "city") ++ wcols).map(col): _*).distinct()
    assert(race.groupBy(col("year"), col("city")).count()
      .filter(col("count") > 1).count() === 0,
      "per-race weather is not constant within a (year, city)")
    val rebuilt = golden("filter").filter(col("year") >= 2023)
      .join(broadcast(race), Seq("year", "city"))
      .select((Seq("year", "city", "driverFullName") ++ wcols).map(col): _*)
    assert(rows(rebuilt) === rows(golden("weather2324")))
  }

  test("wins is one row per race win inside the season universe") {
    val w = golden("wins")
    assert(w.filter(col("wins") =!= 1L).count() === 0,
      "every golden wins row records exactly one win")
    val universe = golden("filter")
      .select(col("year"), col("city"), col("driverFullName"))
    assert(w.select(col("year"), col("city"), col("driverFullName"))
      .except(universe).count() === 0,
      "wins keys must exist in the season universe")
  }

  test("weather2324 honors the year >= 2023 filter and the season universe") {
    val w = golden("weather2324")
    assert(w.filter(col("year") < 2023).count() === 0)
    val universe = golden("filter")
      .select(col("year"), col("city"), col("driverFullName"))
    assert(w.select(col("year"), col("city"), col("driverFullName"))
      .except(universe).count() === 0)
  }

  test("every golden fastestLapTime parses through race_time_seconds") {
    graft.functions.RaceTime.register(spark)
    val parsed = golden("fastestlap")
      .select(col("year"), col("city"),
        expr("race_time_seconds(fastestLapTime)").as("sec"))
    assert(parsed.filter(col("sec").isNull).count() === 0,
      "a committed lap time failed to parse")
    // plausibility band for an F1 fastest lap (Monaco ~70s .. wet ~2.5min)
    val Row(lo: Double, hi: Double) =
      parsed.agg(min(col("sec")), max(col("sec"))).head()
    assert(lo > 30.0 && hi < 300.0, s"parsed lap range [$lo, $hi] implausible")
    // each fastest-lap race exists in the evopoints season universe
    assert(parsed.select(col("year"), col("city"))
      .except(golden("evopoints").select(col("year"), col("city")))
      .count() === 0)
  }

  test("evopoints totalPoints is a running cumsum: non-decreasing per driver-season") {
    val violations = golden("evopoints")
      .withColumn("prev", lag(col("totalPoints"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("year"), col("driverFullName"))
          .orderBy(col("date"))))
      .filter(col("prev").isNotNull && col("totalPoints") < col("prev"))
    assert(violations.count() === 0,
      "golden cumulative points decreased within a driver-season")
  }
}

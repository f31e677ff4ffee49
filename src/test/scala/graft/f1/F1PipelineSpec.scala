package graft.f1

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed F1 ETL vs the reference's driver-side semantics
  * (`Lucas files/finalversion:107-192`), on a FIXTURES.md §A-shaped fixture:
  * two 2022 rounds, three drivers, the full set of time-reconstruction edge
  * cases (absolute leader, +gap, gap-before-leader, missing time),
  * cross-round running points, pitstop default-0, and the combine join.
  */
class F1PipelineSpec extends SparkSpec {

  import spark.implicits._

  private def readJson(schema: org.apache.spark.sql.types.StructType,
      docs: String*): DataFrame =
    spark.read.schema(schema).json(spark.createDataset(docs))

  private def resultJson(pos: String, points: String, id: String, given: String,
      family: String, cons: String, time: Option[String], flap: Option[String]): String = {
    val t = time.map(v => s""","Time":{"time":"$v"}""").getOrElse("")
    val f = flap.map(v => s""","FastestLap":{"Time":{"time":"$v"}}""").getOrElse("")
    s"""{"position":"$pos","points":"$points","grid":"$pos","laps":"57","status":"Finished",
       |"Driver":{"driverId":"$id","givenName":"$given","familyName":"$family"},
       |"Constructor":{"name":"$cons"}$t$f}""".stripMargin.replace("\n", "")
  }

  private def raceJson(round: Int, results: Seq[String]): String =
    s"""{"MRData":{"RaceTable":{"Races":[{"season":"2022","round":"$round",
       |"Results":[${results.mkString(",")}]}]}}}""".stripMargin.replace("\n", "")

  private val resultsRaw = readJson(Ergast.resultsSchema,
    raceJson(1, Seq(
      resultJson("1", "25", "leclerc", "Charles", "Leclerc", "Ferrari",
        Some("1:37:33.584"), Some("1:34.570")),
      resultJson("2", "18", "verstappen", "Max", "Verstappen", "Red Bull",
        Some("+5.598"), Some("1:35.740")),
      resultJson("N/A", "0", "hamilton", "Lewis", "Hamilton", "Mercedes",
        None, None))),
    raceJson(2, Seq(
      // +gap BEFORE any absolute time → reference leaves it "N/A"
      resultJson("2", "18", "leclerc", "Charles", "Leclerc", "Ferrari",
        Some("+1:07.219"), Some("1:31.634")),
      resultJson("1", "25", "verstappen", "Max", "Verstappen", "Red Bull",
        Some("1:30:00.000"), Some("1:31.000")),
      resultJson("3", "15", "hamilton", "Lewis", "Hamilton", "Mercedes",
        Some("+10.500"), Some("1:32.100")))))

  private val pitstopsRaw = readJson(Ergast.pitstopsSchema,
    """{"MRData":{"RaceTable":{"Races":[{"season":"2022","round":"1","PitStops":[
      |{"driverId":"leclerc","stop":"1","lap":"15","time":"x","duration":"24.3"},
      |{"driverId":"leclerc","stop":"2","lap":"30","time":"x","duration":"23.9"},
      |{"driverId":"verstappen","stop":"1","lap":"18","time":"x","duration":"22.1"}
      |]}]}}}""".stripMargin.replace("\n", ""),
    """{"MRData":{"RaceTable":{"Races":[{"season":"2022","round":"2","PitStops":[
      |{"driverId":"verstappen","stop":"1","lap":"20","time":"x","duration":"21.8"}
      |]}]}}}""".stripMargin.replace("\n", ""))

  private val raceInfoRaw = readJson(Ergast.raceInfoSchema,
    """{"season":"2022","round":"1","raceName":"Bahrain Grand Prix","date":"2022-03-20",
      |"Circuit":{"circuitId":"bahrain","circuitName":"Bahrain International Circuit",
      |"Location":{"locality":"Sakhir","country":"Bahrain"}},
      |"city":"Sakhir","country":"Bahrain"}""".stripMargin.replace("\n", ""),
    """{"season":"2022","round":"2","raceName":"Saudi Arabian Grand Prix","date":"2022-03-27",
      |"Circuit":{"circuitId":"jeddah","circuitName":"Jeddah Corniche Circuit",
      |"Location":{"locality":"Jeddah","country":"Saudi Arabia"}},
      |"city":"Jeddah","country":"Saudi Arabia"}""".stripMargin.replace("\n", ""))

  private lazy val fact = Ergast.factTable(raceInfoRaw, resultsRaw, pitstopsRaw).cache()

  private def timeOf(round: String, driver: String): String =
    fact.filter(col("round") === round && col("driverId") === driver)
      .select("time").as[String].head()

  test("fact table has the reference's 19 columns + provenance idx") {
    val expected = Seq("year", "round", "raceName", "date", "circuit", "city",
      "country", "driverId", "driverFullName", "constructorName", "points",
      "totalPoints", "position", "grid", "laps", "status", "time",
      "fastestLapTime", "pitStops", "idx")
    assert(fact.columns.toSeq === expected)
    assert(fact.count() === 6)
  }

  test("leader-relative time reconstruction matches the Python loop") {
    // round 1: leader absolute; +gap after leader; missing → N/A
    assert(timeOf("1", "leclerc") === "01:37:33.58")
    assert(timeOf("1", "verstappen") === "01:37:39.18") // 5853.584+5.598
    assert(timeOf("1", "hamilton") === "N/A")
    // round 2: +gap BEFORE any absolute → N/A; absolute sets leader;
    // later +gap is leader-relative even though leader wasn't row 0
    assert(timeOf("2", "leclerc") === "N/A")
    assert(timeOf("2", "verstappen") === "01:30:00.00")
    assert(timeOf("2", "hamilton") === "01:30:10.50")
  }

  test("malformed absolute time degrades to the 'N/A' sentinel, not null") {
    val malformed = readJson(Ergast.resultsSchema,
      raceJson(9, Seq(
        resultJson("1", "25", "leclerc", "Charles", "Leclerc", "Ferrari",
          Some("1:ab.c"), None), // unparseable absolute time
        resultJson("2", "18", "verstappen", "Max", "Verstappen", "Red Bull",
          Some("1:30:00.000"), None))))
    val times = Ergast.withFormattedTime(Ergast.flattenResults(malformed))
      .select($"driverId", $"time").as[(String, String)].collect().toMap
    assert(times("leclerc") === "N/A") // one sentinel contract, never null
    assert(times("verstappen") === "01:30:00.00")
  }

  test("running points accumulate per driver across rounds in round order") {
    val tp = fact.select(col("round"), col("driverId"), col("totalPoints"))
      .as[(String, String, Double)].collect()
      .map { case (r, d, p) => (r, d) -> p }.toMap
    assert(tp(("1", "leclerc")) === 25.0)
    assert(tp(("2", "leclerc")) === 43.0) // 25 + 18
    assert(tp(("1", "verstappen")) === 18.0)
    assert(tp(("2", "verstappen")) === 43.0) // 18 + 25
    assert(tp(("1", "hamilton")) === 0.0)
    assert(tp(("2", "hamilton")) === 15.0)
  }

  test("pitstop counts join back with default 0 for drivers without stops") {
    val ps = fact.select(col("round"), col("driverId"), col("pitStops"))
      .as[(String, String, Long)].collect()
      .map { case (r, d, p) => (r, d) -> p }.toMap
    assert(ps(("1", "leclerc")) === 2L)
    assert(ps(("1", "verstappen")) === 1L)
    assert(ps(("1", "hamilton")) === 0L)
    assert(ps(("2", "verstappen")) === 1L)
    assert(ps(("2", "leclerc")) === 0L)
  }

  test("missing position/fastestLap become the reference's 'N/A' sentinel") {
    val row = fact.filter(col("round") === "1" && col("driverId") === "hamilton")
      .select("position", "fastestLapTime").as[(String, String)].head()
    assert(row === (("N/A", "N/A")))
  }

  private lazy val combined = {
    val weather = Seq(
      ("Sakhir", "Bahrain", "2022-03-20", 24.1, 18.9, 29.3, 0.0, 14.8),
      ("Jeddah", "Saudi Arabia", "2022-03-27", 28.4, 22.0, 33.1, 0.0, 11.2),
      ("Sakhir", "Bahrain", "2022-04-01", 20.0, 15.0, 25.0, 1.0, 9.9)) // no race
      .toDF("city", "country", "date", "tavg", "tmin", "tmax", "prcp", "wspd")
    Ergast.combine(fact, weather).cache()
  }

  test("combine inner-joins on (city, country, date) like the reference") {
    assert(combined.count() === 6) // every fact row has matching weather
    assert(combined.columns.count(_ == "city") === 1) // USING-style key dedup
    assert(combined.filter(col("date") === "2022-04-01").count() === 0)
  }

  test("wins query: string position = 1 keeps winners, drops 'N/A'") {
    val w = F1Analytics.wins(combined)
      .select("driverFullName", "year", "city", "wins")
      .as[(String, Long, String, Long)].collect().toSet
    assert(w === Set(("Charles Leclerc", 2022L, "Sakhir", 1L),
      ("Max Verstappen", 2022L, "Jeddah", 1L)))
  }

  test("fastestlap query: lexicographic top-1 per (year, circuit)") {
    val fl = F1Analytics.fastestLap(combined)
      .select("circuit", "driverFullName", "fastestLapTime")
      .as[(String, String, String)].collect().toSet
    // round 1: "1:34.570" < "1:35.740" lexicographically
    assert(fl === Set(
      ("Bahrain International Circuit", "Charles Leclerc", "1:34.570"),
      ("Jeddah Corniche Circuit", "Max Verstappen", "1:31.000")))
  }

  test("circuit stats: AVG over string laps casts, MAX over lap string is lexicographic") {
    val st = F1Analytics.circuitStats(combined)
      .select("circuit", "avg_laps", "best_lap_time", "total_races")
      .as[(String, Double, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(st("Bahrain International Circuit")._2 === 57.0)
    // lexicographic MAX includes the 'N/A' sentinel ('N' > '1') — faithful
    // to the reference's untyped string aggregation
    assert(st("Bahrain International Circuit")._3 === "N/A")
    assert(st("Bahrain International Circuit")._4 === 3L)
    // all-real circuit: max is the lexicographically greatest string, which
    // is NOT the fastest lap (1:32.100 > 1:31.000)
    assert(st("Jeddah Corniche Circuit")._3 === "1:32.100")
  }

  test("evo queries project + order including the hidden-column sort") {
    assert(F1Analytics.evoPoints(combined).columns.toSeq ===
      Seq("year", "date", "driverFullName", "totalPoints", "city"))
    assert(F1Analytics.evoPitstops(combined).columns.toSeq ===
      Seq("year", "date", "driverFullName", "pitStops", "city"))
    assert(F1Analytics.filterDistinct(combined).count() === 6)
    // top10 doesn't filter 'N/A' (lexicographic sort puts it last) — 6 rows < limit
    assert(F1Analytics.top10(combined).count() === 6)
  }
}

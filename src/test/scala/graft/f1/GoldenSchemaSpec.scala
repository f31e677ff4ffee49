package graft.f1

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Schema parity against the reference's committed golden outputs
  * (the parquet files under `/root/reference/Martin files/index`, Spark
  * 3.5.1 metadata — SURVEY.md §1.1e). The reference repo ships no raw inputs, so row-level
  * parity is checked semantically in F1PipelineSpec; here every usage-query
  * output must carry the EXACT golden column names (including the
  * `ConstructorName` casing quirk), order, and types — a user switching
  * engines must get byte-compatible schemas downstream (their ES indexers
  * key on these names).
  */
class GoldenSchemaSpec extends SparkSpec {

  private val goldenDir = "/root/reference/Martin files/index"

  import spark.implicits._

  // minimal combined table with every column the queries touch
  private lazy val combined = {
    import org.apache.spark.sql.functions._
    Seq(("1", "Bahrain Grand Prix"))
      .toDF("round", "raceName")
      .select(lit(2022L).as("year"), col("round"), col("raceName"),
        lit("2022-03-20").as("date"), lit("Bahrain").as("circuit"),
        lit("Sakhir").as("city"), lit("Bahrain").as("country"),
        lit("leclerc").as("driverId"), lit("Charles Leclerc").as("driverFullName"),
        lit("Ferrari").as("constructorName"), lit(25.0).as("points"),
        lit(25.0).as("totalPoints"), lit("1").as("position"),
        lit("1").as("grid"), lit("57").as("laps"), lit("Finished").as("status"),
        lit("01:37:33.58").as("time"), lit("1:34.570").as("fastestLapTime"),
        lit(2L).as("pitStops"),
        lit(24.1).as("tavg"), lit(18.9).as("tmin"), lit(29.3).as("tmax"),
        lit(0.0).as("prcp"), lit(14.8).as("wspd"))
  }

  private def assertSchemaMatches(golden: String, df: DataFrame): Unit = {
    val exp = spark.read.parquet(s"$goldenDir/$golden.parquet").schema
    val got = df.schema
    assert(got.fieldNames.toSeq === exp.fieldNames.toSeq,
      s"$golden: column names/order diverge from the golden output")
    exp.fields.zip(got.fields).foreach { case (e, g) =>
      assert(g.dataType === e.dataType,
        s"$golden.${e.name}: got ${g.dataType}, golden has ${e.dataType}")
    }
  }

  test("wins matches the golden schema") {
    assertSchemaMatches("wins", F1Analytics.wins(combined))
  }

  test("fastestlap matches the golden schema") {
    assertSchemaMatches("fastestlap", F1Analytics.fastestLap(combined))
  }

  test("filter matches the golden schema") {
    assertSchemaMatches("filter", F1Analytics.filterDistinct(combined))
  }

  test("weather2324 matches the golden schema") {
    assertSchemaMatches("weather2324", F1Analytics.weatherAgg(combined))
  }

  test("evopoints matches the golden schema") {
    assertSchemaMatches("evopoints", F1Analytics.evoPoints(combined))
  }

  test("constructor matches the golden schema (ConstructorName casing)") {
    assertSchemaMatches("constructor", F1Analytics.evoPointsConstructor(combined))
  }

  test("pitstop matches the golden schema") {
    assertSchemaMatches("pitstop", F1Analytics.evoPitstops(combined))
  }
}

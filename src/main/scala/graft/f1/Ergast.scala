package graft.f1

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.RaceTime

/** The F1-shaped distributed ETL (SURVEY.md §3.2): everything the reference
  * computes driver-side in Python (`Lucas files/finalversion:107-192`) as
  * declarative Spark plans over the landed raw zone. This is the one place
  * the engine is architecturally different from the reference *and* strictly
  * more capable — the Python loop is O(corpus) in one process; these plans
  * distribute across executors and scale with partition count.
  *
  * Raw shapes (FIXTURES.md §A): one nested Ergast JSON per race for results
  * (`MRData.RaceTable.Races[].Results[]`, navigated at `finalversion:130-170`)
  * and pitstops (`finalversion:133-138`), one race-info JSON per race
  * (`finalversion:89-93`), one weather CSV per city (`finalversion:238-248`).
  */
object Ergast {

  // ---- explicit schemas for the raw zone (no inference at 100 TB) ----

  private val driver = StructType(Seq(
    StructField("driverId", StringType),
    StructField("givenName", StringType),
    StructField("familyName", StringType)))

  private val timeStruct = StructType(Seq(StructField("time", StringType)))

  private val result = StructType(Seq(
    StructField("position", StringType),
    StructField("points", StringType),
    StructField("grid", StringType),
    StructField("laps", StringType),
    StructField("status", StringType),
    StructField("Driver", driver),
    StructField("Constructor", StructType(Seq(StructField("name", StringType)))),
    StructField("Time", timeStruct),
    StructField("FastestLap", StructType(Seq(StructField("Time", timeStruct))))))

  private val pitStop = StructType(Seq(
    StructField("driverId", StringType),
    StructField("stop", StringType),
    StructField("lap", StringType),
    StructField("time", StringType),
    StructField("duration", StringType)))

  private def raceTable(extra: StructField*) = StructType(Seq(
    StructField("MRData", StructType(Seq(
      StructField("RaceTable", StructType(Seq(
        StructField("Races", ArrayType(StructType(Seq(
          StructField("season", StringType),
          StructField("round", StringType)) ++ extra)))))))))))

  /** `MRData.RaceTable.Races[].Results[]` (FIXTURES.md §A2). */
  val resultsSchema: StructType = raceTable(StructField("Results", ArrayType(result)))

  /** `MRData.RaceTable.Races[].PitStops[]` (FIXTURES.md §A3). */
  val pitstopsSchema: StructType = raceTable(StructField("PitStops", ArrayType(pitStop)))

  /** Race-info JSON, one per race (FIXTURES.md §A1). */
  val raceInfoSchema: StructType = StructType(Seq(
    StructField("season", StringType),
    StructField("round", StringType),
    StructField("raceName", StringType),
    StructField("date", StringType),
    StructField("Circuit", StructType(Seq(
      StructField("circuitId", StringType),
      StructField("circuitName", StringType),
      StructField("Location", StructType(Seq(
        StructField("locality", StringType),
        StructField("country", StringType))))))),
    StructField("city", StringType),
    StructField("country", StringType)))

  /** Meteostat daily CSV (FIXTURES.md §A4): all observation fields double,
    * `date` pinned to StringType so the (city,country,date) join key matches
    * the F1 side exactly (SURVEY.md §7.4 — inference could silently make it
    * a date and empty the join).
    */
  val weatherSchema: StructType = StructType(
    StructField("date", StringType) +:
      Seq("tavg", "tmin", "tmax", "prcp", "snow", "wdir", "wspd", "wpgt",
        "pres", "tsun").map(StructField(_, DoubleType)))

  // ---- distributed ETL ----

  private def naIfNull(c: Column): Column = coalesce(c, lit("N/A"))

  /** Flatten `Races[].Results[]` to one row per (race, result), keeping the
    * result's array position `idx` — the reference iterates the Results list
    * in order (`finalversion:130`) and the leader-time reconstruction is
    * order-sensitive, so the position must survive the explode.
    * P2+P3 in SURVEY.md §2.2: nested-field projection, `'N/A'` defaults for
    * absent Time/FastestLap/position, given+family name concat.
    */
  def flattenResults(resultsRaw: DataFrame): DataFrame =
    resultsRaw
      .select(explode(col("MRData.RaceTable.Races")).as("race"))
      .select(col("race.season").cast("long").as("year"),
        col("race.round").as("round"),
        posexplode(col("race.Results")).as(Seq("idx", "r")))
      .select(
        col("year"), col("round"), col("idx"),
        col("r.Driver.driverId").as("driverId"),
        concat_ws(" ", col("r.Driver.givenName"), col("r.Driver.familyName"))
          .as("driverFullName"),
        col("r.Constructor.name").as("constructorName"),
        col("r.points").cast("double").as("points"),
        naIfNull(col("r.position")).as("position"),
        col("r.grid").as("grid"),
        col("r.laps").as("laps"),
        col("r.status").as("status"),
        naIfNull(col("r.Time.time")).as("rawTime"),
        naIfNull(col("r.FastestLap.Time.time")).as("fastestLapTime"))

  /** Per-(race, driver) pitstop counts — the reference's Python dict count
    * (`finalversion:133-138`) as explode + hash-agg (F5 in SURVEY.md §2.3).
    */
  def pitstopCounts(pitstopsRaw: DataFrame): DataFrame =
    pitstopsRaw
      .select(explode(col("MRData.RaceTable.Races")).as("race"))
      .select(col("race.season").cast("long").as("year"),
        col("race.round").as("round"),
        explode(col("race.PitStops")).as("p"))
      .groupBy(col("year"), col("round"), col("p.driverId").as("driverId"))
      .agg(count(lit(1)).as("pitStops"))

  /** Winner-relative finish-time reconstruction (F3, `finalversion:152-165`):
    * within one race, scanning results in array order, the FIRST absolute
    * (non-`'+'`, non-`'N/A'`) time becomes the leader reference; later
    * `"+gap"` rows format as leader+gap; a `'+'` row before any absolute
    * time, or a missing time, stays `"N/A"`. The stateful Python loop maps
    * to a running `first(..., ignoreNulls)` window over the array index.
    */
  def withFormattedTime(flat: DataFrame): DataFrame = {
    // self-register the native formatter: call_function resolves through the
    // session registry, so a plain SparkSession (no GraftSparkExtensions)
    // must not throw AnalysisException here. register() is a no-op when the
    // extension already injected the function.
    RaceTime.register(flat.sparkSession)
    val secs = RaceTime.secondsCol(col("rawTime"))
    val isAbsolute = col("rawTime") =!= "N/A" && !col("rawTime").startsWith("+")
    val w = Window.partitionBy(col("year"), col("round")).orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leaderSoFar = first(when(isAbsolute, secs), ignoreNulls = true).over(w)
    flat
      .withColumn("time",
        // outer coalesce: a MALFORMED absolute time parses to null secs →
        // formatCol(null) is null — collapse that to the same 'N/A'
        // sentinel every other failure path produces (one contract)
        coalesce(
          when(isAbsolute, call_function("race_time_format", secs))
            .when(col("rawTime").startsWith("+") && leaderSoFar.isNotNull,
              call_function("race_time_format", leaderSoFar + secs))
            .otherwise(lit("N/A")),
          lit("N/A")))
      .drop("rawTime")
  }

  /** Running points total per (year, driver) across rounds (F4,
    * `finalversion:145-147`): the reference's cross-file Python accumulator
    * relies on processing rounds in ascending numeric order
    * (`finalversion:117`); the window spells that ordering explicitly.
    * Within a race the order of accumulation doesn't change the sum, so
    * (round, idx) ordering reproduces it exactly.
    */
  def withCumulativePoints(flat: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("year"), col("driverId"))
      .orderBy(col("round").cast("int"), col("idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flat.withColumn("totalPoints", sum(col("points")).over(w))
  }

  /** The 19-column `formatted_ergastF1_data` fact table (FIXTURES.md §A5,
    * `finalversion:169-191`): flatten + time reconstruction + running points
    * + race-info enrichment (J2) + pitstop counts with 0 default
    * (`pitstops.get(driver_id, 0)`, `finalversion:188`).
    *
    * Scale shape: raceInfo and pitstop counts are small per-race dimensions
    * → broadcast joins; the windows partition by (year[, driver/round]) —
    * no global ordering anywhere.
    */
  def factTable(raceInfoRaw: DataFrame, resultsRaw: DataFrame,
      pitstopsRaw: DataFrame): DataFrame = {
    val info = raceInfoRaw.select(
      col("season").cast("long").as("year"), col("round"),
      col("raceName"), col("date"),
      col("Circuit.circuitName").as("circuit"),
      col("city"), col("country"))
    val flat = withCumulativePoints(withFormattedTime(flattenResults(resultsRaw)))
    flat
      .join(broadcast(info), Seq("year", "round"))
      .join(broadcast(pitstopCounts(pitstopsRaw)), Seq("year", "round", "driverId"), "left")
      .select(col("year"), col("round"), col("raceName"), col("date"),
        col("circuit"), col("city"), col("country"),
        col("driverId"), col("driverFullName"), col("constructorName"),
        col("points"), col("totalPoints"),
        col("position"), col("grid"), col("laps"), col("status"),
        col("time"), col("fastestLapTime"),
        coalesce(col("pitStops"), lit(0L)).as("pitStops"),
        col("idx"))
  }

  /** J1 (`finalversion:283-293`): inner equi-join of the F1 fact table with
    * the unioned weather table on (city, country, date) — USING-style key
    * dedup, string join keys on both sides by schema contract.
    */
  def combine(fact: DataFrame, weather: DataFrame): DataFrame =
    fact.join(weather, Seq("city", "country", "date"), "inner")
}

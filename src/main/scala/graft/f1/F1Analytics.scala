package graft.f1

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's 9 usage queries over the combined `races` table, taking
  * the combined DataFrame directly (the reference registers a temp view and
  * goes through `sqlContext.sql`, `finalversion:326-384` — the S9 surface is
  * exercised in [[graft.operators.Analytics.orderByHidden]]; here the same
  * plans are declared with the DataFrame API).
  *
  * Semantic quirks preserved on purpose (SURVEY.md §4): `position` is a
  * string compared to int 1 (Catalyst inserts the cast; `'N/A'` → null →
  * filtered), and `fastestLapTime` ordering/MAX is lexicographic on the
  * `M:SS.mmm` string — that IS what the reference computes.
  */
object F1Analytics {

  /** wins (A1, `finalversion:329-335`). The reference ran non-ANSI Spark
    * 3.5 where `position = 1` casts `'N/A'` to null and drops it; under
    * Spark 4's default ANSI mode that cast throws, so the null-on-malformed
    * behavior is spelled explicitly with try_cast.
    */
  def wins(races: DataFrame): DataFrame =
    races.filter(col("position").try_cast("int") === 1)
      .groupBy(col("driverFullName"), col("year"), col("city"))
      .agg(count(lit(1)).as("wins"))
      .orderBy(col("driverFullName"), col("year"), col("city"))

  /** fastestlap (W1, `finalversion:336-347`): top-1 per (year, circuit) by
    * lexicographic lap-time string.
    */
  def fastestLap(races: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("year"), col("circuit"))
      .orderBy(col("fastestLapTime"))
    races
      .filter(col("fastestLapTime").isNotNull && col("fastestLapTime") =!= "N/A")
      .select(col("year"), col("circuit"), col("city"), col("driverFullName"),
        col("fastestLapTime"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .orderBy(col("year"), col("circuit"), col("city"))
  }

  /** filter (A2, `finalversion:345-349`): GROUP BY as dedup. */
  def filterDistinct(races: DataFrame): DataFrame =
    races.select(col("year"), col("city"), col("driverFullName")).distinct()

  /** weather2324 (A3, `finalversion:351-366`). */
  def weatherAgg(races: DataFrame): DataFrame =
    races.filter(col("year") >= 2023)
      .groupBy(col("year"), col("city"), col("driverFullName"))
      .agg(min(col("tmin")).as("temp_min"), max(col("tmax")).as("temp_max"),
        avg(col("tavg")).as("temp_avg"), avg(col("prcp")).as("precipitation"),
        avg(col("wspd")).as("wspd"))
      .orderBy(col("year"), col("city"))

  /** evopoints (`finalversion:367-372`). */
  def evoPoints(races: DataFrame): DataFrame =
    races.select(col("year"), col("date"), col("driverFullName"),
        col("totalPoints"), col("city"))
      .orderBy(col("year"), col("date"), col("driverFullName"),
        col("totalPoints"), col("city"))

  /** constructor points (`finalversion:373-378`). The output column is
    * `ConstructorName` (capital C) — the reference's SELECT writes it that
    * way and the golden parquet carries that exact casing.
    */
  def evoPointsConstructor(races: DataFrame): DataFrame =
    races.select(col("year"), col("date"), col("driverFullName"),
        col("constructorName").as("ConstructorName"), col("totalPoints"), col("city"))
      .orderBy(col("year"), col("date"), col("driverFullName"),
        col("ConstructorName"), col("totalPoints"), col("city"))

  /** pitstop (O2, `finalversion:376-384`): ORDER BY `constructorName`, a
    * column not in the SELECT list — resolved against the child then dropped.
    */
  def evoPitstops(races: DataFrame): DataFrame =
    races.select(col("year"), col("date"), col("driverFullName"),
        col("pitStops"), col("city"), col("constructorName"))
      .orderBy(col("year"), col("date"), col("constructorName"),
        col("pitStops"), col("city"))
      .drop("constructorName")

  /** circuit stats (A4, `lastupdate1406:319-326`): AVG over string `laps`
    * (implicit cast), MAX over the lap-time string (lexicographic).
    */
  def circuitStats(races: DataFrame): DataFrame =
    races.groupBy(col("circuit"))
      .agg(avg(col("laps").try_cast("double")).as("avg_laps"),
        max(col("fastestLapTime")).as("best_lap_time"),
        count(lit(1)).as("total_races"))

  /** top-10 (O3, `lastupdate1406:329-334`): sort + limit →
    * TakeOrderedAndProject, per-partition top-k.
    */
  def top10(races: DataFrame): DataFrame =
    races.select(col("driverFullName"), col("circuit"), col("fastestLapTime"))
      .orderBy(col("fastestLapTime"))
      .limit(10)
}

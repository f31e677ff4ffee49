package graft.f1

import graft.SparkSpec
import org.apache.spark.sql.functions.col

import scala.collection.mutable
import scala.util.Random

/** Differential oracle: the reference's driver-side ETL loop
  * (`Lucas files/finalversion:107-192`) re-expressed as a plain in-memory
  * Scala model, run against seeded RANDOM fixtures, and compared
  * row-for-row with the distributed `Ergast.factTable` plan. This checks
  * the stateful semantics (per-year cumulative points in ascending round
  * order, first-absolute-time leader reference scanning results in array
  * order, pitstop default-0, `'N/A'` sentinels) on inputs nobody
  * hand-picked.
  */
class F1DifferentialSpec extends SparkSpec {

  import spark.implicits._

  // ---- in-memory model of the reference loop ----

  private def parseTime(s: String): Option[Double] = {
    if (s == "N/A") return None
    val body = if (s.startsWith("+")) s.substring(1) else s
    val parts = body.split(":")
    parts.length match {
      case 3 => Some(parts(0).toDouble * 3600 + parts(1).toDouble * 60 + parts(2).toDouble)
      case 2 => Some(parts(0).toDouble * 60 + parts(1).toDouble)
      case 1 => Some(body.toDouble)
      case _ => None
    }
  }

  private def formatTime(sec: Double): String = {
    val h = (sec / 3600).toInt
    val m = ((sec % 3600) / 60).toInt
    f"$h%02d:$m%02d:${sec % 60}%05.2f".replace(',', '.')
  }

  import F1DifferentialSpec._

  /** The reference loop, verbatim semantics: years outer (cumulative map
    * reset per year), rounds ascending, results in array order.
    */
  private def referenceModel(races: Seq[GenRace]): Seq[Expected] = {
    val out = mutable.Buffer[Expected]()
    races.groupBy(_.year).toSeq.sortBy(_._1).foreach { case (year, ofYear) =>
      val cumulative = mutable.Map[String, Double]()
      ofYear.sortBy(_.round).foreach { race =>
        val pitCounts = race.pitstops.toMap
        var firstTime: Option[Double] = None
        race.results.foreach { r =>
          cumulative(r.driverId) = cumulative.getOrElse(r.driverId, 0.0) + r.points
          val timeStr = r.time.getOrElse("N/A")
          val formatted =
            if (timeStr != "N/A" && !timeStr.startsWith("+")) {
              if (firstTime.isEmpty) firstTime = parseTime(timeStr)
              formatTime(parseTime(timeStr).get)
            } else if (timeStr.startsWith("+")) {
              firstTime match {
                case Some(lead) => formatTime(lead + parseTime(timeStr).get)
                case None => "N/A"
              }
            } else "N/A"
          out += Expected(year.toLong, race.round.toString, r.driverId,
            cumulative(r.driverId), formatted,
            pitCounts.getOrElse(r.driverId, 0).toLong, r.position,
            r.flap.getOrElse("N/A"), r.cons)
        }
      }
    }
    out.toSeq
  }

  // ---- fixture generation (seeded) ----

  private def genRaces(rnd: Random): Seq[GenRace] = {
    val drivers = Seq(
      ("alonso", "Fernando", "Alonso", "Aston Martin"),
      ("hamilton", "Lewis", "Hamilton", "Mercedes"),
      ("leclerc", "Charles", "Leclerc", "Ferrari"),
      ("verstappen", "Max", "Verstappen", "Red Bull"),
      ("norris", "Lando", "Norris", "McLaren"),
      ("gasly", "Pierre", "Gasly", "Alpine"))
    Seq(2022, 2023).flatMap { year =>
      // mid-season constructor swaps: ~1 in 3 drivers changes team from a
      // random round on — per-driver cumulative points must be indifferent
      // to the team change while the output row carries the NEW team
      val swapAt: Map[String, Int] = drivers.map { case (id, _, _, _) =>
        id -> (if (rnd.nextInt(3) == 0) 2 + rnd.nextInt(3) else Int.MaxValue)
      }.toMap
      (1 to 4).map { round =>
      val field = rnd.shuffle(drivers).take(3 + rnd.nextInt(3))
      val results = field.zipWithIndex.map { case ((id, g, f, c0), i) =>
        val c = if (round >= swapAt(id)) s"Swap-$id" else c0
        val position = if (rnd.nextInt(10) == 0) "N/A" else (i + 1).toString
        val time: Option[String] = i match {
          case 0 => if (rnd.nextBoolean())
            Some(f"${1 + rnd.nextInt(2)}%d:${rnd.nextInt(60)}%02d:${rnd.nextDouble() * 60}%06.3f")
          else None // leaderless race: later +gaps must stay N/A
          case _ => rnd.nextInt(3) match {
            case 0 => Some(f"+${rnd.nextDouble() * 90}%.3f")
            case 1 => Some(f"+${rnd.nextInt(3)}%d:${rnd.nextDouble() * 60}%06.3f")
            case _ => None
          }
        }
        val flap = if (rnd.nextInt(5) == 0) None
          else Some(f"${1 + rnd.nextInt(2)}%d:${rnd.nextDouble() * 60}%06.3f")
        GenResult(id, g, f, c, Seq(25.0, 18.0, 15.0, 12.0, 10.0, 8.0)(i),
          position, time, flap)
      }
      val pits = field.filter(_ => rnd.nextBoolean())
        .map { case (id, _, _, _) => id -> (1 + rnd.nextInt(3)) }
      GenRace(year, round, results, pits)
      }
    }
  }

  private def toJson(races: Seq[GenRace]): (Seq[String], Seq[String]) = {
    val results = races.map { r =>
      val rs = r.results.map { x =>
        val t = x.time.map(v => s""","Time":{"time":"$v"}""").getOrElse("")
        val fl = x.flap.map(v => s""","FastestLap":{"Time":{"time":"$v"}}""").getOrElse("")
        s"""{"position":"${x.position}","points":"${x.points}","grid":"1","laps":"57",
           |"status":"Finished","Driver":{"driverId":"${x.driverId}",
           |"givenName":"${x.given}","familyName":"${x.family}"},
           |"Constructor":{"name":"${x.cons}"}$t$fl}""".stripMargin.replace("\n", "")
      }
      s"""{"MRData":{"RaceTable":{"Races":[{"season":"${r.year}","round":"${r.round}",
         |"Results":[${rs.mkString(",")}]}]}}}""".stripMargin.replace("\n", "")
    }
    val pits = races.map { r =>
      val ps = r.pitstops.flatMap { case (id, n) =>
        (1 to n).map(s =>
          s"""{"driverId":"$id","stop":"$s","lap":"${s * 10}","time":"x","duration":"20.0"}""")
      }
      s"""{"MRData":{"RaceTable":{"Races":[{"season":"${r.year}","round":"${r.round}",
         |"PitStops":[${ps.mkString(",")}]}]}}}""".stripMargin.replace("\n", "")
    }
    (results, pits)
  }

  private def raceInfoJson(races: Seq[GenRace]): Seq[String] =
    races.map(r =>
      s"""{"season":"${r.year}","round":"${r.round}","raceName":"R${r.round}",
         |"date":"${r.year}-0${(r.round % 9) + 1}-01",
         |"Circuit":{"circuitId":"c${r.round}","circuitName":"C${r.round}",
         |"Location":{"locality":"L","country":"X"}},
         |"city":"City${r.round}","country":"X"}""".stripMargin.replace("\n", ""))

  test("distributed fact table matches the reference loop on 3 random fixtures") {
    Seq(11, 42, 2026).foreach { seed =>
      val races = genRaces(new Random(seed))
      val (resJson, pitJson) = toJson(races)
      val fact = Ergast.factTable(
        spark.read.schema(Ergast.raceInfoSchema).json(spark.createDataset(raceInfoJson(races))),
        spark.read.schema(Ergast.resultsSchema).json(spark.createDataset(resJson)),
        spark.read.schema(Ergast.pitstopsSchema).json(spark.createDataset(pitJson)))
      val got = fact.select(col("year"), col("round"), col("driverId"),
          col("totalPoints"), col("time"), col("pitStops"), col("position"),
          col("fastestLapTime"), col("constructorName").as("cons"))
        .as[Expected].collect()
        .map(e => (e.year, e.round, e.driverId) -> e).toMap
      val expected = referenceModel(races)
      assert(got.size === expected.size, s"seed $seed: row count")
      expected.foreach { e =>
        val g = got((e.year, e.round, e.driverId))
        assert(g.totalPoints === e.totalPoints, s"seed $seed $e vs $g: totalPoints")
        assert(g.time === e.time, s"seed $seed ${e.driverId} r${e.round}: time")
        assert(g.pitStops === e.pitStops, s"seed $seed $e: pitStops")
        assert(g.position === e.position, s"seed $seed $e: position")
        assert(g.fastestLapTime === e.fastestLapTime, s"seed $seed $e: flap")
        assert(g.cons === e.cons, s"seed $seed $e: constructor (mid-season swap)")
      }
    }
  }
}

object F1DifferentialSpec {
  case class GenResult(driverId: String, given: String, family: String,
      cons: String, points: Double, position: String, time: Option[String],
      flap: Option[String])
  case class GenRace(year: Int, round: Int, results: Seq[GenResult],
      pitstops: Seq[(String, Int)]) // (driverId, n stops)
  // top-level: Encoders can't reach inner classes of the suite
  case class Expected(year: Long, round: String, driverId: String,
      totalPoints: Double, time: String, pitStops: Long, position: String,
      fastestLapTime: String, cons: String)
}

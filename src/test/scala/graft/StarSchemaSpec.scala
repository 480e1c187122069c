package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.app.StarSchema
import graft.pipeline.{JourneyJob, Schemas}

/** End-to-end star-schema materialization: init + two weekly increments
  * against a temp warehouse, dashboard + integrity queries over the WRITTEN
  * tables, and weekly-rerun idempotence. */
class StarSchemaSpec extends AnyFunSuite with SharedSpark {

  private val fx = "/root/repo/fixtures"

  private def buildWarehouse(): String = {
    val w = Files.createTempDirectory("graft-star").toString
    StarSchema.init(spark, w, s"$fx/stations.csv", s"$fx/weather_v1.json",
      Schemas.weatherRoot(withSevererisk = true))
    val journey = JourneyJob.transform(spark, s"$fx/journey.csv")
    val cut = to_date(lit("2021-01-25"))
    StarSchema.weekly(spark, w, journey.filter(col("weather_date") < cut))
    StarSchema.weekly(spark, w, journey.filter(col("weather_date") >= cut))
    w
  }

  private def tableRows(w: String): Map[String, Set[String]] =
    Seq(StarSchema.factJourney(w), StarSchema.dimStation(w),
      StarSchema.dimWeather(w), StarSchema.dimDatetime(w)).map { p =>
      val df = spark.read.parquet(p)
      p -> df.select(df.columns.sorted.map(col): _*)
        .collect().map(_.toString).toSet
    }.toMap

  test("init + 2 weekly runs materialize the full star schema; rerunning a week changes nothing") {
    val w = buildWarehouse()
    val fact = spark.read.parquet(StarSchema.factJourney(w))
    assert(fact.count() == 24) // every fixture journey landed exactly once
    assert(fact.columns.contains("weather_date")) // partition column readable
    val before = tableRows(w)

    // rerun week 2 (same batch): every table must be row-identical
    val journey = JourneyJob.transform(spark, s"$fx/journey.csv")
    StarSchema.weekly(spark, w,
      journey.filter(col("weather_date") >= to_date(lit("2021-01-25"))))
    assert(tableRows(w) == before)
  }

  test("fact_journey is laid out as weather_date partitions and merges touch only their dates") {
    val w = buildWarehouse()
    val dirs = new java.io.File(StarSchema.factJourney(w))
      .listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.forall(_.startsWith("weather_date=")))
    assert(dirs.contains("weather_date=2021-01-15") && dirs.contains("weather_date=2021-02-10"))
  }

  test("ridesByStation role-plays dim_station over both endpoints with a broadcast join") {
    val w = buildWarehouse()
    val out = StarSchema.ridesByStation(spark, w, k = 10)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dim join not broadcast:\n$plan")
    val rows = out.collect()
    assert(rows.length == 10)
    // every journey contributes one start + one end across the full table
    val all = StarSchema.ridesByStation(spark, w, k = 1000).collect()
    assert(all.map(_.getAs[Long]("n_starts")).sum == 24)
    assert(all.map(_.getAs[Long]("n_ends")).sum == 24)
    // station 9 has a NULL name in the dim -> surfaces as the Unknown bucket
    assert(all.exists(_.getAs[String]("station_name") == "Unknown"))
  }

  test("catchup ingests only not-yet-ingested logical weeks, in order, idempotently") {
    val w = Files.createTempDirectory("graft-star").toString
    StarSchema.init(spark, w, s"$fx/stations.csv", s"$fx/weather_v1.json",
      Schemas.weatherRoot(withSevererisk = true))
    // date-keyed raw zone: split the fixture into two weekly files
    val raw = Files.createTempDirectory("graft-raw").toString
    val lines = scala.io.Source.fromFile(s"$fx/journey.csv").getLines().toVector
    val (header, body) = (lines.head, lines.tail)
    def writeWeek(date: String, rows: Seq[String]): Unit = {
      val d = new java.io.File(s"$raw/$date"); d.mkdirs()
      Files.write(java.nio.file.Paths.get(s"$raw/$date/journey.csv"),
        (header +: rows).mkString("\n").getBytes)
    }
    writeWeek("2021-01-18", body.take(12))
    writeWeek("2021-01-25", body.slice(12, 20))

    assert(StarSchema.catchup(spark, w, raw) == Seq("2021-01-18", "2021-01-25"))
    assert(spark.read.parquet(StarSchema.factJourney(w)).count() == 20)
    // rerun: ledger makes it a no-op
    assert(StarSchema.catchup(spark, w, raw).isEmpty)
    assert(spark.read.parquet(StarSchema.factJourney(w)).count() == 20)
    // a new week arrives: only it is ingested
    writeWeek("2021-02-01", body.drop(20))
    assert(StarSchema.catchup(spark, w, raw) == Seq("2021-02-01"))
    assert(spark.read.parquet(StarSchema.factJourney(w)).count() == 24)
    assert(StarSchema.ingestedDates(spark, w) ==
      Set("2021-01-18", "2021-01-25", "2021-02-01"))
  }

  test("date filters on the written fact prune to the matching partitions") {
    val w = buildWarehouse()
    val pruned = spark.read.parquet(StarSchema.factJourney(w))
      .filter(col("weather_date") === to_date(lit("2021-01-15")))
    val plan = pruned.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("weather_date"),
      s"no partition filter pushed to the fact scan:\n$plan")
    assert(pruned.count() == 3) // the three Jan-15 journeys only
  }

  test("integrityReport is all-zero on a correctly merged warehouse") {
    val w = buildWarehouse()
    val r = StarSchema.integrityReport(spark, w).collect().head
    (0 until r.length).foreach { i =>
      assert(r.getLong(i) == 0L, s"violation count ${r.schema.fieldNames(i)} nonzero")
    }
  }
}

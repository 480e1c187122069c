package graft

import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** THE fixture timestamp contract, as one obvious test.
  *
  * The driver regenerates /root/testdata between rounds and has already
  * changed the events.ts physical type once (r7: INT64 TIMESTAMP(NANOS),
  * r8: TIMESTAMP(MICROS) isAdjustedToUTC=false → Spark TIMESTAMP_NTZ) —
  * which silently broke six queries and two suites because the streaming
  * readers hardcoded the old vintage. graft.sources.Tables.load /
  * loadStream now normalize every vintage to plain TimestampType; this
  * spec pins that contract so the NEXT silent regeneration fails exactly
  * one clearly-named test instead of a scatter of downstream queries.
  */
class FixtureContractSpec extends AnyFunSuite with SharedSpark {
  private val sf = "/root/testdata/sf0.001"

  private def assertAllTimestampsUsable(name: String): Unit = {
    val df = sources.Tables.load(spark, sf, name)
    val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType).map(_.name)
    assert(ntz.isEmpty,
      s"$name: normalization left TIMESTAMP_NTZ columns ${ntz.mkString(",")} " +
        "— unix_micros()/timestamp-arithmetic sites will throw")
  }

  test("events.ts normalizes to TimestampType (batch)") {
    val df = sources.Tables.events(spark, sf)
    assert(df.schema("ts").dataType == TimestampType,
      s"events.ts is ${df.schema("ts").dataType}; the fixture vintage changed " +
        "and Tables.normalizeTimestamps no longer covers it")
  }

  test("events.ts normalizes to TimestampType (streaming reader)") {
    val stream = sources.Tables.loadStream(spark, sf, "events")
    assert(stream.isStreaming, "loadStream must produce a streaming DataFrame")
    assert(stream.schema("ts").dataType == TimestampType,
      s"streaming events.ts is ${stream.schema("ts").dataType}")
  }

  test("lineitem.l_shipdate and orders.o_orderdate normalize to TimestampType") {
    assert(sources.Tables.lineitem(spark, sf).schema("l_shipdate").dataType == TimestampType)
    assert(sources.Tables.orders(spark, sf).schema("o_orderdate").dataType == TimestampType)
  }

  test("no table surfaces a TIMESTAMP_NTZ column after load") {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(assertAllTimestampsUsable)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{CoPurchaseGraph, Tables}

/** The shared written co-purchase edge table: contents equal the direct
  * derivation, the memo serves one build per (JVM, dir), and reset()
  * forces a rebuild. */
class CoPurchaseGraphSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  private def derived() = Tables.lineitem(spark, dir)
    .select("l_orderkey", "l_partkey")
    .groupBy("l_orderkey")
    .agg(collect_set(col("l_partkey")).as("ps"))
    .select(explode(col("ps")).as("pa"), col("ps"))
    .select(col("pa"), explode(col("ps")).as("pb"))
    .filter(col("pa") < col("pb"))
    .groupBy("pa", "pb").agg(count(lit(1)).as("norders"))

  test("written table equals the direct derivation row-for-row") {
    CoPurchaseGraph.reset()
    val table = CoPurchaseGraph.weighted(spark, dir)
    val direct = derived()
    assert(table.count() == direct.count())
    assert(table.except(direct).count() == 0 && direct.except(table).count() == 0)
  }

  test("memo: second read serves the same written path; reset forces a new one") {
    val p1 = CoPurchaseGraph.path(spark, dir)
    val p2 = CoPurchaseGraph.path(spark, dir)
    assert(p1 == p2)
    CoPurchaseGraph.reset()
    assert(!new java.io.File(p1).exists, "reset must drop the written table")
    val p3 = CoPurchaseGraph.path(spark, dir)
    assert(p3 != p1 && new java.io.File(p3).exists)
  }

  test("distinctEdges is canonical pa < pb with no duplicates") {
    val e = CoPurchaseGraph.distinctEdges(spark, dir)
    assert(e.filter(col("pa") >= col("pb")).count() == 0)
    assert(e.count() == e.distinct().count())
  }
}

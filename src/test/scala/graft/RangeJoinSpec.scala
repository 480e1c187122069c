package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

/** Bucketized range-containment join: inclusive bounds, keyed isolation,
  * multi-bucket intervals, no pair duplication, no nested-loop plan. */
class RangeJoinSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("matches exactly the containing intervals, inclusively, per key") {
    val points = Seq(
      (1L, 1L, ts(3600)),      // == start of interval A -> inclusive
      (2L, 1L, ts(10800)),     // == end of interval A -> inclusive
      (3L, 1L, ts(10801)),     // one second past A's end -> no match
      (4L, 2L, ts(5000))       // other key: interval A invisible
    ).toDF("point_id", "user_id", "ts")
    // interval A spans 3 one-hour buckets (1h..3h); B overlaps A's key-2 twin
    val intervals = Seq(
      (100L, 1L, ts(3600), ts(10800)),
      (101L, 2L, ts(4000), ts(6000)),
      (102L, 2L, ts(4500), ts(5500))
    ).toDF("iv_id", "user_id", "start", "end")

    val out = RangeJoin.containsJoin(points, intervals, Seq("user_id"),
      "ts", "start", "end", "INTERVAL 1 HOUR")
      .select("point_id", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 100L), (2L, 100L), (4L, 101L), (4L, 102L)))
  }

  test("a point inside a multi-bucket interval matches it exactly once") {
    val points = Seq((1L, 1L, ts(7200))).toDF("point_id", "user_id", "ts")
    val intervals = Seq((100L, 1L, ts(0), ts(86400)))
      .toDF("iv_id", "user_id", "start", "end") // 25 buckets wide
    val rows = RangeJoin.containsJoin(points, intervals, Seq("user_id"),
      "ts", "start", "end", "INTERVAL 1 HOUR").collect()
    assert(rows.length == 1)
  }

  test("a dirty open-ended interval fails fast instead of exploding") {
    val points = Seq((1L, 1L, ts(100))).toDF("point_id", "user_id", "ts")
    val intervals = Seq((2L, 1L, ts(0), ts(100L * 365 * 86400))) // ~100-year span
      .toDF("iv_id", "user_id", "start", "end")
    val e = intercept[Exception] {
      RangeJoin.containsJoin(points, intervals, Seq("user_id"),
        "ts", "start", "end", "INTERVAL 1 HOUR", maxBucketsPerInterval = 1000L).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("range-join interval"),
      s"expected the targeted guard error, got: $e")
  }

  test("a degenerate end-before-start interval matches nothing") {
    val points = Seq((1L, 1L, ts(100))).toDF("point_id", "user_id", "ts")
    val intervals = Seq((2L, 1L, ts(200), ts(0))).toDF("iv_id", "user_id", "start", "end")
    assert(RangeJoin.containsJoin(points, intervals, Seq("user_id"),
      "ts", "start", "end", "INTERVAL 1 HOUR").count() == 0)
  }

  test("plans an equi join on (keys, bucket), never a nested loop") {
    val points = Seq((1L, 1L, ts(100))).toDF("point_id", "user_id", "ts")
    val intervals = Seq((2L, 1L, ts(0), ts(200))).toDF("iv_id", "user_id", "start", "end")
    val plan = RangeJoin.containsJoin(points, intervals, Seq("user_id"),
      "ts", "start", "end", "INTERVAL 1 HOUR")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop range join detected:\n$plan")
  }
}

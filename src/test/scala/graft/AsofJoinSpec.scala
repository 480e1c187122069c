package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin

/** As-of join semantics: inclusive boundary, latest-wins, keyed isolation,
  * null when nothing precedes, deterministic equal-ts tie-break. */
class AsofJoinSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("asof picks the latest right row at-or-before each left row, per key") {
    val left = Seq(
      (10L, 1L, ts(100)), // after r@50 -> 50
      (11L, 1L, ts(200)), // exactly at r@200 -> inclusive
      (12L, 1L, ts(49)),  // before any right row -> null
      (13L, 2L, ts(500))  // key 2 has no right rows at all -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (90L, 1L, ts(50), 5.0),
      (91L, 1L, ts(200), 7.0),
      (92L, 3L, ts(10), 9.0) // other key, never visible to user 1/2
    ).toDF("event_id", "user_id", "ts", "value")
      .select("user_id", "ts", "event_id", "value")

    val out = AsofJoin.asof(left, right, Seq("user_id"), "ts", "ts", "event_id", Seq("value"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.toString), Option(r.get(4)))).toMap

    assert(out(10L) == (Some(ts(50).toString), Some(5.0)))
    assert(out(11L) == (Some(ts(200).toString), Some(7.0))) // inclusive boundary
    assert(out(12L) == (None, None))
    assert(out(13L) == (None, None))
  }

  test("equal-timestamp right rows resolve deterministically (min right id wins)") {
    val left = Seq((1L, 7L, ts(100))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (52L, 7L, ts(100), 222.0), // same ts, higher id -> dropped by dedup
      (51L, 7L, ts(100), 111.0)
    ).toDF("event_id", "user_id", "ts", "value")
      .select("user_id", "ts", "event_id", "value")
    val out = AsofJoin.asof(left, right, Seq("user_id"), "ts", "ts", "event_id", Seq("value"))
      .collect().head
    assert(out.getDouble(4) == 111.0)
  }

  test("sessionize: new session after a gap > threshold, per key, 1-based") {
    val d = Seq(
      (1L, 1L, ts(0)),     // session 1
      (2L, 1L, ts(1700)),  // 28m20s later -> same session
      (3L, 1L, ts(3600)),  // 31m40s after event 2 -> session 2
      (4L, 1L, ts(3700)),  // session 2
      (5L, 2L, ts(3600))   // other user -> own session 1
    ).toDF("event_id", "user_id", "ts")
    val out = graft.operators.Sessionize.assignSessions(
      d, Seq("user_id"), "ts", "event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("asof plans one keyed window over a union — no range/nested-loop join") {
    val left = Seq((1L, 1L, ts(10))).toDF("event_id", "user_id", "ts")
    val right = Seq((2L, 1L, ts(5), 1.0)).toDF("event_id", "user_id", "ts", "value")
      .select("user_id", "ts", "event_id", "value")
    val plan = AsofJoin.asof(left, right, Seq("user_id"), "ts", "ts", "event_id", Seq("value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range-join blowup detected:\n$plan")
    assert(plan.contains("Window"), s"expected window formulation:\n$plan")
  }
}

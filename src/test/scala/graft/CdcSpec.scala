package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cdc

/** CDC apply: latest-seq-per-key wins, deletes remove, upserts insert-or-
  * replace, idempotent re-application, and the winner pick is a partial
  * aggregate (no rank window over the batch). */
class CdcSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("id", "name", "price")

  // per key: 2 → update; 3 → update then delete; 4 → delete then re-upsert;
  // 5 → pure insert; 1 untouched
  private def changes = Seq(
    (2L, "b2", 21.0, 1L, "U"),
    (3L, "c2", 31.0, 1L, "U"), (3L, "c3", 32.0, 2L, "D"),
    (4L, "d4", 40.0, 1L, "D"), (4L, "d5", 45.0, 2L, "U"),
    (5L, "e", 50.0, 1L, "U"))
    .toDF("id", "name", "price", "__seq", "__op")

  test("ordered merge: update, delete-after-update, resurrect, insert") {
    val out = Cdc.applyChanges(base, changes, Seq("id"), "__seq", "__op")
      .sort("id").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq(
      (1L, "a", 10.0), (2L, "b2", 21.0), (4L, "d5", 45.0), (5L, "e", 50.0)))
  }

  test("re-applying the same batch is a no-op (idempotent)") {
    val once = Cdc.applyChanges(base, changes, Seq("id"), "__seq", "__op")
    val twice = Cdc.applyChanges(once, changes, Seq("id"), "__seq", "__op")
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("empty batch leaves the base unchanged") {
    val out = Cdc.applyChanges(base, changes.limit(0), Seq("id"), "__seq", "__op")
    assert(out.exceptAll(base).isEmpty && base.exceptAll(out).isEmpty)
  }

  test("winner selection is an aggregate, not a window") {
    val plan = Cdc.applyChanges(base, changes, Seq("id"), "__seq", "__op")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected no Window in:\n$plan")
  }
}

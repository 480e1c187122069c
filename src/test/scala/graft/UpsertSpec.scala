package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Upsert

/** Merge semantics (SURVEY.md §7.5 #1) and the NOT IN vs left_anti null trap
  * (§2.3 F3). */
class UpsertSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def target = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
  private def updates = Seq((2, "B"), (4, "D")).toDF("k", "v")

  test("merge: updates win on collision, unmatched target rows survive") {
    val m = Upsert.merge(target, updates, Seq("k")).sort("k").as[(Int, String)].collect()
    assert(m.toSeq == Seq((1, "a"), (2, "B"), (3, "c"), (4, "D")))
  }

  test("merge is idempotent: merge(merge(t,u,k),u,k) == merge(t,u,k)") {
    val once = Upsert.merge(target, updates, Seq("k"))
    val twice = Upsert.merge(once, updates, Seq("k"))
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("merge rejects mismatched schemas") {
    val bad = Seq((1, "x", 0)).toDF("k", "v", "extra")
    assertThrows[IllegalArgumentException](Upsert.merge(target, bad, Seq("k")))
  }

  test("dedupByKey keeps exactly the orderCols-first row per key") {
    val df = Seq((1, "z"), (1, "a"), (2, "m")).toDF("k", "v")
    val d = Upsert.dedupByKey(df, Seq("k"), Seq("v")).sort("k").as[(Int, String)].collect()
    assert(d.toSeq == Seq((1, "a"), (2, "m")))
  }

  test("NOT IN with a NULL in the subquery returns NO rows; left_anti differs") {
    val left = Seq(1, 2, 3).toDF("x")
    val right = Seq(Some(2), None).toDF("y")
    left.createOrReplaceTempView("l")
    right.createOrReplaceTempView("r")
    val notIn = spark.sql("SELECT x FROM l WHERE x NOT IN (SELECT y FROM r)")
    assert(notIn.count() == 0) // SQL three-valued logic: x <> NULL is unknown
    val anti = left.join(right, col("x") === col("y"), "left_anti")
    assert(anti.as[Int].collect().sorted.toSeq == Seq(1, 3))
    // with a non-null subquery the two agree — the precondition the pipeline's
    // NOT IN (TABLE station_ids) relies on (station_id is never null)
    val nonNull = Seq(2).toDF("y")
    nonNull.createOrReplaceTempView("r2")
    val agree = spark.sql("SELECT x FROM l WHERE x NOT IN (SELECT y FROM r2)")
    assert(agree.as[Int].collect().sorted.toSeq == Seq(1, 3))
  }
}

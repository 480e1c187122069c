package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GuardRule

/** The runtime plan guard: warn-only by default, analysis-time error in
  * strict mode, and silent on the two healthy shapes (equi join,
  * partitioned window). Installed here via per-session
  * `experimental.extraOptimizations` (the imperative route); the
  * `spark.sql.extensions` route runs the same object. */
class GuardRuleSpec extends AnyFunSuite with SharedSpark {

  private def guardedSession(strict: Boolean) = {
    val s = spark.newSession()
    s.experimental.extraOptimizations = Seq(GuardRule)
    s.conf.set(GuardRule.StrictKey, strict.toString)
    s
  }

  private def optimize(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.optimizedPlan

  test("strict mode rejects an unconditioned cross join") {
    val s = guardedSession(strict = true)
    import s.implicits._
    val a = Seq(1L, 2L).toDF("x")
    val b = Seq(3L, 4L).toDF("y")
    val e = intercept[Exception](optimize(a.crossJoin(b)))
    assert(e.getMessage.contains("graft guard"), e.getMessage)
  }

  test("strict mode rejects a window with an empty partition spec") {
    val s = guardedSession(strict = true)
    import s.implicits._
    val df = Seq(1L, 2L, 3L).toDF("x")
      .withColumn("rn", row_number().over(Window.orderBy("x")))
    val e = intercept[Exception](optimize(df))
    assert(e.getMessage.contains("graft guard"), e.getMessage)
  }

  test("strict mode passes equi joins and partitioned windows untouched") {
    val s = guardedSession(strict = true)
    import s.implicits._
    val a = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val b = Seq((1L, 100L)).toDF("k", "w")
    optimize(a.join(b, "k")) // no throw
    optimize(a.withColumn("rn",
      row_number().over(Window.partitionBy("k").orderBy("v")))) // no throw
    val joined = a.join(b, "k").collect()
    assert(joined.length == 1)
  }

  test("default (non-strict) mode only warns: the cross join still runs") {
    val s = guardedSession(strict = false)
    import s.implicits._
    val a = Seq(1L, 2L).toDF("x")
    val b = Seq(3L, 4L).toDF("y")
    assert(a.crossJoin(b).count() == 4)
  }

  test("the rule never rewrites the plan") {
    val s = guardedSession(strict = false)
    import s.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b").filter(col("a") > 0)
    val withRule = df.queryExecution.optimizedPlan
    val plain = {
      val s2 = spark.newSession()
      import s2.implicits._
      Seq((1L, 2L)).toDF("a", "b").filter(col("a") > 0)
        .queryExecution.optimizedPlan
    }
    // canonicalized: expression ids differ across sessions by design
    assert(withRule.canonicalized.toString == plain.canonicalized.toString)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Salted

/** Salting must change the SHUFFLE KEYS without changing one output row. */
class SaltedSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def skewed = Seq.tabulate(400)(i =>
    (if (i < 380) "hot" else s"cold${i % 5}", i.toLong, i % 37))
    .toDF("k", "rid", "v")

  private def dim = Seq(("hot", 1), ("cold0", 2), ("cold1", 3),
    ("cold2", 4), ("cold3", 5), ("cold4", 6)).toDF("k", "w")

  test("joinSkewed returns exactly the unsalted inner join") {
    val salted = Salted.joinSkewed(skewed, dim.hint("shuffle_hash"),
      Seq("k"), salt = 4, saltBy = col("rid"))
    val plain = skewed.join(dim, Seq("k"))
    assert(salted.count() == 400)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("joinSkewed: the join shuffle is keyed on (k, __salt), not k alone") {
    // string-match because AdaptiveSparkPlanExec hides its inner plan from collect()
    val plan = Salted.joinSkewed(skewed, dim.hint("shuffle_hash"),
      Seq("k"), salt = 4, saltBy = col("rid")).queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("__salt")),
      s"expected a shuffle partitioned by __salt in:\n$plan")
  }

  test("countDistinctSkewed equals the direct per-key count-distinct") {
    val salted = Salted.countDistinctSkewed(skewed, Seq("k"), "v", salt = 4)
      .sort("k").as[(String, Long)].collect().toSeq
    val direct = skewed.groupBy("k").agg(countDistinct(col("v")).cast("long"))
      .sort("k").as[(String, Long)].collect().toSeq
    assert(salted == direct)
  }

  test("left join keeps unmatched left rows exactly once") {
    val partialDim = dim.filter(col("k") =!= "hot")
    val salted = Salted.joinSkewed(skewed, partialDim, Seq("k"),
      salt = 4, saltBy = col("rid"), joinType = "left")
    assert(salted.count() == 400)
    assert(salted.filter(col("w").isNull).count() == 380) // every hot row, once
  }
}

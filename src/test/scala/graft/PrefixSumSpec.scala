package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PrefixSum

class PrefixSumSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  // deterministic pseudo-random values: v = (17*i) % 23, sparse ids with gaps
  private def data(n: Int) =
    (0 until n).map(i => (s"src${i % 3}", i.toLong * 7 % 1000 * 1000 + i, (17L * i) % 23))
      .toDF("source", "doc_id", "n_tokens")

  private def oneTaskWindow(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum", sum(col("n_tokens")).over(w))
  }

  private def assertMatches(df: org.apache.spark.sql.DataFrame, width: Long): Unit = {
    val expected = oneTaskWindow(df)
      .select("source", "doc_id", "cum").as[(String, Long, Long)].collect().toSet
    val got = PrefixSum.inclusive(df, Seq("source"), "doc_id", "n_tokens", "cum",
      shardWidth = width)
      .select("source", "doc_id", "cum").as[(String, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("matches the single-task window cumsum across shard widths") {
    val df = data(200)
    for (w <- Seq(1L, 7L, 1000L, 1000000L)) assertMatches(df, w)
  }

  test("auto width derives from the order span and still matches") {
    assertMatches(data(150), 0L)
  }

  test("handles a single group, a single row, and an empty frame") {
    val one = Seq(("a", 5L, 42L)).toDF("source", "doc_id", "n_tokens")
    assertMatches(one, 2L)
    val empty = one.filter(col("doc_id") < 0)
    assert(PrefixSum.inclusive(empty, Seq("source"), "doc_id", "n_tokens", "cum").count() == 0)
  }

  test("plans no window partitioned by the group key alone") {
    val plan = PrefixSum.inclusive(data(50), Seq("source"), "doc_id", "n_tokens", "cum",
      shardWidth = 8L).queryExecution.executedPlan
    val bad = plan.collect {
      case w: WindowExec if w.partitionSpec.length == 1 &&
        w.partitionSpec.head.references.map(_.name).toSeq == Seq("source") => w
    }
    assert(bad.isEmpty, s"single-group window survived:\n$plan")
  }

  test("refuses an unbounded driver-side shard list") {
    intercept[IllegalArgumentException] {
      PrefixSum.inclusive(data(300), Seq("source"), "doc_id", "n_tokens", "cum",
        shardWidth = 1L, maxShardRows = 10)
    }
  }
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GlobalOrder

class GlobalOrderSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("rank equals the single-task global sort's row_number, at any bucketBits") {
    val df = (0L until 200L).toDF("id")
      .withColumn("h", graft.functions.TextFunctions.md5Long(col("id").cast("string")))
      .repartition(7)
    val expected = df
      .withColumn("pos", row_number().over(Window.orderBy(col("h"), col("id"))).cast("long"))
      .select("id", "pos").as[(Long, Long)].collect().toMap
    for (bits <- Seq(1, 8, 15)) {
      val got = GlobalOrder.rank(df, "h", "id", "pos", bucketBits = bits)
        .select("id", "pos").as[(Long, Long)].collect().toMap
      assert(got == expected, s"bucketBits=$bits diverged from the global sort")
    }
  }

  test("ranks are exactly 1..n even when hash ties occur") {
    // three rows share hash 5: tie column must break them deterministically
    val df = Seq((10L, 5L), (2L, 5L), (7L, 5L), (1L, 9L), (4L, 0L)).toDF("id", "h")
    val out = GlobalOrder.rank(df, "h", "id", "pos")
      .orderBy("pos").select("id", "pos").as[(Long, Long)].collect().toSeq
    assert(out.map(_._2) == (1L to 5L))
    assert(out.map(_._1) == Seq(4L, 2L, 7L, 10L, 1L))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Chunker

class ChunkerSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def doc(n: Int): String = (0 until n).map(i => s"t$i").mkString(" ")

  test("short docs yield one full-document chunk") {
    val out = Chunker.chunkTokens(Seq((1L, doc(10))).toDF("doc_id", "text"),
      window = 64, stride = 48).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("chunk_idx") == 0 && r.getAs[Long]("chunk_start") == 0)
    assert(r.getAs[Long]("chunk_tokens") == 10)
    assert(r.getAs[String]("chunk_text") == doc(10))
  }

  test("window/stride math: starts at k*stride, tail ANCHORED at n-window, exact coverage") {
    // n=130, W=64, S=48: lastIdx = ceil(66/48) = 2 -> starts 0, 48, min(96,66)=66
    val rows = Chunker.chunkTokens(Seq((1L, doc(130))).toDF("doc_id", "text"),
      window = 64, stride = 48)
      .orderBy("chunk_idx").collect()
    assert(rows.map(_.getAs[Long]("chunk_start")).toSeq == Seq(0L, 48L, 66L))
    assert(rows.forall(_.getAs[Long]("chunk_tokens") == 64))
    // the anchored tail ends exactly at the last token
    val tail = rows.last.getAs[String]("chunk_text").split(" ")
    assert(tail.last == "t129" && tail.length == 64 && tail.head == "t66")
    // n exactly window: single chunk
    assert(Chunker.chunkTokens(Seq((1L, doc(64))).toDF("doc_id", "text"))
      .count() == 1)
    // n = window+1: second chunk starts at 1 (anchored), not at stride
    val two = Chunker.chunkTokens(Seq((1L, doc(65))).toDF("doc_id", "text"))
      .orderBy("chunk_idx").collect()
    assert(two.map(_.getAs[Long]("chunk_start")).toSeq == Seq(0L, 1L))
  }

  test("every token is covered and consecutive chunks overlap by >= window-stride") {
    val n = 300
    val rows = Chunker.chunkTokens(Seq((1L, doc(n))).toDF("doc_id", "text"),
      window = 64, stride = 48).orderBy("chunk_idx").collect()
    val spans = rows.map(r =>
      (r.getAs[Long]("chunk_start"), r.getAs[Long]("chunk_start") + r.getAs[Long]("chunk_tokens")))
    assert(spans.head._1 == 0 && spans.last._2 == n)
    spans.sliding(2).foreach { case Array((s1, e1), (s2, _)) =>
      assert(e1 - s2 >= 64 - 48, s"overlap violated at $s1..$e1 vs $s2")
    }
  }

  test("chunking is a pure per-row projection: no Exchange in the plan") {
    val plan = Chunker.chunkTokens(Seq((1L, doc(100))).toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"shuffle found:\n$plan")
  }

  test("invalid parameters are refused loudly") {
    val df = Seq((1L, doc(10))).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunker.chunkTokens(df, stride = 0))
    intercept[IllegalArgumentException](
      Chunker.chunkTokens(df, window = 16, stride = 32))
  }
}

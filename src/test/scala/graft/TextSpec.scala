package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions._

class TextSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("wordShingles produces every k-window, distinct") {
    val out = one("a b a b a")
      .select(wordShingles(tokens(col("text")), 3).as("s"))
      .as[Seq[String]].collect().head
    assert(out == Seq("a b a", "b a b")) // 3 windows, one duplicate removed
  }

  test("surfaceTokens splits word runs and symbols like a BPE pre-tokenizer") {
    val out = one("hello, world! x-y 42")
      .select(surfaceTokens(col("text")).as("t")).as[Seq[String]].collect().head
    assert(out == Seq("hello", ",", "world", "!", "x", "-", "y", "42"))
  }

  test("polyFingerprint matches the reference fold") {
    // fold over ascii codes: ((0*31+97)*31+98)*31+99 mod 1e9+7
    val expected = (("abc".foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)))
    val out = one("abc").select(polyFingerprint(col("text")).as("fp"))
      .as[Long].collect().head
    assert(out == expected)
  }

  test("lexiconHits counts token occurrences including repeats") {
    val out = one("the cat the dog a fish")
      .select(lexiconHits(tokens(col("text")), Seq("the", "a")).as("n"))
      .as[Int].collect().head
    assert(out == 3)
  }

  test("md5Long/md5Int are stable and in range") {
    val r = one("abc").select(md5Long(col("text")).as("l"), md5Int(col("text")).as("i"))
      .collect().head
    // first 15 / 8 hex chars of md5("abc") = 900150983cd24fb0d6963f7d28e17f72
    assert(r.getAs[Long]("l") == java.lang.Long.parseLong("900150983cd24fb", 16))
    assert(r.getAs[Long]("i") == java.lang.Long.parseLong("90015098", 16))
  }

  test("q160 skip-gram PMI equals a naive single-JVM recompute on real fixture data") {
    val sf = "/root/testdata/sf0.001"
    // naive: every unordered within-±3 pair from every doc, exact BigInt score
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(lower(col("text"))).as[String].collect()
    val uni = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val cab = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    for (d <- docs) {
      val w = d.split(" ", -1) // keep empty tokens: split(lower(text), ' ') does
      w.foreach(t => uni(t) += 1)
      for (i <- w.indices; o <- 1 to 3 if i + o < w.length) {
        val (a, b) =
          if (w(i) <= w(i + o)) (w(i), w(i + o)) else (w(i + o), w(i))
        cab((a, b)) += 1
      }
    }
    val t = BigInt(uni.values.sum)
    val expected = cab.iterator
      .filter { case ((a, b), _) => uni(a) >= 20 && uni(b) >= 20 }
      .map { case ((a, b), c) =>
        (a, b, c, ((BigInt(c) * t * t * 1000) / (BigInt(uni(a)) * uni(b))).toLong)
      }.toSeq
      .sortBy { case (a, b, _, s) => (-s, a, b) }.take(50)
    val got = graft.queries.LlmQueries.q160PmiPairs(spark, sf)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == expected)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrain

/** BPE training checked two ways: the distributed trainer must equal a
  * naive in-memory trainer (same greedy-replace merge semantics, same
  * deterministic argmax) on ANY corpus, and the bracketed-encoding helpers
  * must round-trip. The naive trainer here is the executable form of the
  * greedy-left-to-right spec in [[BpeTrain]]'s object doc. */
class BpeSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  /** Reference trainer: plain Scala, one (seq, cnt) pair per distinct
    * word, `String.replace` = greedy merge over the bracketed encoding. */
  private def naiveTrain(words: Map[String, Long],
                         numMerges: Int): Seq[(Int, String, String, String, Long)] = {
    var vocab = words.toSeq.map { case (w, c) => (w.map(ch => s"<$ch>").mkString, c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    val sym = "<([a-z]+)>".r
    var step = 1
    var stop = false
    while (step <= numMerges && !stop) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((seq, c) <- vocab) {
        val syms = sym.findAllMatchIn(seq).map(_.group(1)).toIndexedSeq
        syms.zip(syms.drop(1)).foreach(p => pc(p) = pc.getOrElse(p, 0L) + c)
      }
      if (pc.isEmpty) stop = true
      else {
        val ((l, r), c) = pc.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((step, l, r, l + r, c))
        vocab = vocab.map { case (seq, cnt) => (seq.replace(s"<$l><$r>", s"<$l$r>"), cnt) }
        step += 1
      }
    }
    out.toSeq
  }

  private val genCorpus: Gen[List[String]] =
    Gen.choose(1, 12).flatMap(nDocs =>
      Gen.listOfN(nDocs, Gen.choose(0, 8).flatMap(nWords =>
        Gen.listOfN(nWords, Gen.choose(1, 5).flatMap(len =>
          Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)))
          .map(_.mkString(" ")))))

  test("train equals the naive in-memory trainer on any corpus") {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6).withWorkers(1),
      Prop.forAll(genCorpus) { docs =>
        val df = docs.toDF("text")
        val got = BpeTrain.trainOnText(spark, df, "text", numMerges = 5)
          .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toSeq
        val wf = docs.flatMap("[a-z]+".r.findAllIn(_))
          .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
        got == naiveTrain(wf, 5)
      })
    assert(res.passed, s"bpe property failed: ${res.status}")
  }

  test("merges stop early when no adjacent pair is left") {
    // single-character words only: zero adjacent pairs, zero merges
    val df = Seq("a b c", "a a").toDF("text")
    assert(BpeTrain.trainOnText(spark, df, "text", numMerges = 4).count() == 0)
  }

  test("merged symbols keep merging in later rounds (multi-char units)") {
    // 'aaaa' x 3: round 1 merges (a,a) -> aa twice per word; round 2
    // merges (aa,aa); counts follow the greedy non-overlapping scan.
    val df = Seq.fill(3)("aaaa").toDF("text")
    val got = BpeTrain.trainOnText(spark, df, "text", numMerges = 2)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1, "a", "a", "aa", 9L), (2, "aa", "aa", "aaaa", 3L)))
  }

  test("initialSeq/symbols round-trip the bracketed encoding") {
    val got = Seq("word").toDF("w")
      .select(BpeTrain.symbols(BpeTrain.initialSeq(col("w"))).as("s"))
      .as[Seq[String]].head()
    assert(got == Seq("w", "o", "r", "d"))
  }
}

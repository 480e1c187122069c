package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Fuzzy

/** FastSS deletion-neighborhood correctness: the equi-join candidates must
  * cover EVERY edit-distance-1 pair (deletion, insertion, substitution —
  * and equal-length swaps are distance 2, correctly excluded). */
class FuzzySpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val corpus = Seq(
    "kitten", "sitten",  // substitution
    "kitte",             // deletion
    "kittten",           // insertion (of t)
    "ktiten",            // transposition — distance 2, must NOT pair with kitten
    "banana", "bananas", "banan", "bonana",
    "apple", "maple", "ample",
    "x", "xy", "y", "")

  test("pairs equal the brute-force levenshtein<=1 answer exactly") {
    val df = corpus.toDF("str")
    val got = Fuzzy.editDistance1Pairs(df, "str").as[(String, String)].collect().toSet
    val want = (for {
      a <- corpus; b <- corpus if a < b
      if levenshteinRef(a, b) <= 1
    } yield (a, b)).toSet
    assert(got == want, s"missed ${want -- got}, spurious ${got -- want}")
    assert(want.contains(("kitten", "sitten")) && want.contains(("kitte", "kitten")) &&
      want.contains(("kitten", "kittten")), "fixture must exercise all three edit kinds")
    assert(!got.contains(("kitten", "ktiten")), "transposition is distance 2")
  }

  test("strings longer than 1000 chars still pair (no suffix truncation)") {
    // deletion variants are built by splicing prefix + suffix; a fixed-cap
    // suffix silently corrupted variants past the cap, missing genuine
    // pairs whose differing position sits beyond it
    val base = ("abcdefghij" * 150) // 1500 chars
    val sub = base.updated(1200, 'Z') // substitution at position 1200
    val del = base.substring(0, 1300) + base.substring(1301) // deletion at 1300
    val far = base.updated(10, 'Q').updated(1400, 'R') // distance 2
    val got = Fuzzy.editDistance1Pairs(Seq(base, sub, del, far).toDF("str"), "str")
      .as[(String, String)].collect().toSet
    val want = Set((base, sub), (base, del)).map { case (a, b) =>
      if (a < b) (a, b) else (b, a)
    }
    assert(got == want, s"long-string pairs wrong: got ${got.size}, want ${want.size}")
  }

  test("the candidate stage is an equi-join, not a cross") {
    val plan = Fuzzy.editDistance1Pairs(corpus.toDF("str"), "str")
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join fell back to all-pairs:\n$plan")
  }

  /** Reference Levenshtein (classic DP) — test-only. */
  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}

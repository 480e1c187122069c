package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skyline

/** The two-phase sort-scan must agree with the quadratic dominance
  * definition on every input — including the degenerate shapes the scan's
  * group/strict bookkeeping exists for: ties on one axis, exact
  * duplicates, fully correlated (skyline of 1) and fully anti-correlated
  * (everything survives) data. */
class SkylineSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def engine(pts: Seq[(Long, Long, Long)], parts: Int): Set[(Long, Long, Long)] =
    Skyline.skyline2D(
        spark.createDataset(pts).repartition(parts).toDF("id", "hi", "lo"),
        "id", "hi", "lo")
      .as[(Long, Long, Long)].collect().toSet

  /** Literal quadratic transcription of the dominance definition. */
  private def brute(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter { case (_, hi, lo) =>
      !pts.exists { case (_, h2, l2) =>
        h2 >= hi && l2 <= lo && (h2 > hi || l2 < lo)
      }
    }.toSet

  test("random points match the quadratic definition across partitionings") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val pts = Seq.tabulate(120) { i =>
        (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)
      }
      for (parts <- Seq(1, 3, 8)) {
        assert(engine(pts, parts) == brute(pts), s"trial $trial, $parts partitions")
      }
    }
  }

  test("ties on one axis: only the cheapest of an hi-group survives") {
    val pts = Seq((1L, 10L, 5L), (2L, 10L, 3L), (3L, 10L, 7L), (4L, 2L, 1L))
    assert(engine(pts, 2) == Set((2L, 10L, 3L), (4L, 2L, 1L)))
  }

  test("exact duplicates all survive — dominance needs a strict edge") {
    val pts = Seq((1L, 10L, 3L), (2L, 10L, 3L), (3L, 4L, 9L))
    assert(engine(pts, 2) == Set((1L, 10L, 3L), (2L, 10L, 3L)))
  }

  test("correlated data collapses to one point; anti-correlated keeps all") {
    val corr = Seq.tabulate(20)(i => (i.toLong, i.toLong, 100L - i))
    assert(engine(corr, 4) == Set((19L, 19L, 81L)))
    val anti = Seq.tabulate(20)(i => (i.toLong, i.toLong, i.toLong))
    assert(engine(anti, 4) == brute(anti))
    assert(engine(anti, 4).size == 20)
  }

  test("single point and empty input") {
    assert(engine(Seq((1L, 5L, 5L)), 3) == Set((1L, 5L, 5L)))
    assert(engine(Seq.empty, 1) == Set.empty)
  }
}

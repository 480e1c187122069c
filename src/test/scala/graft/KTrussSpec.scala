package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.KTruss

/** KTruss vs a naive single-JVM peel on hand graphs + a random graph. */
class KTrussSpec extends AnyFunSuite with SharedSpark {

  private def naiveTruss(edges: Set[(Long, Long)], k: Int): Map[(Long, Long), Long] = {
    var cur = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 != e._2)
    def sup(es: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      val adj = es.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
        .map { case (n, ps) => n -> ps.map(_._2) }
      es.toSeq.map { case (a, b) =>
        (a, b) -> adj.getOrElse(a, Set.empty).intersect(adj.getOrElse(b, Set.empty)).size.toLong
      }.toMap
    }
    var done = false
    while (!done) {
      val s = sup(cur)
      val next = cur.filter(e => s(e) >= k - 2)
      done = next == cur
      cur = next
    }
    val fin = sup(cur)
    cur.map(e => e -> fin(e)).toMap
  }

  private def run(edges: Seq[(Long, Long)], k: Int): Map[(Long, Long), Long] = {
    import spark.implicits._
    KTruss.kTruss(edges.toDF("pa", "pb"), "pa", "pb", k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("two triangles sharing an edge: 3-truss keeps all, 4-truss keeps the shared core only when supported") {
    // triangles (1,2,3) and (2,3,4) share edge (2,3): every edge has
    // support 1 except (2,3) with 2 — a 4-truss (support >= 2) peels the
    // outer edges, after which (2,3) loses its witnesses and dies too
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(run(g, 3) == naiveTruss(g.toSet, 3))
    assert(run(g, 3).keySet == g.toSet)
    assert(run(g, 4) == naiveTruss(g.toSet, 4))
    assert(run(g, 4).isEmpty) // the cascade is the point
  }

  test("K5 is a 5-truss; K4 plus a pendant triangle peels to K4 at k=4") {
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    assert(run(k5, 5) == naiveTruss(k5.toSet, 5))
    assert(run(k5, 5).size == 10) // all of K5 survives (support 3 each)
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)) ++
      Seq((4L, 10L), (4L, 11L), (10L, 11L))
    val got = run(k4, 4)
    assert(got == naiveTruss(k4.toSet, 4))
    assert(got.keySet == (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)).toSet)
  }

  test("deterministic pseudo-random graph matches the naive peel, dup/reversed edges collapsed") {
    val es = (0 until 300).map { i =>
      val a = (i * 7919L) % 23
      val b = (i * 104729L + 3) % 23
      (a, b)
    }.filter(e => e._1 != e._2)
    val withNoise = es ++ es.take(40).map(_.swap) // duplicates reversed
    assert(run(withNoise, 4) == naiveTruss(es.toSet, 4))
  }

  test("non-convergence within maxRounds fails loudly") {
    import spark.implicits._
    // a long triangle chain cascades one edge-layer per round
    val chain = (1L to 12L).flatMap(i => Seq((i, i + 1), (i, i + 2)))
    val e = intercept[IllegalStateException](
      KTruss.kTruss(chain.toDF("pa", "pb"), "pa", "pb", k = 4, maxRounds = 1)
        .collect())
    assert(e.getMessage.contains("fixpoint"))
  }
}

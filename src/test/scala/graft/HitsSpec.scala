package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Hits

/** The fixed-round integer HITS recurrence has exactly one right answer
  * per edge list; a naive single-JVM evaluator replays it. */
class HitsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def naive(edges: Seq[(Long, Long)], rounds: Int): Set[(String, Long, Long)] = {
    val e = edges.distinct
    var auth: Map[Long, Long] = e.map(_._2).distinct.map(_ -> Hits.One).toMap
    var hub: Map[Long, Long] = Map.empty
    def rescale(m: Map[Long, Long]): Map[Long, Long] = {
      val mx = m.values.max
      m.map { case (k, v) => k -> v * Hits.One / mx }
    }
    for (_ <- 1 to rounds) {
      hub = rescale(e.groupBy(_._1).map { case (s, es) =>
        s -> es.map(x => auth(x._2)).sum
      })
      auth = rescale(e.groupBy(_._2).map { case (p, es) =>
        p -> es.map(x => hub(x._1)).sum
      })
    }
    hub.map { case (k, v) => ("hub", k, v) }.toSet ++
      auth.map { case (k, v) => ("auth", k, v) }
  }

  private def run(edges: Seq[(Long, Long)], rounds: Int): Set[(String, Long, Long)] =
    Hits.scores(edges.toDF("s", "p"), "s", "p", rounds)
      .as[(String, Long, Long)].collect().toSet

  test("a star: the center is the sole max hub, its leaves tie as authorities") {
    // supplier 1 -> parts 10,11,12; supplier 2 -> part 10
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L))
    val got = run(edges, 2)
    assert(got == naive(edges, 2))
    val hubs = got.filter(_._1 == "hub")
    assert(hubs.maxBy(_._3)._2 == 1L)
    assert(hubs.find(_._2 == 1L).get._3 == Hits.One)
  }

  test("matches the naive evaluator on a random bipartite multigraph") {
    var x = 3L
    def nxt(m: Long) = { x = (x * 6364136223846793005L + 1442695040888963407L); math.floorMod(x >>> 33, m) }
    val edges = Seq.fill(300)((nxt(15), 100L + nxt(40)))
    assert(run(edges, 3) == naive(edges, 3))
  }

  test("duplicate edges collapse before scoring") {
    val once = Seq((1L, 10L), (2L, 10L), (2L, 11L))
    val dup = once ++ once ++ once
    assert(run(dup, 2) == run(once, 2))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CheapestPath

/** Min-plus distances have one right answer per graph; the cases force the
  * interesting choices: a cheap detour beating an expensive direct edge,
  * parallel edges keeping the min, and the round budget cutting a
  * relaxation short. */
class CheapestPathSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                  rounds: Int): Map[Long, Long] =
    CheapestPath.distances(edges.toDF("a", "b", "w"), "a", "b", "w",
        seeds.toDF("node"), "node", rounds)
      .as[(Long, Long)].collect().toMap

  test("a cheap two-hop detour beats an expensive direct edge — given enough rounds") {
    // 0 -9-> 2 direct; 0 -1-> 1 -2-> 2 detour (total 3)
    val edges = Seq((0L, 2L, 9L), (0L, 1L, 1L), (1L, 2L, 2L))
    assert(run(edges, Seq(0L), 1) ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 9L), "round 1 can only take direct edges")
    assert(run(edges, Seq(0L), 2) ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 3L), "round 2 must route via the detour")
  }

  test("path cost is the sum of edges, monotone along the chain") {
    val chain = Seq((0L, 1L, 3L), (1L, 2L, 9L), (2L, 3L, 5L))
    assert(run(chain, Seq(0L), 3) ==
      Map(0L -> 0L, 1L -> 3L, 2L -> 12L, 3L -> 17L))
  }

  test("parallel and reversed duplicate edges keep the cheapest link") {
    val edges = Seq((0L, 1L, 7L), (1L, 0L, 2L), (0L, 1L, 5L))
    assert(run(edges, Seq(0L), 1) == Map(0L -> 0L, 1L -> 2L))
  }

  test("two seeds: each node takes its nearest seed; unreached nodes are absent") {
    val edges = Seq((0L, 1L, 5L), (3L, 4L, 2L), (7L, 8L, 9L))
    assert(run(edges, Seq(0L, 3L), 2) ==
      Map(0L -> 0L, 3L -> 0L, 1L -> 5L, 4L -> 2L))
  }

  test("a seed on a cycle keeps distance 0 (relaxation never worsens a seed)") {
    val edges = Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 0L, 1L))
    val r = run(edges, Seq(0L), 4)
    assert(r == Map(0L -> 0L, 1L -> 1L, 2L -> 1L))
  }

  test("distances are monotone in rounds and settle at the diameter") {
    var x = 11L
    def nxt(m: Long) = { x = (x * 6364136223846793005L + 1442695040888963407L); math.floorMod(x >>> 33, m) }
    val es = Seq.fill(120)((nxt(15), nxt(15), nxt(50) + 1))
    val r3 = run(es, Seq(0L), 3)
    val r4 = run(es, Seq(0L), 4)
    val r8 = run(es, Seq(0L), 8)
    assert(r3.forall { case (n, d) => d >= r4.getOrElse(n, Long.MaxValue) },
      "distances increased with more rounds")
    assert(r4 == r8, "15-node graph not settled by round 4")
  }

  test("bit-deterministic under repartitioning") {
    var x = 23L
    def nxt(m: Long) = { x = (x * 6364136223846793005L + 1442695040888963407L); math.floorMod(x >>> 33, m) }
    val es = Seq.fill(150)((nxt(25), nxt(25), nxt(30) + 1))
    val df = es.toDF("a", "b", "w")
    val seeds = Seq(2L, 9L).toDF("node")
    val a = CheapestPath.distances(df, "a", "b", "w", seeds, "node", 3)
      .as[(Long, Long)].collect().toMap
    val b = CheapestPath.distances(df.repartition(11), "a", "b", "w", seeds, "node", 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}

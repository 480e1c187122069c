package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WidestPath

/** Max-bottleneck capacities have one right answer per graph; the cases
  * force the interesting choices: a wide detour beating a narrow direct
  * edge, parallel edges keeping the max, and the round budget cutting a
  * relaxation short. */
class WidestPathSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val Inf = WidestPath.CapInf

  private def run(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                  rounds: Int): Map[Long, Long] =
    WidestPath.capacities(edges.toDF("a", "b", "w"), "a", "b", "w",
        seeds.toDF("node"), "node", rounds)
      .as[(Long, Long)].collect().toMap

  test("a wide two-hop detour beats a narrow direct edge — given enough rounds") {
    // 0 -1-> 2 direct (width 1); 0 -9-> 1 -8-> 2 detour (bottleneck 8)
    val edges = Seq((0L, 2L, 1L), (0L, 1L, 9L), (1L, 2L, 8L))
    assert(run(edges, Seq(0L), 1) ==
      Map(0L -> Inf, 1L -> 9L, 2L -> 1L), "round 1 can only take direct edges")
    assert(run(edges, Seq(0L), 2) ==
      Map(0L -> Inf, 1L -> 9L, 2L -> 8L), "round 2 must route via the detour")
  }

  test("the bottleneck is the path's weakest edge, not its last") {
    val chain = Seq((0L, 1L, 3L), (1L, 2L, 9L), (2L, 3L, 5L))
    assert(run(chain, Seq(0L), 3) ==
      Map(0L -> Inf, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("parallel and reversed duplicate edges keep the strongest link") {
    val edges = Seq((0L, 1L, 2L), (1L, 0L, 7L), (0L, 1L, 5L))
    assert(run(edges, Seq(0L), 1) == Map(0L -> Inf, 1L -> 7L))
  }

  test("two seeds: each node takes its best seed; unreached nodes are absent") {
    //  0 -5- 1    3 -2- 4    7 isolated from both seeds
    val edges = Seq((0L, 1L, 5L), (3L, 4L, 2L), (7L, 8L, 9L))
    assert(run(edges, Seq(0L, 3L), 2) ==
      Map(0L -> Inf, 3L -> Inf, 1L -> 5L, 4L -> 2L))
  }

  test("capacities are monotone in rounds and settle at the diameter") {
    var x = 11L
    def nxt(m: Long) = { x = (x * 6364136223846793005L + 1442695040888963407L); math.floorMod(x >>> 33, m) }
    val es = Seq.fill(120)((nxt(15), nxt(15), nxt(50) + 1))
    val r3 = run(es, Seq(0L), 3)
    val r4 = run(es, Seq(0L), 4)
    val r8 = run(es, Seq(0L), 8)
    assert(r3.forall { case (n, c) => c <= r4.getOrElse(n, 0L) },
      "capacities decreased with more rounds")
    assert(r4 == r8, "15-node graph not settled by round 4")
  }

  test("bit-deterministic under repartitioning") {
    var x = 23L
    def nxt(m: Long) = { x = (x * 6364136223846793005L + 1442695040888963407L); math.floorMod(x >>> 33, m) }
    val es = Seq.fill(150)((nxt(25), nxt(25), nxt(30) + 1))
    val df = es.toDF("a", "b", "w")
    val seeds = Seq(2L, 9L).toDF("node")
    val a = WidestPath.capacities(df, "a", "b", "w", seeds, "node", 3)
      .as[(Long, Long)].collect().toMap
    val b = WidestPath.capacities(df.repartition(11), "a", "b", "w", seeds, "node", 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}

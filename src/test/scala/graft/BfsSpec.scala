package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bfs

/** BFS distances are unique, so every case has one right answer: paths
  * that stratify by hop, multiple seeds that compete for the minimum,
  * frontiers that drain early, and seeds the graph never touches. */
class BfsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
                  hops: Int): Map[Long, Long] =
    Bfs.hopDistances(edges.toDF("a", "b"), "a", "b",
        seeds.toDF("node"), "node", hops)
      .as[(Long, Long)].collect().toMap

  test("a path stratifies by hop and the budget truncates it") {
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    assert(run(path, Seq(0L), 2) == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
    assert(run(path, Seq(0L), 4) ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("two seeds: every node gets the distance to the NEAREST seed") {
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    assert(run(path, Seq(0L, 4L), 2) ==
      Map(0L -> 0L, 4L -> 0L, 1L -> 1L, 3L -> 1L, 2L -> 2L))
  }

  test("an exhausted frontier stops early with the same result") {
    // component {0,1} drains after one hop; hop budget 5 must not loop,
    // reach component {7,8}, or change the answer
    val edges = Seq((0L, 1L), (7L, 8L))
    assert(run(edges, Seq(0L), 5) == Map(0L -> 0L, 1L -> 1L))
  }

  test("isolated and duplicate seeds are distance-0 members once") {
    val edges = Seq((0L, 1L))
    assert(run(edges, Seq(0L, 42L, 42L), 2) ==
      Map(0L -> 0L, 42L -> 0L, 1L -> 1L))
  }

  test("reversed and duplicate edges collapse; self-loops are ignored") {
    val edges = Seq((1L, 0L), (0L, 1L), (1L, 1L), (1L, 2L), (2L, 1L))
    assert(run(edges, Seq(0L), 2) == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("bit-deterministic under repartitioning") {
    var x = 5L
    def nxt(m: Long) = { x = (x * 6364136223846793005L + 1442695040888963407L); math.floorMod(x >>> 33, m) }
    val es = Seq.fill(200)((nxt(29), nxt(29)))
    val df = es.toDF("a", "b")
    val seeds = Seq(1L, 7L).toDF("node")
    val a = Bfs.hopDistances(df, "a", "b", seeds, "node", 3)
      .as[(Long, Long)].collect().toMap
    val b = Bfs.hopDistances(df.repartition(13), "a", "b", seeds, "node", 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}

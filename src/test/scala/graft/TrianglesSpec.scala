package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Triangles

/** The degree-oriented wedge join must count exactly — every triangle
  * found once, every corner credited once — on graphs chosen to stress
  * the orientation: complete graphs (maximum overlap), triangle-free
  * graphs, duplicate/reversed/self-loop edge noise, and a hub pattern
  * where naive wedge enumeration at the hub would dominate. */
class TrianglesSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNodeCounts(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("K4: four triangles, each node on three of them") {
    val k4 = for { i <- 0L to 3L; j <- 0L to 3L if i < j } yield (i, j)
    assert(count(k4) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("square plus one diagonal: two triangles sharing the diagonal") {
    val sq = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L))
    assert(count(sq) == Map(0L -> 2L, 2L -> 2L, 1L -> 1L, 3L -> 1L))
  }

  test("triangle-free graphs come back empty") {
    assert(count(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))).isEmpty) // C4
    assert(count(Seq((0L, 1L), (0L, 2L), (0L, 3L))).isEmpty)          // star
    assert(count(Seq.empty).isEmpty)
  }

  test("self-loops, duplicates, and reversed edges do not change the count") {
    val noisy = Seq((0L, 1L), (1L, 0L), (0L, 1L), (1L, 2L), (0L, 2L),
      (2L, 2L), (1L, 1L))
    assert(count(noisy) == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("hub: high-degree center with one closing edge yields exactly one triangle") {
    // node 0 connects to 1..20; only (1,2) closes. Degree orientation
    // points both hub edges of the triangle INTO the hub (its (deg, id)
    // key is maximal), so the apex is node 1, not the hub — the wedge
    // join never enumerates the hub's C(20,2) neighbor pairs.
    val hub = (1L to 20L).map(i => (0L, i)) :+ (1L, 2L)
    assert(count(hub) == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

/** Fixed-point PageRank: hand-checkable structure + bit-determinism. */
class PageRankSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def nodes(ids: Long*) = ids.toDF("node")

  test("uniform cycle stays uniform (up to floor decay)") {
    val e = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L)).toDF("src", "dst", "w")
    val r = PageRank.ranks(spark, nodes(1L, 2L, 3L), e, iters = 3)
      .as[(Long, Long)].collect().toMap
    val base = PageRank.RankScale / 3
    assert(r.values.toSet.size == 1, s"cycle must stay symmetric: $r")
    assert(r(1L) <= base && r(1L) > (base * 99) / 100,
      s"floor decay must be tiny: ${r(1L)} vs base $base")
  }

  test("a sink of two spokes outranks the spokes; dangling nodes keep teleport share") {
    // 2 -> 1, 3 -> 1; node 1 dangles (no out-edges)
    val e = Seq((2L, 1L, 5L), (3L, 1L, 5L)).toDF("src", "dst", "w")
    val r = PageRank.ranks(spark, nodes(1L, 2L, 3L), e, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(r(1L) > r(2L) && r(2L) == r(3L), s"hub must dominate: $r")
    val base = PageRank.RankScale / 3
    val teleport = (15L * base) / 100L
    assert(r(2L) == teleport, s"pure-source node rank must be exactly the teleport share: $r")
  }

  test("weights matter: a 9:1 edge split ranks the heavy target higher") {
    val e = Seq((1L, 2L, 9L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val r = PageRank.ranks(spark, nodes(1L, 2L, 3L), e, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(r(2L) > r(3L), s"weighted edge must dominate: $r")
  }

  test("bit-deterministic under repartitioning and re-runs") {
    val e = Seq.tabulate(200)(i =>
      ((i % 17).toLong, (i % 13).toLong, (i % 5 + 1).toLong))
      .toDF("src", "dst", "w")
    val ns = nodes((0L until 17L): _*)
    val a = PageRank.ranks(spark, ns, e, iters = 3).as[(Long, Long)].collect().toMap
    val b = PageRank.ranks(spark, ns.repartition(7), e.repartition(11), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b, "fixed-point ranks changed under repartitioning")
  }

  test("total mass is conserved to within the documented floor loss") {
    val e = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 1L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val r = PageRank.ranks(spark, nodes(1L, 2L, 3L), e, iters = 3)
      .as[(Long, Long)].collect()
    val total = r.map(_._2).sum
    assert(total <= PageRank.RankScale &&
      total > PageRank.RankScale - 3 * 3 * 1000000L,
      s"mass off: $total vs ${PageRank.RankScale}")
  }
}

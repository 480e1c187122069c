package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LabelProp

/** Synchronous LPA is a pure function of the edge list — so it must agree
  * with a naive in-memory replay of the same rule (most frequent neighbor
  * label, ties to the smallest, simultaneous updates) on any graph, and
  * must find the obvious communities on graphs built to have them. */
class LabelPropSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    LabelProp.communities(edges.toDF("a", "b"), "a", "b", rounds)
      .as[(Long, Long)].collect().toMap

  /** The same rule, naively: synchronous argmax by (cnt DESC, label ASC). */
  private def naive(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 != e._2).distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (n, g) => n -> g.map(_._2) }
    var l = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds)
      l = adj.map { case (n, ns) =>
        val cnts = ns.groupBy(l).map { case (lab, g) => (lab, g.size) }
        n -> cnts.minBy { case (lab, c) => (-c, lab) }._1
      }
    l
  }

  test("two cliques joined by one bridge settle on one label per clique") {
    val cliqueA = for { i <- 0L to 3L; j <- 0L to 3L if i < j } yield (i, j)
    val cliqueB = for { i <- 10L to 13L; j <- 10L to 13L if i < j } yield (i, j)
    val got = run(cliqueA ++ cliqueB ++ Seq((3L, 10L)), rounds = 3)
    assert((0L to 3L).map(got).toSet.size == 1, "clique A split")
    assert((10L to 13L).map(got).toSet.size == 1, "clique B split")
    assert(got(0L) != got(13L), "the bridge merged the two cliques")
  }

  test("a star 2-cycles under synchronous updates — why the contract is fixed rounds") {
    // round 1: the hub takes the min spoke label (1), every spoke takes
    // the hub's old label (0); round 2: they swap back — the classic
    // synchronous-LPA oscillation that makes "run to convergence"
    // ill-defined and a FIXED round count the only honest stopping rule
    val star = (1L to 5L).map(i => (0L, i))
    val r1 = run(star, rounds = 1)
    assert(r1(0L) == 1L && (1L to 5L).forall(r1(_) == 0L))
    val r2 = run(star, rounds = 2)
    assert(r2(0L) == 0L && (1L to 5L).forall(r2(_) == 1L))
  }

  test("matches the naive evaluator on a pseudo-random multigraph") {
    var x = 7L
    def nxt(m: Long) = { x = (x * 6364136223846793005L + 1442695040888963407L); math.floorMod(x >>> 33, m) }
    val es = Seq.fill(200)((nxt(19), nxt(19)))
    for (r <- 1 to 4)
      assert(run(es, r) == naive(es, r), s"diverged from naive at round $r")
  }

  test("bit-deterministic under repartitioning") {
    var x = 99L
    def nxt(m: Long) = { x = (x * 6364136223846793005L + 1442695040888963407L); math.floorMod(x >>> 33, m) }
    val df = Seq.fill(150)((nxt(31), nxt(31))).toDF("a", "b")
    val a = LabelProp.communities(df, "a", "b", rounds = 3)
      .as[(Long, Long)].collect().toMap
    val b = LabelProp.communities(df.repartition(17), "a", "b", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b, "labels changed under repartitioning")
  }
}

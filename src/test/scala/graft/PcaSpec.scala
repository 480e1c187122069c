package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pca

/** [[Pca.topComponent]] against an INDEPENDENT single-JVM evaluator: the
  * vectors are collected and the exact same fixed-point algorithm (6-dp
  * HALF_UP moments, scaled covariance, integer power iteration) is
  * replayed naively — agreement proves the distributed moment
  * aggregation computes what the definition says, on real fixture data.
  * Plus the structural guarantees: fixed-point bound, exact rescale
  * ceiling, partitioning invariance, and the degenerate zero-covariance
  * input. */
class PcaSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def naive(vecs: Array[Array[Float]], rounds: Int): Array[Long] = {
    val d = vecs.head.length
    val n = BigInt(vecs.length)
    def r6(x: Double): BigInt =
      BigInt(new JBigDecimal(x).setScale(6, RoundingMode.HALF_UP)
        .movePointRight(6).toBigIntegerExact)
    val b = Array.tabulate(d)(i => vecs.map(v => r6(v(i).toDouble)).sum)
    val dm = Array.tabulate(d, d) { (i, j) =>
      val s = vecs.map(v => r6(v(i).toDouble * v(j).toDouble)).sum
      n * s * 1000000L - b(i) * b(j)
    }
    var v = Array.fill(d)(BigInt(Pca.Scale))
    for (_ <- 1 to rounds) {
      val w = Array.tabulate(d)(i =>
        (0 until d).foldLeft(BigInt(0))((acc, j) => acc + dm(i)(j) * v(j)))
      val m = w.map(_.abs).max
      if (m.signum != 0) v = w.map(wi => BigInt(wi.signum) * (wi.abs * Pca.Scale / m))
    }
    v.map(_.toLong)
  }

  test("distributed moments + power iteration equal the naive evaluator on fixture data") {
    val emb = sources.Tables.embeddings(spark, sf)
    val got = Pca.topComponent(emb, "embedding", rounds = 3)
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    val vecs = emb.select("embedding").as[Array[Float]].collect()
    assert(got.toSeq == naive(vecs, 3).toSeq)
  }

  test("loadings are fixed-point bounded with the rescale ceiling attained") {
    val got = Pca.topComponent(
      sources.Tables.embeddings(spark, sf), "embedding", rounds = 2)
      .as[(Long, Long)].collect().map(_._2)
    assert(got.forall(l => math.abs(l) <= Pca.Scale))
    // the rescale divides max|w| by itself: some component is exactly ±Scale
    assert(got.exists(l => math.abs(l) == Pca.Scale))
  }

  test("bit-deterministic under repartitioning") {
    val emb = sources.Tables.embeddings(spark, sf)
    val a = Pca.topComponent(emb, "embedding", rounds = 3)
      .as[(Long, Long)].collect().toMap
    val b = Pca.topComponent(emb.repartition(7), "embedding", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("zero covariance (all vectors identical) keeps the start vector") {
    val emb = Seq.fill(5)(Array(1.5f, -2.0f, 0.25f)).toDF("embedding")
    val got = Pca.topComponent(emb, "embedding", rounds = 3)
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    assert(got.toSeq == Seq.fill(3)(Pca.Scale))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{BloomBits, GraftFunctions}

/** Bloom build + probe: no false negatives ever, false-positive rate in the
  * designed ballpark, map-side merge correctness, and the probe actually
  * prunes a join input without changing the join's result. */
class BloomSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def buildBloom(keys: Seq[Long], numBits: Int = 1 << 14, k: Int = 5): Array[Byte] =
    keys.toDF("k").repartition(8) // force several partials so merge() runs
      .agg(GraftFunctions.bloomBuild(col("k"), numBits, k).as("b"))
      .head.getAs[Array[Byte]]("b")

  test("no false negatives: every inserted key probes true") {
    val keys = (0L until 2000L).map(_ * 7 + 3)
    val bloom = buildBloom(keys)
    assert(keys.forall(BloomBits.mightContain(bloom, _, 5)))
  }

  test("false-positive rate is near the m/n design point") {
    val keys = (0L until 1000L)
    val bloom = buildBloom(keys) // 16384 bits / 1000 keys ~ 16 bits/key
    val probes = (1000000L until 1020000L)
    val fp = probes.count(BloomBits.mightContain(bloom, _, 5))
    // theoretical fpp ~ (1 - e^(-kn/m))^k ~ 0.2%; allow 5x slack
    assert(fp < probes.size / 100, s"fpp too high: $fp / ${probes.size}")
  }

  test("probe as a column prunes rows but never true matches") {
    val keys = (0L until 500L).map(_ * 3)
    val bloom = buildBloom(keys)
    val big = (0L until 3000L).toDF("k")
    val pruned = big.filter(GraftFunctions.bloomMightContain(col("k"), bloom, 5))
    val prunedCount = pruned.count()
    assert(prunedCount < 3000, "bloom filter pruned nothing")
    // every key that truly joins survives the prune
    val kept = pruned.as[Long].collect().toSet
    assert(keys.forall(kept.contains))
  }

  test("bloom-pruned join equals the plain join") {
    val dimKeys = (0L until 400L).map(_ * 5 + 1)
    val bloom = buildBloom(dimKeys)
    val dim = dimKeys.toDF("k")
    val fact = (0L until 4000L).map(i => (i, i % 13)).toDF("k", "v")
    val plain = fact.join(dim, "k")
    val prunedJoin = fact
      .filter(GraftFunctions.bloomMightContain(col("k"), bloom, 5))
      .join(dim, "k")
    assert(prunedJoin.exceptAll(plain).isEmpty && plain.exceptAll(prunedJoin).isEmpty)
  }

  test("empty build matches nothing; null keys are ignored") {
    val bloom = Seq.empty[Long].toDF("k")
      .agg(GraftFunctions.bloomBuild(col("k"), 1 << 10, 5).as("b"))
      .head.getAs[Array[Byte]]("b")
    assert((0L until 100L).forall(!BloomBits.mightContain(bloom, _, 5)))
    val withNulls = Seq(Some(1L), None, Some(2L)).toDF("k")
      .agg(GraftFunctions.bloomBuild(col("k"), 1 << 10, 5).as("b"))
      .head.getAs[Array[Byte]]("b")
    assert(BloomBits.mightContain(withNulls, 1L, 5) && BloomBits.mightContain(withNulls, 2L, 5))
  }
}

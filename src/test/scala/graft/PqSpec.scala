package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pq

/** Product quantization: codebook shape/determinism, code assignment, and
  * ADC ranking semantics on a corpus with planted cluster structure. */
class PqSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  // 3 well-separated clusters in 8-dim: centers 0, 10, 20; 8 members each
  // with small deterministic offsets
  private def vecs = (0 until 24).map { i =>
    val center = (i / 8) * 10.0f
    (i.toLong, Array.tabulate(8)(d => center + 0.01f * ((i % 8) + d)))
  }.toDF("vec_id", "embedding")

  test("trainCodebooks: m codebooks of k centroids of dim/m doubles; deterministic") {
    val a = Pq.trainCodebooks(vecs, "vec_id", "embedding", m = 2, k = 3, 1L, 100)
    val b = Pq.trainCodebooks(vecs, "vec_id", "embedding", m = 2, k = 3, 1L, 100)
    assert(a.length == 2 && a.forall(cb => cb.length == 3 && cb.forall(_.length == 4)))
    assert(a.zip(b).forall { case (x, y) =>
      x.zip(y).forall { case (u, v) => u.sameElements(v) } })
  }

  test("identical vectors get identical codes") {
    val cbs = Pq.trainCodebooks(vecs, "vec_id", "embedding", m = 2, k = 3, 1L, 100)
    val doubled = vecs.unionByName(vecs.withColumn("vec_id", col("vec_id") + 100))
    val codes = doubled
      .select(col("vec_id") +: Pq.codeCols(col("embedding"), cbs, subLen = 4): _*)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    (0L until 24L).foreach(i => assert(codes(i) == codes(i + 100)))
    assert(codes.values.forall { case (c0, c1) => c0 >= 0 && c0 < 3 && c1 >= 0 && c1 < 3 })
  }

  test("ADC search returns the query's own cluster first") {
    val cbs = Pq.trainCodebooks(vecs, "vec_id", "embedding", m = 2, k = 3, 1L, 100)
    val query = Array.tabulate(8)(d => 10.0 + 0.01 * (3 + d)) // member 11's vector
    val top = Pq.adcSearch(vecs, "vec_id", "embedding", query, cbs,
      excludeId = 11L, topK = 7)
      .select("vec_id").as[Long].collect().toSet
    assert(top == (8L until 16L).toSet - 11L, s"expected cluster-1 members, got $top")
  }

  test("adc equals the driver-side table-lookup sum") {
    val cbs = Pq.trainCodebooks(vecs, "vec_id", "embedding", m = 2, k = 3, 1L, 100)
    val query = Array.tabulate(8)(d => 0.01 * d)
    val rows = Pq.adcSearch(vecs, "vec_id", "embedding", query, cbs, -1L, 24)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val codes = vecs.select(col("vec_id") +: Pq.codeCols(col("embedding"), cbs, 4): _*)
      .collect().map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2))).toMap
    val dt = cbs.zipWithIndex.map { case (cb, s) =>
      cb.map(c => Pq.l2(query.slice(s * 4, s * 4 + 4), c))
    }
    codes.foreach { case (id, cs) =>
      val expected = dt(0)(cs(0)) + dt(1)(cs(1))
      assert(rows(id) == expected, s"vec $id: ${rows(id)} != $expected")
    }
  }
}

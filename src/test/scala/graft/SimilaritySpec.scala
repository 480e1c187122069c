package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float], Int)*) =
    rows.toDF("vec_id", "embedding", "label")

  test("cosine of a vector with itself is exactly 1.0, orthogonal is 0.0") {
    val d = emb((0L, Seq(1f, 2f, 3f), 0))
      .select(
        Similarity.cosine(col("embedding"), col("embedding")).as("self"),
        Similarity.dot(col("embedding"), typedLit(Seq(0.0f, 0.0f, 0.0f))).as("zero"))
    val r = d.collect().head
    assert(r.getAs[Double]("self") == 1.0)
    assert(r.getAs[Double]("zero") == 0.0)
  }

  test("knnBruteForce ranks by cosine desc with id tie-break and excludes the query") {
    val d = emb(
      (0L, Seq(1f, 0f), 0),
      (1L, Seq(1f, 0.1f), 0),  // closest
      (2L, Seq(1f, 1f), 0),
      (3L, Seq(0f, 1f), 0),    // orthogonal, farthest
      (4L, Seq(1f, 0.1f), 0))  // exact tie with 1 -> id order
    val out = Similarity.knnBruteForce(d, "vec_id", "embedding", 0L, 3).collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 4L, 2L))
    assert(out.map(_.getAs[Double]("cos")).toSeq == out.map(_.getAs[Double]("cos")).toSeq.sorted.reverse)
  }

  test("knnBruteForce plans TakeOrderedAndProject (no global sort, no collect)") {
    // a parquet-backed frame: over LocalRelations Catalyst takes a different
    // (equally safe) path; the scale-relevant plan is the file-scan one
    val d = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val plan = Similarity.knnBruteForce(d, "vec_id", "embedding", 0L, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not heap-planned:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"), s"global sort detected:\n$plan")
  }

  test("bucketedNearestNeighbor only searches within the bucket") {
    val d = emb(
      (1L, Seq(1f, 0f), 0),
      (2L, Seq(0.9f, 0.1f), 0),
      (3L, Seq(1f, 0.01f), 1), // globally closest to 1 but in another bucket
      (4L, Seq(0f, 1f), 1))
    val out = Similarity.bucketedNearestNeighbor(d, "vec_id", "embedding", "label")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("nn_id")).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 4L, 4L -> 3L))
  }

  test("lshBucket is deterministic and identical vectors share a bucket") {
    // ±1±2±4 is never 0, so every plane-dot has a definite sign and
    // negating the vector provably flips every bucket bit
    val d = emb(
      (1L, Seq(1f, 2f, 4f), 0),
      (2L, Seq(1f, 2f, 4f), 0),
      (3L, Seq(-1f, -2f, -4f), 0))
    val out = d.select(col("vec_id"), Similarity.lshBucket(col("embedding"), 6, 3).as("b"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("b")).toMap
    assert(out(1L) == out(2L))
    assert(out(1L) == (~out(3L) & 63)) // negating the vector flips every sign bit
    assert(out.values.forall(b => b >= 0 && b < 64))
  }

  test("lshNearestNeighbor pairs identical vectors with each other") {
    val d = emb(
      (1L, Seq(1f, 2f, 3f), 0), (2L, Seq(1f, 2f, 3f), 0),
      (3L, Seq(-5f, 1f, -9f), 0))
    val out = Similarity.lshNearestNeighbor(d, "vec_id", "embedding", 6)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("nn_id")).toMap
    assert(out.get(1L).contains(2L) && out.get(2L).contains(1L))
  }

  test("cosineNearDupPairs wires the shared band budget: dup-heavy refuses, clean passes") {
    // 40 identical vectors collide in every LSH table: C(40,2)·4 = 3,120
    // candidates > 8 × 160 banded postings → the shared guard refuses
    val dupHeavy = emb((1L to 40L).map(i => (i, Seq(1f, 2f, 3f), 0)): _*)
    val e = intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairs(dupHeavy, "vec_id", "embedding",
        planes = 8, tables = 4, thresholdNum = 999L, thresholdDen = 1000L,
        maxCandidateFactor = 8).collect()
    }
    assert(e.getMessage.contains("cosine near-dup") && e.getMessage.contains("exactClusters"))
    // spread vectors: same factor passes and the pipeline computes
    val clean = emb((1L to 40L).map(i =>
      (i, Seq(math.sin(i * 1.7).toFloat, math.cos(i * 2.3).toFloat,
        math.sin(i * 0.9 + 1).toFloat), 0)): _*)
    Similarity.cosineNearDupPairs(clean, "vec_id", "embedding",
      planes = 8, tables = 4, thresholdNum = 999L, thresholdDen = 1000L,
      maxCandidateFactor = 8).collect()
  }

  test("cosineNearDupPairs verifies candidates exactly and never goes all-pairs") {
    val d = emb(
      (1L, Seq(1f, 2f, 3f), 0),
      (2L, Seq(1f, 2f, 3f), 0),          // identical: cos exactly 1.0, same bucket in every table
      (3L, Seq(-5f, 1f, -9f), 0),
      (4L, Seq(2f, -7f, 4f), 0))
    val out = Similarity.cosineNearDupPairs(d, "vec_id", "embedding",
      planes = 8, tables = 4, thresholdNum = 999L, thresholdDen = 1000L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs plan detected:\n$plan")
    val rows = out.collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 1L && rows.head.getLong(1) == 2L
      && rows.head.getDouble(2) == 1.0)
  }

  test("bucketedNearestNeighbor joins on the bucket key, not all pairs") {
    val d = emb((1L, Seq(1f, 0f), 0), (2L, Seq(0f, 1f), 0), (3L, Seq(1f, 1f), 1))
    val plan = Similarity.bucketedNearestNeighbor(d, "vec_id", "embedding", "label")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"all-pairs plan detected:\n$plan")
  }

  test("trainCentroidsLite: deterministic, separates two obvious clusters") {
    // ids 0..30 step 10 land in the sample (mod 10); the first two sampled
    // vectors (the init centroids) already point along x and y, so one
    // Lloyd step pulls each centroid to its direction-cluster mean
    val d = emb(
      (0L, Seq(1f, 0f), 0), (10L, Seq(0f, 1f), 0),
      (20L, Seq(1f, 0.1f), 0), (30L, Seq(0.1f, 1f), 0),
      (5L, Seq(9f, 9f), 0)) // not in the sample (5 % 10 != 0)
    val c1 = Similarity.trainCentroidsLite(d, "vec_id", "embedding", k = 2, sampleMod = 10L, maxSample = 100)
    val c2 = Similarity.trainCentroidsLite(d, "vec_id", "embedding", k = 2, sampleMod = 10L, maxSample = 100)
    assert(c1 == c2)
    assert(c1.length == 2)
    // cluster 0 averaged the x-direction pair, cluster 1 the y-direction
    // pair — exact float→double widening, so 0.1f widens then halves
    val half = 0.1f.toDouble / 2
    assert(c1(0) == Seq(1.0, half) && c1(1) == Seq(half, 1.0))
  }

  test("trainCentroidsLite: k=0 derives the cell count as floor(sqrt(n))") {
    def corpus(n: Int) = emb((0 until n).map(i =>
      (i.toLong, Seq((i % 7).toFloat + 1f, (i % 5).toFloat + 1f), 0)): _*)
    // 64 vectors -> 8 cells; 400 vectors -> 20 cells: k grows with the corpus
    val c64 = Similarity.trainCentroidsLite(corpus(64), "vec_id", "embedding",
      k = 0, sampleMod = 1L, maxSample = 1000)
    val c400 = Similarity.trainCentroidsLite(corpus(400), "vec_id", "embedding",
      k = 0, sampleMod = 1L, maxSample = 1000)
    assert(c64.length == 8 && c400.length == 20)
  }

  test("ivfNearestNeighbor: NN within trained cells, plan stays an equi-join") {
    val d = emb(
      (0L, Seq(1f, 0.1f), 0), (10L, Seq(1f, 0f), 0),
      (20L, Seq(0f, 1f), 0), (30L, Seq(0.1f, 1f), 0),
      (7L, Seq(0.9f, 0.2f), 0), (8L, Seq(0.2f, 0.9f), 0))
    val out = Similarity.ivfNearestNeighbor(d, "vec_id", "embedding",
      k = 2, sampleMod = 10L, maxSample = 100)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs plan detected:\n$plan")
    val nn = out.collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("nn_id")).toMap
    // 7 sits in the x cell with {0,10}: its NN must come from there, not 8
    assert(nn(7L) == 0L || nn(7L) == 10L)
    assert(nn(8L) == 20L || nn(8L) == 30L)
  }

  test("multiProbeNearestNeighbor: nprobe=#cells recovers brute-force NN exactly") {
    // 45 degrees apart: each vector's true NN can sit in the OTHER cell,
    // so nprobe=1 misses it and nprobe=k must find it
    val d = emb(
      (0L, Seq(1f, 0f), 0), (10L, Seq(0f, 1f), 0),
      (1L, Seq(0.8f, 0.6f), 0), (2L, Seq(0.6f, 0.8f), 0))
    val cents = Similarity.trainCentroidsLite(d, "vec_id", "embedding",
      k = 2, sampleMod = 10L, maxSample = 100)
    val full = Similarity.multiProbeNearestNeighbor(d, "vec_id", "embedding", cents, nprobe = 2)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("nn_id")).toMap
    // brute-force truth: 1 and 2 are each other's NN (cos = .96) even if
    // the quantizer puts them in different cells
    assert(full(1L) == 2L && full(2L) == 1L)
    // candidates come from argmax cells only: every probe still finds SOME
    // neighbor, and nprobe=1 equals the single-cell search
    val one = Similarity.multiProbeNearestNeighbor(d, "vec_id", "embedding", cents, nprobe = 1)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("nn_id")).toMap
    assert(one.keySet == full.keySet)
  }

  test("signBits packs strict sign bits of the leading dims into one long") {
    val d = Seq((0L, Seq(1f, -2f, 0f, 0.5f), 0)).toDF("vec_id", "embedding", "label")
    val sig = d.select(Similarity.signBits(col("embedding"), bits = 4).as("s"))
      .collect().head.getLong(0)
    // dims: +,-,0,+  -> bits 0 and 3 set (strict > 0: the zero dim is 0)
    assert(sig == ((1L << 0) | (1L << 3)))
    // bit 59 stays a positive long (contract: vector length >= bits)
    val wide = Seq((0L, Seq.fill(59)(-1f) :+ 1f, 0)).toDF("vec_id", "embedding", "label")
    val hi = wide.select(Similarity.signBits(col("embedding"), bits = 60))
      .collect().head.getLong(0)
    assert(hi == (1L << 59))
  }

  test("ivfBqRerank with a generous rerank budget equals in-cell exact NN") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Similarity.trainCentroidsLite(
      emb, "vec_id", "embedding", k = 2, sampleMod = 2L, maxSample = 100, iters = 1)
    // rerank >= cell size: the Hamming cut passes everything, so the
    // rerank result must equal exact in-cell NN (the q46 machinery)
    val exact = Similarity.bucketedNearestNeighbor(
      emb.withColumn("__ivf", Similarity.ivfAssign(col("embedding"), cents)),
      "vec_id", "embedding", "__ivf")
    val bq = Similarity.ivfBqRerank(emb, "vec_id", "embedding", cents,
      rerank = 10000)
    assert(bq.count() == exact.count())
    assert(bq.except(exact).count() == 0 && exact.except(bq).count() == 0)
  }

  test("ivfBqRerank keeps the signature projection behind an exchange (codegen budget)") {
    // SCALE_EVIDENCE §q266: fusing the ~60-term sign-bit projection into
    // the candidate stage drops the whole stage out of codegen (245 s vs
    // 5.9 s at x10). The operator must plan an exchange whose output
    // carries the computed signature, so the candidate stage reads a
    // plain column.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Similarity.trainCentroidsLite(
      emb, "vec_id", "embedding", k = 2, sampleMod = 2L, maxSample = 100, iters = 1)
    val plan = Similarity.ivfBqRerank(emb, "vec_id", "embedding", cents, rerank = 8)
      .queryExecution.sparkPlan
    val sigExchanges = plan.collect {
      case e: ShuffleExchangeExec if e.output.exists(_.name == "__sig") => e
    }
    assert(sigExchanges.nonEmpty,
      "no exchange carries __sig — the signature projection fused into the candidate stage")
  }

  test("ivfBqRerank with a tight budget still returns one NN per occupied-cell probe") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Similarity.trainCentroidsLite(
      emb, "vec_id", "embedding", k = 2, sampleMod = 2L, maxSample = 100, iters = 1)
    val bq = Similarity.ivfBqRerank(emb, "vec_id", "embedding", cents, rerank = 2)
    val n = emb.count()
    assert(bq.count() == n) // every cell has >= 2 members at this SF
    assert(bq.select("vec_id").distinct().count() == n)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.GraftFunctions
import graft.operators.Sampling

/** The two-pass heavy-hitter guarantee and the determinism/shape claims of
  * the hash-threshold samplers. */
class SamplingSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  // A zipf-ish stream whose vocabulary (200 keys) exceeds the MG budget
  // (k=15), so the candidate pass genuinely evicts: key i appears
  // floor(4000/(i+1)) times.
  private def zipfStream = {
    val rows = (0 until 200).flatMap(i => Seq.fill(4000 / (i + 1))(s"key$i"))
    rows.toDF("item").repartition(7) // multiple partials so merge() runs
  }

  test("misraGries survives eviction and keeps every >N/(k+1) item across merged partials") {
    val df = zipfStream
    val n = df.count()
    val cands = df.agg(GraftFunctions.misraGries($"item", 15)).first().getSeq[String](0)
    assert(cands.size <= 15, s"state bound violated: ${cands.size} > 15")
    val exact = df.groupBy("item").count().as[(String, Long)].collect().toMap
    val mustKeep = exact.filter { case (_, c) => c * 16 > n }.keySet
    assert(mustKeep.nonEmpty, "fixture must have at least one true heavy hitter")
    assert(mustKeep.subsetOf(cands.toSet),
      s"MG superset guarantee broken: missing ${mustKeep -- cands.toSet}")
  }

  test("heavyHitters two-pass result equals the full GROUP BY/HAVING answer exactly") {
    val df = zipfStream
    val n = df.count()
    val got = Sampling.heavyHitters(df, "item", k = 15, thresholdDen = 10L)
      .as[(String, Long)].collect().toMap
    val want = df.groupBy("item").count().as[(String, Long)].collect()
      .filter { case (_, c) => c * 10 >= n }.toMap
    assert(got == want)
  }

  test("heavyHitters rejects a k too small for the threshold") {
    intercept[IllegalArgumentException] {
      Sampling.heavyHitters(zipfStream, "item", k = 5, thresholdDen = 10L)
    }
  }

  test("graft_heavy_hitters is callable from SQL") {
    GraftFunctions.register(spark)
    zipfStream.createOrReplaceTempView("mg_items")
    val cands = spark.sql("SELECT graft_heavy_hitters(item, 15) FROM mg_items")
      .first().getSeq[String](0)
    assert(cands.nonEmpty && cands.size <= 15)
  }

  test("countMin never undercounts, and the merged sketch equals a single-partition build") {
    val df = zipfStream
    val exact = df.groupBy("item").count().as[(String, Long)].collect().toMap
    def estimates(d: org.apache.spark.sql.DataFrame): Map[String, Long] = {
      val sk = d.agg(GraftFunctions.countMin($"item", 4, 64)).first().getSeq[Long](0)
      exact.keys.map { k =>
        k -> (0 until 4).map(r =>
          sk(r * 64 + graft.expressions.CountMinSketch.bucket(r, k, 64))).min
      }.toMap
    }
    val est = estimates(df)
    for ((k, c) <- exact)
      assert(est(k) >= c, s"CMS undercounted $k: ${est(k)} < $c")
    val n = exact.values.sum
    val grosslyOver = est.count { case (k, e) => e > exact(k) + 2 * n / 64 }
    assert(grosslyOver < exact.size / 4, s"too many far-overcounts: $grosslyOver")
    assert(est == estimates(df.coalesce(1)),
      "merged partials differ from a single-partition build (linearity broken)")
  }

  test("graft_count_min is callable from SQL") {
    GraftFunctions.register(spark)
    zipfStream.createOrReplaceTempView("cms_items")
    val sk = spark.sql("SELECT graft_count_min(item, 3, 32) FROM cms_items")
      .first().getSeq[Long](0)
    assert(sk.length == 96 && sk.sum == 3 * zipfStream.count())
  }

  private def docs = (0L until 2000L).map(i =>
    (i, if (i % 4 == 0) "keep" else "cut", (i % 500 + 50).toInt))
    .toDF("id", "stratum", "w")

  test("bernoulli: membership is per-row deterministic and partitioning-independent") {
    val a = Sampling.bernoulli(docs, "id", 0.3, "t1").select("id").as[Long].collect().toSet
    val b = Sampling.bernoulli(docs.repartition(13), "id", 0.3, "t1")
      .select("id").as[Long].collect().toSet
    assert(a == b, "sample membership changed under repartitioning")
    // binomial(2000, .3): mean 600, sd ~20 — 5 sd both sides
    assert(a.size > 500 && a.size < 700, s"rate far off: ${a.size}/2000")
  }

  test("distinct salts draw independent samples; rate=1 keeps everything") {
    val a = Sampling.bernoulli(docs, "id", 0.5, "sa").select("id").as[Long].collect().toSet
    val b = Sampling.bernoulli(docs, "id", 0.5, "sb").select("id").as[Long].collect().toSet
    assert(a != b, "two salts gave the identical sample")
    assert(Sampling.bernoulli(docs, "id", 1.0, "sc").count() == 2000)
    assert(Sampling.bernoulli(docs, "id", 0.0, "sd").count() == 0)
  }

  test("stratifiedBernoulli applies per-stratum rates") {
    val got = Sampling.stratifiedBernoulli(docs, "id", "stratum",
      rates = Map("keep" -> 1.0), defaultRate = 0.2, salt = "st")
    val keep = got.filter($"stratum" === "keep").count()
    val cut = got.filter($"stratum" === "cut").count()
    assert(keep == 500, s"rate-1.0 stratum must be kept whole, got $keep/500")
    // binomial(1500, .2): mean 300, sd ~15.5
    assert(cut > 220 && cut < 380, s"default-rate stratum far off: $cut/1500")
  }

  test("weightedBernoulli: empirical inclusion tracks weight/scale linearly") {
    val got = Sampling.weightedBernoulli(docs, "id", "w", weightScale = 1024L, salt = "wb")
      .as[(Long, String, Int)].collect()
    val byW = got.groupBy(_._3 > 300).view.mapValues(_.size).toMap
    val inputByW = (0L until 2000L).map(i => (i % 500 + 50).toInt).groupBy(_ > 300)
      .view.mapValues(_.size).toMap
    // heavy rows (w in (300,550), mean p~.41) vs light rows (w in [50,300], mean p~.17)
    val heavyRate = byW.getOrElse(true, 0).toDouble / inputByW(true)
    val lightRate = byW.getOrElse(false, 0).toDouble / inputByW(false)
    assert(heavyRate > 2 * lightRate,
      s"weighting had no effect: heavy=$heavyRate light=$lightRate")
  }

  test("samplers are single-scan zero-shuffle plans") {
    for (df <- Seq(
        Sampling.bernoulli(docs, "id", 0.3, "p1"),
        Sampling.stratifiedBernoulli(docs, "id", "stratum", Map("keep" -> 0.9), 0.1, "p2"),
        Sampling.weightedBernoulli(docs, "id", "w", 1024L, "p3"))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"sampler plan shuffles:\n$plan")
    }
  }
}

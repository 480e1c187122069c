package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Scratch stage-level profiler for the hot LLM-suite queries (dev tool,
  * not part of the engine surface). */
object Profile {
  def time(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, dir)
    println(s"[profile] docs partitions = ${docs.rdd.getNumPartitions}")
    time("warmup")(docs.select(col("doc_id")))

    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
    time("shingleSets")(sets)
    val sigs = sets.select(col("doc_id"), Dedup.minhashSignature(col("shingles"), 64).as("sig"))
    time("sigs (64 xxhash/shingle)")(sigs)
    val cands = Dedup.lshCandidates(sigs, 16, 4)
    time("lshCandidates")(cands)
    println(s"[profile] n candidates = ${cands.count()}")
    time("nearDupPairs full")(Dedup.nearDupPairs(docs, "doc_id", "text"))

    // repartitioned variant
    val docsR = docs.repartition(32)
    time("nearDupPairs repart32")(Dedup.nearDupPairs(docsR, "doc_id", "text"))

    // q42
    time("q42 full")(Dedup.jaccardPairsExact(docs, "doc_id", "text"))
    time("q42 full again")(Dedup.jaccardPairsExact(docs, "doc_id", "text"))

    // q42 persisted-sets A/B: does caching beat the ~3x shingle recompute?
    val setsP = Dedup.shingleSets(docs, "doc_id", "text", 3).persist()
    time("q42 persisted cold")(Dedup.jaccardPairsExactOnSets(setsP, 4, 5))
    time("q42 persisted warm")(Dedup.jaccardPairsExactOnSets(setsP, 4, 5))
    setsP.unpersist()

    val emb = Tables.embeddings(spark, dir)
    println(s"[profile] emb partitions = ${emb.rdd.getNumPartitions}")
    time("bucketedNN label")(Similarity.bucketedNearestNeighbor(emb, "vec_id", "embedding", "label"))
    time("bucketedNN label repart")(Similarity.bucketedNearestNeighbor(emb.repartition(32), "vec_id", "embedding", "label"))
    println(s"[profile] label buckets: ")
    emb.groupBy("label").count().orderBy(desc("count")).show(5)
    time("lsh ann 6 planes")(Similarity.lshNearestNeighbor(emb, "vec_id", "embedding", 6))
    spark.stop()
  }
}

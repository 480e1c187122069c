package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{md5Long, tokens}
import graft.operators.GlobalOrder
import graft.sources.{Sinks, Tables}

/** The runnable training-corpus builder — the LLM-data counterpart to the
  * star-schema app: one call takes a raw documents table through the full
  * clean (language + quality filters, exact dedup, exact near-dup removal —
  * the verified q64 pipeline), assigns every survivor a reproducible
  * global-shuffle position and training shard, and materializes three
  * tables with [[Sinks.overwriteSwap]]'s crash guarantees:
  *
  *  - `corpus`       — doc_id, source, lang, fp, n_tokens, pos, shard
  *  - `corpus_stats` — per-source doc/token counts, computed from the
  *                     WRITTEN corpus (not the in-flight frame), so any
  *                     write damage breaks the stats' oracle match
  *  - `manifest`     — one row: raw/clean counts and shard count, the
  *                     handshake a downstream trainer validates before
  *                     reading a single shard
  *
  * Deterministic end to end: same input -> byte-identical corpus, every
  * run, every partitioning (hash-derived order, no RNG, no timestamps) —
  * which is what makes a 100-TB build restartable and auditable. Re-running
  * [[build]] over the same input is a no-op by content.
  */
object CorpusApp {

  /** Docs per training shard — small here so test scales exercise multiple
    * shards; production sizes this to the trainer's file budget. */
  val ShardSize = 100L

  def build(spark: SparkSession, rawDir: String, outDir: String): Unit = {
    val docs = Tables.documents(spark, rawDir)
    val survivors = graft.queries.LlmQueries.corpusSurvivors(spark, rawDir)
      .join(docs.select("doc_id", "source", "lang"), "doc_id")
      .select(col("doc_id"), col("source"), col("lang"),
        md5(col("text")).as("fp"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        md5Long(col("doc_id").cast("string")).as("__h"))
    val corpus = GlobalOrder.rank(survivors, "__h", "doc_id", out = "pos")
      .withColumn("shard", expr(s"(pos - 1) div $ShardSize"))
      .select("doc_id", "source", "lang", "fp", "n_tokens", "pos", "shard")
    Sinks.overwriteSwap(corpus, s"$outDir/corpus")
    spark.catalog.refreshByPath(s"$outDir/corpus")

    val written = spark.read.parquet(s"$outDir/corpus")
    Sinks.overwriteSwap(
      written.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).cast("long").as("n_tokens")),
      s"$outDir/corpus_stats")
    Sinks.overwriteSwap(
      written.agg(
        lit(docs.count()).as("n_raw"),
        count(lit(1)).as("n_clean"),
        countDistinct(col("shard")).as("n_shards")),
      s"$outDir/manifest")
    spark.catalog.refreshByPath(s"$outDir/corpus_stats")
    spark.catalog.refreshByPath(s"$outDir/manifest")
  }
}

package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.app.CorpusApp

/** End-to-end corpus-app queries: the training corpus is BUILT (full clean
  * + shard assignment + real `Sinks` writes to a temp dir) and the queries
  * read the WRITTEN tables — verifying the whole materialization chain,
  * exactly like the star-schema entries (StarQueries). The DuckDB oracles
  * recompute from the raw documents table: a divergence anywhere in the
  * pipeline or the write path breaks the hash match. */
object CorpusQueries {

  /** Build once per (JVM, sf dir) — queries at different scales build
    * their own corpus. */
  @volatile private var cached = Map.empty[String, String]
  private def built(spark: SparkSession, dir: String): String = synchronized {
    cached.getOrElse(dir, {
      val out = Files.createTempDirectory("graft-corpus").toString
      CorpusApp.build(spark, dir, out)
      cached += dir -> out
      out
    })
  }

  /** Per-source doc/token totals read from the WRITTEN corpus_stats table. */
  def q81CorpusStats(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"${built(s, dir)}/corpus_stats")

  /** Shard occupancy read from the WRITTEN corpus table — checks the
    * global-shuffle rank and shard split survived materialization. */
  def q82CorpusShards(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"${built(s, dir)}/corpus")
      .groupBy("shard").agg(count(lit(1)).as("n_docs"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q81_corpus_stats" -> (q81CorpusStats _),
    "q82_corpus_shards" -> (q82CorpusShards _))

  val oracles: Map[String, String] = Map(
    "q81_corpus_stats" ->
      s"""WITH ${LlmQueries.corpusSurvivorCtes}
         |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(len(string_split(lower(v.text), ' '))) AS BIGINT) AS n_tokens
         |FROM surv v JOIN documents d USING (doc_id)
         |GROUP BY 1""".stripMargin,
    "q82_corpus_shards" ->
      s"""WITH ${LlmQueries.corpusSurvivorCtes},
         |r AS (
         |  SELECT doc_id, row_number() OVER (
         |    ORDER BY ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT, doc_id) AS pos
         |  FROM surv)
         |SELECT CAST((pos - 1) // ${CorpusApp.ShardSize} AS BIGINT) AS shard,
         |  CAST(count(*) AS BIGINT) AS n_docs
         |FROM r GROUP BY 1""".stripMargin)
}

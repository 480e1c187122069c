package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sitemap XML parsing — the DISCOVERY side of a crawl (robots.txt is
  * permission, sitemaps are the publisher's own URL feed). Built
  * ENTIRELY from codegen'd string builtins (`regexp_extract_all` over
  * `<url>`/`<sitemap>` blocks + entity decode — patterns are the same
  * RE2/Java common ground the [[Html]] oracle chain uses), so parsing
  * is a narrow per-row projection: zero UDF, zero shuffle, replayable
  * in SQL by the oracle. Index files (`<sitemapindex>`) contain no
  * `<url>` blocks — [[urls]] yields nothing for them, and
  * [[indexChildren]] resolves their child sitemap references for the
  * crawler's fetch loop. */
object Sitemap {

  /** XML entity decode for `<loc>` values — the sitemap spec REQUIRES
    * ampersand escaping in URLs; `&amp;` last so `&amp;lt;` decodes to
    * the literal `&lt;`. */
  private val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&apos;" -> "'", "&amp;" -> "&")

  private def decodeEntities(c: Column): Column =
    Entities.foldLeft(c) { case (acc, (e, r)) => regexp_replace(acc, e, r) }

  def readSitemaps(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(col("url"), col("xml"))

  /** One row per `<url>` entry of every urlset file: (sitemap_url, loc,
    * lastmod — '' when absent). Whitespace-tolerant, entity-decoded. */
  def urls(files: DataFrame): DataFrame =
    files.select(col("url").as("sitemap_url"),
        explode(expr("regexp_extract_all(xml, '(?s)<url>(.*?)</url>', 1)")).as("blk"))
      .select(col("sitemap_url"),
        decodeEntities(regexp_extract(col("blk"),
          "(?s)<loc>\\s*(.*?)\\s*</loc>", 1)).as("loc"),
        regexp_extract(col("blk"),
          "(?s)<lastmod>\\s*(.*?)\\s*</lastmod>", 1).as("lastmod"))
      .filter(col("loc") =!= "")

  /** Child sitemap URLs referenced by `<sitemapindex>` files —
    * (index_url, child_url), for the fetch loop. */
  def indexChildren(files: DataFrame): DataFrame =
    files.filter(col("xml").contains("<sitemapindex"))
      .select(col("url").as("index_url"),
        explode(expr("regexp_extract_all(xml, '(?s)<sitemap>(.*?)</sitemap>', 1)")).as("blk"))
      .select(col("index_url"),
        decodeEntities(regexp_extract(col("blk"),
          "(?s)<loc>\\s*(.*?)\\s*</loc>", 1)).as("child_url"))
      .filter(col("child_url") =!= "")
}

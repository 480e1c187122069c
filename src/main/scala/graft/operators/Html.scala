package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HTML/markup text extraction — the first operator of every web-corpus
  * pipeline: the crawl lands as markup, and everything downstream
  * (dedup, language ID, quality scoring, the corpus clean) operates on
  * extracted TEXT. Deterministic, rule-based (the jusText/trafilatura
  * family reduced to integer thresholds), and built ENTIRELY from
  * codegen'd string builtins — `regexp_replace` / `split` /
  * `regexp_extract_all` / higher-order array functions, no UDF — so the
  * extraction is a narrow per-row projection that scales embarrassingly:
  * no shuffle anywhere until the caller aggregates.
  *
  * The pipeline, each step replayable in ANSI-ish SQL (the DuckDB oracle
  * runs the identical regex chain — all patterns are RE2-and-Java-regex
  * common ground: inline (?is) flags, lazy quantifiers, no backrefs):
  *
  *  1. remove invisibles: `<script>…</script>`, `<style>…</style>`
  *     (lazy, case-insensitive, dot-all) and `<!-- comments -->`;
  *  2. SPLIT on block-level boundaries (p, div, li, ul, ol, h1-h6, br,
  *     tr, td, table, nav, header, footer, section, article, html,
  *     head, body, title — open or close, any attributes) — what
  *     remains between boundaries is a candidate text block, in
  *     document order;
  *  3. per block: strip residual inline tags (incl. `<!DOCTYPE …>`),
  *     decode the common entities (&lt; &gt; &quot; &#39; &nbsp;
  *     &amp; — amp LAST, so `&amp;lt;` decodes to the literal `&lt;`),
  *     collapse whitespace, trim;
  *  4. classify: a block is CONTENT iff its text is ≥ `minBlockChars`
  *     and its link density stays under 30% — integer form
  *     `10·link_chars ≤ 3·text_chars`, where link chars are the
  *     normalized lengths of `<a>…</a>` captures in the raw block (the
  *     jusText link-density rule); nav/footer link farms fail it;
  *  5. main content = content blocks joined in document order.
  *
  * Malformed input degrades deterministically, never throws: an
  * unclosed `<p>` still splits (the boundary is the tag, not the pair),
  * an unclosed `<a>` contributes no link chars (the capture needs the
  * close), a bare `<` followed by non-letter is text.
  */
object Html {

  /** Block-boundary tags. `td`/`tr`/`table` make table cells their own
    * blocks; `title`/`head`/`body`/`html` keep head text out of the
    * first content block. The name must END at the match — the
    * `(?:[^a-zA-Z0-9>][^>]*)?>` suffix (attributes or nothing) is the
    * RE2-safe boundary (no lookahead) that stops `<pre>`/`<picture>`/
    * `<param>` matching `p`, or `<link>` matching `li`, which would
    * split real paragraphs into sub-threshold fragments. */
  private[graft] val BlockSplit: String =
    "(?i)</?(?:p|div|li|ul|ol|h[1-6]|br|tr|td|table|nav|header|footer|section|article|html|head|body|title)(?:[^a-zA-Z0-9>][^>]*)?>"

  private[graft] val ScriptPat = "(?is)<script[^>]*>.*?</script>"
  private[graft] val StylePat = "(?is)<style[^>]*>.*?</style>"
  private[graft] val CommentPat = "(?s)<!--.*?-->"
  private[graft] val TagPat = "(?s)<[/!]?[a-zA-Z][^>]*>"
  private[graft] val LinkPat = "(?is)<a[^>]*>(.*?)</a>"

  /** Entity decode order matters: `&amp;` LAST (else `&amp;lt;` would
    * double-decode). The list is (entity, replacement). */
  private[graft] val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Tag-strip + entity-decode + whitespace-normalize + trim — the
    * shared normalizer of steps 3's text and 4's link captures. */
  private[graft] def normalizeText(c: Column): Column = {
    val noTags = regexp_replace(c, TagPat, " ")
    val decoded = Entities.foldLeft(noTags) { case (acc, (e, r)) =>
      regexp_replace(acc, e, r)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Whole-page text (steps 1 + 3, no block structure) — the blunt
    * tag-strip a quick-and-dirty pipeline uses; [[blocks]] +
    * [[mainContent]] is the curated path. */
  def stripHtml(c: Column): Column =
    normalizeText(regexp_replace(regexp_replace(regexp_replace(c,
      ScriptPat, " "), StylePat, " "), CommentPat, " "))

  def readHtmlDocs(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select("doc_id", "url", "html")

  /** The href edge pattern — quoted or unquoted `<a href` targets. A
    * CONSTANT shared with the DuckDB oracle builders (interpolated, the
    * q289 convention) so the two replays can never drift; plain enough
    * to mean the same thing under java.util.regex and RE2. */
  val HrefPattern: String = """<a href="?([^"> ]+)"?"""

  /** The crawl's LINK GRAPH: (src, dst, w) edges from every `<a href>`
    * target, resolved against the page's own url — absolute targets
    * kept, path-absolute targets prefixed with the page's scheme+host,
    * anything else (protocol-relative, page-relative, fragment-only)
    * dropped as a documented subset. Pure codegen'd regexp builtins:
    * one narrow explode, then ONE shuffle — the (src, dst) groupBy. At
    * crawl scale the edge table is the web graph itself; downstream
    * consumers ([[PageRank]], HITS, spam heuristics) shuffle it by key,
    * never the page bytes. */
  def linkEdges(pages: DataFrame, urlCol: String = "url",
                htmlCol: String = "html"): DataFrame =
    pages.select(col(urlCol).as("src"),
        explode(regexp_extract_all(col(htmlCol), lit(HrefPattern), lit(1)))
          .as("href"))
      .withColumn("dst",
        when(col("href").contains("://"), col("href"))
          // the host-prefix branch requires a RECOGNIZABLE host in src:
          // regexp_extract returns '' on no match, which would silently
          // emit the bare path as a "resolved" url
          .when(col("href").startsWith("/") && col("src").rlike("^https?://"),
            concat(regexp_extract(col("src"), "^(https?://[^/]+)", 1),
              col("href")))
          .otherwise(lit(null)))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))

  /** One row per non-empty candidate block: (idCol, pos, text,
    * text_chars, link_chars, is_content). Document order is `pos`. */
  def blocks(df: DataFrame, idCol: String = "doc_id", htmlCol: String = "html",
             minBlockChars: Int = 25): DataFrame = {
    val noNoise = regexp_replace(regexp_replace(regexp_replace(col(htmlCol),
      ScriptPat, " "), StylePat, " "), CommentPat, " ")
    df.select(col(idCol), posexplode(split(noNoise, BlockSplit, -1)).as(Seq("pos", "raw")))
      .withColumn("text", normalizeText(col("raw")))
      .withColumn("text_chars", length(col("text")).cast("long"))
      .withColumn("link_chars",
        aggregate(
          transform(regexp_extract_all(col("raw"), lit(LinkPat), lit(1)),
            s => length(normalizeText(s)).cast("long")),
          lit(0L), (acc, v) => acc + v))
      .filter(col("text_chars") > 0)
      .withColumn("is_content",
        col("text_chars") >= minBlockChars &&
          col("link_chars") * 10 <= col("text_chars") * 3)
      .select(col(idCol), col("pos"), col("text"),
        col("text_chars"), col("link_chars"), col("is_content"))
  }

  /** Per-document extraction rollup: (idCol, main_text, n_blocks,
    * n_kept, content_chars). `main_text` is the content blocks joined in
    * document order ('' when nothing qualifies — a link farm). One
    * narrow groupBy on the id — the only shuffle in the operator. */
  def mainContent(df: DataFrame, idCol: String = "doc_id",
                  htmlCol: String = "html", minBlockChars: Int = 25): DataFrame =
    blocks(df, idCol, htmlCol, minBlockChars)
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("is_content"),
            struct(col("pos"), col("text"))))),
          x => x.getField("text")), " ").as("main_text"),
        count(lit(1)).as("n_blocks"),
        sum(col("is_content").cast("long")).as("n_kept"))
      .withColumn("content_chars", length(col("main_text")).cast("long"))

  /** Per-document BOILERPLATE profile — the inverse cut: how much of the
    * page is nav/footer/link-farm. (idCol, n_boiler_blocks, boiler_chars,
    * link_chars_total, link_permille: link chars as a share of all block
    * text, integer permille). */
  def boilerplate(df: DataFrame, idCol: String = "doc_id",
                  htmlCol: String = "html", minBlockChars: Int = 25): DataFrame =
    blocks(df, idCol, htmlCol, minBlockChars)
      .groupBy(col(idCol))
      .agg(
        sum(when(!col("is_content"), 1L).otherwise(0L)).as("n_boiler_blocks"),
        sum(when(!col("is_content"), col("text_chars")).otherwise(0L)).as("boiler_chars"),
        sum(col("link_chars")).as("link_chars_total"),
        sum(col("text_chars")).as("all_chars"))
      .withColumn("link_permille",
        expr("link_chars_total * 1000 div greatest(1L, all_chars)"))
      .drop("all_chars")
}

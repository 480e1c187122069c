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

  // ---- RFC 3986 reference resolution (the pinned, bounded subset) ----
  //
  // On real pages the MAJORITY of <a href> targets are page-relative, so
  // a link graph that drops them loses most intra-site edges (r14
  // verdict #1). Resolution here is RFC 3986 §5.2 reduced to a
  // deterministic regex chain every step of which runs identically under
  // java.util.regex (Spark codegen'd builtins) and RE2 (the DuckDB
  // oracle) — the constants below are interpolated into BOTH sides.

  /** src qualifies as a resolution base iff it starts with a lowercase
    * http(s) scheme — regexp_extract returns '' on no match, which would
    * silently emit a bare path as a "resolved" url. */
  private[graft] val SrcOkPattern = "^https?://"

  /** scheme://authority of the base (query/fragment excluded). */
  private[graft] val SrcBasePattern = "^(https?://[^/?#]+)"

  /** Path of the base url (no query/fragment); '' when absent. */
  private[graft] val SrcPathPattern = "^https?://[^/?#]+([^?#]*)"

  /** A scheme-prefixed href that is NOT an absolute http-style url —
    * mailto:, javascript:, tel:, data: — always dropped. */
  private[graft] val OtherSchemePattern = "^[A-Za-z][A-Za-z0-9+.-]*:"

  /** The absolute-href form of [[SrcOkPattern]] — CASE-INSENSITIVE
    * (r16 advice): RFC 3986 schemes compare case-insensitively, so
    * `HTTP://x` / `Https://x` are real links a crawler must keep; the
    * href is kept VERBATIM here and downstream canonicalization
    * ([[Url.canonicalize]]) lowercases scheme and host. Still anchored
    * (never a bare `://` containment — embedded-url hrefs resolve
    * through the path branches; `javascript://x` falls to the scheme
    * drop). The SRC side stays [[SrcOkPattern]]: base extraction
    * patterns key on the lowercase form WARC target URIs carry. */
  private[graft] val AbsHrefPattern = "(?i)^https?://"

  /** A path segment that is NOT `.` or `..` — RE2-safe (no lookahead,
    * DuckDB's engine has none): first char a non-dot, or a dot followed
    * by a non-dot, or `..` followed by at least one more char. A plain
    * `[^/]+` here would match `..` itself and collapse `/../../` to `/`
    * — deleting two ups while canceling only one segment. */
  private[graft] val RealSeg = "(?:[^./][^/]*|\\.[^./][^/]*|\\.\\.[^/]+)"

  /** Dot-segment removal (RFC 3986 §5.2.4) as a PINNED BOUNDED regex
    * chain: (pattern, passes), each pass a GLOBAL replace with '/',
    * applied in order. Bounds (documented subset): runs of `./` deeper
    * than ~4 and `seg/../` nesting deeper than 4 levels keep their
    * residue — real hrefs sit far inside these bounds. The final step
    * clamps excess `..` at the root (RFC: they are removed). */
  private[graft] val DotSegmentSteps: Seq[(String, Int)] = Seq(
    "/\\./" -> 2, // ./ segments (2 global passes: adjacent matches share a '/')
    "/\\.$" -> 1, // trailing /.
    s"/$RealSeg/\\.\\./" -> 4, // seg/.. pairs, innermost-first, depth ≤ 4
    s"/$RealSeg/\\.\\.$$" -> 1, // trailing seg/..
    "^(?:/\\.\\.)+(?:/|$)" -> 1) // excess .. at the root

  private[graft] def removeDotSegments(c: Column): Column =
    DotSegmentSteps.foldLeft(c) { case (acc, (pat, passes)) =>
      (1 to passes).foldLeft(acc)((a, _) => regexp_replace(a, pat, "/"))
    }

  /** DuckDB twin of [[removeDotSegments]] over the SQL expression `e` —
    * DuckDB's regexp_replace needs the explicit 'g' flag to match
    * Spark's always-global semantics. */
  private[graft] def removeDotSegmentsSqlFor(e: String): String =
    DotSegmentSteps.foldLeft(e) { case (acc, (pat, passes)) =>
      (1 to passes).foldLeft(acc)((a, _) => s"regexp_replace($a, '$pat', '/', 'g')")
    }

  /** Resolve one href against its page url — the when-chain (branch
    * order is the contract; [[resolveHrefSqlFor]] is the DuckDB twin):
    *
    *  1. starts `http(s)://` in ANY case ([[AbsHrefPattern]] — scheme
    *     case-insensitivity is RFC 3986; r16 advice) → absolute
    *     http-style url: kept verbatim, downstream canonicalization
    *     lowercases (anchored, NOT a bare `://` containment — an
    *     embedded-url href like `/redirect?u=https://partner.com` is
    *     path-absolute and must resolve through branch 5, and
    *     `javascript://x` must fall to the scheme drop in branch 3);
    *  2. starts `//`     → protocol-relative: base SCHEME + `:` + href
    *     (MUST precede the path-absolute branch — `//cdn.x.com/a` starts
    *     with `/` too, and the path branch would emit the bogus
    *     `https://page.com//cdn.x.com/a`);
    *  3. `scheme:` form  → mailto:/javascript:/tel:/data: — dropped;
    *  4. starts `#`      → fragment-only self-reference: dropped;
    *  5. starts `/`      → path-absolute: base scheme+authority + href;
    *  6. starts `?`      → query-only: scheme+authority + base path + href;
    *  7. otherwise       → page-relative: scheme+authority +
    *     dot-normalized (base DIRECTORY + href), where the directory is
    *     the base path up to its last `/` (RFC 3986 §5.3 merge);
    * branches 2/5/6/7 require a recognizable http(s) base (else drop).
    * Fragments inside resolved targets are kept verbatim, and the dot
    * normalization runs over the href's own query residue too — both
    * pinned simplifications, noise-level on real links. */
  def resolveHref(src: Column, href: Column): Column = {
    val srcOk = src.rlike(SrcOkPattern)
    val base = regexp_extract(src, SrcBasePattern, 1)
    val spath0 = regexp_extract(src, SrcPathPattern, 1)
    val spath = when(spath0 === "", lit("/")).otherwise(spath0)
    val sdir = regexp_replace(spath, "[^/]+$", "")
    when(href.rlike(AbsHrefPattern), href)
      .when(href.startsWith("//") && href.rlike("^//[^/]") && srcOk,
        concat(regexp_extract(src, "^(https?):", 1), lit(":"), href))
      // a degenerate '//' or schemeless '///path' has no authority to
      // resolve against — drop it BEFORE the path-absolute branch can
      // mistake it for a path
      .when(href.startsWith("//"), lit(null))
      .when(href.rlike(OtherSchemePattern), lit(null))
      .when(href.startsWith("#"), lit(null))
      .when(href.startsWith("/") && srcOk, concat(base, href))
      .when(href.startsWith("?") && srcOk, concat(base, spath, href))
      .when(srcOk, concat(base, removeDotSegments(concat(sdir, href))))
      .otherwise(lit(null))
  }

  /** The [[resolveHref]] CASE in DuckDB SQL over expressions `src` and
    * `href` — every pattern interpolated from the constants above, so
    * the two replays cannot drift (the Robots.patternRegexSqlFor
    * convention). */
  def resolveHrefSqlFor(src: String, href: String): String = {
    val srcOk = s"regexp_matches($src, '$SrcOkPattern')"
    val base = s"regexp_extract($src, '$SrcBasePattern', 1)"
    val spath = s"(CASE WHEN regexp_extract($src, '$SrcPathPattern', 1) = ''" +
      s" THEN '/' ELSE regexp_extract($src, '$SrcPathPattern', 1) END)"
    val sdir = s"regexp_replace($spath, '[^/]+$$', '', 'g')"
    s"""CASE WHEN regexp_matches($href, '$AbsHrefPattern') THEN $href
       |  WHEN substr($href, 1, 2) = '//' AND regexp_matches($href, '^//[^/]')
       |       AND $srcOk
       |    THEN regexp_extract($src, '^(https?):', 1) || ':' || $href
       |  WHEN substr($href, 1, 2) = '//' THEN NULL
       |  WHEN regexp_matches($href, '$OtherSchemePattern') THEN NULL
       |  WHEN substr($href, 1, 1) = '#' THEN NULL
       |  WHEN substr($href, 1, 1) = '/' AND $srcOk THEN $base || $href
       |  WHEN substr($href, 1, 1) = '?' AND $srcOk THEN $base || $spath || $href
       |  WHEN $srcOk THEN $base || ${removeDotSegmentsSqlFor(s"($sdir || $href)")}
       |  ELSE NULL END""".stripMargin
  }

  // ---- publisher link/page directives (r16 verdict #3/#4) ----
  //
  // Real pages assert rel=nofollow on a large share of links (UGC,
  // comments, paid) and noindex/nofollow on whole pages; a crawler that
  // ignores them over-crawls and pollutes link-based rank. All four
  // patterns below are CONSTANTS shared verbatim with the DuckDB oracle
  // builders (the HrefPattern convention) — RE2-and-Java common ground,
  // no backslashes (so both engines' string literals carry them as-is).

  /** One anchor OPEN TAG — the unit of rel-aware link extraction. Same
    * case/shape subset as [[HrefPattern]] (lowercase `<a `, attributes
    * to the closing `>`); an unclosed tag yields nothing, like an
    * unclosed `<a>` yields no link chars in [[blocks]]. */
  val AnchorTagPattern: String = """(<a [^>]*>)"""

  /** href of one captured anchor tag — [[HrefPattern]]'s href-first
    * subset, anchored to the tag start. */
  val TagHrefPattern: String = """^<a href="?([^"> ]+)"?"""

  /** rel value containing the `nofollow` token inside one anchor tag —
    * case-insensitive, list-tolerant (`rel="ugc nofollow"` matches). */
  val RelNofollowPattern: String = """(?i) rel="?[^">]*nofollow"""

  /** `<meta name=robots>` content value (the page-level directive;
    * vocabulary: noindex / nofollow tokens, comma- or space-separated).
    * rel/name-first attribute order, the fixture-pinned subset. */
  val MetaRobotsPattern: String =
    """(?i)<meta[^>]*name="?robots"?[^>]*content="?([^">]*)"""

  /** `<link rel=canonical>` href value — the publisher's own canonical
    * election hint. */
  val CanonicalHrefPattern: String =
    """(?i)<link[^>]*rel="?canonical"?[^>]*href="?([^"> ]+)"?"""

  /** Lowercased robots-meta content of a page ('' when the tag is
    * absent) — callers test for the `noindex` / `nofollow` tokens. */
  def metaRobots(html: Column): Column =
    lower(regexp_extract(html, MetaRobotsPattern, 1))

  /** The page's canonical hint href ('' when absent); resolve with
    * [[resolveHref]] against the page url, then canonicalize — the hint
    * is just another src→dst edge for [[Url.resolveChains]]. */
  def canonicalHref(html: Column): Column =
    regexp_extract(html, CanonicalHrefPattern, 1)

  /** [[linkEdges]] with the publisher's follow directives (r16 verdict
    * #3): (src, dst, w, nofollow) — an anchor occurrence is nofollow if
    * it carries rel=nofollow OR its whole page does (`pageNofollow`, a
    * Column over `pages` — meta robots / X-Robots-Tag are the caller's
    * surfaces: head tag and HTTP header); the EDGE is nofollow iff
    * EVERY occurrence is (bool_and — an edge a publisher asserts
    * follow-able anywhere stays follow-able; the pinned merge). Same
    * scale shape as [[linkEdges]]: codegen'd regexp builtins, one
    * narrow explode, ONE shuffle. */
  def linkEdgesRel(pages: DataFrame, urlCol: String = "url",
                   htmlCol: String = "html",
                   pageNofollow: Column = lit(false)): DataFrame =
    pages.select(col(urlCol).as("src"), pageNofollow.as("__pnf"),
        explode(regexp_extract_all(col(htmlCol), lit(AnchorTagPattern), lit(1)))
          .as("tag"))
      .withColumn("href", regexp_extract(col("tag"), TagHrefPattern, 1))
      .filter(col("href") =!= "")
      .withColumn("dst", resolveHref(col("src"), col("href")))
      .filter(col("dst").isNotNull)
      .withColumn("nf", col("tag").rlike(RelNofollowPattern) || col("__pnf"))
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("w"), bool_and(col("nf")).as("nofollow"))

  /** The crawl's LINK GRAPH: (src, dst, w) edges from every `<a href>`
    * target, [[resolveHref]]-resolved against the page's own url —
    * absolute, protocol-relative, path-absolute, query-only, and
    * page-relative (dot segments normalized) targets all resolve;
    * fragment-only and non-http-scheme targets drop. Pure codegen'd
    * regexp builtins: one narrow explode, then ONE shuffle — the
    * (src, dst) groupBy. At crawl scale the edge table is the web graph
    * itself; downstream consumers ([[PageRank]], HITS, spam heuristics)
    * shuffle it by key, never the page bytes. */
  def linkEdges(pages: DataFrame, urlCol: String = "url",
                htmlCol: String = "html"): DataFrame =
    pages.select(col(urlCol).as("src"),
        explode(regexp_extract_all(col(htmlCol), lit(HrefPattern), lit(1)))
          .as("href"))
      .withColumn("dst", resolveHref(col("src"), col("href")))
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

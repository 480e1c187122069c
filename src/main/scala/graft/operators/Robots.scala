package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

case class RobotsFile(site: String, robots_txt: String)

/** One effective rule for the chosen agent, in file order. */
case class RobotsRule(site: String, rule_idx: Int, allow: Boolean, path: String)

/** Robots Exclusion Protocol (RFC 9309) — the PERMISSION layer of a
  * crawl: which canonical URLs may be fetched at all. Two halves, each
  * scale-shaped:
  *
  *  1. [[rules]]: parse each host's robots.txt for one crawler agent.
  *     Group semantics per the RFC: consecutive `User-agent` lines
  *     share a group; a group with the SPECIFIC agent token (exact,
  *     case-insensitive) makes every `*` group ignored; multiple
  *     matching groups merge in file order; rules before any
  *     User-agent line are ignored; empty patterns match nothing;
  *     unknown directives (Crawl-delay, Sitemap, …) and comments are
  *     skipped; CRLF and LF both parse. One robots.txt is ≤ 500 KB by
  *     RFC, one row per HOST — the per-row line walk is bounded state,
  *     and the output rule table is broadcast-sized even for a
  *     full-web crawl (tens of rules × millions of hosts).
  *  2. [[allowDecisions]]: longest-match verdict per URL — join urls
  *     to rules on the HOST equi-key with a prefix predicate, keep the
  *     longest matching rule (ties: Allow wins, then lexicographic for
  *     determinism), default ALLOW when nothing matches. One equi-join
  *     + one groupBy on the url key; never urls × all-rules.
  *
  * Pattern language (RFC 9309 §2.2.3, oracle-replayable): a rule
  * pattern matches from the START of the normalized path; `*` matches
  * any character sequence; a TRAILING `$` anchors the end of the path.
  * Pinned choices (documented so the DuckDB oracle replays them
  * exactly): a NON-trailing `$` is a literal character; specificity for
  * longest-match is the RAW pattern length (wildcards counted — the
  * googlebot convention), ties Allow-wins then lexicographic. Matching
  * is on the PATH only (query excluded). The pattern→regex conversion
  * is ONE shared SQL expression ([[patternRegexSqlFor]]) interpolated
  * into both the Spark join predicate and the DuckDB oracle, so the
  * two sides cannot drift. */
object Robots {

  /** SQL expression — parseable by BOTH Spark SQL and DuckDB — that
    * converts the robots pattern expression `p` into an anchored
    * RE2-and-Java-safe regex: trailing `$` → end anchor, `*` → `.*`,
    * every other regex metacharacter escaped literally. Backslashes are
    * built with chr(92) because the two engines disagree on backslash
    * escapes inside string literals (Spark processes them, DuckDB does
    * not). Plain-prefix patterns (no wildcards) convert to `^literal`,
    * preserving the old startswith semantics exactly. */
  private[graft] def patternRegexSqlFor(p: String): String = {
    val anchored = s"substr($p, length($p), 1) = chr(36)"
    val stem = s"CASE WHEN $anchored THEN substr($p, 1, length($p) - 1) ELSE $p END"
    // escape order: backslash FIRST (later steps introduce none), then
    // the remaining metacharacters; '*' stays un-escaped and becomes .*
    val metas = Seq(".", "+", "?", "(", ")", "[", "]", "{", "}", "|", "^")
    val esc0 = s"replace($stem, chr(92), chr(92) || chr(92))"
    val escd = metas.foldLeft(esc0) { (acc, m) =>
      s"replace($acc, '$m', chr(92) || '$m')"
    }
    // mid-pattern '$' is literal (the trailing anchor was stripped above)
    val dollarEscd = s"replace($escd, chr(36), chr(92) || chr(36))"
    val starred = s"replace($dollarEscd, '*', '.*')"
    s"('^' || $starred || CASE WHEN $anchored THEN chr(36) ELSE '' END)"
  }

  /** Driver-side twin of [[patternRegexSqlFor]] + match, for tests and
    * driver-side planning. */
  private[graft] def matchesPattern(path: String, pattern: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val stem = if (anchored) pattern.dropRight(1) else pattern
    val sb = new StringBuilder("^")
    stem.foreach {
      case '*' => sb.append(".*")
      case c if "\\.+?()[]{}|^$".contains(c) => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    if (anchored) sb.append('$')
    sb.toString().r.findFirstMatchIn(path).isDefined
  }

  def readRobots(spark: SparkSession, path: String): Dataset[RobotsFile] = {
    import spark.implicits._
    spark.read.parquet(path).select(col("site"), col("robots_txt")).as[RobotsFile]
  }

  /** Effective (allow, path) rules for `agent`, per site, file order. */
  def rules(files: Dataset[RobotsFile], agent: String): Dataset[RobotsRule] = {
    import files.sparkSession.implicits._
    files.flatMap { f =>
      effectiveRules(f.robots_txt, agent).zipWithIndex.map {
        case ((allow, path), i) => RobotsRule(f.site, i, allow, path)
      }
    }
  }

  /** Longest-match verdicts: one row per url row with `allowed` and
    * `matched_rule` ('' when no rule matched — the default-allow path).
    * `urls` must carry a unique `keyCol`; extra columns are preserved
    * via the first-value trick on the group. */
  def allowDecisions(urls: DataFrame, ruleRows: Dataset[RobotsRule],
                     keyCol: String = "doc_id", hostCol: String = "host",
                     pathCol: String = "path"): DataFrame = {
    val r = ruleRows.toDF().select(col("site"), col("allow"),
      col("path").as("rule_path"))
      // precomputed once per RULE row (broadcast-sized), not per url×rule
      .withColumn("__rule_re", expr(patternRegexSqlFor("rule_path")))
    val joined = urls.join(r,
      urls(hostCol) === r("site") &&
        expr(s"$pathCol rlike __rule_re"), "left")
    val carried = urls.columns.filterNot(_ == keyCol)
    val best = max(when(col("rule_path").isNotNull,
      struct(length(col("rule_path")).as("l"),
        col("allow").cast("int").as("a"),
        col("rule_path").as("p")))).as("best")
    joined.groupBy(col(keyCol))
      .agg(best, carried.map(c => first(col(c)).as(c)): _*)
      .withColumn("allowed",
        coalesce(col("best.a") === 1, lit(true)))
      .withColumn("matched_rule", coalesce(col("best.p"), lit("")))
      .drop("best")
  }

  /** The chosen-group rule list of one robots.txt, RFC group semantics,
    * file order. Total: malformed lines are skipped, never thrown on. */
  private[graft] def effectiveRules(txt: String,
                                    agent: String): Seq[(Boolean, String)] =
    chosenGroups(txt, agent).flatMap(_.rules).toSeq

  /** Per-site `Crawl-delay` for `agent` — the per-host politeness knob
    * (r14 verdict #8; not in RFC 9309 but honored by Bing/Yandex-class
    * crawlers and ubiquitous in the wild). Pinned semantics: integer
    * seconds only (non-integer values ignored — a malformed directive
    * must not stall a host forever), group selection IDENTICAL to
    * [[effectiveRules]], and when several chosen groups declare it the
    * MAX wins (the conservative merge). One row per site that declares
    * one. */
  def crawlDelays(files: Dataset[RobotsFile], agent: String): DataFrame = {
    import files.sparkSession.implicits._
    files.flatMap { f =>
      val ds = chosenGroups(f.robots_txt, agent).flatMap(_.delays)
      if (ds.isEmpty) None else Some((f.site, ds.max))
    }.toDF("site", "crawl_delay")
  }

  /** `Sitemap:` declarations of every robots.txt — the crawl-discovery
    * hook sitemaps.org standardized and RFC 9309 §2.3 carries as the
    * canonical "other record". Pinned semantics (the oracle replays
    * them): GLOBAL — a Sitemap line belongs to the FILE, never a group
    * (one sitting between two User-agent lines changes nothing, and the
    * grouping parser above ignores it entirely); key case-insensitive,
    * leading whitespace tolerated; trailing `#` comments stripped
    * BEFORE parsing (the line-tokenizer rule every directive shares);
    * the value is the whole trimmed remainder after the first `:`;
    * empty values drop. One row per declaration, file order:
    * (site, ord, sitemap_url). A site declaring none emits nothing —
    * sitemap discovery is opt-in, unlike the default-allow rule gate. */
  def sitemapUrls(files: Dataset[RobotsFile]): DataFrame = {
    import files.sparkSession.implicits._
    files.flatMap { f =>
      f.robots_txt.split("\r\n|\n", -1).iterator
        .map(_.takeWhile(_ != '#').trim)
        .flatMap { line =>
          val ci = line.indexOf(':')
          if (ci > 0 && line.substring(0, ci).trim.toLowerCase == "sitemap") {
            val v = line.substring(ci + 1).trim
            if (v.nonEmpty) Some(v) else None
          } else None
        }
        .zipWithIndex
        .map { case (u, i) => (f.site, i.toLong, u) }
        .toSeq
    }.toDF("site", "ord", "sitemap_url")
  }

  /** One parsed group: its agent tokens, (allow, path) rules in file
    * order, and any integer Crawl-delay declarations. */
  private final case class Group(
      agents: mutable.Set[String],
      rules: mutable.ArrayBuffer[(Boolean, String)],
      delays: mutable.ArrayBuffer[Int])

  /** The groups [[effectiveRules]]/[[crawlDelays]] read: a SPECIFIC
    * `agent` group makes every `*` group ignored; multiple matching
    * groups merge in file order. */
  private def chosenGroups(txt: String, agent: String): Seq[Group] = {
    val groups = mutable.ArrayBuffer.empty[Group]
    var collectingAgents = false
    txt.split("\r\n|\n", -1).foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val ci = line.indexOf(':')
        if (ci > 0) {
          val key = line.substring(0, ci).trim.toLowerCase
          val value = line.substring(ci + 1).trim
          key match {
            case "user-agent" =>
              if (!collectingAgents) {
                groups += Group(mutable.Set.empty,
                  mutable.ArrayBuffer.empty, mutable.ArrayBuffer.empty)
                collectingAgents = true
              }
              if (value.nonEmpty) groups.last.agents += value.toLowerCase
            case "allow" | "disallow" =>
              collectingAgents = false
              // empty pattern matches nothing; rules before any group drop
              if (groups.nonEmpty && value.nonEmpty)
                groups.last.rules += ((key == "allow", value))
            case "crawl-delay" =>
              // the VALUE attaches to the current group, but the line
              // keeps the RFC ignore-unrecognized GROUPING semantics:
              // it must NOT end agent collection (pinned by spec — a
              // Crawl-delay between two User-agent lines would
              // otherwise split one group in two and detach its rules
              // from the first agent); pre-group declarations drop
              if (groups.nonEmpty)
                value.toIntOption.filter(_ >= 0)
                  .foreach(groups.last.delays += _)
            // RFC 9309: other unrecognized lines are IGNORED ENTIRELY —
            // same grouping rule (e.g. an innocuous `Sitemap` between
            // two User-agent lines)
            case _ => ()
          }
        } else () // malformed line: ignored entirely, same rule
      }
    }
    val a = agent.toLowerCase
    val specific = groups.filter(_.agents.contains(a))
    if (specific.nonEmpty) specific.toSeq
    else groups.filter(_.agents.contains("*")).toSeq
  }
}

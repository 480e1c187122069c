package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the key every crawl pipeline dedups on BEFORE
  * any content arrives: the same page is fetched as `HTTP://WWW.Ex.COM`,
  * with tracking parameters, with a fragment, with a default port, with
  * shuffled query order — and a canonical form collapses them so fetch
  * scheduling, politeness, and URL-level dedup all key on one string.
  *
  * Deterministic, rule-based, and built ENTIRELY from codegen'd string
  * builtins (`regexp_extract` / `split` / higher-order array functions —
  * no UDF), so canonicalization is a narrow per-row projection: zero
  * shuffle, embarrassingly parallel at any scale, and replayable in
  * ANSI-ish SQL by the oracle.
  *
  * Rules (each integer/string-exact):
  *  1. scheme and host lowercase; userinfo (`user:pw@`) stripped;
  *  2. default ports stripped (`:80` for http, `:443` for https),
  *     non-default ports kept;
  *  3. empty path becomes `/`; a single trailing `/` on a non-root path
  *     is stripped;
  *  4. query parameters: empties dropped, tracking params dropped
  *     (`utm_*` prefix and the [[Url.TrackingKeys]] set, both
  *     case-insensitive on the KEY), the rest SORTED bytewise and
  *     re-joined — parameter order never splits a canonical group;
  *  5. fragment dropped.
  *
  * [[registeredDomain]] reduces a host to its registrable domain with a
  * pinned multi-part-suffix list (the public-suffix idea at fixture
  * scale) — the politeness/grouping key of a crawler. */
object Url {

  /** Query keys dropped at canonicalization (exact, case-insensitive). */
  val TrackingKeys: Seq[String] = Seq("gclid", "fbclid", "ref", "msclkid")

  /** Multi-part public suffixes the fixture domains exercise; a
    * production deployment swaps in the full public-suffix list (it is
    * a broadcast-sized table — ~10k rows). */
  val MultiPartSuffixes: Seq[String] =
    Seq("co.uk", "org.uk", "ac.uk", "co.jp", "com.au", "com.br", "co.in")

  private val SchemePat = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val AuthorityPat = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val PathPat = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"

  def scheme(u: Column): Column = lower(regexp_extract(u, SchemePat, 1))

  private def authority(u: Column): Column = regexp_extract(u, AuthorityPat, 1)

  /** Lowercased host: authority minus userinfo and port. */
  def host(u: Column): Column =
    lower(regexp_extract(authority(u), "^(?:[^@]*@)?([^:]*)", 1))

  /** Explicit port digits, '' if none. */
  def port(u: Column): Column =
    regexp_extract(authority(u), ":([0-9]+)$", 1)

  def rawPath(u: Column): Column = regexp_extract(u, PathPat, 1)

  /** Query = first '?' BEFORE any '#' — an unanchored `\?` would match
    * a '?' inside the fragment and resurrect fragment content as query
    * (the SPA `#/route?page=2` shape). */
  def rawQuery(u: Column): Column =
    regexp_extract(u, "^[^#]*?\\?([^#]*)", 1)

  /** Rule 3: '' → '/', non-root single trailing '/' stripped. */
  def normPath(u: Column): Column = {
    val p = rawPath(u)
    val p0 = when(p === "", lit("/")).otherwise(p)
    when(length(p0) > 1 && p0.endsWith("/"),
      p0.substr(lit(1), length(p0) - 1)).otherwise(p0)
  }

  /** Rule 4: drop empties + tracking, sort bytewise, re-join. '' if no
    * surviving params. */
  def cleanQuery(u: Column): Column = {
    val keyOf = (p: Column) => lower(split(p, "=").getItem(0))
    val kept = filter(split(rawQuery(u), "&"), p =>
      p =!= "" && !keyOf(p).startsWith("utm_") && !keyOf(p).isin(TrackingKeys: _*))
    array_join(array_sort(kept), "&")
  }

  /** Rules 1-5 composed: the canonical URL string. */
  def canonicalize(u: Column): Column = {
    val sch = scheme(u)
    val pt = port(u)
    val isDefault = pt === "" ||
      (sch === "http" && pt === "80") || (sch === "https" && pt === "443")
    val hostPort = when(isDefault, host(u))
      .otherwise(concat(host(u), lit(":"), pt))
    val q = cleanQuery(u)
    concat(sch, lit("://"), hostPort, normPath(u),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** TABLE-driven registrable domain — the production form of
    * [[registeredDomain]]: the public-suffix list is a broadcast-sized
    * table (one `suffix` column, ~10k rows — fixtures/psl.parquet is
    * the PSL-shaped stand-in), and the registrable domain is one label
    * plus the LONGEST listed suffix the host ends with on a label
    * boundary. Pinned edge semantics (mirrored by the DuckDB oracle):
    * a host that IS a listed suffix maps to itself; a host whose
    * suffix is unlisted falls back to the last two labels (the
    * [[registeredDomain]] fallback). Shape: candidate suffixes are the
    * last 1..4 labels (public suffixes are ≤ 4 labels) — one narrow
    * posexplode, ONE broadcast equi-join against the list, a keyed max,
    * and a join back on a row key. Never host × list. */
  def withRegisteredDomain(df: DataFrame, hostCol: String, psl: DataFrame,
                           out: String = "registered_domain"): DataFrame = {
    val keyed = df.withColumn("__rd_key", monotonically_increasing_id())
    val labels = split(col(hostCol), "\\.")
    val cands = keyed.select(col("__rd_key"), col(hostCol).as("__rd_h"),
      posexplode(transform(sequence(lit(1), least(lit(4), size(labels))),
        k => array_join(slice(labels, -k, k), "."))).as(Seq("__rd_i", "suffix")))
    val best = cands
      .join(broadcast(psl.select(col("suffix"))), Seq("suffix"))
      .groupBy(col("__rd_key"))
      // candidate i (0-based) has i+1 labels: max __rd_i IS the longest
      .agg(max(col("__rd_i")).as("__rd_best"))
    keyed.join(best, Seq("__rd_key"), "left")
      .withColumn(out, {
        val lb = split(col(hostCol), "\\.")
        val n = size(lb)
        // listed: one label + the suffix (capped at the whole host);
        // unlisted: the last-two-labels fallback
        val m = when(col("__rd_best").isNotNull,
          least(n, col("__rd_best") + 2)).otherwise(least(n, lit(2)))
        array_join(slice(lb, -m, m), ".")
      })
      .drop("__rd_key", "__rd_best")
  }

  /** BOUNDED MULTI-HOP redirect resolution (r14 verdict #4): the
    * ubiquitous real-web chain is http → https → www → 200, and a
    * frontier that only chases one hop re-fetches every intermediate
    * hop as if it were a page. Input: the redirect MAP — (srcCol,
    * dstCol) edges, both already canonicalized (q332). Output one row
    * per redirect source: (url, terminal_url, n_hops, unterminated).
    *
    * Semantics (pinned; the oracle unrolls the identical hops):
    * terminal starts at the 1-hop target; each of the remaining
    * `maxHops - 1` rounds advances it iff it has an outgoing edge.
    * After the rounds, `unterminated` = the terminal STILL has an
    * outgoing edge — true for every url on or into a redirect loop
    * (301 cycles oscillate and never clear the flag) and for honest
    * chains longer than `maxHops` (vanishingly rare: browsers cap
    * around 20, crawlers at ~5). Loud, not fatal: one loop must flag
    * its rows, never kill a 100 TB scan.
    *
    * Scale shape: `maxHops` bounded self-joins of the redirect map —
    * the map is 3xx-row-sized (≪ corpus), each round one keyed
    * equi-join, no iteration-to-fixpoint.
    *
    * The map is FUNCTIONALIZED first: duplicate src rows (two 301
    * captures of one url with different Location targets — recrawls,
    * A/B redirects) would otherwise fan out multiplicatively through
    * each self-join and again at the unterminated join. Pinned choice:
    * `min(dst)` per src — deterministic, and replayed by the oracle. */
  def resolveChains(edges: DataFrame, srcCol: String = "src",
                    dstCol: String = "dst", maxHops: Int = 4): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val e = edges.select(col(srcCol).cast("string").as("__e_src"),
        col(dstCol).cast("string").as("__e_dst"))
      .groupBy("__e_src").agg(min(col("__e_dst")).as("__e_dst"))
    var cur = e.select(col("__e_src").as("url"),
      col("__e_dst").as("terminal_url"), lit(1L).as("n_hops"))
    for (k <- 2 to maxHops) {
      val hop = e.toDF(s"__h${k}_src", s"__h${k}_dst")
      cur = cur.join(hop, col("terminal_url") === col(s"__h${k}_src"), "left")
        .select(col("url"),
          coalesce(col(s"__h${k}_dst"), col("terminal_url")).as("terminal_url"),
          (col("n_hops") +
            when(col(s"__h${k}_dst").isNotNull, 1L).otherwise(0L)).as("n_hops"))
    }
    val outs = e.select(col("__e_src").as("__o_src")).distinct()
    cur.join(outs, col("terminal_url") === col("__o_src"), "left")
      .select(col("url"), col("terminal_url"), col("n_hops"),
        col("__o_src").isNotNull.as("unterminated"))
  }

  /** Registrable domain of a (lowercased) host: last two labels, or
    * three when the last two are a pinned multi-part suffix; hosts with
    * ≤ 2 labels pass through. */
  def registeredDomain(h: Column): Column = {
    val labels = split(h, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    when(n <= 2, h)
      .when(last2.isin(MultiPartSuffixes: _*),
        concat_ws(".", element_at(labels, -3), element_at(labels, -2), element_at(labels, -1)))
      .otherwise(last2)
  }
}

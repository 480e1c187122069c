package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis building blocks for the LLM-data-pipeline
  * operators (dedup, quality scoring, language ID, fingerprinting) over the
  * harness `documents` table.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (split / transform / aggregate / regexp) — no UDFs, so every expression
  * stays inside whole-stage codegen and each operator is a single narrow
  * map over the corpus: at 100 TB these run scan-speed with zero shuffles
  * until an aggregation downstream asks for one.
  *
  * Cross-engine determinism: hash primitives exposed to oracle-checked
  * queries use md5 (bit-identical in Spark and DuckDB); ratio outputs are a
  * SINGLE IEEE division of two exact integers (bit-identical across engines,
  * unlike multi-term double sums).
  */
object TextFunctions {

  /** Whitespace tokenization, lowercased. The corpus is single-space
    * separated; `split` on the literal separator matches DuckDB's
    * `string_split(lower(text), ' ')` exactly (regex-free). */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Distinct word k-shingles ("n-gram" units for near-dup Jaccard):
    * `concat_ws(" ", w[i..i+k-1])` for every window, deduped keeping first
    * occurrence. One native pass — see [[graft.expressions.WordShingles]]
    * (the HOF formulation it replaced ran interpreted and dominated the
    * dedup-suite profile). Rows with fewer than k tokens yield an empty
    * array. */
  def wordShingles(toks: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.GraftSqlBridge
    GraftSqlBridge.column(
      graft.expressions.WordShingles(GraftSqlBridge.expression(toks), k))
  }

  /** A BPE-ish surface tokenizer: maximal word runs plus single
    * non-word-non-space symbols. Same pattern compiles identically under
    * Java regex (Spark) and RE2 (DuckDB). */
  val surfaceTokenPattern = "\\w+|[^\\w\\s]"
  def surfaceTokens(text: Column): Column =
    regexp_extract_all(text, lit(surfaceTokenPattern), lit(0))

  /** Portable 60-bit integer hash: first 15 hex chars of md5, base-16
    * decoded. DuckDB mirror: `('0x' || substring(md5(x),1,15))::BIGINT`. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Portable 32-bit integer hash (first 8 md5 hex chars) — small enough
    * for per-bit simhash arithmetic without overflow. */
  def md5Int(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Count of tokens belonging to a fixed lexicon — one native hash-probe
    * pass (see [[graft.expressions.LexiconHits]]; the `size(filter(...))`
    * HOF it replaced interpreted a lambda per token). */
  def lexiconHits(toks: Column, lexicon: Seq[String]): Column = {
    import org.apache.spark.sql.graft.GraftSqlBridge
    GraftSqlBridge.column(
      graft.expressions.LexiconHits(GraftSqlBridge.expression(toks), lexicon))
  }

  /** The declarative formulation [[lexiconHits]] replaced — kept for the
    * bit-equality test of the native expression. */
  private[graft] def lexiconHitsHof(toks: Column, lexicon: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(lexicon)))

  /** Character trigrams of the raw text (1-based sliding window) — the
    * n-gram units a profile-based language identifier scores against.
    * One native pass (see [[graft.expressions.CharNgrams]]; the
    * transform-HOF it replaced interpreted a substr per position). Texts
    * shorter than 3 chars yield an empty array. DuckDB mirror:
    * `list_transform(generate_series(1, length(t)-2),
    * i -> substring(t, i, 3))` (generate_series is empty when stop <
    * start, so the mirror needs no short-string guard). */
  def charTrigrams(text: Column): Column = {
    import org.apache.spark.sql.graft.GraftSqlBridge
    GraftSqlBridge.column(
      graft.expressions.CharNgrams(GraftSqlBridge.expression(text), 3))
  }

  /** PII scrubbing patterns — the redaction pass every pretraining corpus
    * runs before tokenization. ASCII classes only, no backreferences or
    * lookaround, so each pattern compiles to the SAME automaton under Java
    * regex (Spark codegen) and RE2 (DuckDB oracle). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val longNumPattern = "\\b\\d{7,}\\b"

  /** Replace emails, IPv4s, then long digit runs with typed placeholder
    * tokens. Order matters: emails first (they contain dots and digits the
    * later passes would mangle). Three codegen'd regexp_replace ops — one
    * narrow pass, no shuffle. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      longNumPattern, "<ID>")

  /** Rolling polynomial fingerprint of the whole string:
    * fold(code points, acc = (acc*31 + code) mod 1e9+7), as the native
    * one-pass [[graft.expressions.PolyFingerprint]] expression (the HOF
    * fold it replaced ran interpreted per character). DuckDB mirror:
    * `list_reduce([0] || codes, ...)` (prepending 0 reproduces the zero
    * initial accumulator — 0*31+c == c). */
  def polyFingerprint(text: Column): Column = {
    import org.apache.spark.sql.graft.GraftSqlBridge
    GraftSqlBridge.column(
      graft.expressions.PolyFingerprint(GraftSqlBridge.expression(text)))
  }

  /** The declarative HOF formulation [[polyFingerprint]] replaced — kept
    * for the bit-equality test of the native expression. */
  private[graft] def polyFingerprintHof(text: Column): Column = {
    val codes = transform(sequence(lit(1), length(text)), i => ascii(text.substr(i, lit(1))))
    aggregate(codes, lit(0L), (acc, c) => (acc * 31 + c) % 1000000007L)
  }
}

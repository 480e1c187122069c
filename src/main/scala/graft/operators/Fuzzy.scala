package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) string matching at scale via the DELETION
  * NEIGHBORHOOD (FastSS, Bocek et al. 2007): for k = 1, two strings are
  * within edit distance 1 iff their deletion neighborhoods — the string
  * itself plus every single-character-deleted variant — intersect
  * (deletion: a IS a variant of b; substitution: deleting the differing
  * position from both sides meets in the middle; insertion: symmetric).
  *
  * That equivalence turns fuzzy matching into an EQUI-join on variant
  * strings: each input row fans out to length+1 variants (a narrow
  * codegen'd HOF — no UDF), candidates meet in a hash shuffle keyed on the
  * variant, and an exact `levenshtein` verify (built-in, codegen'd) keeps
  * precision at 1.0. Cost is O(Σ len) variants and only colliding
  * candidates ever pair up — never the O(n²) all-pairs the oracle runs.
  * (Hot variants — e.g. many strings sharing a deletion — behave like any
  * hot join key: AQE skew handling applies.)
  */
object Fuzzy {

  /** Distinct unordered pairs (a < b) of `strings`.`strCol` within
    * Levenshtein distance 1, via deletion-neighborhood candidates + exact
    * verify. Input rows should already be distinct strings. */
  def editDistance1Pairs(strings: DataFrame, strCol: String): DataFrame = {
    val s = col(strCol)
    val variants = concat(
      array(s),
      transform(sequence(lit(1), length(s)), i =>
        // suffix length: length(s) always covers the remainder — a fixed
        // cap would corrupt variants of strings longer than the cap
        concat(substring(s, lit(1), i - lit(1)), s.substr(i + lit(1), length(s)))))
    val fanned = strings
      .select(s.as("s"), explode(variants).as("v"))
    val a = fanned.select(col("v"), col("s").as("a"))
    val b = fanned.select(col("v"), col("s").as("b"))
    a.join(b, Seq("v"))
      .filter(col("a") < col("b"))
      .select("a", "b")
      .distinct()
      .filter(levenshtein(col("a"), col("b")) <= 1)
  }
}

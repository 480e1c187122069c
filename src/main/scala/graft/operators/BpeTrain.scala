package graft.operators

import graft.operators.Sever.SeverOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer TRAINING — the
  * vocabulary-learning step of an LLM data pipeline, run where it belongs:
  * over the word-frequency table, not the corpus.
  *
  * Shape at 100 TB: the corpus is touched ONCE ([[wordFreq]]: tokenize +
  * hash-groupBy — the same scan shape as q34's token stats); every
  * training round after that runs over the VOCABULARY (|V| ~ 10^5-10^7
  * rows at web scale — millions of times smaller than the corpus), so the
  * iterative part costs one vocab-sized aggregate + one bounded argmax
  * collect + one narrow map per round. This corpus-once/vocab-iterate
  * split is exactly how reference tokenizer trainers scale, and the only
  * shape that does.
  *
  * Merge-application semantics are CANONICAL GREEDY BPE (scan the symbol
  * sequence left to right, merge each non-overlapping (l, r) occurrence,
  * continue after the merged token — the reference semantics of the
  * standard trainers), implemented as a single string `replace` over a
  * BRACKETED symbol encoding: a word's symbol sequence is held as
  * `<s1><s2>...<sk>`, and applying merge (l, r) is
  * `replace(seq, "<l><r>", "<lr>")`. Because every symbol carries its own
  * delimiters, a match consumes BOTH complete units and adjacent
  * occurrences share no boundary character — which makes plain
  * replace-all-left-to-right EXACTLY the greedy algorithm (equivalence
  * property-tested against a naive in-memory trainer in BpeSpec, and the
  * encoding is what lets an independent SQL engine replay training
  * verbatim: see `ScaleQueries.q133BpeTrain`'s oracle). Symbols stay
  * bracket-safe because [[wordFreq]] admits only `[a-z]+` word forms (the
  * usual normalized training alphabet).
  */
object BpeTrain {

  /** One learned merge rule. `cnt` is the pair's weighted frequency at
    * the time it was chosen (the classic merge-priority record). */
  case class Merge(step: Int, lhs: String, rhs: String, merged: String, cnt: Long)

  /** The corpus-once step: lowercase `[a-z]+` word forms and their
    * frequencies. This is the ONLY scan of the text; training iterates
    * over its (distinct-word-sized) output. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z]+"), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** `<c1><c2>...<ck>` initial symbol encoding of a word (one symbol per
    * character). */
  def initialSeq(word: Column): Column =
    regexp_replace(word, "(.)", "<$1>")

  /** The symbol array of an encoded sequence. */
  def symbols(seq: Column): Column =
    regexp_extract_all(seq, lit("<([a-z]+)>"), lit(1))

  /** Adjacent-pair frequencies over encoded vocab rows (`seq`, `cnt`):
    * one narrow pass + one vocab-sized aggregate. */
  def pairCounts(vocab: DataFrame): DataFrame = {
    val toks = symbols(col("seq"))
    val pairs = zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => struct(a.as("lhs"), b.as("rhs")))
    vocab.select(explode(pairs).as("p"), col("cnt"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** `numMerges` training rounds over a (`word`, `cnt`) vocabulary.
    * Per round: vocab-sized pair aggregate, ONE-ROW argmax collect
    * (deterministic total order: count DESC, lhs ASC, rhs ASC), narrow
    * re-encode. The returned merge table is `numMerges` rows — the
    * bounded artifact a tokenizer ships. */
  def train(vocab: DataFrame, numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1 && numMerges <= 4096, s"numMerges out of range: $numMerges")
    var cur = vocab.select(initialSeq(col("word")).as("seq"), col("cnt"))
      .sever() // sever the source lineage once
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      val top = pairCounts(cur)
        .orderBy(desc("cnt"), asc("lhs"), asc("rhs"))
        .limit(1).collect() // bounded: exactly one row per round
      if (top.isEmpty) done = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(step, l, r, l + r, c)
        // plain (non-regex) replace of the bracketed pair = greedy merge;
        // localCheckpoint severs the per-round lineage growth
        cur = cur.withColumn("seq",
            org.apache.spark.sql.functions.replace(
              col("seq"), lit(s"<$l><$r>"), lit(s"<$l$r>")))
          .sever()
        step += 1
      }
    }
    merges.toSeq
  }

  /** Apply a learned merge table to a bracketed symbol sequence, in merge
    * order — encoding is the same greedy replace chain training used, so a
    * corpus tokenized with the learned rules reproduces training's final
    * vocabulary state exactly. Narrow per-row column ops: the merge table
    * rides into the plan as literals (it is `numMerges` rows — driver-side
    * by construction), no join, no shuffle. */
  def applyMerges(seq: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(seq) { (c, m) =>
      org.apache.spark.sql.functions.replace(
        c, lit(s"<${m.lhs}><${m.rhs}>"), lit(s"<${m.merged}>"))
    }

  /** [[train]] over a text column, as a DataFrame of the merge table. */
  def trainOnText(spark: SparkSession, docs: DataFrame, textCol: String,
                  numMerges: Int): DataFrame = {
    val merges = train(wordFreq(docs, textCol), numMerges)
    spark.createDataFrame(merges)
      .select(col("step"), col("lhs"), col("rhs"), col("merged"), col("cnt"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping-window document chunking — the splitter every RAG /
  * pretraining pipeline runs between cleaning and embedding: fixed
  * `window` tokens per chunk, `stride` tokens between chunk starts
  * (overlap = window − stride), and the PINNED tail rule that the last
  * chunk is anchored to END exactly at the document's final token
  * (start = n − window) instead of emitting a degenerate tail that the
  * previous chunk already covers:
  *
  *   n ≤ window → 1 chunk [0, n);
  *   else nChunks = ⌈(n − window)/stride⌉ + 1,
  *        start_k = min(k·stride, n − window), length = window.
  *
  * Every chunk is full-width (except a single short-doc chunk),
  * coverage is exact, overlap is ≥ window − stride everywhere, and
  * chunk ids (doc, idx, start) are stable under re-runs — the property
  * an incremental embedding pipeline keys on.
  *
  * Pure codegen'd builtins (split / sequence / transform / slice), one
  * narrow per-row explode: zero shuffle, embarrassingly parallel, and
  * the DuckDB oracle replays the identical formulas. */
object Chunker {

  def chunkTokens(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text",
                  window: Int = 64, stride: Int = 48): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = split(col(textCol), " ")
    val n = size(toks)
    // last chunk index: 0 for short docs, ceil((n-window)/stride) else
    val lastIdx = when(n <= window, lit(0))
      .otherwise(expr(s"(size(split($textCol, ' ')) - $window + ${stride - 1}) div $stride"))
    docs.select(col(idCol), toks.as("__toks"),
        n.cast("long").as("n_tokens"), lastIdx.cast("long").as("__last"))
      .select(col(idCol), col("n_tokens"), col("__toks"),
        posexplode(expr(
          s"transform(sequence(0L, __last), k -> least(k * $stride, " +
            s"greatest(n_tokens - $window, 0L)))")).as(Seq("chunk_idx", "chunk_start")))
      .withColumn("chunk_idx", col("chunk_idx").cast("long"))
      .withColumn("chunk_text",
        array_join(slice(col("__toks"), (col("chunk_start") + 1).cast("int"),
          lit(window)), " "))
      .withColumn("chunk_tokens",
        least(lit(window.toLong), col("n_tokens") - col("chunk_start")))
      .drop("__toks")
  }
}

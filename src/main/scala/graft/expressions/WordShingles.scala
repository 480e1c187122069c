package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingles of a token array in ONE native pass.
  *
  * Replaces `array_distinct(transform(sequence(0, n-k), i => concat_ws(" ",
  * tokens[i..i+k-1])))` — three chained `CodegenFallback` higher-order
  * passes with a per-window lambda `InternalRow` — with a single loop that
  * concatenates each window (`UTF8String.concatWs`, byte-level) and dedups
  * via a hash set, preserving first-occurrence order exactly like
  * `array_distinct` and DuckDB's `list_distinct` (no oracle-visible output
  * depends on shingle order — signatures take minima, verification takes
  * set sizes — but keeping the same order costs nothing).
  *
  * Shingling feeds every content-dedup operator (MinHash, exact Jaccard,
  * the LSH index build), so its per-core cost is the floor under the whole
  * dedup suite at 100 TB.
  *
  * Fewer than k tokens yields an empty array (callers additionally filter
  * such docs out — see [[graft.operators.Dedup.shingleSets]]).
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects array<string> and k >= 1, got ${child.dataType.sql} / $k")
  }

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.WordShingles.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "graft_shingles"
}

object WordShingles {
  private val space = UTF8String.fromString(" ")

  /** Called from both the interpreted eval and the generated code. */
  def compute(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    val window = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { window(j) = toks.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(space, window: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next(); m += 1 }
    new GenericArrayData(out)
  }
}

package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements belonging to a FIXED lexicon, in one native
  * pass over the array against a prebuilt hash set.
  *
  * Replaces `size(filter(toks, t => t.isInCollection(lexicon)))`: the
  * `filter` higher-order function is `CodegenFallback` — an interpreted
  * lambda invocation per TOKEN, and it materializes the filtered array
  * just to take its size. Language ID and quality scoring run several of
  * these per document, so the per-core cost multiplies. Here the lexicon
  * is hashed once at plan time (`addReferenceObj` hands the set to the
  * generated code) and each token costs one hash probe.
  */
case class LexiconHits(child: Expression, lexicon: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lexicon_hits expects array<string>, got ${t.sql}")
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](lexicon.size * 2)
    lexicon.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    LexiconHits.compute(input.asInstanceOf[ArrayData], set)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("lexiconSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.LexiconHits.compute($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): LexiconHits =
    copy(child = newChild)

  override def prettyName: String = "graft_lexicon_hits"
}

object LexiconHits {
  /** Called from both the interpreted eval and the generated code. */
  def compute(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }
}

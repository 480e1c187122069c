package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial fingerprint of a string in ONE native pass:
  * fold over code points, acc = (acc*31 + codePoint) mod 1e9+7.
  *
  * Replaces `aggregate(transform(sequence(1, length(text)), i =>
  * ascii(substr(text, i, 1))), 0L, (acc, c) => ...)` — two chained
  * `CodegenFallback` higher-order passes that materialize a per-CHARACTER
  * int array and run an interpreted lambda per element (it dominated the
  * fingerprint query's profile) — with a tight code-point loop.
  *
  * Semantics are EXACTLY the HOF formulation's: `ascii(c)` is the CODE
  * POINT of the character (surrogate pairs fold as one value), matching
  * DuckDB's `ascii(text[i])` on its one-character slices, so the oracle
  * mirror (`list_reduce([0] || codes, ...)`) is unchanged.
  */
case class PolyFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_poly_fp expects a string input, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    PolyFingerprint.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.PolyFingerprint.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprint =
    copy(child = newChild)

  override def prettyName: String = "graft_poly_fp"
}

object PolyFingerprint {
  private val MOD = 1000000007L

  /** Called from both the interpreted eval and the generated code. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % MOD
      i += Character.charCount(cp)
    }
    acc
  }
}

package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass MinHash signature of a shingle set: `numHashes` minima in a
  * single sweep over the array.
  *
  * Each shingle string is xxhash64'd ONCE; the k-th hash function is a
  * finalizer-mix of that base hash with the k-th seed (`mix64(h ^ seed_k)`,
  * the splitmix64 avalanche — 2 multiplies + 3 xorshifts). The previous
  * formulation (`transform(seq, s => array_min(transform(shingles, sh =>
  * xxhash64(s, sh))))`) re-hashed every shingle STRING once per hash
  * function — 64× the string traffic — and ran interpreted
  * (`CodegenFallback` higher-order functions). This is the classic
  * "one strong hash + k cheap derived hashes" MinHash construction
  * (Broder-style universal rehashing); collision behavior at a given
  * Jaccard is the standard 1-(1-j^r)^b banding curve.
  *
  * Signature values never reach an oracle-checked output — only exactly
  * verified pairs do (see [[graft.operators.Dedup]]) — so cross-engine
  * portability of the hash is not required here; [[graft.operators.Dedup.portableMinhash]]
  * remains the md5-based oracle-checkable variant.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<string> and numHashes > 0, got ${child.dataType.sql} / $numHashes")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], numHashes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MinHashSignature.compute($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash"
}

object MinHashSignature {

  /** Per-hash-function seeds, derived once from splitmix64 of the index.
    * 1024 hash functions is far beyond any banding scheme in use. */
  private val seeds: Array[Long] = Array.tabulate(1024)(k => mix64(k * 0x9E3779B97F4A7C15L))

  /** splitmix64 finalizer — full avalanche in 5 ops. */
  private def mix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Called from both the interpreted eval and the generated code. */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var k = 0
      while (k < numHashes) {
        val v = mix64(h ^ seeds(k))
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

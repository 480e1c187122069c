package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Shared bit/hash kernel for the graft Bloom filter (build aggregate and
  * membership probe both call these statics, so the two sides can never
  * disagree on hashing). Classic double hashing (Kirsch–Mitzenmacher):
  * position_i = (xxh64(v) XOR i·murmur3(v)) AND (numBits−1) — XOR/AND never
  * overflow (relevant: ANSI mode makes `+` throw on Long overflow), and the
  * power-of-two mask replaces the modulo. Plain Scala object ⇒ static
  * forwarders, callable from generated Java. */
object BloomBits {
  def add(bits: Array[Byte], v: Long, numHashes: Int): Unit = {
    val mask = bits.length * 8L - 1
    val h1 = XXH64.hashLong(v, 42L)
    val h2 = Murmur3_x86_32.hashLong(v, 17).toLong
    var i = 0
    while (i < numHashes) {
      val pos = (h1 ^ (i * h2)) & mask
      bits((pos >>> 3).toInt) = (bits((pos >>> 3).toInt) | (1 << (pos & 7).toInt)).toByte
      i += 1
    }
  }

  def mightContain(bits: Array[Byte], v: Long, numHashes: Int): Boolean = {
    val mask = bits.length * 8L - 1
    val h1 = XXH64.hashLong(v, 42L)
    val h2 = Murmur3_x86_32.hashLong(v, 17).toLong
    var i = 0
    while (i < numHashes) {
      val pos = (h1 ^ (i * h2)) & mask
      if ((bits((pos >>> 3).toInt) & (1 << (pos & 7).toInt)) == 0) return false
      i += 1
    }
    true
  }
}

/** Bloom-filter BUILD as a native `TypedImperativeAggregate`: folds a join
  * key column into a fixed `numBits`-bit array (state is `numBits/8` bytes
  * no matter how many rows flow through; partials merge by byte-OR, so it
  * partial-aggregates map-side like any built-in). The result (BinaryType)
  * is the semi-join pruning filter a 100-TB shuffle join wants: build on
  * the SMALL side, probe the big side's key BEFORE the exchange
  * ([[BloomMightContain]]) so rows that cannot join never enter the
  * shuffle. False positives only — the exact join afterwards removes them,
  * so query results are unchanged; false negatives are impossible.
  *
  * Sizing: m/n ≈ 14 bits/key with `numHashes` = 5 gives FPP ≈ 0.1%
  * (k·ln2 ≈ m/n·0.69 would be optimal at ~10 hashes; 5 keeps the probe
  * cheap at <1% FPP). Spark's own runtime-filter bloom
  * (`spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`) is
  * planner-discretionary and per-query; this one is an engine value the
  * caller can persist and reuse across queries/days (it is just bytes).
  */
case class BloomBuildAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(numBits >= 64 && numBits <= (1 << 27) && Integer.bitCount(numBits) == 1,
    "numBits must be a power of two in [2^6, 2^27]")
  require(numHashes >= 1 && numHashes <= 16, "numHashes must be in [1, 16]")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_build expects a BIGINT key input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](numBits / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomBits.add(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) { buf(i) = (buf(i) | other(i)).toByte; i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuildAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_bloom_build"
}

/** Membership probe against a [[BloomBuildAgg]] filter — a codegen'd scalar
  * expression (stays inside WholeStageCodegen; the emitted Java is one
  * static call on [[BloomBits]]), used as a `filter` on the BIG side of a
  * join before its shuffle. The filter bytes arrive as a BinaryType child —
  * in the intended driver-collected pattern that is a Literal, a plan
  * constant broadcast with the task binary (the bytes are bounded by
  * `numBits`, never by data). */
case class BloomMightContain(value: Expression, bloom: Expression, numHashes: Int)
  extends BinaryExpression {

  override def left: Expression = value
  override def right: Expression = bloom
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType == LongType && bloom.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains expects (BIGINT, BINARY), got " +
        s"(${value.dataType.sql}, ${bloom.dataType.sql})")

  override protected def nullSafeEval(v: Any, b: Any): Any =
    BloomBits.mightContain(b.asInstanceOf[Array[Byte]], v.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, b) =>
      s"graft.expressions.BloomBits.mightContain($b, $v, $numHashes)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                newRight: Expression): BloomMightContain =
    copy(value = newLeft, bloom = newRight)

  override def prettyName: String = "graft_bloom_contains"
}

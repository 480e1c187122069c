package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** HyperLogLog register vector as a native `TypedImperativeAggregate` —
  * the industry-standard cardinality sketch, made ORACLE-CHECKABLE (which
  * `approx_count_distinct`'s HLL++ is not: implementation-defined xxHash,
  * private register layout, libm-corrected estimate).
  *
  * Input: an already-hashed NON-NEGATIVE 60-bit value per row (the caller
  * hashes with [[graft.functions.TextFunctions.md5Long]]). The top `b`
  * bits pick one of m = 2^b registers; the remaining w = 60-b bits set
  * rho = position of the first 1-bit in the w-bit tail (w+1 when the tail
  * is all zeros). State is ONE BYTE per register — m bytes total however
  * many rows flow through — and partials merge by element-wise MAX, the
  * defining HLL property: union of sketches ≡ sketch of union, losslessly.
  * Contrast [[KmvDistinctEstimate]] (k longs, merge = union-then-trim):
  * KMV trades more state for a simpler estimator; HLL is the smaller,
  * more composable sketch. The engine carries both, like any warehouse.
  *
  * Output is the RAW REGISTER VECTOR (`array<int>`, index order), not a
  * corrected estimate: every downstream — zero-register count, integer
  * harmonic sum, raw estimate, cross-batch union — is a deterministic
  * fold over it, and an independent engine rebuilds the identical vector
  * from the same md5 hashes with string ops (DuckDB:
  * `strpos(lpad(bin(h & (2^w-1)), w, '0'), '1')`). The raw-estimator
  * arithmetic stays portable by keeping the harmonic sum INTEGER
  * (sum of 2^(maxRho - M_j), a Long for b >= 3) and spending exactly one
  * double divide at the end — see `ScaleQueries.q131HllDistinct`. The
  * small-range linear-counting correction (m·ln(m/V)) is deliberately NOT
  * applied in-engine: ln is libm, not bit-portable; callers that need it
  * have V (the zero count) in hand.
  */
case class HllRegisters(
    child: Expression,
    b: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(b >= 3 && b <= 12, s"graft_hll precision b must be in [3, 12], got $b")

  /** register count */
  val m: Int = 1 << b
  /** tail width in bits */
  private val wBits: Int = 60 - b
  private val wMask: Long = (1L << wBits) - 1L
  /** rho of an all-zero tail (and the largest value a register can hold) */
  val maxRho: Int = wBits + 1

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hll expects a BIGINT hash input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val j = (h >>> wBits).toInt
      val w = h & wMask
      // position of the first 1-bit in the wBits-wide tail, 1-based;
      // equals the oracle's strpos(lpad(bin(w), wBits, '0'), '1')
      val rho = if (w == 0L) maxRho else java.lang.Long.numberOfLeadingZeros(w) - (63 - wBits)
      if (rho > buf(j)) buf(j) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt: Any))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegisters =
    copy(child = newChild)

  override def prettyName: String = "graft_hll"
}

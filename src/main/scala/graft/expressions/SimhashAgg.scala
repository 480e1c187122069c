package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** 60-bit SimHash as ONE native aggregate: the buffer is the 60 bit
  * counters (Long — a group can exceed 2^31 token hashes without silent
  * counter overflow; 480 bytes of state either way), updated in a single
  * tight loop per input hash.
  *
  * Replaces the 60-separate-`sum(when(shiftright...))` formulation: that
  * plan evaluates 60 shift/compare/case expression trees per input row and
  * carries 60 aggregation buffers; this one evaluates the child hash once
  * and runs a 60-iteration primitive loop — same partial-aggregation
  * behavior (counters merge by elementwise add, exact integer arithmetic,
  * so results are BIT-IDENTICAL to the expression form and the DuckDB
  * oracle regardless of row or partition order).
  *
  * Input: the 60-bit md5-derived token hash
  * ([[graft.functions.TextFunctions.md5Long]]). Output: the signature long
  * (bit b set iff counter b is positive).
  */
case class SimhashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  private val BITS = 60

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects a BIGINT hash input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](BITS)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < BITS) {
        buf(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var b = 0
    while (b < BITS) { buf(b) += other(b); b += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var b = 0
    while (b < BITS) { if (buf(b) > 0L) sig |= (1L << b); b += 1 }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * BITS)
    var b = 0
    while (b < BITS) { bb.putLong(buf(b)); b += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](BITS)
    var b = 0
    while (b < BITS) { buf(b) = bb.getLong; b += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimhashAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

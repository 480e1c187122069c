package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native
  * `TypedImperativeAggregate` — the bounded-memory cardinality estimator a
  * 100-TB groupBy-distinct can afford when exactness isn't required.
  *
  * Input: an already-hashed NON-NEGATIVE 60-bit value per row (the caller
  * hashes with [[graft.functions.TextFunctions.md5Long]] so the sketch is
  * engine-portable — see determinism note). The buffer keeps the k SMALLEST
  * DISTINCT hashes (a bounded TreeSet, ≤ k longs however many rows flow
  * through); partial buffers merge by set-union-then-trim, so the aggregate
  * partial-aggregates map-side like any built-in — the shuffle carries at
  * most k longs per (partition, group), NOT the distinct values themselves
  * (contrast `count_distinct`, whose partial state is every distinct value;
  * `approx_count_distinct`'s HLL has the same bounded-state property but an
  * implementation-defined hash, so no independent engine can verify it).
  *
  * Estimator: with k-th smallest distinct hash K_k of D uniform draws on
  * [0, 2^60), E[K_k] ≈ k/(D+1)·2^60, giving D̂ = (k-1)·2^60/K_k (the
  * standard unbiased KMV form); when fewer than k distinct hashes exist the
  * sketch IS the distinct set and the count is exact.
  *
  * Determinism (what makes this sketch ORACLE-CHECKABLE, unlike HLL): the
  * hash is md5-derived, the buffer is a set with a total order, and the
  * estimate is two IEEE double ops — (k-1)·2^60 (exact: ≤6 significand
  * bits) then one divide. DuckDB reproduces it from the same md5 hashes
  * with a row_number ≤ k window — bit-for-bit.
  */
case class KmvDistinctEstimate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, "KMV needs k >= 2")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_distinct expects a BIGINT hash input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { buf.add(h); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    buf.addAll(other)
    while (buf.size > k) buf.pollLast()
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * TWO_POW_60 / buf.last().toDouble

  private val TWO_POW_60: Double = 1152921504606846976.0 // 2^60, exact

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(h => bb.putLong(h))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctEstimate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctEstimate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinctEstimate =
    copy(child = newChild)

  override def prettyName: String = "graft_kmv_distinct"
}

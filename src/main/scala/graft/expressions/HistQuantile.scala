package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** Fixed-edge histogram quantile as a native `TypedImperativeAggregate` —
  * the BOUNDED-STATE production path for corpus profiling, next to the
  * exact distributed selection (q66) it approximates.
  *
  * State: `maxBuckets + 1` Long counters at deterministic integer edges
  * (bucket b counts values in `[b·width, (b+1)·width)`; values at or above
  * `maxBuckets·width` clamp into the last bucket). That is a fixed ~8·maxBuckets
  * bytes per group at ANY corpus size — partial buffers merge by elementwise
  * add, so the shuffle carries one small array per (partition, group), never
  * the values (contrast exact quantiles, whose cost is a full re-sort or
  * selection pass over the data).
  *
  * Estimate: the value at rank `ceil(q·n/100)` (quantile_disc semantics)
  * lies in some bucket b; the aggregate returns that bucket's UPPER edge
  * `(b+1)·width`. Error bound: the true rank-value v satisfies
  * `estimate - width <= v < estimate` — off by LESS THAN `width`, always on
  * the conservative (over-estimating) side; saturated values (clamped into
  * the last bucket) report `(maxBuckets+1)·width`, a sentinel the caller
  * sizes `width·maxBuckets` to avoid. Pick `width` = the error you can
  * tolerate, `maxBuckets` = domain / width.
  *
  * Determinism (oracle-checkable, unlike t-digest/GK sketches whose state
  * depends on merge order): bucketing, counting, rank arithmetic, and the
  * cumulative scan are pure integer ops — any engine reproduces the exact
  * output from the same integers. The rank test is `100·cum >= q·n`
  * (⟺ cum >= ceil(q·n/100) for integer cum), so no division rounds.
  *
  * Contract: input values are non-negative (doc lengths, byte sizes,
  * latencies — profiling domains are). Null inputs are skipped, like every
  * SQL aggregate.
  */
case class HistQuantile(
    child: Expression,
    width: Long,
    maxBuckets: Int,
    qNum: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(width > 0, "bucket width must be positive")
  require(maxBuckets >= 1, "need at least one bucket")
  require(qNum >= 1 && qNum <= 100, "quantile is a percent in [1, 100]")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true // empty group has no quantile

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hist_quantile expects a BIGINT value input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](maxBuckets + 1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val b = v.asInstanceOf[Long] / width
      buf(if (b >= maxBuckets) maxBuckets else b.toInt) += 1L
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var b = 0
    while (b <= maxBuckets) { buf(b) += other(b); b += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var b = 0
    while (b <= maxBuckets) { n += buf(b); b += 1 }
    if (n == 0L) null
    else {
      var cum = 0L
      b = 0
      var out: Any = null
      while (b <= maxBuckets && out == null) {
        cum += buf(b)
        if (100L * cum >= qNum.toLong * n) out = (b + 1L) * width
        b += 1
      }
      out
    }
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * (maxBuckets + 1))
    var b = 0
    while (b <= maxBuckets) { bb.putLong(buf(b)); b += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](maxBuckets + 1)
    var b = 0
    while (b <= maxBuckets) { buf(b) = bb.getLong; b += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistQuantile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistQuantile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistQuantile =
    copy(child = newChild)

  override def prettyName: String = "graft_hist_quantile"
}

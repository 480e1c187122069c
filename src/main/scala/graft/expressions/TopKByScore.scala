package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Top-K (score, id) pairs per group as a native `TypedImperativeAggregate`
  * — the scale-safe replacement for the `row_number() OVER (PARTITION BY
  * group ORDER BY score) <= K` idiom.
  *
  * The rank-window formulation puts EVERY row of a group into one task and
  * sorts it; with a scale-proportional group (one web domain that is a
  * double-digit share of a 100-TB corpus) that is a single-core sort of the
  * group — the exact plan shape PlanGuardSpec bans. This aggregate keeps a
  * K-entry buffer per group, updated in O(log K)-ish per row and merged
  * map-side like any built-in: the shuffle carries at most K (score, id)
  * pairs per (partition, group), never the group.
  *
  * Ordering is TOTAL and integer-only: score DESC, id ASC on ties — both
  * Longs, so an independent engine's `ORDER BY score DESC, id` reproduces
  * the selection exactly (no float comparator ambiguity). Output: the
  * selected pairs as `array<struct<score,id>>` in rank order; callers
  * `posexplode` to get 1-based ranks. Null scores/ids are skipped (SQL
  * aggregate semantics).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Long, Long)]]
  with BinaryLike[Expression] {

  require(k >= 1, "top-k needs k >= 1")

  private type Buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]

  override def left: Expression = score
  override def right: Expression = id

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == LongType && id.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_top_k expects BIGINT (score, id), got (${score.dataType.sql}, ${id.dataType.sql})")

  /** rank order: higher score first, lower id first on ties */
  private def beats(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Buffer invariant: sorted in rank order, length <= k. Insertion keeps
    * it; k is small (a per-group cap), so the shift is cheap. */
  private def insert(buf: Buf, e: (Long, Long)): Unit = {
    if (buf.length < k || beats(e, buf.last)) {
      var i = buf.length
      while (i > 0 && beats(e, buf(i - 1))) i -= 1
      buf.insert(i, e)
      if (buf.length > k) buf.remove(buf.length - 1)
    }
  }

  override def createAggregationBuffer(): Buf = new Buf(k + 1)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) insert(buf, (s.asInstanceOf[Long], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: Buf): Any =
    new GenericArrayData(buf.map(p => InternalRow(p._1, p._2)).toArray[Any])

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { case (s, i) => bb.putLong(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf(k + 1)
    var i = 0
    while (i < n) { buf += ((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(score = newLeft, id = newRight)

  override def prettyName: String = "graft_top_k"
}

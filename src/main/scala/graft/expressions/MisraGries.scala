package graft.expressions

import java.nio.charset.StandardCharsets
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter CANDIDATES as a native
  * `TypedImperativeAggregate` — the bounded-state first pass of the
  * classic two-pass exact heavy-hitters pattern a 100-TB frequency scan
  * needs (an exact `groupBy(word).count()` shuffles the full vocabulary;
  * this shuffles at most k counters per partition).
  *
  * State: at most `k` (key, count) counters. Update is the textbook MG
  * step — increment a held key, admit while there is room, otherwise
  * decrement every counter by 1 (dropping zeros). Merge is the mergeable-
  * summaries form (Agarwal et al., PODS'12): sum matching counters, then
  * subtract the (k+1)-th largest count from all and drop the non-positive
  * — which preserves the MG error bound across partials, so the aggregate
  * partial-aggregates map-side like any built-in.
  *
  * Guarantee (what makes the two-pass pattern sound): for every item x,
  * the summary undercounts by at most N/(k+1), where N is the total count
  * of rows aggregated. Hence any x with true frequency f(x) > N/(k+1) has
  * a positive surviving counter and IS in the output — the candidate set
  * is a SUPERSET of the true heavy hitters at any threshold T ≥ N/(k+1).
  * Pass 2 exact-counts only the ≤ k candidates (a scan filter, no full
  * shuffle) and applies the threshold, making the final answer exact —
  * which is why the whole operator is oracle-checkable against a plain
  * GROUP BY/HAVING even though pass 1 is approximate.
  *
  * Output: the surviving keys, sorted, as `array<string>` (counts are
  * deliberately not exposed: MG counts are undercounts, and the two-pass
  * pattern recomputes them exactly anyway).
  */
case class MisraGriesCandidates(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 1, "Misra-Gries needs k >= 1 counters")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_heavy_hitters expects a STRING input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
    new java.util.HashMap[String, java.lang.Long]()

  override def update(buf: java.util.HashMap[String, java.lang.Long],
                      input: InternalRow): java.util.HashMap[String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy out of the reused UnsafeRow buffer before holding a reference
      val key = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(key)
      if (cur != null) buf.put(key, cur + 1L)
      else if (buf.size < k) buf.put(key, 1L)
      else {
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[String, java.lang.Long],
                     other: java.util.HashMap[String, java.lang.Long]): java.util.HashMap[String, java.lang.Long] = {
    other.forEach { (key, cnt) =>
      val cur = buf.get(key)
      buf.put(key,
        java.lang.Long.valueOf(if (cur == null) cnt.longValue else cur.longValue + cnt.longValue))
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything, drop <= 0
      val counts = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(buf.size - k - 1) // (k+1)-th largest
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= sub) it.remove() else e.setValue(e.getValue - sub)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, java.lang.Long]): Any = {
    val keys = new Array[String](buf.size)
    var i = 0
    val it = buf.keySet().iterator()
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(keys.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.HashMap[String, java.lang.Long]): Array[Byte] = {
    var bytes = 4
    val entries = new java.util.ArrayList[(Array[Byte], Long)](buf.size)
    buf.forEach { (key, cnt) =>
      val kb = key.getBytes(StandardCharsets.UTF_8)
      entries.add((kb, cnt))
      bytes += 4 + kb.length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(entries.size)
    entries.forEach { case (kb, cnt) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(cnt)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.HashMap[String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      buf.put(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesCandidates =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesCandidates =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesCandidates =
    copy(child = newChild)

  override def prettyName: String = "graft_heavy_hitters"
}

package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact integer second-order moments of an (x, y) pair stream.
  *
  * The TYPED face of the library's exact-moment discipline (the Column-API
  * face is q111's sum chain): an `org.apache.spark.sql.expressions
  * .Aggregator` over a case-class buffer, usable on
  * `KeyValueGroupedDataset.agg` where compile-time typing is worth having
  * (pipeline code handling domain case classes rather than Rows). Same
  * scale contract as any built-in aggregate: `reduce` runs map-side,
  * `merge` combines partials, the buffer is six longs — and because every
  * field is an integer sum, the result is bit-identical however Spark
  * partitions the input (contrast a double-buffer variance Aggregator,
  * whose merge order changes the last ulp).
  */
case class Moments(n: Long, sx: Long, sy: Long, sxy: Long, sxx: Long, syy: Long) {
  /** Pearson correlation: four IEEE ops over exact integers — the same
    * formula (and therefore bit-for-bit the same doubles) as q111's
    * SQL/Column formulation. */
  def corr: Double = {
    val num = (n * sxy - sx * sy).toDouble
    val d1 = math.sqrt((n * sxx - sx * sx).toDouble)
    val d2 = math.sqrt((n * syy - sy * sy).toDouble)
    num / (d1 * d2)
  }
}

class MomentsAgg extends Aggregator[(Long, Long), Moments, Moments] {
  override def zero: Moments = Moments(0L, 0L, 0L, 0L, 0L, 0L)

  override def reduce(b: Moments, a: (Long, Long)): Moments = {
    val (x, y) = a
    Moments(b.n + 1L, b.sx + x, b.sy + y, b.sxy + x * y, b.sxx + x * x, b.syy + y * y)
  }

  override def merge(a: Moments, b: Moments): Moments =
    Moments(a.n + b.n, a.sx + b.sx, a.sy + b.sy,
      a.sxy + b.sxy, a.sxx + b.sxx, a.syy + b.syy)

  override def finish(b: Moments): Moments = b

  override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
  override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
}

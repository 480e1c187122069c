package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Sinks

/** Z-order (Morton-curve) clustered table layout — multi-dimensional data
  * skipping for the scan layer. A table sorted on ONE key prunes scans
  * only on that key: every parquet file spans the full range of every
  * other column, so a predicate on a second dimension reads the whole
  * table. Interleaving the bits of two keys into a single sort value makes
  * each written file cover a compact RECTANGLE in (x, y) space, so parquet
  * footer min/max stats — which Spark's scan consults for row-group/file
  * skipping automatically, no reader changes needed — prune on BOTH
  * dimensions. This is the layout trick Delta OPTIMIZE ZORDER BY ships;
  * here it is a write-side operator producing plain parquet.
  *
  * At 100 TB the mechanics hold unchanged: the min/max probe is one
  * partial-agg scan producing 4 longs; normalization and interleave are
  * narrow codegen'd arithmetic; `repartitionByRange` samples the z-value
  * to build balanced range bounds (one shuffle — the price of any
  * clustering rewrite, same as a sort); files then map to disjoint
  * z-ranges. Skew concentration (many identical (x,y)) degrades to the
  * same file count a plain sort would need, never worse.
  */
object ZOrder {

  /** Morton interleave of two already-normalized values in [0, 2^bits):
    * bit i of x lands at position 2i, bit i of y at 2i+1. Built from
    * shift/and/add only (codegen'd; products are by constant powers of two
    * on <2^bits values, so nothing can overflow ANSI Long arithmetic). */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Scale a long column with known [lo, hi] bounds onto the [0, 2^bits)
    * grid, integer arithmetic only (exact same cell for equal inputs). */
  private def normalize(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    val range = math.max(1L, hi - lo)
    ((c - lit(lo)) * lit((1L << bits) - 1) / lit(range)).cast("long")
  }

  /** Rewrite `df` as a z-ordered parquet table clustered on two LONG
    * columns, with [[Sinks.overwriteSwap]]'s commit guarantees. The grid
    * bounds come from one min/max aggregate (4 longs to the driver —
    * bounded by arity, not data). `numFiles` sizes the range partitions:
    * pick `tableBytes / ~256MB` at scale. Normalization multiplies the
    * offset by 2^bits−1, so (hi−lo) must fit in 63−bits bits — true for
    * ids/dates/hours at the default 16 bits; callers with wider domains
    * pre-scale. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    numFiles: Int, bits: Int = 16): Unit =
    Sinks.overwriteSwap(zOrdered(df, xCol, yCol, numFiles, bits), path)

  /** The z-ordered frame itself (range-partitioned + sorted on the Morton
    * value, z column dropped) — split out so other sinks can write the
    * layout with their own commit/stats machinery, e.g.
    * [[Sinks.writeClusteredWithManifest]] for manifest-based
    * multi-dimensional data skipping. */
  def zOrdered(df: DataFrame, xCol: String, yCol: String,
               numFiles: Int, bits: Int = 16): DataFrame = {
    val b = df.agg(min(col(xCol)), max(col(xCol)), min(col(yCol)), max(col(yCol))).head()
    require(!b.isNullAt(0) && !b.isNullAt(2),
      s"writeZOrdered needs non-null $xCol/$yCol bounds (empty table or all-null keys)")
    val (loX, hiX, loY, hiY) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    require(hiX - loX <= (1L << (63 - bits)) - 1 && hiY - loY <= (1L << (63 - bits)) - 1,
      s"key range too wide for $bits-bit grid normalization; pre-scale the keys")
    val z = zValue(normalize(col(xCol), loX, hiX, bits),
      normalize(col(yCol), loY, hiY, bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}

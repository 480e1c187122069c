package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed exact running sum — the two-level (sharded) prefix sum.
  *
  * A `Window.partitionBy(group).orderBy(order)` cumsum is correct but puts
  * EVERY row of a group into one task: a skewed group (one "web" source can
  * be 90% of a 100 TB corpus) becomes a single-core, single-partition sort.
  * This operator computes the identical integers with bounded partitions:
  *
  *  1. shard each group by `order div shardWidth` (shard id is monotone in
  *     the order column, so shard-major order == global order);
  *  2. per-shard totals via one partial-aggregating groupBy — a tiny table
  *     (one row per non-empty shard, `<= targetShards × #groups` in auto
  *     mode), collected driver-side;
  *  3. exclusive scan over each group's shard totals on the driver, handed
  *     back as a BROADCAST offsets table;
  *  4. within-shard window cumsum — partitions bounded by `shardWidth`
  *     order-values, never by group size — plus the shard's offset.
  *
  * Exactness: integer addition is associative, so shard-local sums + offset
  * equal the sequential fold bit-for-bit — same values a one-task window
  * would produce, at any partitioning.
  *
  * Contract: `orderCol` is non-negative and UNIQUE within its group (ties
  * would make any running sum order-ambiguous); `valueCol` is a non-null
  * integral column. The driver-side state is the shard-totals list, bounded
  * by `maxShardRows` (a hard `require`, not a silent truncation); in auto
  * mode (`shardWidth = 0`) the width is derived from the order-column span
  * as `span / targetShards` — one cheap column-pruned min/max job — so the
  * collected list stays ~`targetShards` rows per group at ANY corpus size.
  */
object PrefixSum {

  /** Adds column `out` = inclusive running sum of `valueCol` over rows
    * ordered by `orderCol` within each `groupCols` group. Exclusive prefix
    * is `out - valueCol`. */
  def inclusive(df: DataFrame, groupCols: Seq[String], orderCol: String,
                valueCol: String, out: String,
                shardWidth: Long = 0L,
                targetShards: Long = 4096L,
                maxShardRows: Int = 1 << 20): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    val spark = df.sparkSession
    val width =
      if (shardWidth > 0) shardWidth
      else {
        // column-pruned: Catalyst drops every other projection from the scan
        val r = df.agg(min(col(orderCol)).cast("long"), max(col(orderCol)).cast("long")).first()
        if (r.isNullAt(0)) 1L // empty input — any width
        // floor of 256: below it the shard table approaches one row per
        // input row (offsets stop being "tiny"), above it span/targetShards
        // keeps the table ~targetShards rows per group at any scale
        else math.max(256L, (r.getLong(1) - r.getLong(0)) / targetShards + 1)
      }
    val sharded = df.withColumn("__shard", expr(s"CAST(`$orderCol` AS BIGINT) div ${width}L"))
    val totalsDf = sharded
      .groupBy((groupCols :+ "__shard").map(col): _*)
      .agg(sum(col(valueCol)).cast("long").as("__t"))
    val totals = totalsDf.collect()
    require(totals.length <= maxShardRows,
      s"prefix-sum shard-totals list (${totals.length}) exceeds maxShardRows=$maxShardRows; " +
        "raise shardWidth (or targetShards) so the driver-side scan stays bounded")
    val nGroup = groupCols.length
    val offsetRows: Seq[Row] = totals.toSeq
      .groupBy(r => groupCols.indices.map(r.get))
      .valuesIterator.flatMap { rows =>
        var acc = 0L
        rows.sortBy(_.getLong(nGroup)).map { r =>
          val off = acc
          acc += r.getLong(nGroup + 1)
          Row.fromSeq(groupCols.indices.map(r.get) :+ r.getLong(nGroup) :+ off)
        }
      }.toSeq
    val offSchema = StructType(
      totalsDf.schema.fields.dropRight(1) :+ StructField("__off", LongType, nullable = false))
    val offsets = spark.createDataFrame(offsetRows.asJava, offSchema)
    // bounded partitions: at most `width` order-values per (group, shard)
    val w = Window.partitionBy((groupCols :+ "__shard").map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded.join(broadcast(offsets), groupCols :+ "__shard")
      .withColumn(out, col("__off") + sum(col(valueCol).cast("long")).over(w))
      .drop("__shard", "__off")
  }
}

package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Deterministic TOTAL order over a corpus without a global single-task
  * sort — the "reproducible training shuffle": every engine, every run,
  * every partitioning assigns each row the same global position.
  *
  * A naive `row_number() OVER (ORDER BY h)` moves the whole corpus into ONE
  * task (Spark warns exactly that). Instead, since the order key is a
  * near-uniform hash, its TOP BITS are a monotone bucketing:
  *
  *  1. bucket = top `bucketBits` of the 60-bit order hash — bucket order ==
  *     hash order, and buckets are near-equal slices of the corpus;
  *  2. per-bucket counts (one partial-aggregating groupBy, ≤ 2^bucketBits
  *     rows) → driver-side exclusive scan → BROADCAST offsets;
  *  3. within-bucket `row_number` (partitions are ~n/2^bucketBits rows,
  *     tunable via `bucketBits`) + the bucket's offset.
  *
  * Ties on the hash break by `tieCol` (a unique id), so the order is total
  * and the assignment exact — not "close enough": rank r is the SAME row an
  * `ORDER BY hash, tie` sort would put at r.
  */
object GlobalOrder {

  /** Adds `out` = 1-based global rank by (`hashCol`, `tieCol`), both
    * integral. `hashCol` must be non-negative and < 2^60 (the 60-bit
    * portable md5 convention — see TextFunctions.md5Long). */
  def rank(df: DataFrame, hashCol: String, tieCol: String, out: String,
           bucketBits: Int = 15): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 30, "bucketBits in [1, 30]")
    val spark = df.sparkSession
    val width = 1L << (60 - bucketBits)
    val bucketed = df.withColumn("__bucket", expr(s"CAST(`$hashCol` AS BIGINT) div ${width}L"))
    val counts = bucketed.groupBy("__bucket").agg(count(lit(1)).as("__c")).collect()
    var acc = 0L
    val offsetRows: Seq[Row] = counts.toSeq.sortBy(_.getLong(0)).map { r =>
      val off = acc
      acc += r.getLong(1)
      Row(r.getLong(0), off)
    }
    val offsets = spark.createDataFrame(offsetRows.asJava, StructType(Seq(
      StructField("__bucket", LongType, nullable = false),
      StructField("__off", LongType, nullable = false))))
    val w = Window.partitionBy("__bucket").orderBy(col(hashCol), col(tieCol))
    bucketed.join(broadcast(offsets), Seq("__bucket"))
      .withColumn(out, col("__off") + row_number().over(w))
      .drop("__bucket", "__off")
  }
}

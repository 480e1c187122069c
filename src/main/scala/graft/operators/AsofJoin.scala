package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single right row with the greatest
  * timestamp at-or-before the left row's timestamp, within equi-join keys —
  * the temporal-alignment primitive (market data, sensor readback, feature
  * stores) that plain Spark SQL lacks as a first-class operator.
  *
  * Spark-first formulation — NOT a range join: tag both sides, union, and
  * run ONE running `last(..., ignoreNulls)` window per carried column over
  * (keys) ordered by (ts, side-marker, tie-break). Right rows sort before
  * left rows at equal timestamps, so "at or before" is inclusive. Cost: a
  * single shuffle on the keys + a sort within partitions — the same price
  * as any keyed window, independent of how many right rows precede each
  * left row (a naive `left.ts >= right.ts` range join explodes to the full
  * prefix product before aggregation; Spark plans it as BNLJ when no equi
  * key exists, quadratic either way).
  *
  * Determinism: right rows are first deduped to one row per (keys, ts)
  * (minimum `rightId` wins) so equal-timestamp ties cannot leak
  * nondeterminism through the window's row order; left rows at equal ts
  * each see the same running state because the marker orders the right row
  * first.
  *
  * Output: every left column unchanged + each carried right column as
  * `asof_<name>` + the matched right timestamp as `asof_ts` (null when no
  * right row precedes).
  */
object AsofJoin {

  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, rightId: String,
           rightVals: Seq[String]): DataFrame = {
    val rightDedup = Upsert.dedupByKey(right, keys :+ rightTs, Seq(rightId))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__m", lit(1))
    val r = rightDedup.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__m")) ++
        rightVals.map(c => col(c).as(s"__rv_$c")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__m").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = ("__ts" -> "asof_ts") +: rightVals.map(c => s"__rv_$c" -> s"asof_$c")
    val withAsof = carried.foldLeft(unioned) { case (df, (src, dst)) =>
      df.withColumn(dst,
        last(when(col("__m") === 0, col(src)), ignoreNulls = true).over(w))
    }
    withAsof.filter(col("__m") === 1)
      .select(left.columns.map(col) ++ carried.map(c => col(c._2)): _*)
  }
}

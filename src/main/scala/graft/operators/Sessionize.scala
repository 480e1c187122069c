package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: within each key, a new session starts whenever
  * the gap to the previous event exceeds `gap` — the standard event-stream
  * segmentation (web sessions, usage episodes, document interaction
  * bursts).
  *
  * One keyed window, two passes over it that Spark fuses into a single
  * Window node: `lag` marks session starts, a running `sum` of the marks
  * numbers them. Cost: one shuffle on the keys + an in-partition sort —
  * the minimum any order-dependent segmentation needs. Gap arithmetic is
  * integer microseconds; ordering tie-breaks on `idCol`, so the
  * assignment is fully deterministic even with duplicate timestamps.
  *
  * Output: input columns + `session_idx` (1-based per key, in time order).
  */
object Sessionize {

  def assignSessions(df: DataFrame, keys: Seq[String], tsCol: String,
                     idCol: String, gap: String = "INTERVAL 30 MINUTES"): DataFrame = {
    val gapUs = expr(s"unix_micros(timestamp'1970-01-01 00:00:00' + $gap)")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val isStart = when(
      lag(col(tsCol), 1).over(w).isNull ||
        unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(w)) > gapUs,
      1L).otherwise(0L)
    df.withColumn("session_idx",
      sum(isStart).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}

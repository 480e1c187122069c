package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: match each point row to every
  * interval row, within equi keys, whose `[start, end]` contains the
  * point's timestamp — the other temporal-join primitive (sessions,
  * maintenance windows, validity intervals) Spark has no first-class
  * operator for.
  *
  * A naive `p.ts BETWEEN i.start AND i.end` predicate leaves Catalyst only
  * the equi keys to hash on — per key, every point meets every interval
  * (and with no keys it plans a nested-loop join outright). This
  * formulation BUCKETIZES time: intervals explode to the fixed-width
  * buckets they overlap, points map to the one bucket containing them, and
  * the join becomes an EQUI join on (keys, bucket) followed by the exact
  * containment filter. Cost: shuffle rows = intervals × (avg buckets per
  * interval) + points — linear, never the per-key cross product. Pick
  * `bucketWidth` near the typical interval length: one-to-few buckets per
  * interval, few intervals per bucket.
  *
  * Output: every point column + every interval column (callers project).
  * Exactly one bucket contains each point, so no pair dedup is needed —
  * a pair can only meet in one bucket.
  */
object RangeJoin {

  def containsJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                   pointTs: String, startCol: String, endCol: String,
                   bucketWidth: String = "INTERVAL 1 HOUR"): DataFrame = {
    val widthUs = expr(s"unix_micros(timestamp'1970-01-01 00:00:00' + $bucketWidth)")
    val p = points.withColumn("__bkt", floor(unix_micros(col(pointTs)) / widthUs))
    val i = intervals.withColumn("__bkt",
      explode(sequence(
        floor(unix_micros(col(startCol)) / widthUs),
        floor(unix_micros(col(endCol)) / widthUs))))
    p.join(i, keys :+ "__bkt")
      .filter(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("__bkt")
  }
}

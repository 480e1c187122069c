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
  *
  * Dirty-interval guard: the explode is only bounded if interval spans
  * are. ONE bad row (an open-ended validity interval stored as
  * `9999-12-31`) would fan out to millions of bucket rows — or hit
  * Spark's sequence-length cap and kill the whole job with an opaque
  * error. Rows whose span exceeds `maxBucketsPerInterval` therefore fail
  * fast with a targeted row-level error (`raise_error` — no extra
  * validation job); callers with legitimately huge intervals should widen
  * `bucketWidth` instead, and pre-filter genuinely dirty rows. Degenerate
  * intervals (`end < start`) can match nothing and are dropped before the
  * explode rather than exploded into a descending bucket sequence.
  */
object RangeJoin {

  def containsJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                   pointTs: String, startCol: String, endCol: String,
                   bucketWidth: String = "INTERVAL 1 HOUR",
                   maxBucketsPerInterval: Long = 1L << 16): DataFrame = {
    val widthUs = expr(s"unix_micros(timestamp'1970-01-01 00:00:00' + $bucketWidth)")
    val startBkt = floor(unix_micros(col(startCol)) / widthUs)
    val endBkt = floor(unix_micros(col(endCol)) / widthUs)
    val checkedEnd = when(endBkt - startBkt > maxBucketsPerInterval,
      raise_error(format_string(
        s"range-join interval [%s, %s] spans more than $maxBucketsPerInterval " +
          s"buckets of $bucketWidth — widen bucketWidth or filter dirty intervals",
        col(startCol).cast("string"), col(endCol).cast("string"))).cast("long"))
      .otherwise(endBkt)
    val p = points.withColumn("__bkt", floor(unix_micros(col(pointTs)) / widthUs))
    val i = intervals.filter(col(endCol) >= col(startCol))
      .withColumn("__bkt", explode(sequence(startBkt, checkedEnd)))
    p.join(i, keys :+ "__bkt")
      .filter(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("__bkt")
  }
}

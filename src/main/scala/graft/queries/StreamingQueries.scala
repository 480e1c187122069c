package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.streaming.Streams

/** Structured Streaming coverage, oracle-checked by running the stream to
  * completion (Trigger.AvailableNow) and comparing the final state against
  * the batch-equivalent SQL — the streaming/batch unification Spark
  * promises, used as a correctness gate. */
object StreamingQueries {

  /** Watermarked tumbling-window hourly counts over the events table,
    * executed as a complete-mode stream into a memory sink. */
  def q41StreamHourly(s: SparkSession, dir: String): DataFrame =
    Streams.hourlyCountsOnce(s, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_stream_hourly" -> (q41StreamHourly _))

  val oracles: Map[String, String] = Map(
    "q41_stream_hourly" ->
      """SELECT date_trunc('hour', ts)::TIMESTAMP AS hour_start, count(*) AS cnt
        |FROM events GROUP BY 1""".stripMargin)
}

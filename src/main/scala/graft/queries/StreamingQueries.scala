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

  /** Gap-based session windows per user via `session_window` state,
    * complete-mode AvailableNow stream, against the batch islands-SQL
    * oracle. */
  def q112StreamSessions(s: SparkSession, dir: String): DataFrame =
    Streams.sessionCountsOnce(s, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_stream_hourly" -> (q41StreamHourly _),
    "q112_stream_sessions" -> (q112StreamSessions _))

  val oracles: Map[String, String] = Map(
    "q41_stream_hourly" ->
      """SELECT date_trunc('hour', ts)::TIMESTAMP AS hour_start, count(*) AS cnt
        |FROM events GROUP BY 1""".stripMargin,
    // islands with a >= cut: session_window closes a session when the next
    // event lands exactly gap after the previous (window end is exclusive)
    "q112_stream_sessions" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('microseconds', ts) AS ts FROM events),
        |m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |         THEN 1 ELSE 0 END AS st
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (
        |  SELECT user_id, ts,
        |    CAST(sum(st) OVER (PARTITION BY user_id ORDER BY ts
        |                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        |  FROM m)
        |SELECT user_id, min(ts)::TIMESTAMP AS session_start, count(*) AS n_events
        |FROM g GROUP BY user_id, sid""".stripMargin)
}

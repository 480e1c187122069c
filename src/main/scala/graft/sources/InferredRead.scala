package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-on-read on-ramp for AD-HOC files — the engine's deliberate
  * default is explicit `StructType`s everywhere (SURVEY.md §4: the
  * reference re-infers on every read, paying an extra full scan and
  * risking type drift between runs), but a user pointing the engine at a
  * new file for the first time needs an inference-backed entry point
  * before they've written a schema.
  *
  * Contract: use these to EXPLORE, then freeze the inferred schema into an
  * explicit `StructType` for production reads (`df.schema` prints one).
  * The inference pass is a second scan of the file — acceptable for
  * exploration, not for a 100-TB nightly read.
  */
object InferredRead {

  /** Header CSV with inferred column types (messy headers — spaces,
    * dots — survive as-is, same as the explicit-schema readers). */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** JSON with inferred schema; `multiLine` handles whole-file documents
    * (the weather-vintage shape) as well as JSONL. */
  def json(spark: SparkSession, path: String, multiLine: Boolean = true): DataFrame =
    spark.read.option("multiLine", multiLine.toString).json(path)
}

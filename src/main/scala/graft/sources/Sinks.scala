package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Upsert

/** Parquet sinks as engine operations (SURVEY.md §2.1 S5/S6/S7).
  *
  * The reference writes with plain `mode('overwrite')` / `mode('append')`
  * (journey-data-transformation.py:106,156,160; init-data-transformation.py:43,92)
  * and delegates idempotence to Redshift's UPSERT load. We keep append for
  * genuinely incremental facts, but replace blind overwrite with a
  * write-to-temp-then-swap commit, and provide a keyed upsert so re-running a
  * week is a no-op on keyed tables (SURVEY.md §7.5 #1).
  */
object Sinks {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** S5 made safe: materialize to `<path>.__tmp`, then atomically swap.
    * Two properties a plain overwrite lacks: (1) readers of `path` (including
    * the job itself, when merging into the table it reads) never observe a
    * half-written table; (2) a mid-write crash leaves the previous table
    * intact. The swap is two renames on the same filesystem — metadata-only
    * on HDFS-likes. */
  def overwriteSwap(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val f = fs(spark, path)
    val tmp = new Path(path + ".__tmp")
    val dst = new Path(path)
    f.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    f.delete(dst, true)
    if (!f.rename(tmp, dst))
      throw new java.io.IOException(s"swap-commit rename failed: $tmp -> $dst")
  }

  /** S6: incremental append (the fact-table write). */
  def append(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** S7: keyed UPSERT into a parquet table — the engine-level replacement for
    * the reference's Redshift `method='UPSERT'` load. Reads the current
    * table lazily, merges (updates win on key collision), and swap-commits;
    * the temp-write means reading and replacing the same path is safe.
    * Idempotent: applying the same updates twice leaves the table unchanged.
    */
  def upsert(spark: SparkSession, path: String, updates: DataFrame, keys: Seq[String]): Unit = {
    val f = fs(spark, path)
    val merged =
      if (f.exists(new Path(path))) Upsert.merge(spark.read.parquet(path), updates, keys)
      else updates
    overwriteSwap(merged, path)
  }
}

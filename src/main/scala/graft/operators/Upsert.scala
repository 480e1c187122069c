package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed merge (UPSERT) over plain DataFrames.
  *
  * Replaces the reference's warehouse-side UPSERT load
  * (reference: airflow/dags/proc_2_s3_to_redshifht_dag.py:64-75,
  * init_2_s3_to_redshifht_dag.py:63-74 — Redshift `method='UPSERT'` with
  * `upsert_keys`). Plain parquet has no MERGE, so the engine-level semantic is:
  * rows from `updates` win on key collision; `target` rows with no matching
  * key survive. Implemented as a left-anti join plus union — both sides keep
  * their partitioning on the key, and at scale the anti join hashes on the
  * same key the union-side write would bucket by.
  *
  * Idempotence (SURVEY.md §7.5 #1): `merge(merge(t, u, k), u, k) == merge(t, u, k)`.
  */
object Upsert {

  /** `updates` wins on key collision. Requires identical column sets. */
  def merge(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = target.columns.toSeq
    require(updates.columns.toSeq.sorted == cols.sorted,
      s"upsert requires matching schemas: ${cols.sorted} vs ${updates.columns.toSeq.sorted}")
    val kept = target.join(updates.select(keys.map(col): _*), keys, "left_anti")
    kept.select(cols.map(col): _*).unionByName(updates.select(cols.map(col): _*))
  }

  /** Deterministic key-dedup: keep exactly one row per key, chosen by
    * `orderCols` (ascending). Fixes the reference's nondeterministic
    * `dropDuplicates` (reference: scripts/journey-data-transformation.py:102,150;
    * SURVEY.md §7.5 #2).
    */
  def dedupByKey(df: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC (change-data-capture) batch apply — the MERGE that turns an
  * out-of-order stream of keyed inserts/updates/deletes into the table's
  * next state. This is the warehouse half the reference delegates to
  * Redshift's UPSERT load (SURVEY.md §2.1 S7), widened with ordered
  * semantics and deletes: a replication feed (Debezium-style) delivers
  * several changes per key per batch, possibly out of order, and the apply
  * must keep only the change with the highest sequence number per key.
  *
  * Shape at scale: one hash-partial `max(struct)` aggregate over the CHANGE
  * BATCH (never the base table) picks the winning change per key, then one
  * `left_anti` join removes superseded base rows, and a union appends the
  * non-delete winners — two shuffles, both keyed on the merge key, both
  * sized by the batch (AQE broadcast-sizes the anti join when the batch is
  * small). The base table is read exactly once and never re-keyed.
  */
object Cdc {

  /** Apply `changes` to `base`. `changes` carries every `base` column plus
    * `seqCol` (ordering, unique per key within a batch) and `opCol`
    * (`"U"` = upsert, `"D"` = delete). The winner per key is selected with
    * `max` over a `(seq, op, data…)` struct — lexicographic struct order
    * makes the pick a partial-aggregating one-pass reduction (map-side
    * combinable, unlike a rank window over the batch), and deterministic
    * even under a seq tie because the full row breaks it. */
  def applyChanges(base: DataFrame, changes: DataFrame, keys: Seq[String],
                   seqCol: String, opCol: String): DataFrame = {
    val dataCols = base.columns.toSeq
    val nonKey = dataCols.filterNot(keys.contains)
    val packed = struct((Seq(seqCol, opCol) ++ nonKey).map(col): _*)
    val latest = changes.groupBy(keys.map(col): _*)
      .agg(max(packed).as("__w"))
      .select(keys.map(col) ++ (Seq(opCol) ++ nonKey).map(c => col(s"__w.`$c`").as(c)): _*)
    base.join(latest.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(latest.filter(col(opCol) =!= lit("D")).select(dataCols.map(col): _*))
  }
}

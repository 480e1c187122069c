package graft.operators

import org.apache.spark.sql.Dataset

/** Lineage severing for iterative operators (CC, k-core, k-truss, BFS,
  * label propagation, path sweeps, BPE vocab rounds): an iterative plan
  * that doubles per round is unplannable long before it is slow, so every
  * loop body materializes its round result and drops the lineage.
  *
  * Two materialization modes, selected by the session conf
  * `spark.graft.checkpoint.reliable` (default `false`):
  *
  *  - LOCAL (default): `Dataset.localCheckpoint` — executor-block-manager
  *    storage, no distributed filesystem round-trip. Right for local mode
  *    and for clusters where re-running the whole job on executor loss is
  *    acceptable. The documented hazard (SURVEY §9): blocks live only in
  *    executor memory/disk, so a LOST EXECUTOR forces recomputation of
  *    the entire iterative prefix — which the severed lineage can no
  *    longer replay, failing the job.
  *  - RELIABLE: `Dataset.checkpoint` — writes the round result to the
  *    SparkContext checkpoint directory (HDFS/object store on a real
  *    cluster). Executor loss then costs one re-read, not a prefix
  *    recomputation. Requires `SparkContext.setCheckpointDir` FIRST; the
  *    knob fails loudly if the dir is unset rather than silently falling
  *    back to the weaker mode the caller just opted out of.
  *
  * Both modes are eager (the round's shuffle runs once, at the sever
  * point) and both return a plan whose read side is a materialized scan,
  * so operator logic and round-cost analysis are identical either way —
  * the knob trades recovery cost only. */
object Sever {

  /** Session conf key: set `"true"` to route every sever through a
    * reliable `Dataset.checkpoint` (requires a checkpoint dir). */
  val ReliableKey = "spark.graft.checkpoint.reliable"

  def apply[T](d: Dataset[T]): Dataset[T] = {
    val s = d.sparkSession
    val reliable = s.conf.get(ReliableKey, "false").toBoolean
    if (reliable) {
      require(s.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableKey=true but SparkContext.setCheckpointDir was never " +
          "called — a reliable checkpoint needs a fault-tolerant directory; " +
          "refusing to fall back silently to executor-local storage")
      d.checkpoint()
    } else d.localCheckpoint()
  }

  /** Chained form: `df.groupBy(...).agg(...).sever()` reads like the
    * `localCheckpoint` call it replaces. */
  implicit class SeverOps[T](private val d: Dataset[T]) extends AnyVal {
    def sever(): Dataset[T] = Sever(d)

    /** Sever WITH a declared hash layout (r18): repartition by `keys`
      * into exactly `numPartitions`, materialize, and re-declare the
      * layout on the checkpoint scan — Spark's checkpoint loses
      * `outputPartitioning` under AQE (see
      * [[org.apache.spark.sql.graft.GraftSqlBridge.declareCheckpointLayout]]),
      * so without the declaration every round of an iterative operator
      * re-shuffles the materialized side. Use for frames that are JOINED
      * OR AGGREGATED ON `keys` repeatedly (adjacency lists, edge sets):
      * the shuffle runs once, at the cut. */
    def severKeyed(keys: Seq[String], numPartitions: Int): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.functions.col
      org.apache.spark.sql.graft.GraftSqlBridge.declareCheckpointLayout(
        Sever(d.repartition(numPartitions, keys.map(col): _*)).toDF(),
        keys, numPartitions)
    }

    /** Sever a frame whose plan ALREADY ends in
      * `repartition(numPartitions, keys)` followed only by
      * partitioning-preserving operators (aggregates keyed on a
      * superset, projections keeping the keys), declaring that layout on
      * the cut. PRECONDITION on the caller — a wrong declaration
      * silently mis-joins; the oracle suite and the operators'
      * partitioning-invariance specs are the net. */
    def severDeclared(keys: Seq[String], numPartitions: Int): org.apache.spark.sql.DataFrame =
      org.apache.spark.sql.graft.GraftSqlBridge.declareCheckpointLayout(
        Sever(d).toDF(), keys, numPartitions)
  }
}

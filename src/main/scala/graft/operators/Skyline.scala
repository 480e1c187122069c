package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) — the rows no other row dominates.
  *
  * Dominance (maximize `hi`, minimize `lo`): p dominates q iff
  * `p.hi >= q.hi && p.lo <= q.lo` with at least one strict inequality.
  * The skyline is the classic multi-criteria "best tradeoffs" operator
  * (Börzsönyi et al., ICDE 2001) that SQL can only express as a quadratic
  * NOT EXISTS self-join and Spark has no built-in for.
  *
  * Distributed evaluation is the standard two-phase sort-scan:
  *
  *  1. **Local pass** — each partition is sorted by `(hi desc, lo asc)` and
  *     scanned once: a point survives iff its `lo` strictly beats every
  *     strictly-higher-`hi` point seen so far and ties its `hi`-group
  *     minimum. Any global-skyline point is on its partition's local
  *     skyline (dominance is partition-independent), so the pass is sound;
  *     it runs on the EXISTING partitioning — no shuffle.
  *  2. **Global pass** — the surviving local skylines (for n random points
  *     the expected skyline is O(log n); worst case — perfectly
  *     anti-correlated data — it degenerates to all rows, which no
  *     algorithm avoids) are coalesced to one partition and scanned once
  *     more with the same routine.
  *
  * Both passes are the same linear scan, so the whole operator costs one
  * local sort + one small single-partition sort — no shuffle, no window,
  * no quadratic join anywhere.
  */
/** A candidate point: `hi` is maximized, `lo` minimized. Top-level (not
  * nested/private) so the Dataset encoder's generated code can reach it. */
case class SkyPoint(id: Long, hi: Long, lo: Long)

object Skyline {
  private type P = SkyPoint

  /** One linear scan over points sorted by (hi desc, lo asc): emit the
    * local skyline. `bestStrict` tracks the minimum `lo` over all points
    * with STRICTLY greater `hi`; `groupMin` the minimum within the current
    * `hi`-group (= the first seen, because `lo` is sorted ascending).
    * Survive iff `lo == groupMin` (nothing in my group strictly better)
    * and `lo < bestStrict` (nothing strictly higher is as cheap). Exact
    * duplicates all survive — dominance requires one strict inequality. */
  private def scan(sorted: Iterator[P]): Iterator[P] = {
    var bestStrict = Long.MaxValue
    var haveGroup = false
    var curHi = 0L
    var groupMin = Long.MaxValue
    sorted.flatMap { p =>
      if (!haveGroup || p.hi != curHi) {
        if (haveGroup) bestStrict = math.min(bestStrict, groupMin)
        haveGroup = true
        curHi = p.hi
        groupMin = p.lo
      }
      if (p.lo == groupMin && p.lo < bestStrict) Some(p) else None
    }
  }

  /** Skyline of `df` maximizing `hiCol` and minimizing `loCol` (both must
    * be integral — exact arithmetic end to end). Returns the surviving rows
    * as `(idCol, hiCol, loCol)` with the input names preserved. */
  def skyline2D(df: DataFrame, idCol: String, hiCol: String, loCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pts: Dataset[P] = df.select(
      col(idCol).cast("long").as("id"),
      col(hiCol).cast("long").as("hi"),
      col(loCol).cast("long").as("lo")).as[P]
    val local = pts
      .sortWithinPartitions($"hi".desc, $"lo".asc)
      .mapPartitions(scan)
    val global = local
      .coalesce(1)
      .sortWithinPartitions($"hi".desc, $"lo".asc)
      .mapPartitions(scan)
    global.toDF(idCol, hiCol, loCol)
  }
}

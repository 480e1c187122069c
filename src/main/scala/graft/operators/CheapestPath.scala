package graft.operators

import graft.operators.Sever.SeverOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CHEAPEST-PATH (minimum-cost) propagation from a seed set — "how cheaply
  * can every node be reached from the seeds", where a path costs the SUM of
  * its edge costs and a node takes its cheapest path. This is Bellman–Ford
  * relaxation over the (min, +) semiring: round r sets
  *
  *   dist_r(v) = min( dist_{r-1}(v), min over edges (u,v) of
  *                    dist_{r-1}(u) + w(u,v) )
  *
  * with seeds starting at 0 and everything else unreached. Completes the
  * library's semiring family: [[Bfs]] is (min, +) over unit weights (hop
  * distance), [[WidestPath]] is (max, min) (bottleneck strength), this is
  * the general weighted distance — "how much does it cost to pull this
  * node into the vetted slice", with cost as the inverse of association.
  *
  * All arithmetic is integer min/+ — no floats anywhere — so a fixed round
  * count replays exactly on any engine (the unrolled-iteration oracle
  * precedent). Each round is one equi-join (adjacency × current distances)
  * and one partial-aggregating groupBy-min: two canonical keyed shuffles
  * per round, no all-pairs stage, no driver-side graph state; distances
  * are monotone non-increasing so rounds past the diameter are no-ops.
  * Lineage severed per round with `localCheckpoint` (the CC/k-core
  * precedent). */
object CheapestPath {

  /** Cheapest-path distances after `rounds` relaxations over the
    * undirected weighted graph `(aCol, bCol, wCol)` (self-loops dropped;
    * duplicate edges keep their MIN cost — the cheapest parallel link).
    * Returns (node, dist) for seeds (at 0) and every node reached within
    * `rounds` hops (at its cheapest sum). Costs must be non-negative;
    * `rounds · max(w)` must stay within Long. */
  def distances(edges: DataFrame, aCol: String, bCol: String, wCol: String,
                seeds: DataFrame, seedCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val parts = edges.sparkSession.sessionState.conf.numShufflePartitions
    val und = edges
      .select(least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"),
        col(wCol).cast("long").as("w"))
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(min(col("w")).as("w"))
    // both directions once, partitioned by the join key at the cut with
    // the layout declared on the checkpoint scan (r18 — the LabelProp
    // convention), so no round re-shuffles the 2·|E| adjacency side
    val adj = und.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionAll(und.select(col("b").as("src"), col("a").as("dst"), col("w")))
      .severKeyed(Seq("src"), parts)
    var dist = seeds.select(col(seedCol).cast("long").as("node")).distinct()
      .select(col("node"), lit(0L).as("dist"))
      .sever()
    for (_ <- 1 to rounds) {
      // shuffled-hash pinned, distance table as build (r18 — the
      // LabelProp rationale: AQE otherwise broadcasts the EDGE side)
      val relaxed = adj
        .join(dist.withColumnRenamed("node", "src").hint("shuffle_hash"),
          Seq("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionAll(relaxed)
        .groupBy("node").agg(min(col("dist")).as("dist"))
        .sever()
    }
    dist
  }
}

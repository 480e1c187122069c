package graft.operators

import graft.operators.Sever.SeverOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WIDEST-PATH (maximum-bottleneck) propagation from a seed set — "how
  * strongly is every node associated with the seeds", where a path is as
  * strong as its WEAKEST edge and a node takes its strongest path. This
  * is Bellman–Ford relaxation over the (max, min) semiring: round r sets
  *
  *   cap_r(v) = max( cap_{r-1}(v), max over edges (u,v) of
  *                   min(cap_{r-1}(u), w(u,v)) )
  *
  * with seeds starting at `CapInf` and everything else unreached. The
  * complement of [[Bfs]] (min-plus over unit weights): BFS asks "how
  * FAR", this asks "how STRONGLY CONNECTED", the association-expansion
  * measure for pulling data linked to a vetted slice by heavy edges.
  *
  * All arithmetic is integer min/max — no floats anywhere — so a fixed
  * round count replays exactly on any engine (the unrolled-iteration
  * oracle precedent). Each round is one equi-join (adjacency × current
  * capacities) and one partial-aggregating groupBy-max: two canonical
  * keyed shuffles per round, no all-pairs stage, no driver-side graph
  * state; capacities are monotone non-decreasing so rounds past the
  * diameter are no-ops. Lineage severed per round with `localCheckpoint`
  * (the CC/k-core precedent). */
object WidestPath {

  /** The seed capacity — effectively +∞: above any real edge weight, with
    * `min(CapInf, w) = w` exact for every Long weight below 2^40. */
  val CapInf: Long = 1L << 40

  /** Bottleneck capacities after `rounds` relaxations over the undirected
    * weighted graph `(aCol, bCol, wCol)` (self-loops dropped; duplicate
    * edges keep their MAX weight — the strongest parallel link). Returns
    * (node, cap) for seeds (at [[CapInf]]) and every node reached within
    * `rounds` hops (at its best bottleneck). Weights must be positive and
    * below [[CapInf]]. */
  def capacities(edges: DataFrame, aCol: String, bCol: String, wCol: String,
                 seeds: DataFrame, seedCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val parts = edges.sparkSession.sessionState.conf.numShufflePartitions
    val und = edges
      .select(least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"),
        col(wCol).cast("long").as("w"))
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(max(col("w")).as("w"))
    // both directions once, partitioned by the join key at the cut with
    // the layout declared on the checkpoint scan (r18 — the LabelProp
    // convention), so no round re-shuffles the 2·|E| adjacency side
    val adj = und.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionAll(und.select(col("b").as("src"), col("a").as("dst"), col("w")))
      .severKeyed(Seq("src"), parts)
    var cap = seeds.select(col(seedCol).cast("long").as("node")).distinct()
      .select(col("node"), lit(CapInf).as("cap"))
      .sever()
    for (_ <- 1 to rounds) {
      // shuffled-hash pinned, capacity table as build (r18 — the
      // LabelProp rationale: AQE otherwise broadcasts the EDGE side)
      val relaxed = adj
        .join(cap.withColumnRenamed("node", "src").hint("shuffle_hash"),
          Seq("src"))
        .select(col("dst").as("node"), least(col("cap"), col("w")).as("cap"))
      cap = cap.unionAll(relaxed)
        .groupBy("node").agg(max(col("cap")).as("cap"))
        .sever()
    }
    cap
  }
}

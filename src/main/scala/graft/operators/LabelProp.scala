package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community detection by SYNCHRONOUS label propagation (Raghavan/Albert/
  * Kumara LPA, the Pregel-style deterministic variant): every node starts
  * with its own id as its label; each round, every node simultaneously
  * adopts the most frequent label among its neighbors, ties broken by the
  * SMALLEST label. Synchronous updates + total tie order make the whole
  * run a pure function of the edge list — no RNG, no visit order, no
  * partitioning sensitivity — which is what lets an independent engine
  * replay it bit-for-bit.
  *
  * Each round is three canonical keyed shuffles — one equi-join
  * (adjacency × labels) and two partial-aggregating groupBys — so a round
  * costs what a groupBy+join costs at any scale. The per-node argmax is
  * `min(struct(-cnt, label))`, an ordinary aggregate with map-side
  * combine, NOT a rank window: the shuffle carries (node, label) count
  * pairs, never a node's whole neighborhood into one task (the shape
  * PlanGuardSpec bans). Lineage is severed with `localCheckpoint` every
  * round (the CC/k-core precedent — an iterative plan that doubles per
  * round is unplannable long before it is slow).
  *
  * A FIXED round count (not convergence detection) is the contract:
  * synchronous LPA can 2-cycle on bipartite-ish structure, so "run R
  * rounds" is the only well-defined stopping rule — and it is exactly
  * what an unrolled-SQL oracle can replay (the PageRank unrolled-
  * iteration precedent).
  */
object LabelProp {

  /** Labels after `rounds` synchronous propagation rounds over the
    * undirected graph given as an edge list (self-loops dropped,
    * duplicate/reversed edges collapsed). Returns (node, label) for every
    * node incident to at least one surviving edge. */
  def communities(edges: DataFrame, aCol: String, bCol: String,
                  rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val und = edges
      .select(least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    // both directions once, reused every round
    val adj = und.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(und.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    var labels = adj.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val nbr = adj
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), col("label"))
      val cnt = nbr.groupBy("node", "label").agg(count(lit(1)).as("cnt"))
      // argmax by (cnt DESC, label ASC) as an aggregate: min over the
      // struct's lexicographic order — partial-aggregable, no window
      labels = cnt.groupBy("node")
        .agg(min(struct((-col("cnt")).as("nc"), col("label").as("l"))).as("m"))
        .select(col("node"), col("m.l").as("label"))
        .localCheckpoint()
    }
    labels
  }
}

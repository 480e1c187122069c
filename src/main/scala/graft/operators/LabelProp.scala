package graft.operators

import graft.operators.Sever.SeverOps
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
    * node incident to at least one surviving edge.
    *
    * Node ids must be in [0, 2^31) — enforced loudly per edge, the same
    * contract [[Triangles]] documents for its order key — because the
    * hot (node, label) count aggregates on the PACKED key
    * node·2^32 + label: in early rounds nearly every (node, label) pair
    * is unique (round 1 has one per directed edge), the regime where
    * map-side partial aggregation combines nothing and the measured
    * LinkPredict numbers show single-long-key + repartition-first at
    * 2.5× over the two-column partial-agg shape. At sf0.1 volumes
    * (2.4M pairs over 32 partitions) the two shapes measure THE SAME
    * (~6.6 s either way — per-round cost there is the join plus the
    * eager checkpoint, not the agg); the packed key is carried for the
    * scale regime, not a local win. Labels are always node ids (start
    * values and mode winners), so the guard on edges covers the label
    * side for every round. */
  def communities(edges: DataFrame, aCol: String, bCol: String,
                  rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val idBound = 1L << 31
    val und = edges
      .select(least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .filter(assert_true(
        col("a") >= 0 && col("a") < idBound && col("b") >= 0 && col("b") < idBound,
        lit("LabelProp requires node ids in [0, 2^31) for packed count keys"))
        .isNull)
    // both directions once, reused every round
    val adj = und.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(und.select(col("b").as("src"), col("a").as("dst")))
      .sever()
    var labels = adj.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .sever()
    for (_ <- 1 to rounds) {
      val nbr = adj
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .select((shiftleft(col("dst"), 32) + col("label")).as("nl"))
      val cnt = nbr
        .repartition(col("nl"))
        .groupBy("nl").agg(count(lit(1)).as("cnt"))
        .select(shiftright(col("nl"), 32).as("node"),
          col("nl").bitwiseAND(lit(0xFFFFFFFFL)).as("label"), col("cnt"))
      // argmax by (cnt DESC, label ASC) as an aggregate: min over the
      // struct's lexicographic order — partial-aggregable, no window
      labels = cnt.groupBy("node")
        .agg(min(struct((-col("cnt")).as("nc"), col("label").as("l"))).as("m"))
        .select(col("node"), col("m.l").as("label"))
        .sever()
    }
    labels
  }
}

package graft.operators

import graft.operators.Sever.SeverOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (hubs and authorities) on a directed bipartite edge list, in exact
  * integer fixed point — Kleinberg's mutual-reinforcement iteration: a
  * hub's score sums its targets' authority scores, an authority's score
  * sums its sources' hub scores.
  *
  * Power iteration needs a normalization per half-step or scores overflow
  * geometrically; the float L2 norm would never agree bit-for-bit across
  * engines, so each half-round rescales by the MAX score instead:
  * `score · 10⁶ // max(score)` (the [[Pca]] power-iteration trick). All
  * scores are non-negative sums of non-negative terms, so truncating
  * division agrees between Spark `div` and the oracle's `//` without any
  * sign casework, and a FIXED round budget makes the whole computation an
  * unrolled-SQL-replayable function of the edge list.
  *
  * Scale shape: each half-round is one keyed equi-join (edges ⋈ scores on
  * one endpoint) plus one map-side-combinable sum aggregate — shuffle is
  * |edges| rows per round, never quadratic — and one 1-row max aggregate
  * broadcast back. Rounds are bounded; lineage is cut per round with
  * `localCheckpoint` (the CC/k-core/BFS precedent). */
object Hits {

  val One: Long = 1000000L

  /** Hub and authority scores after `rounds` full iterations over the
    * directed edges (`srcCol` → `dstCol`, deduplicated). Returns
    * (side: "hub"|"auth", id, score) with scores on the 10⁶ fixed-point
    * scale; every surviving score is the deterministic integer the
    * unrolled recurrence defines.
    *
    * The edge set is severed TWICE, hash-partitioned by each
    * half-round's join key (r18 — the LabelProp convention: a sever
    * captures the materialized layout into its scan). Each half-round
    * alternates keys (hub update joins on p, auth update on s), so one
    * layout can never serve both — with both in hand, no half-round ever
    * re-shuffles or re-sorts the |E| edge side again; only the |V|-sized
    * score table and the map-side-combined sum move. The second copy is
    * cut FROM the first (a block-manager re-read), so the raw edge
    * derivation runs once. */
  def scores(edges: DataFrame, srcCol: String, dstCol: String,
             rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val parts = edges.sparkSession.sessionState.conf.numShufflePartitions
    val eByP = edges
      .select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("p"))
      .distinct()
      .severKeyed(Seq("p"), parts)
    val eByS = eByP.severKeyed(Seq("s"), parts)
    // authorities start uniform at ONE; hubs are derived in round 1
    // (the distinct reuses eByP's declared layout — no exchange)
    var auth = eByP.select(col("p")).distinct()
      .select(col("p"), lit(One).as("a"))
      .sever()
    var hub: DataFrame = null
    for (_ <- 1 to rounds) {
      // shuffled-hash pinned with the |V|-sized score table as build
      // (r18 — the LabelProp rationale: AQE otherwise broadcasts the
      // EDGE side every half-round). The SEVER sits on the raw sums,
      // BEFORE the rescale: rescale's max branch reads its input twice,
      // and over a lazy aggregate that re-ran the whole join+sum subtree
      // per half-round (exchange reuse does not bridge the two AQE
      // stages) — over the cut it is two cheap scans, and the rescale
      // itself stays a lazy bounded-depth projection into the next
      // half-round's build side.
      hub = rescale(
        eByP.join(auth.hint("shuffle_hash"), "p")
          .groupBy("s").agg(sum("a").as("v")).sever(), "v")
        .withColumnRenamed("v", "h")
      auth = rescale(
        eByS.join(hub.hint("shuffle_hash"), "s")
          .groupBy("p").agg(sum("h").as("v")).sever(), "v")
        .withColumnRenamed("v", "a")
    }
    hub.select(lit("hub").as("side"), col("s").as("id"), col("h").as("score"))
      .unionAll(auth.select(lit("auth").as("side"), col("p").as("id"),
        col("a").as("score")))
  }

  /** `v · 10⁶ // max(v)` — the max is a bounded 1-scalar driver read
    * over the SEVERED sum frame (the KCore/PageRank per-round-scalar
    * precedent; r18 — the crossJoin-broadcast form re-ran the whole
    * join+sum subtree for the max branch, AQE stage reuse not bridging
    * the two consumers, and cost two extra stages per half-round), so
    * the rescale is a pure literal projection the next half-round's
    * build side evaluates in place. */
  private def rescale(df: DataFrame, valueCol: String): DataFrame = {
    val row = df.agg(max(col(valueCol))).head()
    val mx = if (row.isNullAt(0)) 1L else row.getLong(0) // empty frame: no rows to scale
    df.withColumn(valueCol, expr(s"`$valueCol` * ${One}L div ${mx}L"))
  }
}

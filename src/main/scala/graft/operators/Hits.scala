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
    * unrolled recurrence defines. */
  def scores(edges: DataFrame, srcCol: String, dstCol: String,
             rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = edges
      .select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("p"))
      .distinct()
      .sever()
    // authorities start uniform at ONE; hubs are derived in round 1
    var auth = e.select(col("p")).distinct()
      .select(col("p"), lit(One).as("a"))
      .sever()
    var hub: DataFrame = null
    for (_ <- 1 to rounds) {
      hub = rescale(
        e.join(auth, "p").groupBy("s").agg(sum("a").as("v")), "v")
        .withColumnRenamed("v", "h")
        .sever()
      auth = rescale(
        e.join(hub, "s").groupBy("p").agg(sum("h").as("v")), "v")
        .withColumnRenamed("v", "a")
        .sever()
    }
    hub.select(lit("hub").as("side"), col("s").as("id"), col("h").as("score"))
      .unionAll(auth.select(lit("auth").as("side"), col("p").as("id"),
        col("a").as("score")))
  }

  /** `v · 10⁶ // max(v)` — the 1-row max aggregate joins back as a
    * broadcast (bounded cross, the q160/q162 shape). */
  private def rescale(df: DataFrame, valueCol: String): DataFrame = {
    val mx = df.agg(max(col(valueCol)).as("__mx"))
    df.crossJoin(broadcast(mx))
      .withColumn(valueCol, expr(s"`$valueCol` * ${One}L div __mx"))
      .drop("__mx")
  }
}

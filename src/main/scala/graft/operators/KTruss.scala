package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-TRUSS decomposition by iterative support peeling — the edge-level
  * sibling of [[KCore]]: repeatedly delete every edge lying in fewer
  * than (k−2) triangles OF THE CURRENT SUBGRAPH until none is deleted;
  * what survives is the k-truss (Cohen 2008), the standard
  * community-core definition tighter than k-core (every surviving edge
  * has k−2 common-neighbor witnesses, so the truss is made of
  * overlapping triangles, not just well-connected nodes).
  *
  * Scale shape per round (cites Triangles.scala's enumeration): wedges
  * join the canonical (a<b) edge list with itself on the LOWER endpoint
  * — Σ_a deg(a)²/2 candidate wedges, the same bound the triangle
  * operator carries — then one equi-join against the edge list closes
  * each wedge into a triangle, and each closed triangle credits its
  * THREE edges via a union + keyed count. Everything is equi-joins and
  * keyed aggregates; no all-pairs stage, no driver-side graph state.
  * Lineage is severed with `localCheckpoint` every round (the KCore/CC
  * precedent). Rounds are bounded by `maxRounds`, and the operator
  * THROWS at a non-fixpoint exit — silent truncation would return a
  * superset of the truss and hash-mismatch the oracle (KCore's loud
  * contract, verbatim).
  *
  * The oracle unrolls the SAME peel a fixed number of rounds in SQL;
  * rounds past the fixpoint are no-ops, so engine-at-convergence equals
  * oracle-at-R for any R ≥ the convergence round. */
object KTruss {

  /** Per-edge triangle support of the CURRENT canonical edge list:
    * (a, b, support ≥ 1) for edges in at least one triangle. Edges in no
    * triangle are absent (callers coalesce to 0). */
  private def support(cur: DataFrame): DataFrame = {
    val tri = cur.as("e1")
      .join(cur.as("e2"),
        col("e1.a") === col("e2.a") && col("e1.b") < col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
      .join(cur.as("e3"),
        col("y") === col("e3.a") && col("z") === col("e3.b"), "left_semi")
    tri.select(col("x").as("a"), col("y").as("b"))
      .unionAll(tri.select(col("x").as("a"), col("z").as("b")))
      .unionAll(tri.select(col("y").as("a"), col("z").as("b")))
      .groupBy("a", "b").agg(count(lit(1)).as("support"))
  }

  /** The k-truss of the undirected graph given as an edge list
    * (self-loops dropped, duplicate/reversed edges collapsed). Returns
    * every surviving edge with its support inside the truss (≥ k−2 by
    * definition), canonical a < b. Throws if the fixpoint is not
    * reached within `maxRounds`. */
  def kTruss(edges: DataFrame, aCol: String, bCol: String, k: Int,
             maxRounds: Int = 8): DataFrame = {
    require(k >= 3, s"k must be >= 3 (k-2 triangle witnesses), got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    var cur = edges
      .select(least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    var nEdges = cur.count()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      round += 1
      val next = cur.join(support(cur), Seq("a", "b"), "left")
        .filter(coalesce(col("support"), lit(0L)) >= (k - 2).toLong)
        .select("a", "b")
        .localCheckpoint()
      val n = next.count() // bounded driver read: one scalar per round
      converged = n == nEdges
      nEdges = n
      cur = next
    }
    if (!converged)
      throw new IllegalStateException(
        s"k-truss peel did not reach fixpoint in $maxRounds rounds " +
          s"($nEdges edges remain in motion) — raise maxRounds")
    cur.join(support(cur), Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        coalesce(col("support"), lit(0L)).as("support"))
  }
}

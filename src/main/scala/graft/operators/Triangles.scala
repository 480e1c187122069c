package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting by DEGREE ORIENTATION — the standard
  * distributed algorithm (Suri & Vassilvitskii's MapReduce formulation;
  * also Cohen's), chosen for the property that makes it survive a 100 TB
  * edge table: orient every undirected edge from its lower-(degree, id)
  * endpoint to the higher one, and the out-degree of EVERY node — however
  * hot a hub it is in the raw graph — is O(√m). (A node of degree d keeps
  * only edges toward neighbors of degree ≥ d, and the graph can hold at
  * most 2m/d such neighbors; min(d, 2m/d) ≤ √(2m).) The wedge join that
  * dominates triangle counting is therefore quadratic in the ORIENTED
  * out-degree, never in the raw hub degree — a celebrity node with 10⁸
  * followers contributes wedges bounded by √m, not 10¹⁶ pairs.
  *
  * Every triangle {u, v, w} has exactly one apex — its minimum node in
  * the (deg, id) total order — whose two out-edges form the one wedge the
  * closing edge completes, so each triangle is found exactly once, with
  * no ÷3 or ÷6 correction and no double counting to repair.
  *
  * All three steps are keyed equi-joins + hash aggregations (canonical
  * Spark shuffles, AQE-splittable); there is no all-pairs stage and no
  * driver-side state. The total order is materialized as the integer key
  * `deg·2³² + id` so orientation and wedge-ordering are plain BIGINT
  * comparisons — portable to any engine, which is what lets the DuckDB
  * oracle verify the result with a DIFFERENT algorithm (naive id-ordered
  * enumeration) and still match hash-exactly.
  */
object Triangles {

  /** Per-node triangle participation over an undirected graph given as an
    * edge list (self-loops dropped, duplicate/reversed edges collapsed).
    * Node ids must be non-negative and < 2³¹ so `deg·2³² + id` is an
    * injective BIGINT order key. Returns (node, triangles) for every node
    * that closes at least one triangle; each triangle credits all three
    * corners. */
  def perNodeCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val canon = edges
      .select(least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = canon.select(col("a").as("node"))
      .unionAll(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    // injective total-order key: degree first, id as tiebreak
    val keyed = canon
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("d", "db"), "b")
      .select(col("a"), col("b"),
        (col("da") * lit(4294967296L) + col("a")).as("ka"),
        (col("db") * lit(4294967296L) + col("b")).as("kb"))
    // persisted: the oriented edge list feeds the wedge join twice AND the
    // closing join — three consumers of one subtree
    val oriented = keyed.select(
      when(col("ka") < col("kb"), col("a")).otherwise(col("b")).as("src"),
      when(col("ka") < col("kb"), col("b")).otherwise(col("a")).as("dst"),
      greatest(col("ka"), col("kb")).as("dst_k"))
      .persist()
    val e1 = oriented.select(col("src"), col("dst").as("v"), col("dst_k").as("vk"))
    val e2 = oriented.select(col("src"), col("dst").as("w"), col("dst_k").as("wk"))
    // wedges at the apex: two out-edges, ordered by the SAME total order
    // the orientation used, so the closing edge (v → w) can only point one
    // way and a plain equi-join finds it
    val wedges = e1.join(e2, Seq("src")).filter(col("vk") < col("wk"))
    val tris = wedges.join(
      oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
      .select(col("src").as("u"), col("v"), col("w"))
    val out = tris.select(col("u").as("node"))
      .unionAll(tris.select(col("v").as("node")))
      .unionAll(tris.select(col("w").as("node")))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    out
  }
}

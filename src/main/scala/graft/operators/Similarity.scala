package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers, as a 100-TB ANN stack needs:
  *  - [[knnBruteForce]]: exact top-k against ONE query vector. A single
  *    narrow pass (the query vector rides along as a broadcast literal) +
  *    `TakeOrderedAndProject` — per-partition heaps, no global sort, no
  *    collect. This is the exact baseline any ANN index is measured
  *    against, and it scales linearly with the corpus.
  *  - [[bucketedNearestNeighbor]]: IVF-style search. A coarse quantizer
  *    (here: the precomputed `label` partition — in production, the
  *    centroid id from k-means) buckets the corpus; each vector only
  *    compares within its bucket via an EQUI join on the bucket key.
  *    Spark shuffles both sides on the bucket — cost is Σ bucket², never
  *    global n². The same shape holds for LSH random-projection buckets.
  *
  * Determinism: all cosines are computed as a left fold in DOUBLE
  * (`zip_with` products, `aggregate` sum, then /(sqrt·sqrt)). Every step is
  * a correctly-rounded IEEE op on exactly-widened float32 inputs in a fixed
  * order, so DuckDB's `list_reduce` mirror is bit-identical — which is why
  * the oracle-checked queries can emit the cosine values themselves and
  * still hash-match.
  */
object Similarity {

  /** dot(a, b) in double precision, left-fold order (0.0 + x1 + x2 + …).
    * DuckDB mirror: `list_reduce(list_transform(generate_series(1, len(a)),
    * i -> a[i]::DOUBLE * b[i]::DOUBLE), (x,y) -> x+y)` — list_reduce has no
    * init but 0.0 + x1 == x1 exactly, so the folds agree bit-for-bit. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, p) => acc + p)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact top-k neighbors of the vector with id `queryId`, by cosine desc
    * with id tie-break. The 1-row query side is broadcast and the plan is
    * scan → project → TakeOrderedAndProject (per-partition heaps — a
    * window-computed rank here would instead force a GLOBAL sort of the
    * corpus into one partition; the cosine itself is emitted, bit-exact,
    * and carries the ordering). */
  def knnBruteForce(emb: DataFrame, idCol: String, vecCol: String,
                    queryId: Long, k: Int): DataFrame = {
    val q = emb.filter(col(idCol) === queryId).select(col(vecCol).as("__q"))
    emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol).as("vec_id"), cosine(col(vecCol), col("__q")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Random-hyperplane LSH bucket id over `planes` sign bits. Hyperplane
    * weights are pseudo-random ±1, derived deterministically from md5 of
    * "plane:dim" — portable, so the DuckDB oracle reproduces the buckets
    * bit-for-bit (the sign test compares a bit-exact double fold with 0).
    * Bit p of the bucket = [dot(vec, w_p) > 0]. */
  def lshBucket(vec: Column, planes: Int): Column = {
    def planeSign(p: Int, i: Column): Column =
      when(conv(substring(md5(concat(lit(s"$p:"), i.cast("string"))), 1, 8), 16, 10)
        .cast("long").bitwiseAND(1) === 1, lit(1.0)).otherwise(lit(-1.0))
    def planeDot(p: Int): Column =
      aggregate(
        transform(sequence(lit(1), size(vec)), i =>
          element_at(vec, i).cast("double") * planeSign(p, i)),
        lit(0.0), (acc, x) => acc + x)
    (0 until planes).map(p => when(planeDot(p) > 0, lit(1 << p)).otherwise(lit(0)))
      .reduce(_ + _)
  }

  /** LSH-bucketed ANN: nearest neighbor within each vector's
    * random-hyperplane bucket. Same equi-join shape as the IVF variant but
    * the quantizer is data-independent — the pure scale path when no
    * trained centroids exist. Vectors alone in their bucket emit no row
    * (deterministically, in engine and oracle alike). */
  def lshNearestNeighbor(emb: DataFrame, idCol: String, vecCol: String,
                         planes: Int): DataFrame =
    bucketedNearestNeighbor(
      emb.withColumn("__lsh", lshBucket(col(vecCol), planes)),
      idCol, vecCol, "__lsh")

  /** IVF-style search: each vector's nearest neighbor within its own
    * bucket. Equi-join on the bucket key, cosine per candidate pair, then
    * a window top-1 per probe vector. Emits (vec_id, nn_id). */
  def bucketedNearestNeighbor(emb: DataFrame, idCol: String, vecCol: String,
                              bucketCol: String): DataFrame = {
    val a = emb.select(col(bucketCol).as("__bkt"), col(idCol).as("vec_id"), col(vecCol).as("__va"))
    val b = emb.select(col(bucketCol).as("__bkt"), col(idCol).as("nn_id"), col(vecCol).as("__vb"))
    val w = Window.partitionBy("vec_id").orderBy(col("__cos").desc, col("nn_id").asc)
    a.join(b, "__bkt")
      .filter(col("vec_id") =!= col("nn_id"))
      .select(col("vec_id"), col("nn_id"), cosine(col("__va"), col("__vb")).as("__cos"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("vec_id", "nn_id")
  }
}

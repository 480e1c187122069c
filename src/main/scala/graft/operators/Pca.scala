package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Top principal component of an embedding cloud — the whitening /
  * rotation-init primitive an embedding pipeline needs before product
  * quantization (OPQ), for drift monitoring, and for cheap 1-D
  * projections of a corpus.
  *
  * Two-phase shape, sized for 100 TB:
  *
  *  1. EXACT DISTRIBUTED MOMENTS. One pass over the vectors computes the
  *     first moments s_i, the row count n, and the upper-triangle raw
  *     second moments S_ij = Σ x_i·x_j — all in ONE native aggregate
  *     ([[graft.expressions.MomentMatrixAgg]]). The per-row product is
  *     plain double IEEE (bit identical on any engine); each product is
  *     rounded to the repo's DECIMAL(18,6) fixed point and added into a
  *     128-bit integer accumulator, so the cross-row SUM is order-free
  *     and exactly reproducible by the SQL oracle. Each partition
  *     collapses to one (d + d·(d+1)/2)-element buffer — the exchange
  *     carries O(d² · partitions), never O(rows) — and the per-row cost
  *     is a primitive d² loop with no row generation and no per-product
  *     Decimal allocation (the double-posexplode formulation this
  *     replaces duplicated the vector d× into generated rows and
  *     allocated a BigDecimal per product; at local[32] that was the
  *     r17 driver-flagged GC pathology).
  *  2. BOUNDED DRIVER SOLVE. The moment matrix (d=64 → 2080+64 rows) is
  *     collected — bounded by DIMENSION², not data, the same contract as
  *     the PQ codebook collects — and the scaled covariance
  *     D_ij = n·S_ij·10⁶ − s_i·s_j (exact BigInt; positive multiple of
  *     the covariance, so eigenvectors are unchanged) is power-iterated
  *     `rounds` times in integer arithmetic: w = D·v, then
  *     v_i ← sign(w_i) · (|w_i|·SCALE div max|w|). Truncating division
  *     on NON-NEGATIVE operands with the sign carried separately —
  *     Spark `DIV` and DuckDB `//` agree there, so a SQL oracle replays
  *     every round bit-for-bit (the PageRank unrolled-iteration
  *     precedent).
  *
  * A fixed round count is the contract (like PageRank/BFS): the result
  * is "the `rounds`-step power-iteration estimate", deterministic from
  * the all-ones start vector, whether or not it has converged.
  * Degenerate inputs (zero covariance) keep the current vector rather
  * than divide by zero. */
object Pca {

  /** Fixed-point scale of the iterated vector (|v_i| ≤ Scale). */
  val Scale: Long = 1000000L

  /** (dim, loading) for the top principal direction of `vecCol` —
    * `dim` 0-based, `loading` the fixed-point component in [−Scale,
    * Scale]. All vectors must share one dimension (fixture contract). */
  def topComponent(emb: DataFrame, vecCol: String, rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = emb.sparkSession

    // one job, one collect: [d, n, s_0..s_{d-1}, p_00..p_(d-1)(d-1)],
    // sums already scaled ×10⁶ (the unscaled DECIMAL(·,6) integers)
    val m = emb
      .agg(graft.expressions.GraftFunctions.momentMatrix(col(vecCol)).as("m"))
      .head().getSeq[java.math.BigDecimal](0)
    val d = m(0).intValueExact()
    val n = BigInt(m(1).toBigIntegerExact)
    val b = Array.tabulate(d)(i => BigInt(m(2 + i).toBigIntegerExact))
    val dm = Array.ofDim[BigInt](d, d)
    var k = 2 + d
    for (i <- 0 until d; j <- i until d) {
      val a = BigInt(m(k).toBigIntegerExact)
      k += 1
      val dij = n * a * 1000000L - b(i) * b(j)
      dm(i)(j) = dij
      dm(j)(i) = dij
    }

    var v = Array.fill(d)(BigInt(Scale))
    for (_ <- 1 to rounds) {
      val w = Array.tabulate(d)(i =>
        (0 until d).foldLeft(BigInt(0))((acc, j) => acc + dm(i)(j) * v(j)))
      val m = w.map(_.abs).max
      if (m.signum != 0)
        v = w.map(wi => BigInt(wi.signum) * (wi.abs * Scale / m))
    }

    val rows = (0 until d).map(i => Row(i.toLong, v(i).toLong))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("dim", LongType, nullable = false),
        StructField("loading", LongType, nullable = false))))
  }
}

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
  *     first moments s_i and the upper-triangle raw second moments
  *     S_ij = Σ x_i·x_j. The per-row product is plain double IEEE (bit
  *     identical on any engine); the cross-row SUM goes through the
  *     repo's DECIMAL(18,6) fixed-point trick, so the aggregate is
  *     order-free and exactly reproducible by the SQL oracle. The
  *     d·(d+1)/2 group keys mean map-side partial aggregation collapses
  *     every partition to ≤ d² rows — the shuffle carries
  *     O(d² · partitions), never O(rows). The d² per-row expansion costs
  *     CPU, not shuffle, and vectorizes in codegen.
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
    val base = emb.select(col(vecCol).as("__v"))

    val fm = base
      .select(posexplode(col("__v")).as(Seq("i", "xi")))
      .groupBy("i")
      .agg(sum(col("xi").cast("double").cast("decimal(18,6)")).as("s"),
        count(lit(1)).as("n"))
      .collect()
    val d = fm.length
    val n = BigInt(fm.head.getLong(2))
    val b = Array.ofDim[BigInt](d)
    fm.foreach(r => b(r.getInt(0)) =
      BigInt(r.getDecimal(1).movePointRight(6).toBigIntegerExact))

    val sm = base
      .select(posexplode(col("__v")).as(Seq("i", "xi")), col("__v"))
      .select(col("i"), col("xi"), posexplode(col("__v")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .select(col("i"), col("j"),
        (col("xi").cast("double") * col("xj").cast("double"))
          .cast("decimal(18,6)").as("p"))
      .groupBy("i", "j")
      .agg(sum(col("p")).as("sp"))
      .collect()
    val dm = Array.ofDim[BigInt](d, d)
    sm.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val a = BigInt(r.getDecimal(2).movePointRight(6).toBigIntegerExact)
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

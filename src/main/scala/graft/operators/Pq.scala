package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the ANN memory-compression scheme
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011): split each D-dim embedding into M contiguous subspaces,
  * learn a tiny K-centroid codebook per subspace, and store each vector as
  * M small integer codes (D floats → M bytes at K ≤ 256 — the difference
  * between an index that fits in cluster RAM at 10¹⁰ vectors and one that
  * doesn't). Search is ADC (asymmetric distance computation): the query
  * stays un-quantized; its M×K table of subspace distances is computed
  * ONCE driver-side, and each candidate's estimated distance is M table
  * lookups — per-row narrow arithmetic against plan literals, no joins
  * until the bounded top-K.
  *
  * Determinism (what makes PQ oracle-checkable here, like the IVF trainer
  * at `Similarity.trainCentroidsLite`): codebooks train on a bounded
  * deterministic sample (id mod filter, ascending-id order, capped), init
  * is the first K sample sub-vectors, assignment is argmin squared-L2 with
  * lowest-index tie-break, means are ascending-id left-folds with a single
  * divide, and every distance is the same left-fold ((0+v₁)+v₂)+… in both
  * engines. Codes and ADC values match DuckDB bit-for-bit.
  */
object Pq {

  /** Driver-side fold: Σ (a_i − b_i)², ascending i, acc starts at 0.0 —
    * the exact op order the column expressions and the oracle use. */
  private[graft] def l2(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < b.length) { val d = a(i) - b(i); acc = acc + d * d; i += 1 }
    acc
  }

  /** Train per-subspace codebooks on a bounded deterministic sample (one
    * Lloyd pass, argmin L2, empty cells keep their init centroid). Returns
    * codebooks(s)(j) = centroid of subspace s, cell j. The sample collect
    * is bounded by `maxSample`, never data size. */
  def trainCodebooks(emb: DataFrame, idCol: String, vecCol: String, m: Int, k: Int,
                     sampleMod: Long, maxSample: Int): Seq[IndexedSeq[Array[Double]]] = {
    val sample: Array[(Long, Array[Double])] =
      emb.filter(col(idCol) % sampleMod === 0)
        .orderBy(col(idCol)).limit(maxSample)
        .select(col(idCol).cast("long"), col(vecCol))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
        .sortBy(_._1)
    require(sample.length >= k, s"sample ${sample.length} smaller than k=$k")
    val dim = sample.head._2.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subLen = dim / m
    (0 until m).map { s =>
      val off = s * subLen
      val subs: Array[(Long, Array[Double])] =
        sample.map { case (id, v) => (id, java.util.Arrays.copyOfRange(v, off, off + subLen)) }
      val init: IndexedSeq[Array[Double]] = subs.take(k).map(_._2).toIndexedSeq
      // strict < scanning ascending j keeps the LOWEST index on ties
      val assigned = subs.map { case (_, v) =>
        var bj = 0; var bd = l2(v, init(0)); var j = 1
        while (j < k) { val d = l2(v, init(j)); if (d < bd) { bd = d; bj = j }; j += 1 }
        bj
      }
      (0 until k).map { j =>
        val members = subs.indices.collect { case i if assigned(i) == j => subs(i)._2 }
        if (members.isEmpty) init(j)
        // per-dimension left-fold in ascending-id order, single divide
        else Array.tabulate(subLen)(d => members.map(_(d)).reduceLeft(_ + _) / members.length)
      }
    }
  }

  /** One INT code column per subspace: argmin squared-L2 against that
    * subspace's codebook, lowest index on ties (`array_position` returns
    * the FIRST position of the min). The codebooks ride in the plan as
    * literals — M·K·subLen doubles, bounded by parameters, broadcast with
    * the task binary; the per-row work is a codegen-friendly fold, no
    * join, no shuffle. */
  def codeCols(vecCol: Column, codebooks: Seq[IndexedSeq[Array[Double]]],
               subLen: Int): Seq[Column] =
    codebooks.zipWithIndex.map { case (cb, s) =>
      val sub = slice(vecCol, s * subLen + 1, subLen)
      val dists = array(cb.map { c =>
        aggregate(
          zip_with(sub, typedlit(c.toSeq),
            (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (acc, v) => acc + v)
      }: _*)
      (array_position(dists, array_min(dists)) - 1).cast("int").as(s"c$s")
    }

  /** ADC top-K: encode the corpus, estimate each candidate's distance to
    * `query` as Σ_s dt(s)(code_s) — the per-subspace distance table `dt`
    * is computed driver-side from the raw query (M·K doubles, a plan
    * literal) — and take the K nearest by (adc ASC, id ASC), a
    * TakeOrderedAndProject. Distances are estimates (quantization error),
    * which is the PQ trade; the ranking is exactly reproducible. */
  def adcSearch(emb: DataFrame, idCol: String, vecCol: String,
                query: Array[Double], codebooks: Seq[IndexedSeq[Array[Double]]],
                excludeId: Long, topK: Int): DataFrame = {
    val m = codebooks.length
    val subLen = query.length / m
    val dt: Seq[Seq[Double]] = codebooks.zipWithIndex.map { case (cb, s) =>
      cb.map(c => l2(java.util.Arrays.copyOfRange(query, s * subLen, (s + 1) * subLen), c))
    }
    val withCodes = emb.select(col(idCol).cast("long").as("vec_id") +:
      codeCols(col(vecCol), codebooks, subLen): _*)
    val adc = (0 until m)
      .map(s => element_at(typedlit(dt(s)), col(s"c$s") + 1))
      .reduce(_ + _) // fixed s = 0..m-1 left-assoc order, mirrored in the oracle
    withCodes.filter(col("vec_id") =!= excludeId)
      .withColumn("adc", adc)
      .orderBy(col("adc").asc, col("vec_id").asc)
      .limit(topK)
      .select(col("vec_id"), col("adc"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.md5Long

/** Deterministic, shuffle-free sampling for corpus construction.
  *
  * Every sampler here is a pure scan-side FILTER on an md5-derived integer
  * hash of the row key — no shuffle, no sort, no per-partition state, no
  * RNG. That is the only sampling shape that holds at 100 TB: each of the
  * ~1e6 input splits decides membership independently and the decision is
  * reproducible row-by-row (re-runs, backfills, and a DuckDB oracle all
  * agree), unlike `df.sample()`, whose `BernoulliCellSampler` draws from a
  * partition-seeded RNG and so changes membership whenever partitioning
  * changes.
  *
  * All inclusion tests are INTEGER comparisons against precomputed
  * thresholds (`p ≈ threshold / 2^bits`) — no floating-point boundary to
  * disagree across engines.
  */
object Sampling {

  /** 2^60 as a Long; md5Long is uniform on [0, 2^60). */
  val HashSpace60: Long = 1L << 60

  /** 40-bit hash (first 10 md5 hex chars) — headroom for integer
    * cross-multiplication in weighted tests: `hash40 * w` stays inside
    * Int64 for any weight below 2^23. DuckDB mirror:
    * `('0x' || substring(md5(x), 1, 10))::BIGINT`. */
  def md5Long40(c: Column): Column =
    conv(substring(md5(c), 1, 10), 16, 10).cast("long")

  /** The threshold for inclusion probability `rate` over the 60-bit hash
    * space. Exact for any rate expressible at double precision. */
  def threshold60(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    (rate * HashSpace60.toDouble).toLong
  }

  /** The salted per-row hash every sampler keys on: uniform on [0, 2^60),
    * independent across salts (distinct salts give independent samples —
    * e.g. a train/validation split and a QA sample never correlate). */
  def rowHash(key: Column, salt: String): Column =
    md5Long(concat(key.cast("string"), lit(":" + salt)))

  /** Uniform Bernoulli sample: keep a row iff its salted hash lands below
    * the rate threshold. One scan, zero shuffles, filter pushed to the
    * source when the key is a stored column. */
  def bernoulli(df: DataFrame, keyCol: String, rate: Double, salt: String): DataFrame =
    df.filter(rowHash(col(keyCol), salt) < lit(threshold60(rate)))

  /** Stratified Bernoulli sample: per-stratum rates (e.g. downsample web
    * crawl, keep all of wikipedia). `rates` is a SMALL plan-time map —
    * it compiles into a CASE chain, so the plan stays a single scan+filter
    * with zero shuffles; strata missing from the map get `defaultRate`.
    *
    * This is the deterministic, scan-parallel alternative to
    * `df.stat.sampleBy` (seeded-RNG, not reproducible across
    * repartitioning) and to exact-count stratified sampling (which needs a
    * per-stratum rank — a shuffle — to pick exactly ceil(f·n) rows; at
    * corpus scale the binomial deviation from the target fraction is
    * O(1/sqrt(n)) and irrelevant). */
  def stratifiedBernoulli(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double,
      salt: String): DataFrame = {
    val thr = rates.foldLeft(lit(threshold60(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === lit(stratum), lit(threshold60(rate))).otherwise(acc)
    }
    df.filter(rowHash(col(keyCol), salt) < thr)
  }

  /** Weighted Bernoulli sample: inclusion probability proportional to a
    * per-row integer weight, `p = min(1, weight / weightScale)`. The test
    * is a pure-integer cross-multiplication over the 40-bit hash —
    * `hash40 * weightScale < min(weight, weightScale) * 2^40` — so it is
    * exact for ANY row weight (no float rounding at the boundary, no
    * overflow): the data-side weight is clamped to `weightScale` before
    * the multiply, which both implements the documented `min(1, ·)`
    * exactly (a clamped weight == weightScale makes the test
    * `hash40 < 2^40`, always true) and keeps the product inside Int64
    * however large a row's stored weight is. The `weightScale < 2^23`
    * bound is what makes `weightScale * 2^40 < 2^63` — a requirement on
    * the CALLER's constant, checked here; the data needs no precondition.
    *
    * This is how a quality-weighted or length-weighted corpus draw runs at
    * scale: the weight is a stored column, the decision is scan-local. */
  def weightedBernoulli(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      weightScale: Long,
      salt: String): DataFrame = {
    require(weightScale > 0 && weightScale < (1L << 23),
      s"weightScale must be in (0, 2^23) for overflow-free integer math, got $weightScale")
    val hash40 = md5Long40(concat(col(keyCol).cast("string"), lit(":" + salt)))
    val wClamped = least(col(weightCol).cast("long"), lit(weightScale))
    df.filter(hash40 * lit(weightScale) < wClamped * lit(1L << 40))
  }

  /** PRIORITY SAMPLING (Duffield–Lund–Thorup): a FIXED-SIZE weighted
    * sample without replacement per group — the complement of
    * [[weightedBernoulli]], whose output size is binomial. Each row draws
    * u uniform on (0,1] and gets priority w/u; the k highest-priority rows
    * of each group are the sample (heavier rows get proportionally higher
    * priorities, equal-weight rows compete uniformly — DLT prove the
    * resulting top-k supports near-optimal subset-sum estimation).
    *
    * Exactness: u = (h+1)/2^40 from the salted 40-bit md5 hash, and the
    * ORDER is taken on `(w' * 2^40) div (h+1)` — floor division of two
    * Longs, identical on any engine, ties broken by id ASC. The weight is
    * clamped to 2^23−1 before the multiply (the [[weightedBernoulli]]
    * overflow guard, `w' * 2^40 < 2^63`); among rows at the cap the order
    * degrades to the hash alone, i.e. saturated weights compete uniformly
    * — clamp-aware callers scale weights below the cap.
    *
    * The per-group top-k runs as the [[graft.expressions.TopKByScore]]
    * aggregate — a K-entry buffer merged map-side, so the shuffle carries
    * ≤ k (priority, id) pairs per (partition, group), NEVER the group
    * (the rank-window shape PlanGuardSpec bans). One scan, one keyed
    * shuffle of k-bounded state: the fixed-size weighted draw at 100 TB.
    *
    * Returns one row per selected element: (group, rnk, id, priority),
    * rnk 1-based by priority DESC. */
  def prioritySample(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      groupCol: String,
      k: Int,
      salt: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import graft.expressions.GraftFunctions.topKByScore
    val h40 = md5Long40(concat(col(keyCol).cast("string"), lit(":" + salt)))
    val wClamped = least(col(weightCol).cast("long"), lit((1L << 23) - 1))
    df.withColumn("__h", h40)
      .withColumn("__w", wClamped)
      .withColumn("__p", expr(s"CAST((__w * ${1L << 40}) DIV (__h + 1) AS BIGINT)"))
      .groupBy(col(groupCol))
      .agg(topKByScore(col("__p"), col(keyCol).cast("long"), k).as("top"))
      .select(col(groupCol), posexplode(col("top")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rnk"),
        col("col.id").as(keyCol), col("col.score").as("priority"))
  }

  /** Exact heavy hitters in two bounded passes (the MG candidate pass +
    * an exact verify pass), for thresholds `cnt * thresholdDen >= N`:
    *
    *   pass 1 — ONE scan computing `graft_heavy_hitters(k)` and `count(*)`
    *     together: ≤ k candidate keys + the total N. Bounded driver read
    *     (≤ k strings — a scalar report, not data).
    *   pass 2 — exact `groupBy.count` over ONLY the candidate keys (an
    *     `isin` scan filter: the shuffle carries ≤ k groups, not the
    *     vocabulary), keeping those with `cnt * thresholdDen >= N`.
    *
    * Sound whenever `k >= thresholdDen` (i.e. k + 1 > thresholdDen,
    * STRICTLY): the MG bound only guarantees survival of items with
    * frequency strictly greater than N/(k+1), while pass 2 keeps
    * `cnt * den >= N` INCLUSIVELY — so the guard must force
    * N/(k+1) < N/thresholdDen, not <=. At k + 1 == thresholdDen an item
    * with frequency exactly N/thresholdDen can be evicted from the
    * candidates and silently dropped (k=1, den=2, stream a,b,a,c: true
    * answer {a}, MG candidates end empty). With the strict guard the
    * result is EXACT — identical to the full
    * `GROUP BY ... HAVING cnt * den >= N` the oracle runs — but the
    * full-vocabulary shuffle never happens.
    */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int, thresholdDen: Long): DataFrame = {
    require(k >= thresholdDen,
      s"k=$k too small for threshold N/$thresholdDen: need k >= $thresholdDen " +
        "(k+1 strictly above the denominator) for the MG superset guarantee")
    import graft.expressions.GraftFunctions
    val row = items.agg(
      GraftFunctions.misraGries(col(itemCol), k).as("cand"),
      count(lit(1)).as("n")).first()
    val cands: Seq[String] = row.getSeq[String](0)
    val n: Long = row.getLong(1)
    items.filter(col(itemCol).isin(cands: _*))
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(thresholdDen) >= lit(n))
  }
}

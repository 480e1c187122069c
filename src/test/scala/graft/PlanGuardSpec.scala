package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan-regression guardrails over the ENTIRE query surface: walks every
  * `SparkEntry.queries` physical plan and fails on the two plan shapes that
  * are correct at test SF but serialize or explode at 100 TB —
  *
  *  1. cartesian / nested-loop joins (all-pairs candidate generation
  *     sneaking back into a dedup/similarity path);
  *  2. windows that put a scale-proportional group into ONE task: an
  *     unpartitioned window, or a window partitioned solely by a
  *     low-cardinality scale key (`source`, `lang` — ~10 groups whose
  *     size grows with the corpus, so one group == one giant sort).
  *
  * Whitelists are per-query and justified inline — a new entry here needs
  * the same boundedness argument the existing ones carry. This is the
  * regression net for the q63/q66 class of fix: those queries were green on
  * correctness for two rounds while hiding a single-task window.
  */
class PlanGuardSpec extends AnyFunSuite with SharedSpark {

  private val sf = "/root/testdata/sf0.001"

  /** Cross joins against PROVABLY corpus-independent sides: q31's
    * broadcast query vector and q45's nine 1-row aggregate legs; q83
    * pairs two per-source SKETCH aggregates (≤ #sources rows of k longs
    * each — sources²·k total regardless of corpus size). */
  private val boundedCross =
    Set("q31_knn_bruteforce", "q45_integrity", "q83_source_overlap",
      "q121_sketch_union", // two 1-row sketch legs
      "q131_hll_distinct", // merged-sketch row x exact-count row, both 1-row aggregates
      "q145_hybrid_search", // q31's broadcast 1-row query vector, reused by the dense leg
      "q160_pmi_pairs", // broadcast 1-row total-token aggregate against the pair table
      "q280_bigram_xent", // broadcast 1-row vocabulary-size aggregate against the bigram stream (the q160 shape)
      "q281_xent_profile", // same 1-row vocab broadcast, profile rollup
      "q284_ccnet_buckets", // vocab broadcast + 1-row per-source totals against the value-domain bucket map
      "q162_assoc_rules", // broadcast 1-row basket-count aggregate against the rule stream
      "q164_dsir_scores", // two broadcast 1-row gram-total aggregates into the 4096-row ratio table
      "q177_decayed_engagement", // broadcast 1-row max-day anchor against the event stream
      "q186_hits", // per-half-round broadcast 1-row max-rescale aggregates
      "q187_mmr_rerank", // broadcast 1-row query vector + the 50x50 bounded candidate self-join
      "q191_quality_dup_calibration", // broadcast 1-row total against the histogram-sized decile map
    "q206_chi_square", // broadcast 1-row quartile-bounds aggregate against the doc stream (q177's anchor shape)
    "q210_ks_drift", // value-spine x source-dimension cross: |distinct lengths| x |sources| post-aggregate rows
    "q213_rfm_segments", // broadcast 1-row anchor + three 1-row quintile-bound aggregates
    "q220_t_closeness", // balance-bucket spine x (nation, segment) dimension cross, both post-aggregate bounded
    "q231_type_affinity", // broadcast 1-row cell-count aggregate against the |types|² pair table
    "q232_column_profile", // 10-row decile spine against each column's value histogram
    "q237_segment_migration", // broadcast 1-row midpoint + two 1-row tercile-bound aggregates
    "q244_coverage_gaps", // broadcast 1-row hour-bounds aggregate exploded into the calendar spine
    "q249_modularity", // broadcast 1-row edge-count aggregate against the |brands|-row moment table
    "q260_leakage_safe_split") // broadcast 1-row straddle-audit aggregate against the |splits|x|sources| report

  /** Unpartitioned windows over BOUNDED post-aggregate input (q58: one
    * row per calendar day; q106: one row per source — the window input is
    * the aggregate, never the corpus). */
  private val boundedGlobalWindow = Set("q58_rolling_trend", "q106_temperature_mix",
    // q145: the two row_number windows rank POST-TakeOrdered candidate
    // lists (<= 50 rows each, the RRF k) — the corpus-scale work is the
    // scorers' TakeOrderedAndProject passes below them
    "q145_hybrid_search",
    // q155: the window totals the 9 POST-AGGREGATE first-digit rows
    "q155_benford",
    // q167: every window runs over the per-day POST-AGGREGATE series —
    // calendar-bounded at any corpus size (the q58 justification)
    "q167_cusum_changepoint",
    // q178: the global window cumulates the n_chars VALUE histogram —
    // bounded by the length-value domain (q169 argument), not corpus rows
    "q178_quantile_norm",
    // q179: the lag window runs over <= 11 post-aggregate threshold rows
    // (k in 4..14 by construction)
    "q179_ccdf_powers",
    // q195: windows run over the delay-MINUTE value histogram — bounded
    // by the latency domain (hours, not users)
    "q195_funnel_latency",
    // q202: global windows over the n_chars value histogram (q178's
    // argument)
    "q202_source_percentile",
    // q206: the cumulative/total windows run over the n_chars value
    // histogram (q178's argument); the grand-total window runs over the
    // 4x|sources| POST-AGGREGATE contingency cells
    "q206_chi_square",
    // q213: the three quintile-bound windows each run over one metric's
    // VALUE histogram (day / order-count / dollar domains), never over
    // customers
    "q213_rfm_segments",
    // q220: the global cumulative runs over the balance-kilobucket VALUE
    // histogram (~a dozen buckets at any customer count)
    "q220_t_closeness",
    // q232: each leg's cumulative runs over that column's VALUE histogram
    // (quantity/discount grids; the price lattice is |prices|·|quantities|
    // post-aggregate rows at any row count)
    "q232_column_profile",
    // q237: the tercile-bound windows run over each half's whole-dollar
    // spend VALUE histogram (q213's argument)
    "q237_segment_migration")

  /** Grouping keys whose per-group size is proportional to the corpus:
    * a window partitioned by one of these alone is a single-task sort. */
  private val scaleKeys = Set("source", "lang", "event_type")

  /** Windows partitioned by a scale key whose INPUT is a post-aggregate
    * calendar grid — one row per (key, day) at any corpus size, so the
    * per-key sort is bounded by the calendar, not the data (q117: the
    * forward-fill spine). */
  private val boundedKeyedWindow = Set("q117_gap_fill",
    // q169: the per-source windows run over the (source, n_chars) VALUE
    // histogram — bounded by the length-value domain under any doc-length
    // cap, never by corpus rows
    "q169_exact_median",
    // q170: the per-type cumulative sum runs over the (type, day)
    // POST-AGGREGATE calendar grid — the corpus-scale pass is the
    // first-interaction min-aggregate below it
    "q170_growth_curve",
    // q175/q178: per-source windows run over the (source, n_chars) VALUE
    // histogram — the q169 exact-median argument verbatim
    "q175_winsorized",
    "q178_quantile_norm",
    // q189: same (source, n_chars) value-histogram windows
    "q189_gini_length",
    // q202: same (source, n_chars) value-histogram windows
    "q202_source_percentile",
    // q206: the per-source row-total window runs over the 4x|sources|
    // POST-AGGREGATE contingency cells, never corpus rows
    "q206_chi_square",
    // q210: per-source cumulative over the n_chars VALUE-histogram spine
    // (q169 argument) — |distinct lengths| rows per source, never docs
    "q210_ks_drift",
    // q212: per-type lag windows over the (type, day) POST-AGGREGATE
    // calendar grid (q170's argument) — days per type, never events
    "q212_autocorr",
    // q217: per-source cumulative windows over the (source, n_chars) and
    // (source, deviation) VALUE histograms — the q169 argument twice
    "q217_mad_outliers",
    // q218: per-type median window over the slope VALUE histogram, whose
    // input is calendar²-bounded pair aggregates, never events
    "q218_theil_sen",
    // q240: the top-50 rank window runs over the per-source (shingle,
    // count) POST-AGGREGATE vocabulary — vocab-bounded, never docs
    "q240_fingerprint_overlap",
    // q244: the island window runs over the per-type EMPTY-hour set —
    // a subset of the calendar spine, bounded at any event volume
    "q244_coverage_gaps")

  /** q41/q112 execute a full AvailableNow stream inside the query function
    * — there is no lazy plan to inspect. The stream runner records each
    * run's executed micro-batch plan under its memory-sink name
    * ([[graft.streaming.Streams.recordedMicroBatchPlans]]); running the
    * query then fetching that plan puts the streaming micro-batch shapes
    * under the SAME guard as every batch plan. */
  private val streamingSinks = Map(
    "q41_stream_hourly" -> "graft_stream_hourly",
    "q112_stream_sessions" -> "graft_stream_sessions",
    "q137_stream_distinct" -> "graft_stream_distinct",
    "q143_stream_join" -> "graft_stream_join",
    "q166_stream_topk" -> "graft_stream_topk",
    "q172_stream_enrich" -> "graft_stream_enrich",
    "q185_stream_hopping" -> "graft_stream_hopping")

  test("no query plans a cartesian product or a scale-key single-group window") {
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val planOpt = streamingSinks.get(name) match {
        case Some(sink) =>
          fn(spark, sf) // executes the AvailableNow stream, recording its plan
          val p = graft.streaming.Streams.recordedMicroBatchPlans.get(sink)
          if (p.isEmpty)
            failures += s"$name: no recorded micro-batch plan for sink $sink " +
              "(recording hook broken — streaming plans are unguarded)"
          p
        case None => Some(fn(spark, sf).queryExecution.sparkPlan)
      }
      for (plan <- planOpt) {
        val cross = plan.collect {
          case c: CartesianProductExec => c.nodeName
          case b: BroadcastNestedLoopJoinExec => b.nodeName
        }
        if (cross.nonEmpty && !boundedCross(name))
          failures += s"$name: ${cross.mkString(", ")} (all-pairs shape)"
        plan.foreach {
          case w: WindowExec if w.partitionSpec.isEmpty =>
            if (!boundedGlobalWindow(name))
              failures += s"$name: unpartitioned Window (single-task global sort)"
          case w: WindowExec if w.partitionSpec.length == 1 =>
            val names = w.partitionSpec.head.references.map(_.name).toSet
            if (names.exists(scaleKeys) && !boundedKeyedWindow(name))
              failures += s"$name: Window partitioned by scale key ${names.mkString(",")} alone"
          case _ =>
        }
      }
    }
    assert(failures.isEmpty,
      s"scale-hostile plans detected:\n${failures.mkString("\n")}")
  }

  test("q42/q96 read the shingle table from cache — exactly one shingling scan") {
    // the prefix-filter operators reference the (doc_id, shingles) frame
    // ~3x (index build + both verify sides); the queries persist it, so the
    // physical plan must serve every occurrence from InMemoryTableScan and
    // contain NO direct parquet scan (the only parquet input is documents,
    // which feeds the cached shingling) — i.e. shingling runs once.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    try {
      for (name <- Seq("q42_jaccard_exact", "q96_containment")) {
        val plan = SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan
        val parquetScans = plan.collect { case f: FileSourceScanExec => f }
        val cachedScans = plan.collect { case c: InMemoryTableScanExec => c }
        assert(parquetScans.isEmpty,
          s"$name: ${parquetScans.length} direct file scans — shingle table not cached")
        assert(cachedScans.length >= 3,
          s"$name: expected >=3 cached shingle-table scans, got ${cachedScans.length}")
        if (name == "q96_containment") {
          // the candidate join's probe prefix has exactly ONE consumer
          // (the budget guard runs its own narrow aggregate over the
          // same subtree at guard time, collapsed to one row), so it
          // must NOT be separately cached — persisting it for the guard
          // measured ~2x worse than the double window run at sf0.1
          val probeCached = cachedScans.exists(
            _.output.map(_.name).toSet == Set("sh", "id_a", "sz_a"))
          assert(!probeCached,
            s"$name: single-consumer probe prefix is being cached — " +
              "pure materialization overhead on a cold run")
        }
      }
    } finally spark.sharedState.cacheManager.clearCache()
  }
}

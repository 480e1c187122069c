package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. One JSON line on stdout (prefix-free: build.sbt routes the
  * forked process straight through) + a copy at BENCH_LOCAL.json.
  *
  * The measured action is a noop-format write, NOT `.count()`: count lets
  * Catalyst prune every projection (a projection-heavy query would "run" in
  * milliseconds without evaluating its computed columns). The noop sink
  * evaluates every output row/column and discards it.
  *
  * Failures are reported per-query as ok=false and excluded from the total —
  * a broken query must not read as a fast success.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Untimed JVM/codegen warmup: a scan, a shuffle agg, a broadcast join,
    // PLUS one dedup and one ANN query (they compile the WordShingles /
    // MinHashSignature / ArrayDotProduct codegen paths the LLM suite runs
    // on) — all over the smallest SF, so first-measured-query timings
    // reflect steady state, not classloading + first codegen compile
    // (~4-7s of JVM startup was previously attributed to whichever query
    // sorted first).
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) {
      Seq("q01_groupby_agg", "q03_join_broadcast", "q02_filter_project",
        "q28_neardup_pairs", "q39_lsh_ann")
        .foreach { q =>
          try SparkEntry.queries(q)(spark, warmDir)
            .write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
        }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          true
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, ok) => s""""$k":${if (ok) v else -1}""" }
      .mkString("{", ",", "}")
    val failed = results.filterNot(_._3).map(r => s""""${r._1}"""").mkString("[", ",", "]")
    val total = results.filter(_._3).map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LOCAL.json"), json)
    spark.stop()
  }
}

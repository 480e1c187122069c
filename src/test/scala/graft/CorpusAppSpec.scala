package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.app.CorpusApp

/** End-to-end corpus materialization: one build over the sf0.001 documents
  * table, then structural invariants over the WRITTEN tables (shard sizing,
  * rank totality, manifest handshake) and byte-identical rebuild — the
  * determinism contract a restartable 100-TB build depends on. */
class CorpusAppSpec extends AnyFunSuite with SharedSpark {

  private val sf = "/root/testdata/sf0.001"

  private def build(): String = {
    val out = Files.createTempDirectory("graft-corpus-spec").toString
    CorpusApp.build(spark, sf, out)
    out
  }

  test("written corpus: positions are a total 1..n rank and shards are full except the last") {
    val out = build()
    val corpus = spark.read.parquet(s"$out/corpus")
    val n = corpus.count()
    assert(n > 0)
    // pos is exactly 1..n — no gaps, no dup ranks, no single-task sort needed to prove it
    val agg = corpus.agg(
      min("pos").as("mn"), max("pos").as("mx"),
      countDistinct("pos").as("d")).head()
    assert(agg.getLong(0) == 1L && agg.getLong(1) == n && agg.getLong(2) == n)
    // every shard holds ShardSize docs except possibly the last
    val sizes = corpus.groupBy("shard").agg(count(lit(1)).as("c"))
      .orderBy("shard").collect()
    sizes.dropRight(1).foreach(r => assert(r.getLong(1) == CorpusApp.ShardSize))
    assert(sizes.last.getLong(1) <= CorpusApp.ShardSize)
    // shard is derived from pos, so shard boundaries respect the global order
    val crossCheck = corpus
      .filter(expr(s"shard != (pos - 1) div ${CorpusApp.ShardSize}")).count()
    assert(crossCheck == 0)
  }

  test("manifest agrees with the written tables; stats sum to the corpus") {
    val out = build()
    val corpus = spark.read.parquet(s"$out/corpus")
    val m = spark.read.parquet(s"$out/manifest").head()
    assert(m.getAs[Long]("n_clean") == corpus.count())
    assert(m.getAs[Long]("n_shards") == corpus.select("shard").distinct().count())
    assert(m.getAs[Long]("n_raw") ==
      spark.read.parquet(s"$sf/documents.parquet").count())
    val stats = spark.read.parquet(s"$out/corpus_stats")
    val totals = stats.agg(sum("n_docs"), sum("n_tokens")).head()
    val direct = corpus.agg(count(lit(1)), sum("n_tokens")).head()
    assert(totals.getLong(0) == direct.getLong(0))
    assert(totals.getLong(1) == direct.getLong(1))
  }

  test("append: init + batch covers the same survivor set; old positions never move; rerun is a no-op") {
    val out = Files.createTempDirectory("graft-corpus-spec").toString
    CorpusApp.build(spark, sf, out, pred = col("doc_id") % 2 === 0)
    val phase1 = spark.read.parquet(s"$out/corpus")
      .select("doc_id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    CorpusApp.append(spark, sf, out, batchId = "b1", pred = col("doc_id") % 2 === 1)
    val after = spark.read.parquet(s"$out/corpus")
      .select("doc_id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every phase-1 row kept its exact position
    phase1.foreach { case (id, p) => assert(after(id) == p) }
    // appended rows occupy max(phase1)+1 .. n contiguously
    assert(after.values.toSeq.sorted == (1L to after.size.toLong))

    // same batch id again: ledger-gated full no-op (data AND manifest)
    CorpusApp.append(spark, sf, out, batchId = "b1", pred = col("doc_id") % 2 === 1)
    assert(spark.read.parquet(s"$out/corpus").count() == after.size.toLong)

    // the exact-fp history gate held: no content fingerprint appears twice
    val c = spark.read.parquet(s"$out/corpus")
    assert(c.select("fp").distinct().count() == c.count())
    // manifest tracked the cumulative raw count across both phases
    assert(spark.read.parquet(s"$out/manifest").head().getAs[Long]("n_raw") ==
      spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("append never rescans the written corpus beyond the fp gate and max-pos read") {
    // the O(batch)-not-O(corpus) claim, asserted structurally: register a
    // QueryExecutionListener for the whole append and record every column
    // each file scan reads from the written corpus. The exact-fp gate reads
    // `fp`, the position offset reads `pos` — a derived-table rescan would
    // read source/n_tokens/shard and fail the subset check.
    import scala.jdk.CollectionConverters._
    val out = Files.createTempDirectory("graft-corpus-spec").toString
    CorpusApp.build(spark, sf, out, pred = col("doc_id") % 2 === 0)
    val scans = new java.util.concurrent.ConcurrentLinkedQueue[(String, Seq[String])]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        qe.sparkPlan.foreach {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            scans.add((f.relation.location.rootPaths.map(_.toString).mkString(","),
              f.output.map(_.name)))
          case _ => ()
        }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      CorpusApp.append(spark, sf, out, batchId = "b1", pred = col("doc_id") % 2 === 1)
      // the execution listener drains asynchronously; wait for the corpus
      // scans (gate + max-pos) to land before asserting on them
      val deadline = System.nanoTime() + 30e9.toLong
      def corpusScans = scans.asScala
        .filter(_._1.startsWith(s"file:$out/corpus"))
        .filterNot(_._1.contains("corpus_stats")).toSeq
      while (corpusScans.isEmpty && System.nanoTime() < deadline) Thread.sleep(100)
      assert(corpusScans.nonEmpty, s"no corpus scans observed; saw ${scans.asScala.toSeq}")
      Thread.sleep(500) // let any straggler scan events land
      val colsRead = corpusScans.flatMap(_._2).toSet
      assert(colsRead.subsetOf(Set("fp", "pos")),
        s"append scanned written-corpus columns beyond the gate: $colsRead")
    } finally spark.listenerManager.unregister(listener)
  }

  test("incremental derived tables equal the full audit recompute") {
    val out = Files.createTempDirectory("graft-corpus-spec").toString
    CorpusApp.build(spark, sf, out, pred = col("doc_id") % 3 === 0)
    CorpusApp.append(spark, sf, out, batchId = "b1", pred = col("doc_id") % 3 === 1)
    CorpusApp.append(spark, sf, out, batchId = "b2", pred = col("doc_id") % 3 === 2)
    def snap(t: String) =
      spark.read.parquet(s"$out/$t").collect().map(_.toString).toSet
    val incStats = snap("corpus_stats")
    val incManifest = snap("manifest")
    CorpusApp.auditDerived(spark, out)
    assert(snap("corpus_stats") == incStats, "audit recompute diverged from folded stats")
    assert(snap("manifest") == incManifest, "audit recompute diverged from folded manifest")
  }

  test("rebuild over the same input is byte-identical (restartability contract)") {
    val a = build()
    val b = build()
    for (t <- Seq("corpus", "corpus_stats", "manifest")) {
      val da = spark.read.parquet(s"$a/$t")
      val rows = (df: org.apache.spark.sql.DataFrame) =>
        df.select(df.columns.sorted.map(col): _*).collect().map(_.toString).toSet
      assert(rows(da) == rows(spark.read.parquet(s"$b/$t")), s"table $t differs")
    }
  }

  test("CorpusQueries.resetMaterializedState forces a full rebuild (bench honesty hook)") {
    // the bench drops corpus state between passes so every rep pays the
    // real build/append cost; this pins that the hook actually discards
    // the memoized materialization (a fresh temp dir on the next call)
    // and removes the old one from disk
    import graft.queries.CorpusQueries
    CorpusQueries.resetMaterializedState()
    val first = CorpusQueries.q81CorpusStats(spark, sf).inputFiles.toSet
    assert(CorpusQueries.q81CorpusStats(spark, sf).inputFiles.toSet == first,
      "memo must be stable between calls within a pass")
    CorpusQueries.resetMaterializedState()
    val second = CorpusQueries.q81CorpusStats(spark, sf).inputFiles.toSet
    assert(second.nonEmpty && second != first,
      "reset did not force a rebuild into a fresh materialization")
    val oldDir = java.nio.file.Paths.get(
      new java.net.URI(first.head)).getParent.getParent
    assert(!java.nio.file.Files.exists(oldDir),
      s"reset left the previous materialization on disk: $oldDir")
    CorpusQueries.resetMaterializedState()
  }
}

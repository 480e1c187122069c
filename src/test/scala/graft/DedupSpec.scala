package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("exactClusters collapses identical texts and keeps the minimum id") {
    val d = docs(1L -> "a b c", 2L -> "x y z", 7L -> "a b c")
    val out = Dedup.exactClusters(d, "doc_id", "text")
      .orderBy("keeper_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("keeper_id") == 1L && out(0).getAs[Long]("n_copies") == 2L)
    assert(out(1).getAs[Long]("keeper_id") == 2L && out(1).getAs[Long]("n_copies") == 1L)
  }

  test("shingleSets excludes docs with fewer than k tokens") {
    val d = docs(1L -> "one two", 2L -> "one two three four")
    val out = Dedup.shingleSets(d, "doc_id", "text", 3).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L))
    assert(out(0).getSeq[String](1).toSeq == Seq("one two three", "two three four"))
  }

  test("duplicateSpans merges overlapping hits, finds within-doc repeats, skips unique docs") {
    val d = docs(
      // docs 1/2 share the 6-token phrase "a b c d e f" at different offsets:
      // two overlapping 5-gram hits each, merged to one 6-token span
      1L -> "a b c d e f x y z w",
      2L -> "q0 r0 a b c d e f s t",
      // within-doc repetition: "m n o p q" at pos 1 and 6 — adjacent
      // intervals [1,5] and [6,10] merge into one 10-token span
      3L -> "m n o p q m n o p q",
      4L -> "u1 u2 u3 u4 u5 u6")
    val out = Dedup.duplicateSpans(d, "doc_id", "text", k = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("span_start"),
        r.getAs[Int]("span_end"), r.getAs[Int]("span_tokens")))
    assert(out.toSeq == Seq((1L, 1, 6, 6), (2L, 3, 8, 6), (3L, 1, 10, 10)))
  }

  test("connectedComponents closes a diameter-3 chain and leaves singletons alone") {
    // edges 1-2, 2-3, 3-4: node 4 learns label 1 only after several rounds
    val nodes = Seq(1L, 2L, 3L, 4L, 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(nodes, pairs, "doc_id")
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"))).toSeq ==
      Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 9L -> 9L))
  }

  test("connectedComponents fails loudly past maxRounds instead of stopping early") {
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    assertThrows[IllegalArgumentException] {
      Dedup.connectedComponents(nodes, pairs, "doc_id", maxRounds = 1)
    }
  }

  test("simhashNearDupAgainst matches across sides at hamming <= 3 via the banded equi-join") {
    // batch sig 0x7 differs from hist 0x0 in 3 bits (all inside one band)
    // and from hist 0xFF0 in 11; batch 0x3C3C0 differs from both by 8 —
    // only (1, 0) matches, and the banded join must still FIND it
    // (pigeonhole: 3 flipped bits leave at least 3 of 4 bands identical)
    val hist = Seq((0L, 0L), (2L, 0xFF0L)).toDF("doc_id", "simhash")
    val batch = Seq((1L, 0x7L), (3L, 0x3C3C0L)).toDF("doc_id", "simhash")
    val out = Dedup.simhashNearDupAgainst(batch, hist).collect()
    assert(out.map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("hist_id"),
      r.getAs[Long]("hamming"))).toSet == Set((1L, 0L, 3L)))
    val plan = Dedup.simhashNearDupAgainst(batch, hist).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("nearDupPairs finds the high-Jaccard pair with exact counts, nothing else") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = docs(
      1L -> base,
      2L -> (base + " lambda"), // 8 of 9 shingles shared -> j = 8/9
      3L -> "one two three four five six seven eight nine ten")
    val out = Dedup.nearDupPairs(d, "doc_id", "text").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    assert(r.getAs[Long]("n_common") == 8L && r.getAs[Long]("n_union") == 9L)
  }

  test("nearDupPairs plans an equi join on LSH buckets, never a cartesian product") {
    val d = docs(1L -> "a b c d e", 2L -> "a b c d f", 3L -> "p q r s t")
    val plan = Dedup.nearDupPairs(d, "doc_id", "text").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"all-pairs plan detected:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop plan detected:\n$plan")
  }

  test("nearDupSurvivors drops exactly the higher id of each verified pair") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = docs(1L -> base, 2L -> (base + " lambda"), 3L -> "u v w x y z q r s t")
    val ids = Dedup.nearDupSurvivors(d, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 3L))
  }

  test("simhash is invariant to token order and sensitive to content") {
    val d = docs(
      1L -> "spark batch window join",
      2L -> "join window batch spark", // same multiset
      3L -> "completely different words here")
    val out = Dedup.simhash(d, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(3L))
    assert(out(1L) >= 0L && out(1L) < (1L << 60))
  }

  test("simhashNearDupPairs: identical docs at hamming 0; banding finds them without all-pairs") {
    val d = docs(
      1L -> "spark batch window join merge",
      2L -> "spark batch window join merge",   // hamming 0
      3L -> "totally unrelated vocabulary entirely elsewhere")
    val out = Dedup.simhashNearDupPairs(d, "doc_id", "text")
    val rows = out.collect()
    assert(rows.exists(r => r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L
      && r.getAs[Long]("hamming") == 0L))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs plan detected:\n$plan")
  }

  test("portable minhash: equal shingle sets give equal signatures") {
    val d = docs(1L -> "a b c d e", 2L -> "a b c d e")
    val sets = Dedup.shingleSets(d, "doc_id", "text", 3)
    val sigs = sets.select(col("doc_id"), Dedup.portableMinhash(col("shingles"), 0).as("mh"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("mh")).toMap
    assert(sigs(1L) == sigs(2L) && sigs(1L).length == 16)
  }

  test("jaccardPairsExact equals brute-force all-pairs on a randomized corpus") {
    // deterministic pseudo-random corpus with seeded exact copies, edits of
    // one/two trailing words (J = (n-2)/n and lower), and unrelated docs —
    // pairs land on both sides of the 0.8 threshold
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val base = (1L to 30L).map { id =>
      id -> (0 until 22).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val variants = base.take(8).map { case (id, t) =>
      val words = t.split(" ")
      (id + 100, (words.dropRight(1) :+ "omega").mkString(" "))
    }
    val copies = base.slice(8, 12).map { case (id, t) => (id + 200, t) }
    val d = docs((base ++ variants ++ copies): _*)

    val out = Dedup.jaccardPairsExact(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val sets = Dedup.shingleSets(d, "doc_id", "text", 3)
    val expected = sets.as("x").crossJoin(sets.as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        size(array_intersect(col("x.shingles"), col("y.shingles"))).cast("long").as("n_common"),
        size(array_union(col("x.shingles"), col("y.shingles"))).cast("long").as("n_union"))
      .filter(col("n_common") * 5 >= col("n_union") * 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    assert(expected.nonEmpty, "test corpus seeded no above-threshold pairs")
    assert(out == expected)
  }

  test("containmentPairsExact equals brute-force all-pairs and catches what Jaccard misses") {
    // long base docs + short excerpts (first 8 words): containment(excerpt
    // -> source) = 1.0 while Jaccard is ~6/20 — structurally invisible to
    // the symmetric operator
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val base = (1L to 20L).map { id =>
      id -> (0 until 22).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val excerpts = base.take(6).map { case (id, t) =>
      (id + 100, t.split(" ").take(8).mkString(" "))
    }
    val d = docs((base ++ excerpts): _*)
    val sets = Dedup.shingleSets(d, "doc_id", "text", 3)

    val out = Dedup.containmentPairsExact(sets, 9, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val expected = sets.as("x").crossJoin(sets.as("y"))
      .filter(col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        size(array_intersect(col("x.shingles"), col("y.shingles"))).cast("long").as("n_common"),
        size(col("x.shingles")).cast("long").as("sz_a"))
      .filter(col("n_common") * 10 >= col("sz_a") * 9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    assert(expected.nonEmpty, "test corpus seeded no containment pairs")
    assert(out == expected)
    // every seeded excerpt edge surfaced, and none survives a 4/5 JACCARD check
    val jacc = Dedup.jaccardPairsExact(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    excerpts.foreach { case (eid, _) =>
      assert(out.exists(p => p._1 == eid && p._2 == eid - 100))
      assert(!jacc.contains((eid - 100, eid)) && !jacc.contains((eid, eid - 100)))
    }
  }

  test("containment candidate budget: recall-preserving when it passes, loud on duplication") {
    val rnd = new scala.util.Random(17)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val base = (1L to 20L).map { id =>
      id -> (0 until 22).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val sets = Dedup.shingleSets(docs(base: _*), "doc_id", "text", 3)
    // guard on vs guard off over a healthy (distinct-content) corpus:
    // identical output — the budget drops nothing, ever
    val off = Dedup.containmentPairsExact(sets, 9, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val on = Dedup.containmentPairsExact(sets, 9, 10, maxCandidateFactor = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(on == off)

    // pathological duplicate multiplicity: 100 literal copies of each doc
    // (the ScaleBench replication pattern, deeper) — est grows ~m× the
    // base ratio (~0.15× postings here), crossing the factor-8 budget
    // around m ≈ 55; the guard must refuse, naming the ladder mitigation
    val dup = base.flatMap { case (id, t) =>
      (0 until 100).map(r => (id + 1000L * r, t))
    }
    val dupSets = Dedup.shingleSets(docs(dup: _*), "doc_id", "text", 3)
    val e = intercept[IllegalArgumentException] {
      Dedup.containmentPairsExact(dupSets, 9, 10, maxCandidateFactor = 8).count()
    }
    assert(e.getMessage.contains("exact-dedup rung first") ||
      e.getMessage.contains("exactClusters"))
    // and the named mitigation actually clears the same budget: collapse
    // exact copies, rerun guarded — completes, output equals the
    // distinct-content result
    val keepers = Dedup.exactClusters(docs(dup: _*), "doc_id", "text")
      .select(col("keeper_id").as("doc_id"))
    val survivors = docs(dup: _*).join(keepers, Seq("doc_id"), "left_semi")
    val ladder = Dedup.containmentPairsExact(
      Dedup.shingleSets(survivors, "doc_id", "text", 3), 9, 10,
      maxCandidateFactor = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ladder == off)
  }

  test("jaccardPairsExact stays exact on a deliberately skewed corpus (hot shared shingles)") {
    // every doc shares the same hot 6-word prefix (one shingle posting list
    // holds the ENTIRE corpus — the worst skew the index join can see),
    // with distinct tails; plus seeded exact copies that must all surface
    val hot = "the quick brown fox jumps over"
    val tails = Vector("alpha beta gamma", "delta epsilon zeta", "eta theta iota",
      "kappa lambda mu", "nu xi omicron", "pi rho sigma")
    val base = (1L to 24L).map(id => id -> s"$hot ${tails((id % 6).toInt)} t$id")
    val copies = (1L to 8L).map(id => (id + 100) -> base(id.toInt - 1)._2)
    val d = docs((base ++ copies): _*)

    val out = Dedup.jaccardPairsExact(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val sets = Dedup.shingleSets(d, "doc_id", "text", 3)
    val expected = sets.as("x").crossJoin(sets.as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .filter(size(array_intersect(col("x.shingles"), col("y.shingles"))) * 5 >=
        size(array_union(col("x.shingles"), col("y.shingles"))) * 4)
      .select(col("x.doc_id"), col("y.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(expected.size == 8, s"expected exactly the 8 seeded copies, got $expected")
    assert(out == expected)
  }

  test("incrementalExactDedup drops cross-batch and in-batch duplicates via the fp table") {
    val fpTable = java.nio.file.Files.createTempDirectory("graft-fp").toString + "/fps"
    val b1 = docs(1L -> "alpha beta", 2L -> "gamma delta", 3L -> "alpha beta")
    val s1 = Dedup.incrementalExactDedup(spark, b1, "doc_id", "text", fpTable)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(s1 == Seq(1L, 2L)) // in-batch dup 3 collapsed to min id 1
    // batch 2: one repeat of history, one new
    val b2 = docs(10L -> "gamma delta", 11L -> "epsilon zeta")
    val s2 = Dedup.incrementalExactDedup(spark, b2, "doc_id", "text", fpTable)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(s2 == Seq(11L))
    // re-ingesting batch 2 is a no-op
    assert(Dedup.incrementalExactDedup(spark, b2, "doc_id", "text", fpTable).count() == 0)
    assert(spark.read.parquet(fpTable).count() == 3) // fp history stays unique
  }

  test("AQE splits a skewed shingle-index join when thresholds are crossed") {
    // lower the AQE skew thresholds so the hot posting list (every doc
    // shares one shingle) crosses them at test scale, then check the FINAL
    // adaptive plan marked the sort-merge join skewed
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val hot = (1 to 300).map(i => s"the quick brown fox jumps tail$i word$i more$i")
      val d = docs(hot.zipWithIndex.map { case (t, i) => (i + 1).toLong -> t }: _*)
      val sets = Dedup.shingleSets(d, "doc_id", "text", 3)
      val inv = sets.select(col("doc_id"), explode(col("shingles")).as("sh"))
      val joined = inv.as("a").join(inv.as("b"), "sh")
        .filter(col("a.doc_id") < col("b.doc_id"))
        .groupBy().count() // aggregate so the materialized result stays tiny
      joined.collect() // materialize THIS queryExecution: AQE finalizes its plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"plan not finalized:\n$plan")
      assert(plan.contains("skew=true"), s"skew join did not activate:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("band budget: duplicate multiplicity refuses loudly, a clean corpus passes (minhash)") {
    // 40 literal copies of one text: every band bucket holds 40 rows,
    // C(40,2)·16 = 12,480 candidates > 8 × 640 postings — the exact
    // regime enforceBandBudget exists for
    val dupHeavy = docs((1L to 40L).map(i => i -> "alpha beta gamma delta epsilon"): _*)
    val e = intercept[IllegalArgumentException] {
      Dedup.nearDupPairs(dupHeavy, "doc_id", "text", maxCandidateFactor = 8).collect()
    }
    assert(e.getMessage.contains("exactClusters") && e.getMessage.contains("minhash near-dup"))
    // distinct texts: candidates ≈ 0, same factor passes and computes
    val clean = docs((1L to 40L).map(i =>
      i -> s"w${i}a w${i}b w${i}c w${i}d w${i}e"): _*)
    assert(Dedup.nearDupPairs(clean, "doc_id", "text", maxCandidateFactor = 8)
      .collect().isEmpty)
  }

  test("band budget: simhash surface wires the same guard") {
    val dupHeavy = docs((1L to 40L).map(i => i -> "alpha beta gamma delta epsilon"): _*)
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(dupHeavy, "doc_id", "text", maxCandidateFactor = 8).collect()
    }
    assert(e.getMessage.contains("simhash near-dup"))
    val clean = docs((1L to 40L).map(i =>
      i -> s"w${i}a w${i}b w${i}c w${i}d w${i}e"): _*)
    // near-uniform signatures: passes the budget (result content is
    // covered by the q40 oracle; here only the guard wiring is pinned)
    Dedup.simhashNearDupPairs(clean, "doc_id", "text", maxCandidateFactor = 8).collect()
  }

  test("jaccardPairsExact candidate join is an equi-join on the shingle, never all-pairs") {
    val d = docs(1L -> "a b c d e f", 2L -> "a b c d e f", 3L -> "x y z w v u")
    val out = Dedup.jaccardPairsExact(d, "doc_id", "text")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs plan detected:\n$plan")
    val rows = out.collect()
    assert(rows.length == 1 &&
      rows.head.getLong(0) == 1L && rows.head.getLong(1) == 2L)
  }

  private def pars(rows: (Long, Int, String)*) =
    rows.toDF("doc_id", "pos", "text")

  test("paragraphDedup keeps each distinct paragraph's FIRST (doc, pos) occurrence only") {
    val p = pars(
      (1L, 0, "nav bar"), (1L, 1, "unique alpha"), (1L, 2, "footer"),
      (2L, 0, "nav bar"), (2L, 1, "unique beta"), (2L, 2, "footer"),
      (3L, 0, "nav bar"), (3L, 1, "unique alpha"), (3L, 2, "footer"))
    val out = Dedup.paragraphDedup(p).orderBy("doc_id").collect()
    // doc 1 wins everything it touches first
    assert(out(0).getAs[Long]("n_pars") == 3 && out(0).getAs[Long]("n_kept") == 3)
    assert(out(0).getAs[String]("clean_text") == "nav bar unique alpha footer")
    // doc 2 keeps only its unique paragraph
    assert(out(1).getAs[Long]("n_kept") == 1)
    assert(out(1).getAs[String]("clean_text") == "unique beta")
    // doc 3 is a whole-page duplicate: EVERY paragraph lost to earlier copies
    assert(out(2).getAs[Long]("n_kept") == 0)
    assert(out(2).getAs[String]("clean_text") == "")
  }

  test("paragraphDedup first-occurrence tiebreak is (doc_id, pos), and reassembly is pos order") {
    val p = pars(
      (5L, 3, "dup"), (5L, 1, "zz tail"), (5L, 0, "aa head"),
      (4L, 7, "dup"))
    val out = Dedup.paragraphDedup(p).orderBy("doc_id").collect()
    // doc 4 has the smaller doc_id: its pos-7 copy of "dup" wins
    assert(out(0).getAs[Long]("doc_id") == 4L && out(0).getAs[Long]("n_kept") == 1)
    val d5 = out(1)
    assert(d5.getAs[Long]("n_pars") == 3 && d5.getAs[Long]("n_kept") == 2)
    // document order, not insertion order
    assert(d5.getAs[String]("clean_text") == "aa head zz tail")
  }

  test("paragraphDedupAgainst screens the batch against the history hash set only") {
    val hist = pars((1L, 0, "nav bar"), (1L, 1, "old content"), (2L, 0, "nav bar"))
    val batch = pars(
      (10L, 0, "nav bar"), (10L, 1, "fresh stuff"),
      (11L, 0, "old content"), (11L, 1, "nav bar"), (11L, 2, "also fresh"))
    val out = Dedup.paragraphDedupAgainst(batch, hist).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_pars") == 2 && out(0).getAs[Long]("n_dup_hist") == 1 &&
      out(0).getAs[Long]("n_new") == 1)
    assert(out(1).getAs[Long]("n_pars") == 3 && out(1).getAs[Long]("n_dup_hist") == 2 &&
      out(1).getAs[Long]("n_new") == 1)
    // in-batch repetition is NOT history: a batch-only dup counts as new
    val b2 = pars((20L, 0, "batch only"), (21L, 0, "batch only"))
    val out2 = Dedup.paragraphDedupAgainst(b2, hist).collect()
    assert(out2.forall(r => r.getAs[Long]("n_dup_hist") == 0))
  }

  test("paragraphDedup is one hash groupBy + one hash join — never doc×doc") {
    val p = pars((1L, 0, "x x"), (2L, 0, "x x"), (3L, 0, "y y"))
    val plan = Dedup.paragraphDedup(p).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression net for the r7-r9 "parsed": null defect: the bench's
  * stdout metric line must fit the consumer's 2000-byte stdout tail
  * (which also holds the runner's trailing "[success] ..." line), stay
  * valid JSON, and keep carrying every headline query — median AND min
  * (the round-11 driver box had per-query IQRs of 5-48 s; a median-only
  * line invites false regression reads) — for the FULL registry, not a
  * toy subset. */
class BenchLineSpec extends AnyFunSuite {

  private def fakeResults: Seq[(String, Double, Double, Boolean)] =
    SparkEntry.queries.keys.toSeq.sorted.zipWithIndex.map { case (n, i) =>
      // worst-case widths: double-digit seconds with full 3-decimal tails
      (n, 10.0 + (i % 90) + 0.999, 10.0 + (i % 90) + 0.111, true)
    }

  test("metric line fits the 2000-byte parser window with slack") {
    val line = Bench.metricLine(fakeResults, reps = 3, sfDir = "/root/testdata/sf0.1")
    // window arithmetic: the driver keeps the LAST 2000 stdout bytes and
    // that tail also holds the runner's trailing line ("[success] Total
    // time: NNN s (MM:SS), completed <date>" ≈ 70 bytes + newlines). The
    // r16 widening (mins for the slowest-10 too) spent the old 200-byte
    // slack; mins at 2 decimals + dropping the constant detail field
    // bought it back to ≥ 120 bytes of trailing headroom.
    assert(line.length < 1880, s"metric line ${line.length} bytes — too close to the 2000-byte stdout tail")
  }

  test("metric line is one line of well-formed JSON with the contract fields") {
    val line = Bench.metricLine(fakeResults, reps = 3, sfDir = "/x")
    assert(!line.contains("\n"))
    // no JSON lib on the main classpath: structural checks + a paren walk
    assert(line.startsWith("{") && line.endsWith("}"))
    Seq("\"metric\":", "\"value\":", "\"unit\":\"sec\"", "\"queries\":{",
      "\"queries_min\":{", "\"failed\":[", "\"sf\":").foreach(f => assert(line.contains(f), f))
    val depth = line.foldLeft(0) {
      case (d, '{') => d + 1
      case (d, '}') => d - 1
      case (d, _) => d
    }
    assert(depth == 0)
  }

  test("every headline query rides the line with median AND min; failures land in failed") {
    val withFailure = fakeResults.map {
      case (n, _, _, _) if n == "q153_link_predict" => (n, -1.0, -1.0, false)
      case r => r
    }
    val line = Bench.metricLine(withFailure, reps = 3, sfDir = "/x")
    Bench.Headline.filterNot(_ == "q153_link_predict").foreach { q =>
      // the name must appear twice: once in queries (median), once in
      // queries_min
      assert(line.sliding(q.length + 3).count(_ == s""""$q":""") == 2, q)
    }
    assert(line.contains(""""failed":["q153_link_predict"]"""))
    assert(!line.contains(""""q153_link_predict":-1"""))
  }

  test("the slowest-10 ride the line with median AND min (r16 verdict #1a)") {
    val line = Bench.metricLine(fakeResults, reps = 3, sfDir = "/x")
    // reconstruct the slowest-10 the same way metricLine picks them
    val slowest = fakeResults.filter(_._4).filterNot(r => Bench.Headline(r._1))
      .sortBy(-_._2).take(10).map(_._1)
    assert(slowest.size == 10)
    slowest.foreach { q =>
      assert(line.sliding(q.length + 3).count(_ == s""""$q":""") == 2,
        s"$q must carry median AND min")
    }
  }

  test("headline names all exist in the registry") {
    val missing = Bench.Headline -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"stale headline names: $missing")
  }
}

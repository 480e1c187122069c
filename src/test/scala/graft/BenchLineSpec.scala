package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression net for the r7-r9 "parsed": null defect: the bench's
  * stdout metric line must fit the consumer's 2000-byte stdout tail
  * (which also holds the runner's trailing "[success] ..." line), stay
  * valid JSON, and keep carrying every headline query — for the FULL
  * registry, not a toy subset. */
class BenchLineSpec extends AnyFunSuite {

  private def fakeResults: Seq[(String, Double, Boolean)] =
    SparkEntry.queries.keys.toSeq.sorted.zipWithIndex.map { case (n, i) =>
      // worst-case widths: double-digit seconds with full 3-decimal tails
      (n, 10.0 + (i % 90) + 0.999, true)
    }

  test("metric line fits the 2000-byte parser window with slack") {
    val line = Bench.metricLine(fakeResults, reps = 3, sfDir = "/root/testdata/sf0.1")
    assert(line.length < 1800, s"metric line ${line.length} bytes — too close to the 2000-byte stdout tail")
  }

  test("metric line is one line of well-formed JSON with the contract fields") {
    val line = Bench.metricLine(fakeResults, reps = 3, sfDir = "/x")
    assert(!line.contains("\n"))
    // no JSON lib on the main classpath: structural checks + a paren walk
    assert(line.startsWith("{") && line.endsWith("}"))
    Seq("\"metric\":", "\"value\":", "\"unit\":\"sec\"", "\"queries\":{",
      "\"failed\":[", "\"sf\":").foreach(f => assert(line.contains(f), f))
    val depth = line.foldLeft(0) {
      case (d, '{') => d + 1
      case (d, '}') => d - 1
      case (d, _) => d
    }
    assert(depth == 0)
  }

  test("every headline query rides the line; failures land in failed, not queries") {
    val withFailure = fakeResults.map {
      case (n, v, _) if n == "q153_link_predict" => (n, -1.0, false)
      case r => r
    }
    val line = Bench.metricLine(withFailure, reps = 3, sfDir = "/x")
    Bench.Headline.filterNot(_ == "q153_link_predict").foreach { q =>
      assert(line.contains(s""""$q":"""), q)
    }
    assert(line.contains(""""failed":["q153_link_predict"]"""))
    assert(!line.contains(""""q153_link_predict":-1"""))
  }

  test("headline names all exist in the registry") {
    val missing = Bench.Headline -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"stale headline names: $missing")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract net: every registered query must carry an oracle
  * (the correctness gate is only as wide as this pairing), names must be
  * well-formed, and — the silent killer — no two query objects may claim
  * the same key, because `Map ++` SHADOWS earlier entries without any
  * error: a duplicated name would quietly replace one query's oracle
  * with another's and the loser would vanish from the gate. */
class RegistrySpec extends AnyFunSuite {

  private val parts: Seq[(String, Map[String, _], Map[String, String])] = Seq(
    ("Relational", graft.queries.Relational.queries, graft.queries.Relational.oracles),
    ("PipelineQueries", graft.queries.PipelineQueries.queries, graft.queries.PipelineQueries.oracles),
    ("LlmQueries", graft.queries.LlmQueries.queries, graft.queries.LlmQueries.oracles),
    ("StreamingQueries", graft.queries.StreamingQueries.queries, graft.queries.StreamingQueries.oracles),
    ("StarQueries", graft.queries.StarQueries.queries, graft.queries.StarQueries.oracles),
    ("CorpusQueries", graft.queries.CorpusQueries.queries, graft.queries.CorpusQueries.oracles),
    ("WebCorpusQueries", graft.queries.WebCorpusQueries.queries, graft.queries.WebCorpusQueries.oracles),
    ("ScaleQueries", graft.queries.ScaleQueries.queries, graft.queries.ScaleQueries.oracles),
    ("AnalyticsQueries", graft.queries.AnalyticsQueries.queries, graft.queries.AnalyticsQueries.oracles),
    ("CurationQueries", graft.queries.CurationQueries.queries, graft.queries.CurationQueries.oracles))

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries with NO oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles with NO query: ${(o -- q).toSeq.sorted}")
  }

  test("no query name is claimed by two registry objects (Map ++ shadows silently)") {
    val claims = parts.flatMap { case (owner, qs, _) => qs.keys.map(_ -> owner) }
    val dup = claims.groupBy(_._1).filter(_._2.size > 1)
    assert(dup.isEmpty,
      s"names claimed twice: ${dup.map { case (n, os) => s"$n by ${os.map(_._2).mkString("+")}" }}")
    assert(claims.size == SparkEntry.queries.size)
    val oclaims = parts.flatMap { case (owner, _, os) => os.keys.map(_ -> owner) }
    val odup = oclaims.groupBy(_._1).filter(_._2.size > 1)
    assert(odup.isEmpty,
      s"oracles claimed twice: ${odup.map { case (n, os) => s"$n by ${os.map(_._2).mkString("+")}" }}")
  }

  test("names are well-formed and oracles are non-empty SQL") {
    SparkEntry.queries.keys.foreach { n =>
      assert(n.matches("q\\d+_[a-z0-9_]+"), s"bad query name: $n")
    }
    SparkEntry.oracleSql.foreach { case (n, sql) =>
      assert(sql.trim.nonEmpty && sql.toUpperCase.contains("SELECT"), s"suspicious oracle for $n")
    }
  }
}

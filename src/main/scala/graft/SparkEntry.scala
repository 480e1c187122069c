package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The role-playing five-table join (SURVEY.md §2.4 J3) exercises scan,
    * broadcast joins, shuffle join, and grouped aggregation in one plan. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q05RoleplayJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.LlmQueries.queries ++
      graft.queries.StreamingQueries.queries ++
      graft.queries.StarQueries.queries ++
      graft.queries.CorpusQueries.queries ++
      graft.queries.WebCorpusQueries.queries ++
      graft.queries.ScaleQueries.queries ++
      graft.queries.AnalyticsQueries.queries ++
      graft.queries.CurationQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.PipelineQueries.oracles ++
      graft.queries.LlmQueries.oracles ++
      graft.queries.StreamingQueries.oracles ++
      graft.queries.StarQueries.oracles ++
      graft.queries.CorpusQueries.oracles ++
      graft.queries.WebCorpusQueries.oracles ++
      graft.queries.ScaleQueries.oracles ++
      graft.queries.AnalyticsQueries.oracles ++
      graft.queries.CurationQueries.oracles
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator query; `oracleSql` holds
  * the DuckDB twin for each (omitted only for ops not expressible in SQL,
  * which the driver downgrades to a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.CoreQueries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.all ++ graft.queries.TimeQueries.all ++
      graft.queries.TextQueries.all ++ graft.queries.EmbeddingQueries.all ++
      graft.queries.PipelineQueries.all ++ graft.queries.RefPipelineQueries.all ++
      graft.queries.SessionQueries.all ++ graft.queries.CoverageQueries.all ++
      graft.queries.CorpusPrepQueries.all ++ graft.queries.StorageQueries.all ++
      graft.queries.CurationQueries.all ++ graft.queries.GraphQueries.all ++
      graft.queries.RetrievalQueries.all ++ graft.queries.FileStreamQueries.all ++
      graft.queries.MiningQueries.all ++ graft.queries.ReductionQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.sql ++ graft.queries.TimeQueries.sql ++
      graft.queries.TextQueries.sql ++ graft.queries.EmbeddingQueries.sql ++
      graft.queries.PipelineQueries.sql ++ graft.queries.SessionQueries.sql ++
      graft.queries.CoverageQueries.sql ++ graft.queries.RefPipelineQueries.sql ++
      graft.queries.CorpusPrepQueries.sql ++ graft.queries.StorageQueries.sql ++
      graft.queries.CurationQueries.sql ++ graft.queries.GraphQueries.sql ++
      graft.queries.RetrievalQueries.sql ++ graft.queries.FileStreamQueries.sql ++
      graft.queries.MiningQueries.sql ++ graft.queries.ReductionQueries.sql
}

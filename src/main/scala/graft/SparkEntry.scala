package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-module inventories (SURVEY.md §2);
  * `oracleSql` carries the DuckDB twin for every SQL-expressible query.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The reference's core operation: regex route fanout over the
    * event stream via broadcast join. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Events.evtRoute(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.all ++ graft.queries.Events.all ++
      graft.queries.Docs.all ++ graft.queries.Scoring.all ++
      graft.queries.Tokenize.all ++
      graft.queries.Embeddings.all ++ graft.queries.Mm.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.Events.oracles ++
      graft.queries.Docs.oracles ++ graft.queries.Scoring.oracles ++
      graft.queries.Tokenize.oracles ++
      graft.queries.Embeddings.oracles ++ graft.queries.Mm.oracles
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps each operator key from SURVEY.md §2B to a
  * `(SparkSession, fixtureDir) => DataFrame`; `oracleSql` holds the
  * equivalent DuckDB SQL for the driver's hash-compare. Column names
  * and row order are pinned identical on both sides (rules D1–D6).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_group")(spark, "/root/testdata/sf0.001")

  import graft.queries._

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Scans.queries ++ Joins.queries ++ Aggregates.queries ++
      Windows.queries ++ SetSortOps.queries ++ Scalars.queries ++
      TextOps.queries ++ Similarity.queries ++ Streaming.queries ++
      DynamoQueries.queries ++ Dedup.queries ++ TextAnalysis.queries ++
      Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Scans.oracle ++ Joins.oracle ++ Aggregates.oracle ++
      Windows.oracle ++ SetSortOps.oracle ++ Scalars.oracle ++
      TextOps.oracle ++ Similarity.oracle ++ Streaming.oracle ++
      DynamoQueries.oracle ++ Dedup.oracle ++ TextAnalysis.oracle ++
      Multimodal.oracle
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's declared query:
  *  - SURVEY.md §2.D set (G1-G6, R1-R10, X1-X2)    → graft.queries.Declared
  *  - training-data pipeline ops (dedup/text/sim)   → graft.pipeline.*
  *  - graph-API traversals through GraphSession     → graft.graph.*
  */
object SparkEntry {

  private def registry: Seq[graft.queries.Declared.Q] =
    graft.queries.Declared.all ++ pipeline.PipelineQueries.all ++
      graph.GraphQueries.all ++ analytics.AnalyticsQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Declared.all
      .find(_.name == "r10_multiway_join_agg").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

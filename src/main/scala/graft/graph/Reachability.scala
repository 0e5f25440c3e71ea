package graft.graph

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Reachability from a seed set — the engine analog of the reference's BFS
  * (serialize/getStats both walk the root-reachable closure,
  * /root/reference/library/GraphDB/Graph.hs:82-118,145-195).
  *
  * Implemented as an iterative frontier-expansion join over the `edges`
  * DataFrame, localCheckpoint-ing per level so the plan stays flat. Each
  * level is one shuffle-free-ish job when `edges` is partitioned by `src`
  * (frontier is broadcast when small — the common case). This is the same
  * dataflow Pregel runs; for graphs with huge diameter a GraphX Pregel
  * variant is available in graft.analytics.
  */
object Reachability {

  private val idSchema = StructType(Seq(StructField("id", LongType, nullable = false)))

  /** DataFrame(id) of every node reachable from `seeds` (inclusive). */
  def reachable(edges: DataFrame, seeds: Seq[Long]): DataFrame = {
    val spark = edges.sparkSession
    var visited = spark.createDataFrame(
      spark.sparkContext.parallelize(seeds.distinct.map(Row(_)), 1), idSchema)
      .localCheckpoint(true)
    var frontier = visited
    var frontierSize = seeds.distinct.size.toLong
    while (frontierSize > 0) {
      // broadcast only while the frontier is actually small — a BFS level
      // that fans out to hundreds of millions of ids must shuffle-join, or
      // the broadcast build side OOMs the driver/executors
      val fr =
        if (frontierSize <= 5_000_000L) broadcast(frontier) else frontier
      val next = edges
        .join(fr, edges("src") === fr("id"), "left_semi")
        .select(col("dst").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
        .localCheckpoint(true)
      frontierSize = next.count()
      if (frontierSize > 0) {
        // r19: no per-level eager checkpoint of the union — `visited` is
        // only ever a union of already-checkpointed frontiers (each
        // `next` is materialized for its count), so lineage stays flat
        // without one extra eager job per level; rows identical
        visited = visited.unionByName(next)
        frontier = next
      }
    }
    visited
  }
}

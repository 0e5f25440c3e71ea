package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** One-off diagnosis: does the probed-cells serve ACTUALLY prune the
  * cells scan at runtime (numFiles < total, staticFilesNum present), or
  * does the static plan's dynamicpruning expression silently degrade to
  * a full scan? Prints the scan metrics and the final adaptive plan
  * fragment under several configs.
  *
  * Usage: runMain graft.tools.DppProbe <indexDir> [reuseOnly=true|false]
  *                                     [op=float|quantized|adc|adc_rerank]
  */
object DppProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reuseOnly = if (args.length > 1) args(1) else "true"
    val op = if (args.length > 2) args(2) else "float"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
        reuseOnly)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (1 << 20).toString) // bounded TopKEntries buffers (r18) — see Bench
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val idx = Similarity.loadTwoLevelIndex(spark, dir)
    val queries = idx.cells.select(col("nbr").as("vec_id"), col("cv").as("embedding"))
      .orderBy("vec_id").limit(1).localCheckpoint(true)
    val served = op match {
      case "float" => Similarity.twoLevelTopKFromIndex(idx, queries,
        "vec_id", "embedding", k = 10)
      case "quantized" => Similarity.quantizedTopKFromIndex(spark, dir,
        queries, "vec_id", "embedding", k = 10)
      case "adc" => Similarity.pqAdcTopKFromIndex(spark, dir, queries,
        "vec_id", "embedding", k = 10)
      case "adc_rerank" => Similarity.pqAdcTopKFromIndex(spark, dir, queries,
        "vec_id", "embedding", k = 10, rerank = 25)
      case other => throw new IllegalArgumentException(s"unknown op $other")
    }
    served.collect()

    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => q +: allNodes(q.plan)
      case r: ReusedExchangeExec => r +: allNodes(r.child)
      case other => other +: other.children.flatMap(allNodes)
    }
    allNodes(served.queryExecution.executedPlan).collect {
      case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("/cells")) =>
        println(s"[dpp] scan partitionFilters: ${s.partitionFilters}")
        s.metrics.toSeq.sortBy(_._1).foreach { case (k, m) =>
          println(s"[dpp]   metric $k = ${m.value}")
        }
    }
    println("[dpp] ---- final plan ----")
    println(served.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Scan parquet") || l.contains("dynamicpruning") ||
        l.contains("SubqueryBroadcast") || l.contains("Join"))
      .mkString("\n"))
    spark.stop()
  }
}

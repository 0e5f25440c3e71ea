package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the pre-training batching primitive: documents are
  * concatenated in a deterministic order and cut into fixed token-budget
  * windows; a document's bin is the window its FIRST token falls in
  * (start-offset assignment — the bin-id analog of packed-sequence
  * chunking; a document longer than the budget spans windows, so
  * downstream bin ids need not be contiguous).
  *
  * Scale design: packing is inherently sequential per stream (a running
  * token sum), so the operator shards each language into `shards`
  * deterministic streams (`id % shards`) and packs each stream
  * independently — parallelism = |langs| × shards regardless of corpus
  * size, the same two-phase reasoning as the px15 vocabulary top-k (a
  * window partitioned by language alone would put an entire language's
  * running sum on one task). The per-stream running sum itself is one
  * window function — Spark executes it as a sort within each shard
  * partition, and at 100 TB you raise `shards` so each stream fits a
  * task comfortably. Everything is integer arithmetic over ids and token
  * counts — deterministic, and replayable in any SQL engine (px20's
  * DuckDB oracle recomputes it verbatim).
  */
object Packing {

  /** Per-document bin assignment: (idCol, langCol, shard, n_tokens, bin).
    * `budget` = window size in tokens; `shards` = parallel streams per
    * language.
    */
  def packBins(df: DataFrame, idCol: String, langCol: String,
      textCol: String, budget: Int, shards: Int): DataFrame = {
    val w = Window.partitionBy(col(langCol), col("shard")).orderBy(col(idCol))
    df.select(col(idCol), col(langCol),
        pmod(col(idCol), lit(shards.toLong)).as("shard"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("_start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("bin", floor(col("_start") / budget))
      .drop("_start")
  }

  /** Aggregated view per (lang, shard, bin): document and token counts —
    * the shape a packing-efficiency audit reads (fill ratio = n_tokens /
    * budget for all but each stream's final bin).
    */
  def binStats(df: DataFrame, idCol: String, langCol: String,
      textCol: String, budget: Int, shards: Int): DataFrame =
    packBins(df, idCol, langCol, textCol, budget, shards)
      .groupBy(col(langCol), col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.graph.{GraphModel, GraphState}

/** Streaming ingestion of a graph op-log — the Structured-Streaming form of
  * the reference's buffered async WAL apply
  * (/root/reference/library/GraphDB/Persistent.hs:108-117, IOQueue.hs:20-48):
  * op batches land as parquet under `<store>/N.events/batch-K/` (see
  * graft.store.GraphStore) and a follower session folds them into its own
  * GraphState via `foreachBatch`. `PersistenceBuffering` (the reference's
  * bounded queue of pending txns) maps to the micro-batch trigger interval
  * + `maxFilesPerTrigger`.
  */
object OplogStream {

  /** Tail a store's op-log as a stream of op rows (schema shared with the
    * writer — graft.store.GraphStore.opSchema).
    */
  def readOps(spark: SparkSession, model: GraphModel[_], storeDir: String,
      maxFilesPerTrigger: Int = 32): DataFrame =
    spark.readStream.schema(graft.store.GraphStore.opSchema(model))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(s"$storeDir/*.events/batch-*")

  /** Fold op batches into a follower GraphState set-wise (no per-op driver
    * loop: each micro-batch applies new nodes / edges / removals as whole
    * DataFrames). Follower state is eventually consistent with the writer.
    *
    * `trigger` defaults to AvailableNow (catch-up-and-stop — the test and
    * bootstrap shape); pass `Trigger.ProcessingTime(...)` to TAIL a live
    * writer continuously. Follower state lives in this process, so a
    * restart re-tails from the WAL start regardless of `checkpointDir`
    * (which only makes source offsets durable) — long-lived followers
    * should bootstrap from the writer's latest checkpoint instead.
    */
  def follow[V](spark: SparkSession, model: GraphModel[V], storeDir: String,
      onBatch: GraphState[V] => Unit,
      trigger: Trigger = Trigger.AvailableNow(),
      checkpointDir: Option[String] = None): StreamingQuery = {
    var state = GraphState.empty(spark, model)
    val writer = readOps(spark, model, storeDir).writeStream
      .trigger(trigger)
      .outputMode("append")
    checkpointDir.foreach(c => writer.option("checkpointLocation", c))
    writer
      .foreachBatch { (batch: DataFrame, _: Long) =>
        state = applyOpBatch(model, state, admitCommitted(batch))
        onBatch(state)
      }
      .start()
  }

  /** Admit only rows from batch dirs carrying Spark's `_SUCCESS` commit
    * marker. The writer publishes batches with an atomic directory rename
    * (graft.store.GraphStore.writeWalBatch), so with a current-format store
    * this filter never drops anything — it is defense against legacy or
    * tampered stores where a torn batch dir (no marker) could otherwise be
    * applied by the follower and then dropped by the writer's crash
    * recovery (phantom ops). Rows dropped here are dropped PERMANENTLY for
    * this follower (the file source has marked their files seen) — exactly
    * the recovery semantics: an unmarked batch was never acknowledged.
    */
  private[streaming] def admitCommitted(batch: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    val withPath = batch.withColumn("_path", input_file_name())
    // distinct file paths are bounded by maxFilesPerTrigger — driver-sized
    val torn = withPath.select("_path").distinct().collect()
      .map(_.getString(0))
      .filter(p => !java.nio.file.Files.exists(
        uriToPath(p).getParent.resolve("_SUCCESS")))
    if (torn.isEmpty) batch
    else withPath.where(!col("_path").isin(torn.toIndexedSeq: _*)).drop("_path")
  }

  /** Decode a file-source URI (`input_file_name()` output — percent-
    * encoded) to a local filesystem path. Every `_SUCCESS` gate must go
    * through this: a naive `stripPrefix("file:")` breaks on paths with a
    * space, '%', or non-ASCII char, silently classifying every committed
    * batch as torn — and torn rows are dropped PERMANENTLY (the file
    * source marks them seen), so a follower would serve stale data
    * forever.
    */
  private[graft] def uriToPath(uri: String): java.nio.file.Path =
    java.nio.file.Paths.get(java.net.URI.create(uri).getPath)

  /** Apply one op-batch DataFrame, preserving total op order (seq).
    *
    * Scale note (honest limit): run-boundary detection needs the ops in
    * order, so the batch is collected to the driver — bounded by
    * `maxOpsPerApply`. This matches the write path (GraphSession ops are
    * driver-issued), and micro-batch size is already capped by
    * `maxFilesPerTrigger`. A bulk-ingest follower that must stay fully
    * distributed should instead re-run `GraphState.bulkLoad` over the
    * writer's checkpoint — the WAL follower is for incremental tailing.
    */
  def applyOpBatch[V](model: GraphModel[V], state: GraphState[V],
      batch: DataFrame, maxOpsPerApply: Int = 1 << 22): GraphState[V] = {
    import org.apache.spark.sql.functions._
    val rows = batch.orderBy("seq").limit(maxOpsPerApply + 1).collect()
    require(rows.length <= maxOpsPerApply,
      s"op batch exceeds $maxOpsPerApply rows; lower maxFilesPerTrigger or " +
        "bootstrap the follower from a checkpoint instead")
    // batches are small per-commit; group consecutive same-op runs exactly
    // like GraphSession.applied()
    var st = state
    var run = List.empty[org.apache.spark.sql.Row]
    def flush(): Unit = if (run.nonEmpty) {
      val rs = run.reverse
      rs.head.getString(1) match {
        case "new" => st = st.withNewNodes(rs.map(r =>
          (r.getLong(2), model.fromValueRow(r.getString(5), r.getStruct(6)))))
        case "set" =>
          // keep-last by id, mirroring GraphSession.applied(): the writer's
          // WAL logs EVERY SetValue (only state is deduped), so a run can
          // carry several sets of one id — replaying all of them through
          // withValues would union duplicate node rows after the anti-join
          st = st.withValues(graft.graph.GraphOp.keepLastById(
            rs.map(r => (r.getLong(2),
              model.fromValueRow(r.getString(5), r.getStruct(6))))))
        case "add" => st = st.withTargets(rs.map(r => (r.getLong(3), r.getLong(4))))
        case "rmt" => st = st.withoutTargets(rs.map(r => (r.getLong(3), r.getLong(4))))
        case "rm" => st = st.withoutNodes(rs.map(_.getLong(2)))
      }
      st = st.checkpointed()
      run = Nil
    }
    rows.foreach { r =>
      if (run.nonEmpty && run.head.getString(1) != r.getString(1)) flush()
      run = r :: run
    }
    flush()
    st
  }
}

package graft.graph

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Immutable graph state as three DataFrames — the Spark mapping of the
  * reference's per-node `Refs` structure
  * (/root/reference/library/GraphDB/Graph.hs:27-34):
  *
  *  - `nodes(id, kind, value)`   ← `refsValue` (Graph.hs:29)
  *  - `edges(src, dst)`          ← `refsSources` reverse sets (Graph.hs:31);
  *                                  set semantics (addTarget is idempotent,
  *                                  GraphTests.hs:147-152)
  *  - `index(src, kkind, key, dst)` ← the `refsTargets` multimap
  *                                  (Graph.hs:30): one row per emitted key
  *
  * State transitions are whole-DataFrame transformations (union /
  * anti-join), mirroring the reference's own WAL-replay model where state =
  * checkpoint ⊕ replay(ops) (Persistent/Log.hs:38-52). At 100 TB the same
  * code paths run as batch jobs: deltas arrive as DataFrames (see
  * [[GraphState.bulkLoad]]), index derivation is a join + flatMap over the
  * delta only, and all three tables are partitioned by their join key
  * (`src`) so chained hops don't re-shuffle.
  */
object GraphState {

  val edgesSchema: StructType = StructType(Seq(
    StructField("src", LongType, nullable = false),
    StructField("dst", LongType, nullable = false)))

  val indexSchema: StructType = StructType(Seq(
    StructField("src", LongType, nullable = false),
    StructField("kkind", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("dst", LongType, nullable = false)))

  def nodesSchema(model: GraphModel[_]): StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("value", model.valueSchema, nullable = true)))

  def empty[V](spark: SparkSession, model: GraphModel[V]): GraphState[V] = {
    def e(s: StructType) =
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], s)
    GraphState(spark, model, e(nodesSchema(model)), e(edgesSchema), e(indexSchema))
  }

  /** One-shot distributed load — the 100 TB ingest path. Index entries are
    * derived in a single pass: edges ⋈ nodes(dst) ⋈ nodes(src) → flatMap
    * over the model's key emission (the reference does the same work
    * edge-at-a-time in `addTarget`, Graph.hs:57-61).
    *
    * The three tables materialize CONCURRENTLY (independent jobs submitted
    * from separate threads — Spark's scheduler interleaves them): the
    * wall-clock of the load is max(nodes, edges, index) instead of their
    * sum. Each job scans the ingest input independently, trading one extra
    * read for full overlap — on a cluster the scans are the same parquet
    * splits server-side cached anyway.
    */
  def bulkLoad[V](
      spark: SparkSession,
      model: GraphModel[V],
      nodes: DataFrame,
      edges: DataFrame): GraphState[V] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val dedupEdges = edges.select(
      col("src").cast(LongType), col("dst").cast(LongType)).distinct()
    val nodesF = Future(nodes.localCheckpoint(true))
    val edgesF = Future(
      dedupEdges.repartition(col("src")).localCheckpoint(true))
    val indexF = Future(deriveIndex(model, nodes, dedupEdges)
      .repartition(col("src")).localCheckpoint(true))
    GraphState(spark, model,
      Await.result(nodesF, Duration.Inf),
      Await.result(edgesF, Duration.Inf),
      Await.result(indexF, Duration.Inf))
  }

  /** Index rows for an edge delta: one row per key the model emits for
    * (targetValue, sourceValue). Runs as a distributed join + flatMap.
    */
  private[graft] def deriveIndex[V](
      model: GraphModel[V], nodes: DataFrame, edgeDelta: DataFrame): DataFrame = {
    val dstVals = nodes.select(col("id").as("dst"),
      col("kind").as("_dk"), col("value").as("_dv"))
    val srcVals = nodes.select(col("id").as("src"),
      col("kind").as("_sk"), col("value").as("_sv"))
    edgeDelta
      .join(dstVals, "dst")
      .join(srcVals, "src")
      .flatMap { r =>
        val tgt = model.fromValueRow(r.getAs[String]("_dk"), r.getAs[Row]("_dv"))
        val src = model.fromValueRow(r.getAs[String]("_sk"), r.getAs[Row]("_sv"))
        val srcId = r.getAs[Long]("src")
        val dstId = r.getAs[Long]("dst")
        model.indexes(tgt, src).map(k => Row(srcId, k.kind, k.key, dstId))
      }(Encoders.row(indexSchema))
  }
}

final case class GraphState[V](
    spark: SparkSession,
    model: GraphModel[V],
    nodes: DataFrame,
    edges: DataFrame,
    index: DataFrame) {

  import GraphState._

  private def rowsDF(rows: Seq[Row], schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)

  /** Append freshly allocated nodes (op #1, Graph.hs:40-41). Unlinked nodes
    * are invisible to stats/persistence until an edge reaches them —
    * reachability scoping preserves the reference's "not persisted unless
    * linked" doc (GraphDB.hs:296-300).
    */
  def withNewNodes(vs: Seq[(Long, V)]): GraphState[V] = {
    val rows = vs.map { case (id, v) => Row(id, model.kindOf(v), model.toValueRow(v)) }
    copy(nodes = nodes.unionByName(rowsDF(rows, nodesSchema(model))))
  }

  /** addTarget (op #6, Graph.hs:57-61): idempotent edge insert + index key
    * emission for the new edges only.
    *
    * Endpoint ids are validated IN-PLAN like [[withValues]]' guard: the
    * reference errors on an invalid node ref, and without the check a
    * typo'd id would silently create a phantom edge — counted by
    * stats/reachability but invisible to getTargets (deriveIndex's inner
    * join emits no keys for it), WAL-logged and replayed into every
    * follower, and persisted dangling by the checkpoint. NodeId is a plain
    * Long, so the typed API cannot make bad refs unrepresentable the way
    * the reference's model typeclass does — the plan must.
    *
    * `validate = false` is for FOLLOWER replay (OplogStream): a follower
    * bootstrapped mid-history legitimately lacks nodes its WAL suffix
    * references (e.g. a checkpoint-less replica of an events-only store) —
    * tolerance there is the documented eventual-consistency posture, while
    * the WRITER session path always validates (the reference server is
    * what refuses invalid refs).
    */
  def withTargets(pairs: Seq[(Long, Long)],
      validate: Boolean = true): GraphState[V] = {
    val delta0 = rowsDF(pairs.distinct.map(p => Row(p._1, p._2)), edgesSchema)
      .join(edges, Seq("src", "dst"), "left_anti")
    val delta = if (validate) guardEndpoints(delta0) else delta0
    val newIndex = deriveIndex(model, nodes, delta)
    copy(edges = edges.unionByName(delta), index = index.unionByName(newIndex))
  }

  /** In-plan endpoint validation: any edge whose src/dst is not a known
    * node id raises at execution time. Two left joins against the node id
    * set + a null check — at ingest scale that is two hash joins on a
    * bigint key, map-side combined by AQE when the node table broadcasts.
    */
  private def guardEndpoints(delta: DataFrame): DataFrame = {
    def guard(side: String) = {
      val known = nodes.select(col("id").as(side), lit(true).as("_k" + side))
      (known, when(col("_k" + side).isNull,
        raise_error(concat(
          lit(s"addTarget $side references unknown node id "),
          col(side).cast("string"),
          lit(" — nodes must be created first"))).cast(LongType))
        .otherwise(col(side)).as(side))
    }
    val (kSrc, srcCol) = guard("src")
    val (kDst, dstCol) = guard("dst")
    delta
      .join(kSrc, Seq("src"), "left")
      .join(kDst, Seq("dst"), "left")
      .select(srcCol, dstCol)
  }

  /** addTarget in bulk from a DataFrame delta — the distributed form of
    * [[withTargets]] for ingest volumes that must never touch the driver.
    * Same semantics: idempotent (anti-join pre-filter), index keys derived
    * for the new edges only. UNLIKE the driver-op path, endpoint ids are
    * NOT validated here — a 10^9-edge ingest pays for no per-edge guard;
    * the bulk caller owns referential integrity (documented contract), and
    * edges referencing unknown ids simply emit no index rows.
    */
  def withTargetsDF(delta: DataFrame): GraphState[V] = {
    val d = delta
      .select(col("src").cast(LongType), col("dst").cast(LongType))
      .distinct()
      .join(edges, Seq("src", "dst"), "left_anti")
    copy(
      edges = edges.unionByName(d),
      index = index.unionByName(deriveIndex(model, nodes, d)))
  }

  /** [[withTargetsDF]] WITH the writer-path endpoint guard: every edge
    * endpoint is validated in-plan against the node set (unknown id →
    * raise_error at execution). The unguarded default stays the
    * contract for trusted re-ingest (replay, replication, ETL whose
    * upstream already joined against nodes); this variant is for
    * untrusted bulk input, and its cost is a measured tradeoff — two
    * extra hash joins on the edge delta, ~1.2× end-to-end at 50M edges
    * (SCALE_r13 bulk_ingest_guard receipt) — not an assertion.
    */
  def withTargetsDFGuarded(delta: DataFrame): GraphState[V] = {
    val d = guardEndpoints(delta
      .select(col("src").cast(LongType), col("dst").cast(LongType))
      .distinct()
      .join(edges, Seq("src", "dst"), "left_anti"))
    copy(
      edges = edges.unionByName(d),
      index = index.unionByName(deriveIndex(model, nodes, d)))
  }

  /** removeTarget (op #7, Graph.hs:63-67): unlink + drop the edge's keys. */
  def withoutTargets(pairs: Seq[(Long, Long)]): GraphState[V] = {
    val delta = rowsDF(pairs.map(p => Row(p._1, p._2)), edgesSchema)
    copy(
      edges = edges.join(delta, Seq("src", "dst"), "left_anti"),
      index = index.join(delta, Seq("src", "dst"), "left_anti"))
  }

  /** remove (op #8, Graph.hs:126-127): detach from ALL sources — incoming
    * edges and their index entries die; outgoing edges remain until the
    * orphaned subgraph is vacuumed at checkpoint (reachability scoping,
    * Graph.hs:145-195).
    */
  def withoutNodes(ids: Seq[Long]): GraphState[V] = {
    val delta = rowsDF(ids.map(Row(_)), StructType(Seq(
      StructField("dst", LongType, nullable = false))))
    copy(
      edges = edges.join(delta, Seq("dst"), "left_anti"),
      index = index.join(delta, Seq("dst"), "left_anti"))
  }

  /** setValue (op #3, Graph.hs:46-55): replace the value and re-derive the
    * index entries of all INCOMING edges (keys are functions of the target
    * value — outgoing entries keep their keys, mirroring the reference).
    */
  def withValues(vs: Seq[(Long, V)]): GraphState[V] = {
    val rows = vs.map { case (id, v) => Row(id, model.kindOf(v), model.toValueRow(v)) }
    val delta = rowsDF(rows, nodesSchema(model))
    // the reference errors on an invalid node ref; without this check a
    // typo'd id would silently FABRICATE a node row (and its WAL'd 'set'
    // op would replay the phantom into every follower). The check is IN
    // THE PLAN (raise_error fused into the delta's kind column), not an
    // eager anti-join count(): the eager form ran one extra distributed
    // job per SetValue batch on the session, replay, AND follower paths.
    // It fires on materialization — immediate in practice, because every
    // session-path withValues is followed by checkpointed(), which
    // materializes all columns eagerly (so pruning cannot elide it).
    val known = nodes.select(col("id"), lit(true).as("_known"))
    val checked = delta
      .join(known, Seq("id"), "left")
      .select(col("id"),
        when(col("_known").isNull,
          raise_error(concat(
            lit("setValue on unknown node id "), col("id").cast("string"),
            lit(" — nodes must be created first"))).cast(StringType))
          .otherwise(col("kind")).as("kind"),
        col("value"))
    val newNodes = nodes
      .join(delta.select(col("id")), Seq("id"), "left_anti")
      .unionByName(checked)
    val touched = delta.select(col("id").as("dst"))
    val incoming = edges.join(touched, Seq("dst"))
    GraphState(spark, model, newNodes,
      edges,
      index.join(touched, Seq("dst"), "left_anti")
        .unionByName(deriveIndex(model, newNodes, incoming)))
  }

  /** Materialize and truncate lineage. Called after each applied op batch —
    * without it a long mutation session accumulates an unbounded plan.
    */
  def checkpointed(): GraphState[V] = copy(
    nodes = nodes.localCheckpoint(true),
    edges = edges.localCheckpoint(true),
    index = index.localCheckpoint(true))

  /** Partition adjacency by `src` so chained hop-joins are co-partitioned
    * (the shuffle happens once at load, not per hop).
    */
  def repartitioned(): GraphState[V] = copy(
    edges = edges.repartition(col("src")),
    index = index.repartition(col("src")))

  /** getStats (op #9, Graph.hs:82-118): (reachable nodes, distinct edges
    * among them, index entries among them), scoped by BFS from `from`.
    * The three counts are independent jobs over the one materialized
    * reachable set — submitted concurrently so the stats wall-clock is
    * max(n, e, i), not their sum.
    */
  def stats(from: Long): (Long, Long, Long) = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val reach = Reachability.reachable(edges, Seq(from)).select(col("id").as("src"))
    val n = Future(nodes.join(reach, nodes("id") === reach("src"), "left_semi").count())
    val e = Future(edges.join(reach, Seq("src"), "left_semi").count())
    val i = Future(index.join(reach, Seq("src"), "left_semi").count())
    (Await.result(n, Duration.Inf),
      Await.result(e, Duration.Inf),
      Await.result(i, Duration.Inf))
  }
}

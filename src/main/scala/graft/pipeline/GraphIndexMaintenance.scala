package graft.pipeline

import org.apache.spark.sql.functions._

import graft.graph.GraphSession

/** The composition the reference maintains implicitly: removing a node
  * deletes its index entries (remove, /root/reference/library/GraphDB/
  * Graph.hs:126-127; index maintenance on unlink, Graph.hs:63-67). Here
  * the "index" half is the persisted ANN vector index family — a graph
  * node that carries an embedding id leaves the vector index in the
  * same gesture that removes it from the graph, so serving the index
  * afterwards equals an index that never contained the node's vector
  * (the removeFromTwoLevelIndex guarantee, spec-pinned end to end from
  * the session API).
  */
object GraphIndexMaintenance {

  /** Remove `ns` through the session API AND remove their embedding ids
    * from the persisted two-level ANN index at `indexDir`. The values
    * are read in ONE batched job BEFORE the removal (the ids must be
    * recoverable to be unlinked — reading after would race the
    * anti-join), then the nodes are removed from the session and the
    * mapped ids from the index. Nodes whose value maps to no embedding
    * id (`vecIdOf` → None — e.g. the root or non-vector nodes) are
    * removed from the graph only. Returns the embedding ids removed
    * from the index, sorted (deterministic — the export the px69 oracle
    * replays).
    *
    * Index-side semantics, atomicity, and the single-maintainer rule
    * are [[Similarity.removeFromTwoLevelIndex]]'s; graph-side semantics
    * are [[GraphSession.remove]]'s (detach from all sources; the
    * orphaned value is vacuumed at checkpoint).
    */
  def removeNodes[V](session: GraphSession[V], ns: Seq[Long],
      indexDir: String, idCol: String)(vecIdOf: V => Option[Long])
      : Seq[Long] = {
    if (ns.isEmpty) return Seq.empty
    val spark = session.spark
    val rows = session.applied().nodes
      .where(col("id").isin(ns: _*))
      .select(col("id"), col("kind"), col("value")).collect()
    require(rows.length == ns.distinct.length,
      s"removeNodes: ${ns.distinct.length - rows.length} of ${ns.length} " +
        s"node ids do not exist in the session")
    val ids = rows.toSeq
      .flatMap(r => vecIdOf(
        session.model.fromValueRow(r.getString(1), r.getStruct(2))))
      .distinct.sorted
    ns.distinct.foreach(session.remove)
    if (ids.nonEmpty) {
      import spark.implicits._
      Similarity.removeFromTwoLevelIndex(spark, indexDir,
        ids.toDF(idCol), idCol)
    }
    ids
  }
}

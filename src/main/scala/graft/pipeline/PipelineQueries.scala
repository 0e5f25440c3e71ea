package graft.pipeline

import graft.queries.Declared.Q

/** Declared-query registry for the training-data pipeline operators
  * (dedup, similarity search, text analysis, multimodal). Populated as
  * each operator lands; see Dedup.scala / TextAnalysis.scala /
  * Similarity.scala / Multimodal.scala.
  */
object PipelineQueries {
  def all: Seq[Q] = Seq.empty
}

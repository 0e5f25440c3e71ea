package graft.graph

import graft.queries.Declared.Q

/** Declared-query registry for traversals executed through the typed
  * GraphSession API (the 9-operator surface of SURVEY.md §2.A), to prove
  * the graph layer computes the same answers as the relational mapping.
  */
object GraphQueries {
  def all: Seq[Q] = Seq.empty
}

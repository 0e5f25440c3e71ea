package graft.graph

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** An index key: the engine-level analog of the reference's `Index s` ADT
  * (/root/reference/library/GraphDB/Graph.hs:19-21). A key constructor with
  * a payload (e.g. `Catalogue_Artist_Name "x"`) maps to
  * `(kind = "Catalogue_Artist_Name", key = "x")`; a payload-free
  * constructor maps to `(kind, "")`.
  */
final case class IndexKey(kind: String, key: String)

object IndexKey {
  def apply(kind: String): IndexKey = IndexKey(kind, "")
}

/** User-supplied model: the Scala analog of the reference's `Setup`
  * typeclass (/root/reference/library/GraphDB/Graph.hs:15-25). Where the
  * reference derives a closed sum type via Template Haskell
  * (Macros/Templates.hs:41-68), we take a sealed-trait ADT plus an explicit
  * sparse-struct codec — Spark has no native sum type, so values are stored
  * as a `kind` tag + a struct with the union of all variants' fields
  * (nullable where a variant lacks the field). Keeping values as real
  * columns (not opaque binary) is what lets Catalyst prune and push down.
  *
  * `indexes(target, source)` mirrors `indexes :: Value s -> Value s ->
  * [Index s]` (Graph.hs:25): given the value at the edge head and the value
  * at the edge tail, emit the index keys under which the target is
  * registered in the source's adjacency index.
  */
trait GraphModel[V] extends Serializable {

  /** Sparse struct covering all variants' fields. */
  def valueSchema: StructType

  def kindOf(v: V): String

  /** Encode into a row matching `valueSchema` (absent fields null). */
  def toValueRow(v: V): Row

  def fromValueRow(kind: String, row: Row): V

  /** Index keys emitted for an edge source→target. */
  def indexes(target: V, source: V): Seq[IndexKey]
}

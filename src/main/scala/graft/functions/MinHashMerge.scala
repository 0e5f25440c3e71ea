package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Column, functions => F}

/** Typed UDAF (`Aggregator[IN, BUF, OUT]` — the custom-aggregation
  * extension shape SURVEY §2.C reserves): element-wise min-merge of
  * MinHash signatures.
  *
  * Because each signature slot is "min of mix(hash(shingle), slot) over
  * the shingle set", the element-wise min of two documents' signatures IS
  * the signature of their shingle-set union — so one pass of this
  * aggregator yields a corpus-level signature per group, from which
  * cross-group Jaccard similarity is estimable without ever materializing
  * the union (the standard corpus-dedup/contamination-check primitive).
  * Mergeable buffer = partial aggregation map-side, like any built-in agg.
  */
final class MinHashMerge(numHashes: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    if (sig == null) return buf // null input row (e.g. NULL text) → skip
    var i = 0
    val n = math.min(buf.length, sig.length)
    while (i < n) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object MinHashMerge {

  /** Column form: `minhashMerge(32)(sigCol)` — registerable like any UDAF. */
  def apply(numHashes: Int): Column => Column = {
    val u = F.udaf(new MinHashMerge(numHashes), ExpressionEncoder[Seq[Long]]())
    (c: Column) => u(c)
  }

  /** Estimated Jaccard between two merged signatures (matching-slot rate).
    * Slots still holding the Long.MaxValue sentinel on BOTH sides (both
    * groups empty of shingles) are excluded — counting them would report
    * similarity 1.0 for two corpora that share zero shingles.
    */
  def estimateJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    val valid = a.zip(b).filterNot { case (x, y) =>
      x == Long.MaxValue && y == Long.MaxValue
    }
    if (valid.isEmpty) 0d
    else valid.count { case (x, y) => x == y }.toDouble / valid.size
  }
}

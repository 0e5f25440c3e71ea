package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, the most recent right row of
  * the same key with rightTime ≤ leftTime — the standard point-in-time
  * enrichment of event pipelines.
  *
  * Composed from built-ins (preference (a) of the custom-operator ladder):
  * tag-union both sides, sort each key's timeline once, and carry the last
  * seen right-side payload forward with `last(ignoreNulls)` over an
  * unbounded-preceding window. ONE shuffle on the key, no join operator at
  * all — candidate volume is |L| + |R| regardless of time-range fan-out,
  * which is what makes it survive 100×: a naive range join explodes as
  * |L|·|matching span|, this stays linear and sorts within partitions.
  */
object AsOf {

  /** @param payload right-side columns to carry (must exist in `right`;
    *   names must be disjoint from `left`'s columns)
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val missing = payload.filterNot(right.columns.contains)
    require(missing.isEmpty, s"payload columns not in right: ${missing.mkString(", ")}")
    val clash = payload.intersect(leftCols)
    require(clash.isEmpty,
      s"payload columns collide with left columns: ${clash.mkString(", ")} — alias one side first")
    val internals = Seq("_k", "_t", "_side", "_p", "_m")
    val reserved = internals.intersect(leftCols) ++ internals.intersect(payload)
    require(reserved.isEmpty,
      s"columns ${reserved.mkString(", ")} collide with asofJoin internals — alias them first")
    // The payload travels as ONE struct: last(ignoreNulls) then selects the
    // most recent right ROW atomically — a NULL field of the matched row
    // stays NULL (ASOF JOIN semantics) instead of per-column last() falling
    // back to an older right row and stitching fields from different rows.
    // The struct itself is non-null for every right row even when all its
    // fields are null, so ignoreNulls only skips left-side filler.
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(right.schema.fieldIndex(p))))
    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1)) // events sort AFTER same-instant rights (≤ is inclusive)
      .select((Seq(col("_k"), col("_t"), col("_side")) ++
        leftCols.map(col) :+
        lit(null).cast(payloadType).as("_p")): _*)
    val r = right
      .withColumn("_k", col(rightKey))
      .withColumn("_t", col(rightTime))
      // ASOF semantics: a right row with NULL key or NULL time matches
      // nothing (`leftTime >= NULL` is UNKNOWN); without this filter the
      // ascending sort would put NULL times FIRST and last(ignoreNulls)
      // would hand their payload to every earlier-than-all-rights left row
      .where(col("_k").isNotNull && col("_t").isNotNull)
      .withColumn("_side", lit(0))
      .select((Seq(col("_k"), col("_t"), col("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("_p")): _*)
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("_m").getField(p).as(p)): _*)
  }
}

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

  /** @param payload right-side columns to carry (must exist in `right`) */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1)) // events sort AFTER same-instant rights (≤ is inclusive)
      .select((Seq(col("_k"), col("_t"), col("_side")) ++
        leftCols.map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"_p_$p"))): _*)
    val r = right
      .withColumn("_k", col(rightKey))
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select((Seq(col("_k"), col("_t"), col("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(p => col(p).as(s"_p_$p"))): _*)
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select((leftCols.map(col) :+ col("_side")) ++
        payload.map(p => last(col(s"_p_$p"), ignoreNulls = true).over(w).as(p)): _*)
      .where(col("_side") === 1)
      .drop("_side")
  }
}

package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-rank operators that avoid the low-cardinality-partition
  * window trap.
  *
  * `ntile(k) OVER (PARTITION BY p ORDER BY v)` with few distinct `p` is a
  * scale-killer: parallelism equals |p| and each task sorts its whole
  * group (the r26 rehearsal measured 21× time at 100× data with |p| = 5).
  * [[ntileBucketed]] computes the IDENTICAL assignment in two phases, the
  * same shape px30 uses for its budget cumsum: value-range buckets give a
  * high-cardinality (p, bucket) key; per-bucket counts (a tiny table)
  * carry prefix sums; ranks come from a window over (p, bucket); the tile
  * is pure integer arithmetic on (rank, group total).
  */
object Distribution {

  /** Exact NTILE(tiles) per `partCol` ordered by (`valueCol`, `tieCol`),
    * without ever sorting a whole partition on one task.
    *
    * Equality with the built-in window: rows with equal value land in the
    * same bucket (the bucket is a deterministic function of the value), so
    * ordering by (bucket, value, tie) is the same total order as
    * (value, tie); the tile formula below is the SQL-standard NTILE rule —
    * the first `total mod tiles` tiles get `⌈total/tiles⌉` rows, the rest
    * `⌊total/tiles⌋` (DistributionSpec checks equality against ntile()
    * directly).
    *
    * Monotone bucketing under IEEE: `floor((v - mn) / width)` uses only
    * correctly-rounded ops, each weakly monotone in `v`, so bucket order
    * can never contradict value order.
    *
    * `valueCol` must be non-null (a NULL has no place in a rank).
    *
    * Scale: one stats aggregation (|p| rows, broadcast back), one
    * (p, bucket) count aggregation (≤ |p|·buckets rows — the prefix-sum
    * window runs over THIS table, not the data), and one rank window
    * partitioned by (p, bucket) — parallelism |p|·buckets instead of |p|.
    *
    * Applicability: this operator exists for LOW-cardinality `partCol`
    * (the r26 case — 5 priority classes), where the built-in window
    * single-threads. With high-cardinality partitions the built-in
    * ntile() is already parallel AND avoids this operator's broadcast of
    * the |p|-row stats/offsets tables — use it directly there.
    */
  def ntileBucketed(df: DataFrame, partCol: String, valueCol: String,
      tieCol: String, tiles: Int, buckets: Int = 256): DataFrame = {
    require(tiles >= 1 && buckets >= 1)
    val v = col(valueCol).cast("double")
    val stats = df.groupBy(partCol)
      .agg(min(v).as("_mn"), max(v).as("_mx"))
    val width = (col("_mx") - col("_mn")) / lit(buckets.toDouble)
    val withB = df.join(broadcast(stats), Seq(partCol))
      .withColumn("_b",
        when(col("_mx") === col("_mn"), lit(0L))
          .otherwise(least(floor((v - col("_mn")) / width),
            lit(buckets.toLong - 1L))))
      .drop("_mn", "_mx")
    val counts = withB.groupBy(col(partCol), col("_b"))
      .agg(count(lit(1)).as("_bc"))
    val cw = Window.partitionBy(partCol).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = counts
      .withColumn("_off", sum(col("_bc")).over(cw) - col("_bc"))
      .withColumn("_total",
        sum(col("_bc")).over(Window.partitionBy(partCol)))
      .drop("_bc")
    val rw = Window.partitionBy(col(partCol), col("_b"))
      .orderBy(col(valueCol), col(tieCol))
    // integer division (Spark's `/` on BIGINT is true division); operands
    // here are non-negative and < 2^53, so floor-of-double-div is exact
    def idiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      floor(a / b).cast("bigint")
    val q = idiv(col("_total"), lit(tiles.toLong))
    val r = col("_total") % tiles
    val big = q + lit(1L)
    val ranked = withB
      .join(broadcast(offsets), Seq(partCol, "_b"))
      .withColumn("_rank", row_number().over(rw).cast("bigint") + col("_off"))
    ranked
      .withColumn("tile",
        when(col("_rank") <= r * big, idiv(col("_rank") - 1L, big) + 1L)
          .otherwise(r + idiv(col("_rank") - r * big - 1L, q) + 1L))
      .drop("_b", "_off", "_total", "_rank")
  }
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * Spark's `sample()` is seed-deterministic only per partitioning; these
  * operators are content-deterministic: the sample depends on row identity
  * (xxhash64(id, seed)), not on physical layout — re-running on a
  * repartitioned/recompacted copy of a 100 TB corpus yields the SAME
  * sample, which is what reproducible dataset curation needs.
  */
object Sampling {

  private def score(idCol: Column, seed: Long): Column =
    xxhash64(idCol, lit(seed))

  /** Exactly min(k, |group|) rows per key, chosen by hash order — a
    * distributed, deterministic per-key reservoir. One shuffle on the key.
    */
  def reservoirPerKey(df: DataFrame, keyCol: String, idCol: String, k: Int,
      seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(score(col(idCol), seed), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= k)
      .drop("_rk")
  }

  /** Bernoulli sample at `rate` by hash threshold — content-deterministic
    * row-level sampling, no shuffle at all.
    *
    * Contract: `idCol` should be a (near-)unique row identity. Rows
    * sharing an id — including all NULL ids, which hash identically — are
    * kept or dropped TOGETHER by construction (hash determinism), which is
    * the right behavior for duplicate ids and surprising for NULLs.
    */
  def bernoulli(df: DataFrame, idCol: String, rate: Double,
      seed: Long = 42L): DataFrame = {
    require(rate >= 0 && rate <= 1)
    if (rate >= 1d) df // u < 1.0 would drop the row hashing exactly to MaxValue
    else {
      // map hash to [0,1) via unsigned-ish normalization
      val u = (score(col(idCol), seed) / lit(Long.MaxValue.toDouble) + 1d) / 2d
      df.where(u < rate)
    }
  }
}

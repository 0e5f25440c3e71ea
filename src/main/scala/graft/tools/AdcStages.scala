package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage receipt for px67's rerank arm (VERDICT r18 item 3): times
  * the ADC pipeline at its decomposition points, best-of-N each —
  *   probes  : twoLevelProbes only (coarse probe assignment)
  *   adc25   : pqAdcTopKFromIndex(k=25, rerank=0) — ADC prune + rank,
  *             everything px67 runs BEFORE the float fetch
  *   adc5    : pqAdcTopKFromIndex(k=5, rerank=0) — px66's shape
  *   full    : pqAdcTopKFromIndex(k=5, rerank=25) — px67
  * full − adc25 ≈ the rerank arm (float fetch + exact cosine + final
  * top-k) since the prune stage is shared verbatim.
  * Usage: runMain graft.tools.AdcStages [sfDir] [runs]
  */
object AdcStages {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
        "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (1 << 20).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.{PipelineQueries, Similarity}
    val dir = PipelineQueries.twoLevelIndexDir(spark, sf)
    val e = graft.Tables.load(spark, sf, "embeddings")
    val q = e.where(col("vec_id") < 20).select(col("vec_id"), col("embedding"))
    val idx = Similarity.loadTwoLevelIndex(spark, dir)
    def bestOf(nameThunk: (String, () => org.apache.spark.sql.DataFrame)): Unit = {
      val (name, thunk) = nameThunk
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        thunk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"ADCSTAGE $name%-8s best ${ts.min}%.3f s  runs " +
        ts.map(t => f"$t%.2f").mkString(" "))
    }
    Seq[(String, () => org.apache.spark.sql.DataFrame)](
      ("probes", () => Similarity.twoLevelProbes(q, "vec_id", "embedding",
        Similarity.TwoLevelModel(idx.l1, idx.l2), p1 = 2, nprobe = 4)),
      ("adc5", () => Similarity.pqAdcTopKFromIndex(spark, dir, q,
        "vec_id", "embedding", k = 5, p1 = 2, nprobe = 4)),
      ("adc25", () => Similarity.pqAdcTopKFromIndex(spark, dir, q,
        "vec_id", "embedding", k = 25, p1 = 2, nprobe = 4)),
      ("full", () => Similarity.pqAdcTopKFromIndex(spark, dir, q,
        "vec_id", "embedding", k = 5, p1 = 2, nprobe = 4, rerank = 25))
    ).foreach(bestOf)
    spark.stop()
  }
}

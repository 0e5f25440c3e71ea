package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: execute one declared query through the noop sink, then dump
  * the FINAL adaptive plan (isFinalPlan=true) — the static explain hides
  * AQE's runtime stage graph. Usage: runMain graft.tools.FinalPlan <query> [sfDir]
  */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
        "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (1 << 20).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    val df = graft.SparkEntry.queries(args(0))(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}

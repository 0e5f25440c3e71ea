package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main — driver contract: ONE JSON line on stdout with
  * per-query wall seconds at SPARK_GRAFT_SF_DIR.
  *
  * Queries execute through the `noop` v2 sink so the FULL physical plan
  * runs (a bare `count()` would let Catalyst eliminate sorts and column
  * projections — benchmarking a plan that never materializes its result is
  * self-deception). One untimed warmup query first absorbs JVM/codegen
  * startup so per-query numbers measure the plan, not the JIT.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup: JVM + codegen + parquet footer caches
    run(Tables.load(spark, sfDir, "lineitem").groupBy("l_returnflag").count())

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try run(fn(spark, sfDir))
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name $dt%.2f s")
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the hub-degree-capped triangle count: builds ga4's
  * co-supplier pair graph at a given SF and times the wedge-join count
  * with and without the cap (plus both results — the capped count is a
  * documented under-count when hubs carry triangles).
  * Usage: runMain graft.tools.CapProbe [sfDir] [cap]
  */
object CapProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cap = if (args.length > 1) args(1).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = graft.Tables.load(spark, sf, "lineitem")
    val filteredPart = graft.Tables.load(spark, sf, "part")
      .where(col("p_brand") === "Brand#13" && col("p_size") < 10)
    val sp = li.join(filteredPart, li("l_partkey") === filteredPart("p_partkey"))
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk")).distinct()
    val pairs = sp.as("a").join(sp.as("b"),
      col("a.pk") === col("b.pk") && col("a.sk") < col("b.sk"))
      .select(col("a.sk").as("src"), col("b.sk").as("dst")).distinct()
      .localCheckpoint(true) // shared input: time ONLY the counting

    def time[A](what: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"CAPPROBE $what ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    }
    time("uncapped")(graft.analytics.GraphAnalytics.triangleCountDF(pairs))
    time(s"capped($cap)")(
      graft.analytics.GraphAnalytics.triangleCountDF(pairs, Some(cap)))
    spark.stop()
  }
}

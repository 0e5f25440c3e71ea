package graft.tools

import org.apache.spark.sql.SparkSession

/** Attribution probe for ga1: how much of its bench time is the shared
  * geo-graph build vs the BFS itself (frontier loop vs Pregel).
  */
object BfsSplit {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SPLIT $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the session so first-job codegen/scheduler setup doesn't land
    // in the first measured phase
    time("warmup")(graft.Tables.load(spark, d, "customer").count())
    sys.env.get("BFSSPLIT_PARTS").foreach(p =>
      spark.conf.set("spark.sql.shuffle.partitions", p))
    // phase split of the build (mirrors GraphQueries.buildGeoGraph shapes)
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types._
      val customer = graft.Tables.load(spark, d, "customer")
      val nodes = customer.select((col("c_custkey") + 1000).as("id"),
        lit("Customer").as("kind"),
        struct(lit(null).cast(StringType).as("name"),
          col("c_custkey").as("custkey")).as("value"))
      val edges = customer.select(
        (col("c_nationkey").cast(LongType) + 100).as("src"),
        (col("c_custkey") + 1000).as("dst"))
      val n = time("  nodes ckpt")(nodes.localCheckpoint(true))
      val e = time("  edges distinct+repart+ckpt")(
        edges.select(col("src").cast(LongType), col("dst").cast(LongType))
          .distinct().repartition(col("src")).localCheckpoint(true))
      time("  index derive+ckpt")(
        graft.graph.GraphState.deriveIndex(
          graft.graph.GraphQueries.GeoModel, n, e)
          .repartition(col("src")).localCheckpoint(true))
    }
    val g = time("geoGraph build")(
      graft.graph.GraphQueries.geoGraph(spark, d, withCustomers = true))
    time("frontier bfs (1st)")(
      graft.analytics.GraphAnalytics.bfsDepthsBounded(g.edges, 0L, 8)
        .groupBy("depth").count().collect())
    time("frontier bfs (2nd)")(
      graft.analytics.GraphAnalytics.bfsDepthsBounded(g.edges, 0L, 8)
        .groupBy("depth").count().collect())
    time("pregel bfs")(
      graft.analytics.GraphAnalytics.bfsDepths(g.edges, 0L)
        .groupBy("depth").count().collect())
    spark.stop()
  }
}

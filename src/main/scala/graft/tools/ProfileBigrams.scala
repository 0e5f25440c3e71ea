package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the px37 bigram pipeline pieces. */
object ProfileBigrams {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sf, "documents")
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $label ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    def toks = graft.pipeline.TextAnalysis.tokens(lower(col("text")))
    for (_ <- 1 to 2) {
      time("scan-only") { docs.select(length(col("text"))).agg(sum(col("length(text)"))).head() }
      time("tokens-sum") { docs.select(size(toks).as("n")).agg(sum("n")).head() }
      time("bag-sum") {
        docs.select(size(graft.functions.ShinglesBag(toks, 2)).as("n"))
          .agg(sum("n")).head()
      }
      time("explode-count") {
        docs.select(explode(graft.functions.ShinglesBag(toks, 2)).as("b")).count()
      }
      time("group-count") {
        docs.select(explode(graft.functions.ShinglesBag(toks, 2)).as("b"))
          .groupBy("b").agg(count(lit(1))).count()
      }
      time("full-topk") {
        graft.pipeline.TextAnalysis.bigramCounts(docs, "text")
          .orderBy(col("cnt").desc, col("bigram")).limit(20).collect().length
      }
    }
  }
}

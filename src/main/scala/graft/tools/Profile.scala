package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the ngram-dedup pipeline pieces. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    // shuffle partitions overridable: the px2 receipt varies THIS at fixed
    // data to separate plan growth from fixed-box partition pressure
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "16"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sf, "documents")
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $label ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    // phase attribution for px18 (pairs → CC → anti-join): run with
    //   runMain graft.tools.Profile <sfDir> px18
    if (args.length > 1 && args(1) == "px18") {
      time("shingles-checkpoint") {
        docs.select(col("doc_id").as("_id"),
          graft.pipeline.TextAnalysis.shingles(col("text"), 3).as("_sh"))
          .where(size(col("_sh")) > 0)
          .localCheckpoint(true).count()
      }
      time("banding-candidates-only") {
        val sh = docs.select(col("doc_id").as("_id"),
          graft.pipeline.TextAnalysis.shingles(col("text"), 3).as("_sh"))
          .where(size(col("_sh")) > 0)
          .localCheckpoint(true)
        val withBand = sh.select(col("_id"),
          posexplode(graft.functions.MinHashBands(col("_sh"), 64, 16)))
          .select(col("_id"), struct(col("pos"), col("col").as("h")).as("_b"))
        withBand.as("a").join(withBand.as("b"),
          col("a._b") === col("b._b") && col("a._id") < col("b._id"))
          .select(col("a._id").as("id1"), col("b._id").as("id2"))
          .distinct().count()
      }
      time("minhash-pairs") {
        graft.pipeline.Dedup.minhashPairs(docs, "doc_id", "text",
          n = 3, threshold = 0.6, numHashes = 64, bands = 16).count()
      }
      val pairs = graft.pipeline.Dedup.minhashPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.6, numHashes = 64, bands = 16)
        .localCheckpoint(true)
      time("cc-loop-only") {
        graft.analytics.GraphAnalytics.connectedComponentsDF(
          pairs.select(col("id1").as("src"), col("id2").as("dst"))).count()
      }
      time("full-keepRepresentatives") {
        graft.pipeline.Dedup.keepRepresentatives(docs, "doc_id", pairs)
          .count()
      }
      spark.stop()
      return
    }
    // phase attribution for px2 (DF-capped index → co-occurrence pairs →
    // per-pair count → threshold): runMain graft.tools.Profile <sfDir> px2
    // The co-occurrence COUNT at two scales is the candidate-growth
    // receipt — the quantity that decides whether px2's super-linear
    // ratio is plan overhead or inherent pair volume.
    if (args.length > 1 && args(1) == "px2") {
      val sh = docs.select(col("doc_id").as("_id"),
        graft.pipeline.TextAnalysis.shingles(col("text"), 3).as("_sh"))
        .where(size(col("_sh")) > 0).localCheckpoint(true)
      val inv = sh.select(col("_id"), explode(col("_sh")).as("_k"))
      def cappedIdx = {
        val hot = inv.groupBy("_k").agg(count(lit(1)).as("_df"))
          .where(col("_df") > graft.pipeline.Dedup.DefaultMaxDF).select("_k")
        inv.join(hot, Seq("_k"), "left_anti")
      }
      time("capped-index-rows") { cappedIdx.count() }
      val capped = cappedIdx.localCheckpoint(true)
      time("cooccurrence-candidate-rows") {
        capped.as("a").join(capped.as("b"),
          col("a._k") === col("b._k") && col("a._id") < col("b._id")).count()
      }
      time("pair-groupby") {
        capped.as("a").join(capped.as("b"),
          col("a._k") === col("b._k") && col("a._id") < col("b._id"))
          .groupBy(col("a._id"), col("b._id")).agg(count(lit(1))).count()
      }
      time("full-px2") {
        graft.pipeline.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = 0.6).count()
      }
      // within-process partition sweep on the dominant phase: one JVM,
      // same data, only spark.sql.shuffle.partitions varies — immune to
      // the box's measured same-day 2.5x drift across processes
      for (p <- Seq("16", "64", "128")) {
        spark.conf.set("spark.sql.shuffle.partitions", p)
        time(s"pair-groupby-p$p") {
          capped.as("a").join(capped.as("b"),
            col("a._k") === col("b._k") && col("a._id") < col("b._id"))
            .groupBy(col("a._id"), col("b._id")).agg(count(lit(1))).count()
        }
      }
      spark.stop()
      return
    }
    time("tokens-count") {
      docs.select(graft.pipeline.TextAnalysis.tokens(col("text")).as("t"))
        .select(sum(size(col("t")))).head().getLong(0)
    }
    time("shingles-count") {
      docs.select(graft.pipeline.TextAnalysis.shingles(col("text"), 3).as("s"))
        .select(sum(size(col("s")))).head().getLong(0)
    }
    time("inv-explode-count") {
      docs.select(col("doc_id"),
        explode(graft.pipeline.TextAnalysis.shingles(col("text"), 3)).as("k"))
        .count()
    }
    time("pair-groupby") {
      val inv = docs.select(col("doc_id").as("_id"),
        explode(graft.pipeline.TextAnalysis.shingles(col("text"), 3)).as("_k"))
      inv.as("a").join(inv.as("b"),
        col("a._k") === col("b._k") && col("a._id") < col("b._id"))
        .groupBy(col("a._id"), col("b._id")).agg(count(lit(1)))
        .count()
    }
    spark.stop()
  }
}

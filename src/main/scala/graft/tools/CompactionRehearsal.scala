package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** The append-fragmentation receipt behind compactTwoLevelIndex: each
  * append writes one file per TOUCHED cell per batch, so after K batches
  * a hot cell holds up to K files — incrementally re-creating the
  * tasks×cells file-count pathology the r15 build-path fix eliminated
  * (file listing + per-file footer overhead dominating the serve;
  * measured 3.9 → 0.7 s there). This tool measures it END-TO-END: serve
  * latency and cells file count at K ∈ {0, 8, 32} append batches, before
  * and after compaction, over the same corpus — the number that says
  * WHEN to run compaction (alongside the occupancy-skew retrain check).
  *
  * Reads `embeddings.parquet` under the given data dir. Emits ONE JSON
  * line; record it in SERVE_r{N}.json / SCALE_r{N}.json.
  *
  * Usage: runMain graft.tools.CompactionRehearsal [dataDir] [k]
  */
object CompactionRehearsal {

  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
        "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = graft.Tables.load(spark, dataDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val n = corpus.count()
    // occupancy-sized for the FULL corpus the index will eventually hold
    val side = Similarity.twoLevelSide(n)
    val base = corpus.where(pmod(col("vec_id"), lit(33)) === 0)
    def batch(b: Int): DataFrame =
      corpus.where(pmod(col("vec_id"), lit(33)) === b)
    val queries = corpus.orderBy("vec_id").limit(64).localCheckpoint(true)

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    def parquetFiles(dir: String): Long = {
      val (p) = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var c = 0L
      while (it.hasNext) {
        if (it.next().getPath.getName.endsWith(".parquet")) c += 1
      }
      c
    }

    // median-of-3 warm serve (the quantized path — px63's, the serving
    // shape); a fresh plan per run so file listing is paid each time
    def serveSec(dir: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        Similarity.quantizedTopKFromIndex(spark, dir, queries,
          "vec_id", "embedding", k = k).collect()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      Seq.fill(3)(once()).sorted.apply(1)
    }

    val rows = Seq(0, 8, 32).map { kb =>
      val dir = Files.createTempDirectory(s"graft_compact_k$kb").toString
      Similarity.saveTwoLevelIndex(base, "vec_id", "embedding", dir,
        nlist1 = side, k2 = side, iters = 1)
      (1 to kb).foreach(b =>
        Similarity.appendToTwoLevelIndex(spark, dir, batch(b),
          "vec_id", "embedding", dedupeIds = false))
      val cells = s"$dir/cells"
      val filesPre = parquetFiles(cells)
      val pre = serveSec(dir)
      val tC0 = System.nanoTime()
      Similarity.compactTwoLevelIndex(spark, dir)
      val compactSec = (System.nanoTime() - tC0) / 1e9
      val filesPost = parquetFiles(s"$dir/cells_g2")
      val post = serveSec(dir)
      s"""{"append_batches":$kb,"files_pre":$filesPre,""" +
        s""""serve_sec_pre":${fmt(pre)},"compact_sec":${fmt(compactSec)},""" +
        s""""files_post":$filesPost,"serve_sec_post":${fmt(post)}}"""
    }
    println(
      s"""{"metric":"compaction","n_vectors":$n,"side":$side,"k":$k,""" +
        s""""batch":64,"rows":${rows.mkString("[", ",", "]")}}""")
    spark.stop()
  }
}

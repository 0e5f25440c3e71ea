package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Phase decomposition of the cold two-level index build (VERDICT r18
  * item 1: px62's run-1 build was ~10 s of every cold bench/Verify).
  * Runs saveTwoLevelIndex against a scratch dir and prints per-phase wall
  * seconds (from the `ivf2-build:` job descriptions the builder sets) and
  * the per-job breakdown within each phase.
  * Usage: runMain graft.tools.BuildProfile [sfDir] [repeat]
  */
object BuildProfile {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val repeat = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
        "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (1 << 20).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // (jobId, description, seconds)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Double)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val d = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(j.jobId, (d, j.time))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(j.jobId)).foreach { case (d, t0) =>
          done.add((j.jobId, d, (j.time - t0) / 1e3))
        }
      }
    })

    val corpus = graft.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val side = graft.pipeline.Similarity.twoLevelSide(corpus.count())
    println(s"side=$side")
    for (i <- 1 to repeat) {
      done.clear()
      val dir = s"/tmp/graft_build_profile_$i"
      val t0 = System.nanoTime()
      graft.pipeline.Similarity.saveTwoLevelIndex(corpus, "vec_id",
        "embedding", dir, nlist1 = side, k2 = side, iters = 1)
      val total = (System.nanoTime() - t0) / 1e9
      println(f"BUILD run $i total ${total}%.3f s")
      import scala.jdk.CollectionConverters._
      val byPhase = done.asScala.toSeq.groupBy(_._2)
      byPhase.toSeq.sortBy(-_._2.map(_._3).sum).foreach { case (d, js) =>
        println(f"  phase ${if (d.isEmpty) "(unlabeled)" else d}%-40s " +
          f"${js.map(_._3).sum}%8.3f s  (${js.size} jobs: " +
          js.sortBy(_._1).map(j => f"${j._3}%.2f").mkString(" ") + ")")
      }
    }
    spark.stop()
  }
}

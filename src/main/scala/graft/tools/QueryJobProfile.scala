package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-job decomposition of one declared query (VERDICT r18 items 3/6:
  * receipts for fixed-overhead-bound queries) — runs the query `repeat`
  * times through the noop sink and prints each run's wall seconds plus
  * the per-job breakdown, so "N jobs x scheduler latency" floors are
  * visible directly.
  * Usage: runMain graft.tools.QueryJobProfile <queryName> [sfDir] [repeat]
  */
object QueryJobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val repeat = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
        "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (1 << 20).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ad-hoc A/B overrides: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double)]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Double, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        starts.put(j.jobId, j.time)
        System.err.println(s"[jobmap] job ${j.jobId} stages " +
          j.stageIds.mkString(",") + " desc=" +
          Option(j.properties).flatMap(p =>
            Option(p.getProperty("spark.job.description"))).getOrElse("")
            .take(80))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        Option(starts.remove(j.jobId)).foreach(t0 =>
          done.add((j.jobId, (j.time - t0) / 1e3)))
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val dur = (for {a <- i.completionTime; b <- i.submissionTime}
          yield (a - b) / 1e3).getOrElse(-1d)
        val tm = i.taskMetrics
        val site = (if (tm != null)
          f"run=${tm.executorRunTime / 1e3}%.2f cpu=${tm.executorCpuTime / 1e9}%.2f " +
            f"srIn=${tm.shuffleReadMetrics.recordsRead} " +
            f"swOut=${tm.shuffleWriteMetrics.recordsWritten} " +
            f"out=${tm.outputMetrics.recordsWritten} "
        else "") + i.details.linesIterator
          .find(l => l.contains("graft.") || l.contains("Dataset"))
          .getOrElse(i.name.takeWhile(_ != '\n')).trim.take(60)
        stages.add((i.stageId, site, dur, i.numTasks))
      }
    })
    for (i <- 1 to repeat) {
      done.clear()
      stages.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sf)
        .write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let the async listener bus drain job-end events
      import scala.jdk.CollectionConverters._
      val js = done.asScala.toSeq.sortBy(_._1)
      println(f"JOBPROFILE $name run $i: $total%.3f s, ${js.size} jobs " +
        f"(sum ${js.map(_._2).sum}%.3f s): " +
        js.map(j => f"${j._2}%.2f").mkString(" "))
      if (i == repeat) {
        stages.asScala.toSeq.sortBy(-_._3).take(8).foreach { case (id, n, d, t) =>
          println(f"  stage $id%4d $d%7.3f s  tasks=$t%-3d $n")
        }
      }
    }
    spark.stop()
  }
}

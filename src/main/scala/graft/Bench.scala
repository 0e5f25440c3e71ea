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
      // probed-partition serving (px62/px63/px64): with the default
      // reuseBroadcastOnly=true the planner degrades the cells scan's
      // dynamicpruning filters to literal TRUE when it cannot reuse the
      // probe-side broadcast (measured: 484/484 files read at batch=1);
      // standalone DPP subqueries re-run only the tiny probes plan and
      // cut the scan to the probed cells (measured: 8/484 files)
      .config("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
        "false")
      // top-k serving (r18): per-query ranking is a bounded
      // TypedImperativeAggregate (ObjectHashAggregateExec). The default
      // 128-distinct-keys sort-fallback is calibrated for unbounded
      // sketch buffers; TopKEntries buffers are ≤ k·33 B, so hash-agg a
      // ≤ 1M-query batch per task (≤ ~400 MB at serving k ≤ 10) before
      // falling back. Scale-independent: bounds memory by BATCH size,
      // not corpus size.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (1 << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Locale.ROOT: the default-locale `f` interpolator emits comma decimal
    // separators on e.g. de_DE, which breaks the one-JSON-line contract
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    // warmup: JVM + codegen + parquet footer caches
    run(Tables.load(spark, sfDir, "lineitem").groupBy("l_returnflag").count())

    // Best-of-N per query: this box swings ±30% under load, which has
    // repeatedly confused round-over-round adjudication — the per-query MIN
    // of 3 runs measures the plan, the recorded spread (max-min) shows how
    // noisy the box was. A query that fails is reported as -1 immediately
    // (no pointless retries of a broken plan).
    val Runs = 3
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // release the previous query's plan-owned localCheckpoint blocks
      // (CC loops, px29's lineage cut): the ContextCleaner frees them only
      // after their RDDs are garbage-collected, and 71 queries × 3 runs in
      // one JVM otherwise accumulate blocks toward eviction pressure — the
      // same mitigation ScaleRehearsal applies, for the same reason
      System.gc()
      val times = Iterator.continually(()).take(Runs).map { _ =>
        val t0 = System.nanoTime()
        try { run(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1d
        }
      }.takeWhile(_ >= 0).toSeq
      val (best, spread) =
        if (times.length < Runs) (-1d, -1d) // a run failed
        else (times.min, times.max - times.min)
      System.err.println(s"[bench] $name ${fmt(best)} s (spread ${fmt(spread)})")
      (name, best, spread)
    }
    def obj(f: ((String, Double, Double)) => Double): String =
      results.map(r => "\"" + r._1 + "\":" + fmt(f(r))).mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val fullLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","runs":$Runs,"queries":${obj(_._2)},"spread":${obj(_._3)},"sf":"$sfDir"}"""
    println(fullLine)
    // Durable per-query record: the stdout line above exceeds the driver's
    // ~4 KB tail window (r7 and r8 both lost the per-query map to it),
    // making round-over-round per-query adjudication impossible from the
    // round record alone. A file survives truncation; written atomically
    // so a crashed bench never leaves a half-record behind. Best-effort:
    // a read-only cwd must not fail the bench itself.
    try {
      val detail = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "bench_detail.json"))
      val tmp = detail.resolveSibling(detail.getFileName.toString + ".tmp")
      java.nio.file.Files.writeString(tmp, fullLine + "\n")
      java.nio.file.Files.move(tmp, detail,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      System.err.println(s"[bench] per-query detail -> $detail")
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] detail file write failed (non-fatal): $e")
    }
    // r19: the driver's ~4 KB stdout tail window truncates the full line's
    // queries map (PERF_r18 `per_query` came back empty — the tail caught
    // only the trailing SPREAD map), so the per-query times are RE-EMITTED
    // here as compact chunked lines, each far below the window and all of
    // them together (~3.3 KB) inside it, placed just before the compact
    // total so the tail always carries complete per-query data. Additive
    // only: the full line above and the total_compact trailer below are
    // byte-identical to r18.
    locally {
      val entries = results.map(r => "\"" + r._1 + "\":" + fmt(r._2))
      val maxChunkBytes = 1100
      val chunks = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[String])
      var sz = 0
      entries.foreach { e =>
        if (sz + e.length > maxChunkBytes && chunks.last.nonEmpty) {
          chunks += scala.collection.mutable.ArrayBuffer.empty[String]
          sz = 0
        }
        chunks.last += e
        sz += e.length + 1
      }
      chunks.zipWithIndex.foreach { case (c, i) =>
        println(s"""{"metric":"per_query","part":${i + 1},"parts":${chunks.length},"queries":{${c.mkString(",")}}}""")
      }
    }
    // tail-truncation insurance: the full line above exceeds the driver's
    // ~4 KB tail window once per-query maps grow, and round 6 lost its
    // headline number exactly that way ("parsed": null). This compact
    // trailer always fits, so the round record always carries the total.
    println(s"""{"metric":"total_compact","value":${fmt(total)},"unit":"sec","n_queries":${results.length},"failed":${results.count(_._2 < 0)},"sf":"$sfDir"}""")
    spark.stop()
  }
}

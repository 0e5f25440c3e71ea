package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene operator the
  * reference has no analog of but every large-scale pipeline needs: flag
  * corpus documents that share n-gram shingles with a (small) evaluation
  * set, so eval data can be excluded from training.
  *
  * Scale design (the 100 TB shape):
  *  - the EVAL side is small by nature (thousands of documents, not
  *    billions) — its exploded shingle set is broadcast, so the corpus is
  *    scanned exactly once with a broadcast hash join: no shuffle of the
  *    corpus's exploded shingles at all;
  *  - the only shuffle is the final per-document max over the (doc, bench)
  *    overlap counts, which is bounded by the number of MATCHING pairs,
  *    not the corpus size, and map-side partial aggregation applies;
  *  - super-common shingles (stop n-grams) would make every corpus doc
  *    match every bench doc — `maxBenchDF` drops shingles appearing in
  *    more than that many bench documents before the join, the same
  *    hot-key cap Dedup.ngramJaccardPairs applies (Dedup.DefaultMaxDF
  *    rationale), evaluated on the tiny bench side.
  *
  * Shingle sets are DISTINCT per document on both sides (the Shingles
  * expression dedups), so `count(*)` per (doc, bench) pair is exactly the
  * intersection size |shingles(doc) ∩ shingles(bench)|.
  */
object Decontaminate {

  /** On-disk→in-memory expansion multiplier the broadcast guard applies to
    * Catalyst's `sizeInBytes` (file-size-derived for scans). 8× covers
    * parquet encoding + compression of float-array columns plus the
    * UnsafeRow/broadcast-relation overhead with margin; the cost of
    * overestimating is only a shuffled join that returns the same rows.
    */
  val BroadcastExpansionFactor: Long = 8L

  /** Per-corpus-document maximum shingle overlap with any single benchmark
    * document: `(idCol, max_overlap)`, one row per corpus document with at
    * least one shared shingle. `contaminated` policy thresholds belong to
    * the caller (a doc matching ≥ k shingles of one eval doc is the usual
    * rule — per-single-document overlap, not union overlap, so a doc
    * brushing many eval docs lightly is not over-flagged).
    */
  def overlap(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 3, maxBenchDF: Option[Int] = None,
      maxBroadcastShingleRows: Long = 4000000L): DataFrame = {
    val benchSh0 = bench.select(col(idCol).as("bench_id"),
      explode(TextAnalysis.shingles(col(textCol), n)).as("g"))
    val benchSh = maxBenchDF.fold(benchSh0) { cap =>
      val hot = benchSh0.groupBy("g").agg(count(lit(1)).as("df"))
        .where(col("df") > cap).select("g")
      benchSh0.join(hot, Seq("g"), "left_anti")
    }
    val corpusSh = corpus.select(col(idCol),
      explode(TextAnalysis.shingles(col(textCol), n)).as("g"))
    // guarded broadcast, same pattern as Reachability's frontier joins: an
    // eval set is small BY NATURE, but an unconditional broadcast() hint
    // overrides Spark's own size protection, so a caller passing a huge
    // "bench" would OOM every executor. The guard counts what is actually
    // broadcast — the exploded (and cap-surviving) SHINGLE rows, which can
    // be thousands per document, not the document count — in ONE job:
    // with a cap, sum the per-shingle df of the surviving shingles off the
    // same aggregation the cap itself needs; without one, count the rows.
    // 4M rows ≈ low hundreds of MB broadcast — a deliberate executor-memory
    // bound, not a correctness knob (above it the plain shuffle join gives
    // identical answers).
    val broadcastRows = maxBenchDF match {
      case Some(cap) =>
        benchSh0.groupBy("g").agg(count(lit(1)).as("df"))
          .agg(coalesce(sum(when(col("df") <= cap, col("df"))), lit(0L)))
          .head().getLong(0)
      case None => benchSh.count()
    }
    val benchSide =
      if (broadcastRows <= maxBroadcastShingleRows) broadcast(benchSh) else benchSh
    corpusSh
      .join(benchSide, Seq("g"))
      .groupBy(col(idCol), col("bench_id"))
      .agg(count(lit(1)).as("overlap"))
      .groupBy(col(idCol))
      .agg(max(col("overlap")).as("max_overlap"))
  }

  /** SEMANTIC decontamination — the embedding-space counterpart of
    * [[overlap]]: per corpus vector, the maximum cosine similarity to any
    * single benchmark vector, flagged at `threshold`. Catches paraphrased
    * or translated eval contamination that shares no n-grams (the reason
    * pipelines run both lexical AND semantic passes).
    *
    * Scale: the bench side is small by nature and broadcasts — the corpus
    * embedding store is scanned ONCE with a broadcast nested-loop of
    * |bench| dot products per row (each a codegen'd native CosineSim),
    * then one map-side-combined max per corpus id. No corpus shuffle of
    * vectors at all; at billions of corpus rows this is a pure map stage
    * riding executor count. Scores are rounded to 6dp BEFORE the max and
    * the threshold, so both are stable across engines (the px9/px13
    * convention).
    *
    * The broadcast is GUARDED like [[overlap]]'s: an unconditional hint
    * overrides Spark's size protection, so a caller passing a huge
    * "bench" would OOM every executor — above `maxBroadcastBenchBytes`
    * the plain (shuffled nested-loop) join gives identical answers. The
    * guard reads Catalyst's OWN size estimate for the bench plan
    * (`optimizedPlan.stats.sizeInBytes` — file-size-derived for scans,
    * conservatively large when unknown, so the fallback is the safe
    * side), which costs ZERO jobs at plan-construction time — the same
    * one-job-per-call contract the lexical guard keeps by folding its
    * count into the cap aggregation, and the same mechanism Spark's
    * autoBroadcastJoinThreshold itself decides with. (An eager
    * `bench.count()` here was one extra job per call — measured and
    * replaced in r15.)
    *
    * `excludeSameId` (default true) skips corpus-vs-bench comparisons
    * whose ids coincide — correct when the bench is carved OUT OF the
    * corpus id space (px54's shape: a held-out half, where the self-pair
    * is a trivial sim=1.0). When corpus and bench are independent
    * datasets whose id spaces can collide, pass false, or a genuinely
    * contaminated pair sharing an id is never scored.
    */
  def semanticOverlap(corpus: DataFrame, bench: DataFrame, idCol: String,
      vecCol: String, threshold: Double, excludeSameId: Boolean = true,
      maxBroadcastBenchBytes: Long = 512L << 20): DataFrame = {
    // per-row norms once per side: the cross-score below evaluates
    // |corpus| × |bench| cosines, and CosineSimPre (bit-identical to
    // CosineSim — r18) drops the two norm loops from every pair
    val c = corpus.select(col(idCol), col(vecCol).as("_cv"))
      .withColumn("_cn", graft.functions.VecNorm(col("_cv")))
    val b = bench.select(col(idCol).as("_bid"), col(vecCol).as("_bv"))
      .withColumn("_bn", graft.functions.VecNorm(col("_bv")))
    // sizeInBytes for a parquet scan is the ON-DISK (compressed, encoded)
    // size; the broadcast hashed relation holds DESERIALIZED rows —
    // UnsafeRow array payloads plus per-row/object overhead — which for a
    // float-array table runs several × the file bytes. Compare the
    // estimate × a conservative expansion factor against the cap, so a
    // near-threshold compressed table cannot sail past the guard and
    // OOM every executor (Spark's own autoBroadcastJoinThreshold defaults
    // to 10 MB for exactly this reason).
    val benchSide =
      if (b.queryExecution.optimizedPlan.stats.sizeInBytes
            * BroadcastExpansionFactor <= maxBroadcastBenchBytes) broadcast(b)
      else b
    val cond =
      if (excludeSameId) col(idCol) =!= col("_bid") else lit(true)
    c.join(benchSide, cond)
      .select(col(idCol),
        round(graft.functions.CosineSimPre(col("_cv"), col("_bv"),
          col("_cn"), col("_bn")), 6).as("_sim"))
      .groupBy(col(idCol))
      .agg(max(col("_sim")).as("max_sim"))
      .withColumn("contaminated", col("max_sim") >= threshold)
  }
}

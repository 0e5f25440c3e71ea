package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * Spark's `sample()` is seed-deterministic only per partitioning; these
  * operators are content-deterministic: the sample depends on row identity
  * (xxhash64(id, seed)), not on physical layout — re-running on a
  * repartitioned/recompacted copy of a 100 TB corpus yields the SAME
  * sample, which is what reproducible dataset curation needs.
  */
object Sampling {

  private def score(idCol: Column, seed: Long): Column =
    xxhash64(idCol, lit(seed))

  /** Exactly min(k, |group|) rows per key, chosen by hash order — a
    * distributed, deterministic per-key reservoir. One shuffle on the key.
    */
  def reservoirPerKey(df: DataFrame, keyCol: String, idCol: String, k: Int,
      seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(score(col(idCol), seed), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= k)
      .drop("_rk")
  }

  /** Deterministic train/val/test split: every row gets a `split` label
    * chosen by its id's hash bucket, so membership depends ONLY on row
    * identity — stable across runs, partitionings, and corpus growth (a
    * new document never moves an old one between splits, the property
    * leakage-free eval sets need). `fractions` are (label, weight) pairs
    * summing to ≤ 1; any remainder gets `restLabel`. Pure per-row
    * expression: no shuffle, scales with input splits.
    */
  def hashSplit(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)], restLabel: String = "train",
      seed: Long = 42L): DataFrame = {
    require(fractions.nonEmpty && fractions.map(_._2).sum <= 1.0 + 1e-9,
      "split fractions must sum to ≤ 1")
    val Buckets = 10000L
    val bucket = pmod(score(col(idCol), seed), lit(Buckets))
    // cumulative integer thresholds over [0, 10000) — exact arithmetic,
    // replayable verbatim by any SQL engine over the exported buckets.
    // Round the CUMULATIVE sums, not each term: per-term rounding drifts
    // the final boundary by up to fractions.size/2 buckets, whereas the
    // cumulative form keeps every boundary within half a bucket of the
    // intended split (a sub-1/20000 fraction then gets an explicit
    // zero-width bucket rather than silently widening its neighbors).
    val bounds = (0 to fractions.size).map { i =>
      math.round(fractions.take(i).map(_._2).sum * Buckets)
    }
    val expr = fractions.zipWithIndex.foldRight(lit(restLabel): Column) {
      case (((label, _), i), els) =>
        when(bucket >= bounds(i) && bucket < bounds(i + 1), label).otherwise(els)
    }
    df.withColumn("split", expr)
  }

  /** The split's hash bucket AND raw hash — exported by graft.Verify so
    * the px21 oracle can independently re-derive both assignment modes in
    * DuckDB (which has no xxhash64): `bucket` replays [[hashSplit]]'s
    * integer threshold CASE verbatim, and `h` replays [[bernoulli]]'s
    * normalize-and-threshold (long→double conversion and IEEE division
    * are engine-independent). Must stay parameter-compatible with
    * [[hashSplit]] / [[bernoulli]].
    */
  def splitBuckets(df: DataFrame, idCol: String, seed: Long = 42L): DataFrame =
    df.select(col(idCol),
      pmod(score(col(idCol), seed), lit(10000L)).as("bucket"),
      score(col(idCol), seed).as("h"))

  /** Deterministic budget-bounded subsample — "a reproducible ~N-token
    * (or N-char/N-byte) slice of the corpus": rows are taken in
    * content-hash order until the cumulative `weightCol` reaches `budget`
    * (a row is kept iff its INCLUSIVE cumulative weight fits). Membership
    * depends only on row identity and weights — stable across runs,
    * partitionings, and layouts, like [[hashSplit]]/[[bernoulli]], and
    * growth-stable in the prefix sense: adding new rows only displaces
    * rows at the budget boundary.
    *
    * Scale design — NO global sort window (a single-partition running sum
    * over the corpus is the classic 100 TB killer): selection order is
    * (bucket, hash, id) with bucket = pmod(hash, `buckets`). Phase 1
    * aggregates per-bucket weight totals (`buckets` rows to the driver);
    * phase 2 prefix-sums them driver-side into per-bucket OFFSETS and
    * prunes every bucket whose offset already exceeds the budget (the
    * sort below then touches only the selected prefix plus the one
    * straddling bucket); phase 3 is a window cumsum PARTITIONED BY bucket
    * — each bucket an independent ~1/`buckets` stream — plus the bucket's
    * offset. Raise `buckets` with the corpus so each stream fits a task,
    * the same sharding reasoning as Packing / the px15 two-phase top-k.
    * Exactly equal to the global-order cumsum by integer arithmetic.
    */
  def budgetedSample(df: DataFrame, idCol: String, weightCol: String,
      budget: Long, seed: Long = 42L, buckets: Int = 1024): DataFrame = {
    require(budget >= 0 && buckets >= 1)
    val h = score(col(idCol), seed)
    val withB = df
      .withColumn("_h", h)
      .withColumn("_b", pmod(col("_h"), lit(buckets.toLong)))
      .withColumn("_w", col(weightCol).cast("long"))
    // min(_w) and the NULL count ride in the SAME aggregation (zero extra
    // jobs) to enforce the preconditions: with a negative weight the
    // bucket prune below is unsound (a row's cumsum could dip back under
    // the budget inside a pruned bucket), and a NULL — or non-long-castable,
    // which the cast turns into NULL — weight would silently act as zero
    // in the window cumsum (SUM skips NULLs) while an all-NULL bucket
    // breaks the driver-side getLong on its total. Refuse loudly instead
    // of silently diverging from the global-order contract.
    val perBucket = withB.groupBy("_b")
      .agg(sum(col("_w")).as("t"), min(col("_w")).as("mn"),
        (count(lit(1)) - count(col("_w"))).as("nulls"))
      .collect()
    val nullRows = perBucket.map(_.getLong(3)).sum
    if (nullRows > 0L)
      throw new IllegalArgumentException(
        s"budgetedSample requires non-null, long-castable weights; found " +
          s"$nullRows NULL or non-castable rows in '$weightCol' — a NULL " +
          "weight has no place in a prefix-budget cumsum; filter or " +
          "default them first")
    perBucket.find(_.getLong(2) < 0L).foreach { r =>
      throw new IllegalArgumentException(
        s"budgetedSample requires non-negative weights; found ${r.getLong(2)} " +
          s"in '$weightCol' — negative weights make prefix-budget selection " +
          "ill-defined")
    }
    val totals = perBucket.map(r => r.getLong(0) -> r.getLong(1)).toMap
    var acc = 0L
    val offsets = (0L until buckets.toLong).map { b =>
      val o = b -> acc
      acc += totals.getOrElse(b, 0L)
      o
    }.toMap
    // prune on o <= budget, NOT o < budget: a bucket whose offset equals
    // the budget exactly can still contribute ZERO-weight rows (empty
    // documents exist), whose inclusive cumsum == budget and which the
    // global-order semantics keep — the _cum filter below decides; a
    // bucket with o > budget can contribute nothing (every row's cum ≥ o)
    val live = offsets.collect { case (b, o) if o <= budget && totals.contains(b) => b }.toSeq
    if (live.isEmpty) return df.limit(0)
    val offCol = element_at(typedLit(offsets), col("_b"))
    val w = Window.partitionBy(col("_b")).orderBy(col("_h"), col(idCol))
    withB
      .where(col("_b").isin(live: _*))
      .withColumn("_cum", sum(col("_w")).over(w) + offCol)
      .where(col("_cum") <= budget)
      .drop("_h", "_b", "_w", "_cum")
  }

  /** Deterministic mixture sampling to target group shares — the data-mix
    * operator of large-scale corpus curation ("mix languages/sources at
    * fixed proportions"): returns the LARGEST subsample whose group
    * proportions equal `shares` in expectation, by per-group
    * hash-threshold bernoulli. The binding group (smallest n_g/s_g) keeps
    * (nearly) everything; every other group downsamples to match.
    * Membership is content-deterministic like [[bernoulli]] — stable
    * across runs and layouts — and groups absent from `shares` are
    * dropped.
    *
    * Scale: one count aggregation (|groups| rows to the driver) + a pure
    * per-row filter — no shuffle of the data itself. The rate arithmetic
    * is plain IEEE double in a fixed evaluation order (`s * T / n_g`,
    * `T = min_g n_g / s_g`), so an independent SQL engine replays
    * membership exactly from the same hashes (the px31 oracle does).
    */
  def mixToShares(df: DataFrame, groupCol: String, idCol: String,
      shares: Map[String, Double], seed: Long = 42L,
      weightCol: Option[String] = None): DataFrame = {
    require(shares.nonEmpty && shares.values.forall(s => s > 0 && s <= 1),
      "shares must be in (0, 1]")
    require(math.abs(shares.values.sum - 1.0) < 1e-9, "shares must sum to 1")
    // production mixes are usually TOKEN-share targets, not document-share:
    // with a weightCol the group mass W_g is its weight sum and the same
    // per-row keep probability s·T/W_g yields the target WEIGHT proportions
    // in expectation (each kept row carries its weight)
    val mass = weightCol.fold(count(lit(1)).cast("double"))(w =>
      sum(col(w).cast("double")))
    val grouped = df.groupBy(groupCol).agg(mass.as("n")).collect()
    // a null-keyed row has no share target: before this guard it silently
    // dropped through `rate.isNotNull` below (and a non-string group col
    // ClassCastExceptions on getString) — refuse loudly instead, the same
    // posture as budgetedSample's weight preconditions. Zero extra jobs:
    // the null key surfaces in the one aggregation this operator runs.
    if (grouped.exists(_.isNullAt(0)))
      throw new IllegalArgumentException(
        s"mixToShares requires non-null group keys in '$groupCol' — a " +
          "null-keyed row belongs to no share group; filter or label " +
          "nulls first")
    val counts = grouped.map { r =>
      (r.get(0) match {
        case s: String => s
        case other => throw new IllegalArgumentException(
          s"mixToShares requires a STRING group column; '$groupCol' holds " +
            s"${other.getClass.getSimpleName}")
      }) -> (if (r.isNullAt(1)) throw new IllegalArgumentException(
        s"mixToShares: group '${r.get(0)}' has no non-null castable " +
          s"'${weightCol.getOrElse("")}' weight — its mass is undefined")
      else r.getDouble(1))
    }.toMap
    val missing = shares.keys.filterNot(g => counts.get(g).exists(_ > 0))
    require(missing.isEmpty,
      s"share groups absent from the data: ${missing.mkString(", ")}")
    val t = shares.map { case (g, s) => counts(g) / s }.min
    val rates = shares.map { case (g, s) => g -> (s * t / counts(g)) }
    val u = (score(col(idCol), seed) / lit(Long.MaxValue.toDouble) + 1d) / 2d
    val rate = element_at(typedLit(rates), col(groupCol))
    df.where(rate.isNotNull && u < rate)
  }

  /** Bernoulli sample at `rate` by hash threshold — content-deterministic
    * row-level sampling, no shuffle at all.
    *
    * Contract: `idCol` should be a (near-)unique row identity. Rows
    * sharing an id — including all NULL ids, which hash identically — are
    * kept or dropped TOGETHER by construction (hash determinism), which is
    * the right behavior for duplicate ids and surprising for NULLs.
    */
  def bernoulli(df: DataFrame, idCol: String, rate: Double,
      seed: Long = 42L): DataFrame = {
    require(rate >= 0 && rate <= 1)
    if (rate >= 1d) df // u < 1.0 would drop the row hashing exactly to MaxValue
    else {
      // map hash to [0,1) via unsigned-ish normalization
      val u = (score(col(idCol), seed) / lit(Long.MaxValue.toDouble) + 1d) / 2d
      df.where(u < rate)
    }
  }

  /** px58's parameters, shared with graft.Verify's aux export. */
  val ShuffleShardSeed: Long = 2026L
  val ShuffleShards: Int = 8

  /** Deterministic corpus shuffle + sharding — the training-data ORDERING
    * operator: every epoch pipeline needs a reproducible global
    * permutation of the corpus, sharded for parallel readers. Order is
    * the seeded hash `xxhash64(id, seed)` (ties broken by id — a total
    * order), shard is the hash mod `shards`, and `pos` is the row's
    * 0-based position within its shard under that order. Changing the
    * seed is a fresh epoch permutation; same seed is bit-identical across
    * runs (no engine RNG anywhere).
    *
    * Scale: there is NO global sort — the only exchange partitions by
    * `shard`, and each shard sorts |corpus|/shards rows independently
    * (pick shards ~ reader count at 100 TB, thousands; each per-shard
    * sort is then executor-sized). Writing `partitionBy(shard)` after
    * this yields ready-to-stream epoch files.
    */
  def shuffleShard(df: DataFrame, idCol: String,
      seed: Long = ShuffleShardSeed,
      shards: Int = ShuffleShards): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = score(col(idCol), seed)
    df.select(col(idCol), h.as("_h"))
      .withColumn("shard", pmod(col("_h"), lit(shards.toLong)).cast("int"))
      .withColumn("pos", (row_number().over(
        Window.partitionBy("shard").orderBy(col("_h"), col(idCol))) - 1)
        .cast("bigint"))
      .select(col(idCol), col("shard"), col("pos"))
  }
}

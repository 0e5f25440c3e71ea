package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling utilities for joins whose hot keys overwhelm single
  * reducers. Spark's first-choice answers remain `broadcast()` (no shuffle
  * at all) and AQE's skew-join splitting (sort-merge only, post-shuffle);
  * salting is the manual tool for the remaining case — a shuffled join
  * against a dimension too large to broadcast, with a hot-key histogram bad
  * enough that one reducer gets minutes of work.
  */
object Skew {

  /** Inner equi-join with the fact side salted into `salts` sub-keys and
    * the dimension side replicated `salts`×: every hot fact key now spreads
    * over `salts` reducers. The salt is content-independent (any assignment
    * yields the same join result), so it costs one extra column and a
    * dimension blow-up bounded by `salts × |dim|`.
    *
    * Equivalent to `fact.join(dim, key)` row-for-row (spec-checked).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "a _salt column collides with saltedJoin internals — alias it first")
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicated = dim
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the classic Column ↔ Expression converters, which are
  * `private[sql]` in Spark 4 (the Connect refactor hid them). Needed so
  * graft's native Catalyst expressions (graft.functions.*) can be exposed
  * as Columns without going through the string `expr()` parser.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `SparkSession.sessionUUID` is `private[sql]` in Spark 4; graft keys
    * its per-session caches on it (stable id, no strong session reference).
    */
  def sessionUUID(s: SparkSession): String =
    s.asInstanceOf[classic.SparkSession].sessionUUID

  /** Spark's standard WRONG_NUM_ARGS analysis error — the builder-side
    * arity refusal (`QueryCompilationErrors` is `private[sql]`).
    */
  def wrongNumArgs(fn: String, expected: Int, actual: Int): Throwable =
    errors.QueryCompilationErrors.wrongNumArgsError(fn, Seq(expected), actual)
}

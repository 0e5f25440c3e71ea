package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Stopword-vote language ID over a token array, as ONE native expression.
  *
  * Semantics are exactly the cascade of graft.pipeline.TextAnalysis.langId's
  * column form: `labels(i)` wins iff its stopword-hit count is > 0 and ≥
  * every later label's count; `fallback` when no set hits. Collapsing the
  * 4 counts + CASE into a single expression matters because the column form
  * referenced the interpreted `filter()` lambda once per comparison —
  * higher-order functions are excluded from both codegen and subexpression
  * elimination, so the tokenizer ran ~12× per row (≈30 s over sf0.1).
  * Here: one membership pass per row, inside codegen.
  */
case class StopLang(child: Expression, sets: Seq[Seq[String]],
    labels: Seq[String], fallback: String) extends UnaryExpression {
  require(sets.length == labels.length, "one label per stopword set")

  override def dataType: DataType = StringType
  override def prettyName: String = "stop_lang"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"stop_lang requires array<string>, got ${other.catalogString}")
  }

  @transient private lazy val utf8Sets: Array[java.util.HashSet[UTF8String]] =
    sets.map { s =>
      val hs = new java.util.HashSet[UTF8String]()
      s.foreach(w => hs.add(UTF8String.fromString(w)))
      hs
    }.toArray
  @transient private lazy val utf8Labels: Array[UTF8String] =
    labels.map(UTF8String.fromString).toArray
  @transient private lazy val utf8Fallback: UTF8String =
    UTF8String.fromString(fallback)

  override protected def nullSafeEval(input: Any): Any =
    StopLang.pick(input.asInstanceOf[ArrayData], utf8Sets, utf8Labels, utf8Fallback)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("sets", utf8Sets, "java.util.HashSet[]")
    val labelsRef = ctx.addReferenceObj("labels", utf8Labels,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val fbRef = ctx.addReferenceObj("fallback", utf8Fallback,
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StopLang.pick($c, (java.util.HashSet[]) $setsRef, " +
        s"(org.apache.spark.unsafe.types.UTF8String[]) $labelsRef, " +
        s"(org.apache.spark.unsafe.types.UTF8String) $fbRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopLang =
    copy(child = newChild)
}

object StopLang {

  /** Static helper invoked from generated code — must stay public. */
  def pick(tokens: ArrayData, sets: Array[java.util.HashSet[UTF8String]],
      labels: Array[UTF8String], fallback: UTF8String): UTF8String = {
    val counts = new Array[Long](sets.length)
    val n = tokens.numElements()
    var k = 0
    while (k < n) {
      if (!tokens.isNullAt(k)) {
        val t = tokens.getUTF8String(k)
        var s = 0
        while (s < sets.length) {
          if (sets(s).contains(t)) counts(s) += 1
          s += 1
        }
      }
      k += 1
    }
    var i = 0
    while (i < counts.length) {
      var ok = counts(i) > 0
      var j = i + 1
      while (ok && j < counts.length) {
        if (counts(i) < counts(j)) ok = false
        j += 1
      }
      if (ok) return labels(i)
      i += 1
    }
    fallback
  }

  def apply(col: Column, sets: Seq[Seq[String]], labels: Seq[String],
      fallback: String): Column =
    GraftShim.column(StopLang(GraftShim.expression(col), sets, labels, fallback))
}

/** Drop empty and null elements from a string array — the tokenizer's
  * `filter(split(...), t => t != "")` tail as a native expression. The
  * lambda form is CodegenFallback, which pulls EVERY projection that
  * references tokens out of whole-stage codegen and (worse) out of
  * subexpression elimination; this keeps tokenization codegen'd end-to-end.
  */
case class DropEmpty(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "drop_empty"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"drop_empty requires array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    DropEmpty.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DropEmpty.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DropEmpty =
    copy(child = newChild)
}

object DropEmpty {

  /** Static helper invoked from generated code — must stay public. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var kept = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (s.numBytes() > 0) { out(kept) = s; kept += 1 }
      }
      i += 1
    }
    if (kept == n) arr
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], kept)
        .asInstanceOf[Array[Any]])
  }

  def apply(col: Column): Column =
    GraftShim.column(DropEmpty(GraftShim.expression(col)))
}

/** min/max/count sketch of xxhash64 over a string array (the 1-permutation
  * MinHash document fingerprint), as one native expression returning
  * `struct<fp_min, fp_max, fp_card>` in a single pass.
  *
  * Hash values are bit-identical to the `xxhash64(element)` column function
  * (same XxHash64Function, same default seed 42), so this replaces
  * `array_min(transform(sh, xxhash64)) / array_max(...) / size(sh)` — whose
  * interpreted `transform` lambdas re-derived the shingle set once per
  * field (≈11 s over sf0.1) — with one loop per row inside codegen.
  * fp_min/fp_max are NULL for an empty array, matching array_min/array_max.
  */
case class HashSketch(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("fp_min", LongType, nullable = true),
    StructField("fp_max", LongType, nullable = true),
    StructField("fp_card", LongType, nullable = false)))
  override def prettyName: String = "hash_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hash_sketch requires array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HashSketch.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashSketch.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): HashSketch =
    copy(child = newChild)
}

object HashSketch {

  /** Static helper invoked from generated code — must stay public. */
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var seen = 0L
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var k = 0
    while (k < n) {
      if (!arr.isNullAt(k)) {
        val h = XxHash64Function.hash(arr.getUTF8String(k), StringType, 42L)
        if (h < mn) mn = h
        if (h > mx) mx = h
        seen += 1
      }
      k += 1
    }
    if (seen == 0L)
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](null, null, n.toLong))
    else
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](mn, mx, n.toLong))
  }

  def apply(col: Column): Column =
    GraftShim.column(HashSketch(GraftShim.expression(col)))
}

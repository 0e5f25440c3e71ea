package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array, as a native expression.
  *
  * Replaces the `transform(sequence(1, size-n+1), i -> concat_ws(...))` +
  * `array_distinct` column pipeline, whose interpreted higher-order lambdas
  * cost ~8 s per evaluation over the sf0.1 corpus — and dedup pipelines
  * evaluate the shingle set 3-4× per query (inverted index, sizes,
  * signatures). One tight loop with a hash set brings that to
  * milliseconds and keeps rows inside codegen.
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles requires array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Shingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

/** Bag (duplicate-preserving) n-gram shingles — the counting form the
  * bigram language-model statistic needs (px37): same tight loop as
  * [[Shingles]] but emitting every occurrence in order. The
  * `transform(sequence(0, size-2), i -> concat(...))` column form this
  * replaces is an interpreted lambda (CodegenFallback) and was the
  * slowest per-row cost in the bench (px37: 5.5 s → sub-second at sf0.1).
  */
case class ShinglesBag(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles_bag"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles_bag requires array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShinglesBag.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShinglesBag.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesBag =
    copy(child = newChild)
}

object ShinglesBag {
  private val SPACE = UTF8String.fromString(" ")

  /** Static helper invoked from generated code — must stay public. */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val count = tokens.numElements() - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(SPACE, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(col: Column, n: Int): Column =
    GraftShim.column(ShinglesBag(GraftShim.expression(col), n))
}

object Shingles {
  private val SPACE = UTF8String.fromString(" ")

  /** Static helper invoked from generated code — must stay public. */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val count = tokens.numElements() - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < count) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(SPACE, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  def apply(col: Column, n: Int): Column =
    GraftShim.column(Shingles(GraftShim.expression(col), n))
}

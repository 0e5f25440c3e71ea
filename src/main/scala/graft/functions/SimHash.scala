package graft.functions

import org.apache.spark.sql.{Column, GraftShim, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array as a native Catalyst expression.
  *
  * The classic Charikar construction: each token is xxhash64'd; every bit
  * position accumulates a ±1 vote across tokens; the result bit is the vote
  * sign. One pass over the tokens per row, no shuffle; `doGenCode` emits a
  * single static call so rows stay inside WholeStageCodegen with no boxing
  * — the preferred extension shape (native Expression > Scala UDF).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Static helper invoked from generated code — must stay public. */
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    var k = 0
    val n = tokens.numElements()
    while (k < n) {
      if (!tokens.isNullAt(k)) {
        val h = XxHash64Function.hash(tokens.getUTF8String(k), StringType, 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      k += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  def apply(col: Column): Column =
    GraftShim.column(SimHash64(GraftShim.expression(col)))
}

/** Registers graft's native functions into a session — usable either via
  * `spark.sql.extensions=graft.functions.GraftExtensions` or the
  * programmatic [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.{IntegerLiteral, Literal}

  private def intArg(e: Expression, fn: String): Int = e match {
    case IntegerLiteral(v) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got $other")
  }

  private[functions] val descriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("simhash64"),
      new ExpressionInfo("graft.functions.SimHash64", "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)),
    (new FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo("graft.functions.MinHashSigs", "minhash_sigs"),
      (children: Seq[Expression]) =>
        MinHashSigs(children.head, intArg(children(1), "minhash_sigs"))),
    (new FunctionIdentifier("shingles"),
      new ExpressionInfo("graft.functions.Shingles", "shingles"),
      (children: Seq[Expression]) =>
        Shingles(children.head, intArg(children(1), "shingles"))),
    (new FunctionIdentifier("shingles_bag"),
      new ExpressionInfo("graft.functions.ShinglesBag", "shingles_bag"),
      (children: Seq[Expression]) =>
        ShinglesBag(children.head, intArg(children(1), "shingles_bag"))),
    (new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo("graft.functions.CosineSim", "cosine_sim"),
      (children: Seq[Expression]) => CosineSim(children.head, children(1))),
    (new FunctionIdentifier("hash_sketch"),
      new ExpressionInfo("graft.functions.HashSketch", "hash_sketch"),
      (children: Seq[Expression]) => HashSketch(children.head)),
    (new FunctionIdentifier("minhash_bands"),
      new ExpressionInfo("graft.functions.MinHashBands", "minhash_bands"),
      (children: Seq[Expression]) => MinHashBands(children.head,
        intArg(children(1), "minhash_bands"), intArg(children(2), "minhash_bands"))),
    (new FunctionIdentifier("dot_i64"),
      new ExpressionInfo("graft.functions.DotI64", "dot_i64"),
      (children: Seq[Expression]) => DotI64(children.head, children(1))),
    (new FunctionIdentifier("pack_i8"),
      new ExpressionInfo("graft.functions.PackI8", "pack_i8"),
      (children: Seq[Expression]) => PackI8(children.head)),
    (new FunctionIdentifier("dot_i8"),
      new ExpressionInfo("graft.functions.DotI8", "dot_i8"),
      (children: Seq[Expression]) => DotI8(children.head, children(1))))
  // NearestCentroid/CentroidDots (centroid matrix), HyperplaneSig (plane
  // matrix) and StopLang (stopword sets) carry non-SQL-literal payloads
  // and are Column-API-only.

  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

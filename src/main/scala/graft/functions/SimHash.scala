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

  /** Arity gate for the SQL builders: positional `children(i)` access
    * would otherwise turn a wrong argument count into an
    * IndexOutOfBoundsException (or silently ignore extras) instead of the
    * engine's standard WRONG_NUM_ARGS analysis error.
    */
  private def arity(fn: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children => {
      if (children.length != n)
        throw GraftShim.wrongNumArgs(fn, n, children.length)
      build(children)
    }

  private[functions] val descriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("simhash64"),
      new ExpressionInfo("graft.functions.SimHash64", "simhash64"),
      arity("simhash64", 1)(children => SimHash64(children.head))),
    (new FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo("graft.functions.MinHashSigs", "minhash_sigs"),
      arity("minhash_sigs", 2)(children =>
        MinHashSigs(children.head, intArg(children(1), "minhash_sigs")))),
    (new FunctionIdentifier("shingles"),
      new ExpressionInfo("graft.functions.Shingles", "shingles"),
      arity("shingles", 2)(children =>
        Shingles(children.head, intArg(children(1), "shingles")))),
    (new FunctionIdentifier("shingles_bag"),
      new ExpressionInfo("graft.functions.ShinglesBag", "shingles_bag"),
      arity("shingles_bag", 2)(children =>
        ShinglesBag(children.head, intArg(children(1), "shingles_bag")))),
    (new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo("graft.functions.CosineSim", "cosine_sim"),
      arity("cosine_sim", 2)(children => CosineSim(children.head, children(1)))),
    (new FunctionIdentifier("hash_sketch"),
      new ExpressionInfo("graft.functions.HashSketch", "hash_sketch"),
      arity("hash_sketch", 1)(children => HashSketch(children.head))),
    (new FunctionIdentifier("minhash_bands"),
      new ExpressionInfo("graft.functions.MinHashBands", "minhash_bands"),
      arity("minhash_bands", 3)(children => MinHashBands(children.head,
        intArg(children(1), "minhash_bands"), intArg(children(2), "minhash_bands")))),
    (new FunctionIdentifier("dot_i64"),
      new ExpressionInfo("graft.functions.DotI64", "dot_i64"),
      arity("dot_i64", 2)(children => DotI64(children.head, children(1)))),
    (new FunctionIdentifier("pack_i8"),
      new ExpressionInfo("graft.functions.PackI8", "pack_i8"),
      arity("pack_i8", 1)(children => PackI8(children.head))),
    (new FunctionIdentifier("unpack_i8"),
      new ExpressionInfo("graft.functions.UnpackI8", "unpack_i8"),
      arity("unpack_i8", 1)(children => UnpackI8(children.head))),
    (new FunctionIdentifier("dot_i8"),
      new ExpressionInfo("graft.functions.DotI8", "dot_i8"),
      arity("dot_i8", 2)(children => DotI8(children.head, children(1)))))
  // NearestCentroid/CentroidDots (centroid matrix), HyperplaneSig (plane
  // matrix) and StopLang (stopword sets) carry non-SQL-literal payloads
  // and are Column-API-only.

  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

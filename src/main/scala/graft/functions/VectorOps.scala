package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Nearest-centroid assignment for IVF-style vector indexes, as a native
  * expression. The centroid matrix rides along as a plan literal
  * (broadcast with the serialized expression); one fused loop computes
  * argmax of cosine against all centroids per row — the column-function
  * equivalent (`aggregate(zip_with(...))` per centroid) would be nlist
  * interpreted lambda passes per row.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires array<float>, got ${other.catalogString}")
  }

  @transient private lazy val normalized: Array[Array[Float]] =
    NearestCentroid.normalize(centroids)

  override protected def nullSafeEval(input: Any): Any =
    NearestCentroid.assign(input.asInstanceOf[ArrayData], normalized)

  // non-codegen (CodegenFallback-style) would drop the whole stage out of
  // codegen; instead emit a static call against a registry slot
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", normalized,
      "float[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NearestCentroid.assign($c, (float[][]) $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {

  private[functions] def normalize(cs: Array[Array[Float]]): Array[Array[Float]] =
    cs.map { c =>
      val n = math.sqrt(c.map(x => x.toDouble * x).sum).toFloat
      if (n == 0f) c else c.map(_ / n)
    }

  /** Static helper invoked from generated code — must stay public. */
  def assign(vec: ArrayData, centroids: Array[Array[Float]]): Int = {
    val v = vec.toFloatArray()
    var best = 0
    var bestScore = Double.MinValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var dot = 0.0
      var i = 0
      val d = math.min(v.length, cent.length)
      while (i < d) { dot += v(i).toDouble * cent(i); i += 1 }
      if (dot > bestScore) { bestScore = dot; best = c }
      c += 1
    }
    best
  }

  def apply(col: Column, centroids: Array[Array[Float]]): Column =
    GraftShim.column(NearestCentroid(GraftShim.expression(col), centroids))
}

/** Dot products of a vector against every (normalized) centroid, as
  * array<double> — the query-side companion of [[NearestCentroid]]: probing
  * the top-nprobe cells is a posexplode + rank over this array.
  */
case class CentroidDots(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def prettyName: String = "centroid_dots"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"centroid_dots requires array<float>, got ${other.catalogString}")
  }

  @transient private lazy val normalized: Array[Array[Float]] =
    NearestCentroid.normalize(centroids)

  override protected def nullSafeEval(input: Any): Any =
    CentroidDots.scores(input.asInstanceOf[ArrayData], normalized)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", normalized, "float[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CentroidDots.scores($c, (float[][]) $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidDots =
    copy(child = newChild)
}

object CentroidDots {

  /** Static helper invoked from generated code — must stay public. */
  def scores(vec: ArrayData,
      centroids: Array[Array[Float]]): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val v = vec.toFloatArray()
    val out = new Array[Any](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var dot = 0.0
      var i = 0
      val d = math.min(v.length, cent.length)
      while (i < d) { dot += v(i).toDouble * cent(i); i += 1 }
      out(c) = dot
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def apply(col: Column, centroids: Array[Array[Float]]): Column =
    GraftShim.column(CentroidDots(GraftShim.expression(col), centroids))
}

package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

/** Cosine similarity of two float vectors as a native expression. Replaces
  * the `aggregate(zip_with(...))` column composition, whose higher-order
  * lambdas evaluate interpreted (and are excluded from subexpression
  * elimination) — at 3 dot products per pair that was the dominant cost of
  * every similarity query. Accumulation is sequential ascending-index in
  * double, identical to the fold the column form performed, so scores (and
  * the DuckDB oracle hashes built on them) are bit-for-bit unchanged.
  * NULL when either vector has zero norm (as the column form's divide-by-
  * zero → NULL semantics).
  */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires (array<float>, array<float>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.CosineSim.compute($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Static helper invoked from generated code — must stay public.
    * Returns null (boxed) when either norm is zero.
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val x = a.toFloatArray()
    val y = b.toFloatArray()
    // ragged pair → NULL, as the zip_with fold this replaces did (its null
    // padding null-propagated); a finite min-length dot here would silently
    // rank on a non-cosine number instead
    if (x.length != y.length) return null
    val d = x.length
    var dot = 0.0
    var i = 0
    while (i < d) { dot += x(i).toDouble * y(i).toDouble; i += 1 }
    var na = 0.0
    i = 0
    while (i < x.length) { na += x(i).toDouble * x(i).toDouble; i += 1 }
    var nb = 0.0
    i = 0
    while (i < y.length) { nb += y(i).toDouble * y(i).toDouble; i += 1 }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  def apply(a: Column, b: Column): Column =
    GraftShim.column(CosineSim(GraftShim.expression(a), GraftShim.expression(b)))
}

/** The Euclidean norm √(Σx²) of a float vector, accumulated in double
  * ascending-index — EXACTLY the per-pair norm loop inside
  * [[CosineSim.compute]], factored out so serving plans can compute each
  * row's norm ONCE instead of once per candidate pair (r18, guide §1.2
  * step 2: px64 scores ~25M pairs over 10k distinct vectors — the two
  * norm loops were ⅔ of the kernel's arithmetic, recomputed ~2500× per
  * vector). Feeding these into [[CosineSimPre]] reproduces CosineSim
  * bit-for-bit.
  */
case class VecNorm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "vec_norm"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_norm requires array<float>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    VecNorm.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecNorm.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

object VecNorm {

  /** Static helper invoked from generated code — must stay public.
    * Identical accumulation to the norm loops in [[CosineSim.compute]].
    */
  def compute(vec: ArrayData): Double = {
    val x = vec.toFloatArray()
    var n = 0.0
    var i = 0
    while (i < x.length) { n += x(i).toDouble * x(i).toDouble; i += 1 }
    math.sqrt(n)
  }

  def apply(col: Column): Column =
    GraftShim.column(VecNorm(GraftShim.expression(col)))
}

/** [[CosineSim]] with the two norms PRE-COMPUTED per row ([[VecNorm]]):
  * one dot loop per pair, `dot / (normA · normB)` — operands, order and
  * null semantics identical to CosineSim (ragged pair → NULL, zero
  * denominator → NULL), so scores are bit-for-bit unchanged and the
  * 6-dp-rounded order keys (and every DuckDB oracle built on them)
  * cannot move. The win is arithmetic only: candidate-pair scoring
  * drops from 3 passes over both vectors to 1.
  */
case class CosineSimPre(a: Expression, b: Expression,
    na: Expression, nb: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim_pre"
  override def first: Expression = a
  override def second: Expression = b
  override def third: Expression = na
  override def fourth: Expression = nb

  override def checkInputDataTypes(): TypeCheckResult =
    (a.dataType, b.dataType, na.dataType, nb.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _),
            org.apache.spark.sql.types.DoubleType,
            org.apache.spark.sql.types.DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r, x, y) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim_pre requires (array<float>, array<float>, double, " +
          s"double), got (${l.catalogString}, ${r.catalogString}, " +
          s"${x.catalogString}, ${y.catalogString})")
    }

  override protected def nullSafeEval(va: Any, vb: Any, xna: Any,
      xnb: Any): Any =
    CosineSimPre.compute(va.asInstanceOf[ArrayData],
      vb.asInstanceOf[ArrayData], xna.asInstanceOf[Double],
      xnb.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (va, vb, xna, xnb) => {
      s"""
         |java.lang.Double ${ev.value}_r =
         |  graft.functions.CosineSimPre.compute($va, $vb, $xna, $xnb);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newA: Expression,
      newB: Expression, newNa: Expression, newNb: Expression): CosineSimPre =
    copy(a = newA, b = newB, na = newNa, nb = newNb)
}

object CosineSimPre {

  /** Static helper invoked from generated code — must stay public.
    * `na`/`nb` must be the [[VecNorm]] of `a`/`b`; then the result equals
    * [[CosineSim.compute]](a, b) bit-for-bit.
    */
  def compute(a: ArrayData, b: ArrayData, na: Double,
      nb: Double): java.lang.Double = {
    val x = a.toFloatArray()
    val y = b.toFloatArray()
    if (x.length != y.length) return null
    var dot = 0.0
    var i = 0
    while (i < x.length) { dot += x(i).toDouble * y(i).toDouble; i += 1 }
    val denom = na * nb
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  def apply(a: Column, b: Column, na: Column, nb: Column): Column =
    GraftShim.column(CosineSimPre(GraftShim.expression(a),
      GraftShim.expression(b), GraftShim.expression(na),
      GraftShim.expression(nb)))
}

/** Integer dot product of two array<bigint> columns (NULL on ragged
  * pairs, like [[CosineSim]]) — the scoring kernel for quantized (int8)
  * similarity search, where exactness matters: every input and output is
  * an integer, so rankings carry no floating rounding class at all.
  */
case class DotI64(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_i64"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.LongType, _),
            ArrayType(org.apache.spark.sql.types.LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_i64 requires (array<bigint>, array<bigint>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotI64.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.functions.DotI64.compute($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotI64 =
    copy(left = newLeft, right = newRight)
}

object DotI64 {

  /** Static helper invoked from generated code — must stay public. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val x = a.toLongArray()
    val y = b.toLongArray()
    if (x.length != y.length) return null
    var dot = 0L
    var i = 0
    while (i < x.length) { dot += x(i) * y(i); i += 1 }
    java.lang.Long.valueOf(dot)
  }

  def apply(a: Column, b: Column): Column =
    GraftShim.column(DotI64(GraftShim.expression(a), GraftShim.expression(b)))
}

/** Pack int8 quantization codes (array<bigint>, every element in
  * [-128, 127]) into a binary column, one signed byte per element — the
  * storage shape of a quantized ANN index: 1 byte/dim on disk instead of
  * a 4-byte float (or an 8-byte bigint array element), so the serving
  * scan of a code-carrying cells table reads ~4× fewer bytes than the
  * float column it replaces. Out-of-range elements fail loudly — silent
  * wrapping would corrupt every dot product downstream.
  */
case class PackI8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "pack_i8"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pack_i8 requires array<bigint>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PackI8.pack(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PackI8.pack($c)")

  override protected def withNewChildInternal(newChild: Expression): PackI8 =
    copy(child = newChild)
}

object PackI8 {

  /** Static helper invoked from generated code — must stay public. */
  def pack(codes: ArrayData): Array[Byte] = {
    val xs = codes.toLongArray()
    val out = new Array[Byte](xs.length)
    var i = 0
    while (i < xs.length) {
      val x = xs(i)
      if (x < Byte.MinValue || x > Byte.MaxValue)
        throw new IllegalArgumentException(
          s"pack_i8: code $x at index $i outside [-128, 127]")
      out(i) = x.toByte
      i += 1
    }
    out
  }

  def apply(col: Column): Column =
    GraftShim.column(PackI8(GraftShim.expression(col)))
}

/** Inverse of [[PackI8]]: a packed-int8 binary column back to
  * `array<bigint>` codes — the export/explode shape (e.g. unpacking the
  * per-subspace PQ codes stored inside a persisted index's cells table
  * into the long form an ADC lookup join consumes). Total: every byte is
  * a valid signed int8.
  */
case class UnpackI8(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "unpack_i8"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unpack_i8 requires binary, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    UnpackI8.unpack(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnpackI8.unpack($c)")

  override protected def withNewChildInternal(newChild: Expression): UnpackI8 =
    copy(child = newChild)
}

object UnpackI8 {

  /** Static helper invoked from generated code — must stay public. */
  def unpack(bytes: Array[Byte]): ArrayData = {
    val out = new Array[Long](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i).toLong; i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  def apply(col: Column): Column =
    GraftShim.column(UnpackI8(GraftShim.expression(col)))
}

/** Integer dot product of two packed-int8 binary columns (NULL on ragged
  * pairs, like [[DotI64]]) — the scoring kernel for serving from a
  * quantized index: the whole loop is signed-byte multiplies accumulated
  * in a long, exact by construction (max |dot| = dim·127² ≪ 2⁶³).
  */
case class DotI8(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_i8"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.BinaryType,
            org.apache.spark.sql.types.BinaryType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_i8 requires (binary, binary), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotI8.compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.functions.DotI8.compute($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotI8 =
    copy(left = newLeft, right = newRight)
}

object DotI8 {

  /** Static helper invoked from generated code — must stay public. */
  def compute(a: Array[Byte], b: Array[Byte]): java.lang.Long = {
    if (a.length != b.length) return null
    var dot = 0L
    var i = 0
    while (i < a.length) { dot += a(i).toLong * b(i).toLong; i += 1 }
    java.lang.Long.valueOf(dot)
  }

  def apply(a: Column, b: Column): Column =
    GraftShim.column(DotI8(GraftShim.expression(a), GraftShim.expression(b)))
}

/** ADC score of one packed-codes vector against a per-query lookup
  * table: `Σ_sub parts[sub·stride + codes[sub]]` — the integer
  * asymmetric-distance sum the (posexplode codes → join LUT rows on
  * (qid, sub, code) → groupBy sum) pipeline computed, as ONE codegen'd
  * pass per candidate row (r18): no m× row blowup, no 3-key hash join,
  * no re-aggregation exchange. Exact integer arithmetic — identical
  * sums in any order. `parts` is the query's LUT laid out positionally
  * (sub-major, code-minor — [[graft.pipeline.Similarity]] builds it with
  * a sorted collect over the SAME rounded-float-dot parts the join path
  * consumed, and only uses this path when the codebook grid is dense).
  * NULL on a NULL child; a codes/parts length mismatch fails loudly —
  * silent truncation would mis-score every candidate.
  */
case class AdcSum(left: Expression, right: Expression, stride: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(stride > 0, s"adc_sum requires stride > 0, got $stride")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "adc_sum"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.BinaryType,
            ArrayType(org.apache.spark.sql.types.LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_sum requires (binary, array<bigint>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    AdcSum.compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[ArrayData],
      stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.AdcSum.compute($a, $b, $stride)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcSum =
    copy(left = newLeft, right = newRight)
}

object AdcSum {

  /** Static helper invoked from generated code — must stay public. */
  def compute(codes: Array[Byte], parts: ArrayData, stride: Int): Long = {
    val p = parts.toLongArray()
    if (p.length != codes.length * stride)
      throw new IllegalArgumentException(
        s"adc_sum: LUT length ${p.length} != ${codes.length} subspaces × " +
          s"stride $stride — codebook grid and codes disagree")
    var sum = 0L
    var sub = 0
    while (sub < codes.length) {
      val code = codes(sub)
      if (code < 0 || code >= stride)
        throw new IllegalArgumentException(
          s"adc_sum: code $code at subspace $sub outside [0, $stride)")
      sum += p(sub * stride + code)
      sub += 1
    }
    sum
  }

  def apply(codes: Column, parts: Column, stride: Int): Column =
    GraftShim.column(AdcSum(GraftShim.expression(codes),
      GraftShim.expression(parts), stride))
}

/** Random-hyperplane LSH signature: bit i of the result is set iff
  * vec · planes(i) > 0. One fused pass per row — the column composition
  * (a fold of `aggregate(zip_with(...))` per bit) evaluated `bits`
  * interpreted lambda passes per row per table, which made signature
  * computation the dominant cost of every LSH query. The plane matrix
  * rides along as a plan literal like [[NearestCentroid]]'s centroids.
  */
case class HyperplaneSig(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "hyperplane_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig requires array<float>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneSig.compute(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HyperplaneSig.compute($c, (double[][]) $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {

  /** Static helper invoked from generated code — must stay public. */
  def compute(vec: ArrayData, planes: Array[Array[Double]]): Long = {
    val v = vec.toFloatArray()
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var dot = 0.0
      var i = 0
      val d = math.min(v.length, plane.length)
      while (i < d) { dot += v(i).toDouble * plane(i); i += 1 }
      if (dot > 0.0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  def apply(col: Column, planes: Array[Array[Double]]): Column =
    GraftShim.column(HyperplaneSig(GraftShim.expression(col), planes))
}

/** Symmetric int8 quantization of one vector as ONE native pass (r19) —
  * the codes `floor(x·127/max|x| + 0.5)` (all-zero for zero/empty/
  * all-NULL vectors) that [[graft.pipeline.Similarity]]'s withCodes /
  * packedCodes / quantizeInt8 previously built from a chain of
  * higher-order `transform`/`array_max` lambdas, which evaluate
  * INTERPRETED per element (guide §4.1: prefer codegen'd expressions) —
  * measured as the dominant per-row cost of the x4/px38/px44/px47
  * quantization family and of the index build's codes column. Numerics
  * replicate the lambda chain exactly (FunctionsSpec pins bit equality):
  * element casts to double, max|x| skips NULL elements with NaN greatest
  * (Spark's array_max order), the `> 0` gate uses Spark's double
  * comparison (NaN > 0 true), NULL elements yield NULL codes in the
  * scaled branch but 0 in the zero branch, and floor(double)→long uses
  * the Java cast like Spark's Floor.
  */
case class IntCodes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.LongType, containsNull = true)
  override def prettyName: String = "int_codes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(org.apache.spark.sql.types.DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int_codes requires array<float|double>, got ${other.catalogString}")
  }

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    IntCodes.codes(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.IntCodes.codes($c, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): IntCodes =
    copy(child = newChild)
}

object IntCodes {

  private[functions] def elem(vec: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)

  /** max |x| over non-NULL elements, NaN greatest (array_max's order);
    * returns NaN-boxed "none" as Double.NaN with `any=false` folded into
    * the caller via the returned (found, value) encoding: NegativeInfinity
    * start cannot be used because a genuine -Inf element must win over
    * "nothing seen". */
  private def maxAbs(vec: ArrayData, isFloat: Boolean): (Boolean, Double) = {
    val n = vec.numElements()
    var any = false
    var ma = 0.0
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        val a = math.abs(elem(vec, i, isFloat))
        if (!any) { ma = a; any = true }
        else if (a > ma || java.lang.Double.isNaN(a)) ma = a
      }
      i += 1
    }
    (any, ma)
  }

  /** Static helper invoked from generated code — must stay public. */
  def codes(vec: ArrayData, isFloat: Boolean): GenericArrayData = {
    val n = vec.numElements()
    val (any, ma) = maxAbs(vec, isFloat)
    val out = new Array[Any](n)
    // Spark's GreaterThan on doubles: NaN > 0 is TRUE (total order)
    val scaled = any && (ma > 0.0 || java.lang.Double.isNaN(ma))
    var i = 0
    while (i < n) {
      out(i) =
        if (!scaled) java.lang.Long.valueOf(0L)
        else if (vec.isNullAt(i)) null
        else java.lang.Long.valueOf(
          math.floor(elem(vec, i, isFloat) * 127.0 / ma + 0.5).toLong)
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(col: Column): Column =
    GraftShim.column(IntCodes(GraftShim.expression(col)))
}

/** The per-row quantization scale correction `max|x| / (127·‖x‖)` (0 for
  * zero/empty/all-NULL vectors) as one native pass — the qscale column
  * [[graft.pipeline.Similarity.qscaleOf]] previously derived through the
  * same interpreted lambda chain as [[IntCodes]]; numerics replicated
  * exactly (same maxAbs fold, Σx² in ascending index order, one divide).
  * NULL elements contribute NULL to the lambda form's x·x fold — which
  * null-poisons the SQL `aggregate` — so the norm term reproduces that:
  * any NULL element yields a NULL scale in the scaled branch.
  */
case class QScale(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "q_scale"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(org.apache.spark.sql.types.DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"q_scale requires array<float|double>, got ${other.catalogString}")
  }

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    QScale.compute(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.QScale.compute($c, $isFloat);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QScale =
    copy(child = newChild)
}

object QScale {

  /** Static helper invoked from generated code — must stay public. */
  def compute(vec: ArrayData, isFloat: Boolean): java.lang.Double = {
    val n = vec.numElements()
    var any = false
    var ma = 0.0
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        val a = math.abs(IntCodes.elem(vec, i, isFloat))
        if (!any) { ma = a; any = true }
        else if (a > ma || java.lang.Double.isNaN(a)) ma = a
      }
      i += 1
    }
    if (!(any && (ma > 0.0 || java.lang.Double.isNaN(ma))))
      return java.lang.Double.valueOf(0.0)
    var ss = 0.0
    i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null // the lambda fold null-poisons
      val x = IntCodes.elem(vec, i, isFloat)
      ss += x * x
      i += 1
    }
    java.lang.Double.valueOf(ma / (127.0 * math.sqrt(ss)))
  }

  def apply(col: Column): Column =
    GraftShim.column(QScale(GraftShim.expression(col)))
}

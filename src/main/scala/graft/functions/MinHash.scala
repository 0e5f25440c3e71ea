package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** MinHash signature of a shingle set as a native Catalyst expression:
  * `numHashes` simulated permutations in ONE pass over the shingles.
  *
  * Each shingle is xxhash64'd once; permutation j sees `mix(h, j)` (a
  * Murmur3-style avalanche of h ⊕ seed(j)) — equivalent quality to k
  * independent hash functions at 1/k of the hashing cost, and ~100×
  * cheaper than the naive `transform(sequence(0,63), j ->
  * array_min(transform(sh, s -> xxhash64(concat(s, '#', j)))))` column
  * expression, which evaluates 64 interpreted lambdas per row.
  */
case class MinHashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigs.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSigs.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {

  /** fmix64 finalizer (MurmurHash3 / SplitMix64 style avalanche). */
  @inline private def mix(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** Static helper invoked from generated code — must stay public. */
  def compute(shingles: ArrayData, numHashes: Int): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var k = 0
    val n = shingles.numElements()
    while (k < n) {
      if (!shingles.isNullAt(k)) {
        val h = XxHash64Function.hash(shingles.getUTF8String(k), StringType, 42L)
        var j = 0
        while (j < numHashes) {
          val m = mix(h ^ (0x9e3779b97f4a7c15L * (j + 1)))
          if (m < sig(j)) sig(j) = m
          j += 1
        }
      }
      k += 1
    }
    new GenericArrayData(sig)
  }

  def apply(col: Column, numHashes: Int): Column =
    GraftShim.column(MinHashSigs(GraftShim.expression(col), numHashes))
}

/** Banded LSH bucket hashes fused with the MinHash signature: band b's
  * hash is xxhash64 of the comma-joined decimal signature values of its
  * rows — BIT-IDENTICAL to the column composition it replaces
  * (`transform(sequence(...), b => xxhash64(concat_ws(",", transform(
  * slice(sig, ...), cast-to-string))))`), whose nested interpreted lambdas
  * ran per row per band. One pass: signature, then bands.
  */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {
  require(numHashes % bands == 0, "numHashes must divide evenly into bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands requires array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashBands.compute(input.asInstanceOf[ArrayData], numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashBands.compute($c, $numHashes, $bands)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBands {
  import org.apache.spark.unsafe.types.UTF8String

  /** Static helper invoked from generated code — must stay public. */
  def compute(shingles: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    val sig = MinHashSigs.compute(shingles, numHashes).toLongArray()
    val rows = numHashes / bands
    val out = new Array[Any](bands)
    val sb = new java.lang.StringBuilder(rows * 21)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var j = 0
      while (j < rows) {
        if (j > 0) sb.append(',')
        sb.append(sig(b * rows + j))
        j += 1
      }
      out(b) = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      b += 1
    }
    new GenericArrayData(out)
  }

  def apply(col: Column, numHashes: Int, bands: Int): Column =
    GraftShim.column(MinHashBands(GraftShim.expression(col), numHashes, bands))
}

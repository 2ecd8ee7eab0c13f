package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** One-pass residual IVF-PQ encode of a float-array embedding against a
  * fixed coarse-centroid matrix and residual codebooks, as a native
  * codegen'd Catalyst expression: returns `array<int>` of length m+1 —
  * `[cell, code_0, …, code_{m-1}]`.
  *
  * The higher-order-function chain it replaces ([[IvfPqEncode.hof]]-
  * equivalent: NearestCell for the cell, a zip_with residual, then per
  * subspace a transform/aggregate argmin over codebook LITERALS) is the
  * right semantics but the wrong engine shape at full resolution:
  * Spark's HOFs evaluate an interpreted lambda per element and allocate
  * an intermediate array per codeword, so the encode scan at
  * m=16 × 256 codes measured ~100× the arithmetic cost (≈500 s for
  * 200k vectors where this expression's loop is ~3·10⁹ multiply-adds).
  * One expression, one pass: coarse assignment and all m residual
  * argmins share the single residual computation, and the generated
  * code is one static call however large (k, m, nCodes) grow.
  *
  * Semantics are BIT-IDENTICAL to the HOF chain (VectorsSpec pins the
  * equivalence), which is what keeps the residual IVF-PQ DuckDB oracles
  * exact:
  *   - cell: [[NearestCell.assign]]'s left-associated squared-distance
  *     fold in ascending element order, first-minimum argmin;
  *   - residual i = (double) emb(i) − cents(cell)(i);
  *   - per-subspace distance to codeword: left-associated
  *     `(0.0 + (r0−w0)² + …)` ascending, argmin = first minimum
  *     (`array_position(dists, array_min(dists))` semantics);
  *   - null embedding, null element, or length mismatch → null.
  */
case class IvfPqEncode(child: Expression, cents: Array[Array[Double]],
    codebooks: Array[Array[Array[Double]]]) extends UnaryExpression {

  private val k = cents.length
  private val d = if (k > 0) cents(0).length else 0
  private val m = codebooks.length
  private val nCodes = if (m > 0) codebooks(0).length else 0
  private val sub = if (m > 0) d / m else 0

  private lazy val flatCents: Array[Double] = {
    val f = new Array[Double](k * d)
    var c = 0
    while (c < k) { System.arraycopy(cents(c), 0, f, c * d, d); c += 1 }
    f
  }
  // [j][c][i] row-major: subspace-major so a subspace's codewords are
  // contiguous in the argmin loop
  private lazy val flatBooks: Array[Double] = {
    val f = new Array[Double](m * nCodes * sub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < nCodes) {
        System.arraycopy(codebooks(j)(c), 0, f, (j * nCodes + c) * sub, sub)
        c += 1
      }
      j += 1
    }
    f
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"ivfpq_encode requires array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    IvfPqEncode.encode(v.asInstanceOf[ArrayData], flatCents, flatBooks,
      k, d, m, nCodes, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("ivfpqCents", flatCents, "double[]")
    val booksRef = ctx.addReferenceObj("ivfpqBooks", flatBooks, "double[]")
    val res = ctx.freshName("pqEnc")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |ArrayData $res = graft.functions.IvfPqEncode.encode(
         |  $c, $centsRef, $booksRef, $k, $d, $m, $nCodes, $sub);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "ivfpq_encode"

  // Case-class equals/hashCode on Array args are reference-based, which
  // would make two semantically identical encodes never canonicalize
  // together (defeating subexpression elimination and exchange reuse).
  // Compare the flattened model matrices structurally instead.
  override def equals(other: Any): Boolean = other match {
    case that: IvfPqEncode =>
      child == that.child && k == that.k && d == that.d &&
        m == that.m && nCodes == that.nCodes &&
        java.util.Arrays.equals(flatCents, that.flatCents) &&
        java.util.Arrays.equals(flatBooks, that.flatBooks)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child,
      Integer.valueOf(java.util.Arrays.hashCode(flatCents)),
      Integer.valueOf(java.util.Arrays.hashCode(flatBooks)))
}

object IvfPqEncode {
  /** Tight loops, one residual buffer; static so generated code calls
    * it directly. Returns `[cell :: codes]`, or null on malformed
    * input (the HOF chain's null-propagation semantics). */
  def encode(a: ArrayData, cents: Array[Double], books: Array[Double],
      k: Int, d: Int, m: Int, nCodes: Int, sub: Int): ArrayData = {
    if (a.numElements() != d || k == 0 || m == 0) return null
    var i = 0
    while (i < d) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    var cell = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
      val base = c * d
      var s = 0.0
      i = 0
      while (i < d) {
        val t = a.getFloat(i).toDouble - cents(base + i)
        s += t * t
        i += 1
      }
      if (s < bestD) { bestD = s; cell = c } // strict <: first min wins
      c += 1
    }
    val resid = new Array[Double](d)
    val cbase = cell * d
    i = 0
    while (i < d) { resid(i) = a.getFloat(i).toDouble - cents(cbase + i); i += 1 }
    val out = new Array[Int](m + 1)
    out(0) = cell
    var j = 0
    while (j < m) {
      var bestC = 0
      var bestS = Double.MaxValue
      c = 0
      while (c < nCodes) {
        val wbase = (j * nCodes + c) * sub
        val rbase = j * sub
        var s = 0.0
        i = 0
        while (i < sub) {
          val t = resid(rbase + i) - books(wbase + i)
          s += t * t
          i += 1
        }
        if (s < bestS) { bestS = s; bestC = c } // strict <: first min wins
        c += 1
      }
      out(j + 1) = bestC
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def ivfpq_encode(emb: Column, cents: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): Column =
    GraftBridge.column(
      IvfPqEncode(GraftBridge.expression(emb), cents, codebooks))
}

/** ADC fold over (codes, per-query flat LUT): Σ_j lut[j·nCodes +
  * codes_j], accumulated left-to-right from 0.0 in ascending subspace
  * order — bit-identical to the `aggregate(zip_with(codes, idx, …))`
  * HOF chain it replaces (which allocated two arrays and evaluated 2m
  * interpreted lambdas per scanned row). nCodes is inferred as
  * lut.length / codes.length, so the expression needs no constant.
  * An out-of-range code (corrupt input) yields null, as element_at's
  * null-propagation did under non-ANSI fallback.
  */
case class AdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"adc_score requires (array<int>, array<double>), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    AdcScore.score(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("adcRes")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |Object $res = graft.functions.AdcScore.score($a, $b);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Double) $res).doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "adc_score"
}

object AdcScore {
  /** Static, allocation-free. Null on empty codes, a null element (in
    * EITHER array — a null LUT slot must propagate like element_at's
    * null, not read as 0.0), or an out-of-range lookup. */
  def score(codes: ArrayData, lut: ArrayData): java.lang.Double = {
    val m = codes.numElements()
    val n = lut.numElements()
    if (m == 0 || n == 0 || n % m != 0) return null
    val nCodes = n / m
    var s = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      if (c < 0 || c >= nCodes) return null
      if (lut.isNullAt(j * nCodes + c)) return null
      s += lut.getDouble(j * nCodes + c)
      j += 1
    }
    java.lang.Double.valueOf(s)
  }

  def adc_score(codes: Column, lut: Column): Column =
    GraftBridge.column(
      AdcScore(GraftBridge.expression(codes), GraftBridge.expression(lut)))
}

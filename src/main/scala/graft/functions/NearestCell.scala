package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Nearest-centroid cell id of a float-array embedding against a fixed
  * centroid matrix, as a native codegen'd Catalyst expression — the
  * scale path for the coarse quantizer behind semantic dedup and IVF.
  *
  * The higher-order-function formulation it replaces (transform over a
  * constant-folded centroid array, aggregate+zip_with per cell) is
  * fine at the registered k = 16, but its per-row cost is k lambda
  * chains and k intermediate arrays — at the corpus-scaled k the
  * SemDeDup recipe calls for (k ≈ n/125, thousands of cells) the
  * interpreted-lambda overhead dominates the whole scan. This
  * expression is one allocation-free loop over a broadcast-referenced
  * flat double[], O(k·d) multiply-adds per row, and the generated code
  * is a single static call however large k grows.
  *
  * Semantics are BIT-IDENTICAL to the HOF form (VectorsSpec pins the
  * equivalence), which is what keeps the dedup_semantic /
  * similarity_topk_ivf DuckDB oracles exact:
  *   - squared distance per cell is the left-associated double fold
  *     `(0.0 + (e0-c0)² + (e1-c1)² + …)` in ascending element order —
  *     the same association as the SQL replay's sum chain;
  *   - argmin takes the FIRST index attaining the minimum (strict-<
  *     update), matching `array_position(dists, array_min(dists))`;
  *   - a null embedding, a null element, or a length mismatch against
  *     the centroid width yields null, exactly as the HOF chain's
  *     null-propagation does.
  */
case class NearestCell(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  private val k = cents.length
  private val d = if (k > 0) cents(0).length else 0
  // flattened row-major: the codegen reference object and the eval path
  // share it, so interpreted and compiled rows see the same doubles
  private lazy val flat: Array[Double] = {
    val f = new Array[Double](k * d)
    var c = 0
    while (c < k) {
      System.arraycopy(cents(c), 0, f, c * d, d); c += 1
    }
    f
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true // malformed input -> null

  // assign() reads elements with getFloat: anything but array<float>
  // must fail at analysis time, not yield garbage distances at runtime
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"nearest_cell requires array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    NearestCell.assign(v.asInstanceOf[ArrayData], flat, k, d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("nearestCellCents", flat, "double[]")
    // freshName: two nearest_cell calls fused into one codegen scope must
    // not both declare the same local, or Janino rejects the whole stage
    val res = ctx.freshName("ncRes")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |Object $res = graft.functions.NearestCell.assign($c, $centsRef, $k, $d);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Integer) $res).intValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "nearest_cell"
}

object NearestCell {
  /** Tight loop, no allocation; static so generated code calls it
    * directly. Returns a boxed Integer cell id, or null for a
    * length-mismatched input or a null element (the HOF chain's
    * null-propagation semantics). */
  def assign(a: ArrayData, flat: Array[Double], k: Int, d: Int): Integer = {
    if (a.numElements() != d || k == 0) return null
    var i = 0
    while (i < d) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
      val base = c * d
      var s = 0.0
      i = 0
      while (i < d) {
        val t = a.getFloat(i).toDouble - flat(base + i)
        s += t * t
        i += 1
      }
      if (s < bestD) { bestD = s; best = c } // strict <: first min wins
      c += 1
    }
    Integer.valueOf(best)
  }

  def nearest_cell(emb: Column, cents: Array[Array[Double]]): Column =
    GraftBridge.column(NearestCell(GraftBridge.expression(emb), cents))
}

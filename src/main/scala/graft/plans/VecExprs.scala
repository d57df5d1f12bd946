package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector hot paths.
  *
  * Spark's own array folds (`aggregate`, `zip_with`, `transform`) are
  * CodegenFallback: every evaluation leaves whole-stage codegen for
  * interpreted eval with per-row closure dispatch and array allocation —
  * ~50× slower in pairwise ANN/dedup scoring loops. The first fix
  * (round 4) unrolled dots into flat `element_at(a,i)*element_at(b,i)`
  * chains, which codegens but costs OnePlanNodePerTerm: a 64-dim dot is
  * a 64-node subtree, repeated per use, so analysis/optimization/AQE
  * re-planning walk thousands of nodes per query — at bench scale the
  * DRIVER became the bottleneck (q_knn_lsh: ~7 s of stages inside ~19 s
  * of wall).
  *
  * [[DotProductExpr]] is the end state: ONE plan node whose doGenCode
  * emits the tight loop. Addition order is ascending-index,
  * left-associative — bit-identical to both the unrolled chain and
  * DuckDB's `list_dot_product`, so oracle hashes are unchanged.
  *
  * Null semantics: NULL array on either side → NULL (standard
  * BinaryExpression null propagation), and MISMATCHED LENGTHS → NULL —
  * a malformed embedding must surface as a visible null, not silently
  * score against a truncated prefix (the zip_with/element_at
  * predecessors both returned NULL here; keeping that contract also
  * keeps Similarity.dot/cosine and rhpBucketSlice honest). Null
  * ELEMENTS are read as 0.0 (primitive accessor) — embeddings with
  * null components are not meaningful inputs; declare them out of
  * scope rather than paying a per-element branch in the hot loop.
  */
object VecExprs {

  /** `vec_dot(a, b)` over array<double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** `mat_mul(a, b)` over array<array<double>> matrix columns
    * (reference: ndarray `@` matmul on expression columns —
    * internals/expression.py:244 `__matmul__` → operator.matmul,
    * numpy-backed in the engine). */
  def matMul(a: Column, b: Column): Column =
    ColumnBridge.column(MatMulExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

case class MatMulExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private val matType = ArrayType(ArrayType(DoubleType))
  override def inputTypes = Seq(matType, matType)
  override def dataType: DataType = matType
  override def prettyName: String = "mat_mul"

  /** C = A(m×k) · B(k×n); C[i][j] = Σ_l ascending A[i][l]·B[l][j] (the
    * same left-to-right order as [[DotProductExpr]] and DuckDB list_sum,
    * for oracle bit-parity). Shape mismatch (a row of A not exactly k
    * long, ragged B) → NULL, the soft-error convention. CodegenFallback is
    * deliberate here, unlike the dot: the fallback's cost is one virtual
    * dispatch per ROW, amortized over O(m·k·n) arithmetic inside eval —
    * not the per-element dispatch that made fold-based dots slow. */
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val A = a.asInstanceOf[ArrayData]
    val B = b.asInstanceOf[ArrayData]
    val m = A.numElements()
    val k = B.numElements()
    if (m == 0 || k == 0) return null
    val b0 = B.getArray(0)
    if (b0 == null) return null
    val n = b0.numElements()
    // pre-extract B rows; verify rectangular
    val bRows = new Array[ArrayData](k)
    var l = 0
    while (l < k) {
      val r = B.getArray(l)
      if (r == null || r.numElements() != n) return null
      bRows(l) = r
      l += 1
    }
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val ai = A.getArray(i)
      if (ai == null || ai.numElements() != k) return null
      val row = new Array[Any](n)
      var j = 0
      while (j < n) {
        var acc = 0.0
        var l2 = 0
        while (l2 < k) { acc += ai.getDouble(l2) * bRows(l2).getDouble(j); l2 += 1 }
        row(j) = acc
        j += 1
      }
      out(i) = new org.apache.spark.sql.catalyst.util.GenericArrayData(row)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MatMulExpr =
    copy(left = newLeft, right = newRight)
}

case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // inferred result type (AbstractDataType itself is private[sql])
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

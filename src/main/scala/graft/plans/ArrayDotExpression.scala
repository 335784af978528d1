package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the engine's hottest numeric kernel:
  * the embedding inner product (reference FAISS IP search,
  * `Neww_Fai.py:61-114`, re-expressed columnar).
  *
  * The declarative twin in [[graft.vector.VectorOps.dotDeclarative]]
  * (`aggregate(zip_with(a, b, *), 0.0, +)`) allocates an intermediate
  * array per row and evaluates two lambda closures per element —
  * higher-order functions never enter whole-stage codegen. This is one
  * fused primitive loop with real `doGenCode`, so a plan computing
  * sims over millions of candidate pairs stays inside the generated
  * consume path.
  *
  * Semantics are IDENTICAL to the twin (spec-asserted): inputs are
  * pre-cast `array(double)`; accumulation is the same left-to-right
  * sequential double fold (bitwise-equal sims, matching the oracle's
  * `list_dot_product`); any null element or a length mismatch yields
  * SQL NULL, exactly like `zip_with`'s null padding propagating
  * through `x*y` and `acc+v`.
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayDot.eval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("dotRes")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |java.lang.Double $r = graft.plans.ArrayDot$$.MODULE$$.eval($a, $b);
      |if ($r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $r.doubleValue(); }
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  /** Column-API handle; casts both sides to array(double) so element
    * arithmetic matches the declarative twin and the DuckDB oracle. */
  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDot(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))

  /** Shared kernel (interpreted + generated paths). Boxed so the
    * null cases (length mismatch / null element — `zip_with` padding
    * semantics) flow through one return. */
  def eval(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the hottest normalizer: F1
  * `money_or_null` (reference `post_pro_9_8.py:1-41`).
  *
  * The Column-expression formulation in [[graft.normalize.Normalize]]
  * builds a ~10-node regexp/when tree per row; this is the custom-
  * `Expression` tier of SURVEY §7.3 — one JVM method, with real
  * `doGenCode` (not CodegenFallback) so whole-stage codegen inlines a
  * single static call into the generated consume path.
  *
  * Semantics are IDENTICAL to `Normalize.moneyOrNull` (a spec asserts
  * equality on golden vectors and random fuzz): null/empty/"NULL" →
  * null; paren/trailing/leading negative notations; strip non-[0-9.];
  * decimal(18,2) HALF_UP parse; `$#,##0.00` with leading `-` for
  * nonzero negatives.
  */
case class MoneyNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MoneyNorm.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("moneyNorm")
    nullSafeCodeGen(ctx, ev, c => s"""
      |org.apache.spark.unsafe.types.UTF8String $r =
      |  graft.plans.MoneyNorm$$.MODULE$$.eval($c);
      |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MoneyNorm =
    copy(child = newChild)
}

object MoneyNorm {
  /** Column-API handle (classic Column↔Expression bridge). */
  def moneyNormNative(c: Column): Column =
    ColumnBridge.column(MoneyNorm(ColumnBridge.expression(c)))

  private val formatter = new java.text.DecimalFormat("#,##0.00",
    java.text.DecimalFormatSymbols.getInstance(java.util.Locale.US))

  /** Shared scalar kernel (called from interpreted + generated code). */
  def eval(in: UTF8String): UTF8String = {
    if (in == null) return null
    var s = in.toString.trim
    if (s.isEmpty || s.equalsIgnoreCase("NULL")) return null
    var neg = false
    if (s.length >= 1 && s.startsWith("(") && s.endsWith(")")) {
      neg = true; s = s.substring(1, math.max(1, s.length - 1))
    }
    if (s.endsWith("-")) { neg = true; s = s.substring(0, s.length - 1) }
    if (s.startsWith("-")) { neg = true; s = s.substring(1) }
    val cleaned = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if ((ch >= '0' && ch <= '9') || ch == '.') cleaned.append(ch)
      i += 1
    }
    if (cleaned.length == 0) return null
    val amt =
      try new java.math.BigDecimal(cleaned.toString)
        .setScale(2, java.math.RoundingMode.HALF_UP)
      catch { case _: NumberFormatException => return null }
    val formatted = formatter.synchronized { formatter.format(amt) }
    val out =
      if (neg && amt.signum() != 0) "-$" + formatted else "$" + formatted
    UTF8String.fromString(out)
  }
}

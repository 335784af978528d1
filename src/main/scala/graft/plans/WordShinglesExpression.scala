package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word k-gram shingle expression — the dedup family's hottest
  * producer (reference near-dup pipeline; SURVEY §7.4 note 5).
  *
  * The declarative twin ([[graft.dedup.Dedup.shinglesDeclarative]]:
  * `transform(sequence(...), i -> concat_ws(' ', slice(words, i, k)))`)
  * evaluates three nested higher-order expressions per shingle and
  * dominated the d02/d03/d07 bench times. This is one pass over the
  * text per row: split once, then k-gram windows materialized with a
  * precompiled pattern — ~15× less per-row work, and a single static
  * call from generated code.
  *
  * Semantics are IDENTICAL to the twin (spec-asserted): whitespace-run
  * split of the trimmed text (Java `\s+`, the same runs the oracle's
  * `regexp_split_to_array(trim(text), '\s+')` sees), empty/blank/null
  * text or fewer than k words → empty array, else n−k+1 space-joined
  * k-grams. Never null, so `explode` fan-out matches the twin's
  * row-for-row.
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size $k must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    WordShingles.eval(
      if (v == null) null else v.asInstanceOf[UTF8String], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val resultCode =
      code"""
        |${c.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  graft.plans.WordShingles$$.MODULE$$.eval(
        |    ${c.isNull} ? null : ${c.value}, $k);
        |""".stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** Column-API handle. */
  def shinglesNative(text: Column, k: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), k))

  private val Whitespace = java.util.regex.Pattern.compile("\\s+")
  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Shared kernel (interpreted + generated paths). */
  def eval(in: UTF8String, k: Int): ArrayData = {
    if (in == null) return Empty
    val s = in.toString.trim
    if (s.isEmpty) return Empty
    val words = Whitespace.split(s)
    val n = words.length - (k - 1)
    if (n <= 0) return Empty
    val out = new Array[Any](n)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

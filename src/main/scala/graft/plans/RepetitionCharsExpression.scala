package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native repetition-character counter for the Gopher §A.1.1 filters
  * (a09): characters covered by the most frequent word n-gram
  * (`dup = false`) or by all n-grams occurring more than once
  * (`dup = true`), computed in ONE hash-counting pass over the word
  * array.
  *
  * The declarative twins ([[graft.text.TextAnalysis.topElemChars]] /
  * `dupElemChars` over the shingle array) materialize the n-gram
  * array, `array_sort` it, and run an interpreted `aggregate` fold —
  * per-row O(g log g) with lambda-interpretation constants that made
  * a09 the slowest scan query in the suite. This kernel builds each
  * gram once into a count map and never materializes or sorts the
  * gram array; the twins stay as the spec cross-check (the
  * [[WordShingles]] discipline).
  *
  * Semantics are IDENTICAL to the twins (spec-asserted): gram length
  * is the Spark `length()` character count (code points), and the
  * most-frequent tie goes to the binary-smallest gram — exactly the
  * sorted fold's first-run-to-reach-max and the oracle's
  * `ORDER BY c DESC, g`. Empty/short inputs (fewer than n words)
  * return 0, never null.
  */
case class RepetitionChars(child: Expression, n: Int, dup: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"n-gram size $n must be >= 1")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    RepetitionChars.eval(
      if (v == null) null else v.asInstanceOf[ArrayData], n, dup)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val resultCode =
      code"""
        |${c.code}
        |long ${ev.value} = graft.plans.RepetitionChars$$.MODULE$$.eval(
        |  ${c.isNull} ? null : ${c.value}, $n, $dup);
        |""".stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionChars =
    copy(child = newChild)
}

object RepetitionChars {
  /** Column-API handles over a word ARRAY column (stage
    * `TextOps.words(text)` once; its split matches [[WordShingles]]). */
  def topGramChars(words: Column, n: Int): Column =
    ColumnBridge.column(RepetitionChars(ColumnBridge.expression(words), n, dup = false))
  def dupGramChars(words: Column, n: Int): Column =
    ColumnBridge.column(RepetitionChars(ColumnBridge.expression(words), n, dup = true))

  /** Shared kernel (interpreted + generated paths). */
  def eval(words: ArrayData, n: Int, dup: Boolean): Long = {
    if (words == null) return 0L
    val num = words.numElements()
    val grams = num - n + 1
    if (grams <= 0) return 0L
    val ws = new Array[String](num)
    var i = 0
    while (i < num) {
      ws(i) = words.getUTF8String(i).toString
      i += 1
    }
    val counts = new java.util.HashMap[UTF8String, Int](grams * 2)
    val sb = new java.lang.StringBuilder(64)
    i = 0
    while (i < grams) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(ws(i + j))
        j += 1
      }
      val g = UTF8String.fromString(sb.toString)
      counts.put(g, counts.getOrDefault(g, 0) + 1)
      i += 1
    }
    val it = counts.entrySet().iterator()
    if (dup) {
      var acc = 0L
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue
        if (c >= 2) acc += c.toLong * e.getKey.numChars()
      }
      acc
    } else {
      var bestC = 0
      var bestG: UTF8String = null
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue
        if (c > bestC || (c == bestC && e.getKey.compareTo(bestG) < 0)) {
          bestC = c
          bestG = e.getKey
        }
      }
      bestC.toLong * bestG.numChars()
    }
  }
}

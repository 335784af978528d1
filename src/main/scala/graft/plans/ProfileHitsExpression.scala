package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native profile-hit counter for language ID (a01) and quality
  * scoring (a02): occurrences of any profile token among a text's
  * whitespace words, counted in ONE byte scan of the raw string.
  *
  * The declarative twin ([[graft.text.TextAnalysis.profileScore]]
  * over `TextOps.words`) materializes the split array and runs an
  * interpreted `aggregate` lambda whose body is an `isin` chain —
  * per-word work linear in the profile size, outside whole-stage
  * codegen. This kernel tokenizes the UTF8String in place (maximal
  * runs of non-ASCII-whitespace bytes — multi-byte UTF-8 units are
  * ≥ 0x80 and never collide with the ASCII class, so byte scanning
  * is codepoint-safe) and tests membership in a hash set. Identical
  * counts by construction: split's artifacts (leading empty token
  * from the space-only `trim`, trailing-empty suppression) can never
  * match a non-empty profile token, so run-counting and
  * split-then-match agree on every input; the twin stays as the spec
  * cross-check.
  *
  * Null text → null, matching `aggregate` over a null split array.
  */
case class ProfileHits(child: Expression, tokens: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  @transient private lazy val tokenSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](tokens.size * 2)
    tokens.foreach(t => s.add(UTF8String.fromString(t)))
    s
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else ProfileHits.eval(v.asInstanceOf[UTF8String], tokenSet)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // raw HashSet in the generated cast: janino's generics support is
    // partial, and the raw-to-parameterized call is plain Java
    val setRef = ctx.addReferenceObj("profileSet", tokenSet,
      "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ProfileHits$$.MODULE$$.eval($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): ProfileHits =
    copy(child = newChild)
}

object ProfileHits {
  def count(text: Column, tokens: Seq[String]): Column =
    ColumnBridge.column(ProfileHits(ColumnBridge.expression(text), tokens))

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Shared kernel (interpreted + generated paths). */
  def eval(s: UTF8String, set: java.util.HashSet[UTF8String]): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    var hits = 0L
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start &&
          set.contains(UTF8String.fromBytes(bytes, start, i - start)))
        hits += 1
    }
    hits
  }
}

/** Native character-class counter — the quality tier's
  * `length(regexp_replace(text, …, ""))` columns (a02: alpha, digit,
  * punct) without the regex engine or the rewritten-string
  * allocation: one byte scan per class, zero allocation. Counting is
  * per CODEPOINT like Spark's `length`: ASCII bytes classify
  * directly; a multi-byte UTF-8 lead byte counts as one non-alnum,
  * non-whitespace codepoint (regex `[^A-Za-z]`/`[A-Za-z0-9\s]`
  * classes are ASCII-only, so non-ASCII codepoints survive the punct
  * strip and vanish from alpha/digit — byte-level continuation bytes
  * `10xxxxxx` are skipped, mirroring the codepoint count exactly).
  * Null → null. Spec-pinned equal to the regex forms. */
case class CharClassCount(child: Expression, mode: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else CharClassCount.eval(v.asInstanceOf[UTF8String], mode)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CharClassCount$$.MODULE$$.eval($c, $mode);")

  override protected def withNewChildInternal(newChild: Expression): CharClassCount =
    copy(child = newChild)
}

object CharClassCount {
  val Alpha = 0
  val Digit = 1
  val Punct = 2

  def alpha(text: Column): Column =
    ColumnBridge.column(CharClassCount(ColumnBridge.expression(text), Alpha))
  def digit(text: Column): Column =
    ColumnBridge.column(CharClassCount(ColumnBridge.expression(text), Digit))
  def punct(text: Column): Column =
    ColumnBridge.column(CharClassCount(ColumnBridge.expression(text), Punct))

  def eval(s: UTF8String, mode: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    var count = 0L
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b & 0xC0) == 0x80) {
        // UTF-8 continuation byte: not a codepoint
      } else if (mode == Alpha) {
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) count += 1
      } else if (mode == Digit) {
        if (b >= '0' && b <= '9') count += 1
      } else {
        // punct = codepoints surviving the [A-Za-z0-9\s] strip; the
        // regex \s class is ASCII-only, and non-ASCII lead bytes
        // (b < 0 as signed) are never alnum/ws → they count
        val alnum = (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
          (b >= '0' && b <= '9')
        val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0B ||
          b == '\f' || b == '\r'
        if (!alnum && !ws) count += 1
      }
      i += 1
    }
    count
  }
}

/** Native whitespace word counter — `size(TextOps.words(text))`
  * without the split array. Replicates the split semantics exactly:
  * count = non-whitespace runs, plus one EMPTY token on each end
  * where the space-trimmed string starts/ends with non-space
  * whitespace (Spark's `split` is `Pattern.split(limit = -1)`, which
  * keeps BOTH the leading and trailing empties — unlike Java's
  * one-arg `String.split`), and 0 when the space-trimmed string is
  * empty (the `words` guard). Null → null; callers that need the
  * legacy `size(null) = -1` of the engine's non-ANSI sessions
  * coalesce at the call site. Spec-pinned equal to the declarative
  * form. */
case class WordTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else WordTokenCount.eval(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WordTokenCount$$.MODULE$$.eval($c);")

  override protected def withNewChildInternal(newChild: Expression): WordTokenCount =
    copy(child = newChild)
}

object WordTokenCount {
  def count(text: Column): Column =
    ColumnBridge.column(WordTokenCount(ColumnBridge.expression(text)))

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def eval(s: UTF8String): Long = {
    val bytes = s.getBytes
    var n = bytes.length
    var i = 0
    // the words() guard trims SPACES only (Spark `trim`), then splits
    while (i < n && bytes(i) == ' ') i += 1
    while (n > i && bytes(n - 1) == ' ') n -= 1
    if (i >= n) return 0L // all-space or empty → empty array
    var count = if (isWs(bytes(i))) 1L else 0L // leading empty token
    if (isWs(bytes(n - 1))) count += 1 // trailing empty token
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) count += 1
      while (i < n && !isWs(bytes(i))) i += 1
    }
    count
  }
}

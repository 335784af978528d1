package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the universal ingest text-cleanup
  * pass (n18): Unicode NFC normalization, accent stripping, NBSP
  * unification, control-character removal, and horizontal-whitespace
  * collapse — the mojibake/encoding hygiene step every web-scale
  * corpus pipeline runs before quality filtering (C4 strips
  * non-sentence junk, Raffel et al. 2020 §2.2; CCNet normalizes
  * before hashing, Wenzek et al. 2020 §3; the ftfy tool exists for
  * exactly this class of damage). Reference analogue: the cleanse
  * tier of `post_pro_9_8.py` (cited at F9/n06) handles ASCII-level
  * noise; this is its Unicode-complete form.
  *
  * Pipeline (order matters, mirrored verbatim by the DuckDB oracle's
  * `strip_accents(nfc_normalize(..))` + regexp chain):
  *   1. NFC-normalize (compose combining sequences);
  *   2. strip accents — NFD, drop the Unicode mark categories
  *      (Mn/Mc/Me, the same set utf8proc's stripmark and therefore
  *      DuckDB's `strip_accents` removes), recompose NFC;
  *   3. NBSP family (U+00A0, U+2007, U+202F) → plain space;
  *   4. drop C0 controls except tab/LF/CR, plus DEL (0x7F) — BEL,
  *      NUL, vertical tab, form feed etc.; newlines survive;
  *   5. collapse runs of space/tab to one space; trim spaces.
  *
  * A single JVM pass (one allocation, no regex) with real
  * `doGenCode`, so whole-stage codegen inlines one static call —
  * the custom-`Expression` tier of SURVEY §7.3, same discipline as
  * [[MoneyNorm]]. A spec asserts equality with an equivalent
  * Column-function chain on golden vectors and fuzzed input.
  */
case class UnicodeClean(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    UnicodeClean.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.UnicodeClean$$.MODULE$$.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeClean =
    copy(child = newChild)
}

object UnicodeClean {
  /** Column-API handle (classic Column↔Expression bridge). */
  def unicodeClean(c: Column): Column =
    ColumnBridge.column(UnicodeClean(ColumnBridge.expression(c)))

  import java.text.Normalizer

  private def isMark(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
      t == Character.ENCLOSING_MARK
  }

  /** Shared scalar kernel (called from interpreted + generated code). */
  def eval(in: UTF8String): UTF8String = {
    if (in == null) return null
    // steps 1-2: NFC, then NFD with marks dropped, recomposed NFC
    val nfc = Normalizer.normalize(in.toString, Normalizer.Form.NFC)
    val nfd = Normalizer.normalize(nfc, Normalizer.Form.NFD)
    val unmarked = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (!isMark(cp)) unmarked.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    val s = Normalizer.normalize(unmarked.toString, Normalizer.Form.NFC)
    // steps 3-5 in one pass: NBSP→space, drop controls, collapse [ \t]+
    val out = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      val mapped =
        if (ch == '\u00A0' || ch == '\u2007' || ch == '\u202F') ' ' else ch
      val isControl = (mapped < 0x20 && mapped != '\t' && mapped != '\n' &&
        mapped != '\r') || mapped == 0x7F
      if (!isControl) {
        if (mapped == ' ' || mapped == '\t') pendingSpace = true
        else {
          // a space run is emitted only when followed by content, so
          // trailing runs vanish; leading runs are skipped below
          if (pendingSpace && out.length > 0) out.append(' ')
          pendingSpace = false
          out.append(mapped)
        }
      }
      i += 1
    }
    UTF8String.fromString(out.toString)
  }
}

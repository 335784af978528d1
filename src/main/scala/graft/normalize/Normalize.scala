package graft.normalize

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Field normalizers — the reference's post-processing surface
  * (SURVEY.md §2.8 F1-F12, F20-F21) as pure Column expression trees.
  *
  * Everything here compiles to built-in Catalyst expressions (regexp,
  * translate, format_number, when-chains): no UDFs, so whole-stage
  * codegen keeps the per-row hot path compiled, and the same logic is
  * expressible in the DuckDB oracle for bit-exact verification.
  *
  * Semantics mirror the reference implementations by behavior (cited
  * per function); the "NULL" string sentinel and SQL null are distinct
  * states throughout (SURVEY §1.2).
  *
  * Engine contract: parse failures yield SQL null (the reference's
  * Python returns None) — the session runs with ANSI mode off so
  * string→number casts are permissive-null, matching TRY_CAST in the
  * oracle SQL.
  */
object Normalize {

  /** Null/empty/"NULL"-sentinel test (`post_pro_9_8.py:12-14`). */
  def absent(c: Column): Column =
    c.isNull || trim(c) === "" || upper(trim(c)) === "NULL"

  /** F1 `money_or_null` (`post_pro_9_8.py:1-41`): normalize any money
    * notation to `$#,##0.00`; negatives from `(...)`, trailing `-`, or
    * leading `-` render as a leading `-`; `-$0.00` → `$0.00`; parse
    * failure → null.
    *
    * Note: inputs with >2 decimal places round HALF_UP here (decimal
    * cast) where Python's float formatting is round-half-even on the
    * binary value; the reference domain is 2-decimal money so the
    * difference is unreachable in practice.
    */
  def moneyOrNull(c: Column): Column = {
    val s0 = trim(c)
    val paren = s0.startsWith("(") && s0.endsWith(")")
    val s1 = when(paren, regexp_replace(regexp_replace(s0, "^\\(", ""), "\\)$", ""))
      .otherwise(s0)
    val trailing = s1.endsWith("-")
    val s2 = when(trailing, regexp_replace(s1, "-$", "")).otherwise(s1)
    val leading = s2.startsWith("-")
    val s3 = when(leading, regexp_replace(s2, "^-", "")).otherwise(s2)
    val neg = paren || trailing || leading
    val amt = regexp_replace(s3, "[^0-9.]", "").cast("decimal(18,2)")
    val formatted = concat(lit("$"), format_number(amt, 2))
    when(absent(c) || amt.isNull, lit(null).cast("string"))
      .when(neg && amt =!= 0, concat(lit("-"), formatted))
      .otherwise(formatted)
  }

  /** F2 `_ensure_negative_money` (`post_pro_9_8.py:75-110`): credits
    * forced negative except exact zero. Already-negative inputs pass
    * through unchanged (`($123.45)` stays parenthesized — the code,
    * not its docstring, is the contract); zero in any notation →
    * `$0.00`; unparseable → input unchanged. */
  def ensureNegativeMoney(c: Column): Column = {
    val s = trim(c)
    val alreadyNeg = s.startsWith("-") || (s.startsWith("(") && s.endsWith(")"))
    val amtNeg = regexp_replace(s, "[$,()\\-]", "").cast("decimal(18,2)")
    val amtPos = regexp_replace(s, "[$,]", "").cast("decimal(18,2)")
    when(absent(c), lit(null).cast("string"))
      .when(alreadyNeg && amtNeg.isNull, s)
      .when(alreadyNeg && amtNeg === 0, lit("$0.00"))
      .when(alreadyNeg, s)
      .when(amtPos.isNull, s)
      .when(amtPos === 0, lit("$0.00"))
      .when(s.startsWith("$"), concat(lit("-"), s))
      .otherwise(concat(lit("-$"), format_number(amtPos, 2)))
  }

  /** `to_money_decimal`-style magnitude parse for sign-insensitive
    * money comparison (A14, `postpro_star_9_3.py:15-24`). */
  def moneyMagnitude(c: Column): Column =
    regexp_replace(trim(c), "[^0-9.]", "").cast("decimal(18,2)")

  /** F3 `_date_sane` (`post_pro_9_8.py:48-73`): keep the ORIGINAL
    * string iff it parses under one of five formats and lands in
    * [1900-01-01, today+370d]; else null.
    *
    * Two-digit years resolve to 20xx here (Java pattern `yy`) where
    * Python's %y maps 69-99 → 19xx — such dates fall outside the sane
    * window either way, so the accept/reject decision agrees.
    */
  def dateSane(c: Column): Column = {
    val s = trim(c)
    val formats = Seq("M/d/yyyy", "M/d/yy", "MMM d, yyyy", "MMMM d, yyyy", "yyyy-M-d")
    // The reference tries each format in order and accepts the FIRST
    // one that both parses and lands in range — the range check is
    // per-format, not on the first parse (a format can "succeed" with
    // an insane year, e.g. %Y reading "24" as 24 AD, and the loop
    // must fall through to the next format).
    def saneUnder(fmt: String): Column = {
      val p = call_function("try_to_timestamp", s, lit(fmt)).cast("date")
      when(p.isNotNull &&
        p >= lit("1900-01-01").cast("date") &&
        p <= date_add(current_date(), 370), p)
    }
    val accepted = coalesce(formats.map(saneUnder): _*)
    when(absent(c) || accepted.isNull, lit(null).cast("string")).otherwise(s)
  }

  /** F5 account last-4 (`doc_promp_8_21.py:8-23` + wiring `:44-47`):
    * keep last 4 digits ONLY for `x...xNNNN` or `ending in:NNNN`
    * (case-insensitive); anything else → the "NULL" sentinel. */
  def acctLast4(c: Column): Column = {
    val s = trim(c)
    val masked = regexp_extract(s, "^[xX]+([0-9]{4})$", 1)
    val ending = regexp_extract(s, "(?i)^ending\\s*in:\\s*([0-9]{4})$", 1)
    when(c.isNull, lit(null).cast("string"))
      .when(masked =!= "", masked)
      .when(ending =!= "", ending)
      .otherwise(lit("NULL"))
  }

  /** F6 vendor normalize (`doc_promp_8_21.py:25-32`): any casing/
    * spacing of "CapitalOne" → "Capital One"; others unchanged. */
  def vendorNormalize(c: Column): Column =
    when(c.isNull, lit(null).cast("string"))
      .when(lower(regexp_replace(c, "\\s+", "")) === "capitalone", lit("Capital One"))
      .otherwise(c)

  /** F4 address line normalize (`postpro_star_9_3.py:24-37`):
    * collapse all whitespace, `P.O. Box` variants → `PO Box`,
    * `,`-spacing to `", "`, squeeze double spaces, strip edge
    * spaces/commas. */
  def normalizeAddressLine(c: Column): Column = {
    val collapsed = regexp_replace(trim(c), "\\s+", " ")
    val poBox = regexp_replace(collapsed, "(?i)\\bP\\.?\\s*O\\.?\\s*Box\\b", "PO Box")
    val commas = regexp_replace(poBox, "\\s*,\\s*", ", ")
    val squeezed = regexp_replace(commas, "\\s{2,}", " ")
    regexp_replace(regexp_replace(squeezed, "^[ ,]+", ""), "[ ,]+$", "")
  }

  /** Strip a leading client/vendor name prefix from an address
    * (`postpro_star_9_3.py:39-50`): case-insensitive prefix match,
    * then trim leading spaces/commas. Applied once per name, in
    * order, like the reference loop. */
  def stripLeadingName(addr: Column, names: Column*): Column =
    names.foldLeft(addr) { (a, name) =>
      val n = trim(name)
      val usable = !(name.isNull || n === "" || n === "NULL")
      when(usable && lower(a).startsWith(lower(n)),
        regexp_replace(a.substr(length(n) + 1, lit(Int.MaxValue)), "^[ ,]+", ""))
        .otherwise(a)
    }

  /** F4 composite `_clean_address` (`postpro_star_9_3.py:40-52`). */
  def cleanAddress(raw: Column, clientName: Column, vendorName: Column): Column = {
    val cleaned = stripLeadingName(
      normalizeAddressLine(raw), clientName, vendorName)
    when(absent(raw) || cleaned === "", lit(null).cast("string"))
      .otherwise(cleaned)
  }

  /** F9 `cleanse` (`new_prompt_7_2:119-120`): drop `$ , ' [ ] \`,
    * uppercase, trim — the comparison canonicalizer. */
  def cleanse(c: Column): Column =
    trim(upper(translate(c, "$,'[]\\", "")))

  /** F10 parenthesis→negative (`remove_paranthesis.py:10-21`). */
  def parensToNegative(c: Column): Column =
    when(c.rlike("^\\s*\\(.*\\)\\s*$"),
      concat(lit("-"), regexp_replace(trim(c), "^\\(|\\)$", "")))
      .otherwise(c)

  /** Mask: did the value carry parenthesis notation? */
  def hadParens(c: Column): Column = c.rlike("^\\s*\\(.*\\)\\s*$")

  /** F11 numeric → `-$#,##0.00` string (`post_9_9.py:13-19`). */
  def formatMoney(c: Column): Column = {
    val d = c.cast("decimal(18,2)")
    when(d.isNull, lit(null).cast("string"))
      .when(d < 0, concat(lit("-$"), format_number(-d, 2)))
      .otherwise(concat(lit("$"), format_number(d, 2)))
  }

  /** F12 reference-number format validation (`ext_3_4.py:39-71`):
    * exact equality; 'None' vs non-empty mismatch rules; else compare
    * the embedded 8-digit YYYYMMDD date portions when both have one. */
  def refFormatMatch(extracted: Column, expected: Column): Column = {
    val expEmpty = expected.isNull || expected === "" || expected === "NaN"
    val exDate = regexp_extract(extracted, "([0-9]{8})", 1)
    val expDate = regexp_extract(expected, "([0-9]{8})", 1)
    when(extracted === expected, lit(true))
      .when(extracted === "None" && !expEmpty, lit(false))
      .when(extracted =!= "None" && expEmpty, lit(false))
      .when(exDate =!= "" && expDate =!= "", exDate === expDate)
      .otherwise(lit(false))
  }

  /** F21 composite classification key (`Faiss_2_10.py:528-529`). */
  def compositeKey(label: Column, firstPg: Column): Column =
    concat_ws(":", label, firstPg.cast("string"))
}

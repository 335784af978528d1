package graft.normalize

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** W2 field refinement + classifier answer extraction (SURVEY.md §2.8
  * F8/F18, reference `new_prompt_7_2:64-113`, `rag_3_4.py:543-598`).
  */
object W2Refine {

  /** Empty-value normalization: "no"/"No"/""/'""'/null → "NULL". */
  def refineEmpty(c: Column): Column =
    when(c.isNull || c.isin("no", "No", "", "\"\""), lit("NULL")).otherwise(c)

  val allowedBox12: Seq[String] =
    Seq("A", "B", "C", "D", "E", "F", "G", "H",
      "AA", "BB", "DD", "EE", "FF", "GG", "HH")

  /** Box 12 code validation: outside the allowed set → "NULL". */
  def box12Code(c: Column): Column = {
    val e = refineEmpty(c)
    when(e === "NULL", e).when(e.isin(allowedBox12: _*), e).otherwise(lit("NULL"))
  }

  private val AmountRe = "^\\$?[0-9]+(\\.[0-9]{2})?$"

  /** Box 14 pairing: comma-split items fold into "Description $Amount"
    * pairs — an item followed by an amount-shaped item groups with it,
    * otherwise stands alone; the trailing leftover appends. A
    * sequential scan, expressed as an `aggregate` fold with a
    * (grouped, pending) struct accumulator — still pure Catalyst. */
  def box14Group(c: Column): Column = {
    val items = filter(transform(split(c, ","), x => trim(x)), x => x =!= "")
    val zero = struct(array().cast("array<string>").as("out"), lit("").as("pend"))
    val folded = aggregate(items, zero, (acc, v) =>
      when(acc.getField("pend") === "",
        struct(acc.getField("out").as("out"), v.as("pend")))
        .when(v.rlike(AmountRe),
          struct(concat(acc.getField("out"),
            array(concat_ws(" ", acc.getField("pend"), v))).as("out"),
            lit("").as("pend")))
        .otherwise(
          struct(concat(acc.getField("out"), array(acc.getField("pend"))).as("out"),
            v.as("pend"))))
    when(folded.getField("pend") =!= "",
      concat(folded.getField("out"), array(folded.getField("pend"))))
      .otherwise(folded.getField("out"))
  }

  /** F18 classifier answer extraction: first lazily-matched brace
    * blob → strict JSON parse (document_type/is_first_page); a blob
    * that fails the parse yields Unknown:false (the reference's
    * except-path); no blob at all → keyword scan fallback. Returns
    * the "Type:bool" composite (F21). */
  def answerExtract(c: Column): Column = {
    val blob = regexp_extract(c, "(?s)(\\{.*?\\})", 1)
    val valid = JsonRepair.isValidJson(blob)
    val docType = coalesce(get_json_object(blob, "$.document_type"), lit("Unknown"))
    val isFirst = lower(coalesce(get_json_object(blob, "$.is_first_page"),
      lit("false"))) === "true"
    val kwType = when(c.contains("Bank Statement"), "Bank Statement")
      .when(c.contains("Paystub"), "Paystub")
      .when(c.contains("W2"), "W2")
      .when(c.contains("Other"), "Other")
      .otherwise("Unknown")
    val kwFirst = lower(c).contains("true")
    when(c.isNull, lit(null).cast("string"))
      .when(blob =!= "" && valid,
        concat_ws(":", docType, isFirst.cast("string")))
      .when(blob =!= "", lit("Unknown:false"))
      .otherwise(concat_ws(":", kwType, kwFirst.cast("string")))
  }

  /** F19 query expansion: append each word's synonym (first match in
    * the broadcast map) to the query (`RAG_1.py:56-70`). */
  def expandQuery(c: Column, synonyms: Map[String, String]): Column = {
    val m = map(synonyms.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val ws = graft.text.TextOps.words(c)
    val syns = filter(transform(ws, w => element_at(m, w)), x => x.isNotNull)
    when(size(syns) > 0, concat_ws(" ", c, concat_ws(" ", syns)))
      .otherwise(c)
  }
}

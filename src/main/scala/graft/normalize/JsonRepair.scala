package graft.normalize

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** LLM-output JSON repair chain (SURVEY.md §2.8 F15-F17).
  *
  * Reference behavior: the model's text is sliced to the outermost
  * brace pair — everything before the first `{` dropped, everything
  * after the last `}` dropped, a missing trailing `}` appended
  * (`fixescode.py:24-41`, `doc_promp_8_21.py:53-74`), with markdown
  * ``` fences stripped first (`csv_single_3.py:93-99`). Parse failures
  * degrade to null rather than failing the row (the reference catches
  * and emits an error row).
  *
  * All pure string expressions — `get_json_object`/`from_json` stay
  * codegen'd and null-safe on still-invalid input.
  */
object JsonRepair {

  /** Strip markdown code fences (```json ... ``` or ``` ... ```). */
  def stripFences(c: Column): Column =
    regexp_replace(c, "```(?:json)?\\s*|```", "")

  /** F15 brace repair: keep from the first `{`, cut after the last
    * `}` or append one if absent. */
  def braceRepair(c: Column): Column = {
    val s = stripFences(c)
    val afterFirst = when(instr(s, "{") > 0, substring_index2(s))
      .otherwise(s)
    val withOpen = concat(lit("{"), afterFirst)
    val revPos = instr(reverse(withOpen), "}")
    when(c.isNull, lit(null).cast("string"))
      .when(revPos === 0, concat(withOpen, lit("}")))
      .otherwise(withOpen.substr(lit(1), length(withOpen) - revPos + 1))
  }

  /** Everything after the first `{` (exclusive) — `s.split('{',1)[-1]`. */
  private def substring_index2(s: Column): Column =
    s.substr(instr(s, "{") + 1, length(s))

  /** Strict validity gate: every Jackson-based Spark parser
    * (`get_json_object`, `from_json`, `try_parse_json`) tolerates
    * trailing garbage where the reference's `json.loads` raises.
    * Wrapping in `[...]` makes trailing content a syntax error inside
    * the array, so `json_array_length` goes null exactly when a
    * strict parse would fail. */
  def isValidJson(c: Column): Column =
    call_function("json_array_length", concat(lit("["), c, lit("]"))).isNotNull

  /** Extract one field from repaired JSON; null when unparseable. */
  def field(c: Column, name: String): Column = {
    val repaired = braceRepair(c)
    when(isValidJson(repaired), get_json_object(repaired, s"$$.${name}"))
  }

  /** F16-lite staged repairs before a schema parse: trailing commas
    * and single-quoted keys/values (the two dominant failure modes in
    * the reference's `json_error.py:5-160` corpus; the full hjson
    * fallback is out of engine scope). */
  def repairCommon(c: Column): Column = {
    val noTrailingCommas = regexp_replace(braceRepair(c), ",\\s*([}\\]])", "$1")
    // 'key': 'value' → "key": "value" (only quotes adjacent to JSON
    // syntax, so apostrophes inside values survive)
    val keys = regexp_replace(noTrailingCommas, "([{,\\[]\\s*)'", "$1\"")
    val vals0 = regexp_replace(keys, "'(\\s*[:,}\\]])", "\"$1")
    regexp_replace(vals0, "(:\\s*)'", "$1\"")
  }

  /** F17 `safe_parse_list` (`safe_parser.py:3-23`): parse a JSON-ish
    * list literal; retry with a `]` appended; else wrap the raw string
    * as a singleton list. */
  def safeParseList(c: Column, elementType: DataType): Column = {
    val schema = org.apache.spark.sql.types.ArrayType(elementType)
    val direct = from_json(c, schema)
    val repaired = from_json(concat(c, lit("]")), schema)
    when(c.isNull, lit(null).cast(schema))
      .when(direct.isNotNull, direct)
      .when(repaired.isNotNull, repaired)
      .otherwise(array(c.cast("string")).cast(schema))
  }
}

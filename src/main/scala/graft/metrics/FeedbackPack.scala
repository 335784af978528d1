package graft.metrics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.core.Tables
import graft.llm.LlmPack
import graft.normalize.Normalize
import graft.vector.KnnJoin

/** The feedback-loop job (`feebback agent_8_29.py:32-71`: Capture →
  * Compare → Cluster → Suggest) plus the remaining §2 odds and ends:
  * J2 positional attach, L8/F21 composite two-head evaluation, O2
  * order-by-|corr| shape.
  */
object FeedbackPack extends QueryPack {

  /** Feedback repo schema (`feebback agent_8_29.py:42`): field-level
    * diffs of the extraction run — only the disagreements. */
  def fieldDiffs(spark: SparkSession, dir: String): DataFrame =
    LlmPack.extractLong(spark, dir)
      .filter(col("accuracy") === 0)
      .select(col("doc_id"), col("field"),
        col("predicted_value"), col("ground_truth"),
        Evaluation.validationStatus(col("predicted_value"),
          col("ground_truth")).as("status"))
      .orderBy(col("doc_id"), col("field"))

  /** Error clustering: bucket disagreements by (field, status) with
    * an example doc per cluster — the "Cluster → Suggest" step. */
  def errorClusters(spark: SparkSession, dir: String): DataFrame =
    fieldDiffs(spark, dir)
      .groupBy(col("field"), col("status"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("example_doc"))
      .orderBy(col("field"), col("status"))

  /** f07: the SUGGEST stage — the middle box of the reference's
    * feedback agent (`feebback agent_8_29.py:44-49`: Capture →
    * Compare → Cluster → SUGGEST → Approve → Apply) that f01/f02/f06
    * left unbuilt: for each error cluster (field, status), the
    * suggested correction is the cluster's MODAL ground-truth value
    * (null-ish truths — NULL / '' / the literal 'NULL' the extraction
    * frame uses — normalize to the 'NULL' sentinel, so a
    * FALSE_POSITIVE cluster suggests "clear the field"), with its
    * support (cluster size), agreement count, and confidence =
    * n_agree / support for the reviewer's approval gate.
    *
    * Scale shape: the mode is computed on the VALUE-COLLAPSED
    * relation — groupBy (field, status, value) first (map-side
    * combining, bounded by the value domain), then a row_number over
    * the collapsed counts — the d18/m14 discipline; no window ever
    * sees per-document rows. */
  /** Ground truth normalized to the extraction frame's 'NULL' sentinel
    * — ONE definition for the Suggest mode and the Apply gate, so the
    * two can never disagree on what "the row's truth" is. */
  private def normalizedGt: org.apache.spark.sql.Column =
    when(col("ground_truth").isNull ||
        trim(col("ground_truth")) === "" || col("ground_truth") === "NULL",
      lit("NULL")).otherwise(trim(col("ground_truth")))

  def suggestCorrections(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gtn = normalizedGt
    val byVal = fieldDiffs(spark, dir)
      .select(col("field"), col("status"), gtn.as("suggested_value"))
      .groupBy(col("field"), col("status"), col("suggested_value"))
      .agg(count(lit(1)).as("n_agree"))
    val tot = byVal.groupBy(col("field"), col("status"))
      .agg(sum(col("n_agree")).as("support"))
    val w = Window.partitionBy(col("field"), col("status"))
      .orderBy(col("n_agree").desc, col("suggested_value"))
    byVal.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(tot, Seq("field", "status"))
      .select(col("field"), col("status"), col("suggested_value"),
        col("support"), col("n_agree"),
        round(col("n_agree").cast("double") / col("support").cast("double"),
          6).as("confidence"))
      .orderBy(col("field"), col("status"))
  }

  /** Suggestions → the approved-corrections relation [[applyCorrections]]
    * consumes: a diff row in a cluster whose suggestion clears the
    * confidence gate (and is a real value, not the 'NULL' clear-field
    * sentinel) gets the cluster's suggested value as its correction —
    * but ONLY when the row's own normalized ground truth equals the
    * suggestion. The cluster-level approval can never install a value
    * that contradicts row-level truth: minority rows (truth disagrees
    * with the cluster mode) are left uncorrected for the human-review
    * queue rather than silently overwritten, whatever `minConfidence`
    * is. The automated tail of the approval gate — a reviewer
    * accepting a CLUSTER rather than a row; the PipelineSpec wires
    * f02 clusters → [[suggestCorrections]] → this → [[applyCorrections]]
    * end-to-end. */
  def correctionsFromSuggestions(diffs: DataFrame, suggestions: DataFrame,
                                 minConfidence: Double): DataFrame =
    diffs.join(
        suggestions
          .filter(col("confidence") >= minConfidence &&
            col("suggested_value") =!= "NULL")
          .select(col("field"), col("status"), col("suggested_value")),
        Seq("field", "status"))
      .filter(normalizedGt === col("suggested_value"))
      .select(col("doc_id"), col("field"),
        col("suggested_value").as("corrected_value"))

  /** The Approve→Apply tail of the feedback loop (`feebback
    * agent_8_29.py:44-71` ends Suggest → Approve → Apply): an
    * approved-corrections table (doc_id, field, corrected_value —
    * whatever subset of the suggested diffs a reviewer accepted)
    * written back onto the extraction frame. Corrected rows take the
    * approved value; accuracy is recomputed so downstream metrics see
    * the post-correction state. Pure left join + coalesce — linear,
    * no shuffle beyond the join on the (tiny) corrections side. */
  def applyCorrections(extract: DataFrame, approved: DataFrame): DataFrame = {
    val finalValue = coalesce(col("corrected_value"), col("predicted_value"))
    extract.join(
        approved.select(col("doc_id"), col("field"), col("corrected_value")),
        Seq("doc_id", "field"), "left")
      .select(col("doc_id"), col("field"),
        finalValue.as("final_value"),
        col("ground_truth"),
        when(trim(finalValue) === trim(col("ground_truth")), 1L)
          .otherwise(0L).as("accuracy"),
        col("corrected_value").isNotNull.as("corrected"))
  }

  /** f06: the loop closed end-to-end over the extraction artifact —
    * Capture/Compare ([[fieldDiffs]]) → Approve (deterministic rule
    * standing in for the reviewer: even doc_ids accepted) → Apply.
    * The composition IS [[graft.pipeline.Lifecycles.feedbackApply]];
    * this delegates so the oracle gates the lifecycle, not a twin. */
  def applyApproved(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Lifecycles.feedbackApply(spark, dir)

  /** Accuracy trend over doc_id buckets (the pseudo-time axis the
    * synthetic corpus has) — the feedback loop's trend metric. */
  def accuracyTrend(spark: SparkSession, dir: String): DataFrame =
    LlmPack.extractLong(spark, dir)
      .withColumn("bucket", (col("doc_id") / 100).cast("long"))
      .groupBy(col("bucket"))
      .agg(sum(col("accuracy")).as("correct"), count(lit(1)).as("support"))
      .select(col("bucket"), col("correct"), col("support"),
        (col("correct").cast("double") / col("support").cast("double"))
          .as("accuracy"))
      .orderBy(col("bucket"))

  /** L8/F21: two-headed evaluation — label head (top-1 kNN) and a
    * first-page head (parity rule on the neighbor id), scored jointly
    * through the composite "label:first_pg" key exactly like the
    * reference's combined classifier eval. */
  def compositeEval(spark: SparkSession, dir: String,
                    strategy: KnnJoin.Strategy = KnnJoin.envSelfStrategy)
      : DataFrame = {
    val e = Tables(spark, dir).embeddings
    // rank-1 rows of the SESSION kNN artifact — identical to a fresh
    // exact(k=1) scan (same TopK ordering), without re-running the
    // quadratic sweep this query was measured recomputing at 10×
    // scale (64.5 s vs ~1 s through the artifact; PERF.md round 6).
    // The strategy defaults to the env-resolved posture: Exact when
    // unset (oracle parity), IvfSq8 under SPARK_GRAFT_SELF_KNN for
    // corpora where the quadratic artifact build is the bottleneck —
    // the report SHAPE is identical and FeedbackSpec bounds the
    // accuracy drift against the exact form.
    val preds = KnnJoin.selfTop3(spark, dir, strategy)
      .filter(col("rank") === 1)
      .join(e.select(col("vec_id").as("query_id"),
        col("label").as("true_label")), Seq("query_id"))
      .select(col("query_id"),
        Normalize.compositeKey(col("true_label"),
          pmod(col("query_id"), lit(2L)) === 0).as("actual"),
        Normalize.compositeKey(col("n_label"),
          pmod(col("neighbor_id"), lit(2L)) === 0).as("predicted"))
    Evaluation.accuracyTable(preds, col("actual"),
        (col("actual") === col("predicted")).cast("int"))
      .orderBy(col("field"))
  }

  /** J2: positional attach — a computed frame zip-joined back to its
    * source by an explicit row id carried from BEFORE the fan-out
    * (pandas `concat(axis=1)` without implicit-order hazards). */
  def positionalAttach(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
    // the "computed results" frame — separate lineage, same row ids
    val computed = docs.select(col("doc_id").as("row_id"),
      length(col("text")).cast("long").as("computed_len"))
    docs.join(computed, col("doc_id") === col("row_id"))
      .select(col("doc_id"), col("computed_len"),
        (col("computed_len") === length(col("text")).cast("long")).as("aligned"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f01_field_diffs" -> fieldDiffs,
    "f02_error_clusters" -> errorClusters,
    "f03_accuracy_trend" -> accuracyTrend,
    "f04_composite_eval" -> ((s, d) => compositeEval(s, d)),
    "f05_positional_attach" -> positionalAttach,
    "f06_apply_corrections" -> applyApproved,
    "f07_suggest_corrections" -> suggestCorrections)

  private val diffsCte = LlmPack.oracles("l01_extract_long")
    .replaceAll("(?s)SELECT doc_id, field.*$", "").stripTrailing() + s""",
    |diffs AS (SELECT doc_id, field, predicted_value, ground_truth,
    |    CASE WHEN (predicted_value IS NULL OR predicted_value = 'NULL' OR predicted_value = '')
    |           AND (ground_truth IS NULL OR ground_truth = 'NULL' OR ground_truth = '') THEN 'MATCH'
    |         WHEN NOT (predicted_value IS NULL OR predicted_value = 'NULL' OR predicted_value = '')
    |           AND (ground_truth IS NULL OR ground_truth = 'NULL' OR ground_truth = '') THEN 'FALSE_POSITIVE'
    |         WHEN (predicted_value IS NULL OR predicted_value = 'NULL' OR predicted_value = '')
    |           THEN 'MISSING'
    |         WHEN trim(predicted_value) = trim(ground_truth) THEN 'MATCH'
    |         ELSE 'MISMATCH' END AS status
    |  FROM longf WHERE accuracy = 0)""".stripMargin

  private val knnCte = """
    |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
    |pr AS (SELECT q.vec_id AS qid, n.vec_id AS nid, n.label AS nlabel,
    |        q.label AS tlabel, list_dot_product(q.v, n.v) AS sim
    |      FROM e q JOIN e n ON q.vec_id <> n.vec_id),
    |r AS (SELECT qid, nid, nlabel, tlabel,
    |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
    |      FROM pr)""".stripMargin

  val oracles: Map[String, String] = Map(
    "f01_field_diffs" -> s"""
      |$diffsCte
      |SELECT doc_id, field, predicted_value, ground_truth, status
      |FROM diffs ORDER BY doc_id, field""".stripMargin,
    "f02_error_clusters" -> s"""
      |$diffsCte
      |SELECT field, status, count(*) AS n, min(doc_id) AS example_doc
      |FROM diffs GROUP BY field, status ORDER BY field, status""".stripMargin,
    "f03_accuracy_trend" -> (LlmPack.oracles("l01_extract_long")
      .replaceAll("(?s)SELECT doc_id, field.*$", "").stripTrailing() + """,
      |t AS (SELECT CAST(doc_id // 100 AS BIGINT) AS bucket, accuracy FROM longf)
      |SELECT bucket, CAST(sum(accuracy) AS BIGINT) AS correct,
      |  count(*) AS support,
      |  CAST(CAST(sum(accuracy) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS accuracy
      |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin),
    "f04_composite_eval" -> s"""
      |WITH $knnCte,
      |c AS (SELECT qid,
      |    CAST(tlabel AS VARCHAR) || ':' ||
      |      (CASE WHEN qid % 2 = 0 THEN 'true' ELSE 'false' END) AS actual,
      |    CAST(nlabel AS VARCHAR) || ':' ||
      |      (CASE WHEN nid % 2 = 0 THEN 'true' ELSE 'false' END) AS predicted
      |  FROM r WHERE rnk = 1)
      |SELECT coalesce(actual, 'Overall') AS field,
      |  CAST(sum(CASE WHEN actual = predicted THEN 1 ELSE 0 END) AS BIGINT) AS correct,
      |  count(*) AS support,
      |  CAST(CAST(sum(CASE WHEN actual = predicted THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS accuracy
      |FROM c GROUP BY ROLLUP(actual) ORDER BY field""".stripMargin,
    "f05_positional_attach" -> """
      |SELECT doc_id, CAST(length(text) AS BIGINT) AS computed_len,
      |  true AS aligned
      |FROM documents ORDER BY doc_id""".stripMargin,
    "f06_apply_corrections" -> s"""
      |$diffsCte,
      |corr AS (SELECT doc_id, field, ground_truth AS corrected_value
      |  FROM diffs WHERE doc_id % 2 = 0)
      |SELECT l.doc_id, l.field,
      |  coalesce(c.corrected_value, l.predicted_value) AS final_value,
      |  l.ground_truth,
      |  CAST(CASE WHEN trim(coalesce(c.corrected_value, l.predicted_value))
      |    = trim(l.ground_truth) THEN 1 ELSE 0 END AS BIGINT) AS accuracy,
      |  c.corrected_value IS NOT NULL AS corrected
      |FROM longf l LEFT JOIN corr c ON c.doc_id = l.doc_id AND c.field = l.field
      |ORDER BY l.doc_id, l.field""".stripMargin,
    "f07_suggest_corrections" -> s"""
      |$diffsCte,
      |g AS (SELECT field, status,
      |    CASE WHEN ground_truth IS NULL OR trim(ground_truth) = ''
      |           OR ground_truth = 'NULL'
      |      THEN 'NULL' ELSE trim(ground_truth) END AS suggested_value
      |  FROM diffs),
      |bv AS (SELECT field, status, suggested_value, count(*) AS n_agree
      |  FROM g GROUP BY 1, 2, 3),
      |tot AS (SELECT field, status, CAST(sum(n_agree) AS BIGINT) AS support
      |  FROM bv GROUP BY 1, 2),
      |rk AS (SELECT field, status, suggested_value, n_agree,
      |    row_number() OVER (PARTITION BY field, status
      |      ORDER BY n_agree DESC, suggested_value) AS rn
      |  FROM bv)
      |SELECT rk.field, rk.status, rk.suggested_value, tot.support,
      |  CAST(rk.n_agree AS BIGINT) AS n_agree,
      |  round(CAST(rk.n_agree AS DOUBLE) / CAST(tot.support AS DOUBLE), 6)
      |    AS confidence
      |FROM rk JOIN tot ON tot.field = rk.field AND tot.status = rk.status
      |WHERE rk.rn = 1 ORDER BY rk.field, rk.status""".stripMargin)
}

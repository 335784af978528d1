package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ingest.Ingest
import graft.llm.LlmPack
import graft.metrics.{Classification, Evaluation}
import graft.sample.Sampling
import graft.text.TextOps
import graft.vector.KnnJoin

/** The reference's four end-to-end entry points (SURVEY §3) as
  * composable jobs over the engine's operators — the §7.1 module-8
  * deliverable. Each lifecycle recombines already-oracle-checked
  * stages; the flagship classification lifecycle additionally runs
  * under its own DuckDB oracle ([[PipelinePack]] p01).
  */
object Lifecycles {

  /** §3.1 ingestion/consolidation: channel directory scan →
    * headerless per-page CSV read → lineage columns (fn, channel,
    * page number) → one consolidated table. */
  def consolidate(spark: SparkSession, root: String): DataFrame =
    Ingest.readPages(spark, root)

  /** §3.2 flagship: document-level anti-leakage split → train-index
    * kNN top-1 → sklearn-style classification report. The split is the
    * hash split (partition-count independent); the index side is the
    * TRAIN half only, so evaluation never sees its own row as a
    * neighbor by construction.
    *
    * `strategy` picks the index-search posture at the entry point:
    * the default [[KnnJoin.Exact]] is reference parity (p01's oracle
    * replays it); pass [[KnnJoin.Ivf]]/[[KnnJoin.Lsh]] when the index
    * outgrows executor broadcast — the report shape is identical and
    * the spec pins the IVF-backed report's accuracy within a recall
    * bound of exact. */
  def classifyAndReport(spark: SparkSession, dir: String,
                        trainFrac: Double = 0.8,
                        strategy: KnnJoin.Strategy = KnnJoin.Exact): DataFrame = {
    val e = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("label"), col("embedding"))
    val split = Sampling.hashSplit(e, col("vec_id"), trainFrac)
    val train = split.filter(col("split") === "train").drop("split")
    val test = split.filter(col("split") === "test").drop("split")
    val hits = KnnJoin.search(spark, test, train, 1, strategy,
      excludeSelf = false)
    val preds = hits.join(
      test.select(col("vec_id").as("query_id"), col("label").as("true_label")),
      Seq("query_id"))
    Classification.classificationReport(preds, col("true_label"), col("n_label"))
  }

  /** §3.3 extraction lifecycle: stub LLM extraction → JSON repair →
    * long format → per-field accuracy table with Overall. */
  def extractAndEvaluate(spark: SparkSession, dir: String): DataFrame =
    Evaluation.accuracyTable(
        LlmPack.extractLong(spark, dir), col("field"), col("accuracy"))
      .orderBy(col("field"))

  /** §3.4 validation-confirmation as a BATCH OPERATOR over arbitrary
    * (document text, SoR fields) columns: deterministic 2-of-3 rule
    * (first name, last name, all address tokens present). Routing is
    * a filter on the decision column. */
  def confirm(df: DataFrame, fullText: Column, sorFirst: Column,
              sorLast: Column, sorAddress: Column): DataFrame = {
    val ws = TextOps.words(lower(fullText))
    val firstM = array_contains(ws, lower(sorFirst))
    val lastM = array_contains(ws, lower(sorLast))
    val addrM = forall(TextOps.words(lower(sorAddress)),
      t => array_contains(ws, t))
    val matches = firstM.cast("int") + lastM.cast("int") + addrM.cast("int")
    df.withColumn("first_match", firstM)
      .withColumn("last_match", lastM)
      .withColumn("addr_match", addrM)
      .withColumn("decision", when(matches >= 2, "yes").otherwise("no"))
  }

  /** Straight-through-processing routing for [[confirm]] output:
    * (auto-processed, human-in-the-loop) halves. */
  def routeStp(confirmed: DataFrame): (DataFrame, DataFrame) =
    (confirmed.filter(col("decision") === "yes"),
      confirmed.filter(col("decision") === "no"))
}

package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.core.Tables
import graft.metrics.Evaluation
import graft.normalize.Normalize

/** L7: the two-headed classifier over embeddings (reference
  * `fai_combined_3_12.py:54-128` — a torch MLP trunk with doc-type and
  * first_pg heads under summed CE losses; joint eval
  * `combined_fai_3_13.py:12-102,351-385`).
  *
  * MLlib has no shared-trunk multi-task trainer, so per SURVEY's
  * mapping the two heads are two seeded models over the SAME feature
  * column: a MultilayerPerceptronClassifier for the 10-class doc-type
  * head and a LogisticRegression for the binary first_pg head. The
  * synthetic corpus has no first-page column, so the first_pg ground
  * truth is the sign of the first embedding component — like the
  * reference's signal it is a function of page CONTENT (learnable
  * from features), unlike the f04 parity rule, which stays as the
  * oracle-checked composite-key twin.
  *
  * No SQL oracle exists for trained models → rows-only driver checks
  * (l05/l06) + seeded spec-level accuracy assertions. Both heads are
  * session-memoized artifacts (train once, every consumer reads the
  * persisted predictions — the discipline of `KnnJoin.exactSelfTop3`).
  */
object MlPack extends QueryPack {

  private def memoized(spark: SparkSession, dir: String, key: String)
                      (build: => DataFrame): DataFrame =
    graft.core.Artifacts.memo(spark, s"ml_$key:$dir")(build)

  private def features(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    Tables(spark, dir).embeddings
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("emb"),
        array_to_vector(col("embedding").cast("array<double>")).as("features"))
  }

  /** Doc-type head: 10-class MLP, trained once per (session, dir). */
  def mlpClassify(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "label")(mlpPlan(spark, dir))

  /** Un-memoized MLP head build — the determinism spec trains twice
    * through this seam and asserts identical predictions. */
  private[graft] def mlpPlan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.classification.MultilayerPerceptronClassifier
    val data = features(spark, dir)
      .select(col("vec_id"), col("label").cast("double").as("label"),
        col("features"))
    val mlp = new MultilayerPerceptronClassifier()
      .setLayers(Array(64, 32, 10))
      .setSeed(42L).setMaxIter(40).setBlockSize(64)
    val model = mlp.fit(data)
    model.transform(data)
      .select(col("vec_id"),
        col("label").cast("long").as("true_label"),
        col("prediction").cast("long").as("pred_label"))
      .orderBy(col("vec_id"))
  }

  /** first_pg head: seeded logistic regression on the same features,
    * trained once per (session, dir). */
  def firstPgClassify(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "first_pg")(firstPgPlan(spark, dir))

  /** Un-memoized first_pg head build (see [[mlpPlan]]). */
  private[graft] def firstPgPlan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.classification.LogisticRegression
    val data = features(spark, dir)
      .select(col("vec_id"),
        (element_at(col("emb"), 1) > 0).cast("double").as("label"),
        col("features"))
    // LogisticRegression exposes NO seed param (Spark ML declares none
    // — LBFGS from a fixed zero init has no randomness to seed), so
    // determinism rests on the deterministic optimizer; the MlSpec
    // train-twice assertion pins it empirically.
    val lr = new LogisticRegression().setMaxIter(50)
    val model = lr.fit(data)
    model.transform(data)
      .select(col("vec_id"),
        col("label").cast("long").as("true_first_pg"),
        col("prediction").cast("long").as("pred_first_pg"))
      .orderBy(col("vec_id"))
  }

  /** L7 joint eval (`combined_fai_3_13.py:351-385`): both trained
    * heads' predictions joined per vector, scored on the composite
    * "label:first_pg" exact-match key with per-class and Overall
    * rows — the f04 shape, from two REAL heads. */
  def jointEval(spark: SparkSession, dir: String): DataFrame = {
    val joined = mlpClassify(spark, dir)
      .join(firstPgClassify(spark, dir), Seq("vec_id"))
      .select(col("vec_id"),
        Normalize.compositeKey(col("true_label"),
          col("true_first_pg") === 1L).as("actual"),
        Normalize.compositeKey(col("pred_label"),
          col("pred_first_pg") === 1L).as("predicted"))
    Evaluation.accuracyTable(joined, col("actual"),
        (col("actual") === col("predicted")).cast("int"))
      .orderBy(col("field"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l05_mlp_classify" -> mlpClassify,
    "l06_joint_two_head" -> jointEval)

  override val artifacts: Map[String, (SparkSession, String) => DataFrame] =
    Map("ml_mlp_head" -> mlpClassify, "ml_first_pg_head" -> firstPgClassify)

  val oracles: Map[String, String] = Map()
}

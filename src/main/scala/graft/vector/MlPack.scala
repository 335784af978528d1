package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.core.Tables

/** L7: the MLP classifier head over embeddings (reference
  * `fai_combined_3_12.py:54-128` — a small torch MLP; here MLlib's
  * MultilayerPerceptronClassifier, one model per head). No SQL oracle
  * exists for a trained model → rows-only driver check + spec-level
  * accuracy assertions. Seeded, so repeated runs agree. */
object MlPack extends QueryPack {

  def mlpClassify(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.classification.MultilayerPerceptronClassifier
    import org.apache.spark.ml.functions.array_to_vector
    val data = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("label").cast("double").as("label"),
        array_to_vector(col("embedding").cast("array<double>")).as("features"))
      .cache()
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l05_mlp_classify" -> mlpClassify)

  val oracles: Map[String, String] = Map()
}

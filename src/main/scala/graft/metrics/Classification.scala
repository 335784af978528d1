package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classification evaluation aggregations (SURVEY.md §2.4 A7/A8):
  * confusion matrix, sklearn-style classification report, per-document
  * all-pages-correct rollup.
  *
  * All counts are exact longs; ratios are single double divisions of
  * those counts (identical across engines); macro/weighted averages —
  * the only places doubles get SUMMED — go through decimal(28,12)
  * casts so the sum is order-independent and partial-aggregatable.
  */
object Classification {

  /** Long-format confusion matrix: (true, pred, n). */
  def confusionMatrix(preds: DataFrame, trueCol: Column, predCol: Column): DataFrame =
    preds.groupBy(trueCol.cast("string").as("true_label"),
        predCol.cast("string").as("pred_label"))
      .agg(count(lit(1)).as("n"))

  /** sklearn-style classification report: one row per class
    * (precision/recall/f1/support) + `accuracy`, `macro avg`,
    * `weighted avg` rows, ordered classes-first. */
  def classificationReport(preds: DataFrame, trueCol: Column,
                           predCol: Column): DataFrame = {
    val p = preds.select(trueCol.cast("string").as("t"),
      predCol.cast("string").as("p"))
    val byTrue = p.groupBy(col("t").as("label"))
      .agg(count(lit(1)).as("support"),
        sum(when(col("t") === col("p"), 1L).otherwise(0L)).as("tp"))
    val byPred = p.groupBy(col("p").as("label"))
      .agg(count(lit(1)).as("pred_n"))
    // Ratios stay UNROUNDED doubles: divisions of identical integer
    // counts and the 2pr/(p+r) tree are bitwise-identical across
    // engines. The macro/weighted averages sum those doubles — the
    // only order-sensitive step — so the sum runs as a sequential
    // fold over the label-sorted class list, an explicit order both
    // engines reproduce exactly (no decimal casts, no rounding, no
    // half-way-tie hazards).
    val perClass = byTrue
      .join(byPred, Seq("label"), "full_outer")
      .na.fill(0L, Seq("support", "tp", "pred_n"))
      .select(col("label"),
        when(col("pred_n") > 0,
          col("tp").cast("double") / col("pred_n").cast("double"))
          .otherwise(0.0).as("precision"),
        when(col("support") > 0,
          col("tp").cast("double") / col("support").cast("double"))
          .otherwise(0.0).as("recall"),
        col("support"), col("tp"))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0.0,
          lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))).otherwise(0.0))

    def foldSum(rows: Column, field: String): Column =
      aggregate(rows, lit(0.0), (acc, x) => acc + x.getField(field))
    def foldWeighted(rows: Column, field: String): Column =
      aggregate(rows, lit(0.0),
        (acc, x) => acc + x.getField(field) * x.getField("supportd"))

    val summary = perClass
      .agg(
        array_sort(collect_list(struct(col("label"), col("precision"),
          col("recall"), col("f1"),
          col("support").cast("double").as("supportd")))).as("rows"),
        count(lit(1)).as("n_classes"),
        sum(col("support")).as("total"),
        sum(col("tp")).as("correct"))

    val classRows = perClass.select(lit(0).as("ord"), col("label"),
      col("precision"), col("recall"), col("f1"), col("support"))
    val accuracy = summary.select(lit(1).as("ord"), lit("accuracy").as("label"),
      (col("correct").cast("double") / col("total").cast("double")).as("precision"),
      (col("correct").cast("double") / col("total").cast("double")).as("recall"),
      (col("correct").cast("double") / col("total").cast("double")).as("f1"),
      col("total").as("support"))
    val macroAvg = summary.select(lit(2).as("ord"), lit("macro avg").as("label"),
      (foldSum(col("rows"), "precision") / col("n_classes").cast("double")).as("precision"),
      (foldSum(col("rows"), "recall") / col("n_classes").cast("double")).as("recall"),
      (foldSum(col("rows"), "f1") / col("n_classes").cast("double")).as("f1"),
      col("total").as("support"))
    val weighted = summary.select(lit(3).as("ord"), lit("weighted avg").as("label"),
      (foldWeighted(col("rows"), "precision") / col("total").cast("double")).as("precision"),
      (foldWeighted(col("rows"), "recall") / col("total").cast("double")).as("recall"),
      (foldWeighted(col("rows"), "f1") / col("total").cast("double")).as("f1"),
      col("total").as("support"))

    classRows.unionByName(accuracy).unionByName(macroAvg).unionByName(weighted)
      .orderBy(col("ord"), col("label"))
      .drop("ord")
  }

  /** A8: document rolls up correct only if ALL its rows are correct
    * (`min(correct)` per doc), then the doc-level accuracy. */
  def docRollup(preds: DataFrame, docKey: Column, correct: Column): DataFrame =
    preds.groupBy(docKey.as("doc"))
      .agg(min(correct.cast("long")).as("doc_correct"),
        count(lit(1)).as("n_rows"))
}

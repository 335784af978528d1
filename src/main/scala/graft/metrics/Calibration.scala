package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Expected Calibration Error + reliability-diagram data.
  *
  * Reference: `compute_ece` / `prepare_reliability_data` (repo-root
  * README.md:4-36 of the reference): probabilities are digitized into
  * `bins` uniform buckets; per bucket we take mean predicted confidence,
  * mean observed accuracy, and count; ECE = Σ (n_b/N)·|acc_b − conf_b|.
  *
  * Pure groupBy/agg — one shuffle over at most `bins` groups, so it
  * scales to any input size. Confidence means are computed from exact
  * decimal sums (the 2-decimal inputs here are lossless) so the result
  * is reproducible across partitionings.
  */
object Calibration {

  /** Per-bin reliability table: bin, n, avg confidence, avg accuracy. */
  def reliabilityBins(df: DataFrame, prob: Column, label: Column,
                      bins: Int = 10): DataFrame = {
    val bin = least(floor(prob * bins), lit(bins - 1)).cast("int").as("bin")
    df.select(bin,
        prob.cast("decimal(18,6)").as("p"),
        label.cast("long").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("p")).as("sp"),
        sum(col("y")).as("sy"))
      .select(
        col("bin"), col("n"),
        (col("sp").cast("double") / col("n").cast("double")).as("confidence"),
        (col("sy").cast("double") / col("n").cast("double")).as("accuracy"))
  }

  /** Scalar ECE from the reliability bins (driver gets a 1-row frame).
    * The per-bin |acc−conf|·n addends are doubles; they go through a
    * decimal(28,12) cast before summation so the ≤`bins`-term sum is
    * order-independent (and the oracle can reproduce it exactly). */
  def ece(df: DataFrame, prob: Column, label: Column, bins: Int = 10): DataFrame =
    reliabilityBins(df, prob, label, bins)
      .agg(
        (sum((col("n").cast("double") * abs(col("accuracy") - col("confidence")))
          .cast("decimal(28,12)")).cast("double") /
          sum(col("n")).cast("double")).as("ece"))
}

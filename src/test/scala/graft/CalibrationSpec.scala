package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.metrics.Calibration

/** The calibration tier: summary metrics, temperature-scaling fit,
  * isotonic (PAV) fit — hand-computed expectations on planted data. */
class CalibrationSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("calibrationSummary: ECE/MCE/Brier match hand computation") {
    // one bin [0.6,0.7): p=0.65 ×4, 1 success → conf 0.65, acc 0.25
    // one bin [0.8,0.9): p=0.85 ×4, 4 successes → conf 0.85, acc 1.0
    val df = (Seq.fill(4)(0.65) ++ Seq.fill(4)(0.85))
      .zip(Seq(1, 0, 0, 0, 1, 1, 1, 1)).toDF("p", "y")
    val r = Calibration.calibrationSummary(df, col("p"), col("y")).collect()(0)
    val ece = (4 * 0.4 + 4 * 0.15) / 8.0
    val brier = (0.65 * 0.65 * 3 + 0.35 * 0.35 + 0.15 * 0.15 * 4) / 8.0
    assert(math.abs(r.getDouble(0) - ece) < 1e-9)
    assert(math.abs(r.getDouble(1) - 0.4) < 1e-9)
    assert(math.abs(r.getDouble(2) - brier) < 1e-9)
  }

  test("temperatureScale recovers a planted T=2 miscalibration") {
    // confidences carry logit z, but empirical accuracy follows
    // sigmoid(z/2) — the textbook overconfident head whose NLL-optimal
    // temperature is 2. Two confidence levels, 1000 rows each.
    def sig(z: Double) = 1.0 / (1.0 + math.exp(-z))
    def block(z: Double, n: Int): Seq[(Double, Int)] = {
      val k = math.round(n * sig(z / 2.0)).toInt
      Seq.tabulate(n)(i => (sig(z), if (i < k) 1 else 0))
    }
    val df = (block(1.0, 1000) ++ block(2.0, 1000)).toDF("p", "y")
    val r = Calibration.temperatureScale(df, df, col("p"), col("y"))
      .collect()(0)
    val tStar = r.getDouble(0)
    assert(tStar > 1.5 && tStar < 2.6, s"t_star $tStar should be ≈ 2")
    assert(r.getDouble(3) < r.getDouble(2),
      s"ece_after ${r.getDouble(3)} should improve on ece_before ${r.getDouble(2)}")
  }

  test("isotonicBins equals pool-adjacent-violators on planted bins") {
    // bin accuracies [0.1, 0.5, 0.3, 0.7] — PAV pools the middle
    // violator pair to 0.4 and leaves the ends alone
    def block(p: Double, k: Int): Seq[(Double, Int)] =
      Seq.tabulate(10)(i => (p, if (i < k) 1 else 0))
    val df = (block(0.15, 1) ++ block(0.35, 5) ++ block(0.55, 3) ++
      block(0.75, 7)).toDF("p", "y")
    val rows = Calibration.isotonicBins(df, col("p"), col("y")).collect()
      .map(r => (r.getInt(0), r.getDouble(4)))
    assert(rows.toSeq == Seq((1, 0.1), (3, 0.4), (5, 0.4), (7, 0.7)))
    // monotone non-decreasing by construction
    val iso = rows.map(_._2)
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b })
  }

  test("isotonic fit is invariant to partitioning") {
    val df = (Seq.tabulate(40)(i => (0.1 + 0.02 * (i % 8), i % 3 min 1)))
      .toDF("p", "y")
    def run(parts: Int) =
      Calibration.isotonicBins(df.repartition(parts), col("p"), col("y"))
        .collect().map(r => (r.getInt(0), r.getDouble(4))).toSeq
    assert(run(1) == run(7))
  }
}

package graft.text

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded per-group order statistic: the value of the n-th largest
  * element (counting duplicates) of a Double column, or -Infinity when
  * the group has fewer than n rows.
  *
  * This is the skew escape for "top n per group by rank" at corpus
  * scale (the [[AnalysisPack.qualityCapScaled]] prefilter): a plain
  * `row_number` window ships EVERY row of a group to one partition, so
  * a dominant group (one language at 90% of a 100 TB corpus) serializes
  * through a single task. The n-th value, by contrast, is a true
  * partial aggregate — each partition reduces its rows into an n-sized
  * buffer map-side, buffers merge associatively, and only n doubles per
  * group ever shuffle. Rank is then computed over the ≤(n + ties)
  * survivors of `value >= nth`, never the full group.
  *
  * Same discipline as [[HeavyHitters.MisraGries]]: bounded buffer,
  * value-deterministic transitions, so the result is independent of
  * partitioning and merge order.
  */
object TopNThreshold {

  /** Spark `Aggregator`; buffer = the group's top-n values so far,
    * sorted descending. Insertion is O(n) per row (n is a small cap,
    * e.g. 50); merges are O(n) per buffer pair. */
  final class NthLargest(n: Int)
      extends Aggregator[Double, Seq[Double], Double] {
    require(n > 0, "n must be positive")

    override def zero: Seq[Double] = Seq.empty

    private def insert(b: Seq[Double], v: Double): Seq[Double] =
      if (b.size < n) (b :+ v).sortBy(-_)
      else if (v > b.last) (b.init :+ v).sortBy(-_)
      else b

    override def reduce(b: Seq[Double], v: Double): Seq[Double] = insert(b, v)

    override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
      b.foldLeft(a)(insert)

    /** -Infinity = "group smaller than n: keep everything" — a
      * `value >= nth` prefilter then passes all rows, which is exactly
      * the cap semantics for an under-full group. */
    override def finish(r: Seq[Double]): Double =
      if (r.size < n) Double.NegativeInfinity else r.last

    override def bufferEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()

    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form: `nth(n)(valueCol)` → the n-th largest value. */
  def nth(n: Int)(value: Column): Column =
    udaf(new NthLargest(n)).apply(value)
}

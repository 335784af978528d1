package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-state quantile sketch — the x04 equi-width histogram,
  * factored out of `TemporalPack` so every audit surface that needs
  * quantiles at corpus scale (the s10 ingest run summary, the
  * a08-family tercile thresholds, future datasheet columns) shares ONE
  * implementation instead of re-deriving exact percentiles over
  * corpus-sized relations.
  *
  * Shape (see the x04 scaladoc for the full argument): one bounds scan
  * (min/max/count), one map-side-combining `bins`-bin histogram
  * aggregation — the shuffle carries ≤ `bins` rows, bins MERGE by
  * addition so per-partition/per-day sketches compose — then quantiles
  * read off the cumulative histogram with linear interpolation inside
  * the hit bin. Error is bounded by one bin width (hi−lo)/bins. The
  * cumulative window runs over ≤ `bins` sketch rows (the d08/t07
  * bounded exemption to the no-global-sort rule); nothing sorts or
  * windows the input relation itself. Every step is plain IEEE
  * arithmetic on identical inputs, so the estimate replays
  * bit-for-bit in DuckDB (proved by x04's hash-checked oracle — the
  * r14-KMV story, for quantiles), unlike `percentile_approx`'s
  * engine-private GK sketch.
  */
object Sketches {

  /** Quantile estimates for expression `x` over `values`: one row per
    * probability in `probs`, columns (q, est), ordered by q. Empty
    * input yields zero rows (no bin is hit). NULL inputs are excluded
    * up front — they would otherwise inflate the rank targets while
    * landing in a NULL bin the two engines ORDER differently (Spark
    * NULLS FIRST, DuckDB NULLS LAST), silently skewing estimates AND
    * breaking the bit-for-bit replay. Expressions are otherwise
    * IDENTICAL to the x04 query so the proven DuckDB replay covers
    * every caller. */
  def histogramQuantiles(values: DataFrame, x: Column, bins: Int,
                         probs: Seq[Double]): DataFrame =
    quantileFrame(values, x, bins, probs).select(col("q"), col("est"))

  /** [[histogramQuantiles]] plus the sketch's own `bin_width` column
    * ((hi−lo)/bins — the error bound) so callers that publish the
    * bound never re-scan the input or hard-code the bin count. */
  def histogramQuantilesWithWidth(values: DataFrame, x: Column, bins: Int,
                                  probs: Seq[Double]): DataFrame =
    quantileFrame(values, x, bins, probs)

  private def quantileFrame(values: DataFrame, x: Column, bins: Int,
                            probs: Seq[Double]): DataFrame = {
    require(bins > 0 && probs.nonEmpty, "bins and probs must be non-empty")
    // a prob outside (0, 1] matches no cumulative interval and would
    // silently yield ZERO rows for that q — which a downstream
    // max(when(q === ..., est)) reads as a null quantile instead of a
    // caller bug; fail loudly here instead
    require(probs.forall(p => p > 0 && p <= 1),
      s"probs must lie in (0, 1], got ${probs.mkString(", ")}")
    val v = values.select(x.cast("double").as("x"))
      .filter(col("x").isNotNull)
    val bounds = v.agg(min(col("x")).as("lo"), max(col("x")).as("hi"),
      count(lit(1)).as("n"))
    // hi == lo (constant column) guards to bin 0 — without it the bin
    // expression is 0/0 = NaN; the interpolation below already
    // degrades correctly there ((hi−lo)/bins = 0 ⇒ est = lo)
    val h = v.crossJoin(broadcast(bounds))
      .select(when(col("hi") > col("lo"),
        least(floor((col("x") - col("lo")) / (col("hi") - col("lo")) * bins),
          lit((bins - 1).toLong))).otherwise(0L).cast("int").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
    val wc = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = h.withColumn("cum", sum(col("cnt")).over(wc))
      .withColumn("cum_before", col("cum") - col("cnt"))
    val qf = bounds.select(
      explode(array(probs.map(lit): _*)).as("q"),
      col("lo"), col("hi"), col("n"))
    val target = col("q") * col("n").cast("double")
    qf.join(c, col("cum_before").cast("double") < target &&
        target <= col("cum").cast("double"))
      .select(col("q"),
        (col("lo") + (col("bin").cast("double") +
          (target - col("cum_before").cast("double")) /
            col("cnt").cast("double")) *
          ((col("hi") - col("lo")) / lit(bins.toDouble))).as("est"),
        ((col("hi") - col("lo")) / lit(bins.toDouble)).as("bin_width"))
      .orderBy(col("q"))
  }

  /** The x04 histogram-quantile computation as a DuckDB CTE FRAGMENT
    * (no leading WITH — splice into a caller's chain) over an existing
    * CTE `cteName` with one double column `x` — the oracle twin of
    * [[histogramQuantiles]], shared by every pack that replays a
    * sketch estimate (the s10 run summary; x04 keeps its original
    * inline statement, same expressions). Defines `<prefix>est` with
    * columns (q, est). Probabilities must lie in (0, 1] — `require`d
    * HERE, exactly like the Scala twin: an out-of-range prob would
    * otherwise silently yield zero rows for that q in the emitted SQL
    * (the null-quantile failure mode the Scala guard exists to
    * prevent; both engines must fail loudly, not just one). */
  def histogramQuantilesCtes(cteName: String, bins: Int,
                             probs: Seq[Double],
                             prefix: String = "qs_"): String = {
    require(bins > 0 && probs.nonEmpty, "bins and probs must be non-empty")
    require(probs.forall(p => p > 0 && p <= 1),
      s"probs must lie in (0, 1], got ${probs.mkString(", ")}")
    val plist = probs.mkString(", ")
    s"""${prefix}v AS (SELECT x FROM $cteName WHERE x IS NOT NULL),
      |${prefix}b AS (SELECT min(x) AS lo, max(x) AS hi, count(*) AS n
      |      FROM ${prefix}v),
      |${prefix}h AS (SELECT CAST(CASE WHEN hi > lo
      |          THEN least(floor((x - lo) / (hi - lo) * $bins), ${bins - 1})
      |          ELSE 0 END AS INT) AS bin,
      |        count(*) AS cnt
      |      FROM ${prefix}v CROSS JOIN ${prefix}b GROUP BY 1),
      |${prefix}c AS (SELECT bin, cnt,
      |        sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
      |      FROM ${prefix}h),
      |${prefix}q AS (SELECT unnest([$plist]) AS q),
      |${prefix}est AS (SELECT q.q,
      |  b.lo + (CAST(c.bin AS DOUBLE) +
      |    (q.q * CAST(b.n AS DOUBLE) - CAST(c.cum - c.cnt AS DOUBLE))
      |      / CAST(c.cnt AS DOUBLE)) * ((b.hi - b.lo) / $bins.0) AS est
      |FROM ${prefix}q q CROSS JOIN ${prefix}b b JOIN ${prefix}c c
      |  ON CAST(c.cum - c.cnt AS DOUBLE) < q.q * CAST(b.n AS DOUBLE)
      |  AND q.q * CAST(b.n AS DOUBLE) <= CAST(c.cum AS DOUBLE))""".stripMargin
  }
}

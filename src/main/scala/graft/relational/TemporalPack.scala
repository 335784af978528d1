package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.core.{Exact, Tables}

/** Temporal/range operators beyond the reference's own inventory
  * (builder brief: as-of join, range join — the standard event-stream
  * companions to a training-data pipeline) plus exact per-group
  * quantiles, each under the DuckDB oracle gate.
  */
object TemporalPack extends QueryPack {

  /** x01: backward as-of join — each click attached to the same
    * user's most recent view at or before it ([[AsOfJoin.backward]]:
    * union+window, one shuffle, no pair fan-out). */
  def asofClickView(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("event_id"), unix_micros(col("ts")).as("tsu"),
        col("user_id"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("tsu"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("tsu"),
        col("event_id").as("view_id"), col("tsu").as("view_tsu"))
    AsOfJoin.backward(clicks, views, Seq("user_id"), "tsu", "view_id")
      .select(col("click_id"), col("user_id"), col("view_id"),
        (col("tsu") - col("view_tsu")).as("gap_us"))
      .orderBy(col("click_id"))
  }

  /** x02 price bands — small dimension carried to every executor. */
  val priceBands: Seq[(String, Double, Double)] = Seq(
    ("low", 0.0, 20000.0),
    ("mid", 20000.0, 60000.0),
    ("high", 60000.0, 1.0e12))

  /** x02: range (band) join — lineitem rows bucketed by which
    * [lo, hi) price band contains them. The band side is tiny and
    * `broadcast()` forces the nested-loop plan that is RIGHT for a
    * range predicate against a small dimension: no shuffle of the big
    * side, the scan stays embarrassingly parallel at any scale.
    * (Two large sides would instead bucket the range into grid cells
    * and equi-join on cell — documented in PERF.md.) */
  def rangeBandJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = priceBands.toDF("band", "lo", "hi")
    Tables(spark, dir).lineitem
      .select(col("l_extendedprice"))
      .join(broadcast(bands),
        col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
        Exact.toOut(Exact.sum2(col("l_extendedprice"))).as("sum_price"))
      .orderBy(col("band"))
  }

  /** x03: exact per-group quantiles — Spark's `percentile` (exact
    * continuous interpolation at index p·(n−1), same definition as
    * the oracle's `quantile_cont`). Partial-aggregatable: Spark
    * collects per-partition value/count maps, so the shuffle carries
    * distinct values, not rows. */
  def quantilesExact(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_quantity"), lit(0.25)).as("p25"),
        percentile(col("l_quantity"), lit(0.5)).as("p50"),
        percentile(col("l_quantity"), lit(0.9)).as("p90"))
      .orderBy(col("l_returnflag"))

  /** x04: histogram-sketch quantiles — the 100 TB path where x03's
    * exact per-value aggregation map no longer fits. One pass builds
    * an equi-width 1000-bin histogram (plus a min/max/count bounds
    * scan); quantiles read off the cumulative histogram with linear
    * interpolation inside the hit bin. The shuffle carries ≤1000
    * sketch rows, bins MERGE by addition (per-partition / per-day
    * sketches compose), and error is bounded by one bin width
    * (hi−lo)/1000. Unlike `percentile_approx`'s GK sketch, every step
    * is plain IEEE arithmetic on identical inputs, so the estimate
    * replays bit-for-bit in DuckDB — the r14-KMV story, for
    * quantiles. The cumulative window runs over ≤1000 sketch rows
    * (bounded — the d08/t07 exemption to the no-global-sort rule).
    * The computation lives in [[graft.core.Sketches]] (round 11) so
    * the other audit surfaces that need corpus-scale quantiles (the
    * s10 ingest run summary, the a08-family threshold seam) share
    * this proven-replayable implementation. */
  def histogramQuantiles(spark: SparkSession, dir: String): DataFrame =
    graft.core.Sketches.histogramQuantiles(
      Tables(spark, dir).lineitem, col("l_extendedprice"),
      bins = 1000, probs = Seq(0.25, 0.5, 0.75, 0.9, 0.99))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x01_asof_join" -> asofClickView,
    "x02_range_band_join" -> rangeBandJoin,
    "x03_quantiles_exact" -> quantilesExact,
    "x04_histogram_quantiles" -> histogramQuantiles)

  val oracles: Map[String, String] = Map(
    "x01_asof_join" -> """
      |WITH ev AS (SELECT event_id, epoch_us(ts) AS tsu, user_id, event_type
      |  FROM events),
      |c AS (SELECT event_id AS click_id, user_id, tsu FROM ev
      |  WHERE event_type = 'click'),
      |v AS (SELECT user_id, tsu, event_id AS view_id FROM ev
      |  WHERE event_type = 'view')
      |SELECT c.click_id, c.user_id, l.view_id, c.tsu - l.view_tsu AS gap_us
      |FROM c LEFT JOIN LATERAL (
      |  SELECT v.view_id, v.tsu AS view_tsu FROM v
      |  WHERE v.user_id = c.user_id AND v.tsu <= c.tsu
      |  ORDER BY v.tsu DESC, v.view_id DESC LIMIT 1) l ON true
      |ORDER BY click_id""".stripMargin,
    "x02_range_band_join" -> s"""
      |WITH bands(band, lo, hi) AS (VALUES ${priceBands.map {
           case (b, lo, hi) => s"('$b', $lo, $hi)"
         }.mkString(", ")})
      |SELECT band, count(*) AS n,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
      |    AS DOUBLE) AS sum_price
      |FROM lineitem JOIN bands
      |  ON l_extendedprice >= lo AND l_extendedprice < hi
      |GROUP BY band ORDER BY band""".stripMargin,
    "x03_quantiles_exact" -> """
      |SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.5) AS p50,
      |  quantile_cont(l_quantity, 0.9) AS p90
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "x04_histogram_quantiles" -> """
      |WITH v AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem),
      |b AS (SELECT min(x) AS lo, max(x) AS hi, count(*) AS n FROM v),
      |h AS (SELECT CAST(CASE WHEN hi > lo
      |          THEN least(floor((x - lo) / (hi - lo) * 1000), 999)
      |          ELSE 0 END AS INT) AS bin,
      |        count(*) AS cnt
      |      FROM v CROSS JOIN b GROUP BY 1),
      |c AS (SELECT bin, cnt,
      |        sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
      |      FROM h),
      |q AS (SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS q)
      |SELECT q.q,
      |  b.lo + (CAST(c.bin AS DOUBLE) +
      |    (q.q * CAST(b.n AS DOUBLE) - CAST(c.cum - c.cnt AS DOUBLE))
      |      / CAST(c.cnt AS DOUBLE)) * ((b.hi - b.lo) / 1000.0) AS est
      |FROM q CROSS JOIN b JOIN c
      |  ON CAST(c.cum - c.cnt AS DOUBLE) < q.q * CAST(b.n AS DOUBLE)
      |  AND q.q * CAST(b.n AS DOUBLE) <= CAST(c.cum AS DOUBLE)
      |ORDER BY q.q""".stripMargin)
}

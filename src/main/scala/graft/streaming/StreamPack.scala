package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.core.Tables

/** Batch-side oracle checks for the streaming transforms: the same
  * functions run in the streaming specs; DuckDB verifies the event-
  * time semantics here (tumbling, sliding, session gap, JSON props). */
object StreamPack extends QueryPack {

  def tumbling(spark: SparkSession, dir: String): DataFrame =
    Streams.tumblingCounts(Tables(spark, dir).events)
      .orderBy(col("window_start"), col("event_type"))

  def sliding(spark: SparkSession, dir: String): DataFrame =
    Streams.slidingCounts(Tables(spark, dir).events)
      .orderBy(col("window_start"), col("event_type"))

  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    Streams.sessions(Tables(spark, dir).events)
      .orderBy(col("user_id"), col("session_start"))

  def props(spark: SparkSession, dir: String): DataFrame =
    Streams.propsRollup(Tables(spark, dir).events)
      .orderBy(col("event_type"))

  def dedupKeys(spark: SparkSession, dir: String): DataFrame =
    Streams.dedupKeys(Tables(spark, dir).events)
      .orderBy(col("user_id"), col("event_type"), col("bucket_start"))

  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    Streams.attribution(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "purchase"))
      .orderBy(col("view_id"), col("purchase_id"))
  }

  /** s07: the ingest gate's deterministic batch twin over the
    * augmented corpus (planted dups give the dedup real work): quality
    * cut at 0.45 (the word-count tail fails the length score), then
    * min-doc_id per content digest — what first-arrival-wins converges
    * to under id-ordered ingest. The streaming form
    * ([[Streams.ingestGate]]) is the same scalar expressions +
    * `dropDuplicates`; the spec pins stream ≡ batch with the dedup
    * state carried ACROSS micro-batches. */
  def ingestGate(spark: SparkSession, dir: String): DataFrame = {
    val scored = graft.core.Caches.transient(
      graft.dedup.DedupPack.augmented(spark, dir)
        .select(col("doc_id"), md5(col("text")).as("content_hash"),
          round(graft.text.TextAnalysis.qualityScore(col("text")), 6)
            .as("quality"))
        .filter(col("quality") >= 0.45))
    val keeper = scored.groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
    scored.join(keeper, Seq("content_hash", "doc_id"))
      .select(col("doc_id"), col("content_hash"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** s08: the admission-cap batch twin ([[Streams.rateLimitBatch]]) —
    * first 5 events per user by (ts, event_id). */
  def rateLimit(spark: SparkSession, dir: String): DataFrame =
    Streams.rateLimitBatch(Tables(spark, dir).events, 5)
      .orderBy(col("user_id"), col("admit_seq"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s08_rate_limit" -> rateLimit,
    "s07_ingest_gate" -> ingestGate,
    "s01_tumbling_counts" -> tumbling,
    "s02_sliding_counts" -> sliding,
    "s03_session_windows" -> sessionWindows,
    "s04_props_rollup" -> props,
    "s05_dedup_keys" -> dedupKeys,
    "s06_attribution_join" -> attribution)

  private def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")
  private val stopAll = graft.text.TextAnalysis.defaultProfiles.flatMap(_._2)

  val oracles: Map[String, String] = Map(
    "s07_ingest_gate" -> s"""
      |WITH ${graft.dedup.DedupPack.augmentedSql},
      |w AS (SELECT doc_id, text, CASE WHEN length(trim(text)) = 0 THEN []
      |    ELSE regexp_split_to_array(trim(text), '\\s+') END AS words FROM aug),
      |q AS (SELECT doc_id, md5(text) AS content_hash,
      |  round(0.4 * (CASE WHEN len(words) > 0
      |      THEN CAST(len(list_filter(words, x -> x IN (${inList(stopAll)}))) AS DOUBLE)
      |        / CAST(len(words) AS DOUBLE) ELSE 0.0 END)
      |    + 0.3 * (1.0 - (CASE WHEN length(text) > 0
      |      THEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
      |        / CAST(length(text) AS DOUBLE) ELSE 0.0 END))
      |    + 0.3 * least(1.0, CAST(len(words) AS DOUBLE) / 100.0), 6) AS quality
      |  FROM w),
      |f AS (SELECT * FROM q WHERE quality >= 0.45),
      |k AS (SELECT content_hash, min(doc_id) AS doc_id FROM f GROUP BY 1)
      |SELECT f.doc_id, f.content_hash, f.quality
      |FROM f JOIN k ON k.content_hash = f.content_hash AND k.doc_id = f.doc_id
      |ORDER BY f.doc_id""".stripMargin,
    "s01_tumbling_counts" -> """
      |SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |  event_type, count(*) AS n,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
      |FROM events GROUP BY time_bucket(INTERVAL '1 hour', ts), event_type
      |ORDER BY window_start, event_type""".stripMargin,
    "s02_sliding_counts" -> """
      |WITH s AS (SELECT event_type,
      |  unnest([time_bucket(INTERVAL '30 minutes', ts),
      |          time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws
      |  FROM events)
      |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
      |  count(*) AS n
      |FROM s GROUP BY ws, event_type
      |ORDER BY window_start, event_type""".stripMargin,
    "s03_session_windows" -> """
      |WITH o AS (SELECT user_id, ts,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      >= INTERVAL '10 minutes' OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |    THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |g AS (SELECT user_id, ts,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM o)
      |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
      |  count(*) AS n_events
      |FROM g GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin,
    "s04_props_rollup" -> """
      |SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "s05_dedup_keys" -> """
      |SELECT DISTINCT user_id, event_type,
      |  strftime(time_bucket(INTERVAL '5 minutes', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start
      |FROM events
      |ORDER BY user_id, event_type, bucket_start""".stripMargin,
    "s06_attribution_join" -> """
      |SELECT a.event_id AS view_id, b.event_id AS purchase_id, a.user_id,
      |  epoch_us(b.ts) - epoch_us(a.ts) AS lag_us
      |FROM events a JOIN events b ON a.user_id = b.user_id
      |WHERE a.event_type = 'view' AND b.event_type = 'purchase'
      |  AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 30 MINUTE
      |ORDER BY view_id, purchase_id""".stripMargin,
    "s08_rate_limit" -> """
      |SELECT user_id, event_id, CAST(rn AS BIGINT) AS admit_seq FROM (
      |  SELECT user_id, event_id,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events)
      |WHERE rn <= 5 ORDER BY user_id, admit_seq""".stripMargin)
}

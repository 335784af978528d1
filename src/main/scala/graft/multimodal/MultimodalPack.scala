package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.core.Tables

/** Oracle-checked multimodal plumbing queries: synthetic binary media
  * derived from `documents`, decoded/resized/frame-sampled with pure
  * expressions (the mapPartitions stage is spec-checked equal to the
  * expression twin — DuckDB can't slice blobs, so its side of these
  * oracles works on the hex view). */
object MultimodalPack extends QueryPack {

  /** media table: one synthetic 64-byte blob per document. */
  def media(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id").as("media_id"),
        Multimodal.syntheticContent(col("text")).as("content"))

  def decodeMeta(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir).select(col("media_id"),
        Multimodal.widthOf(col("content")).cast("long").as("width"),
        Multimodal.heightOf(col("content")).cast("long").as("height"),
        Multimodal.formatOf(col("content")).as("format"),
        length(col("content")).cast("long").as("n_bytes"))
      .orderBy(col("media_id"))

  def frames(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir)
      .select(col("media_id"),
        explode(Multimodal.sampleFrames(col("content"), 3)).as("f"))
      .select(col("media_id"),
        col("f.frame_idx").cast("long").as("frame_idx"),
        col("f.frame_val").as("frame_val"))
      .orderBy(col("media_id"), col("frame_idx"))

  def resized(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir)
      .select(col("media_id"),
        length(Multimodal.resize(col("content"), 16)).cast("long").as("n_bytes"),
        md5(Multimodal.hexOf(Multimodal.resize(col("content"), 16)))
          .as("content_md5"))
      .orderBy(col("media_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm01_decode_meta" -> decodeMeta,
    "mm02_frames" -> frames,
    "mm03_resized" -> resized)

  /** 64-byte synthetic content as a 128-char hex string. */
  private val hexCte = """
    |h AS (SELECT doc_id AS media_id,
    |    md5(text) || md5(text || '1') || md5(text || '2') || md5(text || '3') AS hx
    |  FROM documents)""".stripMargin

  private def byteAt(pos: Int): String =
    s"CAST((strpos('0123456789abcdef', substr(hx, ${pos * 2 + 1}, 1)) - 1) * 16 + " +
      s"(strpos('0123456789abcdef', substr(hx, ${pos * 2 + 2}, 1)) - 1) AS INT)"

  val oracles: Map[String, String] = Map(
    "mm01_decode_meta" -> s"""
      |WITH $hexCte
      |SELECT media_id,
      |  CAST(16 + ${byteAt(0)} % 240 AS BIGINT) AS width,
      |  CAST(16 + ${byteAt(1)} % 240 AS BIGINT) AS height,
      |  ['jpeg', 'png', 'webp'][${byteAt(2)} % 3 + 1] AS format,
      |  CAST(length(hx) // 2 AS BIGINT) AS n_bytes
      |FROM h ORDER BY media_id""".stripMargin,
    "mm02_frames" -> s"""
      |WITH $hexCte,
      |f AS (SELECT media_id, unnest(range(0, length(hx) // 8, 3)) AS frame_idx, hx FROM h)
      |SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
      |  CAST((strpos('0123456789abcdef', substr(hx, CAST(frame_idx * 8 + 1 AS INT), 1)) - 1) * 4096
      |     + (strpos('0123456789abcdef', substr(hx, CAST(frame_idx * 8 + 2 AS INT), 1)) - 1) * 256
      |     + (strpos('0123456789abcdef', substr(hx, CAST(frame_idx * 8 + 3 AS INT), 1)) - 1) * 16
      |     + (strpos('0123456789abcdef', substr(hx, CAST(frame_idx * 8 + 4 AS INT), 1)) - 1) AS BIGINT) AS frame_val
      |FROM f ORDER BY media_id, frame_idx""".stripMargin,
    "mm03_resized" -> s"""
      |WITH $hexCte
      |SELECT media_id, CAST(16 AS BIGINT) AS n_bytes,
      |  md5(substr(hx, 1, 32)) AS content_md5
      |FROM h ORDER BY media_id""".stripMargin)
}

package graft.ingest

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.core.Tables

/** End-to-end check of the CSV ingestion path (SURVEY.md §2.1 S1-S3 +
  * P10/P11 + §3.1): the query materializes a REAL per-channel CSV
  * tree (derived deterministically from `documents`), reads it back
  * through [[Ingest.readPages]] — glob scan, lineage columns, page
  * numbering window — and the oracle recomputes the same table from
  * `documents` alone. If the scan, the window, or the path-derived
  * columns are wrong, the hashes diverge.
  */
object IngestPack extends QueryPack {

  private val channels = Seq("EML", "FAX", "WIN", "SCN")
  private val PageWords = 10
  private val NDocs = 40

  /** Deterministic fixture tree under ./target (inside the repo). */
  private def writeFixtures(spark: SparkSession, dir: String): String = {
    val root = s"target/fixtures_i01_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
    val docs = Tables(spark, dir).documents
      .filter(col("doc_id") < NDocs)
      .select(col("doc_id"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    docs.foreach { case (id, text) =>
      val channel = channels((id % channels.length).toInt)
      val words = text.trim.split("\\s+").filter(_.nonEmpty)
      val pages = words.grouped(PageWords).map(_.mkString(" ")).toSeq
      val chDir = Paths.get(root, channel)
      Files.createDirectories(chDir)
      Files.writeString(chDir.resolve(s"doc$id.csv"), pages.mkString("\n") + "\n")
    }
    root
  }

  /** Scan the fixture tree → page table → (fn, channel, PE_num, md5). */
  def ingestPages(spark: SparkSession, dir: String): DataFrame = {
    val root = writeFixtures(spark, dir)
    Ingest.readPages(spark, root, channels)
      .select(col("fn"), col("channel"), col("PE_num").cast("long").as("pe_num"),
        md5(col("text")).as("page_md5"))
      .orderBy(col("fn"), col("pe_num"))
  }

  /** S8 on the scanned pages: per-file flatten ordered by PE_num. */
  def ingestFlatten(spark: SparkSession, dir: String): DataFrame = {
    val root = writeFixtures(spark, dir)
    Ingest.flattenPages(
        Ingest.readPages(spark, root, channels),
        col("fn"), col("PE_num"), col("text"))
      .select(col("fn"), md5(col("full_text")).as("full_md5"))
      .orderBy(col("fn"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "i01_ingest_pages" -> ingestPages,
    "i02_ingest_flatten" -> ingestFlatten)

  private val pagesCte = s"""
    |d AS (SELECT doc_id, 'doc' || CAST(doc_id AS VARCHAR) || '.csv' AS fn,
    |    ['EML', 'FAX', 'WIN', 'SCN'][CAST(doc_id % 4 AS INT) + 1] AS channel,
    |    regexp_split_to_array(trim(text), '\\s+') AS words
    |  FROM documents WHERE doc_id < $NDocs),
    |p AS (SELECT fn, channel, words,
    |    unnest(range(0, len(words), $PageWords)) AS s
    |  FROM d),
    |pages AS (SELECT fn, channel, CAST(s // $PageWords + 1 AS BIGINT) AS pe_num,
    |    array_to_string(words[s+1:least(s+$PageWords, len(words))], ' ') AS page
    |  FROM p)""".stripMargin

  val oracles: Map[String, String] = Map(
    "i01_ingest_pages" -> s"""
      |WITH $pagesCte
      |SELECT fn, channel, pe_num, md5(page) AS page_md5
      |FROM pages ORDER BY fn, pe_num""".stripMargin,
    "i02_ingest_flatten" -> s"""
      |WITH $pagesCte
      |SELECT fn, md5(string_agg(page, chr(10) ORDER BY pe_num)) AS full_md5
      |FROM pages GROUP BY fn ORDER BY fn""".stripMargin)
}

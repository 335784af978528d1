package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Reading through `spark.read.parquet` keeps the scan declarative so
  * Catalyst pushes filters/column pruning into the parquet reader —
  * at 100 TB the scan is the dominant cost and pushdown is the first
  * lever.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads
    * as a raw long (`spark.sql.legacy.parquet.nanosAsLong`, set by
    * every engine session). Truncating-divide to micros matches how
    * DuckDB (µs-precision timestamps) reads the same file. */
  def events: DataFrame = {
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, not `/`: epoch-nanos exceed 2^53 and a double
        // division would corrupt the low bits.
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }

  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A bundle of named queries plus their DuckDB oracle SQL.
  *
  * Every operator family contributes one pack; [[SparkEntry]] is the
  * union. Queries without an oracle entry get the driver's weaker
  * rows-only check (reserved for non-SQL-expressible ops: seeded
  * sampling, approximate sketches, streaming).
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}

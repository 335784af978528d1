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

  /** Oracle SQL for a SPECIFIC data dir. Most packs' oracle text is
    * dir-independent (the driver runs it against whatever tables it
    * attaches), so the default just returns [[oracles]]; packs whose
    * oracles embed PER-DIR state (MlPack's fitted weights) override
    * this so Verify's dump always pairs the dir under verification
    * with that dir's own recorded state — never another dir's. */
  def oraclesFor(dir: String): Map[String, String] = oracles

  /** Session-artifact builders this pack's queries share (frames
    * memoized via [[graft.core.Artifacts]] — computed once, read by
    * several queries). A benchmark warms these BEFORE its timed loop
    * and reports the build cost as its own line, so per-query numbers
    * measure the queries, not re-derivation of compute-once state. */
  def artifacts: Map[String, (SparkSession, String) => DataFrame] = Map.empty
}

package graft.text

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing — the "concatenate documents and chunk into
  * fixed-length training sequences" layout step of LLM pretraining
  * (GPT-3 §2.1 packs documents end-to-end with separators; Gopher
  * §A.1.2 likewise): documents in deterministic id order lie on one
  * token tape; a document's first token position is the running total
  * of preceding documents' token counts, from which its training
  * sequence id and in-sequence offset follow by division.
  *
  * The running total is a DISTRIBUTED PREFIX SUM, not a global window:
  * `Window.orderBy(id)` cumsum funnels the whole corpus through one
  * partition — the classic scale bug. Here: range-repartition by id +
  * sort within partitions (global order across partition boundaries),
  * one pass collecting per-partition token totals (ONE ROW PER
  * PARTITION — bounded by cluster size, not data), exclusive prefix
  * over those on the driver, broadcast, then a partition-local running
  * sum. Two linear passes, no extra shuffle beyond the range
  * partition. Output is independent of the partition count (range
  * bounds only move work, never positions) — the spec pins equality
  * across partitionings against the window form.
  */
object SequencePacking {

  /** (id, n_tok, tok_start, seq_id, seq_offset) per input row:
    * `tok_start` = sum of n_tok over all rows with smaller id,
    * `seq_id` = tok_start / seqLen, `seq_offset` = tok_start % seqLen. */
  def packSequences(df: DataFrame, id: Column, tokens: Column,
                    seqLen: Long, numPartitions: Int = 0): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val np = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val parted = graft.core.Caches.transient(
      df.select(id.cast("long").as("id"), tokens.cast("long").as("n_tok"))
        .repartitionByRange(np, col("id"))
        .sortWithinPartitions(col("id"))
        .as[(Long, Long)])
    // pass 1: per-partition totals — one row per partition
    val totals: Array[(Int, Long)] = parted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var s = 0L
      it.foreach(s += _._2)
      Iterator((pid, s))
    }.collect()
    val offsets: Map[Int, Long] = {
      var acc = 0L
      totals.sortBy(_._1).map { case (pid, t) =>
        val o = pid -> acc
        acc += t
        o
      }.toMap
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val L = seqLen
    // pass 2: partition-local running sum from the broadcast offset
    parted.mapPartitions { it =>
      var run = bc.value(TaskContext.getPartitionId())
      it.map { case (docId, n) =>
        val start = run
        run += n
        (docId, n, start, start / L, start % L)
      }
    }.toDF("id", "n_tok", "tok_start", "seq_id", "seq_offset")
  }
}

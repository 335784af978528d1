package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-memory frequent-items sketch: Misra–Gries (1982), merged
  * with the Agarwal et al. 2013 "Mergeable Summaries" rule — the
  * heavy-hitters operator a corpus pipeline needs when the vocabulary
  * no longer fits anywhere (at 100 TB the exact word-count groupBy
  * shuffles billions of distinct tokens; the sketch keeps `capacity`
  * counters per partial, combines map-side, and merges associatively).
  *
  * Guarantees (N = stream length, k = capacity):
  *  - every estimate is an UNDER-count: true − N/(k+1) ≤ est ≤ true;
  *  - every item with true count > N/(k+1) survives the sketch;
  *  - with k ≥ distinct-item count nothing ever decrements, so the
  *    sketch is EXACT — the regime the a15 oracle hash-checks, the
  *    way r14's deterministic KMV twins r13's HLL; the error regime
  *    is spec-bounded (HeavyHitters spec).
  *
  * Both transition rules are value-deterministic (decrement-all by
  * one; merge subtracts the (k+1)-th largest summed count), so the
  * result is independent of partitioning/merge order in the exact
  * regime, and the bounds hold in any order otherwise.
  */
object HeavyHitters {

  /** Spark `Aggregator` over token rows; buffer = bounded counter map.
    * Partial aggregation applies per partition (map-side), merges
    * combine partials — the sketch never sees a global shuffle of raw
    * tokens, only `capacity`-sized maps. */
  final class MisraGries(capacity: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(capacity > 0, "capacity must be positive")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], tok: String): Map[String, Long] = {
      if (tok == null) return b
      b.get(tok) match {
        case Some(c) => b.updated(tok, c + 1)
        case None if b.size < capacity => b.updated(tok, 1L)
        case None =>
          // classic MG step: a full sketch meeting a new item
          // decrements EVERY counter (the new item is not inserted);
          // zeros drop out, freeing slots for later items
          b.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
      }
    }

    override def merge(a: Map[String, Long],
                       b: Map[String, Long]): Map[String, Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val summed = mutable.HashMap.from(a)
      b.foreach { case (t, c) => summed.update(t, summed.getOrElse(t, 0L) + c) }
      if (summed.size <= capacity) summed.toMap
      else {
        // mergeable-summaries rule: subtract the (capacity+1)-th
        // largest count from every counter, keep the positive ones —
        // value-based, so merge order cannot change the result set
        val thresh = summed.valuesIterator.toArray
          .sortInPlace()(Ordering.Long.reverse).apply(capacity)
        summed.iterator.collect {
          case (t, c) if c > thresh => t -> (c - thresh)
        }.toMap
      }
    }

    override def finish(r: Map[String, Long]): Map[String, Long] = r

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Column form: `mg(tokenCol)` → map<string,long> sketch. */
  def mg(capacity: Int)(tokens: Column): Column =
    udaf(new MisraGries(capacity)).apply(tokens)
}

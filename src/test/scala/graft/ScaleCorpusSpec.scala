package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale corpus is only useful if each copy is a self-consistent
  * keyspace shard: joins must resolve fully within a copy and never
  * across copies, and types must round-trip (an int32 key silently
  * widened to long would change shuffle hashing and memory math at
  * scale). */
class ScaleCorpusSpec extends AnyFunSuite {
  import SparkTestSession._

  test("scaled copies are key-shifted, self-consistent, type-stable") {
    val t = graft.core.Tables(spark, sf)
    val factor = 3
    val orders = ScaleCorpus.scaled(t.orders, "orders", factor)
    val customer = ScaleCorpus.scaled(t.customer, "customer", factor)
    val nOrders = t.orders.count()

    assert(orders.count() == factor * nOrders)
    assert(orders.schema == t.orders.schema, "types must round-trip")
    assert(customer.schema == t.customer.schema)

    // every scaled order still finds its customer (joins resolve
    // within a copy)...
    val joined = orders.join(customer,
      orders("o_custkey") === customer("c_custkey"))
    assert(joined.count() == factor * nOrders)
    // ...and key ranges are disjoint across copies (no cross-copy
    // collisions inflating join fan-out)
    val ranges = orders
      .withColumn("copy", (col("o_orderkey") / 1000000000L).cast("long"))
      .groupBy("copy").agg(count(lit(1)).as("n"))
      .collect()
    assert(ranges.length == factor)
    assert(ranges.forall(_.getLong(1) == nOrders))
  }

  test("int32 keys shift without overflow or widening") {
    val t = graft.core.Tables(spark, sf)
    val nation = ScaleCorpus.scaled(t.nation, "nation", 2)
    assert(nation.schema("n_nationkey").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // copy 1 keys sit exactly 10000 above copy 0
    val keys = nation.select("n_nationkey").collect().map(_.getInt(0)).sorted
    val n = keys.length / 2
    assert(keys.takeRight(n).zip(keys.take(n)).forall {
      case (hi, lo) => hi == lo + 10000
    })
  }
}

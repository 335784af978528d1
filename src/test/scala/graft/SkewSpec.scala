package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.relational.Skew

class SkewSpec extends AnyFunSuite {
  import SparkTestSession._

  test("salted join returns exactly the rows of the plain join") {
    val t = Tables(spark, sf)
    val fact = t.lineitem.select(col("l_orderkey"), col("l_quantity"))
    val dim = t.orders.select(col("o_orderkey").as("l_orderkey"),
      col("o_totalprice"))
    val plain = fact.join(dim, Seq("l_orderkey"))
      .groupBy("l_orderkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(fact, dim, "l_orderkey", 8)
      .groupBy("l_orderkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted two-phase sum equals direct groupBy sum") {
    val t = Tables(spark, sf)
    val direct = t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val salted = Skew.saltedSum(t.lineitem, col("l_returnflag"),
        col("l_quantity").cast("decimal(18,2)"), 16)
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(salted.keySet == direct.keySet)
    direct.foreach { case (k, v) =>
      assert(salted(k).compareTo(v) == 0, s"key $k")
    }
  }

  test("partitioned layout prunes non-matching partitions from the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val docs = Tables(spark, sf).documents
      .withColumn("channel",
        element_at(array(lit("EML"), lit("FAX"), lit("WIN"), lit("SCN")),
          pmod(col("doc_id"), lit(4)).cast("int") + 1))
    Skew.writePartitioned(docs, dir, Seq("channel", "lang"))
    val back = spark.read.parquet(dir)
      .filter(col("channel") === "EML" && col("lang") === "de")
    // partition filters prune at planning: the scan's selected
    // partitions shrink, and no Filter on channel/lang remains
    val scan = back.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") &&
      (scan.contains("channel#") || scan.contains("isnotnull(channel")),
      s"no partition filters in scan:\n$scan")
    val expected = docs.filter(col("channel") === "EML" && col("lang") === "de").count()
    assert(back.count() == expected && expected > 0)
  }

  test("bucketed co-located join plans without a shuffle") {
    val orders = Tables(spark, sf).orders
    val lineitem = Tables(spark, sf).lineitem
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Skew.writeBucketed(orders, "b_orders", 8, "o_orderkey")
    Skew.writeBucketed(lineitem, "b_lineitem", 8, "o_orderkey")
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path: the point is that bucketing makes
      // the shuffle unnecessary, not that broadcast avoids it
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders")
        .join(spark.table("b_lineitem"), "o_orderkey")
        .select(col("o_orderkey"), col("l_quantity"))
      val n = j.count()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"shuffle in bucketed join:\n$plan")
      val expected = orders.join(lineitem, "o_orderkey").count()
      assert(n == expected && n > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("compaction collapses a fragmented directory to byte-budget file count") {
    def dataFiles(d: String) = new java.io.File(d).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    val frag = java.nio.file.Files.createTempDirectory("graft_frag").toString + "/in"
    Tables(spark, sf).documents
      .select(col("doc_id"), col("text"))
      .repartition(48)
      .write.mode("overwrite").parquet(frag)
    assert(dataFiles(frag).length == 48, "fixture must start fragmented")
    val fragBytes = dataFiles(frag).map(_.length).sum
    val target = 64 * 1024L
    val out = Skew.compact(spark, frag, frag + "_out", target)
    val files = dataFiles(out)
    val expected = math.max(1L, (fragBytes + target - 1) / target)
    assert(files.length == expected,
      s"expected $expected files, got ${files.length}")
    assert(files.length < 48, "compaction must reduce the file count")
    // content survives the rewrite bit-for-bit
    val before = spark.read.parquet(frag).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val after = spark.read.parquet(out).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == before)
    // round-robin repartition balances bytes: no file wildly over
    // target (2x covers compression-ratio variance between layouts)
    files.foreach(f => assert(f.length < 2 * target,
      s"${f.getName} is ${f.length} bytes, target $target"))
  }
}

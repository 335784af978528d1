package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalPackSpec extends AnyFunSuite {
  import SparkTestSession._

  test("every declared query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"query $name returned 0 rows")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("pricing summary is grouped correctly") {
    val df = relational.RelationalPack.pricingSummary(spark, sf)
    val rows = df.collect()
    assert(rows.length > 1)
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length == keys.length, "duplicate group keys")
  }

  test("window top order keeps exactly one row per customer") {
    val df = relational.RelationalPack.windowTopOrder(spark, sf)
    import spark.implicits._
    val custs = df.select($"o_custkey").collect().map(_.getLong(0))
    assert(custs.distinct.length == custs.length)
  }

  test("rollup has an Overall grand total equal to column sum") {
    val rows = relational.RelationalPack.rollupReturns(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val overall = rows("Overall")
    val parts = rows.filterNot(_._1 == "Overall").values.sum
    assert(overall == parts)
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.plans.{KnnJoinPlan, KnnJoinStrategy}
import graft.vector.KnnJoin

class KnnPlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val withStrategy: Unit = {
    // planner strategies can attach to a live session via the
    // experimental hook (GraftExtensions does it at builder time)
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ KnnJoinStrategy
  }

  test("custom plan node executes through KnnJoinExec") {
    withStrategy
    val e = Tables(spark, sf).embeddings
    val df = KnnJoinPlan.knnJoin(spark, e, e, 3)
    val physical = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in tree rendering
    assert(physical.contains("KnnJoin"), s"plan:\n$physical")
    assert(df.columns.toSeq == Seq("query_id", "rank", "neighbor_id", "sim"))
  }

  test("custom operator results equal the broadcast-heap helper exactly") {
    withStrategy
    val e = Tables(spark, sf).embeddings
    val viaPlan = KnnJoinPlan.knnJoin(spark, e, e, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val viaHelper = KnnJoin.exactBroadcast(spark, e, e, 3)
      .collect().map(h => (h.query_id, h.rank.toLong, h.neighbor_id, h.sim))
      .toSet
    assert(viaPlan == viaHelper)
  }

  test("custom operator composes with downstream relational ops") {
    withStrategy
    val e = Tables(spark, sf).embeddings
    val top1Counts = KnnJoinPlan.knnJoin(spark, e, e, 1)
      .join(e.select(col("vec_id").as("neighbor_id"), col("label")), Seq("neighbor_id"))
      .groupBy("label").count()
    assert(top1Counts.collect().map(_.getLong(1)).sum == e.count())
  }
}

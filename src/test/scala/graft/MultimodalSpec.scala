package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MediaStage, MultimodalPack}

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("mapPartitions decode stage agrees with the expression twin") {
    val m = MultimodalPack.media(spark, sf)
    val staged = MediaStage.decode(m, col("media_id"), col("content"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3), r.getInt(4)))
      .toSet
    val expr = MultimodalPack.decodeMeta(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt,
        r.getString(3), r.getLong(4).toInt))
      .toSet
    assert(staged == expr)
  }

  test("binary media round-trips parquet with metadata-only pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    MultimodalPack.media(spark, sf).write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("content").dataType ==
      org.apache.spark.sql.types.BinaryType)
    // metadata-only projection must not read the content column
    val plan = back.select(col("media_id")).queryExecution.executedPlan.toString
    assert(plan.contains("media_id") && !plan.contains("content"),
      s"content column not pruned:\n$plan")
    assert(back.count() == MultimodalPack.media(spark, sf).count())
  }

  test("frame sampling explodes 64-byte content into 6 frames") {
    val n = MultimodalPack.frames(spark, sf)
      .groupBy("media_id").count().select(min("count"), max("count"))
      .collect()(0)
    // 16 frames sampled every 3rd → indices 0,3,6,9,12,15 → 6
    assert(n.getLong(0) == 6 && n.getLong(1) == 6)
  }
}

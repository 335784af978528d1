package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing probe for local iteration (not part of the
  * driver contract). `SPARK_GRAFT_SF_DIR` selects the scale. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }

    import graft.dedup.{Dedup, DedupPack}
    val aug = DedupPack.augmented(spark, sfDir)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("augmented scan")(noop(aug))
    val exploded = aug.select(col("doc_id").as("id"),
      explode(Dedup.shingles(col("text"), 3)).as("sh"))
    time("native shingle explode")(noop(exploded))
    val hashedRows = exploded
      .select(col("id"), Dedup.hash60(col("sh")).as("sh"))
    time("explode + hash60")(noop(hashedRows))
    time("explode + hash60 + distinct")(noop(hashedRows.distinct()))
    val hr = hashedRows.distinct().cache()
    time("materialize hashed cache")(hr.count())
    val a2 = hr.select(col("id").as("a_id"), col("sh"))
    val b2 = hr.select(col("id").as("b_id"), col("sh"))
    time("self-join long keys") {
      noop(a2.join(b2, Seq("sh")).filter(col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("inter")))
    }
    time("full jaccardPairs")(noop(DedupPack.jaccard(spark, sfDir)))
    spark.stop()
  }
}

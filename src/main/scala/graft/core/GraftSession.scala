package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard settings.
  *
  * Local mode is one JVM with N executor threads; on a real cluster the
  * same configs apply per-executor. Shuffle partitions default to the
  * local core count (not Spark's 200) and AQE re-plans at runtime
  * (coalesces small shuffle partitions, splits skewed ones) so the same
  * job scales from sf0.001 smoke tests to the 100 TB target without
  * hand-tuning.
  */
object GraftSession {
  def local(
      cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      // the engine's SQL surface (money_norm, array_dot, chunk), the
      // kNN planner strategy and the top-k rewrite rule
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Permissive-parse is the engine contract (reference semantics:
      // unparseable → None); legacy cast-null matches the oracle's
      // explicit TRY_CASTs.
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

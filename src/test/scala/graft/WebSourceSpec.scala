package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{FileFetcher, PageFetcher}

/** Delegates to [[FileFetcher]] and counts every fetch JVM-wide —
  * local-mode executors share the JVM, so the counter observes
  * executor-side transport activity. */
final class CountingFetcher extends PageFetcher {
  private val inner = new FileFetcher
  def fetch(url: String): String = {
    CountingFetcher.fetches.incrementAndGet()
    inner.fetch(url)
  }
}
object CountingFetcher {
  val fetches = new AtomicInteger(0)
  def reset(): Unit = fetches.set(0)
}

class WebSourceSpec extends AnyFunSuite {
  import SparkTestSession._

  private def writePages(n: Int): Seq[String] = {
    val root = Paths.get("target/fixtures_websource")
    Files.createDirectories(root)
    (0 until n).map { i =>
      val p = root.resolve(s"p$i.html")
      Files.writeString(p, s"<table><tr><td>w$i</td><td>2</td></tr></table>")
      s"file:${p.toAbsolutePath}"
    }
  }

  test("short name resolves and the scan returns one row per url") {
    val urls = writePages(5)
    val df = spark.read.format("graft-web")
      .option("urls", urls.mkString(",")).load()
    assert(df.columns.toSeq == Seq("url", "content"))
    assert(df.count() == 5)
    assert(df.filter(col("content").contains("<td>w3</td>")).count() == 1)
  }

  test("column pruning reaches the transport: url-only scans fetch nothing") {
    val urls = writePages(6)
    def read() = spark.read.format("graft-web")
      .option("urls", urls.mkString(","))
      .option("fetcher", classOf[CountingFetcher].getName).load()
    CountingFetcher.reset()
    assert(read().select(col("url")).collect().length == 6)
    assert(CountingFetcher.fetches.get() == 0,
      "pruned scan still fetched pages")
    CountingFetcher.reset()
    assert(read().select(col("content")).collect().length == 6)
    assert(CountingFetcher.fetches.get() == 6)
  }

  test("urls are partition-planned in batches") {
    val urls = writePages(20)
    val df = spark.read.format("graft-web")
      .option("urls", urls.mkString(","))
      .option("batchSize", "8").load()
    assert(df.rdd.getNumPartitions == 3) // ceil(20 / 8)
  }

  test("url filters prune at planning time: unmatched pages never fetch") {
    val urls = writePages(10)
    CountingFetcher.reset()
    val df = spark.read.format("graft-web")
      .option("urls", urls.mkString(","))
      .option("fetcher", classOf[CountingFetcher].getName).load()
      .filter(col("url").endsWith("p7.html"))
    val rows = df.collect()
    assert(rows.length == 1)
    assert(CountingFetcher.fetches.get() == 1,
      s"filtered scan fetched ${CountingFetcher.fetches.get()} pages, expected 1")
    // and the pruned url list shrinks the partition plan itself
    assert(df.rdd.getNumPartitions == 1)
  }

  test("micro-batch stream fetches only newly appended manifest urls") {
    val urls = writePages(5)
    val manifest = Paths.get("target/fixtures_websource/manifest.txt")
    Files.writeString(manifest, urls.take(3).mkString("\n") + "\n")
    CountingFetcher.reset()
    val ckpt = Files.createTempDirectory(Paths.get("target"), "web_ckpt")
    val stream = spark.readStream.format("graft-web")
      .option("manifest", manifest.toAbsolutePath.toString)
      .option("fetcher", classOf[CountingFetcher].getName).load()
    val q = stream.writeStream.format("memory").queryName("web_stream")
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("web_stream").count() == 3)
      // the watch loop: appended manifest lines become the next batch.
      // Replace ATOMICALLY — a plain writeString truncates first, and
      // a latestOffset() poll landing in that window would see the
      // manifest SHRINK (the flake a loaded box exposed).
      val tmp = manifest.resolveSibling("manifest.txt.tmp")
      Files.writeString(tmp, urls.mkString("\n") + "\n")
      Files.move(tmp, manifest,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      q.processAllAvailable()
      assert(spark.table("web_stream").count() == 5)
      assert(CountingFetcher.fetches.get() == 5,
        s"expected 5 single fetches, saw ${CountingFetcher.fetches.get()}")
    } finally q.stop()
  }

  test("i03 parse recovers words and lengths from the fixture site") {
    val rows = ingest.WebScrapePack.webScrape(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(2).length == r.getLong(3)))
    val perFile = rows.groupBy(_.getString(0))
    assert(perFile.size == 20)
    assert(perFile.values.forall(_.length == 5))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Ingest
import graft.metrics.Evaluation
import graft.normalize.{JsonRepair, Normalize}
import graft.sample.Sampling
import graft.vector.VectorOps

/** Direct specs for helpers not pinned by an oracle query. */
class HelperSpec extends AnyFunSuite {
  import SparkTestSession._

  private def one(c: org.apache.spark.sql.Column, input: String): Any = {
    import spark.implicits._
    Seq(Option(input)).toDF("s").select(c.as("r")).collect()(0).get(0)
  }

  test("repairCommon fixes trailing commas and single quotes") {
    val f = (s: String) => one(
      get_json_object(JsonRepair.repairCommon(col("s")), "$.a"), s)
    assert(f("""{"a": "1",}""") == "1")
    assert(f("{'a': '2'}") == "2")
    assert(f("""{"a": "it's fine"}""") == "it's fine")
  }

  test("safeParseList parses, repairs, or wraps") {
    val f = (s: String) => one(JsonRepair.safeParseList(col("s"), StringType), s)
    assert(f("""["a", "b"]""") == Seq("a", "b"))
    assert(f("""["a", "b"""") == Seq("a", "b")) // missing ] repaired
    assert(f("plain") == Seq("plain"))          // wrapped as singleton
  }

  test("matchRate computes percentage") {
    import spark.implicits._
    val df = Seq(true, true, false, true).toDF("m")
    val r = Evaluation.matchRate(df, col("m")).collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 4 && r.getDouble(2) == 75.0)
  }

  test("conformTo renames, reorders and null-fills to the target schema") {
    import spark.implicits._
    val df = Seq(("x", 1)).toDF("document_name", "n")
    val out = Ingest.conformTo(df, Map("document_name" -> "label"),
      Seq("label", "missing_col"))
    assert(out.columns.toSeq == Seq("label", "missing_col"))
    val row = out.collect()(0)
    assert(row.getString(0) == "x" && row.isNullAt(1))
  }

  test("normalizeColumnNames lowercases and trims") {
    import spark.implicits._
    val df = Seq((1, 2)).toDF(" Field ", "VALUE")
    assert(Ingest.normalizeColumnNames(df).columns.toSeq == Seq("field", "value"))
  }

  test("cosineFromIpDistance and formatMoney behave per reference") {
    import spark.implicits._
    val r = Seq((0.25, -1234.5)).toDF("d", "v")
      .select(VectorOps.cosineFromIpDistance(col("d")),
        VectorOps.rescale01(lit(0.5)),
        Normalize.formatMoney(col("v")))
      .collect()(0)
    assert(r.getDouble(0) == 0.75 && r.getDouble(1) == 0.75)
    assert(r.getString(2) == "-$1,234.50")
  }

  test("fixedSample is deterministic and bounded") {
    val d = graft.core.Tables(spark, sf).documents
    val a = Sampling.fixedSample(d, 25, col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    val b = Sampling.fixedSample(d.repartition(5), 25, col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(a.length == 25 && a == b)
  }

  test("keepLines duplicates short docs like the reference") {
    val f = (s: String) => one(graft.text.TextOps.keepLines(col("s"), 2), s)
    assert(f("a\nb\nc\nd\ne") == "a\nb\nd\ne")
    assert(f("only") == "only\nonly")
  }

  test("dsir selects the raw docs that match the target domain") {
    import spark.implicits._
    // target vocabulary A; raw pool = 10 domain-matching docs + 40
    // off-domain docs. The importance-weight gap (~22 nats) dwarfs the
    // Gumbel perturbation's full range (~[-2.5, 11.8] over 16-bit
    // uniforms), so the selection must be exactly the matching docs.
    val docs = (
      (0 until 5).map(i => (i.toLong, "alpha beta gamma delta alpha beta", "tgt")) ++
      (0 until 10).map(i => ((100 + i).toLong, "alpha beta gamma delta beta gamma", "raw")) ++
      (0 until 40).map(i => ((200 + i).toLong, "omega psi chi phi omega psi", "raw"))
    ).toDF("doc_id", "text", "source")
    val sel = graft.sample.Dsir.importanceResample(spark, docs, "tgt", k = 10)
      .collect()
    assert(sel.map(_.getLong(0)).toSet == (100L until 110L).toSet)
    // ranks are 1..k and scores non-increasing
    assert(sel.map(_.getLong(1)).sorted.toSeq == (1L to 10L))
    val byRank = sel.sortBy(_.getLong(1)).map(_.getDouble(4))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
  }

  test("readPages keeps PE_num = physical line order on a file large " +
      "enough to split") {
    // the r9 verdict hole: a CSV bigger than maxPartitionBytes split
    // into size-packed partitions and silently scrambled PE_num; the
    // multiLine (non-splittable) read must hold line order at any size
    val root = java.nio.file.Files.createTempDirectory("graft_bigcsv").toString
    val dir = java.nio.file.Paths.get(root, "EML")
    java.nio.file.Files.createDirectories(dir)
    val n = 20000
    // raw OCR-ish lines INCLUDING hostile content: an unbalanced
    // leading double-quote (under default CSV quoting + multiLine it
    // would swallow every following line into one record) and commas
    // (default delimiter would split the single text column)
    val lines = (1 to n).map {
      case i if i % 7 == 0 => s""""line_$i unbalanced"""
      case i if i % 3 == 0 => s"line_$i, with, commas"
      case i => s"line_$i"
    }
    java.nio.file.Files.write(dir.resolve("big.csv"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
    try {
      val pages = graft.ingest.Ingest.readPages(spark, root, Seq("EML"))
        .select(org.apache.spark.sql.functions.col("PE_num"),
          org.apache.spark.sql.functions.col("text"))
        .collect().map(r => r.getInt(0) -> r.getString(1))
      assert(pages.length == n)
      pages.foreach { case (pe, text) =>
        assert(text == lines(pe - 1),
          s"PE_num $pe carries '$text', expected '${lines(pe - 1)}'")
      }
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("transient cache tracker: sweep releases, bound evicts oldest") {
    import org.apache.spark.storage.StorageLevel
    import spark.implicits._
    graft.core.Caches.releaseTransients() // clean slate
    val a = graft.core.Caches.transient(Seq(1, 2, 3).toDF("x"))
    a.count()
    assert(a.storageLevel != StorageLevel.NONE)
    graft.core.Caches.releaseTransients()
    assert(a.storageLevel == StorageLevel.NONE, "sweep must unpersist")
    // bound: past 64 live entries the oldest is evicted on register
    val first = graft.core.Caches.transient(Seq(0).toDF("x"))
    first.count()
    val rest = (1 to 70).map(i => graft.core.Caches.transient(Seq(i).toDF("x")))
    assert(first.storageLevel == StorageLevel.NONE,
      "oldest tracked frame must be evicted past the bound")
    assert(rest.last.storageLevel != StorageLevel.NONE)
    graft.core.Caches.releaseTransients()
  }

  test("small CPU-dense tables spread scan work across all cores") {
    val tb = graft.core.Tables(spark, SparkTestSession.sf)
    val cores = spark.sparkContext.defaultParallelism
    // single-row-group test parquet reads as one task raw...
    assert(tb.documents.rdd.getNumPartitions < cores)
    // ...and the opt-in spread reaches the session's full parallelism
    assert(tb.documentsSpread.rdd.getNumPartitions == cores)
    assert(tb.embeddingsSpread.rdd.getNumPartitions == cores)
    // the spread moves rows, never changes them
    val raw = tb.documents.select("doc_id").collect().map(_.getLong(0)).sorted
    val spread = tb.documentsSpread.select("doc_id").collect()
      .map(_.getLong(0)).sorted
    assert(raw.sameElements(spread))
  }

  test("histogram quantile sketch: nulls excluded, estimates within one " +
      "bin width of the target-rank value") {
    import spark.implicits._
    val withNulls = ((1 to 100).map(i => Option(i.toDouble)) ++
      Seq.fill(50)(Option.empty[Double])).toDF("x")
    val est = graft.core.Sketches.histogramQuantilesWithWidth(
        withNulls, col("x"), bins = 10, probs = Seq(0.25, 0.5, 0.9))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
      .toSeq
    assert(est.map(_._1) == Seq(0.25, 0.5, 0.9))
    // bin width from the NON-NULL range (100 − 1)/10 — nulls must not
    // reach the bounds scan or the rank targets
    assert(math.abs(est.head._3 - 9.9) < 1e-9)
    est.foreach { case (q, e, w) =>
      val exact = math.ceil(q * 100)
      assert(math.abs(e - exact) <= w + 1e-9,
        s"q=$q est=$e rank value=$exact width=$w")
    }
    // the 50 nulls change nothing: identical estimates to a clean frame
    val clean = (1 to 100).map(_.toDouble).toDF("x")
    val est2 = graft.core.Sketches.histogramQuantilesWithWidth(
        clean, col("x"), bins = 10, probs = Seq(0.25, 0.5, 0.9))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
      .toSeq
    assert(est == est2)
  }

  test("spread never fires on unknown paths or big tables") {
    assert(graft.core.Tables.bytesOf(spark, "/no/such/table.parquet")
      == Long.MaxValue)
    val known = graft.core.Tables.bytesOf(
      spark, s"${SparkTestSession.sf}/documents.parquet")
    assert(known > 0 && known < graft.core.Tables.SpreadMaxBytes)
  }
}

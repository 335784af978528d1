package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.UnicodeClean

/** Specs for the round-9 additions n18 (unicode cleanup kernel),
  * t13 (packing-efficiency report), and m12 (Poisson-bootstrap CI). */
class CleanPackingBootstrapSpec extends AnyFunSuite {
  import SparkTestSession._

  private def clean1(s: String): String = {
    import spark.implicits._
    Seq(Option(s)).toDF("s")
      .select(UnicodeClean.unicodeClean(col("s")).as("r"))
      .collect()(0).getString(0)
  }

  test("UnicodeClean golden vectors: accents, NBSP, controls, whitespace") {
    assert(clean1(normalize.NormalizePack.unicodePlant + "hello world") ==
      "Unicode cafe (e) test hello world")
    assert(clean1("café") == "cafe")            // precomposed
    assert(clean1("cafe\u0301") == "cafe")       // combining sequence
    assert(clean1("a\u00A0b") == "a b")          // NBSP
    assert(clean1("a\u0007b\u0000c") == "abc")  // controls dropped
    assert(clean1("  a \t b  ") == "a b")            // collapse + trim
    assert(clean1("a \n b") == "a \n b")             // newlines survive
    assert(clean1("\t \t") == "")                    // all-whitespace
    assert(clean1("plain ascii stays") == "plain ascii stays")
  }

  test("UnicodeClean matches an independent regex reference on fuzz") {
    import java.text.Normalizer
    def reference(s: String): String = {
      val nfd = Normalizer.normalize(
        Normalizer.normalize(s, Normalizer.Form.NFC), Normalizer.Form.NFD)
      val stripped = nfd.replaceAll("[\\p{Mn}\\p{Mc}\\p{Me}]", "")
      Normalizer.normalize(stripped, Normalizer.Form.NFC)
        .replaceAll("[\\u00A0\\u2007\\u202F]", " ")
        .replaceAll("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
        .replaceAll("[ \\t]+", " ")
        // \A/\z: absolute ends — a bare $ would also match BEFORE a
        // trailing newline and eat a space the kernel (and DuckDB's
        // trim, which the oracle uses) correctly keeps
        .replaceAll("\\A | \\z", "")
    }
    val rnd = new scala.util.Random(42)
    val alphabet = "ab \t\u00A0\u0301\u00E9\u00DC\n()x\u0007."
    val vectors = (1 to 200).map { _ =>
      (1 to rnd.nextInt(30))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    } ++ Seq("", " ", "\u0301", "\u00A0\u0007")
    vectors.foreach { v =>
      assert(clean1(v) == reference(v),
        s"mismatch on codepoints ${v.map(_.toInt).mkString(",")}")
    }
  }

  test("UnicodeClean is idempotent and null-safe") {
    import spark.implicits._
    val r = Seq(Option.empty[String]).toDF("s")
      .select(UnicodeClean.unicodeClean(col("s")).as("r")).collect()(0)
    assert(r.isNullAt(0))
    val v = normalize.NormalizePack.unicodePlant + "x y"
    assert(clean1(clean1(v)) == clean1(v))
  }

  test("t13 packing efficiency: internal identities and padded contrast") {
    val sf = SparkTestSession.sf
    val rows = text.TextPack.packingEfficiency(spark, sf).collect()
    assert(rows.length == 2)
    val byLayout = rows.map(r => r.getString(0) -> r).toMap
    val Seq(c, p) = Seq("concat", "padded").map(byLayout(_))
    // shared totals
    assert(c.getLong(1) == p.getLong(1) && c.getLong(2) == p.getLong(2))
    for (r <- rows) {
      val (nSeq, cap, waste, fill) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))
      assert(cap == nSeq * text.TextPack.SeqLen)
      assert(waste == cap - r.getLong(2))
      assert(fill > 0.0 && fill <= 1.0)
    }
    // concat packs at least as tightly as padded, splits at least as many
    assert(c.getLong(3) <= p.getLong(3))
    assert(c.getLong(5) <= p.getLong(5))
    assert(c.getLong(7) >= p.getLong(7))
    // padded docs_split agrees with a direct count
    val direct = graft.core.Tables(spark, sf).documents
      .filter(text.TextOps.wordLen(col("text")) > text.TextPack.SeqLen)
      .count()
    assert(p.getLong(7) == direct)
  }

  test("m13 paired compare: partition identity, accuracy tie-out, ranges") {
    val sf = SparkTestSession.sf
    val r = metrics.MetricsPack.pairedCompare(spark, sf).collect()(0)
    val (n, n00, n01, n10, n11) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n00 + n01 + n10 + n11 == n)
    val (accA, accB, chi2, kappa) =
      (r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8))
    // acc_top1 ties out against the m01 confusion matrix diagonal
    val conf = metrics.MetricsPack.confusion(spark, sf).collect()
    val diag = conf.filter(x => x.getString(0) == x.getString(1)).map(_.getLong(2)).sum
    val tot = conf.map(_.getLong(2)).sum
    assert(math.abs(accA - diag.toDouble / tot) < 1e-6)
    assert(accB >= 0.0 && accB <= 1.0)
    assert(chi2 >= 0.0)
    assert(kappa >= -1.0 && kappa <= 1.0)
    // the two classifiers share rank-1 picks on agreeing neighbors, so
    // they agree far above chance on this head
    assert(kappa > 0.5, s"kappa $kappa implausibly low for vote-vs-top1")
  }

  test("r19 cube: full grid, grand total, and marginal consistency") {
    val sf = SparkTestSession.sf
    val rows = relational.RelationalPack.cubeOrders(spark, sf).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getLong(3),
        x.getDouble(4)))
    val statuses = rows.filter(r => r._3 == 0).map(_._1).distinct
    val prios = rows.filter(r => r._3 == 0).map(_._2).distinct
    assert(rows.length == (statuses.length + 1) * (prios.length + 1))
    val grand = rows.filter(_._3 == 3)
    assert(grand.length == 1 && grand.head._1 == "All" && grand.head._2 == "All")
    assert(grand.head._4 == rows.filter(_._3 == 0).map(_._4).sum)
    // gid 1 (priority rolled away) marginals sum the matching gid-0 cells
    rows.filter(_._3 == 1).foreach { case (st, _, _, cnt, sum) =>
      val cells = rows.filter(r => r._3 == 0 && r._1 == st)
      assert(cnt == cells.map(_._4).sum, s"count marginal $st")
      assert(math.abs(sum - cells.map(_._5).sum) < 1e-6, s"sum marginal $st")
    }
  }

  test("a22 source dedup rate: plant math and mirror-source sharing") {
    val sf = SparkTestSession.sf
    val rows = text.AnalysisPack.sourceDedupRate(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    val byS = rows.map(r => r._1 -> r).toMap
    // the mirror source: 30 planted copies, zero within-source dups,
    // every digest shared with an original source
    val m = byS("mirror")
    assert(m._2 == 30 && m._3 == 30 && m._4 == 0 && m._6 == 30)
    // every original source: dup_docs = docs duplicated by the id<60
    // plant; shared = docs mirrored by the id<30 plant
    val docs = graft.core.Tables(spark, sf).documents
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    for ((src, r) <- byS if src != "mirror") {
      val ids = docs.filter(_._2 == src).map(_._1)
      assert(r._2 == ids.length + ids.count(_ < 60), s"$src n_docs")
      assert(r._3 == ids.length, s"$src n_distinct")
      assert(r._4 == ids.count(_ < 60), s"$src dup_docs")
      assert(r._6 == ids.count(_ < 30), s"$src shared")
    }
  }

  test("l12 token F1: bounded, Overall consistent, dominates exact match") {
    val sf = SparkTestSession.sf
    val rows = llm.LlmPack.tokenF1(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val byF = rows.map(r => r._1 -> r).toMap
    assert(rows.forall(r => r._3 >= 0.0 && r._3 <= 1.0))
    // Overall is the support-weighted mean of the field rows
    val fields = rows.filter(_._1 != "Overall")
    val weighted = fields.map(r => r._2 * r._3).sum / fields.map(_._2).sum
    assert(math.abs(byF("Overall")._3 - weighted) < 1e-5)
    // token F1 gives partial credit, so each field's mean F1 is at
    // least its exact-match accuracy (EM rows score F1 = 1)
    val acc = llm.LlmPack.extractAccuracy(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    fields.foreach { case (f, _, v) =>
      assert(v >= acc(f) - 1e-9, s"$f F1 $v below EM ${acc(f)}")
    }
  }

  test("m12 bootstrap CI: deterministic, ordered, and plausible") {
    val sf = SparkTestSession.sf
    val r1 = metrics.MetricsPack.bootstrapCi(spark, sf).collect()(0)
    val r2 = metrics.MetricsPack.bootstrapCi(spark, sf).collect()(0)
    assert(r1 == r2)
    val (n, nBoot) = (r1.getLong(0), r1.getLong(1))
    val (pa, mean, std, lo, hi) = (r1.getDouble(2), r1.getDouble(3),
      r1.getDouble(4), r1.getDouble(5), r1.getDouble(6))
    assert(nBoot == metrics.MetricsPack.BootReplicates)
    assert(n > 0 && pa >= 0.0 && pa <= 1.0)
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] should straddle $mean")
    assert(std > 0.0 && std < 0.5)
    assert(math.abs(mean - pa) < 4 * std,
      s"bootstrap mean $mean implausibly far from point $pa at std $std")
  }
}

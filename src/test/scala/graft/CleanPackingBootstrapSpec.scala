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

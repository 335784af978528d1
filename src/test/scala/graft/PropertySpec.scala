package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.normalize.Normalize
import graft.text.TextOps

/** ScalaCheck-generated properties for the normalizer/chunker core
  * (SURVEY.md §5): money idempotence + sign rules, date
  * keep-original, chunker coverage/count formula. Samples come from
  * scalacheck Gens; evaluation batches through the engine (one
  * DataFrame per property — not per-sample Spark jobs). */
class PropertySpec extends AnyFunSuite {
  import SparkTestSession._

  private def runMoney(inputs: Seq[String]): Seq[(String, String)] = {
    import spark.implicits._
    inputs.toDF("s")
      .select(col("s"), Normalize.moneyOrNull(col("s")).as("m"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
  }

  test("money normalization is idempotent on its own output") {
    val gen = Gen.chooseNum(0L, 99999999L)
    val cents = Gen.listOfN(300, gen).sample.get
    val inputs = cents.zipWithIndex.map { case (c, i) =>
      val base = f"${c / 100}%d.${c % 100}%02d"
      i % 4 match {
        case 0 => base
        case 1 => s"($$$base)"
        case 2 => s"$base-"
        case _ => s"-$$$base"
      }
    }
    val once = runMoney(inputs).map(_._2)
    val twice = runMoney(once).map(_._2)
    // a second pass may only flip parser-introduced negatives; the
    // MAGNITUDE and format must be stable
    once.zip(twice).foreach { case (a, b) =>
      assert(b == a || b == a.stripPrefix("-"),
        s"not stable: $a -> $b")
    }
    // and positive outputs are strictly idempotent
    once.filter(v => v != null && !v.startsWith("-")).zip(
      runMoney(once.filter(v => v != null && !v.startsWith("-"))).map(_._2))
      .foreach { case (a, b) => assert(a == b) }
  }

  test("native text kernels equal their regex/declarative twins under fuzz") {
    import spark.implicits._
    import graft.plans.{CharClassCount, ProfileHits, WordTokenCount}
    import graft.text.TextAnalysis
    // strings over a whitespace-rich alphabet incl. multi-byte
    // codepoints — the shapes where byte-scan vs regex could diverge
    val ch = Gen.frequency(
      6 -> Gen.alphaNumChar, 3 -> Gen.oneOf(' ', '\t', '\n', '\f',
        '\r', ''), 2 -> Gen.oneOf('.', ',', '!', '?', '-', '_'),
      1 -> Gen.oneOf('é', 'ß', '中', '界', 'π'))
    val gen = Gen.listOfN(400,
      Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, ch).map(_.mkString)))
    val texts = gen.sample.get :+ "the join spark" :+ "" :+ "  \t "
    val profile = Seq("the", "join", "spark", "a", "of")
    val bad = texts.toDF("t").select(
        CharClassCount.alpha(col("t")).as("na"),
        TextAnalysis.alphaCharsRegex(col("t")).cast("long").as("ta"),
        CharClassCount.digit(col("t")).as("nd"),
        TextAnalysis.digitCharsRegex(col("t")).cast("long").as("td"),
        CharClassCount.punct(col("t")).as("np"),
        TextAnalysis.punctCharsRegex(col("t")).cast("long").as("tp"),
        ProfileHits.count(col("t"), profile).as("nh"),
        TextAnalysis.profileScore(TextOps.words(col("t")), profile)
          .cast("long").as("th"),
        WordTokenCount.count(col("t")).as("nw"),
        size(TextOps.words(col("t"))).cast("long").as("tw"))
      .filter(!(col("na") <=> col("ta")) || !(col("nd") <=> col("td")) ||
        !(col("np") <=> col("tp")) || !(col("nh") <=> col("th")) ||
        !(col("nw") <=> col("tw")))
    assert(bad.count() == 0)
  }

  test("money sign rules: any negative notation yields a leading minus") {
    val notations = Seq("(7.25)", "($7.25)", "7.25-", "-7.25", "-$7.25")
    runMoney(notations).foreach { case (in, out) =>
      assert(out == "-$7.25", s"$in -> $out")
    }
  }

  test("chunk count follows ceil((n - overlap) / (size - overlap))") {
    import spark.implicits._
    val cases = Gen.listOfN(200,
      Gen.zip(Gen.chooseNum(1, 500), Gen.chooseNum(2, 60), Gen.chooseNum(0, 30)))
      .sample.get
      .map { case (n, size, ov) => (n, size, math.min(ov, size - 1)) }
    val df = cases.zipWithIndex.map { case ((n, size, ov), i) =>
      (i, (1 to n).map(w => s"w$w").mkString(" "), n, size, ov)
    }.toDF("id", "text", "n", "size", "ov")
    cases.zipWithIndex.foreach { case ((n, size, ov), i) =>
      val step = size - ov
      val expected = (n + step - 1) / step // = count of starts 0,step.. < n
      val got = df.filter(col("id") === i)
        .select(size2(TextOps.chunkTexts(col("text"), size, ov)))
        .collect()(0).getInt(0)
      assert(got == expected, s"n=$n size=$size ov=$ov: $got != $expected")
    }
  }

  private def size2(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c)

  test("chunker covers every word and respects overlap") {
    import spark.implicits._
    val words = (1 to 137).map(i => s"w$i")
    val chunks = Seq(words.mkString(" ")).toDF("text")
      .select(TextOps.chunkTexts(col("text"), 30, 7).as("c"))
      .collect()(0).getSeq[String](0)
    val covered = chunks.flatMap(_.split(" ")).toSet
    assert(covered == words.toSet)
    chunks.sliding(2).foreach {
      case Seq(a, b) =>
        val aw = a.split(" ")
        // consecutive chunks share exactly `overlap` words unless the
        // successor is the tail remainder
        if (aw.length == 30) {
          assert(aw.takeRight(7).toSeq == b.split(" ").take(7).toSeq)
        }
      case _ => ()
    }
  }

  test("dateSane never alters a value it keeps") {
    import spark.implicits._
    val vs = Seq("09/01/2025", "9/1/2025", "Sep 1, 2025", "2025-09-01",
      "garbage", "13/13/2013")
    vs.toDF("s")
      .select(col("s"), Normalize.dateSane(col("s")).as("d"))
      .collect().foreach { r =>
        val (in, out) = (r.getString(0), r.getString(1))
        assert(out == null || out == in.trim)
      }
  }

  test("cleanse is idempotent") {
    import spark.implicits._
    val vs = Gen.listOfN(100, Gen.asciiPrintableStr).sample.get
    val once = vs.toDF("s").select(Normalize.cleanse(col("s")))
      .collect().map(_.getString(0)).toSeq
    val twice = once.toDF("s").select(Normalize.cleanse(col("s")))
      .collect().map(_.getString(0)).toSeq
    assert(once == twice)
  }

  test("TopK bounded selection equals full sort-take under fuzz") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 200) {
      val k = 1 + rnd.nextInt(5)
      val n = rnd.nextInt(40)
      // duplicate sims on purpose: tie-breaking is the hard part
      val cands = Seq.fill(n)((rnd.nextInt(20).toLong, rnd.nextInt(6).toDouble))
      val top = new graft.vector.KnnJoin.TopK(k)
      cands.foreach { case (id, s) => top.offer(id, s) }
      val got = (0 until top.size).map(r => (top.ids(r), top.sims(r)))
      val want = cands.sortBy { case (id, s) => (-s, id) }.take(k)
      assert(got == want, s"trial $trial k=$k cands=$cands")
    }
  }

  test("xlsx round-trips arbitrary cell text under fuzz") {
    import spark.implicits._
    val gen = Gen.listOfN(120, Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOfN(8, Gen.oneOf('<', '>', '&', '"', '\'', 'π', '漢', '\t',
        'a', '0')).map(_.mkString),
      Gen.const("")))
    val cells = gen.sample.get.zipWithIndex
      .map { case (s, i) => (f"k$i%03d", s) }
    val df = cells.toDF("k", "v")
    val path = "target/fixtures_xlsx_spec/fuzz.xlsx"
    graft.sources.Xlsx.write(df, path)
    val back = graft.sources.Xlsx.read(spark, path)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    cells.foreach { case (k, v) =>
      // XML strips nothing we wrote: empty strings come back empty,
      // specials and non-ASCII round-trip exactly
      assert(Option(back(k)).getOrElse("") == v, s"key $k")
    }
  }

  test("SRP banded near-dup pairs equal brute force under fuzz") {
    import spark.implicits._
    // random unit-ish vectors + planted near-copies: banded LSH +
    // rerank must recover exactly the brute-force threshold pairs
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val dim = 16 + trial * 8
      val base = Seq.tabulate(60) { i =>
        val v = Array.fill(dim)(rnd.nextGaussian())
        val n = math.sqrt(v.map(x => x * x).sum)
        (i.toLong, v.map(_ / n))
      }
      val planted = base.take(15).map { case (id, v) =>
        val w = v.clone(); w(0) += 0.15
        (id + 1000L, w)
      }
      val df = (base ++ planted).toDF("vec_id", "embedding")
      def pairs(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val banded = pairs(graft.vector.KnnJoin
        .cosinePairsAboveBanded(spark, df, 0.95))
      val brute = pairs(graft.vector.KnnJoin
        .cosinePairsAbove(spark, df, 0.95))
      assert(banded == brute, s"trial $trial dim=$dim")
      assert(brute.size >= 15, s"trial $trial planted pairs missing from brute force")
    }
  }

  test("as-of join equals the brute-force definition under fuzz") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val leftRows = Seq.tabulate(300)(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, i.toLong))
    val rightRows = Seq.tabulate(300)(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, (1000 + i).toLong))
    val left = leftRows.toDF("user_id", "tsu", "click_id")
    val right = rightRows.toDF("user_id", "tsu", "view_id")
    val got = graft.relational.AsOfJoin
      .backward(left, right, Seq("user_id"), "tsu", "view_id")
      .collect()
      .map(r => r.getLong(2) -> (if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    val want = leftRows.map { case (u, ts, cid) =>
      val matches = rightRows.filter { case (ru, rts, _) => ru == u && rts <= ts }
      cid -> (if (matches.isEmpty) -1L
              else matches.maxBy { case (_, rts, rid) => (rts, rid) }._3)
    }.toMap
    assert(got == want)
  }

  test("staged json repair never throws and always yields a braced doc") {
    import spark.implicits._
    import graft.normalize.JsonRepair
    // NOTE deliberately NOT an idempotence property: the chain is
    // single-pass BY DESIGN (mirroring the reference's one-shot
    // repairs) — quote normalization can expose a fresh trailing-comma
    // pattern (fuzz found `[','] → [,"] → second pass []`), and the
    // regexes are context-free so they also fire inside string values.
    // The oracle replays the same single pass; the contract here is
    // totality + the brace invariant, not a fixpoint.
    val ch = Gen.frequency(
      5 -> Gen.oneOf('{', '}', '[', ']', ':', ',', '\'', '"'),
      4 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '\n', '\t', '`'),
      1 -> Gen.oneOf('é', '中', '\\'))
    val inputs = Gen.listOfN(300,
      Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, ch).map(_.mkString)))
      .sample.get
    val once = inputs.toDF("s")
      .select(col("s"), JsonRepair.repairCommon(col("s")).as("r"),
        JsonRepair.isValidJson(JsonRepair.repairCommon(col("s"))).as("v"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(once.length == inputs.length)
    once.foreach { case (_, r, _) =>
      assert(r.startsWith("{") && r.endsWith("}"), s"unbraced repair: '$r'")
    }
    // validity gate is total too: every row produced a boolean verdict
    assert(once.forall(r => r._3 == true || r._3 == false))
  }

  test("safe_parse_list: non-null, element-count sanity under fuzz") {
    import spark.implicits._
    import graft.normalize.JsonRepair
    import org.apache.spark.sql.types.StringType
    val ch = Gen.frequency(
      4 -> Gen.oneOf('[', ']', ',', '\'', '"'), 5 -> Gen.alphaNumChar,
      1 -> Gen.oneOf(' ', '.', '-'))
    val inputs = Gen.listOfN(300,
      Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, ch).map(_.mkString)))
      .sample.get
    val rows = inputs.toDF("s")
      .select(col("s"), JsonRepair.safeParseList(col("s"), StringType).as("p"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    rows.foreach { case (s, p) =>
      assert(p != null, s"null parse for '$s' (contract: singleton fallback)")
      // a string with no '[' can never parse as a JSON array (even with
      // the ']' retry), so the singleton fallback must return it verbatim
      if (!s.contains("["))
        assert(p == Seq(s), s"expected singleton for '$s', got $p")
    }
  }

  test("hashing embedder: norm is 0 or 1, tokenization invariants") {
    import graft.llm.EmbedStage
    val e = new EmbedStage.HashingEmbedder()
    // no 'ß': Java upper-cases it to "SS", which genuinely changes the
    // ASCII token stream — that is locale semantics, not an embedder bug
    val ch = Gen.frequency(6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', ',', '.', '!', '\n'), 1 -> Gen.oneOf('中', 'é'))
    val texts = Gen.listOfN(200,
      Gen.chooseNum(0, 80).flatMap(n => Gen.listOfN(n, ch).map(_.mkString)))
      .sample.get
    texts.foreach { t =>
      val v = e.embed(t)
      val norm = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(norm) < 1e-12 || math.abs(norm - 1.0) < 1e-12,
        s"norm $norm for '$t'")
      // commas and spaces are both delimiters: interchangeable
      assert(v.sameElements(e.embed(t.replace(',', ' '))),
        s"comma and space must tokenize identically for '$t'")
      // ASCII case folds into the same tokens
      assert(e.embed(t.toUpperCase).sameElements(v),
        s"case-insensitive tokenization violated for '$t'")
    }
  }
}

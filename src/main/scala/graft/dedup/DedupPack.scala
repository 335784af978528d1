package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.core.Tables
import graft.vector.VectorOps

/** Oracle-checked dedup queries over `documents` with PLANTED
  * duplicates: the synthetic corpus is word-soup with no natural
  * dups, so each query augments it identically on both engines —
  * exact copies at doc_id+200000 (doc_id<50) and near-copies with the
  * first word dropped at doc_id+100000 (doc_id<100). The operators
  * then have real work to find.
  */
object DedupPack extends QueryPack {

  /** documents ∪ planted near-dups ∪ planted exact dups.
    *
    * With `spread` (the default) the UNIONED output is round-robined
    * across the session's cores once: most consumers' next stage is a
    * per-row shingle/hash pass (minhash, simhash, word n-grams),
    * which on the single-row-group test parquet would otherwise run
    * as one task — at 10× sf0.1 the dedup-group build alone burned
    * 113 s on one core while 31 sat idle. One exchange after the
    * union, not one per branch: spreading the source scan instead
    * paid three exchanges for the same parallelism. Shuffle-light
    * consumers whose per-row work is a single md5 (d15's offset
    * election, d16's digest screen) pass `spread = false` — for them
    * the exchange costs more than the one-task scan (measured: d15
    * 4.4 → 3.1 s, d16 1.3 → 0.9 s at sf0.1). */
  def augmented(spark: SparkSession, dir: String,
                spread: Boolean = true): DataFrame = {
    val t = Tables(spark, dir)
    val d = t.documents.select(col("doc_id"), col("text"))
    val near = d.filter(col("doc_id") < 100)
      .select((col("doc_id") + 100000).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s*", "").as("text"))
    val exact = d.filter(col("doc_id") < 50)
      .select((col("doc_id") + 200000).as("doc_id"), col("text"))
    val u = d.unionByName(near).unionByName(exact)
    if (spread)
      graft.core.Tables.spreadIfSmall(spark, u, s"$dir/documents.parquet")
    else u
  }

  private[graft] val augmentedSql = """
    |aug AS (
    |  SELECT doc_id, text FROM documents
    |  UNION ALL SELECT doc_id + 100000, regexp_replace(text, '^\S+\s*', '')
    |    FROM documents WHERE doc_id < 100
    |  UNION ALL SELECT doc_id + 200000, text FROM documents WHERE doc_id < 50)""".stripMargin

  /** Exact dedup: duplicate content groups (digest, keeper, count). */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(augmented(spark, dir), col("doc_id"), col("text"))
      .filter(col("n_copies") > 1)
      .orderBy(col("content_hash"))

  /** d16: INCREMENTAL dedup — the daily-ingest shape d01 doesn't
    * cover: a new batch (the planted ids ≥ 100000) dedups against the
    * HISTORICAL corpus digest set (base ids) plus itself, without
    * ever rescanning history text. Per batch doc: 'dup_of_history'
    * (digest already in the historical set), 'dup_in_batch' (an
    * earlier batch doc-id owns the digest), or 'new'. The history
    * side carries ONE md5 per historical doc — at 100 TB that digest
    * relation joins by hash (or pre-screens through the d13 Bloom
    * relation when even digests shouldn't shuffle); the batch side is
    * a day's ingest, not the corpus. */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val aug = augmented(spark, dir, spread = false)
    val hist = aug.filter(col("doc_id") < 100000)
      .select(md5(col("text")).as("h")).distinct()
      .withColumn("in_hist", lit(true))
    val batch = aug.filter(col("doc_id") >= 100000)
      .select(col("doc_id"), md5(col("text")).as("h"))
    val firstInBatch = batch.groupBy(col("h"))
      .agg(min(col("doc_id")).as("first_id"))
    batch.join(hist, Seq("h"), "left")
      .join(firstInBatch, Seq("h"))
      .select(col("doc_id"), col("h").as("content_hash"),
        when(coalesce(col("in_hist"), lit(false)), "dup_of_history")
          .when(col("doc_id") =!= col("first_id"), "dup_in_batch")
          .otherwise("new").as("status"))
      .orderBy(col("doc_id"))
  }

  /** d19: incremental MinHash-LSH dedup — the FUZZY twin of d16's
    * exact digest screen, completing the continuous-ingest story: a
    * near-copy with one word changed sails through d16 (different
    * md5) but must not re-enter the corpus. The historical corpus
    * keeps its per-band minhash signature table (in production a
    * PERSISTED relation, built in the one pass that indexed history —
    * never rescanned per batch); the arriving batch (ids ≥ 100000)
    * computes signatures for its own docs only, candidates come from
    * the band equi-join batch→history, and exact hashed-shingle
    * Jaccard verifies CANDIDATES only — LSH screens, exact verifies,
    * the standard two-phase composition (d03's banding + d02's
    * verify, cross-relation). Per batch doc: candidate count, best
    * history match (max Jaccard, tie → min hist_id; −1 when none),
    * and the verdict at d02's 0.5 threshold.
    *
    * Scale shape: history-side cost amortizes across batches via the
    * persisted signature table; per-batch cost is the batch's own
    * signature pass plus a join keyed on (band, bandsig) whose
    * fan-out is the candidate set, and the verify join carries only
    * candidate docs' shingle sets. Nothing rescans history text. */
  def incrementalMinhash(spark: SparkSession, dir: String): DataFrame = {
    val aug = augmented(spark, dir)
    incrementalMinhashOf(
      aug.filter(col("doc_id") < 100000),
      aug.filter(col("doc_id") >= 100000))
  }

  /** Per-band minhash signatures of a (doc_id, text) relation — the
    * PERSISTED-RELATION unit of the continuous-ingest story: the
    * streaming gate ([[graft.streaming.Streams.dedupIngestGate]])
    * appends each admitted batch's signatures to a parquet history
    * table and never recomputes them. */
  private[graft] def bandSigsOf(df: DataFrame, idName: String): DataFrame =
    Dedup.minhashRows(
        df.select(col("doc_id").as("id"),
          explode(Dedup.shingles(col("text"), 3)).as("sh")), 12)
      .withColumn("band", (col("seed") / 3).cast("int"))
      .groupBy(col("id"), col("band"))
      .agg(concat_ws(",",
        transform(array_sort(collect_list(struct(col("seed"), col("mh")))),
          s => s.getField("mh").cast("string"))).as("bandsig"))
      .select(col("id").as(idName), col("band"), col("bandsig"))

  /** d19 core over explicit (history, batch) relations of
    * (doc_id, text) — derives the history state in-line, then runs
    * [[incrementalMinhashAgainst]]. */
  private[graft] def incrementalMinhashOf(hist: DataFrame,
                                          batch: DataFrame): DataFrame =
    incrementalMinhashAgainst(
      bandSigsOf(hist, "hist_id"),
      Dedup.hashedShingleRows(hist, col("doc_id"), col("text"), 3),
      batch)

  /** d19 over PREBUILT history state — `histSigs` (hist_id, band,
    * bandsig) and `histShingles` (id, sh) are the persisted relations
    * a production ingest maintains; only the batch's own signatures
    * and shingles are computed here (or passed in prebuilt, when the
    * caller also needs them — the streaming gate computes ONE
    * signature pass and shares it between the screen and the
    * history append). Nothing rescans history text. */
  private[graft] def incrementalMinhashAgainst(histSigs: DataFrame,
                                               histShingles: DataFrame,
                                               batch: DataFrame,
                                               batchSigs: Option[DataFrame] = None,
                                               batchShingles: Option[DataFrame] = None)
      : DataFrame = {
    val cand = graft.core.Caches.transient(
      batchSigs.getOrElse(bandSigsOf(batch, "doc_id"))
        .join(histSigs.select(col("hist_id"), col("band"), col("bandsig")),
          Seq("band", "bandsig"))
        .select(col("doc_id"), col("hist_id")).distinct())
    val bsh = graft.core.Caches.transient(
      batchShingles.getOrElse(
        Dedup.hashedShingleRows(batch, col("doc_id"), col("text"), 3)))
    val hsh = graft.core.Caches.transient(
      histShingles.select(col("id"), col("sh")))
    val inter = cand
      .join(bsh.select(col("id").as("doc_id"), col("sh")), Seq("doc_id"))
      .join(hsh.select(col("id").as("hist_id"), col("sh")), Seq("hist_id", "sh"))
      .groupBy(col("doc_id"), col("hist_id")).agg(count(lit(1)).as("inter"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    val jc = cand
      .join(inter, Seq("doc_id", "hist_id"), "left")
      .join(bsh.groupBy(col("id")).agg(count(lit(1)).as("nb"))
        .select(col("id").as("doc_id"), col("nb")), Seq("doc_id"))
      .join(hsh.groupBy(col("id")).agg(count(lit(1)).as("nh"))
        .select(col("id").as("hist_id"), col("nh")), Seq("hist_id"))
      .select(col("doc_id"), col("hist_id"),
        (d(coalesce(col("inter"), lit(0L))) /
          d(col("nb") + col("nh") - coalesce(col("inter"), lit(0L)))).as("jac"))
    val best = jc.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("jac").desc, col("hist_id"))))
      .filter(col("rn") === 1)
    val nc = cand.groupBy(col("doc_id")).agg(count(lit(1)).as("n_candidates"))
    batch.select(col("doc_id"))
      .join(nc, Seq("doc_id"), "left")
      .join(best.select(col("doc_id"), col("hist_id"), col("jac")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("hist_id"), lit(-1L)).as("best_hist_id"),
        round(coalesce(col("jac"), lit(0.0)), 6).as("best_jaccard"),
        when(coalesce(col("jac"), lit(0.0)) >= 0.5, "near_dup_of_history")
          .otherwise("new").as("status"))
      .orderBy(col("doc_id"))
  }

  /** The composed continuous-ingest DEDUP GATE (s09's relation, the
    * per-micro-batch body of the streaming gate): d16's exact digest
    * screen first — 'dup_of_history' (digest already in the corpus),
    * 'dup_in_batch' (an earlier batch doc owns the digest) — then
    * d19's MinHash-LSH screen for the digest-new remainder —
    * 'near_dup_of_history' at d02's 0.5 Jaccard, else 'new' (admit).
    * Exact screens before fuzzy for the same reason d18 collapses
    * before mining: a byte-identical copy must never reach signature
    * computation. History arrives as its PERSISTED derived relations
    * (digest set, band signatures, hashed shingles) — per batch,
    * history text is never rescanned and history signatures never
    * recomputed. */
  private[graft] def dedupGateAgainst(histDigests: DataFrame,
                                      histSigs: DataFrame,
                                      histShingles: DataFrame,
                                      batch: DataFrame): DataFrame =
    dedupGateWithState(histDigests, histSigs, histShingles, batch)._1

  /** [[dedupGateAgainst]] plus the ADMITTED documents' derived state
    * relations — (decisions, new digests (h), new band signatures
    * (hist_id, band, bandsig), new hashed shingles (id, sh)) — so a
    * streaming caller appends history state WITHOUT a second
    * signature/shingle pass: the screen's own per-survivor relations
    * are computed once (transient-cached) and filtered to the
    * admitted ids for the append. A null text digests as the empty
    * string (null ≡ "" for dedup identity — the digest join must
    * never DROP a document the way a null join key silently would).
    * Decisions are unordered — the s09 entry point adds its own
    * orderBy; per-micro-batch consumers must not pay a global sort.
    *
    * Intra-batch near-dup scope (defined semantics, matched by the
    * s09 oracle): the MinHash screen runs against HISTORY only — two
    * non-identical near-duplicates arriving in the SAME batch both
    * admit as 'new' and both enter the history tables, so near-dup
    * leakage grows with micro-batch size (exact duplicates never
    * leak; the digest screen is within-batch). A caller needing
    * intra-batch fuzzy dedup composes the batch-side d03/d08
    * operators over the admitted set before the append — the screens
    * stay single-purpose rather than hiding a second LSH pass here. */
  private[graft] def dedupGateWithState(histDigests: DataFrame,
                                        histSigs: DataFrame,
                                        histShingles: DataFrame,
                                        batch: DataFrame)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val b = graft.core.Caches.transient(
      batch.select(col("doc_id"), col("text"),
        Dedup.contentDigest(col("text")).as("h")))
    val firstInBatch = b.groupBy(col("h"))
      .agg(min(col("doc_id")).as("first_id"))
    val hd = histDigests.select(col("h")).distinct()
      .withColumn("in_hist", lit(true))
    val ex = graft.core.Caches.transient(
      b.join(hd, Seq("h"), "left")
        .join(firstInBatch, Seq("h"))
        .select(col("doc_id"), col("text"),
          when(coalesce(col("in_hist"), lit(false)), "dup_of_history")
            .when(col("doc_id") =!= col("first_id"), "dup_in_batch")
            .otherwise("exact_new").as("ex_status")))
    val survivors = ex.filter(col("ex_status") === "exact_new")
      .select(col("doc_id"), col("text"))
    // ONE signature/shingle pass over the digest-new docs, shared by
    // the fuzzy screen and (filtered to admitted) the history append
    val sSigs = graft.core.Caches.transient(bandSigsOf(survivors, "doc_id"))
    val sSh = graft.core.Caches.transient(
      Dedup.hashedShingleRows(survivors, col("doc_id"), col("text"), 3))
    val fz = incrementalMinhashAgainst(histSigs, histShingles, survivors,
      Some(sSigs), Some(sSh))
    val decisions = ex.select(col("doc_id"), col("ex_status"))
      .join(fz.select(col("doc_id"), col("best_hist_id"),
        col("best_jaccard"), col("status").as("fz_status")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("ex_status") =!= "exact_new", col("ex_status"))
          .otherwise(col("fz_status")).as("status"),
        when(col("ex_status") =!= "exact_new", lit(-1L))
          .otherwise(coalesce(col("best_hist_id"), lit(-1L)))
          .as("best_hist_id"),
        when(col("ex_status") =!= "exact_new", lit(0.0))
          .otherwise(coalesce(col("best_jaccard"), lit(0.0)))
          .as("best_jaccard"))
    val newIds = decisions.filter(col("status") === "new")
      .select(col("doc_id"))
    val newDigests = b.join(newIds, Seq("doc_id")).select(col("h"))
    val newSigs = sSigs.join(newIds, Seq("doc_id"))
      .select(col("doc_id").as("hist_id"), col("band"), col("bandsig"))
    val newShingles = sSh
      .join(newIds.select(col("doc_id").as("id")), Seq("id"))
      .select(col("id"), col("sh"))
    (decisions, newDigests, newSigs, newShingles)
  }

  /** [[dedupGateAgainst]] with history state derived in-line from a
    * (doc_id, text) history relation — the batch twin's entry. */
  private[graft] def dedupGateOf(hist: DataFrame,
                                 batch: DataFrame): DataFrame =
    dedupGateAgainst(
      hist.select(Dedup.contentDigest(col("text")).as("h")),
      bandSigsOf(hist, "hist_id"),
      Dedup.hashedShingleRows(hist, col("doc_id"), col("text"), 3),
      batch)

  /** Session-scoped Jaccard-pair artifact: d02 reports the pairs, d08
    * resolves them into groups — one mining pass serves both (the
    * `exactSelfTop3` discipline). */
  private def jaccardPairsArtifact(spark: SparkSession, dir: String): DataFrame =
    graft.core.Artifacts.memo(spark, s"jaccard_pairs:$dir")(
      Dedup.jaccardPairs(augmented(spark, dir), col("doc_id"), col("text"),
        k = 3, threshold = 0.5))

  /** n-gram Jaccard near-dup pairs (finds the planted near-copies). */
  def jaccard(spark: SparkSession, dir: String): DataFrame =
    jaccardPairsArtifact(spark, dir)
      .orderBy(col("a_id"), col("b_id"))

  /** MinHash-LSH candidate pairs. */
  def minhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashCandidates(augmented(spark, dir), col("doc_id"), col("text"))
      .orderBy(col("a_id"), col("b_id"))

  /** SimHash values per augmented doc. */
  def simhashValues(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhash(augmented(spark, dir), col("doc_id"), col("text"))
      .orderBy(col("id"))

  /** SimHash near-dup pairs at Hamming ≤ 2 — through the banded-LSH
    * path (pigeonhole bands → equi-join candidates → exact Hamming
    * filter), the scale-safe default; the all-pairs twin remains as
    * the spec cross-check ([[Dedup.simhashPairsAllPairs]]). */
  def simhashNearDups(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairsBanded(augmented(spark, dir), col("doc_id"), col("text"), 2)
      .orderBy(col("a_id"), col("b_id"))

  /** embeddings ∪ planted near-copies (vec_id+100000, first component
    * bumped by 0.1 → cos ≈ 0.995 against the base on these unit
    * vectors). Mirrors [[augmented]]'s planted-dup design: the raw
    * synthetic vectors are an isotropic cloud (measured: mean pair
    * cos 4e-4, max 0.51 at sf0.01 — and 879 of the 990 pairs above
    * 0.3 are CROSS-label noise), so they contain no near-dups to
    * find; planting makes the mining task real. */
  def augmentedVectors(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val near = e.filter(col("vec_id") < 100)
      .select((col("vec_id") + 100000).as("vec_id"),
        concat(array(element_at(col("embedding"), 1) + lit(0.1)),
          slice(col("embedding"), lit(2), size(col("embedding")) - 1)).as("embedding"))
    e.unionByName(near)
  }

  /** Embedding-cosine near-dup pairs over the augmented vectors, at a
    * true near-dup threshold (0.98: planted pairs sit at ~0.995, the
    * isotropic background tops out at ~0.6 at every SF — a wide
    * margin on BOTH sides). Declared path is banded SRP-LSH + exact
    * rerank ([[graft.vector.KnnJoin.cosinePairsAboveBanded]]) — no
    * broadcast of the vector set, no n² scan; a spec pins its output
    * equal to the all-pairs twin. Low-threshold tail enumeration
    * (the old 0.3 form) is NOT a near-dup task and keeps the exact
    * scan as its only honest implementation — see the scaladoc on
    * [[graft.vector.KnnJoin.cosinePairsAbove]]. */
  def embeddingNearDups(spark: SparkSession, dir: String): DataFrame =
    graft.vector.KnnJoin.cosinePairsAboveBanded(spark,
        augmentedVectors(spark, dir), 0.98)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("a_id"), col("b_id"))

  /** d02 with the stop-shingle cap: shingles in more than 20 docs are
    * dropped from candidate generation AND set sizes — the skew guard
    * that bounds inverted-index fan-out at corpus scale, here under
    * the same oracle discipline as the uncapped variant. */
  def jaccardStopShingle(spark: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(augmented(spark, dir), col("doc_id"), col("text"),
        k = 3, threshold = 0.5, maxShingleDocFreq = 20)
      .orderBy(col("a_id"), col("b_id"))

  /** d20: the BOUNDED-OUTPUT datasheet twin of the d02 pair report —
    * per-similarity-band TRUE pair counts (bands of width 0.1 from
    * the 0.5 threshold up, J = 1.0 its own band), zero-filled (a13's
    * absent-cell discipline). d02's cost IS its quadratic output
    * (every true pair, 8.4× at 10×) — honest for the report, unusable
    * at 100 TB, where the curator's question is "how MUCH near-
    * duplication, at what similarity?" — six numbers, not the pairs.
    *
    * Shape: the d18 exact-collapse front bounds mining by the
    * DISTINCT corpus — identical texts share shingle sets, so (a)
    * every intra-class pair has J = 1.0 and counts CLOSED-FORM as
    * m(m−1)/2 per class, no enumeration, and (b) a cross-class member
    * pair's Jaccard equals its representative pair's, so each rep
    * pair contributes m_a·m_b pairs to its band. Duplicate-heavy
    * corpora (where true pairs grow quadratically in cluster size)
    * cost one digest groupBy + rep-only mining; the output is ≤ 6
    * rows regardless of corpus. The DuckDB oracle enumerates ALL
    * pairs over the full corpus directly — the independent check of
    * the collapse argument. Zero-shingle classes (texts under k
    * words) produce no pairs on either side: the intra count guards
    * on the class having shingles. */
  def pairBandCounts(spark: SparkSession, dir: String): DataFrame =
    pairBandCountsOf(spark, augmented(spark, dir))

  private[graft] def pairBandCountsOf(spark: SparkSession,
                                      corpus: DataFrame): DataFrame = {
    val classes = graft.core.Caches.transient(
      corpus.select(col("doc_id"), md5(col("text")).as("h"),
        (size(Dedup.shingles(col("text"), 3)) > 0).as("has_sh")))
    val reps = graft.core.Caches.transient(
      classes.groupBy(col("h"))
        .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("m"),
          max(col("has_sh")).as("has_sh")))
    val repCorpus = corpus
      .join(reps.select(col("rep_id").as("doc_id")), Seq("doc_id"))
    val cross = Dedup.jaccardPairs(repCorpus, col("doc_id"), col("text"),
        k = 3, threshold = 0.5)
      .join(reps.select(col("rep_id").as("a_id"), col("m").as("ma")), Seq("a_id"))
      .join(reps.select(col("rep_id").as("b_id"), col("m").as("mb")), Seq("b_id"))
      .select(floor(col("jaccard") * 10).cast("long").as("b10"),
        (col("ma") * col("mb")).as("w"))
    // m(m−1) is even, so the double division is exact (and long-cast
    // safe) for any class size below 2^26 — far past any real class
    val intra = reps.filter(col("m") > 1 && col("has_sh"))
      .select(lit(10L).as("b10"),
        ((col("m") * (col("m") - lit(1L))) / lit(2L)).cast("long").as("w"))
    val counts = cross.unionByName(intra)
      .groupBy(col("b10")).agg(sum(col("w")).as("n"))
    spark.range(5, 11).select(col("id").as("b10"))
      .join(counts, Seq("b10"), "left")
      .select((col("b10").cast("double") / lit(10.0)).as("band"),
        coalesce(col("n"), lit(0L)).as("n_pairs"))
      .orderBy(col("band"))
  }

  /** d21: MinHash ESTIMATOR-FIDELITY audit — the banding-tuning
    * instrument for the whole LSH family: for every d03 candidate
    * pair, the 12-seed match fraction is the unbiased Jaccard
    * estimator (Broder 1997), and this report rolls up, per match
    * count m ∈ 0..12 (zero-filled, the a13 absent-cell discipline),
    * the TRUE pair count, the weighted mean exact Jaccard, and the
    * weighted mean |m/12 − J| — the table a curator reads to decide
    * whether 12 seeds × 4 bands screens tightly enough before
    * raising either.
    *
    * Scale shape: the d20 exact-collapse front. Identical texts have
    * identical signatures AND identical shingle sets, so (a) a
    * member-pair candidate exists iff its representative pair is a
    * candidate, with the same (m, J) — cross-class rows weight by
    * m_a·m_b; (b) every intra-class pair is a candidate (all bands
    * equal) at exactly m = 12, J = 1.0, error 0 — counted closed-form
    * as c(c−1)/2 per class, no enumeration. Candidate mining and the
    * exact verify run over the DISTINCT corpus only; output is ≤ 13
    * rows at any scale. Weighted means go through 9-dp-rounded
    * decimal sums (the a08 discipline). The DuckDB oracle enumerates
    * ALL candidate pairs over the full corpus directly — the
    * independent check of the collapse argument. */
  def minhashFidelity(spark: SparkSession, dir: String): DataFrame =
    minhashFidelityOf(spark, augmented(spark, dir))

  private[graft] def minhashFidelityOf(spark: SparkSession,
                                       corpus: DataFrame): DataFrame = {
    val classes = graft.core.Caches.transient(
      corpus.select(col("doc_id"), Dedup.contentDigest(col("text")).as("h"),
        (size(Dedup.shingles(col("text"), 3)) > 0).as("has_sh")))
    val reps = graft.core.Caches.transient(
      classes.groupBy(col("h"))
        .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("cm"),
          max(col("has_sh")).as("has_sh")))
    val repCorpus = corpus
      .join(reps.select(col("rep_id").as("doc_id")), Seq("doc_id"))
    // one signature pass over the distinct corpus: per-seed mins feed
    // both the band candidates and the per-pair match counts
    val mh = graft.core.Caches.transient(
      Dedup.minhashRows(repCorpus.select(col("doc_id").as("id"),
        explode(Dedup.shingles(col("text"), 3)).as("sh")), 12))
    val sigs = mh.withColumn("band", (col("seed") / 3).cast("int"))
      .groupBy(col("id"), col("band"))
      .agg(concat_ws(",",
        transform(array_sort(collect_list(struct(col("seed"), col("mh")))),
          s => s.getField("mh").cast("string"))).as("bandsig"))
    val cand = graft.core.Caches.transient(
      sigs.select(col("id").as("a_id"), col("band"), col("bandsig"))
        .join(sigs.select(col("id").as("b_id"), col("band"), col("bandsig")),
          Seq("band", "bandsig"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id")).distinct())
    val matches = cand
      .join(mh.select(col("id").as("a_id"), col("seed"), col("mh").as("ma")),
        Seq("a_id"))
      .join(mh.select(col("id").as("b_id"), col("seed"), col("mh").as("mb")),
        Seq("b_id", "seed"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(sum(when(col("ma") === col("mb"), 1L).otherwise(0L)).as("m"))
    val shRows = graft.core.Caches.transient(
      Dedup.hashedShingleRows(repCorpus, col("doc_id"), col("text"), 3))
    val sizes = shRows.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(shRows.select(col("id").as("a_id"), col("sh")), Seq("a_id"))
      .join(shRows.select(col("id").as("b_id"), col("sh")), Seq("b_id", "sh"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("inter"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    val perPair = cand
      .join(matches, Seq("a_id", "b_id"))
      .join(inter, Seq("a_id", "b_id"), "left")
      .join(sizes.select(col("id").as("a_id"), col("n").as("na")), Seq("a_id"))
      .join(sizes.select(col("id").as("b_id"), col("n").as("nb")), Seq("b_id"))
      .join(reps.select(col("rep_id").as("a_id"), col("cm").as("wa")), Seq("a_id"))
      .join(reps.select(col("rep_id").as("b_id"), col("cm").as("wb")), Seq("b_id"))
      .select(col("m"), (col("wa") * col("wb")).as("w"),
        round(d(coalesce(col("inter"), lit(0L))) /
          d(col("na") + col("nb") - coalesce(col("inter"), lit(0L))), 9)
          .as("jac"))
    val cross = perPair.select(col("m"), col("w"),
      (col("w").cast("decimal(28,9)") * col("jac").cast("decimal(28,9)"))
        .cast("decimal(38,9)").as("wj"),
      (col("w").cast("decimal(28,9)") *
        round(abs(col("m").cast("double") / lit(12.0) - col("jac")), 9)
          .cast("decimal(28,9)")).cast("decimal(38,9)").as("we"))
    // intra-class pairs: all bands equal -> m = 12, J = 1, error = 0
    val intra = reps.filter(col("cm") > 1 && col("has_sh"))
      .select(lit(12L).as("m"),
        ((col("cm") * (col("cm") - lit(1L))) / lit(2L)).cast("long").as("w"),
        ((col("cm") * (col("cm") - lit(1L))) / lit(2L))
          .cast("decimal(38,9)").as("wj"),
        lit(0L).cast("decimal(38,9)").as("we"))
    val agg = cross.unionByName(intra)
      .groupBy(col("m"))
      .agg(sum(col("w")).as("n_pairs"), sum(col("wj")).as("sj"),
        sum(col("we")).as("se"))
    spark.range(0, 13).select(col("id").as("m"))
      .join(agg, Seq("m"), "left")
      .select(col("m"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        when(coalesce(col("n_pairs"), lit(0L)) > 0,
          round(col("sj").cast("double") / d(col("n_pairs")), 6))
          .as("mean_jaccard"),
        when(coalesce(col("n_pairs"), lit(0L)) > 0,
          round(col("se").cast("double") / d(col("n_pairs")), 6))
          .as("mean_abs_err"))
      .orderBy(col("m"))
  }

  /** d11: intra-corpus substring-overlap audit (the measurement that
    * motivates Lee et al. 2022's substring dedup — "Deduplicating
    * Training Data Makes Language Models Better" finds long repeated
    * spans ACROSS documents, not just whole-doc near-dups): per doc,
    * the fraction of its 10-gram word spans that occur in at least
    * one other document. Inverted-index shape end-to-end — shingle
    * doc-frequencies by groupBy, a semi-join back onto the posting
    * rows — fan-out linear in shingle rows, no pair enumeration; the
    * stop-shingle cap applies at corpus scale exactly as in d07/d09.
    * Docs under 10 words have no spans and report 0/0 → 0.0. */
  def sharedSpanFrac(spark: SparkSession, dir: String): DataFrame = {
    val aug = augmented(spark, dir)
    val sh = graft.core.Caches.transient(
      Dedup.hashedShingleRows(aug, col("doc_id"), col("text"), 10))
    val dupShingles = sh.groupBy(col("sh"))
      .agg(count(lit(1)).as("df_")).filter(col("df_") >= 2)
      .select(col("sh"))
    val nShared = sh.join(dupShingles, Seq("sh"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_shared"))
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_spans"))
    aug.select(col("doc_id"))
      .join(sizes.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .join(nShared.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        round(when(coalesce(col("n_spans"), lit(0L)) > 0,
          coalesce(col("n_shared"), lit(0L)).cast("double") /
            col("n_spans").cast("double")).otherwise(0.0), 6)
          .as("shared_frac"))
      .orderBy(col("doc_id"))
  }

  /** d15: exact substring dedup — the removal transform d11 only
    * audits. Planted exact copies clean to EMPTY (every 10-gram span
    * is kept by the lower-id original), near-copies likewise (their
    * spans are the original's shifted by one), and the word-soup
    * background passes through untouched — all spec-asserted; the
    * oracle replays occurrence offsets, keeper election, coverage,
    * and reassembly. */
  def substringDedupQuery(spark: SparkSession, dir: String): DataFrame =
    Dedup.substringDedup(augmented(spark, dir, spread = false),
      col("doc_id"), col("text"), 10)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** Session-scoped groups artifact, built EXACT-COLLAPSE-FIRST: one
    * representative (min doc_id) per identical text, Jaccard pair
    * mining + union-find over the representatives only, then a
    * linear expansion join attaching every member to its
    * representative's group. This is the standard production
    * composition (exact dedup before fuzzy — RefinedWeb §3.3 runs
    * exact dedup, then MinHash over survivors) and it is GROUP-
    * IDENTICAL to mining the full corpus: exact duplicates have
    * identical shingle sets, so (a) intra-class pairs are J=1 ≥ any
    * threshold (a class of size ≥ 2 is always one group), (b) a
    * cross-class member pair exists iff the representative pair does,
    * and (c) the group keeper (min doc_id) equals the representative-
    * level keeper because each representative IS its class minimum.
    * DedupSpec pins equality against the direct full-pair path, on
    * the corpus and on a 3×-replicated one.
    *
    * Why it matters at scale: true near-dup pairs grow QUADRATICALLY
    * in duplicate-cluster size — a 30×-replicated corpus has ~900×
    * the pairs, and the round-9 30× leg measured the full-corpus
    * mining path at 353 s (masked in round 8 by a retry that read
    * this very memo back; the scope-drop fix exposed it). Collapsing
    * first bounds mining by the DISTINCT corpus, which replication
    * does not grow; the d02 pair REPORT keeps the full-corpus path,
    * where emitting all true pairs is the task itself. */
  private def dedupGroupsArtifact(spark: SparkSession, dir: String): DataFrame =
    graft.core.Artifacts.memo(spark, s"dedup_groups:$dir")(
      groupsViaExactCollapse(augmented(spark, dir)))

  /** The collapse-first groups pipeline over any (doc_id, text)
    * corpus — see [[dedupGroupsArtifact]] for the equality argument.
    * Shared with the spec's direct-path comparison. */
  private[graft] def groupsViaExactCollapse(corpus: DataFrame): DataFrame = {
    val classes = graft.core.Caches.transient(
      corpus.select(col("doc_id"), md5(col("text")).as("h")))
    val reps = graft.core.Caches.transient(
      classes.groupBy(col("h"))
        .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_members")))
    val repCorpus = corpus
      .join(reps.select(col("rep_id").as("doc_id")), Seq("doc_id"))
    val repGroups = Dedup.dedupGroups(Dedup.jaccardPairs(repCorpus,
      col("doc_id"), col("text"), k = 3, threshold = 0.5))
    // membership contract unchanged: a doc appears iff it is in some
    // FULL pair — intra-class (class size ≥ 2) or via its rep's pair
    classes.join(reps, Seq("h"))
      .join(repGroups.select(col("doc_id").as("rep_id"), col("keeper_id")),
        Seq("rep_id"), "left")
      .filter(col("keeper_id").isNotNull || col("n_members") > 1)
      .select(col("doc_id"),
        coalesce(col("keeper_id"), col("rep_id")).as("keeper_id"))
  }

  /** Pairs → groups: transitive closure of the d02 Jaccard pairs.
    * The planted structure makes the components non-trivial — for
    * doc_id < 50 the exact copy AND the near copy chain into one
    * 3-doc group {i, i+100000, i+200000} whose keeper is i. */
  def dedupGroupsQuery(spark: SparkSession, dir: String): DataFrame =
    dedupGroupsArtifact(spark, dir)
      .orderBy(col("doc_id"))

  /** d14: dedup-aware (leakage-safe) split — the SPLIT UNIT is the
    * near-dup GROUP, not the document. A naive per-doc hash split
    * puts ~20% of each dup group's members on the test side, which is
    * exactly the train→test leakage Lee et al. 2022 measure (§6:
    * near-dup test examples inflate eval scores). Here every doc
    * splits by its group KEEPER's hash (singletons keep themselves),
    * so groups move atomically; the spec proves zero straddling
    * groups here vs real straddling under the naive split. Composes
    * the d02 pair artifact + d08 pointer-jumped components + the M2
    * hash split — at corpus scale each piece keeps its documented
    * shape and the split itself stays partition-independent. */
  def groupSplit(spark: SparkSession, dir: String): DataFrame = {
    val aug = augmented(spark, dir).select(col("doc_id"))
    val groups = dedupGroupsArtifact(spark, dir)
    val withKeeper = aug.join(groups, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("keeper_id"), col("doc_id")).as("keeper_id"))
    graft.sample.Sampling.hashSplit(withKeeper, col("keeper_id"), 0.8)
      .orderBy(col("doc_id"))
  }

  /** Benchmark decontamination (the GPT-3/PaLM eval-leakage check):
    * which train-split documents share word 3-gram shingles with the
    * held-out test split, and how much. Split is the engine's
    * partition-independent hash split ([[graft.sample.Sampling]]);
    * overlap is the inverted-index join again — train postings join
    * the DISTINCT test shingle set, so the fan-out is linear in train
    * shingle rows (no pair enumeration anywhere). At corpus scale the
    * stop-shingle cap applies to this join exactly as in d07. */
  /** The split-tagged hashed-shingle relation d09 and d13 both read:
    * (train rows (doc_id, sh) — transient-cached — and the distinct
    * test shingle set). One definition, so the two decontamination
    * forms can never shingle differently — the spec's
    * flagged-superset invariant depends on that. */
  private def splitShingles(spark: SparkSession,
                            dir: String): (DataFrame, DataFrame) = {
    val split = graft.sample.Sampling.hashSplit(
      Tables(spark, dir).documents, col("doc_id"), 0.8)
    val hashed = split
      .select(col("doc_id"), col("split"),
        explode(Dedup.shingles(col("text"), 3)).as("s"))
      .select(col("doc_id"), col("split"), Dedup.hash60(col("s")).as("sh"))
      .distinct()
    val train = graft.core.Caches.transient(
      hashed.filter(col("split") === "train").drop("split"))
    val test = hashed.filter(col("split") === "test").select(col("sh")).distinct()
    (train, test)
  }

  def decontamination(spark: SparkSession, dir: String): DataFrame = {
    val (train, test) = splitShingles(spark, dir)
    val sizes = train.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    train.join(test, Seq("sh"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .join(sizes, Seq("doc_id"))
      .select(col("doc_id"), col("n_shared"), col("n_shingles"),
        round(col("n_shared").cast("double") /
          col("n_shingles").cast("double"), 6).as("contam_frac"))
      .orderBy(col("doc_id"))
  }

  /** The augmented-vector coarse index shared by d12 and v14 — same
    * artifact discipline as the embeddings-table index in
    * [[graft.vector.VectorPack]] (deterministic build, so consuming
    * the memo is bitwise-identical to inline construction). */
  private[graft] def augIvfArtifacts(spark: SparkSession,
                                     dir: String): (DataFrame, DataFrame) =
    graft.vector.SemDedup.ivfArtifacts(spark, s"aug:$dir",
      augmentedVectors(spark, dir))

  /** d12: SemDeDup (Abbas et al. 2023) over the augmented vectors —
    * the semantic tier of the dedup ladder. The planted near-copies
    * (cos ≈ 0.995 to their base) land in the base vector's k-means
    * cluster, pair up inside it, and the pair member closer to the
    * centroid is dropped; the isotropic background (max pair cos
    * ~0.6) never reaches the 0.98 threshold, so `kept = 0` rows are
    * exactly the planted redundancy. Whole pipeline — seed sample,
    * Lloyd, assignment, within-cluster pairs, keeper rule — replays
    * in SQL via the shared v10 chain. */
  def semdedup(spark: SparkSession, dir: String): DataFrame = {
    val (cents, asg) = augIvfArtifacts(spark, dir)
    graft.vector.SemDedup.semDedup(spark, augmentedVectors(spark, dir), 0.98,
        centroidsOpt = Some(cents), assignmentsOpt = Some(asg))
      .orderBy(col("vec_id"))
  }

  /** d13: Bloom-filter decontamination — d09's check through a
    * fixed-size filter instead of the exact test-shingle join. The
    * bits relation is bounded by 2²⁰ positions NO MATTER how large
    * the held-out corpus grows (the exact join's build side grows
    * with it), at the price of the standard false-positive rate —
    * which the oracle reproduces bit-for-bit because positions are
    * md5-derived. Flagged ⊇ the exact d09 set (no false negatives;
    * spec-asserted), so the filter is a safe PRE-SCREEN: at corpus
    * scale run d13 map-side first, then the exact join only over the
    * tiny flagged remainder. */
  def bloomDecontamination(spark: SparkSession, dir: String): DataFrame = {
    val mBits = 1 << 20
    val k = 3
    val (train, test) = splitShingles(spark, dir)
    val bits = Dedup.bloomBits(test.select(col("sh").as("key")), k, mBits)
    val members = Dedup.bloomMembers(
      train.select(col("doc_id").as("id"), col("sh").as("key")), bits, k, mBits)
    val sizes = train.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    members.groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_flagged"))
      .join(sizes, Seq("doc_id"))
      .select(col("doc_id"), col("n_flagged"), col("n_shingles"),
        round(col("n_flagged").cast("double") /
          col("n_shingles").cast("double"), 6).as("flag_frac"))
      .orderBy(col("doc_id"))
  }

  /** d10: the Manku production shape — 60-bit simhash, Hamming ≤ 3,
    * 4 pigeonhole bands of 15 bits. The width is what survives scale:
    * per-band background collisions fall from 2^-5 (d05's 16-bit/3-
    * band layout) to 2^-15, so candidate volume stays near the true
    * near-dup count instead of n²/32. */
  def simhashWidePairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairsBandedWide(augmented(spark, dir), col("doc_id"),
        col("text"), 3, 60)
      .orderBy(col("a_id"), col("b_id"))

  /** d22: d10 BEHIND THE EXACT-COLLAPSE FRONT — the production
    * posture the round-13 adjudication (PERF.md bandblocks table) and
    * the 30× legs prescribe: byte-identical copies resolve at the
    * digest tier ([[graft.dedup.Dedup.contentDigest]] keepers — d01's
    * job), and only ONE representative per distinct content enters
    * the banded simhash join, so duplicate-cluster growth (the scale
    * corpus's growth mode: C(k,2) true pairs per k-replica cluster,
    * re-enumerated in every band) never reaches the band buckets.
    * Output = d10's near-dup pairs restricted to representatives (the
    * mm06 stance: exact-dup pairs are the digest tier's output, not
    * the fuzzy tier's; spec pins d22 ≡ d10 filtered to rep ids). d10
    * stays the declared full-corpus contrast, whose measured 27-32×
    * slope at 30× (bound 45) is exactly the growth this front
    * removes. */
  def simhashWidePairsCollapsed(spark: SparkSession, dir: String): DataFrame = {
    val aug = augmented(spark, dir)
    val reps = aug.groupBy(Dedup.contentDigest(col("text")).as("d"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val repDocs = aug.join(reps, Seq("doc_id"), "left_semi")
    Dedup.simhashPairsBandedWide(repDocs, col("doc_id"), col("text"), 3, 60)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** d17: corpus-level duplicate-LINE removal with document
    * reassembly — CCNet's first pipeline stage (Wenzek et al. 2020
    * §3.1 dedups paragraphs ACROSS documents by hash before any
    * model-based filtering; C4 likewise drops repeated three-sentence
    * spans corpus-wide). Sits between a07 (per-doc line rules, no
    * cross-doc state) and d11/d15 (word-10-gram span overlap): the
    * unit here is the whole normalized line, and the output is the
    * cleaned CORPUS, not an audit. Every occurrence of a line except
    * the globally first (smallest (doc_id, pos)) of its normalized
    * form — lowercased, punctuation/digits stripped, trimmed — is
    * removed, and each document is rebuilt from its surviving lines
    * in original order.
    *
    * Scale shape — two exchanges, no pair fan-out, skew-proof where
    * it matters: keeper election is a partial-aggregatable
    * min(struct(doc_id, pos)) groupBy on the line hash, so the
    * boilerplate hot keys this operator exists for (nav lines,
    * cookie banners — here the planted "javascript"/"lorem" lines in
    * 1/7 and 1/11 of all docs) collapse MAP-SIDE before the exchange.
    * A row_number window over the same key would ship every
    * occurrence of the hottest line into one unsplittable task; the
    * equivalent join-back on the hash IS splittable (AQE skew join —
    * the keeper side is one row per hash). Reassembly shuffles once
    * more on doc_id. Lines are derived by the same planted-lines
    * generator as a07 ([[graft.text.AnalysisPack.withPlantedLines]])
    * so both engines see identical corpora. */
  def lineDedup(spark: SparkSession, dir: String): DataFrame = {
    // the POSTING relation is the cached seam (not the lines base):
    // it feeds both the keeper election and the join probe, and
    // caching it makes the line generator AND the per-line
    // normalize+md5 pipeline run exactly once. Every downstream
    // per-doc number — n_lines included — comes from one conditional
    // aggregation over the flagged postings, so no second branch
    // re-derives the lines; only the zero-line-doc edge reads
    // documents again, as a doc_id-only column scan. Cache spills to
    // disk at scale (the `augmented` discipline).
    val posted = graft.core.Caches.transient(
      graft.text.AnalysisPack.withPlantedLines(spark, dir)
        .select(col("doc_id"), posexplode(col("lines")).as(Seq("pos", "line")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("line"),
          md5(trim(regexp_replace(lower(col("line")), "[^a-z ]", ""))).as("h")))
    val keepers = posted.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("k"))
      .select(col("h"), col("k.doc_id").as("k_doc"), col("k.pos").as("k_pos"))
    // the inner join on the hash preserves every posting row (keepers
    // is keyed by the same relation's hashes); kept-ness is a flag
    val flagged = posted.join(keepers, Seq("h"))
      .select(col("doc_id"), col("pos"), col("line"),
        (col("doc_id") === col("k_doc") && col("pos") === col("k_pos"))
          .as("keep"))
    val rebuilt = flagged.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("keep"), lit(1L)).otherwise(lit(0L))).as("n_kept"),
        concat_ws("\n", transform(
          array_sort(collect_list(
            when(col("keep"), struct(col("pos"), col("line"))))),
          s => s.getField("line"))).as("cleaned"))
    Tables(spark, dir).documents.select(col("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
      .orderBy(col("doc_id"))
  }

  /** d18: keep-BEST dedup materialization — the removal POLICY on top
    * of d08's components. Within every near-dup group keep the member
    * with the highest a02 quality score (ties → smallest doc_id),
    * not blindly the smallest id: production pipelines keep one
    * representative per duplicate cluster and prefer the
    * better-quality copy (RefinedWeb §3.4's dedup stage composes
    * with its quality stage the same way). Emits the per-member
    * manifest: group, quality, elected best, keep flag.
    *
    * Scale shape: quality is scan-stage arithmetic on the augmented
    * corpus (the a02 native-expression formula, shared so the policy
    * cannot fork); groups come from the shared session artifact; the
    * election is a partial-aggregatable max(struct(quality, -doc_id))
    * per group plus one AQE-splittable join back — work is bounded by
    * the dup-group membership, never the corpus. */
  def keepBest(spark: SparkSession, dir: String): DataFrame = {
    val q = augmented(spark, dir, spread = false)
      .select(col("doc_id"),
        round(graft.text.TextAnalysis.qualityScore(col("text")), 6)
          .as("quality"))
    // transient-cached: `m` feeds both the election aggregation and
    // the final join probe; uncached, the full-corpus quality scan
    // (the expensive side) would execute twice
    val m = graft.core.Caches.transient(
      dedupGroupsArtifact(spark, dir)
        .withColumnRenamed("keeper_id", "group_id")
        .join(q, Seq("doc_id")))
    val best = m.groupBy(col("group_id"))
      .agg(max(struct(col("quality"), (-col("doc_id")).as("nid"))).as("b"))
      .select(col("group_id"), (-col("b.nid")).as("best_id"))
    m.join(best, Seq("group_id"))
      .select(col("doc_id"), col("group_id"), col("quality"),
        col("best_id"), (col("doc_id") === col("best_id")).as("keep"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d18_keep_best" -> keepBest,
    "d17_line_dedup" -> lineDedup,
    "d11_shared_spans" -> sharedSpanFrac,
    "d12_semdedup" -> semdedup,
    "d13_bloom_decontam" -> bloomDecontamination,
    "d14_group_split" -> groupSplit,
    "d15_substring_dedup" -> substringDedupQuery,
    "d10_simhash_wide" -> simhashWidePairs,
    "d22_simhash_reps" -> simhashWidePairsCollapsed,
    "d08_dedup_groups" -> dedupGroupsQuery,
    "d09_decontamination" -> decontamination,
    "d07_jaccard_stopshingle" -> jaccardStopShingle,
    "d01_exact_dedup" -> exactDedup,
    "d16_incremental_dedup" -> incrementalDedup,
    "d19_incremental_minhash" -> incrementalMinhash,
    "d02_jaccard_pairs" -> jaccard,
    "d20_pair_band_counts" -> pairBandCounts,
    "d21_minhash_fidelity" -> minhashFidelity,
    "d03_minhash_candidates" -> minhash,
    "d04_simhash_values" -> simhashValues,
    "d05_simhash_pairs" -> simhashNearDups,
    "d06_embedding_near_dups" -> embeddingNearDups)

  override val artifacts: Map[String, (SparkSession, String) => DataFrame] =
    Map("jaccard_pairs" -> jaccardPairsArtifact,
      "dedup_groups" -> dedupGroupsArtifact,
      "aug_ivf_centroids" -> ((s, d) => augIvfArtifacts(s, d)._1),
      "aug_ivf_assign" -> ((s, d) => augIvfArtifacts(s, d)._2))

  /** Shared SQL: distinct 3-gram shingle rows over `aug`. */
  private[graft] val shingleSql = """
    |w AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
    |    ELSE regexp_split_to_array(trim(text), '\s+') END AS words FROM aug),
    |sh AS (SELECT DISTINCT doc_id AS id, s AS sh
    |  FROM (SELECT doc_id, unnest(CASE WHEN len(words) >= 3
    |    THEN list_transform(range(1, len(words) - 1),
    |         i -> array_to_string(words[i:i+2], ' '))
    |    ELSE [] END) AS s FROM w))""".stripMargin

  /** 16-bit md5-prefix hash in pure SQL (nibble decode). */
  private def hv(e: String): String = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(md5($e), $i, 1)) - 1)"
    s"(${nib(1)}*4096 + ${nib(2)}*256 + ${nib(3)}*16 + ${nib(4)})"
  }

  /** 60-bit md5-prefix hash (15-nibble decode) — mirrors
    * `Dedup.hash60` (Jaccard join keys, KMV sketch hashes). */
  private[graft] def hv60(e: String): String =
    (1 to 15).map { i =>
      val mult = java.math.BigInteger.valueOf(16).pow(15 - i)
      s"CAST(strpos('0123456789abcdef', substr(md5($e), $i, 1)) - 1 AS BIGINT) * $mult"
    }.mkString("(", " + ", ")")

  /** Distinct (id, hashed shingle) — the join-key relation both
    * Jaccard oracles read. */
  private[graft] val hashedShingleSql =
    s"""hsh AS (SELECT DISTINCT id, ${hv60("sh")} AS sh FROM sh)"""

  /** The minhash band-signature chain (32-bit base hash → 12-seed
    * family mins → 4 band signatures) — shared by the d03 and d19
    * oracles so the LSH family cannot fork. Assumes the `sh` shingle
    * CTE in scope; interpolated into strings that stripMargin AFTER
    * interpolation, so no content line starts with a margin char. */
  private[graft] val minhashBandsSql = s"""hb AS (SELECT id,
    |  CAST((strpos('0123456789abcdef', substr(md5(sh), 1, 1)) - 1) AS BIGINT) * 268435456
    |  + (strpos('0123456789abcdef', substr(md5(sh), 2, 1)) - 1) * 16777216
    |  + (strpos('0123456789abcdef', substr(md5(sh), 3, 1)) - 1) * 1048576
    |  + (strpos('0123456789abcdef', substr(md5(sh), 4, 1)) - 1) * 65536
    |  + (strpos('0123456789abcdef', substr(md5(sh), 5, 1)) - 1) * 4096
    |  + (strpos('0123456789abcdef', substr(md5(sh), 6, 1)) - 1) * 256
    |  + (strpos('0123456789abcdef', substr(md5(sh), 7, 1)) - 1) * 16
    |  + (strpos('0123456789abcdef', substr(md5(sh), 8, 1)) - 1) AS base
    |  FROM sh),
    |mh AS (SELECT id, seed,
    |    min(((1000003 + 222222 * seed) * base + 777767 * seed + 12345)
    |      % ${Dedup.MinhashP}) AS mh
    |  FROM hb, unnest(range(0, 12)) t(seed) GROUP BY id, seed),
    |bands AS (SELECT id, CAST(seed // 3 AS INT) AS band,
    |    string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS bandsig
    |  FROM mh GROUP BY id, CAST(seed // 3 AS INT))""".stripMargin

  /** d09's shingle relation is over the RAW documents table (no
    * planted dups — contamination is natural vocabulary overlap). */
  private val docShingleSql = """
    |w AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
    |    ELSE regexp_split_to_array(trim(text), '\s+') END AS words FROM documents),
    |sh AS (SELECT DISTINCT doc_id AS id, s AS sh
    |  FROM (SELECT doc_id, unnest(CASE WHEN len(words) >= 3
    |    THEN list_transform(range(1, len(words) - 1),
    |         i -> array_to_string(words[i:i+2], ' '))
    |    ELSE [] END) AS s FROM w))""".stripMargin

  /** The d08 recursive component chain (Jaccard pairs → bidirectional
    * edges → transitive reachability → min-label keepers) — shared by
    * the d08 and d14 oracles. Assumes aug/sh/hsh CTEs in scope. */
  private val dedupGroupsCtes = """
    |sizes AS (SELECT id, count(*) AS n FROM hsh GROUP BY id),
    |prs AS (SELECT a.id AS a_id, b.id AS b_id, count(*) AS inter
    |  FROM hsh a JOIN hsh b USING (sh) WHERE a.id < b.id GROUP BY 1, 2),
    |jp AS (SELECT p.a_id, p.b_id
    |  FROM prs p JOIN sizes sa ON sa.id = p.a_id JOIN sizes sb ON sb.id = p.b_id
    |  WHERE CAST(p.inter AS DOUBLE) / CAST(sa.n + sb.n - p.inter AS DOUBLE) >= 0.5),
    |bi AS (SELECT a_id AS s, b_id AS d FROM jp
    |  UNION SELECT b_id, a_id FROM jp),
    |reach AS (SELECT s, d FROM bi
    |  UNION SELECT r.s, b.d FROM reach r JOIN bi b ON r.d = b.s WHERE b.d <> r.s),
    |lab AS (SELECT s AS doc_id, least(s, min(d)) AS keeper_id
    |  FROM reach GROUP BY s)""".stripMargin

  /** SQL bit position i of the d13 Bloom filter for key expression
    * `e` — mirrors `Dedup.bloomBitPositions` (md5-prefix hash of the
    * salted key string, mod 2²⁰). */
  private def bpos(i: Int, e: String): String =
    s"(${hv60(s"'bloom${i}_' || CAST($e AS VARCHAR)")} % 1048576)"

  val oracles: Map[String, String] = Map(
    "d15_substring_dedup" -> s"""
      |WITH $augmentedSql,
      |w AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
      |    ELSE regexp_split_to_array(trim(text), '\\s+') END AS words FROM aug),
      |wp AS (SELECT doc_id AS id, unnest(words) AS word,
      |    generate_subscripts(words, 1) - 1 AS p FROM w),
      |occ AS (SELECT doc_id AS id, i - 1 AS i,
      |    ${hv60("array_to_string(words[i:i+9], ' ')")} AS sh
      |  FROM (SELECT doc_id, words, unnest(CASE WHEN len(words) >= 10
      |    THEN range(1, len(words) - 8) ELSE [] END) AS i FROM w)),
      |stats AS (SELECT sh, count(*) AS df_, min(id) AS keeper
      |  FROM (SELECT DISTINCT id, sh FROM occ) GROUP BY sh HAVING count(*) >= 2),
      |cov AS (SELECT DISTINCT o.id, p FROM occ o JOIN stats USING (sh),
      |    unnest(range(o.i, o.i + 10)) t(p)
      |  WHERE o.id <> stats.keeper),
      |kept AS (SELECT wp.id, wp.word, wp.p FROM wp
      |  WHERE NOT EXISTS (SELECT 1 FROM cov
      |    WHERE cov.id = wp.id AND cov.p = wp.p)),
      |reas AS (SELECT id, count(*) AS n_kept,
      |    string_agg(word, ' ' ORDER BY p) AS cleaned
      |  FROM kept GROUP BY id)
      |SELECT w.doc_id, CAST(len(w.words) AS BIGINT) AS n_words,
      |  CAST(coalesce(reas.n_kept, 0) AS BIGINT) AS n_kept,
      |  md5(coalesce(reas.cleaned, '')) AS cleaned_md5
      |FROM w LEFT JOIN reas ON reas.id = w.doc_id
      |ORDER BY w.doc_id""".stripMargin,
    "d13_bloom_decontam" -> s"""
      |WITH $docShingleSql,
      |hsh AS (SELECT DISTINCT id, ${hv60("sh")} AS sh FROM sh),
      |sp AS (SELECT doc_id,
      |  CASE WHEN substr(md5('42' || CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
      |    THEN 'train' ELSE 'test' END AS split FROM documents),
      |tr AS (SELECT h.id, h.sh FROM hsh h JOIN sp ON sp.doc_id = h.id
      |  WHERE sp.split = 'train'),
      |te AS (SELECT DISTINCT h.sh FROM hsh h JOIN sp ON sp.doc_id = h.id
      |  WHERE sp.split = 'test'),
      |bits AS (SELECT DISTINCT pos FROM (SELECT
      |  unnest([${bpos(0, "sh")}, ${bpos(1, "sh")}, ${bpos(2, "sh")}]) AS pos
      |  FROM te)),
      |prb AS (SELECT id, sh,
      |  unnest([${bpos(0, "sh")}, ${bpos(1, "sh")}, ${bpos(2, "sh")}]) AS pos,
      |  generate_subscripts([${bpos(0, "sh")}, ${bpos(1, "sh")}, ${bpos(2, "sh")}], 1) AS i
      |  FROM tr),
      |mem AS (SELECT id, sh FROM (SELECT p.id, p.sh, count(DISTINCT p.i) AS nh
      |  FROM prb p JOIN bits USING (pos) GROUP BY p.id, p.sh) WHERE nh = 3),
      |sizes AS (SELECT id, count(*) AS n FROM tr GROUP BY id),
      |flg AS (SELECT id, count(*) AS nf FROM mem GROUP BY id)
      |SELECT flg.id AS doc_id, CAST(nf AS BIGINT) AS n_flagged,
      |  CAST(n AS BIGINT) AS n_shingles,
      |  round(CAST(nf AS DOUBLE) / CAST(n AS DOUBLE), 6) AS flag_frac
      |FROM flg JOIN sizes ON sizes.id = flg.id ORDER BY doc_id""".stripMargin,
    "d09_decontamination" -> s"""
      |WITH $docShingleSql,
      |hsh AS (SELECT DISTINCT id, ${hv60("sh")} AS sh FROM sh),
      |sp AS (SELECT doc_id,
      |  CASE WHEN substr(md5('42' || CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
      |    THEN 'train' ELSE 'test' END AS split FROM documents),
      |tr AS (SELECT h.id, h.sh FROM hsh h JOIN sp ON sp.doc_id = h.id
      |  WHERE sp.split = 'train'),
      |te AS (SELECT DISTINCT h.sh FROM hsh h JOIN sp ON sp.doc_id = h.id
      |  WHERE sp.split = 'test'),
      |sizes AS (SELECT id, count(*) AS n FROM tr GROUP BY id),
      |c AS (SELECT tr.id, count(*) AS n_shared FROM tr JOIN te USING (sh)
      |  GROUP BY tr.id)
      |SELECT c.id AS doc_id, CAST(c.n_shared AS BIGINT) AS n_shared,
      |  CAST(sizes.n AS BIGINT) AS n_shingles,
      |  round(CAST(c.n_shared AS DOUBLE) / CAST(sizes.n AS DOUBLE), 6) AS contam_frac
      |FROM c JOIN sizes ON sizes.id = c.id ORDER BY doc_id""".stripMargin,
    "d08_dedup_groups" -> s"""
      |WITH RECURSIVE $augmentedSql, $shingleSql, $hashedShingleSql,
      |$dedupGroupsCtes
      |SELECT doc_id, keeper_id FROM lab ORDER BY doc_id""".stripMargin,
    "d14_group_split" -> s"""
      |WITH RECURSIVE $augmentedSql, $shingleSql, $hashedShingleSql,
      |$dedupGroupsCtes,
      |k AS (SELECT a.doc_id, coalesce(lab.keeper_id, a.doc_id) AS keeper_id
      |  FROM aug a LEFT JOIN lab ON lab.doc_id = a.doc_id)
      |SELECT doc_id, keeper_id,
      |  CASE WHEN substr(md5('42' || CAST(keeper_id AS VARCHAR)), 1, 4) < 'cccd'
      |    THEN 'train' ELSE 'test' END AS split
      |FROM k ORDER BY doc_id""".stripMargin,
    "d21_minhash_fidelity" -> s"""
      |WITH $augmentedSql, $shingleSql, $hashedShingleSql,
      |$minhashBandsSql,
      |cand AS (SELECT DISTINCT a.id AS a_id, b.id AS b_id
      |  FROM bands a JOIN bands b ON a.band = b.band AND a.bandsig = b.bandsig
      |  WHERE a.id < b.id),
      |mm AS (SELECT c.a_id, c.b_id,
      |    sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS m
      |  FROM cand c JOIN mh x ON x.id = c.a_id
      |  JOIN mh y ON y.id = c.b_id AND y.seed = x.seed
      |  GROUP BY 1, 2),
      |sizes AS (SELECT id, count(*) AS n FROM hsh GROUP BY id),
      |iv AS (SELECT c.a_id, c.b_id, count(*) AS inter
      |  FROM cand c JOIN hsh a2 ON a2.id = c.a_id
      |  JOIN hsh b2 ON b2.id = c.b_id AND b2.sh = a2.sh
      |  GROUP BY 1, 2),
      |pp AS (SELECT mm.m,
      |    round(CAST(coalesce(iv.inter, 0) AS DOUBLE)
      |      / CAST(sa.n + sb.n - coalesce(iv.inter, 0) AS DOUBLE), 9) AS jac
      |  FROM cand c
      |  JOIN mm ON mm.a_id = c.a_id AND mm.b_id = c.b_id
      |  LEFT JOIN iv ON iv.a_id = c.a_id AND iv.b_id = c.b_id
      |  JOIN sizes sa ON sa.id = c.a_id JOIN sizes sb ON sb.id = c.b_id),
      |ag AS (SELECT m, count(*) AS n_pairs,
      |    sum(CAST(jac AS DECIMAL(28,9))) AS sj,
      |    sum(CAST(round(abs(CAST(m AS DOUBLE) / 12.0 - jac), 9)
      |      AS DECIMAL(28,9))) AS se
      |  FROM pp GROUP BY m)
      |SELECT CAST(g.m AS BIGINT) AS m,
      |  CAST(coalesce(ag.n_pairs, 0) AS BIGINT) AS n_pairs,
      |  CASE WHEN coalesce(ag.n_pairs, 0) > 0
      |    THEN round(CAST(sj AS DOUBLE) / CAST(n_pairs AS DOUBLE), 6)
      |  END AS mean_jaccard,
      |  CASE WHEN coalesce(ag.n_pairs, 0) > 0
      |    THEN round(CAST(se AS DOUBLE) / CAST(n_pairs AS DOUBLE), 6)
      |  END AS mean_abs_err
      |FROM generate_series(0, 12) g(m) LEFT JOIN ag ON ag.m = g.m
      |ORDER BY m""".stripMargin,
    "d20_pair_band_counts" -> s"""
      |WITH $augmentedSql, $shingleSql, $hashedShingleSql,
      |sizes AS (SELECT id, count(*) AS n FROM hsh GROUP BY id),
      |prs AS (SELECT a.id AS a_id, b.id AS b_id, count(*) AS inter
      |  FROM hsh a JOIN hsh b USING (sh) WHERE a.id < b.id GROUP BY 1, 2),
      |jb AS (SELECT CAST(floor(round(
      |      CAST(p.inter AS DOUBLE) / CAST(sa.n + sb.n - p.inter AS DOUBLE),
      |      6) * 10) AS BIGINT) AS b10
      |  FROM prs p JOIN sizes sa ON sa.id = p.a_id
      |  JOIN sizes sb ON sb.id = p.b_id
      |  WHERE CAST(p.inter AS DOUBLE)
      |      / CAST(sa.n + sb.n - p.inter AS DOUBLE) >= 0.5),
      |cnt AS (SELECT b10, count(*) AS n FROM jb GROUP BY b10)
      |SELECT CAST(g.b10 AS DOUBLE) / 10.0 AS band,
      |  CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_pairs
      |FROM generate_series(5, 10) g(b10) LEFT JOIN cnt ON cnt.b10 = g.b10
      |ORDER BY band""".stripMargin,
    "d07_jaccard_stopshingle" -> s"""
      |WITH $augmentedSql, $shingleSql, $hashedShingleSql,
      |rare AS (SELECT sh AS rsh FROM (SELECT sh, count(*) AS df_ FROM hsh GROUP BY sh)
      |  WHERE df_ <= 20),
      |shf AS (SELECT id, sh FROM hsh JOIN rare ON hsh.sh = rare.rsh),
      |sizes AS (SELECT id, count(*) AS n FROM shf GROUP BY id),
      |pairs AS (SELECT a.id AS a_id, b.id AS b_id, count(*) AS inter
      |  FROM shf a JOIN shf b USING (sh) WHERE a.id < b.id GROUP BY 1, 2)
      |SELECT p.a_id, p.b_id, p.inter,
      |  sa.n AS na, sb.n AS nb,
      |  round(CAST(p.inter AS DOUBLE) / CAST(sa.n + sb.n - p.inter AS DOUBLE), 6) AS jaccard
      |FROM pairs p JOIN sizes sa ON sa.id = p.a_id JOIN sizes sb ON sb.id = p.b_id
      |WHERE CAST(p.inter AS DOUBLE) / CAST(sa.n + sb.n - p.inter AS DOUBLE) >= 0.5
      |ORDER BY a_id, b_id""".stripMargin,
    "d18_keep_best" -> s"""
      |WITH RECURSIVE $augmentedSql, $shingleSql, $hashedShingleSql,
      |$dedupGroupsCtes,
      |${graft.text.AnalysisPack.qualityCtes("aug")},
      |m AS (SELECT lab.doc_id, lab.keeper_id AS group_id, qs.quality
      |  FROM lab JOIN qs USING (doc_id)),
      |bb AS (SELECT group_id, doc_id AS best_id FROM (
      |    SELECT group_id, doc_id,
      |      row_number() OVER (PARTITION BY group_id
      |        ORDER BY quality DESC, doc_id) AS rk FROM m)
      |  WHERE rk = 1)
      |SELECT m.doc_id, m.group_id, m.quality, bb.best_id,
      |  (m.doc_id = bb.best_id) AS keep
      |FROM m JOIN bb USING (group_id) ORDER BY m.doc_id""".stripMargin,
    "d17_line_dedup" -> s"""
      |WITH ${graft.text.AnalysisPack.plantedLinesCte},
      |x AS (SELECT doc_id, u.pos AS pos, u.line AS line,
      |    md5(trim(regexp_replace(lower(u.line), '[^a-z ]', '', 'g'))) AS h
      |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(lines)+1),
      |      i -> struct_pack(pos := i, line := lines[i]))) AS u FROM l1)),
      |r AS (SELECT doc_id, pos, line,
      |    row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rk FROM x),
      |g AS (SELECT doc_id, count(*) AS n_kept,
      |    string_agg(line, chr(10) ORDER BY pos) AS cleaned
      |  FROM r WHERE rk = 1 GROUP BY doc_id),
      |nl AS (SELECT doc_id, len(lines) AS n_lines FROM l1)
      |SELECT nl.doc_id, CAST(nl.n_lines AS BIGINT) AS n_lines,
      |  CAST(coalesce(g.n_kept, 0) AS BIGINT) AS n_kept,
      |  coalesce(g.cleaned, '') AS cleaned
      |FROM nl LEFT JOIN g USING (doc_id) ORDER BY nl.doc_id""".stripMargin,
    "d01_exact_dedup" -> s"""
      |WITH $augmentedSql
      |SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id,
      |  count(*) AS n_copies
      |FROM aug GROUP BY md5(text) HAVING count(*) > 1
      |ORDER BY content_hash""".stripMargin,
    "d16_incremental_dedup" -> s"""
      |WITH $augmentedSql,
      |hist AS (SELECT DISTINCT md5(text) AS h FROM aug WHERE doc_id < 100000),
      |batch AS (SELECT doc_id, md5(text) AS h FROM aug WHERE doc_id >= 100000),
      |fb AS (SELECT h, min(doc_id) AS first_id FROM batch GROUP BY h)
      |SELECT b.doc_id, b.h AS content_hash,
      |  CASE WHEN hist.h IS NOT NULL THEN 'dup_of_history'
      |       WHEN b.doc_id <> fb.first_id THEN 'dup_in_batch'
      |       ELSE 'new' END AS status
      |FROM batch b LEFT JOIN hist ON b.h = hist.h JOIN fb ON b.h = fb.h
      |ORDER BY b.doc_id""".stripMargin,
    "d19_incremental_minhash" -> s"""
      |WITH $augmentedSql, $shingleSql, $hashedShingleSql,
      |$minhashBandsSql,
      |cand AS (SELECT DISTINCT b.id AS doc_id, h.id AS hist_id
      |  FROM bands b JOIN bands h ON b.band = h.band AND b.bandsig = h.bandsig
      |  WHERE b.id >= 100000 AND h.id < 100000),
      |sizes AS (SELECT id, count(*) AS n FROM hsh GROUP BY id),
      |iv AS (SELECT c.doc_id, c.hist_id, count(*) AS inter
      |  FROM cand c JOIN hsh a ON a.id = c.doc_id
      |  JOIN hsh h2 ON h2.id = c.hist_id AND h2.sh = a.sh
      |  GROUP BY 1, 2),
      |jc AS (SELECT c.doc_id, c.hist_id,
      |    CAST(coalesce(iv.inter, 0) AS DOUBLE)
      |      / CAST(sa.n + sb.n - coalesce(iv.inter, 0) AS DOUBLE) AS jac
      |  FROM cand c LEFT JOIN iv ON iv.doc_id = c.doc_id AND iv.hist_id = c.hist_id
      |  JOIN sizes sa ON sa.id = c.doc_id JOIN sizes sb ON sb.id = c.hist_id),
      |bst AS (SELECT doc_id, hist_id, jac,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY jac DESC, hist_id) AS rn
      |  FROM jc),
      |nc AS (SELECT doc_id, count(*) AS n_candidates FROM cand GROUP BY 1)
      |SELECT a.doc_id,
      |  CAST(coalesce(nc.n_candidates, 0) AS BIGINT) AS n_candidates,
      |  CAST(coalesce(b.hist_id, -1) AS BIGINT) AS best_hist_id,
      |  round(coalesce(b.jac, 0.0), 6) AS best_jaccard,
      |  CASE WHEN coalesce(b.jac, 0.0) >= 0.5 THEN 'near_dup_of_history'
      |       ELSE 'new' END AS status
      |FROM (SELECT doc_id FROM aug WHERE doc_id >= 100000) a
      |LEFT JOIN nc ON nc.doc_id = a.doc_id
      |LEFT JOIN bst b ON b.doc_id = a.doc_id AND b.rn = 1
      |ORDER BY a.doc_id""".stripMargin,
    "d02_jaccard_pairs" -> s"""
      |WITH $augmentedSql, $shingleSql, $hashedShingleSql,
      |sizes AS (SELECT id, count(*) AS n FROM hsh GROUP BY id),
      |pairs AS (SELECT a.id AS a_id, b.id AS b_id, count(*) AS inter
      |  FROM hsh a JOIN hsh b USING (sh) WHERE a.id < b.id GROUP BY 1, 2)
      |SELECT p.a_id, p.b_id, p.inter,
      |  sa.n AS na, sb.n AS nb,
      |  round(CAST(p.inter AS DOUBLE) / CAST(sa.n + sb.n - p.inter AS DOUBLE), 6) AS jaccard
      |FROM pairs p JOIN sizes sa ON sa.id = p.a_id JOIN sizes sb ON sb.id = p.b_id
      |WHERE CAST(p.inter AS DOUBLE) / CAST(sa.n + sb.n - p.inter AS DOUBLE) >= 0.5
      |ORDER BY a_id, b_id""".stripMargin,
    "d03_minhash_candidates" -> s"""
      |WITH $augmentedSql, $shingleSql,
      |$minhashBandsSql
      |SELECT DISTINCT a.id AS a_id, b.id AS b_id
      |FROM bands a JOIN bands b ON a.band = b.band AND a.bandsig = b.bandsig
      |WHERE a.id < b.id
      |ORDER BY a_id, b_id""".stripMargin,
    "d04_simhash_values" -> s"""
      |WITH $augmentedSql,
      |w AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
      |    ELSE regexp_split_to_array(trim(text), '\\s+') END AS words FROM aug),
      |dw AS (SELECT DISTINCT doc_id AS id, u AS word
      |  FROM (SELECT doc_id, unnest(words) AS u FROM w)),
      |hb AS (SELECT id, ${hv("word")} AS hvv, unnest(range(0, 16)) AS bit FROM dw),
      |bs AS (SELECT id, bit,
      |    sum(CAST(floor(hvv / pow(2, bit)) AS BIGINT) % 2 * 2 - 1) AS s
      |  FROM hb GROUP BY id, bit)
      |SELECT id, CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, bit) AS BIGINT)
      |  ELSE 0 END) AS BIGINT) AS simhash
      |FROM bs GROUP BY id ORDER BY id""".stripMargin,
    "d05_simhash_pairs" -> s"""
      |WITH $augmentedSql,
      |w AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
      |    ELSE regexp_split_to_array(trim(text), '\\s+') END AS words FROM aug),
      |dw AS (SELECT DISTINCT doc_id AS id, u AS word
      |  FROM (SELECT doc_id, unnest(words) AS u FROM w)),
      |hb AS (SELECT id, ${hv("word")} AS hvv, unnest(range(0, 16)) AS bit FROM dw),
      |bs AS (SELECT id, bit,
      |    sum(CAST(floor(hvv / pow(2, bit)) AS BIGINT) % 2 * 2 - 1) AS s
      |  FROM hb GROUP BY id, bit),
      |sh2 AS (SELECT id, CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, bit) AS BIGINT)
      |  ELSE 0 END) AS BIGINT) AS simhash FROM bs GROUP BY id)
      |SELECT a.id AS a_id, b.id AS b_id,
      |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      |FROM sh2 a JOIN sh2 b ON a.id < b.id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
      |ORDER BY a_id, b_id""".stripMargin,
    "d11_shared_spans" -> s"""
      |WITH $augmentedSql,
      |w AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
      |    ELSE regexp_split_to_array(trim(text), '\\s+') END AS words FROM aug),
      |sh10 AS (SELECT DISTINCT doc_id AS id, s AS sh
      |  FROM (SELECT doc_id, unnest(CASE WHEN len(words) >= 10
      |    THEN list_transform(range(1, len(words) - 8),
      |         i -> array_to_string(words[i:i+9], ' '))
      |    ELSE [] END) AS s FROM w)),
      |hsh10 AS (SELECT DISTINCT id, ${hv60("sh")} AS sh FROM sh10),
      |dupsh AS (SELECT sh FROM (SELECT sh, count(*) AS df_ FROM hsh10 GROUP BY sh)
      |  WHERE df_ >= 2),
      |shr AS (SELECT id, count(*) AS n_shared FROM hsh10
      |  JOIN dupsh ON hsh10.sh = dupsh.sh GROUP BY id),
      |sz AS (SELECT id, count(*) AS n_spans FROM hsh10 GROUP BY id)
      |SELECT a.doc_id,
      |  CAST(coalesce(sz.n_spans, 0) AS BIGINT) AS n_spans,
      |  CAST(coalesce(shr.n_shared, 0) AS BIGINT) AS n_shared,
      |  round(CASE WHEN coalesce(sz.n_spans, 0) > 0
      |    THEN CAST(coalesce(shr.n_shared, 0) AS DOUBLE) / CAST(sz.n_spans AS DOUBLE)
      |    ELSE 0.0 END, 6) AS shared_frac
      |FROM aug a
      |LEFT JOIN sz ON sz.id = a.doc_id
      |LEFT JOIN shr ON shr.id = a.doc_id
      |ORDER BY a.doc_id""".stripMargin,
    "d10_simhash_wide" -> s"""
      |WITH $augmentedSql,
      |w AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
      |    ELSE regexp_split_to_array(trim(text), '\\s+') END AS words FROM aug),
      |dw AS (SELECT DISTINCT doc_id AS id, u AS word
      |  FROM (SELECT doc_id, unnest(words) AS u FROM w)),
      |hb AS (SELECT id, ${hv60("word")} AS hv FROM dw),
      |bs AS (SELECT id, bit, sum(((hv >> bit) & 1) * 2 - 1) AS s
      |  FROM hb, unnest(range(0, 60)) t(bit) GROUP BY id, bit),
      |sh60 AS (SELECT id, CAST(sum(CASE WHEN s > 0
      |    THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
      |  FROM bs GROUP BY id)
      |SELECT a.id AS a_id, b.id AS b_id,
      |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      |FROM sh60 a JOIN sh60 b ON a.id < b.id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      |ORDER BY a_id, b_id""".stripMargin,
    "d22_simhash_reps" -> s"""
      |WITH $augmentedSql,
      |rp AS (SELECT min(doc_id) AS doc_id FROM aug
      |  GROUP BY md5(coalesce(text, ''))),
      |ra AS (SELECT a.doc_id, a.text FROM aug a
      |  JOIN rp ON rp.doc_id = a.doc_id),
      |w AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
      |    ELSE regexp_split_to_array(trim(text), '\\s+') END AS words FROM ra),
      |dw AS (SELECT DISTINCT doc_id AS id, u AS word
      |  FROM (SELECT doc_id, unnest(words) AS u FROM w)),
      |hb AS (SELECT id, ${hv60("word")} AS hv FROM dw),
      |bs AS (SELECT id, bit, sum(((hv >> bit) & 1) * 2 - 1) AS s
      |  FROM hb, unnest(range(0, 60)) t(bit) GROUP BY id, bit),
      |sh60 AS (SELECT id, CAST(sum(CASE WHEN s > 0
      |    THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
      |  FROM bs GROUP BY id)
      |SELECT a.id AS a_id, b.id AS b_id,
      |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      |FROM sh60 a JOIN sh60 b ON a.id < b.id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      |ORDER BY a_id, b_id""".stripMargin,
    "d12_semdedup" -> s"""
      |WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |e AS (SELECT vec_id, v FROM e0
      |  UNION ALL SELECT vec_id + 100000, list_concat([v[1] + 0.1], v[2:])
      |    FROM e0 WHERE vec_id < 100),
      |${graft.vector.VectorPack.ivfCtes},
      |cs AS (SELECT a.vec_id, a.cid,
      |    list_dot_product(e.v, c.cv)
      |      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS csim
      |  FROM asg a JOIN e ON e.vec_id = a.vec_id JOIN c2 c ON c.cid = a.cid),
      |prs AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.csim AS ca, b.csim AS cb
      |  FROM cs a JOIN cs b ON a.cid = b.cid AND a.vec_id < b.vec_id
      |  JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id
      |  WHERE list_dot_product(ea.v, eb.v)
      |    / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) >= 0.98),
      |rem AS (SELECT DISTINCT CASE WHEN ca > cb OR (ca = cb AND a_id > b_id)
      |    THEN a_id ELSE b_id END AS vec_id FROM prs)
      |SELECT cs.vec_id, cs.cid AS centroid_id, round(cs.csim, 6) AS sim_centroid,
      |  CAST(CASE WHEN rem.vec_id IS NOT NULL THEN 0 ELSE 1 END AS BIGINT) AS kept
      |FROM cs LEFT JOIN rem ON rem.vec_id = cs.vec_id
      |ORDER BY cs.vec_id""".stripMargin,
    "d06_embedding_near_dups" -> """
      |WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |e AS (SELECT vec_id, v FROM e0
      |  UNION ALL SELECT vec_id + 100000, list_concat([v[1] + 0.1], v[2:])
      |    FROM e0 WHERE vec_id < 100)
      |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      |  round(list_dot_product(a.v, b.v)
      |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
      |FROM e a JOIN e b ON a.vec_id < b.vec_id
      |WHERE list_dot_product(a.v, b.v)
      |  / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.98
      |ORDER BY a_id, b_id""".stripMargin)
}

package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.core.Tables
import graft.metrics.Evaluation
import graft.sample.Sampling

/** Oracle-checked queries for the vector/kNN/sampling surface over the
  * `embeddings` table (SURVEY.md §2.3 J4, §2.5, §2.9 L2-L4).
  *
  * Similarities are rounded to 6 decimals at the output boundary only;
  * ranking happens on full precision with (sim DESC, neighbor ASC)
  * tie-breaks on both engines.
  */
object VectorPack extends QueryPack {

  private val K = 3

  private def embCast(spark: SparkSession, dir: String): DataFrame =
    // spread scan: feeds the index builds and probe stages, whose
    // per-row vector arithmetic would otherwise run as one task on
    // the single-row-group test parquet (MlPack.features stays raw —
    // MLlib's treeAggregate gets slower on many near-empty partitions)
    Tables(spark, dir).embeddingsSpread
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))

  /** Session-scoped index-build artifacts — the FAISS discipline of
    * training a quantizer ONCE and serving every search from it.
    * Every build is deterministic (md5-ordered samples, exact-decimal
    * Lloyd means), so consuming the artifact is bitwise-identical to
    * building inline, and v10/v12/v13 stop re-training the same
    * k-means three times per session. */
  private[vector] def ivfCentroidsArtifact(spark: SparkSession, dir: String): DataFrame =
    graft.core.Artifacts.memo(spark, s"ivf_centroids:$dir")(
      KnnJoin.ivfCentroids(spark, embCast(spark, dir), 16, "42", 2))

  private[vector] def ivfAssignmentsArtifact(spark: SparkSession, dir: String): DataFrame =
    graft.core.Artifacts.memo(spark, s"ivf_assign:$dir")(
      KnnJoin.nearestCentroids(spark, embCast(spark, dir),
        ivfCentroidsArtifact(spark, dir), 1))

  /** The incremental-maintenance fixture split (v25/v26): base =
    * vec_id % 5 ≠ 0 is the STORED index the centroids were trained on;
    * appended = % 5 = 0 is the arriving batch — same distribution, so
    * the drift audit's undrifted case is real data, and the planted-
    * drift case lives in the spec. */
  private[vector] def embBase(spark: SparkSession, dir: String): DataFrame =
    embCast(spark, dir).filter(pmod(col("vec_id"), lit(5L)) =!= 0)
  private[vector] def embAppend(spark: SparkSession, dir: String): DataFrame =
    embCast(spark, dir).filter(pmod(col("vec_id"), lit(5L)) === 0)

  /** Centroids trained ONCE on the base split (pinned 16 lists like
    * v10's artifact) — the frozen quantizer the incremental appends
    * assign against. */
  private[vector] def ivfBaseCentroidsArtifact(spark: SparkSession,
                                               dir: String): DataFrame =
    graft.core.Artifacts.memo(spark, s"ivf_base_centroids:$dir")(
      KnnJoin.ivfCentroids(spark, embBase(spark, dir), 16, "42", 2))

  private[vector] def pqCodebookArtifact(spark: SparkSession, dir: String): DataFrame =
    graft.core.Artifacts.memo(spark, s"pq_codebook:$dir")(
      KnnJoin.pqCodebook(embCast(spark, dir), 4, 16, 16, "42"))

  private[vector] def pqCodesArtifact(spark: SparkSession, dir: String): DataFrame =
    graft.core.Artifacts.memo(spark, s"pq_codes:$dir")(
      KnnJoin.pqCodes(embCast(spark, dir), pqCodebookArtifact(spark, dir), 4, 16))

  private[vector] def sq8StatsArtifact(spark: SparkSession, dir: String): DataFrame =
    graft.core.Artifacts.memo(spark, s"sq8_stats:$dir")(
      KnnJoin.sq8Stats(embCast(spark, dir)))

  /** Session-memoized member SEARCH result (standard projection +
    * ordering applied before the memo, so every consumer reads the
    * finished frame). Each of the six deterministic ANN searches is
    * computed ONCE per session — by whichever consumer runs first; in
    * the bench's sorted sweep that is the member's own query row, so
    * the member keeps its honestly measured search cost — and v21's
    * recall report then reads the persisted results instead of
    * re-running all six searches (round-8 verdict: re-running made
    * v21's scale class straddle the superlinear bound by inheriting
    * pinned v13's noise, and cost ~7 s per bench run). The bench's
    * retry instrument stays honest via [[graft.core.Artifacts]] scope
    * tracking: a retried member drops and rebuilds its own search
    * memo rather than reading it back. */
  private def memoSearch(spark: SparkSession, dir: String, name: String)
      (build: DataFrame => DataFrame): DataFrame =
    graft.core.Artifacts.memo(spark, s"search_$name:$dir") {
      build(Tables(spark, dir).embeddingsSpread)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("query_id"), col("rank"))
    }

  /** J4: exact top-3 cosine (raw IP — the oracle mirrors it) kNN,
    * served from the session-memoized self-join artifact. */
  def knnTop3(spark: SparkSession, dir: String): DataFrame =
    KnnJoin.exactSelfTop3(spark, dir)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sim"), 6).as("sim"))
      .orderBy(col("query_id"), col("rank"))

  /** L4: top-1 neighbor's label as the prediction (leave-self-out);
    * rank 1 of the memoized top-3 IS the k=1 result. */
  def knnClassify(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    KnnJoin.exactSelfTop3(spark, dir).filter(col("rank") === 1)
      .join(e.select(col("vec_id").as("query_id"),
        col("label").as("true_label")), Seq("query_id"))
      .select(col("query_id").as("vec_id"),
        col("true_label").cast("long").as("true_label"),
        col("n_label").cast("long").as("pred_label"),
        when(col("true_label") === col("n_label"), 1L).otherwise(0L).as("correct"))
      .orderBy(col("vec_id"))
  }

  /** A5-over-kNN: per-label accuracy + Overall rollup row. */
  def knnAccuracyByLabel(spark: SparkSession, dir: String): DataFrame =
    Evaluation.accuracyTable(knnClassify(spark, dir),
        col("true_label").cast("string"), col("correct"))
      .orderBy(col("field"))

  /** L2: norms before/after normalization. */
  def norms(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).embeddings
      .select(col("vec_id"),
        round(VectorOps.norm(col("embedding")), 6).as("norm_before"),
        round(VectorOps.norm(VectorOps.l2Normalize(col("embedding"))), 6)
          .as("norm_after"))
      .orderBy(col("vec_id"))

  /** Cosine between consecutive vector ids (zip_with dot exercise). */
  def cosinePairs(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val a = t.embeddings.select(col("vec_id"), col("embedding").as("ea"))
    val b = t.embeddings.select((col("vec_id") - 1).as("vec_id"),
      col("embedding").as("eb"))
    a.join(b, Seq("vec_id"))
      .select(col("vec_id"),
        round(VectorOps.cosine(col("ea"), col("eb")), 6).as("cos_next"))
      .orderBy(col("vec_id"))
  }

  /** M1: 10-per-label deterministic balanced sample. */
  def sampleByLabel(spark: SparkSession, dir: String): DataFrame =
    Sampling.balancedSample(
        Tables(spark, dir).embeddings.select(col("vec_id"), col("label")),
        col("label"), 10, col("vec_id"))
      .select(col("vec_id"), col("label").cast("long").as("label"))
      .orderBy(col("label"), col("vec_id"))

  /** M3: anti-leakage split of documents at the source level. */
  def docSplit(spark: SparkSession, dir: String): DataFrame =
    Sampling.docSplit(
        Tables(spark, dir).documents.select(col("doc_id"), col("source")),
        col("source"), 0.8)
      .select(col("doc_id"), col("source"), col("split"))
      .orderBy(col("doc_id"))

  /** M2: deterministic ROW-level split — md5(seed ‖ key) fraction
    * threshold, so the assignment is partition- and cluster-size-
    * independent ([[Sampling.hashSplit]]). Split counts ride along so
    * the oracle checks the fraction landed, not just the labels. */
  def rowSplit(spark: SparkSession, dir: String): DataFrame = {
    val split = Sampling.hashSplit(
      Tables(spark, dir).documents.select(col("doc_id")),
      col("doc_id"), 0.8)
    val counts = split.groupBy(col("split"))
      .agg(count(lit(1)).as("split_n"))
    split.join(broadcast(counts), Seq("split"))
      .select(col("doc_id"), col("split"), col("split_n"))
      .orderBy(col("doc_id"))
  }

  /** M4: fixed-size deterministic sample — top-25 docs in
    * md5(seed ‖ key) order ([[Sampling.fixedSample]]; the reference
    * carves ~100-doc eval sets this way, `email_717.py`). */
  def fixedSample(spark: SparkSession, dir: String): DataFrame =
    Sampling.fixedSample(
        Tables(spark, dir).documents.select(col("doc_id"), col("n_chars")),
        25, col("doc_id"))
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** F23: per-query softmax-ish score normalization over top-k, via
    * exact decimal sums so the denominator is order-independent. */
  def topkSoftmax(spark: SparkSession, dir: String): DataFrame = {
    // rescale works on the FULL-precision sim and rounds once at the
    // boundary: rounding an already-rounded value creates exact
    // half-way ties where the engines' round() implementations
    // legitimately disagree.
    val hits = KnnJoin.exactSelfTop3(spark, dir)
      .withColumn("simd", round(col("sim"), 6).cast("decimal(18,6)"))
    val w = Window.partitionBy(col("query_id"))
    hits
      .withColumn("total", sum(col("simd")).over(w).cast("decimal(28,6)"))
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        when(col("total") =!= 0,
          col("simd").cast("double") / col("total").cast("double"))
          .as("p"),
        round(VectorOps.rescale01(col("sim")), 6).as("sim_rescaled"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** v01 through the CUSTOM PLAN NODE (KnnJoinPlan/KnnJoinExec) —
    * the physical operator under the same oracle as the helper
    * implementations. Registers the planner strategy idempotently. */
  def knnPlanNode(spark: SparkSession, dir: String): DataFrame = {
    if (!spark.experimental.extraStrategies.contains(graft.plans.KnnJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.KnnJoinStrategy
    // spread scan: the exec's per-partition heap loop runs in the
    // query side's scan stage (quadratic work, one task raw)
    val e = Tables(spark, dir).embeddingsSpread
    graft.plans.KnnJoinPlan.knnJoin(spark, e, e, K)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sim"), 6).as("sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** v01 written the NAIVE way (cross join + window rank) and left to
    * [[graft.plans.KnnRewriteRule]] to rewrite into the broadcast-heap
    * operator — the optimizer rule under the same oracle as v01. */
  def knnRuleRewrite(spark: SparkSession, dir: String): DataFrame = {
    if (!spark.experimental.extraStrategies.contains(graft.plans.KnnJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.KnnJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(graft.plans.KnnRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.KnnRewriteRule
    val e = Tables(spark, dir).embeddingsSpread
    val q = e.select(col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("q_emb"))
    val n = e.select(col("vec_id").as("neighbor_id"),
      col("embedding").cast("array<double>").as("n_emb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    q.join(n, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", VectorOps.dot(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("sim"), 6).as("sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF approximate kNN. "Approximate" refers to recall vs exact
    * kNN, not to nondeterminism — every stage (hash-ordered centroid
    * sample, argmax assignment, probing, rerank) is deterministic, so
    * the full pipeline replays in SQL and v10 is oracle-checked like
    * the exact variants (recall itself is asserted in IvfSpec). */
  def ivf(spark: SparkSession, dir: String): DataFrame =
    memoSearch(spark, dir, "ivf") { e =>
      KnnJoin.approxIvf(spark, e, e, K,
        centroidsOpt = Some(ivfCentroidsArtifact(spark, dir)),
        assignmentsOpt = Some(ivfAssignmentsArtifact(spark, dir)))
    }

  /** PQ approximate kNN — like v10, "approximate" means recall vs
    * exact, not nondeterminism: the full pipeline (per-subspace seed
    * sample, Lloyd refinement, code assignment, asymmetric-distance
    * candidates, exact rerank) replays in SQL and v12 is
    * oracle-checked; recall is asserted in PqSpec. */
  def pq(spark: SparkSession, dir: String): DataFrame =
    memoSearch(spark, dir, "pq") { e =>
      KnnJoin.approxPq(spark, e, e, K,
        centsOpt = Some(pqCodebookArtifact(spark, dir)),
        codesOpt = Some(pqCodesArtifact(spark, dir)))
    }

  /** IVF-PQ composition (FAISS `IndexIVFPQ` shape): coarse lists
    * prune, PQ codes score within probed lists, exact rerank — every
    * stage deterministic, so v13 replays under the full oracle like
    * v10/v12; recall vs exact is asserted in the IvfPq spec. */
  def ivfPq(spark: SparkSession, dir: String): DataFrame =
    memoSearch(spark, dir, "ivfpq") { e =>
      KnnJoin.approxIvfPq(spark, e, e, K,
        centroidsOpt = Some(ivfCentroidsArtifact(spark, dir)),
        assignmentsOpt = Some(ivfAssignmentsArtifact(spark, dir)),
        centsOpt = Some(pqCodebookArtifact(spark, dir)),
        codesOpt = Some(pqCodesArtifact(spark, dir)))
    }

  /** v15: SQ8 scalar-quantized kNN — the 4×-compression member of the
    * index ladder ([[KnnJoin.approxSq8]]): per-dimension 8-bit linear
    * quantization, asymmetric scoring against reconstructed vectors,
    * exact top-20 rerank. Deterministic end to end (no
    * transcendentals), so the full pipeline — including the min/max
    * "training" — replays in the SQL oracle; recall is asserted in
    * the Sq8 spec. */
  def sq8(spark: SparkSession, dir: String): DataFrame =
    memoSearch(spark, dir, "sq8") { e =>
      KnnJoin.approxSq8(spark, e, e, K,
        statsOpt = Some(sq8StatsArtifact(spark, dir)))
    }

  /** v16: IVF-SQ8 composition — coarse lists prune, SQ8-reconstructed
    * vectors score within probed lists only, exact rerank
    * ([[KnnJoin.approxIvfSq8]]). Deterministic end to end like
    * v10/v13/v15, so the full pipeline replays under the composed SQL
    * oracle. */
  def ivfSq8(spark: SparkSession, dir: String): DataFrame =
    memoSearch(spark, dir, "ivfsq8") { e =>
      KnnJoin.approxIvfSq8(spark, e, e, K,
        centroidsOpt = Some(ivfCentroidsArtifact(spark, dir)),
        assignmentsOpt = Some(ivfAssignmentsArtifact(spark, dir)),
        statsOpt = Some(sq8StatsArtifact(spark, dir)))
    }

  /** v19: IVF with the AUTO list count (nCentroids unspecified →
    * ⌈√n⌉, the measured FAISS sizing rule from the 10× run) — the
    * production configuration, under the same full-replay oracle as
    * v10 (the seed-sample LIMIT becomes a count subquery). v13/v10
    * keep their pinned small-corpus parameters; this query is the
    * in-suite contrast that scales gracefully where the pinned forms
    * degrade by design (SCALE_r*.json shows both). */
  def ivfAuto(spark: SparkSession, dir: String): DataFrame =
    memoSearch(spark, dir, "ivf_auto") { _ =>
      val e = embCast(spark, dir)
      KnnJoin.approxIvf(spark, e, e, K)
    }

  /** v25: INCREMENTAL IVF index maintenance
    * ([[KnnJoin.incrementalAssign]] — the r13 verdict's #2 item): the
    * appended batch assigns to the centroids trained on the BASE
    * split, one broadcast-centroid map-side pass, no retrain; output
    * is each appended vector's (centroid_id, residual). The oracle
    * replays the WHOLE chain from scratch in SQL — seed sample + two
    * Lloyd iterations over the base, then the appended rows' argmax
    * assignment — which IS the incremental ≡ rebuilt-assignment proof:
    * assignment is per-row independent and deterministic, so the
    * maintained index equals a from-scratch assignment pass against
    * the same frozen centroids (the search-level twin is spec-pinned
    * in VectorSpec). */
  def ivfIncremental(spark: SparkSession, dir: String): DataFrame =
    KnnJoin.assignmentResiduals(spark, embAppend(spark, dir),
        ivfBaseCentroidsArtifact(spark, dir))
      .select(col("vec_id"), col("centroid_id"),
        round(col("residual"), 6).as("residual"))
      .orderBy(col("vec_id"))

  /** v26: the incremental index's RETRAIN TRIGGER
    * ([[KnnJoin.centroidDriftAudit]] — the p05 one-sided audit applied
    * to centroid residuals): build-time residual p95 over the base
    * split is the published design point; the appended batch's p95 is
    * re-sketched live (≤1000 histogram rows through the shuffle,
    * nothing sorts the residual relation); `recalibrate` fires only
    * when live coverage is provably WORSE than both error bounds
    * allow. On this fixture the append is same-distribution, so the
    * hash-checked answer is the quiet case; the spec plants a shifted
    * distribution and pins the trigger firing. */
  def ivfDrift(spark: SparkSession, dir: String): DataFrame = {
    val cents = ivfBaseCentroidsArtifact(spark, dir)
    def res(df: DataFrame) =
      KnnJoin.assignmentResiduals(spark, df, cents)
        .select(round(col("residual"), 6).as("residual"))
    KnnJoin.centroidDriftAudit(res(embBase(spark, dir)),
        res(embAppend(spark, dir)))
      .orderBy(col("metric"))
  }

  /** v20: the SHARDED exact escape under v01's oracle — the scale
    * path for flat search when the index outgrows one broadcast
    * (per-shard broadcast heap top-k, union, global re-rank; results
    * are exactly the unsharded answer, which is the point). */
  def knnSharded(spark: SparkSession, dir: String): DataFrame = {
    // one projection carries embedding AND label: re-joining the raw
    // table to re-attach the label would pay a second scan + shuffle
    val e = Tables(spark, dir).embeddingsSpread
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"), col("label"))
    KnnJoin.exactSharded(spark, e, e, K, nShards = 4)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sim"), 6).as("sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** v21: the index-family recall report — recall@3 of every
    * deterministic ANN member against the exact top-3, as ONE
    * hash-checked query (the FAISS benchmark table, in-suite and
    * per-round instead of a spec number at one SF). All members read
    * the session quantizer artifacts AND the session-memoized search
    * results ([[memoSearch]]), so v21's own cost is the recall joins
    * — member search cost is measured once, in each member's own
    * bench row, not re-paid (and re-noised) here. The `exact` row is
    * the 1.0 anchor — if IT moves, the harness itself broke. */
  def indexRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = knnTop3(spark, dir)
      .select(col("query_id"), col("neighbor_id"))
    val total = exact.agg(count(lit(1)).as("total"))
    def hitsOf(name: String, df: DataFrame): DataFrame =
      df.select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("hits"))
        .select(lit(name).as("method"), col("hits"))
    val members: Seq[(String, DataFrame)] = Seq(
      "exact" -> knnTop3(spark, dir),
      "ivf" -> ivf(spark, dir),
      "ivf_auto" -> ivfAuto(spark, dir),
      "ivfpq" -> ivfPq(spark, dir),
      "ivfsq8" -> ivfSq8(spark, dir),
      "pq" -> pq(spark, dir),
      "sq8" -> sq8(spark, dir))
    members.map { case (n, df) => hitsOf(n, df) }
      .reduce(_ unionByName _)
      .crossJoin(broadcast(total))
      .select(col("method"), col("hits"), col("total"),
        round(col("hits").cast("double") / col("total").cast("double"), 6)
          .as("recall"))
      .orderBy(col("method"))
  }

  /** v22: k-means cluster report — the corpus-cartography table that
    * clustering-driven curation reads first (SemDeDup partitions by
    * exactly these clusters; domain-discovery and DoReMi-style
    * mixture work start from cluster sizes and purity): per cluster,
    * its size, corpus share, mean dot-product to the centroid (the
    * coherence number — low means a junk-drawer cluster), the modal
    * label, and that label's fraction (purity against the existing
    * labeling). Consumes the SESSION quantizer artifacts
    * ([[ivfCentroidsArtifact]]/[[ivfAssignmentsArtifact]]) — the same
    * trained-once k-means v10/v13/d12 serve from, so the report is
    * free of re-training and the oracle replays the identical Lloyd
    * chain. Scale shape: one broadcast join against the 16-row
    * centroid relation, per-row dots rounded at 9 decimals and
    * decimal-summed (order-independent), both aggregations partial
    * map-side; the modal-label window runs over cluster×label COUNTS
    * (bounded by k·\|labels\|), never corpus rows. */
  def clusterReport(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddingsSpread
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        col("label"))
    val cent = ivfCentroidsArtifact(spark, dir)
      .select(col("centroid_id"), col("embedding").as("cv"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    val joined = graft.core.Caches.transient(
      ivfAssignmentsArtifact(spark, dir).join(emb, Seq("vec_id"))
        .join(broadcast(cent), Seq("centroid_id"))
        .select(col("centroid_id"), col("label"),
          round(VectorOps.dot(col("v"), col("cv")), 9)
            .cast("decimal(28,9)").as("dot")))
    val g = joined.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n"), sum(col("dot")).as("s"))
    val lb = joined.groupBy(col("centroid_id"), col("label"))
      .agg(count(lit(1)).as("c"))
    val top = lb.withColumn("rn", row_number().over(Window
        .partitionBy(col("centroid_id"))
        .orderBy(col("c").desc, col("label"))))
      .filter(col("rn") === 1)
    val tot = g.agg(sum(col("n")).as("tot"))
    g.join(top, Seq("centroid_id")).crossJoin(broadcast(tot))
      .select(col("centroid_id"), col("n").as("size"),
        round(d(col("n")) / d(col("tot")), 6).as("share"),
        round(d(col("s")) / d(col("n")), 6).as("mean_dot"),
        col("label").cast("long").as("top_label"),
        round(d(col("c")) / d(col("n")), 6).as("purity"))
      .orderBy(col("centroid_id"))
  }

  /** v23: PROTOTYPICALITY-based data pruning (Sorscher et al. 2022,
    * "Beyond neural scaling laws: beating power law scaling via data
    * pruning") — in the abundant-data regime the best examples to
    * DROP are the easiest, most prototypical ones: the paper's
    * self-supervised metric is exactly the margin to the k-means
    * centroid. Per vector: its cluster, the 9-dp dot to the centroid
    * (the prototypicality score), its within-cluster rank (1 = most
    * prototypical, ties broken by vec_id), and `pruned` — true for
    * the top 25% most prototypical of each cluster (the keep-hard
    * policy; flip the flag for the scarce-data keep-easy regime).
    * Consumes the SESSION quantizer artifacts (the v22 discipline),
    * so no re-training and the oracle replays the identical Lloyd
    * chain. Scale shape: one broadcast join against the 16-row
    * centroid relation; the rank window partitions by cluster —
    * with the auto-⌈√n⌉ quantizer (v19) cluster sizes are O(√n), so
    * no partition grows linearly; for threshold-only use at extreme
    * scale the per-cluster cut takes the a20 collapsed-count path
    * (9-dp score domain) instead of materializing ranks. */
  def prototypePruning(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddingsSpread
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cent = ivfCentroidsArtifact(spark, dir)
      .select(col("centroid_id"), col("embedding").as("cv"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    val joined = graft.core.Caches.transient(
      ivfAssignmentsArtifact(spark, dir).join(emb, Seq("vec_id"))
        .join(broadcast(cent), Seq("centroid_id"))
        .select(col("vec_id"), col("centroid_id"),
          round(VectorOps.dot(col("v"), col("cv")), 9).as("dot")))
    val sizes = joined.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("centroid_id"))
      .orderBy(col("dot").desc, col("vec_id"))
    joined.withColumn("rk", row_number().over(w))
      .join(broadcast(sizes), Seq("centroid_id"))
      .select(col("vec_id"), col("centroid_id"),
        round(col("dot"), 6).as("proto_score"),
        col("rk").cast("long").as("proto_rank"),
        (col("rk") <= ceil(d(col("n")) * 0.25)).as("pruned"))
      .orderBy(col("vec_id"))
  }

  /** v14: contrastive triplet mining over the augmented vectors —
    * every planted near-dup pair yields two (anchor, positive, hard
    * negative) training rows; the hard negative is the anchor's most
    * similar same-cluster non-duplicate ([[SemDedup
    * .contrastiveTriplets]]). */
  def contrastive(spark: SparkSession, dir: String): DataFrame = {
    val (cents, asg) = graft.dedup.DedupPack.augIvfArtifacts(spark, dir)
    SemDedup.contrastiveTriplets(spark,
        graft.dedup.DedupPack.augmentedVectors(spark, dir), 0.98,
        centroidsOpt = Some(cents), assignmentsOpt = Some(asg))
      .orderBy(col("anchor"), col("pos_id"))
  }

  /** v24: the CORPUS-SCALE form of v14 — the same triplet mining with
    * the auto-⌈√n⌉ quantizer (`nClusters = 0` resolves through
    * [[KnnJoin.resolveNlist]], the v19 rule): at fixed k the
    * within-cluster pair space Σ|c|² is n²/k (v14's measured linear
    * slope at 10×); at ⌈√n⌉ clusters it is n^1.5 with O(√n) rows per
    * cluster — the SemDeDup paper's own design point. Pinned k=16
    * (v14) stays the oracle-contrast form, exactly the v19-beside-v10
    * pattern; the artifacts memo keys on every build parameter, so the
    * two quantizers never serve each other's frames. */
  def contrastiveAuto(spark: SparkSession, dir: String): DataFrame = {
    val (cents, asg) = SemDedup.ivfArtifacts(spark, s"aug:$dir",
      graft.dedup.DedupPack.augmentedVectors(spark, dir), nClusters = 0)
    SemDedup.contrastiveTriplets(spark,
        graft.dedup.DedupPack.augmentedVectors(spark, dir), 0.98,
        nClusters = 0, centroidsOpt = Some(cents), assignmentsOpt = Some(asg))
      .orderBy(col("anchor"), col("pos_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v14_contrastive_triplets" -> contrastive,
    "v24_triplets_auto" -> contrastiveAuto,
    "v09_knn_plan_node" -> knnPlanNode,
    "v10_knn_ivf" -> ivf,
    "v12_knn_pq" -> pq,
    "v11_knn_rule_rewrite" -> knnRuleRewrite,
    "v01_knn_top3" -> knnTop3,
    "v02_knn_classify" -> knnClassify,
    "v03_knn_accuracy_by_label" -> knnAccuracyByLabel,
    "v04_norms" -> norms,
    "v05_cosine_pairs" -> cosinePairs,
    "v06_sample_by_label" -> sampleByLabel,
    "v07_doc_split" -> docSplit,
    "v08_topk_softmax" -> topkSoftmax,
    "v13_knn_ivfpq" -> ivfPq,
    "v15_knn_sq8" -> sq8,
    "v16_knn_ivfsq8" -> ivfSq8,
    "v17_row_split" -> rowSplit,
    "v18_fixed_sample" -> fixedSample,
    "v19_knn_ivf_auto" -> ivfAuto,
    "v20_knn_sharded" -> knnSharded,
    "v25_ivf_incremental" -> ivfIncremental,
    "v26_ivf_drift" -> ivfDrift,
    "v21_index_recall" -> indexRecall,
    "v22_cluster_report" -> clusterReport,
    "v23_prototype_pruning" -> prototypePruning)

  override val artifacts: Map[String, (SparkSession, String) => DataFrame] =
    Map("knn_self_top3" -> ((s, d) => KnnJoin.exactSelfTop3(s, d)),
      "ivf_centroids" -> ivfCentroidsArtifact,
      "ivf_assign" -> ivfAssignmentsArtifact,
      "pq_codebook" -> pqCodebookArtifact,
      "pq_codes" -> pqCodesArtifact,
      "sq8_stats" -> sq8StatsArtifact)

  private val knnCte = s"""
    |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
    |p AS (SELECT q.vec_id AS qid, n.vec_id AS nid, n.label AS nlabel,
    |        list_dot_product(q.v, n.v) AS sim
    |      FROM e q JOIN e n ON q.vec_id <> n.vec_id),
    |r AS (SELECT qid, nid, nlabel, sim,
    |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
    |      FROM p)""".stripMargin

  private val oracles0: Map[String, String] = Map(
    "v01_knn_top3" -> s"""
      |WITH $knnCte
      |SELECT qid AS query_id, CAST(rnk AS BIGINT) AS rank, nid AS neighbor_id,
      |  round(sim, 6) AS sim
      |FROM r WHERE rnk <= $K ORDER BY query_id, rank""".stripMargin,
    "v02_knn_classify" -> s"""
      |WITH $knnCte
      |SELECT r.qid AS vec_id, CAST(e.label AS BIGINT) AS true_label,
      |  CAST(r.nlabel AS BIGINT) AS pred_label,
      |  CASE WHEN e.label = r.nlabel THEN 1 ELSE 0 END AS correct
      |FROM r JOIN e ON e.vec_id = r.qid WHERE r.rnk = 1
      |ORDER BY vec_id""".stripMargin,
    "v03_knn_accuracy_by_label" -> s"""
      |WITH $knnCte,
      |c AS (SELECT r.qid, CAST(e.label AS VARCHAR) AS field,
      |        CASE WHEN e.label = r.nlabel THEN 1 ELSE 0 END AS correct
      |      FROM r JOIN e ON e.vec_id = r.qid WHERE r.rnk = 1)
      |SELECT coalesce(field, 'Overall') AS field,
      |  CAST(sum(correct) AS BIGINT) AS correct,
      |  count(*) AS support,
      |  CAST(CAST(sum(correct) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS accuracy
      |FROM c GROUP BY ROLLUP(field) ORDER BY field""".stripMargin,
    "v04_norms" -> """
      |WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (SELECT vec_id, sqrt(list_dot_product(v, v)) AS nb,
      |        CASE WHEN sqrt(list_dot_product(v, v)) = 0 THEN v
      |             ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v))) END AS vn
      |      FROM e)
      |SELECT vec_id, round(nb, 6) AS norm_before,
      |  round(sqrt(list_dot_product(vn, vn)), 6) AS norm_after
      |FROM n ORDER BY vec_id""".stripMargin,
    "v05_cosine_pairs" -> """
      |WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      |SELECT a.vec_id,
      |  round(list_dot_product(a.v, b.v)
      |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_next
      |FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
      |ORDER BY a.vec_id""".stripMargin,
    "v06_sample_by_label" -> """
      |WITH r AS (SELECT vec_id, label,
      |  row_number() OVER (PARTITION BY label
      |    ORDER BY md5('42' || CAST(vec_id AS VARCHAR)), vec_id) AS rn
      |  FROM embeddings)
      |SELECT vec_id, CAST(label AS BIGINT) AS label
      |FROM r WHERE rn <= 10 ORDER BY label, vec_id""".stripMargin,
    "v07_doc_split" -> """
      |SELECT doc_id, source,
      |  CASE WHEN substr(md5('42' || source), 1, 4) < 'cccd' THEN 'train'
      |       ELSE 'test' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin,
    "v17_row_split" -> """
      |WITH s AS (SELECT doc_id,
      |    CASE WHEN substr(md5('42' || CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
      |         THEN 'train' ELSE 'test' END AS split
      |  FROM documents),
      |c AS (SELECT split, count(*) AS split_n FROM s GROUP BY split)
      |SELECT s.doc_id, s.split, c.split_n
      |FROM s JOIN c USING (split) ORDER BY s.doc_id""".stripMargin,
    "v18_fixed_sample" -> """
      |SELECT doc_id, n_chars FROM (
      |  SELECT doc_id, n_chars FROM documents
      |  ORDER BY md5('42' || CAST(doc_id AS VARCHAR)), doc_id LIMIT 25)
      |ORDER BY doc_id""".stripMargin,
    "v08_topk_softmax" -> s"""
      |WITH $knnCte,
      |k AS (SELECT qid, rnk, nid, CAST(round(sim, 6) AS DECIMAL(18,6)) AS simd,
      |        sim
      |      FROM r WHERE rnk <= $K),
      |t AS (SELECT qid, CAST(sum(simd) AS DECIMAL(28,6)) AS total FROM k GROUP BY qid)
      |SELECT k.qid AS query_id, CAST(k.rnk AS BIGINT) AS rank, k.nid AS neighbor_id,
      |  CASE WHEN t.total <> 0
      |    THEN CAST(k.simd AS DOUBLE) / CAST(t.total AS DOUBLE) END AS p,
      |  round((1.0 + k.sim) / 2.0, 6) AS sim_rescaled
      |FROM k JOIN t ON k.qid = t.qid
      |ORDER BY query_id, rank""".stripMargin)

  /** The IVF pipeline replayed in SQL, k-means included: same centroid
    * sample (md5 order), two Lloyd iterations with per-dimension means
    * summed through exact DECIMAL(28,18) (order-independent — the same
    * casts the Spark side uses), same argmax/probe tie-breaks (dot
    * desc, id asc), same rerank — mirrors `KnnJoin.approxIvf` defaults
    * (16 centroids, 4 probes, seed 42, 2 Lloyd iterations). */
  private[graft] def lloydIterSql(inCentroids: String, i: Int): String = s"""
    |s$i AS (SELECT e.vec_id, c.cid,
    |    row_number() OVER (PARTITION BY e.vec_id
    |      ORDER BY list_dot_product(e.v, c.cv) DESC, c.cid) AS rn
    |  FROM e, $inCentroids c),
    |a$i AS (SELECT vec_id, cid FROM s$i WHERE rn = 1),
    |x$i AS (SELECT a.cid, unnest(e.v) AS x, generate_subscripts(e.v, 1) AS d
    |  FROM a$i a JOIN e ON e.vec_id = a.vec_id),
    |m$i AS (SELECT cid, d,
    |    CAST(sum(CAST(x AS DECIMAL(28,18))) AS DOUBLE)
    |      / CAST(count(*) AS DOUBLE) AS m
    |  FROM x$i GROUP BY cid, d),
    |c$i AS (SELECT cid, list(m ORDER BY d) AS cv FROM m$i GROUP BY cid)""".stripMargin

  private val eCte =
    "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"

  /** The IVF coarse-quantizer chain (seed sample → 2 Lloyd iters →
    * assignments + probes) — shared by the v10 and v13 oracles. */
  /** Shared with the d12 SemDeDup oracle (same chain over its
    * augmented `e` relation) — the CTE names only assume an
    * `e(vec_id, v)` CTE in scope. */
  /** IVF chain with a parameterizable seed-sample size — `limitSql`
    * is a SQL expression (a literal for the pinned oracles, a count
    * subquery for v19's auto-sized form). */
  private[graft] def ivfCtesWith(limitSql: String) = s"""
    |c0 AS (SELECT vec_id AS cid, v AS cv FROM e
    |      ORDER BY md5('42' || CAST(vec_id AS VARCHAR)), vec_id LIMIT $limitSql),
    |${lloydIterSql("c0", 1)},
    |${lloydIterSql("c1", 2)},
    |scored AS (SELECT e.vec_id, c.cid,
    |    row_number() OVER (PARTITION BY e.vec_id
    |      ORDER BY list_dot_product(e.v, c.cv) DESC, c.cid) AS rn
    |  FROM e, c2 c),
    |asg AS (SELECT vec_id, cid FROM scored WHERE rn = 1),
    |probes AS (SELECT vec_id AS qid, cid FROM scored WHERE rn <= 4)""".stripMargin

  /** The pinned 16-list form the v10/v12/v13/d12 oracles share. */
  private[graft] val ivfCtes = ivfCtesWith("16")

  private def ivfSqlWith(ctes: String) = s"""
    |WITH $eCte,
    |$ctes,
    |cand AS (SELECT p.qid, a.vec_id AS nid
    |  FROM probes p JOIN asg a ON a.cid = p.cid WHERE a.vec_id <> p.qid),
    |r AS (SELECT cand.qid, cand.nid, list_dot_product(q.v, n.v) AS sim,
    |    row_number() OVER (PARTITION BY cand.qid
    |      ORDER BY list_dot_product(q.v, n.v) DESC, cand.nid) AS rnk
    |  FROM cand JOIN e q ON q.vec_id = cand.qid JOIN e n ON n.vec_id = cand.nid)
    |SELECT qid AS query_id, CAST(rnk AS BIGINT) AS rank, nid AS neighbor_id,
    |  round(sim, 6) AS sim
    |FROM r WHERE rnk <= $K ORDER BY query_id, rank""".stripMargin

  private val ivfSql = ivfSqlWith(ivfCtes)

  /** v19: same replay with the ⌈√n⌉ seed-sample subquery. */
  private val ivfAutoSql = ivfSqlWith(ivfCtesWith(
    "(SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM e)"))

  /** v25/v26: the Lloyd chain trained on the BASE split only (`e` is
    * filtered), the appended rows assigned from scratch against the
    * frozen `c2` centroids — the incremental ≡ rebuilt proof. */
  private val eBaseCte =
    "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v " +
      "FROM embeddings WHERE vec_id % 5 <> 0)"
  private val qAppendCte =
    "qa AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v " +
      "FROM embeddings WHERE vec_id % 5 = 0)"
  private def residOf(v: String, c: String): String =
    s"list_dot_product($v, $v) - 2*list_dot_product($v, $c) " +
      s"+ list_dot_product($c, $c)"

  private val ivfIncrementalSql = s"""
    |WITH $eBaseCte,
    |$ivfCtes,
    |$qAppendCte,
    |sq AS (SELECT qa.vec_id, c.cid,
    |    ${residOf("qa.v", "c.cv")} AS resid,
    |    row_number() OVER (PARTITION BY qa.vec_id
    |      ORDER BY list_dot_product(qa.v, c.cv) DESC, c.cid) AS rn
    |  FROM qa, c2 c)
    |SELECT vec_id, CAST(cid AS BIGINT) AS centroid_id,
    |  round(resid, 6) AS residual
    |FROM sq WHERE rn = 1 ORDER BY vec_id""".stripMargin

  /** v26: build/live residual relations, the shared histogram-sketch
    * CTE per side, and the one-sided trigger arithmetic. */
  private val ivfDriftSql = s"""
    |WITH $eBaseCte,
    |$ivfCtes,
    |$qAppendCte,
    |vbr AS (SELECT round(${residOf("e.v", "c.cv")}, 6) AS x
    |  FROM asg JOIN e ON e.vec_id = asg.vec_id JOIN c2 c ON c.cid = asg.cid),
    |vlq AS (SELECT qa.vec_id, c.cid, ${residOf("qa.v", "c.cv")} AS resid,
    |    row_number() OVER (PARTITION BY qa.vec_id
    |      ORDER BY list_dot_product(qa.v, c.cv) DESC, c.cid) AS rn
    |  FROM qa, c2 c),
    |vlr AS (SELECT round(resid, 6) AS x FROM vlq WHERE rn = 1),
    |${graft.core.Sketches.histogramQuantilesCtes("vbr", 1000, Seq(0.95), "vb_")},
    |${graft.core.Sketches.histogramQuantilesCtes("vlr", 1000, Seq(0.95), "vl_")}
    |SELECT 'residual_p95' AS metric, l.q, l.est,
    |  (lb.hi - lb.lo) / 1000.0 AS bin_width,
    |  b.est AS published,
    |  (bb.hi - bb.lo) / 1000.0 AS published_bin_width,
    |  CAST(CASE WHEN l.est > b.est * 1.1 + (lb.hi - lb.lo) / 1000.0
    |      + (bb.hi - bb.lo) / 1000.0 THEN 1 ELSE 0 END AS BIGINT)
    |    AS recalibrate
    |FROM vl_est l CROSS JOIN vl_b lb
    |CROSS JOIN vb_est b CROSS JOIN vb_b bb""".stripMargin

  /** The PQ pipeline replayed in SQL — mirrors `KnnJoin.approxPq`
    * defaults (4 subspaces × 16 dims, 16 centroids/subspace, one
    * Lloyd refinement through DECIMAL(28,18) means, 30 candidates,
    * seed 42). The asymmetric score sums its 4 lookup terms in fixed
    * subspace order on both engines. */
  /** The PQ codebook/code/LUT chain (per-subspace seeds → one Lloyd
    * refinement → codes + query dots) — shared by v12 and v13. */
  private val pqCtes = {
    val m = 4
    val subDim = 16
    val l2 = "list_dot_product(x, x) - 2*list_dot_product(x, cv) + list_dot_product(cv, cv)"
    s"""
    |sub AS (SELECT vec_id, s, v[CAST(s*$subDim+1 AS INT):CAST(s*$subDim+$subDim AS INT)] AS x
    |  FROM e, unnest(range(0, $m)) t(s)),
    |seeds AS (SELECT s, cid, cv FROM (
    |    SELECT s, vec_id AS cid, x AS cv, row_number() OVER (PARTITION BY s
    |      ORDER BY md5('42_' || CAST(s AS VARCHAR) || '_' || CAST(vec_id AS VARCHAR)), vec_id) AS rn
    |    FROM sub) WHERE rn <= 16),
    |a0 AS (SELECT vec_id, s, cid FROM (
    |    SELECT sub.vec_id, sub.s, seeds.cid, row_number() OVER (
    |      PARTITION BY sub.vec_id, sub.s
    |      ORDER BY ${l2.replace("cv", "seeds.cv")}, seeds.cid) AS rn
    |    FROM sub JOIN seeds ON sub.s = seeds.s) WHERE rn = 1),
    |xp AS (SELECT s, cid, generate_subscripts(x, 1) AS d, unnest(x) AS xd
    |  FROM sub JOIN a0 USING (vec_id, s)),
    |cm AS (SELECT s, cid, d,
    |    CAST(sum(CAST(xd AS DECIMAL(28,18))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mn
    |  FROM xp GROUP BY s, cid, d),
    |cent AS (SELECT s, cid, list(mn ORDER BY d) AS cv FROM cm GROUP BY s, cid),
    |codes AS (SELECT vec_id, s, cid FROM (
    |    SELECT sub.vec_id, sub.s, cent.cid, row_number() OVER (
    |      PARTITION BY sub.vec_id, sub.s
    |      ORDER BY ${l2.replace("cv", "cent.cv")}, cent.cid) AS rn
    |    FROM sub JOIN cent ON sub.s = cent.s) WHERE rn = 1),
    |qds AS (SELECT sub.vec_id AS qid, sub.s, cent.cid,
    |    list_dot_product(sub.x, cent.cv) AS qd
    |  FROM sub JOIN cent ON sub.s = cent.s)""".stripMargin
  }

  private val pqApproxSum = (0 until 4)
    .map(s => s"max(CASE WHEN q.s = $s THEN q.qd END)").mkString(" + ")

  private val pqSql = s"""
    |WITH $eCte,
    |$pqCtes,
    |approx AS (SELECT q.qid, c.vec_id, $pqApproxSum AS approx_ip
    |  FROM codes c JOIN qds q ON c.s = q.s AND c.cid = q.cid
    |  WHERE q.qid <> c.vec_id GROUP BY q.qid, c.vec_id),
    |cand AS (SELECT qid, vec_id FROM (
    |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
    |      ORDER BY approx_ip DESC, vec_id) AS crn FROM approx) WHERE crn <= 30),
    |r AS (SELECT cand.qid, cand.vec_id AS nid, list_dot_product(q.v, n.v) AS sim,
    |    row_number() OVER (PARTITION BY cand.qid
    |      ORDER BY list_dot_product(q.v, n.v) DESC, cand.vec_id) AS rnk
    |  FROM cand JOIN e q ON q.vec_id = cand.qid JOIN e n ON n.vec_id = cand.vec_id)
    |SELECT qid AS query_id, CAST(rnk AS BIGINT) AS rank, nid AS neighbor_id,
    |  round(sim, 6) AS sim
    |FROM r WHERE rnk <= $K ORDER BY query_id, rank""".stripMargin

  /** v13: the IVF chain's probed lists restrict the PQ chain's
    * asymmetric scoring (`pl` is the list-membership relation), then
    * the usual candidate cut + exact rerank — mirrors
    * `KnnJoin.approxIvfPq` defaults end-to-end. */
  private val ivfPqSql = s"""
    |WITH $eCte,
    |$ivfCtes,
    |$pqCtes,
    |pl AS (SELECT p.qid, a.vec_id AS nid
    |  FROM probes p JOIN asg a ON a.cid = p.cid WHERE a.vec_id <> p.qid),
    |approx AS (SELECT q.qid, c.vec_id, $pqApproxSum AS approx_ip
    |  FROM codes c JOIN qds q ON c.s = q.s AND c.cid = q.cid
    |  JOIN pl ON pl.qid = q.qid AND pl.nid = c.vec_id
    |  GROUP BY q.qid, c.vec_id),
    |cand AS (SELECT qid, vec_id FROM (
    |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
    |      ORDER BY approx_ip DESC, vec_id) AS crn FROM approx) WHERE crn <= 100),
    |r AS (SELECT cand.qid, cand.vec_id AS nid, list_dot_product(q.v, n.v) AS sim,
    |    row_number() OVER (PARTITION BY cand.qid
    |      ORDER BY list_dot_product(q.v, n.v) DESC, cand.vec_id) AS rnk
    |  FROM cand JOIN e q ON q.vec_id = cand.qid JOIN e n ON n.vec_id = cand.vec_id)
    |SELECT qid AS query_id, CAST(rnk AS BIGINT) AS rank, nid AS neighbor_id,
    |  round(sim, 6) AS sim
    |FROM r WHERE rnk <= $K ORDER BY query_id, rank""".stripMargin

  /** v15 oracle: the whole SQ8 pipeline — min/max train, 8-bit
    * quantize + reconstruct, asymmetric top-20, exact rerank —
    * arithmetic mirrored operation-for-operation (floor-based
    * quantization, so there is no rounding-mode ambiguity). */
  private val sq8Sql = s"""
    |WITH xs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
    |ex AS (SELECT vec_id, generate_subscripts(x, 1) AS d, unnest(x) AS v FROM xs),
    |dims AS (SELECT d, min(v) AS lo, max(v) AS hi FROM ex GROUP BY d),
    |rec AS (SELECT vec_id, list(lo +
    |      (floor((CASE WHEN hi > lo
    |          THEN least(greatest((v - lo) / (hi - lo), 0.0), 1.0)
    |          ELSE 0.0 END) * 255.0 + 0.5) / 255.0) * (hi - lo)
    |      ORDER BY d) AS xhat
    |  FROM ex JOIN dims USING (d) GROUP BY vec_id),
    |ap AS (SELECT q.vec_id AS qid, r.vec_id AS nid,
    |    list_dot_product(q.x, r.xhat) AS approx
    |  FROM xs q JOIN rec r ON q.vec_id <> r.vec_id),
    |cand AS (SELECT qid, nid FROM (
    |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
    |      ORDER BY approx DESC, nid) AS arnk FROM ap) WHERE arnk <= 20),
    |r AS (SELECT cand.qid, cand.nid, list_dot_product(q.x, n.x) AS sim,
    |    row_number() OVER (PARTITION BY cand.qid
    |      ORDER BY list_dot_product(q.x, n.x) DESC, cand.nid) AS rnk
    |  FROM cand JOIN xs q ON q.vec_id = cand.qid JOIN xs n ON n.vec_id = cand.nid)
    |SELECT qid AS query_id, CAST(rnk AS BIGINT) AS rank, nid AS neighbor_id,
    |  round(sim, 6) AS sim
    |FROM r WHERE rnk <= $K ORDER BY query_id, rank""".stripMargin

  /** v16 oracle: the IVF coarse chain composed with SQ8
    * quantize/reconstruct scoring inside probed lists — mirrors
    * [[KnnJoin.approxIvfSq8]] operation-for-operation. */
  private val ivfSq8Sql = s"""
    |WITH $eCte,
    |$ivfCtes,
    |ex8 AS (SELECT vec_id, generate_subscripts(v, 1) AS d, unnest(v) AS xv FROM e),
    |dims AS (SELECT d, min(xv) AS lo, max(xv) AS hi FROM ex8 GROUP BY d),
    |rec AS (SELECT vec_id, list(lo +
    |      (floor((CASE WHEN hi > lo
    |          THEN least(greatest((xv - lo) / (hi - lo), 0.0), 1.0)
    |          ELSE 0.0 END) * 255.0 + 0.5) / 255.0) * (hi - lo)
    |      ORDER BY d) AS xhat
    |  FROM ex8 JOIN dims USING (d) GROUP BY vec_id),
    |pl AS (SELECT p.qid, a.vec_id AS nid
    |  FROM probes p JOIN asg a ON a.cid = p.cid WHERE a.vec_id <> p.qid),
    |ap AS (SELECT pl.qid, pl.nid, list_dot_product(q.v, r.xhat) AS approx
    |  FROM pl JOIN e q ON q.vec_id = pl.qid JOIN rec r ON r.vec_id = pl.nid),
    |cand AS (SELECT qid, nid FROM (
    |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
    |      ORDER BY approx DESC, nid) AS crn FROM ap) WHERE crn <= 100),
    |r2 AS (SELECT cand.qid, cand.nid, list_dot_product(q.v, n.v) AS sim,
    |    row_number() OVER (PARTITION BY cand.qid
    |      ORDER BY list_dot_product(q.v, n.v) DESC, cand.nid) AS rnk
    |  FROM cand JOIN e q ON q.vec_id = cand.qid JOIN e n ON n.vec_id = cand.nid)
    |SELECT qid AS query_id, CAST(rnk AS BIGINT) AS rank, nid AS neighbor_id,
    |  round(sim, 6) AS sim
    |FROM r2 WHERE rnk <= $K ORDER BY query_id, rank""".stripMargin

  /** v09/v11 share v01's oracle: same semantics through the custom
    * plan node and the optimizer-rule rewrite respectively. */
  /** The planted-near-copy augmented vector relation (mirrors
    * `DedupPack.augmentedVectors`) — the v14 oracle's `e`. */
  private val augVecCte = """
    |e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    |e AS (SELECT vec_id, v FROM e0
    |  UNION ALL SELECT vec_id + 100000, list_concat([v[1] + 0.1], v[2:])
    |    FROM e0 WHERE vec_id < 100)""".stripMargin

  /** The triplet-mining replay over the augmented relation — shared by
    * v14 (pinned 16-list chain) and v24 (auto-⌈√n⌉ chain). */
  private def contrastiveSqlWith(ctes: String) = s"""
    |WITH $augVecCte,
    |$ctes,
    |prs AS (SELECT a.vec_id AS anchor, b.vec_id AS cand,
    |    list_dot_product(ea.v, eb.v)
    |      / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) AS cos
    |  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id <> b.vec_id
    |  JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id),
    |pos AS (SELECT anchor, cand AS pos_id, cos AS pos_cos FROM prs WHERE cos >= 0.98),
    |neg AS (SELECT anchor, cand AS neg_id, cos AS neg_cos,
    |    row_number() OVER (PARTITION BY anchor ORDER BY cos DESC, cand) AS rn
    |  FROM prs WHERE cos < 0.98)
    |SELECT p.anchor, p.pos_id, n.neg_id, round(p.pos_cos, 6) AS pos_cos,
    |  round(n.neg_cos, 6) AS neg_cos
    |FROM pos p JOIN neg n ON n.anchor = p.anchor AND n.rn = 1
    |ORDER BY p.anchor, p.pos_id""".stripMargin

  private val contrastiveSql = contrastiveSqlWith(ivfCtes)
  private val contrastiveAutoSql = contrastiveSqlWith(ivfCtesWith(
    "(SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM e)"))

  /** v21 oracle: every member's existing full-replay chain nested as
    * its own scoped subquery (inner WITHs shadow nothing outside), so
    * the recall table reuses the per-member SQL verbatim — one
    * definition per chain, everywhere. */
  private lazy val indexRecallSql = {
    val members = Seq("ivf" -> ivfSql, "ivf_auto" -> ivfAutoSql,
      "ivfpq" -> ivfPqSql, "ivfsq8" -> ivfSq8Sql, "pq" -> pqSql,
      "sq8" -> sq8Sql)
    val rows = members.map { case (n, s) =>
      s"""UNION ALL SELECT '$n' AS method, count(*) AS hits
         |FROM ($s) a JOIN ex ON a.query_id = ex.query_id
         |  AND a.neighbor_id = ex.neighbor_id""".stripMargin
    }.mkString("\n")
    s"""
    |WITH ex AS (SELECT query_id, neighbor_id
    |    FROM (${oracles0("v01_knn_top3")})),
    |tot AS (SELECT count(*) AS total FROM ex),
    |h AS (
    |  SELECT 'exact' AS method, count(*) AS hits FROM ex
    |  $rows
    |)
    |SELECT h.method, h.hits, tot.total,
    |  round(CAST(h.hits AS DOUBLE) / CAST(tot.total AS DOUBLE), 6) AS recall
    |FROM h, tot ORDER BY method""".stripMargin
  }

  /** v22 oracle: the shared IVF Lloyd chain, then per-cluster size /
    * share / decimal-summed mean dot / modal label + purity. */
  private val clusterReportSql = s"""
    |WITH $eCte,
    |$ivfCtes,
    |j AS (SELECT a.cid, emb.label,
    |    CAST(round(list_dot_product(e.v, c.cv), 9) AS DECIMAL(28,9)) AS dot
    |  FROM asg a JOIN e ON e.vec_id = a.vec_id
    |  JOIN c2 c ON c.cid = a.cid
    |  JOIN embeddings emb ON emb.vec_id = a.vec_id),
    |g AS (SELECT cid, count(*) AS n, sum(dot) AS s FROM j GROUP BY cid),
    |lb AS (SELECT cid, label, count(*) AS c FROM j GROUP BY 1, 2),
    |lt AS (SELECT cid, label, c,
    |    row_number() OVER (PARTITION BY cid ORDER BY c DESC, label) AS rn
    |  FROM lb),
    |t AS (SELECT count(*) AS tot FROM e)
    |SELECT g.cid AS centroid_id, CAST(g.n AS BIGINT) AS size,
    |  round(CAST(g.n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS share,
    |  round(CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE), 6) AS mean_dot,
    |  CAST(lt.label AS BIGINT) AS top_label,
    |  round(CAST(lt.c AS DOUBLE) / CAST(g.n AS DOUBLE), 6) AS purity
    |FROM g JOIN lt ON lt.cid = g.cid AND lt.rn = 1, t
    |ORDER BY centroid_id""".stripMargin

  /** v23 oracle: the shared IVF Lloyd chain, per-vector centroid dot,
    * within-cluster prototypicality rank, top-25% prune flag. */
  private val prototypePruningSql = s"""
    |WITH $eCte,
    |$ivfCtes,
    |j AS (SELECT a.vec_id, a.cid,
    |    round(list_dot_product(e.v, c.cv), 9) AS dot
    |  FROM asg a JOIN e ON e.vec_id = a.vec_id JOIN c2 c ON c.cid = a.cid),
    |rk AS (SELECT vec_id, cid, dot,
    |    row_number() OVER (PARTITION BY cid ORDER BY dot DESC, vec_id) AS rk,
    |    count(*) OVER (PARTITION BY cid) AS n
    |  FROM j)
    |SELECT vec_id, CAST(cid AS BIGINT) AS centroid_id,
    |  round(dot, 6) AS proto_score,
    |  CAST(rk AS BIGINT) AS proto_rank,
    |  rk <= ceil(0.25 * n) AS pruned
    |FROM rk ORDER BY vec_id""".stripMargin

  val oracles: Map[String, String] =
    oracles0 +
      ("v23_prototype_pruning" -> prototypePruningSql) +
      ("v22_cluster_report" -> clusterReportSql) +
      ("v21_index_recall" -> indexRecallSql) +
      ("v14_contrastive_triplets" -> contrastiveSql) +
      ("v24_triplets_auto" -> contrastiveAutoSql) +
      ("v09_knn_plan_node" -> oracles0("v01_knn_top3")) +
      ("v11_knn_rule_rewrite" -> oracles0("v01_knn_top3")) +
      ("v20_knn_sharded" -> oracles0("v01_knn_top3")) +
      ("v25_ivf_incremental" -> ivfIncrementalSql) +
      ("v26_ivf_drift" -> ivfDriftSql) +
      ("v10_knn_ivf" -> ivfSql) +
      ("v19_knn_ivf_auto" -> ivfAutoSql) +
      ("v12_knn_pq" -> pqSql) +
      ("v13_knn_ivfpq" -> ivfPqSql) +
      ("v15_knn_sq8" -> sq8Sql) +
      ("v16_knn_ivfsq8" -> ivfSq8Sql)
}

package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication", arXiv:2303.09540) —
  * the embedding-space dedup used on LAION/C4-scale corpora: k-means
  * cluster the embeddings, mine cosine near-duplicate pairs ONLY
  * within clusters, and per duplicate pair keep the member FARTHEST
  * from its cluster centroid (the paper's §3 keeper rule — low
  * centroid similarity retains the cluster's diversity; the
  * prototypical members are the redundant ones).
  *
  * This is the semantic tier of the dedup ladder: exact (digest),
  * lexical (Jaccard/minhash/simhash), and embedding near-dup mining
  * (SRP-banded cosine) find COPIES; SemDeDup finds semantically
  * redundant documents whose text never overlaps.
  *
  * Every stage is deterministic and SQL-replayable, the IVF
  * discipline: the coarse clustering IS [[KnnJoin.ivfCentroids]]
  * (md5-ordered seed sample + Lloyd through exact-decimal means) and
  * assignment is [[KnnJoin.nearestCentroids]]'s (dot desc, cid asc)
  * argmax, so the d12 oracle replays the whole pipeline like v10.
  *
  * Scale shape (the paper's own design point): the pair join shuffles
  * on centroid id, so the pair space is Σ|cluster|² instead of n² —
  * nClusters grows with the corpus (√N as usual) to bound per-cluster
  * work, and clusters past the bound compose with the SRP-banded
  * candidate stage ([[KnnJoin.cosinePairsAboveBanded]]) inside the
  * cluster. No stage broadcasts the corpus: centroids are the only
  * broadcast (nClusters rows), Lloyd iterations are linear scans with
  * bounded shuffles, and the within-cluster join carries (id, csim)
  * plus one embedding per side. Cross-cluster near-dup pairs are the
  * documented miss mode — identically in both engines, so determinism
  * and the oracle hold.
  */
object SemDedup {

  /** Per-vector SemDeDup verdict over `vectors` (vec_id, embedding):
    * cluster assignment, cosine similarity to the assigned centroid,
    * and `kept` (0 when some same-cluster partner at cosine ≥ `tau`
    * sits FARTHER from the centroid — or equally far with a smaller
    * id — making this row the pair's redundant member). */
  def semDedup(spark: SparkSession, vectors: DataFrame, tau: Double,
               nClusters: Int = 16, seed: String = "42",
               lloydIters: Int = 2,
               centroidsOpt: Option[DataFrame] = None,
               assignmentsOpt: Option[DataFrame] = None): DataFrame = {
    val v = graft.core.Caches.transient(vectors
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding")))
    // nClusters <= 0 resolves to the FAISS/v19 auto-⌈√n⌉ rule — the
    // CORPUS-SCALE default: at fixed k the within-cluster pair space
    // Σ|c|² is n²/k, at √n clusters it is n^1.5 (the paper's own
    // design point; the pinned k=16 stays the oracle form)
    val centroids = centroidsOpt.getOrElse(
      KnnJoin.ivfCentroids(spark, v,
        KnnJoin.resolveNlist(nClusters, v), seed, lloydIters))
    val asg = assignmentsOpt.getOrElse(
      KnnJoin.nearestCentroids(spark, v, centroids, 1))
    // cosine to the assigned centroid — the keeper-selection key
    val withC = graft.core.Caches.transient(asg
      .join(v, Seq("vec_id"))
      .join(centroids.select(col("centroid_id"), col("embedding").as("cv")),
        Seq("centroid_id"))
      .select(col("vec_id"), col("centroid_id"),
        (VectorOps.dot(col("embedding"), col("cv")) /
          (sqrt(VectorOps.dot(col("embedding"), col("embedding"))) *
            sqrt(VectorOps.dot(col("cv"), col("cv"))))).as("csim")))
    // within-cluster near-dup pairs: the join shuffles on centroid_id,
    // never an all-pairs scan over the corpus
    val a = withC.select(col("centroid_id"), col("vec_id").as("a_id"),
      col("csim").as("ca"))
    val b = withC.select(col("centroid_id"), col("vec_id").as("b_id"),
      col("csim").as("cb"))
    val va = v.select(col("vec_id").as("a_id"), col("embedding").as("av"))
    val vb = v.select(col("vec_id").as("b_id"), col("embedding").as("bv"))
    val pairs = a.join(b, Seq("centroid_id")).filter(col("a_id") < col("b_id"))
      .join(va, Seq("a_id")).join(vb, Seq("b_id"))
      .withColumn("cos", VectorOps.dot(col("av"), col("bv")) /
        (sqrt(VectorOps.dot(col("av"), col("av"))) *
          sqrt(VectorOps.dot(col("bv"), col("bv")))))
      .filter(col("cos") >= tau)
    // keeper rule: the pair member CLOSER to the centroid (higher
    // csim; ties by larger id) is the redundant one
    val removed = pairs.select(
      when(col("ca") > col("cb") ||
          (col("ca") === col("cb") && col("a_id") > col("b_id")),
        col("a_id")).otherwise(col("b_id")).as("vec_id")).distinct()
    withC.join(removed.withColumn("rm", lit(1L)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("centroid_id"),
        round(col("csim"), 6).as("sim_centroid"),
        when(col("rm").isNotNull, 0L).otherwise(1L).as("kept"))
  }

  /** Session-artifact form of the coarse index over an arbitrary
    * vector corpus (keyed by the caller's corpus key) — the same
    * train-once discipline as the embeddings-table artifacts in
    * `VectorPack`; both builds are deterministic, so consumers are
    * bitwise-identical to inline construction. */
  def ivfArtifacts(spark: SparkSession, key: String, vectors: => DataFrame,
                   nClusters: Int = 16, seed: String = "42",
                   lloydIters: Int = 2): (DataFrame, DataFrame) = {
    def prep = vectors.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    // EVERY build parameter is part of the memo identity — an
    // auto-⌈√n⌉ request, a different seed, or a different iteration
    // count must never be served another build's frame
    val id = s"$key:$nClusters:$seed:$lloydIters"
    val cents = graft.core.Artifacts.memo(spark, s"ivf_centroids:$id")(
      KnnJoin.ivfCentroids(spark, prep,
        KnnJoin.resolveNlist(nClusters, prep), seed, lloydIters))
    val asg = graft.core.Artifacts.memo(spark, s"ivf_assign:$id")(
      KnnJoin.nearestCentroids(spark, prep, cents, 1))
    (cents, asg)
  }

  /** Contrastive TRIPLET mining — the training-pair generator for
    * embedding models (the DPR/SimCSE hard-negative recipe): each
    * near-duplicate pair (cos ≥ `tau`) yields an (anchor, positive);
    * the hard negative is the anchor's MOST similar same-cluster
    * non-duplicate (highest cos below `tau`, ties min id) — near
    * misses train better margins than random negatives. Clustering
    * bounds the candidate space exactly as in [[semDedup]]: the pair
    * join shuffles on centroid id, never n². Deterministic and
    * SQL-replayable via the same v10 chain. */
  def contrastiveTriplets(spark: SparkSession, vectors: DataFrame, tau: Double,
                          nClusters: Int = 16, seed: String = "42",
                          lloydIters: Int = 2,
                          centroidsOpt: Option[DataFrame] = None,
                          assignmentsOpt: Option[DataFrame] = None): DataFrame = {
    val v = graft.core.Caches.transient(vectors
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding")))
    // nClusters <= 0 → auto-⌈√n⌉, as in [[semDedup]]
    val centroids = centroidsOpt.getOrElse(
      KnnJoin.ivfCentroids(spark, v,
        KnnJoin.resolveNlist(nClusters, v), seed, lloydIters))
    val asg = assignmentsOpt.getOrElse(
      KnnJoin.nearestCentroids(spark, v, centroids, 1))
    val a = asg.select(col("centroid_id"), col("vec_id").as("anchor"))
    val b = asg.select(col("centroid_id"), col("vec_id").as("cand"))
    val va = v.select(col("vec_id").as("anchor"), col("embedding").as("av"))
    val vb = v.select(col("vec_id").as("cand"), col("embedding").as("bv"))
    // DIRECTIONAL within-cluster pairs: each member anchors its own
    // triplet, so one planted pair yields two training rows
    val prs = graft.core.Caches.transient(
      a.join(b, Seq("centroid_id")).filter(col("anchor") =!= col("cand"))
        .join(va, Seq("anchor")).join(vb, Seq("cand"))
        .withColumn("cos", VectorOps.dot(col("av"), col("bv")) /
          (sqrt(VectorOps.dot(col("av"), col("av"))) *
            sqrt(VectorOps.dot(col("bv"), col("bv")))))
        .select(col("anchor"), col("cand"), col("cos")))
    val pos = prs.filter(col("cos") >= tau)
      .select(col("anchor"), col("cand").as("pos_id"), col("cos").as("pos_cos"))
    val wNeg = Window.partitionBy(col("anchor"))
      .orderBy(col("cos").desc, col("cand"))
    val neg = prs.filter(col("cos") < tau)
      .withColumn("rn", row_number().over(wNeg)).filter(col("rn") === 1)
      .select(col("anchor"), col("cand").as("neg_id"), col("cos").as("neg_cos"))
    pos.join(neg, Seq("anchor"))
      .select(col("anchor"), col("pos_id"), col("neg_id"),
        round(col("pos_cos"), 6).as("pos_cos"),
        round(col("neg_cos"), 6).as("neg_cos"))
  }
}

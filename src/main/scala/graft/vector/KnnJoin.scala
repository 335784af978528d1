package graft.vector

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** kNN similarity join (SURVEY.md §2.3 J4) — the reference's FAISS
  * flat-index search re-expressed for Spark.
  *
  * Two implementations with identical semantics (cosine/IP over
  * double-cast embeddings, ties broken by ascending neighbor id,
  * self-matches excluded by the caller's predicate):
  *
  *  - [[exactCross]]: declarative join + window rank. Catalyst
  *    broadcast-hash-joins the small index side automatically; right
  *    at small N and the form the DuckDB oracle can verify. The
  *    Q×N intermediate makes it wrong above ~10⁴ index rows.
  *  - [[exactBroadcast]]: the scale path — index collected once,
  *    broadcast to executors, per-partition top-k heap over queries.
  *    No shuffle at all, O(k) memory per query row, exactly the
  *    reference's in-RAM `IndexFlatIP` (`Faiss_2_10.py:61-114`)
  *    with executors replacing the single GPU. At 100 TB of queries
  *    this stays embarrassingly parallel as long as the index fits
  *    in executor memory (~100 MB per million 64-dim doubles);
  *    beyond that, shard the index and union per-shard top-k.
  *
  * A spec asserts both produce identical results; the LSH variant in
  * [[approxLsh]] is the documented recall-for-speed trade at scale.
  */
object KnnJoin {

  final case class KnnHit(query_id: Long, neighbor_id: Long, rank: Int, sim: Double)

  /** Index-search strategy selector, so entry points (the lifecycles,
    * user pipelines) choose the 100 TB posture per call site instead
    * of hard-coding the broadcast-exact path:
    *  - [[Exact]]: FAISS-flat semantics, index must fit in executor
    *    memory (~100 MB per million 64-dim doubles);
    *  - [[Ivf]]: centroid-sharded candidate join — index can exceed
    *    broadcast size, exact rerank within probed lists;
    *  - [[Lsh]]: MLlib bucketed-random-projection join — recall for
    *    speed at corpus scale. */
  sealed trait Strategy
  case object Exact extends Strategy
  final case class Sharded(nShards: Int) extends Strategy
  /** `nCentroids = 0` (the default) means AUTO: size the coarse index
    * to ⌈√n⌉ lists for an n-vector index — the measured rule from the
    * 10× scale run (PERF.md round 6: 16 fixed lists 318 s vs √n lists
    * 61 s at 20k vectors; FAISS sizes IVF the same way). Pass an
    * explicit positive value to pin the list count (the oracle
    * queries do, via prebuilt centroid artifacts). */
  final case class Ivf(nCentroids: Int = 0, nProbe: Int = 4) extends Strategy
  /** IVF list pruning over a scalar-quantized (1 byte/dim) index with
    * exact rerank of `nCandidates` — the production posture for
    * corpora that are both too big to broadcast AND too big to store
    * full-precision (the v16 composition). Auto-sizes lists like
    * [[Ivf]]. */
  final case class IvfSq8(nCentroids: Int = 0, nProbe: Int = 4,
                          nCandidates: Int = 100) extends Strategy
  final case class Lsh(threshold: Double = 1.5, bucketLength: Double = 0.5,
                       numHashTables: Int = 4) extends Strategy

  /** Strategy-dispatched top-k search with the neighbor label
    * attached — one signature for every execution path. `excludeSelf`
    * is honored by the exact paths; the approximate paths always
    * exclude self-matches (harmless for disjoint query/index sets,
    * e.g. a train/test split). */
  def search(spark: SparkSession, queries: DataFrame, index: DataFrame,
             k: Int, strategy: Strategy,
             excludeSelf: Boolean = true): DataFrame = strategy match {
    case Exact => exact(spark, queries, index, k, excludeSelf)
    case Sharded(nShards) =>
      exactSharded(spark, queries, index, k, nShards, excludeSelf)
    case other =>
      val hits = other match {
        case Ivf(nCentroids, nProbe) =>
          approxIvf(spark, queries, index, k, nCentroids, nProbe)
        case IvfSq8(nCentroids, nProbe, nCandidates) =>
          approxIvfSq8(spark, queries, index, k, nCentroids, nProbe,
            nCandidates)
        case Lsh(threshold, bucketLength, numHashTables) =>
          approxLsh(spark, queries, index, k, threshold, bucketLength,
            numHashTables)
        case _ => throw new IllegalStateException("unreachable")
      }
      // No broadcast HINT here: Ivf/Lsh exist precisely for indexes too
      // big to broadcast, so forcing the label attach through a
      // broadcast would reintroduce the bound the strategy removes.
      // Catalyst still picks broadcast-hash on its own when the index
      // side is small enough (AQE size-based choice).
      hits.join(index.select(col("vec_id").as("neighbor_id"),
          col("label").as("n_label")), Seq("neighbor_id"))
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"),
          col("n_label"))
  }

  /** Bounded top-k selection by (sim desc, id asc): arrays kept sorted
    * with shifted insertion — O(1) reject for the common below-
    * threshold candidate, zero allocation per candidate. The total
    * order makes the result independent of candidate iteration order,
    * so every execution path (helper, custom exec) selects identically. */
  final class TopK(k: Int) {
    val sims = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0
    def reset(): Unit = size = 0
    def offer(nid: Long, s: Double): Unit = {
      if (size < k || s > sims(size - 1) ||
          (s == sims(size - 1) && nid < ids(size - 1))) {
        var pos = 0
        while (pos < size &&
               !(s > sims(pos) || (s == sims(pos) && nid < ids(pos)))) pos += 1
        if (pos < k) {
          var j = math.min(size, k - 1)
          while (j > pos) { sims(j) = sims(j - 1); ids(j) = ids(j - 1); j -= 1 }
          sims(pos) = s
          ids(pos) = nid
          if (size < k) size += 1
        }
      }
    }
  }

  /** Declarative exact kNN: top-k by inner product (callers L2
    * normalize first for cosine semantics). */
  def exactCross(queries: DataFrame, index: DataFrame, k: Int,
                 excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val n = index.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("n_emb"), col("label").as("n_label"))
    val cond = if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    q.join(broadcast(n), cond)
      .withColumn("sim", VectorOps.dot(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("sim"), col("n_label"))
  }

  /** Scale-path exact kNN: broadcast index + per-partition top-k heap. */
  def exactBroadcast(spark: SparkSession, queries: DataFrame, index: DataFrame,
                     k: Int, excludeSelf: Boolean = true): Dataset[KnnHit] = {
    import spark.implicits._
    val idx: Array[(Long, Array[Double])] = index
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    val bc = spark.sparkContext.broadcast(idx)
    val qs = queries
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
    qs.mapPartitions { it =>
      val entries = bc.value
      val top = new TopK(k)
      it.flatMap { case (qid, qv) =>
        top.reset()
        var i = 0
        while (i < entries.length) {
          val (nid, nv) = entries(i)
          if (!(excludeSelf && nid == qid)) {
            var s = 0.0
            var d = 0
            while (d < nv.length) { s += qv(d) * nv(d); d += 1 }
            top.offer(nid, s)
          }
          i += 1
        }
        (0 until top.size).map(r => KnnHit(qid, top.ids(r), r + 1, top.sims(r)))
      }
    }
  }

  /** The engine's standard exact kNN: broadcast-heap execution (no
    * Q×N materialization — ~20× faster than the declarative form,
    * whose per-pair `zip_with` array allocation never reaches codegen)
    * with the neighbor label attached. Sims are bitwise-identical to
    * [[exactCross]]: same double-cast elements, same sequential fold. */
  def exact(spark: SparkSession, queries: DataFrame, index: DataFrame,
            k: Int, excludeSelf: Boolean = true): DataFrame = {
    val labels = index.select(col("vec_id").as("neighbor_id"),
      col("label").as("n_label"))
    exactBroadcast(spark, queries, index, k, excludeSelf)
      .toDF("query_id", "neighbor_id", "rank", "sim")
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("sim"))
      .join(broadcast(labels), Seq("neighbor_id"))
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"),
        col("n_label"))
  }

  /** Exact kNN past broadcast size (the documented PERF.md 100-TB
    * path): the index hash-partitioned into `nShards` by id, each
    * shard broadcast independently with its own per-partition top-k
    * heap pass, then a global re-rank of the ≤ nShards·k candidates
    * per query. Selection order (sim desc, id asc) matches [[exact]]
    * and the per-shard dot products use the same sequential fold, so
    * the result is bitwise-identical to the unsharded path
    * (spec-asserted). Executor memory now bounds the SHARD size, not
    * the index size; the candidate re-rank shuffles only S·k tiny
    * rows per query. */
  def exactSharded(spark: SparkSession, queries: DataFrame, index: DataFrame,
                   k: Int, nShards: Int,
                   excludeSelf: Boolean = true): DataFrame = {
    require(nShards > 0)
    val perShard = (0 until nShards).map { s =>
      val shard = index.filter(pmod(col("vec_id"), lit(nShards)) === s)
      exactBroadcast(spark, queries, shard, k, excludeSelf)
        .toDF("query_id", "neighbor_id", "shard_rank", "sim")
        .select(col("query_id"), col("neighbor_id"), col("sim"))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    val labels = index.select(col("vec_id").as("neighbor_id"),
      col("label").as("n_label"))
    perShard
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("sim"))
      .join(broadcast(labels), Seq("neighbor_id"))
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"),
        col("n_label"))
  }

  /** Session-scoped memo of the standard artifact nearly every
    * evaluation query starts from: the embeddings table's exact top-3
    * self-kNN (leave-self-out, labels attached). The reference builds
    * its FAISS index ONCE and serves every downstream consumer from
    * it; this is the Spark analogue — first caller pays the O(N·N·d)
    * scan, the persisted hits (3 rows per vector — tiny) serve the
    * confusion/report/rollup/agreement/calibration/RAG family for the
    * rest of the session. Top-1 consumers filter `rank = 1`, which by
    * the selection order is exactly the k=1 result. */
  def exactSelfTop3(spark: SparkSession, dir: String): DataFrame =
    graft.core.Artifacts.memo(spark, s"knn_self_top3:$dir") {
      // spread scan: the O(N·N·d) heap loop runs in the query side's
      // scan stage — one task on single-row-group test parquet (50 s
      // on one core at 10× sf0.1, with 31 idle)
      val e = graft.core.Tables(spark, dir).embeddingsSpread
      exact(spark, e, e, 3)
    }

  /** Strategy-dispatched form of the self-top3 artifact — the SAME
    * seam and output shape as [[exactSelfTop3]] (which it returns
    * verbatim for [[Exact]], so every oracle query keeps the exact
    * form), but scale callers pick the search posture: the exact
    * self-kNN is the engine's one declared quadratic surface (~37×
    * wall at 10× data, PERF.md round 6), and an [[IvfSq8]]-backed
    * build keeps the whole downstream evaluation family
    * (report/rollup/agreement/calibration/RAG) on an O(n·√n) path
    * with recall spec-bounded against exact (IvfSpec). Each
    * strategy memoizes under its own key, so mixed consumers (an
    * exact-checked query next to a scale pipeline) never collide. */
  /** The evaluation family's self-kNN posture, resolved from
    * `SPARK_GRAFT_SELF_KNN`: unset/"exact" → [[Exact]] (reference
    * parity — every oracle/verify run uses this, since the driver
    * sets no such env), "ivfsq8" → auto-sized [[IvfSq8]] (the
    * corpus-scale posture: O(n·√n) search over 1-byte/dim codes
    * instead of the quadratic broadcast sweep), "ivf" → [[Ivf]].
    * Evaluation-family consumers ([[graft.metrics.FeedbackPack
    * .compositeEval]]) take this as their default strategy, so ONE
    * env flips the whole downstream report family onto the scale
    * path without touching the oracle-checked default.
    *
    * Resolved ONCE per JVM (lazy val) and logged when non-default:
    * a stale shell export would otherwise silently flip an
    * oracle-checked query's semantics at every call, surfacing only
    * as a downstream hash failure. Bench/Verify additionally force
    * resolution at startup ([[Bench]] fails fast on a bad value
    * before any timing; [[Verify]] refuses non-Exact outright). */
  lazy val envSelfStrategy: Strategy = {
    val s = parseSelfStrategy(sys.env.get("SPARK_GRAFT_SELF_KNN"))
    if (s != Exact)
      System.err.println(s"[graft] SPARK_GRAFT_SELF_KNN resolved to $s — " +
        "evaluation-family self-kNN leaves the oracle-checked exact posture")
    s
  }

  private[graft] def parseSelfStrategy(v: Option[String]): Strategy =
    v.map(_.trim.toLowerCase).filter(_.nonEmpty) match {
      case None | Some("exact") => Exact
      case Some("ivfsq8")       => IvfSq8()
      case Some("ivf")          => Ivf()
      case Some(other) => throw new IllegalArgumentException(
        s"SPARK_GRAFT_SELF_KNN=$other (want exact|ivf|ivfsq8)")
    }

  def selfTop3(spark: SparkSession, dir: String,
               strategy: Strategy = Exact): DataFrame = strategy match {
    case Exact => exactSelfTop3(spark, dir)
    case s =>
      graft.core.Artifacts.memo(spark, s"knn_self_top3:$s:$dir") {
        val e = graft.core.Tables(spark, dir).embeddingsSpread
        search(spark, e, e, 3, s)
      }
  }

  /** All-pairs similarity above a threshold: broadcast + per-partition
    * primitive loops with precomputed norms; emits (a_id < b_id, cos).
    *
    * This is the EXACT-SCAN twin, O(n²) by construction — the right
    * tool for diagnostics, spec cross-checks, and tail-pair
    * enumeration at LOW thresholds, where no sub-quadratic exact
    * algorithm exists (measured on the synthetic embeddings: at
    * threshold 0.3 the background cloud is isotropic — avg pair cos
    * ≈ 4e-4, max 0.51 — so threshold pairs are the smooth tail of
    * random noise and ANY candidate scheme with full recall must
    * examine ~all pairs). Near-dup MINING — the training-pipeline
    * operator, threshold ≥ ~0.9 with a wide margin to background —
    * is [[cosinePairsAboveBanded]], which is sub-quadratic. */
  def cosinePairsAbove(spark: SparkSession, vectors: DataFrame,
                       threshold: Double): DataFrame = {
    import spark.implicits._
    val idx: Array[(Long, Array[Double])] = vectors
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(idx)
    def normOf(v: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    vectors.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
      .flatMap { case (aId, av) =>
        val na = normOf(av)
        bc.value.iterator
          .filter(_._1 > aId)
          .map { case (bId, bv) =>
            var s = 0.0; var i = 0
            while (i < bv.length) { s += av(i) * bv(i); i += 1 }
            (aId, bId, s / (na * normOf(bv)))
          }
          .filter(_._3 >= threshold)
      }
      .toDF("a_id", "b_id", "cos")
  }

  /** Deterministic Rademacher (±1) projection planes for SRP-LSH,
    * derived from a splitmix64 stream of `seed` — identical on every
    * executor with no broadcast and no RNG-implementation dependence. */
  private[vector] def srpPlanes(seed: Long, nBits: Int, dim: Int): Array[Array[Double]] = {
    val planes = Array.ofDim[Double](nBits, dim)
    var j = 0
    while (j < nBits) {
      var k = 0
      while (k < dim) {
        var z = seed + (j.toLong * dim + k + 1) * 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^= (z >>> 31)
        planes(j)(k) = if ((z & 1L) == 0L) 1.0 else -1.0
        k += 1
      }
      j += 1
    }
    planes
  }

  /** Near-dup pairs ≥ `threshold` via banded signed-random-projection
    * LSH + exact cosine rerank — the corpus-scale path for embedding
    * near-dup mining (same inverted-index discipline as the minhash /
    * banded-simhash text paths).
    *
    * Signature stage is map-side: `bands·bitsPerBand` sign bits per
    * vector (sign of a Rademacher projection; P[bits agree] =
    * 1 − θ/π), packed into one long per band. Candidates come from the
    * per-band equi-join — pairs must agree on ALL `bitsPerBand` bits
    * of some band, so candidate volume is ~n²·(1−θ/π)^bits per band,
    * vanishing for the isotropic background (θ ≈ π/2 → 2^-bits) while
    * near-dups (θ ≈ 0) collide with probability → 1. The exact rerank
    * then restores precision; misses are the only error mode, at
    * (1 − p^bits)^bands per true pair — ~5e-7 at cos 0.995 with the
    * 16×16 defaults, and DETERMINISTIC given the fixed seed (the
    * equality spec vs [[cosinePairsAbove]] pins the realized recall
    * at 100%).
    *
    * Scale shape: no broadcast of the vector set, no n² scan — two
    * shuffles (signature equi-join on (band, sig), id-join rerank),
    * all partial-aggregatable. At 100 TB the signature join carries
    * `bands` longs per vector; skewed signature buckets (mass dup
    * clusters) are bounded upstream by exact dedup first. */
  def cosinePairsAboveBanded(spark: SparkSession, vectors: DataFrame,
                             threshold: Double, bands: Int = 16,
                             bitsPerBand: Int = 16, seed: Long = 42L): DataFrame = {
    val cands = srpCandidates(spark, vectors, bands, bitsPerBand, seed)
    // exact rerank: same fold order and same divide-by-norm-product
    // arithmetic as the all-pairs twin and the DuckDB oracle
    val va = vectors.select(col("vec_id").as("a_id"),
      col("embedding").cast("array<double>").as("av"))
    val vb = vectors.select(col("vec_id").as("b_id"),
      col("embedding").cast("array<double>").as("bv"))
    cands.join(va, Seq("a_id")).join(vb, Seq("b_id"))
      .withColumn("cos", VectorOps.dot(col("av"), col("bv")) /
        (sqrt(VectorOps.dot(col("av"), col("av"))) *
          sqrt(VectorOps.dot(col("bv"), col("bv")))))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), col("cos"))
  }

  /** The LSH candidate stage of [[cosinePairsAboveBanded]]: distinct
    * (a_id < b_id) pairs agreeing on at least one full band. Exposed
    * so specs can pin candidate sparsity (candidates ≪ n²/2). */
  private[graft] def srpCandidates(spark: SparkSession, vectors: DataFrame,
                                   bands: Int, bitsPerBand: Int,
                                   seed: Long): DataFrame = {
    import spark.implicits._
    require(bitsPerBand < 64, "band signature must pack into a long")
    val nBits = bands * bitsPerBand
    val sigRows = vectors
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        var planes: Array[Array[Double]] = null // built once per partition
        it.flatMap { case (id, vec) =>
          if (planes == null) planes = srpPlanes(seed, nBits, vec.length)
          val bandVals = new Array[Long](bands)
          var j = 0
          while (j < nBits) {
            val p = planes(j)
            var s = 0.0
            var k = 0
            while (k < vec.length) { s += p(k) * vec(k); k += 1 }
            if (s > 0) bandVals(j / bitsPerBand) |= 1L << (j % bitsPerBand)
            j += 1
          }
          (0 until bands).iterator.map(b => (id, b, bandVals(b)))
        }
      }
      .toDF("id", "band", "sig")
    val a = sigRows.select(col("id").as("a_id"), col("band"), col("sig"))
    val b = sigRows.select(col("id").as("b_id"), col("band"), col("sig"))
    a.join(b, Seq("band", "sig"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
  }

  /** IVF-style approximate kNN (builder brief: "IVF or LSH-bucketed
    * variant as the scale path"): a coarse quantizer of `nCentroids`
    * centroids — a deterministic hash-order sample of the index,
    * refined by `lloydIters` seeded Lloyd (k-means) iterations —
    * partitions the index into inverted lists; each query probes its
    * `nProbe` nearest centroids and reranks exactly within those
    * lists only.
    *
    * Every stage is deterministic AND replayable in SQL, k-means
    * included: assignment tie-breaks are (dot desc, centroid id asc)
    * and the per-dimension centroid means sum through exact decimals
    * (order-independent), so the refined centroids are bitwise
    * reproducible on any partitioning and the v10 oracle replays the
    * full pipeline. Lloyd iterations are linear scans (one bounded
    * shuffle each: per-(centroid, dim) partial sums); empty clusters
    * drop out, identically in both engines.
    *
    * Unlike the broadcast-exact path this never needs the full index
    * per executor — the candidate join shuffles on centroid id, so
    * the index can be arbitrarily large as long as single inverted
    * lists stay bounded (centroid count scales with √N as usual).
    */
  def approxIvf(spark: SparkSession, queries: DataFrame, index: DataFrame,
                k: Int, nCentroids: Int = 0, nProbe: Int = 4,
                seed: String = "42", lloydIters: Int = 2,
                centroidsOpt: Option[DataFrame] = None,
                assignmentsOpt: Option[DataFrame] = None): DataFrame = {
    // `centroidsOpt`/`assignmentsOpt` let callers pass a PREBUILT
    // coarse index (e.g. the session artifact the pack registers) —
    // the FAISS discipline of training the quantizer once and serving
    // every search from it; both stages are deterministic, so a
    // prebuilt frame is bitwise-identical to building inline
    val centroids = centroidsOpt.getOrElse(
      ivfCentroids(spark, index, resolveNlist(nCentroids, index), seed,
        lloydIters))
    // inverted lists: every index vector → nearest centroid
    val assignments = assignmentsOpt.getOrElse(
      nearestCentroids(spark, index, centroids, 1))
    val lists = index.join(assignments, Seq("vec_id"))
      .select(col("centroid_id"), col("vec_id").as("neighbor_id"),
        col("embedding").as("n_emb"))
    // probe: each query → its nProbe nearest centroids
    val probes = nearestCentroids(spark, queries, centroids, nProbe)
      .withColumnRenamed("vec_id", "query_id")
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    // candidates = union of probed lists; exact rerank within them
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    probes
      .join(lists, Seq("centroid_id"))
      .join(q, Seq("query_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", VectorOps.dot(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("sim"))
  }

  /** nlist resolution for the IVF family: an explicit positive value
    * is honored verbatim; the 0/negative "auto" default applies the
    * measured nlist ∝ √n rule (PERF.md round 6 — fixed 16 lists left
    * inverted lists of n/16 vectors, degrading the probe-side rerank
    * quadratically at 10× data; ⌈√n⌉ lists keep both the centroid
    * scan and the probed-list rerank at O(√n) per query). Costs one
    * `count()` of the index, and only on the auto path — prebuilt
    * centroid artifacts and pinned oracle params never reach it. */
  /** nlist resolution: explicit, or the FAISS ⌈√n⌉ rule (v19's
    * default). Expected slopes under √n lists, measured by the
    * PerfProbe `ivfsplit` leg at 1×/10×/30× (PERF.md round-11 table):
    * the Lloyd build is O(iters·n·nlist) = O(n^1.5) but runs ONCE per
    * session (index artifact — every downstream query amortizes it;
    * measured 4.5→7.2 s from 2k to 60k vectors, still
    * overhead-dominated); per-query probe cost is O(nProbe·n/nlist) =
    * O(√n), so a SELF-join search is O(n^1.5) asymptotically
    * (measured 2.1→14.7 s = 7× at 30× data). A fixed nlist instead
    * makes per-query cost O(n) — the v10/v13 pinned contrast. */
  private[graft] def resolveNlist(nCentroids: Int, index: DataFrame): Int =
    if (nCentroids > 0) nCentroids
    else math.max(1, math.ceil(math.sqrt(index.count().toDouble)).toInt)

  /** The coarse quantizer of [[approxIvf]]/[[approxIvfPq]]: a
    * deterministic md5-ordered sample of `nCentroids` index vectors,
    * refined by `lloydIters` Lloyd iterations whose per-dimension
    * means sum through exact decimals (order-independent) — bitwise
    * reproducible on any partitioning, replayable in SQL. */
  // public: index TRAINING is caller-facing API (the FAISS `train`
  // analog) — a built centroid frame is a persistable artifact that
  // reloads from parquet into `centroidsOpt` (spec-pinned round-trip)
  def ivfCentroids(spark: SparkSession, index: DataFrame,
                                   nCentroids: Int, seed: String,
                                   lloydIters: Int): DataFrame = {
    import graft.sample.Sampling
    val vecs = index
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    var centroids = Sampling.fixedSample(vecs, nCentroids, col("vec_id"), seed)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    for (_ <- 0 until lloydIters) {
      val asg = nearestCentroids(spark, vecs, centroids, 1)
      centroids = vecs.join(asg, Seq("vec_id"))
        .select(col("centroid_id"), posexplode(col("embedding")).as(Seq("d", "x")))
        .groupBy(col("centroid_id"), col("d"))
        .agg((sum(col("x").cast("decimal(28,18)")).cast("double") /
          count(lit(1)).cast("double")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(transform(array_sort(collect_list(struct(col("d"), col("m")))),
          x => x.getField("m")).as("embedding"))
    }
    // several consumers follow (assignment collect, probe collect,
    // centroid-similarity joins), each an action that would re-run the
    // final Lloyd groupBy chain — cache the tiny (nCentroids-row)
    // result for the duration of the query
    graft.core.Caches.transient(centroids)
  }

  /** (vec_id, centroid_id) rows: each row's `n` nearest centroids by
    * inner product, ties (dot desc, centroid id asc) — the assignment
    * and probing primitive of the IVF family. */
  private[graft] def nearestCentroids(spark: SparkSession, rows: DataFrame,
                                       centroids: DataFrame, n: Int): DataFrame =
    exactBroadcast(spark, rows.select(col("vec_id"), col("embedding")),
        centroids.select(col("centroid_id").as("vec_id"), col("embedding")),
        n, excludeSelf = false)
      .toDF("vec_id", "centroid_id", "r", "s")
      .select(col("vec_id"), col("centroid_id"))

  /** INCREMENTAL IVF index maintenance — the append path of a
    * long-lived embedding store (the d16/d19 incremental pattern,
    * index edition): a per-batch append assigns its vectors to the
    * EXISTING centroids in one broadcast-centroid map-side pass —
    * [[nearestCentroids]] verbatim, exposed as caller-facing API
    * because it IS the maintenance operation — and unions the new
    * (vec_id, centroid_id) rows onto the stored assignment relation.
    * No old assignment is ever touched, no Lloyd retrain runs per
    * batch, and a search over the maintained index is bitwise-equal to
    * one whose assignment pass was re-run from scratch against the
    * same centroids (assignment is per-row independent and
    * deterministic; spec-pinned, and the v25 oracle replays the
    * incremental assignment from scratch in SQL). The amortized-build
    * story this completes: [[ivfCentroids]] is the once-per-corpus
    * O(n·√n) cost (PERF.md round-11 ivfsplit attribution); with this
    * path it amortizes across the index's LIFETIME, not one session.
    * Retrain is a measured decision, not a schedule —
    * [[centroidDriftAudit]]. */
  def incrementalAssign(spark: SparkSession, newRows: DataFrame,
                        centroids: DataFrame): DataFrame =
    nearestCentroids(spark, newRows, centroids, 1)

  /** Per-vector assignment RESIDUALS against a centroid set: the
    * squared L2 distance ‖x − c‖² = x·x − 2·x·c + c·c of each row to
    * its (inner-product-)assigned centroid — the coarse quantizer's
    * per-row approximation error, and the drift statistic
    * [[centroidDriftAudit]] sketches. Pure dot-product arithmetic
    * (the same sequential fold as every sim), so the whole relation
    * replays in SQL. */
  def assignmentResiduals(spark: SparkSession, rows: DataFrame,
                          centroids: DataFrame): DataFrame = {
    val v = rows.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val c = centroids.select(col("centroid_id"),
      col("embedding").cast("array<double>").as("cv"))
    incrementalAssign(spark, rows, centroids)
      .join(v, Seq("vec_id"))
      .join(broadcast(c), Seq("centroid_id"))
      .select(col("vec_id"), col("centroid_id"),
        (VectorOps.dot(col("v"), col("v"))
          - lit(2.0) * VectorOps.dot(col("v"), col("cv"))
          + VectorOps.dot(col("cv"), col("cv"))).as("residual"))
  }

  /** CENTROID DRIFT AUDIT — the retrain trigger of the incremental
    * index ([[incrementalAssign]]), built exactly like the funnel's
    * threshold audit (`Lifecycles.thresholdAudit`, the p05 one-sided
    * pattern): the build-time residual p95 is the published design
    * point; the live batch's residual p95 is re-measured through the
    * bounded-state histogram sketch (≤`bins` rows through the shuffle,
    * nothing sorts the residual relation); `recalibrate` fires ONE-
    * SIDED when the live p95 exceeds the published p95 by more than
    * the `marginFrac` engineering margin plus BOTH sketches' error
    * bounds — residual GROWTH past the margin means the frozen
    * centroids no longer cover the live distribution and per-query
    * probe quality is provably below the design point. Shrinking
    * residuals stay quiet: the index is serving better than designed,
    * and retraining would buy nothing.
    *
    * The margin is the p05 permissive-side discipline in relative
    * form: out-of-sample residuals sit ABOVE in-sample ones by
    * construction (the quantizer was trained on the build set), so a
    * margin-free trigger would fire on the generalization gap of
    * every healthy append (measured: a held-out same-distribution
    * slice lands ~4% above the build p95 at sf0.001); 10% clears
    * that gap while real drift — a shifted distribution moves p95 by
    * whole multiples — still fires (spec-pinned both ways). One row:
    * (metric, q, est, bin_width, published, published_bin_width,
    * recalibrate). */
  def centroidDriftAudit(buildResiduals: DataFrame,
                         liveResiduals: DataFrame,
                         bins: Int = 1000,
                         prob: Double = 0.95,
                         marginFrac: Double = 0.1): DataFrame = {
    import graft.core.Sketches
    val pub = Sketches.histogramQuantilesWithWidth(
        buildResiduals, col("residual"), bins, Seq(prob))
      .select(col("est").as("published"),
        col("bin_width").as("published_bin_width"))
    Sketches.histogramQuantilesWithWidth(
        liveResiduals, col("residual"), bins, Seq(prob))
      .crossJoin(broadcast(pub))
      .select(lit(s"residual_p${math.round(prob * 100)}").as("metric"),
        col("q"), col("est"), col("bin_width"), col("published"),
        col("published_bin_width"),
        (col("est") > col("published") * lit(1.0 + marginFrac)
          + col("bin_width")
          + col("published_bin_width")).cast("long").as("recalibrate"))
  }

  /** Product-quantization approximate kNN (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search"): the 100 TB
    * INDEX-COMPRESSION member of the ladder — vectors quantize to
    * `m` sub-codes (nearest per-subspace centroid by L2), so the
    * searchable index is m small integers per vector instead of the
    * raw floats (64 dims × 8 B → 4 codes here: 128× smaller), and
    * query scoring is table lookups (asymmetric distance: the sum of
    * query-subvector · centroid dots), not full-dimension dots.
    *
    * Every stage is deterministic and SQL-replayable, same
    * discipline as IVF: md5-ordered per-subspace seed sample, ONE
    * Lloyd refinement through exact-decimal means, (dist asc, cid
    * asc) assignment tie-breaks, fixed-order sum of the m lookup
    * terms, (approx desc, id asc) candidate rank, exact rerank of the
    * top `nCandidates`. The quantization stages are relational so the
    * v12 oracle replays them; the candidate scan runs in the
    * production shape — broadcast per-query lookup tables over a
    * per-partition packed-code scan (the [[exactBroadcast]] shape
    * with 128× less index memory). The LUT broadcast is bounded by
    * Q·m·centroids doubles (~0.5 MB per 1k queries at the defaults);
    * query sets past `queryChunk` split into successive searches —
    * one LUT broadcast and one code scan per chunk, results unioned —
    * so neither the driver collects nor the broadcast ever exceeds the
    * chunk bound no matter how many queries arrive (the reference
    * batches queries against its GPU index for the same reason,
    * `Fai_new.py:49-64`). Chunk membership is `qid % nChunks`
    * (nChunks from one count — no unbounded id collect anywhere);
    * chunks are disjoint and per-query heaps independent, so the
    * output is bitwise-independent of the chunk size (spec-asserted).
    */
  def approxPq(spark: SparkSession, queries: DataFrame, index: DataFrame,
               k: Int, m: Int = 4, subDim: Int = 16, centroidsPerSub: Int = 16,
               nCandidates: Int = 30, seed: String = "42",
               queryChunk: Int = 8192,
               centsOpt: Option[DataFrame] = None,
               codesOpt: Option[DataFrame] = None): DataFrame = {
    require(queryChunk > 0, "queryChunk must be positive")
    // prebuilt codebook/codes (the session artifact tier — FAISS
    // trains its quantizer once) are bitwise-identical to inline
    // construction: every stage is deterministic
    val cents = centsOpt.getOrElse(
      pqCodebook(index, m, subDim, centroidsPerSub, seed))
    val codes = codesOpt.getOrElse(pqCodes(index, cents, m, subDim))
    val qdots = pqLuts(queries, cents, m, subDim)
    val qv = queries.select(col("vec_id").as("qid"),
      col("embedding").cast("array<double>").as("qv"))
    // asymmetric scoring in the PRODUCTION shape the PQ paper implies:
    // per-query lookup tables (Q·centroids·m dots — ~1 MB/1k queries)
    // broadcast once, then each partition scans its PACKED CODE rows
    // and maintains bounded per-query heaps; a second bounded pass
    // merges partition partials. No Q×N relational intermediate at
    // all. The sum stays in fixed subspace order and selection uses
    // TopK's total order (score desc, id asc) in both phases, so the
    // candidate set — and the oracle hash — match the declarative
    // window form exactly.
    val aggs = (1 until m).map(s => max(when(col("s") === s, col("cid"))).as(s"c$s"))
    val codesWide = codes.groupBy(col("vec_id"))
      .agg(max(when(col("s") === 0, col("cid"))).as("c0"), aggs: _*)
    val cand = {
      import spark.implicits._
      val nc = nCandidates
      val mm = m
      // chunk membership is HASH(qid) % nChunks — a hash, not the raw
      // id, because an id space with a common stride sharing a factor
      // with nChunks would collapse most queries into one chunk and
      // restore the unbounded driver collect the chunking exists to
      // prevent. With hashed membership no driver collect is ever
      // unbounded in expectation: the per-chunk materializations are
      // that chunk's ids and its LUT rows (≈ queryChunk each). Chunks
      // are disjoint and cover every query, and per-query heaps are
      // independent, so the union below is chunk-layout-invariant
      // (the spec pins chunked ≡ unchunked bitwise).
      val totalQ = qv.select(col("qid")).count()
      val nChunks = math.max(1, math.ceil(totalQ.toDouble / queryChunk).toInt)
      val codesArr = codesWide
        .select(col("vec_id"), array((0 until m).map(s => col(s"c$s")): _*).as("cs"))
        .as[(Long, Seq[Long])]
        .coalesce(math.max(1, spark.sparkContext.defaultParallelism / 4))
      // several chunks scan the code rows several times — cache them
      // once (tiny: m longs per vector IS the compressed index)
      val codesShared =
        if (nChunks > 1) graft.core.Caches.transient(codesArr)
        else codesArr
      // the LUT relation's lineage includes the whole codebook build
      // (seed windows, Lloyd refinement) — cache it across chunks or
      // every chunk would re-train the quantizer
      val qdotsTyped0 = qdots.select(col("s"), col("cid"), col("qid"), col("qd"))
        .as[(Int, Long, Long, Double)]
      val qdotsTyped =
        if (nChunks > 1) graft.core.Caches.transient(qdotsTyped0)
        else qdotsTyped0
      val partials = (0 until nChunks).map { ci =>
        val member =
          pmod(hash(col("qid")).cast("long"), lit(nChunks.toLong)) === ci.toLong
        val qids: Array[Long] =
          qv.select(col("qid")).filter(member).as[Long].collect().sorted
        val qIdx = qids.zipWithIndex.toMap
        val luts: Array[Map[Long, Array[Double]]] = {
          val acc = Array.fill(m)(scala.collection.mutable.HashMap.empty[Long, Array[Double]])
          qdotsTyped.filter(member).collect()
            .foreach { case (s, cid, qid, qd) =>
              acc(s).getOrElseUpdate(cid, new Array[Double](qids.length))(qIdx(qid)) = qd
            }
          acc.map(_.toMap)
        }
        val bcLut = spark.sparkContext.broadcast((qids, luts))
        codesShared.mapPartitions { it =>
          val (qs, lut) = bcLut.value
          val heaps = Array.fill(qs.length)(new TopK(nc))
          it.foreach { case (vid, cs) =>
            val tabs = Array.tabulate(mm)(s => lut(s)(cs(s)))
            var qi = 0
            while (qi < qs.length) {
              var sc = tabs(0)(qi)
              var s = 1
              while (s < mm) { sc += tabs(s)(qi); s += 1 }
              if (qs(qi) != vid) heaps(qi).offer(vid, sc)
              qi += 1
            }
          }
          heaps.iterator.zipWithIndex.flatMap { case (top, qi) =>
            (0 until top.size).map(r => (qs(qi), top.ids(r), top.sims(r)))
          }
        }.toDF("qid", "vec_id", "sc")
      }.reduce(_ unionByName _)
      partials
        .repartition(col("qid"))
        .as[(Long, Long, Double)]
        .mapPartitions { it =>
          val heaps = scala.collection.mutable.LinkedHashMap.empty[Long, TopK]
          it.foreach { case (q, vid, sc) =>
            heaps.getOrElseUpdate(q, new TopK(nc)).offer(vid, sc)
          }
          heaps.iterator.flatMap { case (q, top) =>
            (0 until top.size).map(r => (q, top.ids(r)))
          }
        }
        .toDF("qid", "vec_id")
    }
    // exact rerank of the candidate set only
    val nv = index.select(col("vec_id"),
      col("embedding").cast("array<double>").as("nv"))
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    cand.join(qv, Seq("qid")).join(nv, Seq("vec_id"))
      .withColumn("sim", VectorOps.dot(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"), col("sim"))
  }

  /** Per-subspace slicing: (id, s, subvector) rows — the PQ family's
    * shared projection. */
  private def pqSubspaces(df: DataFrame, idAs: String, xAs: String,
                          m: Int, subDim: Int): DataFrame =
    df.select(col(df.columns.head).as(idAs), posexplode(array((0 until m).map(s =>
        slice(col(df.columns(1)), s * subDim + 1, subDim)): _*))
      .as(Seq("s", xAs)))

  /** Nearest-subspace-centroid assignment (L2, ties (dist asc, cid
    * asc)) of each (vec_id, s) subvector. */
  private def pqAssign(sub: DataFrame, cents: DataFrame): DataFrame = {
    def l2(x: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
      VectorOps.dot(x, x) - lit(2.0) * VectorOps.dot(x, c) + VectorOps.dot(c, c)
    val wAsg = Window.partitionBy(col("vec_id"), col("s"))
      .orderBy(col("dist"), col("cid"))
    sub.join(broadcast(cents), Seq("s"))
      .withColumn("dist", l2(col("x"), col("cv")))
      .withColumn("rn", row_number().over(wAsg)).filter(col("rn") === 1)
      .select(col("vec_id"), col("s"), col("cid"))
  }

  /** PQ codebook construction shared by [[approxPq]] and
    * [[approxIvfPq]]: per-subspace md5-ordered seed sample, ONE Lloyd
    * refinement through exact-decimal means — the (s, cid, cv)
    * relation. Deterministic and SQL-replayable, so a session can
    * build it once (the artifact tier) and serve every PQ search. */
  private[vector] def pqCodebook(index: DataFrame, m: Int, subDim: Int,
                                 centroidsPerSub: Int, seed: String): DataFrame = {
    val v = index.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    // silent dimension mismatch would slice() into truncated or empty
    // subvectors and degrade results with no error — reject it here.
    // min/max over ALL rows (one scan-stage aggregate) so a MIXED-
    // dimension corpus is rejected too, not just a wrong first row;
    // the build behind this check is a once-per-session artifact, so
    // the extra scan amortizes with the codebook itself.
    v.agg(min(size(col("v"))).as("lo"), max(size(col("v"))).as("hi"))
      .collect().headOption.filterNot(_.isNullAt(0)).foreach { r =>
        require(r.getInt(0) == m * subDim && r.getInt(1) == m * subDim,
          s"embedding dims [${r.getInt(0)}, ${r.getInt(1)}] must all equal " +
            s"m*subDim = ${m * subDim}")
      }
    val sub = pqSubspaces(v, "vec_id", "x", m, subDim)
    val wSeed = Window.partitionBy(col("s")).orderBy(
      md5(concat_ws("_", lit(seed), col("s"), col("vec_id"))), col("vec_id"))
    val seeds = sub.withColumn("rn", row_number().over(wSeed))
      .filter(col("rn") <= centroidsPerSub)
      .select(col("s"), col("vec_id").as("cid"), col("x").as("cv"))
    // one Lloyd refinement: seed assignment → exact-decimal means.
    // The codebook is consumed by the code assignment AND the query
    // LUT, each reached by several downstream actions (LUT collect,
    // code scan, rerank) — cache the m×centroidsPerSub-row result so
    // the refinement chain runs once per query, not per action.
    graft.core.Caches.transient(
      sub.join(pqAssign(sub, seeds), Seq("vec_id", "s"))
        .select(col("s"), col("cid"), posexplode(col("x")).as(Seq("d", "xd")))
        .groupBy(col("s"), col("cid"), col("d"))
        .agg((sum(col("xd").cast("decimal(28,18)")).cast("double") /
          count(lit(1)).cast("double")).as("mn"))
        .groupBy(col("s"), col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("d"), col("mn")))),
          x => x.getField("mn")).as("cv")))
  }

  /** The compressed index: one (vec_id, s, cid) code row per index
    * vector and subspace — m small integers replacing the raw floats. */
  private[vector] def pqCodes(index: DataFrame, cents: DataFrame,
                              m: Int, subDim: Int): DataFrame = {
    val v = index.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    pqAssign(pqSubspaces(v, "vec_id", "x", m, subDim), cents)
  }

  /** Query-side lookup relation: (qid, s, cid, qd) with qd the
    * query-subvector · centroid dot — the asymmetric-distance terms. */
  private[vector] def pqLuts(queries: DataFrame, cents: DataFrame,
                             m: Int, subDim: Int): DataFrame = {
    val qv = queries.select(col("vec_id").as("qid"),
      col("embedding").cast("array<double>").as("qv"))
    pqSubspaces(qv, "qid", "qx", m, subDim).join(broadcast(cents), Seq("s"))
      .select(col("qid"), col("s"), col("cid"),
        VectorOps.dot(col("qx"), col("cv")).as("qd"))
  }

  /** IVF-PQ composition — the FAISS production shape (`IndexIVFPQ`):
    * the coarse quantizer prunes the search to `nProbe` inverted
    * lists, and within the probed lists candidates are scored from PQ
    * codes (asymmetric lookup sums), not full-dimension dots; the top
    * `nCandidates` get the exact rerank (the `IndexRefineFlat` step —
    * its default refine factor is deliberately larger than
    * [[approxPq]]'s cut, because PQ's 4-subspace scores are coarse and
    * pruning hard inside an already-pruned probe pool compounds the
    * two approximations' misses). Both halves are the engine's
    * existing deterministic parts ([[ivfCentroids]]/[[nearestCentroids]]
    * + [[pqCodebook]]/[[pqCodes]]/[[pqLuts]]), so the whole pipeline replays in SQL and
    * v13 runs under the full oracle like v10/v12. Codes quantize RAW
    * vectors (FAISS `by_residual=false`), which keeps the query LUT
    * list-independent: one (qid, s, cid) relation serves every probed
    * list.
    *
    * Scale shape: the candidate join shuffles on centroid id (index
    * never broadcast, lists bound executor memory like IVF) and
    * carries m small codes per index row (the 128× PQ compression) —
    * the posture for indexes that outgrow both [[Exact]]'s broadcast
    * and [[approxPq]]'s full-index code scan per query chunk. */
  def approxIvfPq(spark: SparkSession, queries: DataFrame, index: DataFrame,
                  k: Int, nCentroids: Int = 0, nProbe: Int = 4,
                  m: Int = 4, subDim: Int = 16, centroidsPerSub: Int = 16,
                  nCandidates: Int = 100, seed: String = "42",
                  lloydIters: Int = 2,
                  centroidsOpt: Option[DataFrame] = None,
                  assignmentsOpt: Option[DataFrame] = None,
                  centsOpt: Option[DataFrame] = None,
                  codesOpt: Option[DataFrame] = None): DataFrame = {
    val centroids = centroidsOpt.getOrElse(
      ivfCentroids(spark, index, resolveNlist(nCentroids, index), seed,
        lloydIters))
    val assignments = assignmentsOpt.getOrElse(
      nearestCentroids(spark, index, centroids, 1))
    val probes = nearestCentroids(spark, queries, centroids, nProbe)
      .withColumnRenamed("vec_id", "query_id")
    val cents = centsOpt.getOrElse(
      pqCodebook(index, m, subDim, centroidsPerSub, seed))
    val codes = codesOpt.getOrElse(pqCodes(index, cents, m, subDim))
    val qdots = pqLuts(queries, cents, m, subDim)
    // probed-list membership: (query, candidate) pairs the coarse
    // quantizer admits — the PQ scan below never sees other lists
    val pl = probes.join(
        assignments.select(col("vec_id").as("neighbor_id"), col("centroid_id")),
        Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
    // asymmetric score: the m lookup terms summed in FIXED subspace
    // order (same arithmetic as approxPq's scan and the SQL oracle)
    val approxSum = (0 until m)
      .map(s => max(when(col("s") === s, col("qd")))).reduce(_ + _)
    val approx = pl
      .join(codes.select(col("vec_id").as("neighbor_id"), col("s"), col("cid")),
        Seq("neighbor_id"))
      .join(qdots.select(col("qid").as("query_id"), col("s"), col("cid"),
        col("qd")), Seq("query_id", "s", "cid"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(approxSum.as("approx_ip"))
    val wCand = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_ip").desc, col("neighbor_id"))
    val cand = approx.withColumn("crn", row_number().over(wCand))
      .filter(col("crn") <= nCandidates)
      .select(col("query_id"), col("neighbor_id"))
    // exact rerank of the admitted candidates only
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("q_emb"))
    val nv = index.select(col("vec_id").as("neighbor_id"),
      col("embedding").cast("array<double>").as("n_emb"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cand.join(q, Seq("query_id")).join(nv, Seq("neighbor_id"))
      .withColumn("sim", VectorOps.dot(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("sim"))
  }

  /** Approximate kNN via MLlib random-projection LSH over the
    * L2-normalized vectors (Euclidean on the unit sphere orders like
    * cosine: dist² = 2 − 2·sim). The 100 TB path when the index side
    * no longer broadcasts — bucketed join instead of Q×N scan. */
  def approxLsh(spark: SparkSession, queries: DataFrame, index: DataFrame,
                k: Int, threshold: Double = 1.5, bucketLength: Double = 0.5,
                numHashTables: Int = 4, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    import org.apache.spark.ml.functions.array_to_vector
    def prep(df: DataFrame, idAs: String): DataFrame =
      df.select(col("vec_id").as(idAs),
        array_to_vector(VectorOps.l2Normalize(col("embedding"))).as("features"))
    val q = prep(queries, "query_id")
    val n = prep(index, "neighbor_id")
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(seed).setInputCol("features").setOutputCol("hashes")
    val model = lsh.fit(n)
    val joined = model
      .approxSimilarityJoin(q, n, threshold, "dist")
      .select(col("datasetA.query_id").as("query_id"),
        col("datasetB.neighbor_id").as("neighbor_id"),
        (lit(1.0) - col("dist") * col("dist") / 2.0).as("sim"))
      .filter(col("query_id") =!= col("neighbor_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("sim"))
  }

  /** Per-dimension [lo, hi] quantization bounds for [[approxSq8]]:
    * ONE min/max aggregate over the index corpus — the train step of
    * FAISS `IndexScalarQuantizer(QT_8bit)`. Emits a 1-row frame
    * (lo array, hi array, dim-ordered); a session artifact like the
    * IVF centroids / PQ codebook. */
  private[graft] def sq8Stats(index: DataFrame): DataFrame =
    index
      .select(posexplode(col("embedding").cast("array<double>"))
        .as(Seq("d", "v")))
      .groupBy(col("d")).agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      .agg(
        sort_array(collect_list(struct(col("d"), col("lo")))).as("los"),
        sort_array(collect_list(struct(col("d"), col("hi")))).as("his"))
      .select(
        transform(col("los"), s => s.getField("lo")).as("lo"),
        transform(col("his"), s => s.getField("hi")).as("hi"))

  /** SQ8 approximate kNN — the scalar-quantization member of the
    * index ladder (FAISS `IndexScalarQuantizer` QT_8bit; reference
    * builds its FAISS flat indexes in `Neww_Fai.py`): every dimension
    * linearly quantized to 8 bits against the train-time per-dimension
    * [lo, hi], queries score FULL-precision against RECONSTRUCTED
    * index vectors (asymmetric distance), and the top-`rerank`
    * candidates per query re-rank on exact dot products. The stored
    * index is one byte per dimension — 4× smaller than float32, 8×
    * smaller than double — which at 100 TB is the difference between
    * an index that fits executor memory and one that doesn't.
    *
    * Execution reuses the broadcast-heap scan ([[exactBroadcast]]) on
    * the reconstructed vectors, so the approx pass costs exactly one
    * map-side sweep (no Q×N materialization), and the rerank joins
    * touch only Q·rerank candidate rows. Quantize → reconstruct →
    * score is pure IEEE arithmetic (no transcendentals), so the whole
    * pipeline replays bit-for-bit in the SQL oracle. */
  /** Quantize-and-reconstruct expression builder from a collected
    * stats frame (bounded: 2·dim doubles — the quantizer "model",
    * the same tier as the collected PQ codebook/LUT). Shared by the
    * flat [[approxSq8]] and the composed [[approxIvfSq8]]. */
  private def sq8XhatFn(stats: DataFrame): Column => Column = {
    import graft.core.Expr.let
    val row = stats.collect()(0)
    val lo = typedLit(row.getSeq[Double](0))
    val hi = typedLit(row.getSeq[Double](1))
    (x: Column) => let(x) { xv =>
      transform(sequence(lit(0), size(xv) - 1), d => {
        val l = element_at(lo, (d + 1).cast("int"))
        val h = element_at(hi, (d + 1).cast("int"))
        val p = when(h > l,
          least(greatest(
            (element_at(xv, (d + 1).cast("int")) - l) / (h - l), lit(0.0)),
            lit(1.0))).otherwise(lit(0.0))
        l + (floor(p * 255.0 + lit(0.5)) / 255.0) * (h - l)
      })
    }
  }

  def approxSq8(spark: SparkSession, queries: DataFrame, index: DataFrame,
                k: Int, rerank: Int = 20, excludeSelf: Boolean = true,
                statsOpt: Option[DataFrame] = None): DataFrame = {
    val xhatOf = sq8XhatFn(statsOpt.getOrElse(sq8Stats(index)))
    val recon = index.select(col("vec_id"),
      xhatOf(col("embedding").cast("array<double>")).as("embedding"))
    val cands = exactBroadcast(spark, queries, recon, rerank, excludeSelf)
      .toDF("query_id", "neighbor_id", "arnk", "approx")
      .select(col("query_id"), col("neighbor_id"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("q_emb"))
    val n = index.select(col("vec_id").as("neighbor_id"),
      col("embedding").cast("array<double>").as("n_emb"),
      col("label").as("n_label"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    // no broadcast hints: q and n are the full query/index relations
    // (unbounded at corpus scale) — AQE broadcasts when they fit
    cands.join(q, Seq("query_id"))
      .join(n, Seq("neighbor_id"))
      .withColumn("sim", VectorOps.dot(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("sim"), col("n_label"))
  }

  /** IVF-SQ8 composition (FAISS `IndexIVFScalarQuantizer` shape —
    * completing the index matrix: Flat / Sharded / LSH / IVF / PQ /
    * IVF-PQ / SQ8 / IVF-SQ8): the coarse quantizer prunes to
    * `nProbe` lists, SQ8-reconstructed vectors score ONLY within the
    * probed lists (asymmetric — queries stay full-precision), and the
    * top-`nCandidates` per query re-rank on exact dot products.
    * The 10× scale measurement (PERF.md round 6) is the motivation:
    * flat SQ8's whole-corpus approx scan is quadratic in n; list
    * pruning cuts it to nProbe/nCentroids of the corpus per query,
    * with the stored index at one byte per dimension. The candidate
    * join shuffles on centroid id; nothing broadcasts past the
    * bounded centroid set and the collected 2·dim stats. */
  def approxIvfSq8(spark: SparkSession, queries: DataFrame, index: DataFrame,
                   k: Int, nCentroids: Int = 0, nProbe: Int = 4,
                   nCandidates: Int = 100, seed: String = "42",
                   lloydIters: Int = 2,
                   centroidsOpt: Option[DataFrame] = None,
                   assignmentsOpt: Option[DataFrame] = None,
                   statsOpt: Option[DataFrame] = None): DataFrame = {
    val centroids = centroidsOpt.getOrElse(
      ivfCentroids(spark, index, resolveNlist(nCentroids, index), seed,
        lloydIters))
    val assignments = assignmentsOpt.getOrElse(
      nearestCentroids(spark, index, centroids, 1))
    val probes = nearestCentroids(spark, queries, centroids, nProbe)
      .withColumnRenamed("vec_id", "query_id")
    val xhatOf = sq8XhatFn(statsOpt.getOrElse(sq8Stats(index)))
    val recon = index.select(col("vec_id").as("neighbor_id"),
      xhatOf(col("embedding").cast("array<double>")).as("n_hat"))
    val pl = probes.join(
        assignments.select(col("vec_id").as("neighbor_id"), col("centroid_id")),
        Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("q_emb"))
    val wCand = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("neighbor_id"))
    val cand = pl.join(q, Seq("query_id")).join(recon, Seq("neighbor_id"))
      .withColumn("approx", VectorOps.dot(col("q_emb"), col("n_hat")))
      .withColumn("crn", row_number().over(wCand))
      .filter(col("crn") <= nCandidates)
      .select(col("query_id"), col("neighbor_id"))
    val nv = index.select(col("vec_id").as("neighbor_id"),
      col("embedding").cast("array<double>").as("n_emb"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cand.join(q, Seq("query_id")).join(nv, Seq("neighbor_id"))
      .withColumn("sim", VectorOps.dot(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("sim"))
  }
}

package graft.vector

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.core.Tables
import graft.metrics.Evaluation
import graft.normalize.Normalize

/** L7: the two-headed classifier over embeddings (reference
  * `fai_combined_3_12.py:54-128` — a torch MLP trunk with doc-type and
  * first_pg heads under summed CE losses; joint eval
  * `combined_fai_3_13.py:12-102,351-385`).
  *
  * MLlib has no shared-trunk multi-task trainer, so per SURVEY's
  * mapping the two heads are two seeded models over the SAME feature
  * column: a MultilayerPerceptronClassifier for the 10-class doc-type
  * head and a LogisticRegression for the binary first_pg head. The
  * synthetic corpus has no first-page column, so the first_pg ground
  * truth is the sign of the first embedding component — like the
  * reference's signal it is a function of page CONTENT (learnable
  * from features), unlike the f04 parity rule, which stays as the
  * oracle-checked composite-key twin.
  *
  * HASH-CHECKED SCORING: training itself can never be replayed by a
  * SQL oracle, but scoring a FITTED model is plain linear algebra —
  * so the fitted parameters are exported as flat weight frames
  * (session artifacts, trained once), the l05/l06 queries score
  * relationally from those weights (sigmoid/argmax over per-row
  * folds, the eval half of `combined_fai_3_13.py:12-102`), and
  * [[oracles]] emits DuckDB SQL with the SAME fitted weights embedded
  * as list literals — identical folds in identical order, so the
  * predictions hash-match bitwise. Only `fit()` stays outside the
  * oracle; the spec pins relational scoring ≡ `model.transform`.
  */
object MlPack extends QueryPack {

  private def memoized(spark: SparkSession, dir: String, key: String)
                      (build: => DataFrame): DataFrame =
    graft.core.Artifacts.memo(spark, s"ml_$key:$dir")(build)

  private[graft] def features(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    Tables(spark, dir).embeddings
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("emb"),
        array_to_vector(col("embedding").cast("array<double>")).as("features"))
  }

  // --- training (once per session, behind the weight artifacts) ---

  private def trainMlp(spark: SparkSession, dir: String)
      : org.apache.spark.ml.classification.MultilayerPerceptronClassificationModel = {
    import org.apache.spark.ml.classification.MultilayerPerceptronClassifier
    val data = features(spark, dir)
      .select(col("vec_id"), col("label").cast("double").as("label"),
        col("features"))
    new MultilayerPerceptronClassifier()
      .setLayers(Array(64, 32, 10))
      .setSeed(42L).setMaxIter(40).setBlockSize(64)
      .fit(data)
  }

  private def trainFirstPg(spark: SparkSession, dir: String)
      : org.apache.spark.ml.classification.LogisticRegressionModel = {
    import org.apache.spark.ml.classification.LogisticRegression
    val data = features(spark, dir)
      .select(col("vec_id"),
        (element_at(col("emb"), 1) > 0).cast("double").as("label"),
        col("features"))
    // LogisticRegression exposes NO seed param (Spark ML declares none
    // — LBFGS from a fixed zero init has no randomness to seed), so
    // determinism rests on the deterministic optimizer; the MlSpec
    // train-twice assertion pins it empirically.
    new LogisticRegression().setMaxIter(50).fit(data)
  }

  /** MLP head parameters as ONE flat weight vector (MLlib layout for
    * layers [64,32,10]: W1 column-major 64×32, b1[32], W2 column-major
    * 32×10, b2[10] — 2410 doubles, one row). Session artifact: the
    * training cost lives here; every scoring consumer reads it. */
  def mlpWeights(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "mlp_weights") {
      import spark.implicits._
      Seq(Tuple1(trainMlp(spark, dir).weights.toArray.toSeq)).toDF("wv")
    }

  /** first_pg head parameters: 64 coefficients then the intercept
    * (65 doubles, one row). Session artifact. */
  def firstPgWeights(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "first_pg_weights") {
      import spark.implicits._
      val m = trainFirstPg(spark, dir)
      Seq(Tuple1(m.coefficients.toArray.toSeq :+ m.intercept)).toDF("wv")
    }

  /** Fitted parameter vectors, recorded when a query collects them,
    * so [[oracles]] can embed the SAME doubles as SQL literals at
    * Verify's post-run dump. (Verify runs every query before it dumps
    * oracle SQL; a targeted run that skips l05/l06 simply omits their
    * oracle entries — the weaker rows-only check.)
    *
    * Keyed by (session object, data dir) — the [[graft.core.Artifacts]]
    * keying discipline — NOT a JVM-global last-write var: if scoring
    * ever runs against two dirs (or two live sessions share the JVM),
    * a single-slot record would embed whichever dir ran last and the
    * emitted oracle would silently mismatch the dir being verified.
    * [[oraclesFor]] resolves the recording FOR the dir being dumped
    * (two dirs scored in one JVM each get their own weights); the
    * dir-less [[oracles]] emits only when exactly one live recording
    * exists. Ambiguity degrades to omission (rows-only check), never
    * to a wrong oracle. */
  private val mlpWvRec =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Seq[Double]]
  private val lrWvRec =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Seq[Double]]

  /** The sole live recording, if unambiguous (stopped-session entries
    * evicted first, mirroring Artifacts.memo). */
  private def soleLive(
      m: scala.collection.concurrent.TrieMap[(SparkSession, String), Seq[Double]])
      : Option[Seq[Double]] = {
    m.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    val snap = m.readOnlySnapshot().toSeq
    if (snap.size == 1) Some(snap.head._2) else None
  }

  /** The recording for ONE dir, live sessions only. Training is
    * deterministic per dir, so two live sessions that both scored the
    * same dir recorded the same doubles — `distinct` collapses them;
    * a genuine conflict (should be impossible) degrades to omission,
    * never to a coin-flip oracle. */
  private def forDir(
      m: scala.collection.concurrent.TrieMap[(SparkSession, String), Seq[Double]],
      dir: String): Option[Seq[Double]] = {
    m.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    val vs = m.readOnlySnapshot().toSeq
      .collect { case ((_, d), wv) if d == dir => wv }.distinct
    if (vs.size == 1) Some(vs.head) else None
  }

  private def collectWv(df: DataFrame): Seq[Double] =
    // bounded driver collect: one row of ≤2410 doubles (model size)
    df.collect()(0).getSeq[Double](0)

  // --- relational scoring (the hash-checked surface) ---

  // MLlib flat layout (0-based): W1(i,j) at i*32+j · b1(j) at 2048+j
  // · W2(j,k) at 2080+j*10+k · b2(k) at 2400+k — mirrored 1-based in
  // the oracle's DuckDB list indexing.
  /** Relational MLP scoring from a flat weight vector: h = σ(W1ᵀx+b1)
    * rounded to 9 decimals (the a08 transcendental-rounding
    * discipline), logits = W2ᵀh+b2, argmax with first-index ties.
    *
    * Bitwise equality with the un-rounded [[mlpPlan]] transform twin
    * (and the DuckDB oracle's exp()) cannot be GUARANTEED: a logit
    * pair closer than ~1e-9, or an engine exp() differing by an ULP
    * exactly at a round-half boundary, could flip an argmax. The
    * parity spec therefore asserts with an explicit tolerance ON THE
    * LOGITS (via [[mlpLogits]]/[[lrMargins]]): a prediction
    * disagreement is legal ONLY where the top-2 logit gap (resp.
    * |margin|) is within the rounding tolerance — a decisive-margin
    * flip fails the spec as a real scoring bug, while a boundary tie
    * after a data regen does not break the build.
    *
    * The mat-vec products are UNROLLED into 32+10 native [[graft
    * .plans.ArrayDot]] calls against per-column weight literals, so
    * the whole scorer runs inside whole-stage codegen — an HOF
    * `aggregate` formulation executes interpreted, two lambda closures
    * per element. `ArrayDot` performs the same sequential left fold as
    * the oracle's `list_reduce`, so every double matches bitwise.
    * Each unrolled stage lands in its own projection whose alias is
    * referenced MANY times statically (32×/10×/2×), which keeps
    * CollapseProject from inlining it (the a07 pitfall). Pure
    * scan-stage expressions: no shuffle, no UDF. */
  private[graft] def mlpScore(df: DataFrame, wv: Seq[Double]): DataFrame =
    mlpLogits(df, wv)
      .select(col("vec_id"),
        col("label").cast("long").as("true_label"),
        (array_position(col("ll"), array_max(col("ll"))) - 1)
          .cast("long").as("pred_label"))
      .orderBy(col("vec_id"))

  /** The logit stage of [[mlpScore]] — (vec_id, label, ll) with the
    * rounded 10-logit array exposed, so the parity spec can assert
    * its tolerance ON THE LOGITS: a relational-vs-transform
    * prediction disagreement is acceptable ONLY where the top-2 logit
    * gap is inside the rounding tolerance (a genuine tie at the
    * 1e-9 boundary), never where the margin is decisive. */
  private[graft] def mlpLogits(df: DataFrame, wv: Seq[Double]): DataFrame = {
    def w1col(j: Int): Seq[Double] = (0 until 64).map(i => wv(i * 32 + j))
    def w2col(k: Int): Seq[Double] = (0 until 32).map(j => wv(2080 + j * 10 + k))
    val hidden = array((0 until 32).map { j =>
      round(lit(1.0) / (lit(1.0) + exp(-(lit(wv(2048 + j)) +
        graft.plans.ArrayDot.dotNative(col("emb"), typedLit(w1col(j)))))), 9)
    }: _*)
    val logits = array((0 until 10).map { k =>
      round(lit(wv(2400 + k)) +
        graft.plans.ArrayDot.dotNative(col("hh"), typedLit(w2col(k))), 9)
    }: _*)
    df.select(col("vec_id"), col("label"), hidden.as("hh"))
      .select(col("vec_id"), col("label"), logits.as("ll"))
  }

  /** Relational logistic scoring: margin = Σ cᵢxᵢ + b (same fold
    * order as the oracle), predict 1 iff margin > 0 — exactly MLlib's
    * 0.5-threshold decision on σ(margin). */
  private[graft] def lrScore(df: DataFrame, wv: Seq[Double]): DataFrame =
    lrMargins(df, wv)
      .select(col("vec_id"),
        (element_at(col("emb"), 1) > 0).cast("long").as("true_first_pg"),
        (col("margin") > 0).cast("long").as("pred_first_pg"))
      .orderBy(col("vec_id"))

  /** The margin stage of [[lrScore]] — (vec_id, emb, margin) — so the
    * parity spec can require any relational-vs-transform decision
    * flip to sit within tolerance of the 0.5-probability boundary
    * (|margin| ≤ tol), not at a decisive margin. */
  private[graft] def lrMargins(df: DataFrame, wv: Seq[Double]): DataFrame =
    df.select(col("vec_id"), col("emb"),
      (graft.plans.ArrayDot.dotNative(col("emb"),
        typedLit(wv.take(64))) + lit(wv(64))).as("margin"))

  /** Doc-type head (l05): train-once weights, score relationally. */
  def mlpClassify(spark: SparkSession, dir: String): DataFrame = {
    val wv = collectWv(mlpWeights(spark, dir))
    mlpWvRec.put((spark, dir), wv)
    mlpScore(features(spark, dir), wv)
  }

  /** first_pg head: train-once weights, score relationally. */
  def firstPgClassify(spark: SparkSession, dir: String): DataFrame = {
    val wv = collectWv(firstPgWeights(spark, dir))
    lrWvRec.put((spark, dir), wv)
    lrScore(features(spark, dir), wv)
  }

  /** Model.transform twins of the two heads — the MlSpec pins
    * (a) train-twice determinism and (b) relational scoring ≡ MLlib
    * scoring through these seams. Not memoized: each call retrains. */
  private[graft] def mlpPlan(spark: SparkSession, dir: String): DataFrame =
    trainMlp(spark, dir).transform(features(spark, dir)
        .select(col("vec_id"), col("label").cast("double").as("label"),
          col("features")))
      .select(col("vec_id"),
        col("label").cast("long").as("true_label"),
        col("prediction").cast("long").as("pred_label"))
      .orderBy(col("vec_id"))

  /** Un-memoized first_pg transform twin (see [[mlpPlan]]). */
  private[graft] def firstPgPlan(spark: SparkSession, dir: String): DataFrame =
    trainFirstPg(spark, dir).transform(features(spark, dir)
        .select(col("vec_id"),
          (element_at(col("emb"), 1) > 0).cast("double").as("label"),
          col("features")))
      .select(col("vec_id"),
        col("label").cast("long").as("true_first_pg"),
        col("prediction").cast("long").as("pred_first_pg"))
      .orderBy(col("vec_id"))

  /** L7 joint eval (`combined_fai_3_13.py:351-385`): both trained
    * heads' predictions joined per vector, scored on the composite
    * "label:first_pg" exact-match key with per-class and Overall
    * rows — the f04 shape, from two REAL heads. */
  def jointEval(spark: SparkSession, dir: String): DataFrame = {
    val joined = mlpClassify(spark, dir)
      .join(firstPgClassify(spark, dir), Seq("vec_id"))
      .select(col("vec_id"),
        Normalize.compositeKey(col("true_label"),
          col("true_first_pg") === 1L).as("actual"),
        Normalize.compositeKey(col("pred_label"),
          col("pred_first_pg") === 1L).as("predicted"))
    Evaluation.accuracyTable(joined, col("actual"),
        (col("actual") === col("predicted")).cast("int"))
      .orderBy(col("field"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l05_mlp_classify" -> mlpClassify,
    "l06_joint_two_head" -> jointEval)

  override val artifacts: Map[String, (SparkSession, String) => DataFrame] =
    Map("ml_mlp_weights" -> mlpWeights,
      "ml_first_pg_weights" -> firstPgWeights)

  // --- oracle SQL with the fitted weights as literals ---

  private def fmt(xs: Seq[Double]): String =
    xs.map(d => java.lang.Double.toString(d)).mkString("[", ", ", "]")

  /** The MLP scoring CTE chain ending in mp(vec_id, true_label,
    * pred_label) — identical folds/rounding to [[mlpScore]]. */
  private def mlpCte(mw: Seq[Double]): String = s"""
    |wt AS (SELECT ${fmt(mw)}::DOUBLE[] AS wv),
    |e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
    |h AS (SELECT vec_id, label, wv, list_transform(generate_series(0, 31), j ->
    |    round(1.0 / (1.0 + exp(-( wv[2049 + j] +
    |      list_reduce([0.0] || list_transform(generate_series(0, 63), i ->
    |        x[i + 1] * wv[i * 32 + j + 1]), (a, b) -> a + b) ))), 9)) AS hh
    |  FROM e CROSS JOIN wt),
    |lg AS (SELECT vec_id, label, list_transform(generate_series(0, 9), k ->
    |    round(wv[2401 + k] +
    |      list_reduce([0.0] || list_transform(generate_series(0, 31), j ->
    |        hh[j + 1] * wv[2081 + j * 10 + k]), (a, b) -> a + b), 9)) AS ll
    |  FROM h),
    |mp AS (SELECT vec_id, CAST(label AS BIGINT) AS true_label,
    |    CAST(list_position(ll, list_max(ll)) - 1 AS BIGINT) AS pred_label
    |  FROM lg)""".stripMargin

  /** The logistic scoring CTE fp(vec_id, true_first_pg,
    * pred_first_pg) — identical fold to [[lrScore]]. */
  private def lrCte(lw: Seq[Double]): String = s"""
    |wl AS (SELECT ${fmt(lw)}::DOUBLE[] AS cv),
    |e2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
    |fp AS (SELECT vec_id,
    |    CASE WHEN x[1] > 0 THEN 1 ELSE 0 END AS true_first_pg,
    |    CASE WHEN list_reduce([0.0] || list_transform(generate_series(0, 63), i ->
    |        x[i + 1] * cv[i + 1]), (a, b) -> a + b) + cv[65] > 0
    |      THEN 1 ELSE 0 END AS pred_first_pg
    |  FROM e2 CROSS JOIN wl)""".stripMargin

  private def l05Sql(mw: Seq[Double]): String = s"""
    |WITH ${mlpCte(mw)}
    |SELECT vec_id, true_label, pred_label FROM mp ORDER BY vec_id""".stripMargin

  private def l06Sql(mw: Seq[Double], lw: Seq[Double]): String = s"""
    |WITH ${mlpCte(mw)},
    |${lrCte(lw)},
    |c AS (SELECT CAST(m.true_label AS VARCHAR) || ':' ||
    |    (CASE WHEN f.true_first_pg = 1 THEN 'true' ELSE 'false' END) AS actual,
    |    CAST(m.pred_label AS VARCHAR) || ':' ||
    |    (CASE WHEN f.pred_first_pg = 1 THEN 'true' ELSE 'false' END) AS predicted
    |  FROM mp m JOIN fp f ON m.vec_id = f.vec_id)
    |SELECT coalesce(actual, 'Overall') AS field,
    |  CAST(sum(CASE WHEN actual = predicted THEN 1 ELSE 0 END) AS BIGINT) AS correct,
    |  count(*) AS support,
    |  CAST(CAST(sum(CASE WHEN actual = predicted THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
    |    / CAST(count(*) AS DOUBLE) AS accuracy
    |FROM c GROUP BY ROLLUP(actual) ORDER BY field""".stripMargin

  private def buildOracles(mwOpt: Option[Seq[Double]],
                           lwOpt: Option[Seq[Double]]): Map[String, String] = {
    val l05 = mwOpt.map(mw => "l05_mlp_classify" -> l05Sql(mw))
    val l06 = for { mw <- mwOpt; lw <- lwOpt } yield
      "l06_joint_two_head" -> l06Sql(mw, lw)
    (l05.toSeq ++ l06.toSeq).toMap
  }

  /** Emitted AFTER the queries run (Verify's dump order): the fitted
    * weights recorded by the scoring queries become SQL literals, so
    * the oracle replays the exact prediction arithmetic — `fit()` is
    * the only piece outside the check. The dir-less form requires ONE
    * unambiguous live recording (omission otherwise); Verify uses
    * [[oraclesFor]], which pairs each dir with its OWN weights even
    * when several dirs were scored in the same JVM. */
  override def oracles: Map[String, String] =
    buildOracles(soleLive(mlpWvRec), soleLive(lrWvRec))

  override def oraclesFor(dir: String): Map[String, String] =
    buildOracles(forDir(mlpWvRec, dir), forDir(lrWvRec, dir))
}

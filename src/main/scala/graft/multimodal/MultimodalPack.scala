package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.core.Tables

/** Oracle-checked multimodal plumbing queries: synthetic binary media
  * derived from `documents`, decoded/resized/frame-sampled with pure
  * expressions (the mapPartitions stage is spec-checked equal to the
  * expression twin — DuckDB can't slice blobs, so its side of these
  * oracles works on the hex view). */
object MultimodalPack extends QueryPack {

  /** media table: one synthetic 64-byte blob per document. */
  def media(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id").as("media_id"),
        Multimodal.syntheticContent(col("text")).as("content"))

  def decodeMeta(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir).select(col("media_id"),
        Multimodal.widthOf(col("content")).cast("long").as("width"),
        Multimodal.heightOf(col("content")).cast("long").as("height"),
        Multimodal.formatOf(col("content")).as("format"),
        length(col("content")).cast("long").as("n_bytes"))
      .orderBy(col("media_id"))

  def frames(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir)
      .select(col("media_id"),
        explode(Multimodal.sampleFrames(col("content"), 3)).as("f"))
      .select(col("media_id"),
        col("f.frame_idx").cast("long").as("frame_idx"),
        col("f.frame_val").as("frame_val"))
      .orderBy(col("media_id"), col("frame_idx"))

  def resized(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir)
      .select(col("media_id"),
        length(Multimodal.resize(col("content"), 16)).cast("long").as("n_bytes"),
        md5(Multimodal.hexOf(Multimodal.resize(col("content"), 16)))
          .as("content_md5"))
      .orderBy(col("media_id"))

  /** mm04: WebDataset-style SIZE-BOUNDED SHARD PLAN — the layout step
    * that turns a multimodal corpus into sequentially-readable
    * training shards (tar-shard discipline: fill each shard with
    * consecutive samples until the byte budget is crossed, never
    * split a sample). Payload = media blob (64 B) + text sidecar
    * bytes. Assignment is a byte-offset division over the corpus
    * prefix sum, computed by the SAME two-pass distributed prefix
    * sum as t07 ([[graft.text.SequencePacking.packSequences]]) — no
    * global window, one row per partition collected — so the plan
    * holds at 100 TB where a `Window.orderBy` cumsum would funnel
    * everything through one task. The rollup emits one row per shard
    * (contiguous id ranges, item counts, byte totals); the DuckDB
    * oracle replays the prefix sum with a window — identical integer
    * arithmetic at test scale, the contrast between the two forms
    * being exactly the scale story. */
  def shardPlan(spark: SparkSession, dir: String,
                shardBytes: Long = 4096L): DataFrame = {
    val m = Tables(spark, dir).documents
      .select(col("doc_id").as("media_id"),
        (octet_length(col("text")).cast("long") + lit(64L))
          .as("payload_bytes"))
    graft.text.SequencePacking
      .packSequences(m, col("media_id"), col("payload_bytes"), shardBytes)
      .groupBy(col("seq_id").as("shard_id"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("n_tok")).as("shard_bytes"),
        min(col("id")).as("first_id"),
        max(col("id")).as("last_id"))
      .select(col("shard_id"), col("n_items"), col("shard_bytes"),
        col("first_id"), col("last_id"))
      .orderBy(col("shard_id"))
  }

  val ShardBytes = 4096L

  /** mm05's write half: materialize mm04's plan — every (media, text)
    * sample lands in its assigned shard's OWN directory
    * (partitionBy(shard_id); at 100 TB each shard directory is the
    * unit a training loader streams sequentially, the tar-shard
    * discipline mm04's scaladoc describes). Returns the dataset root.
    * Per-application path, same race discipline as i08. */
  private[graft] def shardedWriteDir(spark: SparkSession, dir: String,
                                     shardBytes: Long = ShardBytes): String = {
    // per-application paths are never reused by a later JVM — register
    // for exit-time cleanup so rounds don't accumulate shard trees
    val out = graft.core.TempDirs.cleanupOnExit(
      s"target/mm_shards_${dir.replaceAll("[^A-Za-z0-9]", "_")}" +
        s"_${spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")}")
    val docs = Tables(spark, dir).documents
      .select(col("doc_id").as("media_id"), col("text"))
    val m = docs.select(col("media_id"),
      (octet_length(col("text")).cast("long") + lit(64L)).as("payload_bytes"))
    val plan = graft.text.SequencePacking
      .packSequences(m, col("media_id"), col("payload_bytes"), shardBytes)
      .select(col("id").as("media_id"), col("seq_id").as("shard_id"),
        col("n_tok").as("payload_bytes"))
    // id-keyed join of the assignment back onto the payload — both
    // sides partition on media_id, no broadcast needed at any scale
    docs.join(plan, Seq("media_id"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(out)
    out
  }

  /** mm05: the shard plan MATERIALIZED and read back — mm04 gains its
    * consumer (round-8 verdict item: the plan operator had no
    * materialization). The oracle replays the assignment and the
    * per-sample content hash from `documents` alone, so any sample
    * lost, duplicated, or mangled across the plan→partitioned-write→
    * read chain fails the hash; the spec asserts the on-disk layout
    * (one directory per planned shard, per-shard row counts equal the
    * plan, shard bytes bounded by budget + one sample overhang). */
  def shardedRoundtrip(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(shardedWriteDir(spark, dir))
      .select(col("media_id"), col("shard_id").cast("long").as("shard_id"),
        col("payload_bytes"), md5(col("text")).as("text_md5"))
      .orderBy(col("media_id"))

  /** The mm06 fixture: every document's ORIGINAL encoding plus a
    * planted RE-ENCODE of each doc_id % 10 == 0 and a planted RESIZE
    * of each doc_id % 10 == 5 — same latent scene, different container
    * bytes, so exact md5 dedup misses every planted pair (spec-pinned)
    * while the perceptual hash catches them. Variant ids sit in
    * disjoint ranges (+10M / +20M), the corpusPrep discipline. */
  private[graft] def sceneMedia(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents.select(col("doc_id"), col("text"))
    def enc(idOff: Long, tag: String,
            pred: org.apache.spark.sql.Column): DataFrame =
      docs.filter(pred).select((col("doc_id") + idOff).as("media_id"),
        Multimodal.sceneContent(col("text"), tag).as("content"))
    enc(0L, "enc0", lit(true))
      .unionByName(enc(10000000L, "enc1", col("doc_id") % 10 === 0))
      .unionByName(enc(20000000L, "enc2", col("doc_id") % 10 === 5))
  }

  /** mm06: PERCEPTUAL-HASH image near-dup mining — the dedup modality
    * text digests and embeddings don't cover: a re-encoded or resized
    * image changes every container byte (md5 misses it) but keeps the
    * pixel surface. 60-bit dHash over the decoded/normalized pixel
    * grid ([[Multimodal.dhash]] — the FakeDecoder seam), then the
    * d04/d10 banded Hamming machinery verbatim
    * ([[graft.dedup.Dedup.hammingPairsBandedOf]], 5×12-bit bands,
    * maxDist 4): pigeonhole candidate join on band values, exact
    * popcount filter, never an all-pairs scan.
    *
    * Scale shape: EXACT-COLLAPSE first (RefinedWeb §3.3, the d18/d20
    * lesson) — byte-identical copies (the scale corpus replicates
    * text, hence content, verbatim) resolve at the digest tier and
    * only one representative per distinct content enters the
    * perceptual join, so dup-heavy growth never reaches the band
    * buckets; and dHash values are md5-derived (uniform bits, unlike
    * vocabulary-correlated text simhashes), so band buckets stay at
    * the 2^-12 background rate. */
  def imageNearDups(spark: SparkSession, dir: String): DataFrame = {
    val m = sceneMedia(spark, dir)
    val reps = m.groupBy(md5(Multimodal.hexOf(col("content"))).as("d"))
      .agg(min(col("media_id")).as("media_id"))
      .select(col("media_id"))
    val sig = m.join(reps, Seq("media_id"), "left_semi")
      .select(col("media_id").as("id"),
        Multimodal.dhash(col("content")).as("simhash"))
    graft.dedup.Dedup.hammingPairsBandedOf(sig, maxDist = 4,
        bits = Multimodal.DhashBits)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** The mm07 fixture: one synthetic VIDEO per document — 8 frames,
    * frame j's latent scene keyed on (text, j) through the mm06 scene
    * layout — plus, for every doc_id % 10 == 3, a planted re-encoded
    * CLIP of frames 2..5 as its own 4-frame video (id + 10M, the
    * corpusPrep disjoint-range discipline): same latent frame scenes,
    * different encoder tag, so every container byte differs while the
    * decoded pixel surfaces nearly match frame-for-frame. */
  private[graft] def videoFrames(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents.select(col("doc_id"), col("text"))
    def enc(idOff: Long, tag: String, n: Int, seedOff: Int,
            pred: org.apache.spark.sql.Column): DataFrame =
      docs.filter(pred)
        .select((col("doc_id") + idOff).as("video_id"),
          posexplode(array((0 until n).map(j =>
            Multimodal.sceneContent(
              concat(col("text"), lit("|f"), lit((j + seedOff).toString)),
              tag)): _*)).as(Seq("frame_idx", "content")))
        .select(col("video_id"),
          col("frame_idx").cast("long").as("frame_idx"), col("content"))
    enc(0L, "v0", 8, 0, lit(true))
      .unionByName(enc(10000000L, "v1", 4, 2, col("doc_id") % 10 === 3))
  }

  /** mm07: FRAME-LEVEL video near-dup CONTAINMENT — the multimodal dup
    * class mm06's whole-content hash cannot see: a re-encoded clip
    * embedded in (or cut from) a longer video shares no container
    * bytes AND no overall length with its source, but its decoded
    * frames pair off one-to-one with a contiguous frame range of the
    * source. Composes the per-frame plumbing of mm02 with mm06's
    * perceptual machinery: dHash every decoded frame
    * ([[Multimodal.dhash]] — the FakeDecoder seam), mine near-dup
    * FRAME pairs with the d04/d10 banded Hamming join
    * ([[graft.dedup.Dedup.hammingPairsBandedOf]]) over struct
    * (video, frame) keys, then roll frame matches up to video level
    * requiring ONE CONSISTENT temporal offset (group by fa − fb)
    * that covers EVERY frame of the shorter video — offset-consistent
    * containment as a plain aggregation, no alignment loop. The whole
    * body is [[clipContainment]] (shared with the mm08 audio form);
    * see its scaladoc for the scale shape, the in-join same-video
    * exclusion, and the representative-front scope. */
  def videoClipDups(spark: SparkSession, dir: String): DataFrame =
    clipContainment(
        videoFrames(spark, dir).select(col("video_id").as("item_id"),
          col("frame_idx").as("unit_idx"), col("content")),
        Multimodal.dhash, maxDist = 4, bits = Multimodal.DhashBits)
      .select(col("a_item").as("a_vid"), col("b_item").as("b_vid"),
        col("unit_offset").as("frame_offset"),
        col("n_matched"), col("max_hamming"))
      .orderBy(col("a_vid"), col("b_vid"), col("frame_offset"))

  /** Offset-consistent clip containment over any per-unit media
    * relation `(item_id, unit_idx, content)` — the shared body of mm07
    * (video frames) and mm08 (audio windows): exact-collapse at the
    * unit level, perceptual fingerprint per representative unit
    * (`fp` — the FakeDecoder seam), the d04/d10 banded Hamming join,
    * then the containment rollup (one consistent a−b offset covering
    * every unit of the shorter item).
    *
    * Keys are STRUCT composites (item, unit) — no arithmetic packing,
    * so unit counts per item are UNBOUNDED (the r13 verdict's
    * composite-id cap is gone; a 120-frame video is spec-pinned).
    * Struct ordering is (item, unit)-lexicographic on both engines,
    * so representative selection matches the oracle's min() over the
    * packed form wherever both are defined. The same-item exclusion
    * runs INSIDE the band join ([[graft.dedup.Dedup
    * .hammingPairsBandedOf]]'s pair predicate): real video/audio is
    * temporally self-similar, so dense unit sampling would otherwise
    * push per-item-quadratic intra-item pairs through the cross-band
    * dedup shuffle only to be discarded.
    *
    * Representative-front scope (the d22 stance, here explicitly):
    * containment is reported between CONTENT-REPRESENTATIVE items —
    * unit counts come from the full unit set, while matches are mined
    * over digest representatives, so an item whose units partially
    * exact-collapse with a third item's units is vouched for by its
    * representatives' pairs only. The fixtures key unit digests on
    * per-doc text, so cross-item exact collapse cannot occur there;
    * a corpus with verbatim-shared units between DIFFERENT items
    * should resolve exact unit-level duplicates first (d18's
    * keep-best discipline) exactly as d22 does for text. */
  private[graft] def clipContainment(units: DataFrame, fp: Column => Column,
                                     maxDist: Int, bits: Int): DataFrame = {
    // cut + spread: the unit fan-out (posexploded frames/windows) is
    // tens of bytes per row but each row pays a full fingerprint
    // downstream — byte-proportional splits serialize that compute
    val u = graft.core.Caches.cut(units.repartition(
      units.sparkSession.sparkContext.defaultParallelism))
    val nf = u.groupBy(col("item_id")).agg(count(lit(1)).as("nunits"))
    def key(item: Column, unit: Column) =
      struct(item.as("item"), unit.as("unit"))
    val reps = u.groupBy(md5(Multimodal.hexOf(col("content"))).as("d"))
      .agg(min(key(col("item_id"), col("unit_idx"))).as("id"))
      .select(col("id"))
    val sig = u
      .select(key(col("item_id"), col("unit_idx")).as("id"),
        fp(col("content")).as("simhash"))
      .join(reps, Seq("id"), "left_semi")
    val pairs = graft.dedup.Dedup.hammingPairsBandedOf(sig, maxDist, bits,
      pairPredicate = col("a_id.item") =!= col("b_id.item"))
    val rolled = pairs
      .select(col("a_id.item").as("a_item"), col("a_id.unit").as("fa"),
        col("b_id.item").as("b_item"), col("b_id.unit").as("fb"),
        col("hamming"))
      .withColumn("unit_offset", col("fa") - col("fb"))
      .groupBy(col("a_item"), col("b_item"), col("unit_offset"))
      .agg(count(lit(1)).as("n_matched"),
        max(col("hamming")).as("max_hamming"))
    rolled
      .join(nf.select(col("item_id").as("a_item"), col("nunits").as("nfa")),
        Seq("a_item"))
      .join(nf.select(col("item_id").as("b_item"), col("nunits").as("nfb")),
        Seq("b_item"))
      .filter(col("n_matched") === least(col("nfa"), col("nfb")))
      .select(col("a_item"), col("b_item"), col("unit_offset"),
        col("n_matched"), col("max_hamming"))
  }

  /** The mm08 fixture: one synthetic AUDIO per document — 6 one-second
    * windows, window j's latent scene keyed on (text, j) through the
    * mm06 scene layout with audio tags — plus, for every doc_id % 10
    * == 7, a planted re-encoded TRIM of windows 2..4 as its own
    * 3-window audio (id + 10M): same latent windows, different codec
    * tag, so every container byte differs while the decoded chroma
    * surfaces nearly match window-for-window. */
  private[graft] def audioWindows(spark: SparkSession,
                                  dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents.select(col("doc_id"), col("text"))
    def enc(idOff: Long, tag: String, n: Int, seedOff: Int,
            pred: org.apache.spark.sql.Column): DataFrame =
      docs.filter(pred)
        .select((col("doc_id") + idOff).as("audio_id"),
          posexplode(array((0 until n).map(j =>
            Multimodal.sceneContent(
              concat(col("text"), lit("|w"), lit((j + seedOff).toString)),
              tag)): _*)).as(Seq("window_idx", "content")))
        .select(col("audio_id"),
          col("window_idx").cast("long").as("window_idx"), col("content"))
    enc(0L, "a0", 6, 0, lit(true))
      .unionByName(enc(10000000L, "a1", 3, 2, col("doc_id") % 10 === 7))
  }

  /** mm08: AUDIO clip containment — the chromaprint modality of the
    * mm07 machinery, completing the near-dup identity matrix (image
    * mm06, video mm07, audio THIS): a re-encoded or trimmed audio
    * clip shares no container bytes and no overall length with its
    * source, but its decoded chroma windows pair off one-to-one with
    * a contiguous window range. Per-window chromaprint-style
    * fingerprint ([[Multimodal.chromaHash]] — gradient signs over the
    * 12×6 chroma grid, the FakeDecoder seam), then the shared
    * [[clipContainment]] body: exact-collapse at the window level,
    * the banded Hamming join with the same-audio exclusion in-join,
    * offset-consistent containment as a plain aggregation. */
  def audioClipDups(spark: SparkSession, dir: String): DataFrame =
    clipContainment(
        audioWindows(spark, dir).select(col("audio_id").as("item_id"),
          col("window_idx").as("unit_idx"), col("content")),
        Multimodal.chromaHash, maxDist = 4, bits = Multimodal.ChromaBits)
      .select(col("a_item").as("a_aid"), col("b_item").as("b_aid"),
        col("unit_offset").as("window_offset"),
        col("n_matched"), col("max_hamming"))
      .orderBy(col("a_aid"), col("b_aid"), col("window_offset"))

  /** The s12 media-gate fixture: every document's base encoding, a
    * planted RE-ENCODE of each doc_id % 10 == 0 (same latent scene,
    * every container byte different — the duplicate class only the
    * perceptual screen catches), and planted EXACT byte copies
    * (doc_id < 50 — copies of history; 300 ≤ doc_id < 350 — copies of
    * same-batch media) in disjoint id ranges. History = media_id <
    * 300; the arriving batch = everything else, so all four verdicts
    * carry real rows. */
  private[graft] def gateMedia(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents.select(col("doc_id"), col("text"))
    def enc(idOff: Long, tag: String,
            pred: org.apache.spark.sql.Column): DataFrame =
      docs.filter(pred).select((col("doc_id") + idOff).as("media_id"),
        Multimodal.sceneContent(col("text"), tag).as("content"))
    enc(0L, "enc0", lit(true))
      .unionByName(enc(10000000L, "enc1", col("doc_id") % 10 === 0))
      .unionByName(enc(30000000L, "enc0", col("doc_id") < 50 ||
        (col("doc_id") >= 300 && col("doc_id") < 350)))
  }

  /** The MEDIA ingest gate's per-batch screen — [[graft.dedup
    * .DedupPack.dedupGateWithState]]'s shape for binary media: exact
    * content-digest screen first (dup_of_history / dup_in_batch — a
    * byte-identical re-upload must never reach fingerprint
    * computation, the d18 discipline), then the 60-bit perceptual
    * dHash of the digest-new remainder probed against HISTORY
    * fingerprint state through the banded Hamming join
    * ([[graft.dedup.Dedup.hammingProbeBanded]], maxDist 4) —
    * near_dup_of_history (best = min (hamming, hist_id)), else new.
    * Returns (decisions, new digests (h), new fingerprints (id, fp))
    * so the streaming caller appends history state WITHOUT a second
    * decode/dHash pass — the screen's own per-survivor fingerprints
    * are computed once and filtered to the admitted ids.
    *
    * Fuzzy scope matches the text gate (and the s12 oracle): the
    * perceptual probe runs against HISTORY only — two re-encodes of
    * one scene arriving in the SAME batch both admit as 'new' and
    * both enter the fingerprint state. Decisions are unordered; the
    * s12 entry point adds its own orderBy. */
  private[graft] def mediaGateWithState(histDigests: DataFrame,
                                        histFps: DataFrame,
                                        batch: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    // Lineage-CUT the digest relation (not just cache it): the gate's
    // downstream branches re-canonicalize whatever plan sits here on
    // every action, and the synthetic-content expression trees make
    // that seconds of driver work (PerfProbe s12split; guide §3.3 —
    // materialising an intermediate truncates the plan). The
    // repartition spreads the per-row digest/dHash compute over the
    // cluster — content is tens of bytes/row while the fingerprint
    // math is the cost, so byte-proportional scan splits underfeed it.
    val par = batch.sparkSession.sparkContext.defaultParallelism
    val b = graft.core.Caches.cut(
      batch.repartition(par).select(col("media_id"), col("content"),
        md5(Multimodal.hexOf(col("content"))).as("h")))
    val firstInBatch = b.groupBy(col("h"))
      .agg(min(col("media_id")).as("first_id"))
    val hd = histDigests.select(col("h")).distinct()
      .withColumn("in_hist", lit(true))
    val ex = graft.core.Caches.transient(
      b.join(hd, Seq("h"), "left")
        .join(firstInBatch, Seq("h"))
        .select(col("media_id"), col("content"),
          when(coalesce(col("in_hist"), lit(false)), "dup_of_history")
            .when(col("media_id") =!= col("first_id"), "dup_in_batch")
            .otherwise("exact_new").as("ex_status")))
    val survivors = ex.filter(col("ex_status") === "exact_new")
      .select(col("media_id"), col("content"))
    // ONE dHash pass over the digest-new media, shared by the
    // perceptual probe and (filtered to admitted) the state append —
    // lineage-cut so the probe's band branches see a compact scan
    // instead of the 66-md5 dHash tree
    val sFps = graft.core.Caches.cut(
      survivors.select(col("media_id").as("id"),
        Multimodal.dhash(col("content")).as("fp")))
    val hits = graft.dedup.Dedup.hammingProbeBanded(
      sFps.select(col("id"), col("fp").as("simhash")),
      histFps.select(col("id"), col("fp").as("simhash")),
      maxDist = 4, bits = Multimodal.DhashBits)
    val w = Window.partitionBy(col("id"))
      .orderBy(col("hamming"), col("hist_id"))
    val best = hits.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id").as("media_id"), col("hist_id"), col("hamming"))
    val decisions = ex.select(col("media_id"), col("ex_status"))
      .join(best, Seq("media_id"), "left")
      .select(col("media_id"),
        when(col("ex_status") =!= "exact_new", col("ex_status"))
          .when(col("hist_id").isNotNull, "near_dup_of_history")
          .otherwise("new").as("status"),
        when(col("ex_status") === "exact_new",
          coalesce(col("hist_id"), lit(-1L)))
          .otherwise(lit(-1L)).as("best_hist_id"),
        when(col("ex_status") === "exact_new",
          coalesce(col("hamming"), lit(-1L)))
          .otherwise(lit(-1L)).as("best_hamming"))
    val newIds = decisions.filter(col("status") === "new")
      .select(col("media_id"))
    val newDigests = b.join(newIds, Seq("media_id")).select(col("h"))
    val newFps = sFps
      .join(newIds.select(col("media_id").as("id")), Seq("id"))
      .select(col("id"), col("fp"))
    (decisions, newDigests, newFps)
  }

  /** [[mediaGateWithState]] with history state derived in-line from a
    * (media_id, content) history relation — the s12 batch twin's
    * entry (the dedupGateOf shape). */
  private[graft] def mediaGateOf(hist: DataFrame,
                                 batch: DataFrame): DataFrame =
    mediaGateWithState(
      hist.select(md5(Multimodal.hexOf(col("content"))).as("h")),
      // the probe re-reads history fingerprints once per band — in the
      // batch twin they are derived in-line, so cut the dHash lineage
      // (and parallelize its compute) exactly like the streaming form's
      // persisted parquet state does by construction
      graft.core.Caches.cut(
        hist.repartition(hist.sparkSession.sparkContext.defaultParallelism)
          .select(col("media_id").as("id"),
            Multimodal.dhash(col("content")).as("fp"))),
      batch)._1

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm01_decode_meta" -> decodeMeta,
    "mm02_frames" -> frames,
    "mm03_resized" -> resized,
    "mm04_shard_plan" -> ((s, d) => shardPlan(s, d)),
    "mm05_sharded_roundtrip" -> shardedRoundtrip,
    "mm06_image_near_dups" -> imageNearDups,
    "mm07_video_clip_dups" -> videoClipDups,
    "mm08_audio_clip_dups" -> audioClipDups)

  /** 64-byte synthetic content as a 128-char hex string. */
  private val hexCte = """
    |h AS (SELECT doc_id AS media_id,
    |    md5(text) || md5(text || '1') || md5(text || '2') || md5(text || '3') AS hx
    |  FROM documents)""".stripMargin

  private def byteAt(pos: Int): String =
    s"CAST((strpos('0123456789abcdef', substr(hx, ${pos * 2 + 1}, 1)) - 1) * 16 + " +
      s"(strpos('0123456789abcdef', substr(hx, ${pos * 2 + 2}, 1)) - 1) AS INT)"

  /** The mm06 scene-content hex for encoder tag `enc` (mirrors
    * [[Multimodal.sceneContent]]). */
  private def sceneHexSql(enc: String): String =
    s"substr(md5(text || '|h$enc'), 1, 6) || md5(text) || md5(text || '|n$enc')"

  /** The dHash replay as a CTE FRAGMENT over an existing CTE `src`
    * with columns (media_id, hx): luminance grid from the scene digest
    * + one-pixel encoder perturbation, 60 gradient-sign bits — defines
    * `<pfx>2(media_id, dhash)`. Shared by the s12 media-gate oracle
    * (history and probe sides); mm06/mm07 keep their original inline
    * statements (same expressions). */
  private[graft] def dhashCtes(src: String, pfx: String): String = s"""
    |${pfx}0 AS (SELECT media_id, substr(hx, 7, 32) AS scene,
    |    ((strpos('0123456789abcdef', substr(hx, 39, 1)) - 1) * 16
    |     + (strpos('0123456789abcdef', substr(hx, 40, 1)) - 1)) % 66 AS p
    |  FROM $src),
    |${pfx}1 AS (SELECT media_id, list_transform(range(0, 66), i ->
    |      (strpos('0123456789abcdef', substr(md5(scene || '|px' || CAST(i // 16 AS VARCHAR)),
    |         CAST((i % 16) * 2 + 1 AS INT), 1)) - 1) * 16
    |    + (strpos('0123456789abcdef', substr(md5(scene || '|px' || CAST(i // 16 AS VARCHAR)),
    |         CAST((i % 16) * 2 + 2 AS INT), 1)) - 1)
    |    + CASE WHEN i = p THEN 8 ELSE 0 END) AS lum
    |  FROM ${pfx}0),
    |${pfx}2 AS (SELECT media_id, CAST(list_sum(list_transform(range(0, 60), k ->
    |      CASE WHEN lum[CAST((k // 10) * 11 + (k % 10) + 2 AS INT)]
    |             > lum[CAST((k // 10) * 11 + (k % 10) + 1 AS INT)]
    |      THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END)) AS BIGINT)
    |    AS dhash
    |  FROM ${pfx}1)""".stripMargin

  /** The s12 fixture as a CTE — `gm(media_id, hx)`, mirroring
    * [[gateMedia]]. */
  private[graft] val gateMediaSql: String = s"""
    |gm AS (
    |  SELECT doc_id AS media_id, ${sceneHexSql("enc0")} AS hx FROM documents
    |  UNION ALL SELECT doc_id + 10000000, ${sceneHexSql("enc1")}
    |    FROM documents WHERE doc_id % 10 = 0
    |  UNION ALL SELECT doc_id + 30000000, ${sceneHexSql("enc0")}
    |    FROM documents WHERE doc_id < 50
    |      OR (doc_id >= 300 AND doc_id < 350))""".stripMargin

  /** mm06 oracle: fixture, dHash (luminance grid from the scene digest
    * + one-pixel encoder perturbation, 60 gradient-sign bits), exact-
    * collapse to content representatives, then ALL-PAIRS popcount —
    * bounded at oracle scale, and pair-for-pair identical to the
    * engine's banded join by the pigeonhole argument (the d10 oracle
    * pattern). */
  private val imageNearDupsSql = s"""
    |WITH sm AS (
    |  SELECT doc_id AS media_id, ${sceneHexSql("enc0")} AS hx FROM documents
    |  UNION ALL SELECT doc_id + 10000000, ${sceneHexSql("enc1")}
    |    FROM documents WHERE doc_id % 10 = 0
    |  UNION ALL SELECT doc_id + 20000000, ${sceneHexSql("enc2")}
    |    FROM documents WHERE doc_id % 10 = 5),
    |rep AS (SELECT min(media_id) AS media_id FROM sm GROUP BY md5(hx)),
    |s0 AS (SELECT sm.media_id, substr(hx, 7, 32) AS scene,
    |    ((strpos('0123456789abcdef', substr(hx, 39, 1)) - 1) * 16
    |     + (strpos('0123456789abcdef', substr(hx, 40, 1)) - 1)) % 66 AS p
    |  FROM sm JOIN rep ON rep.media_id = sm.media_id),
    |s1 AS (SELECT media_id, list_transform(range(0, 66), i ->
    |      (strpos('0123456789abcdef', substr(md5(scene || '|px' || CAST(i // 16 AS VARCHAR)),
    |         CAST((i % 16) * 2 + 1 AS INT), 1)) - 1) * 16
    |    + (strpos('0123456789abcdef', substr(md5(scene || '|px' || CAST(i // 16 AS VARCHAR)),
    |         CAST((i % 16) * 2 + 2 AS INT), 1)) - 1)
    |    + CASE WHEN i = p THEN 8 ELSE 0 END) AS lum
    |  FROM s0),
    |s2 AS (SELECT media_id, CAST(list_sum(list_transform(range(0, 60), k ->
    |      CASE WHEN lum[CAST((k // 10) * 11 + (k % 10) + 2 AS INT)]
    |             > lum[CAST((k // 10) * 11 + (k % 10) + 1 AS INT)]
    |      THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END)) AS BIGINT)
    |    AS dhash
    |  FROM s1)
    |SELECT a.media_id AS a_id, b.media_id AS b_id,
    |  CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
    |FROM s2 a JOIN s2 b ON a.media_id < b.media_id
    |WHERE bit_count(xor(a.dhash, b.dhash)) <= 4
    |ORDER BY a_id, b_id""".stripMargin

  /** mm07 oracle: fixture, per-frame dHash (the mm06 luminance/
    * gradient replay over each frame's scene), exact-collapse to
    * content representatives, ALL-PAIRS popcount (bounded at oracle
    * scale, pair-for-pair equal to the engine's banded join by the
    * pigeonhole argument — the d10/mm06 oracle pattern), then the
    * offset-consistent containment rollup against per-video frame
    * counts. */
  private val videoClipDupsSql = s"""
    |WITH vd AS (
    |  SELECT doc_id AS vid, unnest(range(0, 8)) AS j, text,
    |    'v0' AS enc, 0 AS soff
    |  FROM documents
    |  UNION ALL
    |  SELECT doc_id + 10000000, unnest(range(0, 4)), text, 'v1', 2
    |  FROM documents WHERE doc_id % 10 = 3),
    |vf AS (
    |  SELECT vid, CAST(j AS BIGINT) AS fidx,
    |    substr(md5(text || '|f' || CAST(j + soff AS VARCHAR) || '|h' || enc), 1, 6)
    |      || md5(text || '|f' || CAST(j + soff AS VARCHAR))
    |      || md5(text || '|f' || CAST(j + soff AS VARCHAR) || '|n' || enc) AS hx
    |  FROM vd),
    |nfr AS (SELECT vid, count(*) AS nf FROM vf GROUP BY vid),
    |rep AS (SELECT min(vid * 100 + fidx) AS cid FROM vf GROUP BY md5(hx)),
    |s0 AS (SELECT vf.vid * 100 + vf.fidx AS cid, substr(hx, 7, 32) AS scene,
    |    ((strpos('0123456789abcdef', substr(hx, 39, 1)) - 1) * 16
    |     + (strpos('0123456789abcdef', substr(hx, 40, 1)) - 1)) % 66 AS p
    |  FROM vf JOIN rep ON rep.cid = vf.vid * 100 + vf.fidx),
    |s1 AS (SELECT cid, list_transform(range(0, 66), i ->
    |      (strpos('0123456789abcdef', substr(md5(scene || '|px' || CAST(i // 16 AS VARCHAR)),
    |         CAST((i % 16) * 2 + 1 AS INT), 1)) - 1) * 16
    |    + (strpos('0123456789abcdef', substr(md5(scene || '|px' || CAST(i // 16 AS VARCHAR)),
    |         CAST((i % 16) * 2 + 2 AS INT), 1)) - 1)
    |    + CASE WHEN i = p THEN 8 ELSE 0 END) AS lum
    |  FROM s0),
    |s2 AS (SELECT cid, CAST(list_sum(list_transform(range(0, 60), k ->
    |      CASE WHEN lum[CAST((k // 10) * 11 + (k % 10) + 2 AS INT)]
    |             > lum[CAST((k // 10) * 11 + (k % 10) + 1 AS INT)]
    |      THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END)) AS BIGINT)
    |    AS dhash
    |  FROM s1),
    |pr AS (SELECT a.cid // 100 AS a_vid, a.cid % 100 AS fa,
    |    b.cid // 100 AS b_vid, b.cid % 100 AS fb,
    |    CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
    |  FROM s2 a JOIN s2 b ON a.cid < b.cid
    |  WHERE bit_count(xor(a.dhash, b.dhash)) <= 4),
    |grp AS (SELECT a_vid, b_vid, fa - fb AS frame_offset,
    |    count(*) AS n_matched, max(hamming) AS max_hamming
    |  FROM pr WHERE a_vid <> b_vid GROUP BY 1, 2, 3)
    |SELECT g.a_vid, g.b_vid, CAST(g.frame_offset AS BIGINT) AS frame_offset,
    |  g.n_matched, g.max_hamming
    |FROM grp g JOIN nfr na ON na.vid = g.a_vid JOIN nfr nb ON nb.vid = g.b_vid
    |WHERE g.n_matched = least(na.nf, nb.nf)
    |ORDER BY a_vid, b_vid, frame_offset""".stripMargin

  /** mm08 oracle: fixture, per-window chromaprint replay (72 chroma
    * energies from the scene digest + one-sample encoder perturbation,
    * 60 temporal-gradient-sign bits over the 12×6 grid), exact-collapse
    * to content representatives, ALL-PAIRS popcount (bounded at oracle
    * scale, pair-for-pair equal to the engine's banded join by the
    * pigeonhole argument), then the offset-consistent containment
    * rollup — the mm07 oracle with the audio grid. */
  private val audioClipDupsSql = s"""
    |WITH ad AS (
    |  SELECT doc_id AS aid, unnest(range(0, 6)) AS j, text,
    |    'a0' AS enc, 0 AS soff
    |  FROM documents
    |  UNION ALL
    |  SELECT doc_id + 10000000, unnest(range(0, 3)), text, 'a1', 2
    |  FROM documents WHERE doc_id % 10 = 7),
    |aw AS (
    |  SELECT aid, CAST(j AS BIGINT) AS widx,
    |    substr(md5(text || '|w' || CAST(j + soff AS VARCHAR) || '|h' || enc), 1, 6)
    |      || md5(text || '|w' || CAST(j + soff AS VARCHAR))
    |      || md5(text || '|w' || CAST(j + soff AS VARCHAR) || '|n' || enc) AS hx
    |  FROM ad),
    |nwr AS (SELECT aid, count(*) AS nw FROM aw GROUP BY aid),
    |arep AS (SELECT min(aid * 100 + widx) AS cid FROM aw GROUP BY md5(hx)),
    |as0 AS (SELECT aw.aid * 100 + aw.widx AS cid, substr(hx, 7, 32) AS scene,
    |    ((strpos('0123456789abcdef', substr(hx, 39, 1)) - 1) * 16
    |     + (strpos('0123456789abcdef', substr(hx, 40, 1)) - 1)) % 72 AS p
    |  FROM aw JOIN arep ON arep.cid = aw.aid * 100 + aw.widx),
    |as1 AS (SELECT cid, list_transform(range(0, 72), i ->
    |      (strpos('0123456789abcdef', substr(md5(scene || '|ch' || CAST(i // 16 AS VARCHAR)),
    |         CAST((i % 16) * 2 + 1 AS INT), 1)) - 1) * 16
    |    + (strpos('0123456789abcdef', substr(md5(scene || '|ch' || CAST(i // 16 AS VARCHAR)),
    |         CAST((i % 16) * 2 + 2 AS INT), 1)) - 1)
    |    + CASE WHEN i = p THEN 8 ELSE 0 END) AS en
    |  FROM as0),
    |as2 AS (SELECT cid, CAST(list_sum(list_transform(range(0, 60), k ->
    |      CASE WHEN en[CAST((k // 5) * 6 + (k % 5) + 2 AS INT)]
    |             > en[CAST((k // 5) * 6 + (k % 5) + 1 AS INT)]
    |      THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END)) AS BIGINT)
    |    AS fp
    |  FROM as1),
    |apr AS (SELECT a.cid // 100 AS a_aid, a.cid % 100 AS wa,
    |    b.cid // 100 AS b_aid, b.cid % 100 AS wb,
    |    CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
    |  FROM as2 a JOIN as2 b ON a.cid < b.cid
    |  WHERE bit_count(xor(a.fp, b.fp)) <= 4),
    |agrp AS (SELECT a_aid, b_aid, wa - wb AS window_offset,
    |    count(*) AS n_matched, max(hamming) AS max_hamming
    |  FROM apr WHERE a_aid <> b_aid GROUP BY 1, 2, 3)
    |SELECT g.a_aid, g.b_aid, CAST(g.window_offset AS BIGINT) AS window_offset,
    |  g.n_matched, g.max_hamming
    |FROM agrp g JOIN nwr na ON na.aid = g.a_aid JOIN nwr nb ON nb.aid = g.b_aid
    |WHERE g.n_matched = least(na.nw, nb.nw)
    |ORDER BY a_aid, b_aid, window_offset""".stripMargin

  val oracles: Map[String, String] = Map(
    "mm08_audio_clip_dups" -> audioClipDupsSql,
    "mm06_image_near_dups" -> imageNearDupsSql,
    "mm07_video_clip_dups" -> videoClipDupsSql,
    "mm01_decode_meta" -> s"""
      |WITH $hexCte
      |SELECT media_id,
      |  CAST(16 + ${byteAt(0)} % 240 AS BIGINT) AS width,
      |  CAST(16 + ${byteAt(1)} % 240 AS BIGINT) AS height,
      |  ['jpeg', 'png', 'webp'][${byteAt(2)} % 3 + 1] AS format,
      |  CAST(length(hx) // 2 AS BIGINT) AS n_bytes
      |FROM h ORDER BY media_id""".stripMargin,
    "mm02_frames" -> s"""
      |WITH $hexCte,
      |f AS (SELECT media_id, unnest(range(0, length(hx) // 8, 3)) AS frame_idx, hx FROM h)
      |SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
      |  CAST((strpos('0123456789abcdef', substr(hx, CAST(frame_idx * 8 + 1 AS INT), 1)) - 1) * 4096
      |     + (strpos('0123456789abcdef', substr(hx, CAST(frame_idx * 8 + 2 AS INT), 1)) - 1) * 256
      |     + (strpos('0123456789abcdef', substr(hx, CAST(frame_idx * 8 + 3 AS INT), 1)) - 1) * 16
      |     + (strpos('0123456789abcdef', substr(hx, CAST(frame_idx * 8 + 4 AS INT), 1)) - 1) AS BIGINT) AS frame_val
      |FROM f ORDER BY media_id, frame_idx""".stripMargin,
    "mm03_resized" -> s"""
      |WITH $hexCte
      |SELECT media_id, CAST(16 AS BIGINT) AS n_bytes,
      |  md5(substr(hx, 1, 32)) AS content_md5
      |FROM h ORDER BY media_id""".stripMargin,
    // strlen = BYTES in DuckDB (length() is characters), matching
    // Spark's octet_length; the window cumsum is the single-node twin
    // of the engine's two-pass distributed prefix sum
    "mm04_shard_plan" -> """
      |WITH p AS (SELECT doc_id AS media_id,
      |    CAST(strlen(text) AS BIGINT) + 64 AS pb FROM documents),
      |c AS (SELECT media_id, pb,
      |    sum(pb) OVER (ORDER BY media_id ROWS UNBOUNDED PRECEDING) - pb
      |      AS byte_start
      |  FROM p)
      |SELECT CAST(byte_start // 4096 AS BIGINT) AS shard_id,
      |  count(*) AS n_items,
      |  CAST(sum(pb) AS BIGINT) AS shard_bytes,
      |  min(media_id) AS first_id, max(media_id) AS last_id
      |FROM c GROUP BY 1 ORDER BY shard_id""".stripMargin,
    "mm05_sharded_roundtrip" -> """
      |WITH p AS (SELECT doc_id AS media_id, text,
      |    CAST(strlen(text) AS BIGINT) + 64 AS pb FROM documents),
      |c AS (SELECT media_id, text, pb,
      |    sum(pb) OVER (ORDER BY media_id ROWS UNBOUNDED PRECEDING) - pb
      |      AS byte_start
      |  FROM p)
      |SELECT media_id, CAST(byte_start // 4096 AS BIGINT) AS shard_id,
      |  pb AS payload_bytes, md5(text) AS text_md5
      |FROM c ORDER BY media_id""".stripMargin)
}

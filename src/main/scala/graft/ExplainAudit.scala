package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan for representative
  * queries and flags the scale-critical properties — parquet filter
  * pushdown, pruned read schemas, broadcast joins, whole-stage
  * codegen coverage. Run per-round after correctness is green:
  * `sbt "runMain graft.ExplainAudit <sfDir> [queryName...]"`. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("r01_pricing_summary", "r02_revenue_topk", "r04_filter_range",
        "t01_chunk_stats", "d02_jaccard_pairs", "s01_tumbling_counts",
        "x01_asof_join", "x02_range_band_join", "v11_knn_rule_rewrite",
        "d06_embedding_near_dups", "i03_web_scrape", "v10_knn_ivf",
        "l07_bm25_retrieval", "l08_hybrid_rrf", "a10_dsir_resample",
        "d12_semdedup", "d13_bloom_decontam", "d14_group_split",
        "d15_substring_dedup", "s07_ingest_gate",
        "a07_c4_clean", "a12_bigram_logprob", "l05_mlp_classify",
        "m09_temperature_scaling", "m10_isotonic_bins", "r15_corr_matrix",
        "v15_knn_sq8", "s08_rate_limit",
        "r17_salted_agg", "r18_salted_join", "mm04_shard_plan",
        "i08_compacted_roundtrip", "a16_quality_cap", "d17_line_dedup",
        "t08_vocab_coverage", "d18_keep_best", "a17_mixture_budget",
        "t09_train_order", "t11_bpe_tokenize", "a18_source_overlap",
        "a19_source_drift",
        "a20_quality_cap_scaled", "mm05_sharded_roundtrip",
        "a21_char_entropy", "v22_cluster_report", "d19_incremental_minhash",
        "n18_unicode_clean", "t13_packing_efficiency", "m12_bootstrap_ci",
        "l11_mmr_rerank", "m13_paired_compare", "r19_cube_orders",
        "a22_source_dedup_rate", "l12_token_f1",
        "t12_bpe_fertility", "m14_roc_auc",
        "m15_pr_auc", "d20_pair_band_counts", "s09_dedup_gate",
        "m16_risk_coverage", "d21_minhash_fidelity",
        "s10_run_summary", "f07_suggest_corrections",
        "v23_prototype_pruning")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"== $name: NOT FOUND ==")
        case Some(fn) =>
          println(s"\n===== $name =====")
          val df = fn(spark, sfDir)
          val formatted = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          println(formatted)
          val pushed = "PushedFilters: \\[[^\\]]+\\]".r
            .findAllIn(formatted).toSeq.distinct
          val schemas = "ReadSchema: [^\\n]+".r.findAllIn(formatted).toSeq.distinct
          val bcasts = formatted.linesIterator.count(_.contains("BroadcastHashJoin"))
          // codegen spans only exist in the FINAL (post-AQE) plan, and
          // only on the QueryExecution that actually ran — collect()
          // drives THIS one (df.write would plan a fresh QE)
          df.collect()
          val finalPlan = df.queryExecution.executedPlan.toString
          val wsc = "\\*\\((\\d+)\\)".r
            .findAllMatchIn(finalPlan).map(_.group(1)).toSet.size
          println(s"--- audit: pushedFilters=${pushed.size} broadcastHashJoins=$bcasts wholeStageCodegenSpans=$wsc")
          pushed.foreach(p => println(s"    $p"))
          schemas.foreach(s => println(s"    $s"))
      }
    }
    spark.stop()
  }
}

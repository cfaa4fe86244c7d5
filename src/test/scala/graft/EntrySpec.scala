package graft

/** Driver-contract smoke: entry returns rows; every declared query has an
  * oracle or is explicitly rows-only; names/columns stay consistent. */
class EntrySpec extends SparkSpec {

  test("entry produces rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key is a declared query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("declared inventory covers the SURVEY §2 operator families") {
    val qs = SparkEntry.queries.keySet
    val mustHave = Seq("q1_flagship", "q_prod", "q_moments", "q_minmax",
      "q_first_last_nth", "q_ohlc", "q_quantile", "q_median", "q_anyall",
      "q_cumsum", "q_cumprod", "q_cum_minmax", "q_shift", "q_fill", "q_rank",
      "q_take", "q_factorize", "q_join_agg", "q_asof", "q_topk",
      "q_dedup_exact", "q_minhash_sig", "q_neardup_lsh", "q_simhash",
      "q_embed_topk", "q_embed_lsh", "q_embed_neardup",
      "q_text_stats", "q_quality", "q_langid", "q_fingerprint",
      "q_window_tumbling", "q_window_sliding", "q_session_window",
      "q_take_upcast", "q_frame_sample", "q_kahan_sum",
      "q_cut", "q_qcut", "q_rolling", "q_pivot", "q_melt",
      "q_dedup_clusters", "q_normalize", "q_embed_lsh_probe",
      "q_asof_dir", "q_datetime", "q_rollup", "q_corr", "q_embed_ivf_probe",
      "q_funnel", "q_repetition", "q_bm25", "q_minhash_est", "q_blocklist",
      "q_mix", "q_ewma", "q_editdist", "q_hist", "q_ann_recall",
      "q_ngram_jaccard", "q_approx_sketch", "q_audio_meta", "q_video_frames",
      "q_stream_tumbling", "q_stream_sliding", "q_stream_session",
      "q_stream_session_append", "q_embed_lsh_index",
      "q_bootstrap_ci", "q_attribution", "q_sessionize", "q_dau_wau")
    val missing = mustHave.filterNot(qs.contains)
    assert(missing.isEmpty, s"missing: $missing")
  }
}

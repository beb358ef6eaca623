#!/bin/bash
# Round-6 VERDICT #6: value-correctness (not just timing) at the sf1
# scale — every benched query checked against its DuckDB oracle on the
# synthetic 10x corpus. Per-query isolation + timeout so one heavy
# oracle cannot sink the sweep; results accumulate in the log.
SF1="$(dirname "$0")/../.scaledata/sf1"
LOG="${1:-/root/repo/sf1_oracle_sweep.log}"
QUERIES=(
  q1_pricing_summary q3_shipping_priority q5_region_revenue j_broadcast_dim
  a_sequence_gaps a_album_signature w_top1_per_group t_sessionize
  g_cooccurrence_edges f_tokens_dedup d_exact_dup d_ngram_jaccard
  d_minhash_lsh t_quality_score ann_topk_cosine pl_step18_mbids
  pl_step22_works pl_step15_similarity a_salted_agg pl_chain_e2e
  d_embedding_lsh d_ngram_jaccard_capped er_five_phase
  s98_rename_plan ann_ivf_trained h_works_role_pairs cur_repetition
  cur_decontaminate d_fuzzy_dedup_e2e d_incremental_dedup cur_dup_spans
  cur_pipeline_e2e cur_incremental_e2e cur_lm_perplexity
  d_lsh_roundtrip cur_artifact_roundtrip s3_tag_parse_real
  t_chunk_windows cur_compact_shards cur_zorder_compact cur_selective_compact t_stream_maintain
  cur_manifest_isolation t_stream_manifest mm_real_image_features
  cur_manifest_skipping pl_chain_manifest cur_merge_cow cur_merge_mor
  cur_time_travel t_stream_upsert cur_table_changes cur_snapshot_tags
  cur_wap_publish cur_hidden_partitioning mm_real_flac_chunks
  mm_real_mp4_frames mm_real_gif_features mm_real_jpeg_features
  cur_cdc_cow cur_cdc_rollback cur_positional_delete cur_null_skipping
  cur_temporal_partitioning mm_real_mp3_frames mm_real_png16_features
  mm_real_jpeg_prog_features
  cur_bloom_skipping mm_real_vorbis_packets mm_real_opus_packets
  mm_real_aiff_chunks mm_real_wv_chunks
)
# d_embedding_lsh_scaled is excluded BY DESIGN: its oracle is pinned to
# the n=500 derivation; at sf1 the default path derives wider bands (the
# point of the operator), so there is no fixed SQL to compare against.
: > "$LOG"
for q in "${QUERIES[@]}"; do
  timeout 1200 python tools/oracle_check.py "$SF1" "$q" 2>/dev/null \
    | grep -E "PASS|FAIL" >> "$LOG" || echo "TIMEOUT/ERR $q" >> "$LOG"
done
echo "sweep complete" >> "$LOG"

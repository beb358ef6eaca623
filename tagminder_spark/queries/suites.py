"""Combined 'suite' gates — several per-component queries re-projected to
one shared long-format schema and unioned, so one recorded driver
correctness slot carries many SURVEY §2 components.

Why: the driver's harness records only the first 50 registered queries
(GATE_WINDOW). Every suite part remains registered individually (outside
the window) for local verification; the suite re-runs the SAME query
function and re-projects its output, so a green suite row is driver
evidence for every part inside it.

Long format: ``(part, entity, metric, sval, dval)``
- ``entity``: the source row's identity — key columns cast to canonical
  strings and joined with '|' (both engines' concat_ws skips NULLs
  identically; no double-typed keys are allowed, avoiding float-to-string
  formatting divergence).
- one output row per (source row, metric); string metrics go to
  ``sval``, numeric metrics to ``dval`` (cast double — exact for the
  int64 counts here and bit-equal for values already double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagminder_spark.queries import QueryFn

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}

#: suite -> part -> (key columns, [(metric column, 'num'|'str'), ...])
SUITES: dict[str, dict[str, tuple[list[str], list[tuple[str, str]]]]] = {
    # TPC-H relational + aggregation + window families
    "suite_core": {
        "q3_shipping_priority": (["o_orderkey", "o_orderdate"], [("revenue", "num")]),
        "q5_region_revenue": (["n_name"], [("revenue", "num")]),
        "q4_order_priority": (["o_orderpriority"], [("order_count", "num")]),
        "q6_forecast_revenue": ([], [("revenue", "num")]),
        "q10_returned_items": (["c_custkey"], [("c_name", "str"), ("revenue", "num")]),
        "a_sequence_gaps": (
            ["l_orderkey"],
            [("n_lines", "num"), ("max_line", "num"), ("n_missing", "num"), ("n_dup_lines", "num")],
        ),
        "a_album_signature": (
            ["part_sig"], [("n_orders", "num"), ("keeper_orderkey", "num")]
        ),
        "a_two_level_avg": ([], [("n_customers", "num"), ("avg_of_avg", "num")]),
        "a_decade_rollup": (
            ["order_year", "order_decade"], [("n_orders", "num"), ("total_revenue", "num")]
        ),
        "a_collect_set_sorted": (["c_nationkey"], [("segments", "str")]),
        "a_percentiles": (
            ["l_returnflag"],
            [("median_qty", "num"), ("price_spread", "num"), ("max_price_db", "num")],
        ),
        "w_top1_per_group": (
            ["o_custkey"], [("top_orderkey", "num"), ("top_totalprice", "num")]
        ),
        "w_pct_of_total": (
            ["o_orderpriority", "o_orderstatus"],
            [("n", "num"), ("pct_of_priority", "num"), ("rev_share", "num")],
        ),
        # round-1 hash recoveries, moved here from the window in round 3
        "a_pivot_status": (
            ["o_orderpriority"],
            [("n_open", "num"), ("n_finished", "num"), ("n_pending", "num")],
        ),
        "p_md5_validity": (["source"], [("n_rows", "num"), ("n_invalid", "num")]),
        "p_blank_normalize": (["source"], [("n_blank", "num"), ("n_set", "num")]),
        # round-4 window swap: green individually in r2+r3, moved here to
        # free the slot for suite_curation (stays registered individually)
        "p_truthy_flags": (["event_type"], [("n", "num"), ("n_truthy", "num")]),
    },
    # joins, graph, set ops, scalar-string functions
    "suite_shapes": {
        "j_anti_join": (["c_custkey"], [("c_name", "str")]),
        "j_semi_join": (["c_custkey"], [("c_name", "str")]),
        "j_broadcast_dim": (["p_brand"], [("revenue", "num"), ("n_lines", "num")]),
        "g_cooccurrence_edges": (["src", "dst"], [("weight", "num")]),
        "g_top_neighbors": (["src", "dst"], [("weight", "num"), ("rn", "num")]),
        "s_set_operations": (["tag", "nk"], []),
        "f_date_normalize": (
            ["o_orderkey"], [("raw", "str"), ("norm_date", "str"), ("norm_year", "str")]
        ),
        "f_album_root": (["path"], [("root", "str")]),
        "f_tokens_dedup": (["doc_id"], [("toks_dedup", "str"), ("n_tokens", "num")]),
        "f_string_suite": (
            ["p_partkey"],
            [
                ("first_word", "str"), ("name_upper", "str"), ("name_len", "num"),
                ("brand_code", "str"), ("label", "str"), ("name_head", "str"),
                ("name_tr", "str"), ("is_small", "num"), ("has_widget", "num"),
            ],
        ),
        "s3_tag_parse": (
            ["__path"],
            [("__filetype", "str"), ("__length_seconds", "str"), ("title", "str"),
             ("extra_size", "str")],
        ),
        # round 6: the REAL byte-level parser path (ID3v2.3+Xing / FLAC
        # STREAMINFO+VORBIS_COMMENT synthesized per row, parsed back)
        "s3_tag_parse_real": (
            ["__path"],
            [("__filetype", "str"), ("title", "str"), ("artist", "str"),
             ("album", "str"), ("track", "str"), ("genre", "str"),
             ("__length_seconds", "str")],
        ),
        "s78_incremental_sync": (["bucket", "path"], []),
        "h_amg_todo": (
            ["mnid_source", "source_table", "allmusic_mnid"],
            [("allmusic_artist", "str"), ("allmusic_url", "str"),
             ("allmusic_genres_json", "str"), ("allmusic_styles_json", "str")],
        ),
        "h_readiness": (
            ["table_name"],
            [("owner", "str"), ("status", "str"), ("n_missing", "num"),
             ("strict_exit", "num")],
        ),
        "v89_validate_vetted": (
            ["rowid"],
            [("replacement_val", "str"), ("status_out", "str"),
             ("decision", "str")],
        ),
        "s14_works_enrich": (
            ["work_id"],
            [("work_title", "str"), ("work_type_name", "str"),
             ("language_code", "str"), ("language_name", "str"),
             ("aliases", "str"), ("n_aliases", "num"),
             ("iswcs", "str"), ("n_iswcs", "num")],
        ),
        "s14_related_works": (
            ["work_id"],
            [("related_work_titles", "str"), ("related_work_mbids", "str"),
             ("related_work_relationship_names", "str")],
        ),
        "s14_role_labels": (
            ["link_id"], [("roles", "str"), ("n_roles", "num")],
        ),
        "s14_artists_harvest": (
            ["artist_id"],
            [("artist_name", "str"), ("begin_year", "num"),
             ("artist_type", "num"), ("gender", "num"),
             ("disambiguation", "str"), ("ended", "num"),
             ("wikidata_uri", "str"), ("wikidata_id", "str"),
             ("allmusic_mnid", "str")],
        ),
        # round 5: the composed end-to-end works lookup (constituents
        # s14_works_enrich / s14_mb_member_routing / s14_related_works
        # are already gated; this pins their left-join assembly)
        "s14_works_lookup": (
            ["work_id"],
            [("musicbrainz_workid", "str"), ("work_title", "str"),
             ("work_type_id", "num"), ("work_type_name", "str"),
             ("work_disambiguation", "str"), ("language_id", "num"),
             ("language_code", "str"), ("language_name", "str"),
             ("aliases", "str"), ("n_aliases", "num"),
             ("iswcs", "str"), ("n_iswcs", "num"),
             ("role_pairs", "str"), ("n_pairs", "num"),
             ("related_work_titles", "str"), ("related_work_mbids", "str"),
             ("related_work_relationship_names", "str")],
        ),
        # round 4 second sweep: relationship harvests
        "s14_recording_work_rels": (
            ["edge_row_id"],
            [("link_id", "num"), ("recording_id", "num"), ("work_id", "num"),
             ("link_order", "num"), ("entity0_credit", "str"),
             ("entity1_credit", "str"), ("relationship_name", "str"),
             ("begin_year", "num"), ("end_year", "num"), ("is_ended", "num"),
             ("recording_mbid", "str"), ("title", "str"),
             ("n_attrs", "num"), ("attr_toks", "str")],
        ),
        "s14_artist_rels": (
            ["edge_row_id"],
            [("from_artist_id", "num"), ("to_artist_id", "num"),
             ("entity0_credit", "str"), ("entity1_credit", "str"),
             ("relationship_name", "str"),
             ("relationship_phrase_forward", "str"),
             ("begin_year", "num"), ("is_ended", "num")],
        ),
    },
    # dedup family + diff-audit + streaming state
    "suite_dedup_audit": {
        "d_exact_dup": (
            ["id"],
            [("text_hash", "str"), ("keeper_id", "num"), ("group_size", "num"), ("is_dup", "num")],
        ),
        "d_ngram_jaccard": (["id_a", "id_b"], [("n_common", "num"), ("jaccard", "num")]),
        "d_minhash_lsh": (["id_a", "id_b"], [("jaccard", "num")]),
        "d_simhash": (["id_a", "id_b"], [("hamming", "num")]),
        # round-6 window rotation: the fixed-4-bit gate rides here now
        # (its recorded slot went to d_embedding_lsh_scaled)
        "d_embedding_lsh": (["id_a", "id_b"], [("cosine", "num")]),
        "d_embedding_neardup": (["id_a", "id_b"], [("cosine", "num")]),
        "d_connected_components": (["node"], [("component", "num")]),
        # round-4 second sweep: full pairs→clusters→keeper compositions
        "d_fuzzy_dedup_e2e": (
            ["doc_id"],
            [("cluster_id", "num"), ("cluster_size", "num"), ("is_dup", "num")],
        ),
        "d_semantic_dedup_e2e": (
            ["vec_id"],
            [("cluster_id", "num"), ("cluster_size", "num"), ("is_dup", "num")],
        ),
        "d_incremental_dedup": (
            ["id_a", "id_b"], [("jaccard", "num")]
        ),
        # round 6: the standing-index lifecycle across the DISK boundary
        # (bucketed persist -> probe -> compact -> re-persist -> probe)
        "d_lsh_roundtrip": (
            ["id_a", "id_b"], [("jaccard", "num")]
        ),
        "c_diff_changelog": (
            ["alib_path", "alib_column"],
            [("old_value", "str"), ("new_value", "str"), ("script", "str")],
        ),
        "c_diff_updated": (
            ["o_orderkey"],
            [("priority", "str"), ("status", "str"), ("__sqlmodded", "num")],
        ),
        "t_stateful_dedup": (["key"], [("n_new", "num"), ("n_dropped", "num")]),
    },
    # text analysis + similarity search
    "suite_textscale": {
        "t_quality_score": (
            ["doc_id"], [("n_chars", "num"), ("n_words", "num"), ("quality", "num")]
        ),
        "t_langid_heuristic": (
            ["doc_id"],
            [("s_en", "num"), ("s_es", "num"), ("s_de", "num"), ("s_fr", "num"),
             ("predicted", "str"), ("is_match", "num")],
        ),
        "t_token_count": (["doc_id"], [("ws_tokens", "num"), ("re_tokens", "num")]),
        "t_fingerprint": (["doc_id"], [("fp", "num")]),
        # round 6: sliding-window context chunking (LM data preparation)
        "t_chunk_windows": (
            ["doc_id", "chunk_id"], [("chunk_text", "str"), ("n_tokens", "num")]
        ),
        "ann_topk_cosine": (
            ["query_id", "rank"], [("neighbor_id", "num"), ("cosine", "num")]
        ),
        "ann_ivf_topk": (
            ["query_id", "rank"], [("neighbor_id", "num"), ("cosine", "num")]
        ),
        # round 5: int8 store quantization (serving-memory cut)
        "ann_quantize_int8": (
            ["vec_id"],
            [("q8_str", "str"), ("scale", "num"), ("max_abs_err", "num")],
        ),
        "mm_image_features": (
            ["media_id"],
            [("width", "num"), ("height", "num"), ("channels", "num"), ("n_feat", "num")],
        ),
        # round 8: the REAL decode path (genuine PPM parse, analytic
        # pixel-sum oracle) — fails if the decoder misreads one pixel
        "mm_real_image_features": (
            ["media_id"],
            [("width", "num"), ("height", "num"), ("sum_r", "num"),
             ("sum_g", "num"), ("sum_b", "num")],
        ),
        # round 9: the real PNG (all 5 filters × gray/RGB/RGBA) and WAV
        # PCM (sample-accurate chunk windows, int16 sums) decode paths,
        # each pinned to an analytic DuckDB oracle
        "mm_real_png_features": (
            ["media_id"],
            [("width", "num"), ("height", "num"), ("sum_r", "num"),
             ("sum_g", "num"), ("sum_b", "num")],
        ),
        # round 10: baseline JPEG decode (pure python+numpy: markers,
        # DHT huffman, dequant, IDCT, YCbCr) on codec fixed points —
        # bit-exact vs an analytic DuckDB oracle
        "mm_real_jpeg_features": (
            ["media_id"],
            [("width", "num"), ("height", "num"), ("sum_all", "num"),
             ("sum_col0", "num"), ("sum_col1", "num")],
        ),
        "mm_real_wav_chunks": (
            ["media_id", "chunk_idx"],
            [("start_ms", "num"), ("end_ms", "num"), ("n_bytes", "num"),
             ("sample_sum", "num")],
        ),
        # round 10: REAL GIF decode (palette + variable-width LZW +
        # interlace) — channel sums + a position-weighted checksum
        "mm_real_gif_features": (
            ["media_id"],
            [("width", "num"), ("height", "num"), ("sum_r", "num"),
             ("sum_g", "num"), ("sum_b", "num"), ("wsum_r", "num")],
        ),
        # round 10: REAL FLAC decode (pure python+numpy: Rice/LPC/
        # escape subframes, CRC-8/16, PCM MD5) — lossless, so the WAV
        # gate's integer oracle replays it exactly
        "mm_real_flac_chunks": (
            ["media_id", "chunk_idx"],
            [("start_ms", "num"), ("end_ms", "num"), ("n_bytes", "num"),
             ("sample_sum", "num")],
        ),
        # round 13: REAL AIFF / AIFF-C PCM (big-endian NONE/twos +
        # byte-swapped sowt, all three flavors cycled per doc) and
        # REAL WavPack (decorrelation chain + words entropy coder,
        # multi-block) — both lossless, replaying the WAV gate's
        # integer oracle exactly
        "mm_real_aiff_chunks": (
            ["media_id", "chunk_idx"],
            [("start_ms", "num"), ("end_ms", "num"), ("n_bytes", "num"),
             ("sample_sum", "num")],
        ),
        "mm_real_wv_chunks": (
            ["media_id", "chunk_idx"],
            [("start_ms", "num"), ("end_ms", "num"), ("n_bytes", "num"),
             ("sample_sum", "num")],
        ),
        # round 5: the audio leg — overlapping-window chunking with
        # byte-exact (base64) chunk payloads
        "mm_audio_chunks": (
            ["media_id", "chunk_idx"],
            [("start_ms", "num"), ("end_ms", "num"), ("chunk_b64", "str")],
        ),
        # round 11: REAL progressive JPEG (SOF2) — six-scan successive
        # approximation, bit-exact on the baseline gate's fixed points
        "mm_real_jpeg_prog_features": (
            ["media_id"],
            [("width", "num"), ("height", "num"), ("sum_all", "num"),
             ("sum_col0", "num"), ("sum_col1", "num")],
        ),
        # round 11: REAL 16-bit Adam7-interlaced PNG — seven re-woven
        # passes, high-byte 16->8 reduction, closed-form pixel oracle
        "mm_real_png16_features": (
            ["media_id"],
            [("width", "num"), ("height", "num"), ("sum_r", "num"),
             ("sum_g", "num"), ("sum_b", "num")],
        ),
        # round 11: REAL MP3 stream layer — VBR frame walk, side info,
        # scalefactors recovered through the bit reservoir
        "mm_real_mp3_frames": (
            ["media_id", "frame", "granule", "channel"],
            [("offset", "num"), ("frame_len", "num"), ("ts_ms", "num"),
             ("main_data_begin", "num"), ("global_gain", "num"),
             ("scalefac_sum", "num"), ("scalefac_wsum", "num")],
        ),
        # round 12: REAL Ogg/Vorbis — CRC'd page walk, in-stream
        # codebooks, floor1 Y values + every residue entry recovered
        # through the §8.6.2 partition walk
        "mm_real_vorbis_packets": (
            ["media_id", "packet"],
            [("mode", "num"), ("granule", "num"), ("blocksize", "num"),
             ("floor_y_sum", "num"), ("floor_y_wsum", "num"),
             ("class_sum", "num"), ("value_sum", "num"),
             ("value_wsum", "num")],
        ),
        # round 12: REAL Opus stream layer — TOC arithmetic, all four
        # frame-count codes, VBR lengths, padding chains, granules
        "mm_real_opus_packets": (
            ["media_id", "packet"],
            [("config", "num"), ("mode", "str"), ("stereo", "num"),
             ("nframes", "num"), ("samples", "num"),
             ("frame_len_sum", "num"), ("padding", "num"),
             ("granule", "num")],
        ),
        "mm_video_frames": (
            ["media_id", "frame_idx"], [("frame_b64", "str")],
        ),
        # round 10: REAL MP4 sample-table resolution (ISO-BMFF box walk,
        # stts/stsz/stsc/stco/stss) — frame bytes sliced from mdat,
        # byte-exact vs the oracle's payload formula
        "mm_real_mp4_frames": (
            ["media_id", "frame_idx"],
            [("n_bytes", "num"), ("frame_b64", "str")],
        ),
        "mm_image_resize": (
            ["media_id"],
            [("width", "num"), ("height", "num"), ("target_w", "num"),
             ("target_h", "num"), ("resized_b64", "str")],
        ),
        "t_doc_structure": (
            ["doc_id"],
            [("n_words", "num"), ("n_sentences", "num"), ("n_paragraphs", "num"),
             ("chars_per_sentence", "num")],
        ),
        "t_nfc_normalize": (
            ["doc_id"],
            [("nfc_md5", "str"), ("nfc_len", "num"), ("already_nfc", "num")],
        ),
    },
    # training-data curation family (round 4)
    "suite_curation": {
        "cur_repetition": (
            ["doc_id"],
            [("n_words", "num"), ("top_word_frac", "num"),
             ("top_bigram_frac", "num"), ("dup_trigram_frac", "num"),
             ("passes_repetition", "num")],
        ),
        "cur_decontaminate": (
            ["doc_id"],
            [("n_contaminated_grams", "num"), ("is_contaminated", "num")],
        ),
        "cur_temperature_sample": (
            ["doc_id"],
            [("lang", "str"), ("source", "str"), ("keep_rate", "num")],
        ),
        "cur_pack_shards": (
            ["lang", "shard_id"],
            [("n_docs", "num"), ("total_tokens", "num"),
             ("first_doc", "num"), ("last_doc", "num")],
        ),
        "cur_source_quota": (
            ["doc_id"],
            [("source", "str"), ("n_chars", "num"), ("rank_in_source", "num")],
        ),
        "cur_quality_buckets": (
            ["doc_id"],
            [("lang", "str"), ("quality", "num"), ("tercile", "num"),
             ("bucket", "str")],
        ),
        "cur_pii_scrub": (
            ["doc_id"],
            [("n_emails", "num"), ("n_ips", "num"), ("n_phones", "num"),
             ("masked_md5", "str"), ("is_clean", "num")],
        ),
        "cur_dup_spans": (
            ["doc_id"],
            [("n_tokens", "num"), ("n_dup_grams", "num"),
             ("dup_tokens", "num"), ("dup_frac", "num"),
             ("passes_dup_spans", "num")],
        ),
        "cur_pipeline_e2e": (
            ["doc_id"],
            [("passes_repetition", "num"), ("is_exact_keeper", "num"),
             ("is_clean", "num"), ("within_quota", "num"), ("kept", "num")],
        ),
        "cur_vocabulary": (
            ["token"],
            [("n_occurrences", "num"), ("doc_frequency", "num")],
        ),
        # round 5: bigram-LM perplexity, hash split, mixture planning
        "cur_lm_perplexity": (
            ["doc_id"],
            [("n_bigrams", "num"), ("avg_logprob", "num"),
             ("perplexity", "num")],
        ),
        "cur_hash_split": (
            ["doc_id"], [("u", "num"), ("split", "str")],
        ),
        "cur_mixture_plan": (
            ["lang"],
            [("n_docs", "num"), ("n_tokens", "num"), ("weight", "num"),
             ("allocated_tokens", "num"), ("sample_rate", "num"),
             ("achievable", "num")],
        ),
        # round 5: C4 cleaning rules
        "cur_c4_filter": (
            ["doc_id"],
            [("clean_text", "str"), ("n_lines", "num"),
             ("n_kept_lines", "num"), ("page_keep", "num")],
        ),
        # round 5: markup stripping + URL/domain bookkeeping
        "cur_strip_markup": (
            ["doc_id"],
            [("clean_text", "str"), ("n_tags_removed", "num"),
             ("n_clean_chars", "num")],
        ),
        "cur_extract_domains": (
            ["doc_id"],
            [("n_urls", "num"), ("n_domains", "num"), ("domains", "str")],
        ),
        # round 5: tokenizer-prep pair statistics + reverse contamination
        "cur_bpe_pairs": (
            ["pair"], [("n_occurrences", "num")],
        ),
        "cur_bench_overlap": (
            ["bench_id"],
            [("n_corpus_docs", "num"), ("n_shared_grams", "num")],
        ),
        # round 5: ingest-time curation of a new batch against standing
        # artifacts (hash index + per-source top-k), oracle = full run
        # with ingest-order keeper election filtered to batch docs
        "cur_incremental_e2e": (
            ["doc_id"],
            [("passes_repetition", "num"), ("is_exact_keeper", "num"),
             ("is_clean", "num"), ("within_quota", "num"), ("kept", "num")],
        ),
        # round 6: same flags with the standing artifacts written to and
        # read back from parquet before the batch probes them
        "cur_artifact_roundtrip": (
            ["doc_id"],
            [("passes_repetition", "num"), ("is_exact_keeper", "num"),
             ("is_clean", "num"), ("within_quota", "num"), ("kept", "num")],
        ),
        # round 6: small-file bin-pack maintenance — shard assignment
        # survives write → compact → read-back, row-exact
        "cur_compact_shards": (
            ["doc_id"],
            [("lang", "str"), ("shard_id", "num"), ("n_tokens", "num")],
        ),
        # round-8 rotation (rule §3 — no window resident qualifies
        # under §1/§2): the round-7/8 maintenance gates ride this suite
        # as re-projected parts for driver value evidence — selective
        # compaction, z-order rewrite, the streaming ingest +
        # auto-maintenance loop, and manifest snapshot isolation
        "cur_selective_compact": (
            ["doc_id"], [("lang", "str"), ("n_chars", "num")],
        ),
        "cur_zorder_compact": (
            ["doc_id"],
            [("lang", "str"), ("shard_id", "num"), ("n_tokens", "num")],
        ),
        "t_stream_maintain": (["doc_id"], [("lang", "str")]),
        "t_stream_manifest": (["doc_id"], [("lang", "str")]),
        # round 10: streaming UPSERT via merge-on-read commits —
        # latest-wins by commit sequence, maintenance materializes
        "t_stream_upsert": (
            ["doc_id"], [("lang", "str"), ("n_chars", "num")],
        ),
        # round 10: FOR TIMESTAMP AS OF — pre-mutation snapshot
        # resolved by commit wall time, row-exact vs the oracle
        "cur_time_travel": (["doc_id"], [("lang", "str")]),
        # round 10: row-level change feed from per-commit provenance —
        # append inserts + MoR insert/delete pairs, per-commit exact
        "cur_table_changes": (
            ["doc_id", "_change_type", "_commit_gen"],
            [("lang", "str"), ("n_chars", "num")],
        ),
        # round 11: the feed survives a copy-on-write merge — CDC
        # change files committed with the merge, replayed per commit
        "cur_cdc_cow": (
            ["doc_id", "_change_type", "_commit_gen"],
            [("lang", "str"), ("n_chars", "num")],
        ),
        # round 11: the feed survives a rollback — file-granular delta
        # with full-preimage deletes for the dropped files
        "cur_cdc_rollback": (
            ["doc_id", "_change_type", "_commit_gen"],
            [("lang", "str"), ("n_chars", "num")],
        ),
        # round 10: snapshot tags — tagged generation survives expiry,
        # reads back row-exact through the tag
        "cur_snapshot_tags": (
            ["doc_id"], [("lang", "str"), ("n_chars", "num")],
        ),
        # round 10: write-audit-publish — staged batches invisible,
        # quality-audited, then published or abandoned atomically
        "cur_wap_publish": (
            ["doc_id"], [("lang", "str"), ("n_chars", "num")],
        ),
        # round 10: hidden partitioning — bucket(doc_id) partitions,
        # predicates on doc_id prune through the transform
        "cur_hidden_partitioning": (
            ["doc_id"], [("lang", "str"), ("n_chars", "num")],
        ),
        # round 11: temporal hidden partitioning — day(ts) partitions,
        # RANGE predicates on ts prune through the monotone transform
        "cur_temporal_partitioning": (
            ["event_id"], [("event_type", "str"), ("value", "num")],
        ),
        # round 11: null-aware skipping — footer null counts prove
        # all-null files skippable for IS NOT NULL on sparse columns
        "cur_null_skipping": (
            ["doc_id"], [("lang", "str"), ("extra", "str")],
        ),
        # round 11: bloom-filter file index — point lookups prune on
        # UNCLUSTERED layouts where min/max stats cannot
        "cur_bloom_skipping": (
            ["doc_id"], [("lang", "str"), ("n_chars", "num")],
        ),
        # round 11: positional deletes — predicate DELETE as
        # (file, row-ordinal) pairs, zero rewrites, granular fold-in
        "cur_positional_delete": (
            ["doc_id"], [("lang", "str"), ("n_chars", "num")],
        ),
        "cur_manifest_isolation": (["doc_id"], [("lang", "str")]),
        # round 9: manifest-level data skipping (per-file min/max stats
        # + driver-side file pruning in snapshot_read(where=...))
        "cur_manifest_skipping": (["doc_id"], [("lang", "str")]),
        # round 10: file-granular copy-on-write MERGE — untouched
        # files carried byte-identical, merged read-back value-exact
        "cur_merge_cow": (
            ["doc_id"], [("lang", "str"), ("n_chars", "num")],
        ),
        # round 10: merge-on-read MERGE — equality-delete file, zero
        # data files rewritten, file-granular materialization
        "cur_merge_mor": (
            ["doc_id"], [("lang", "str"), ("n_chars", "num")],
        ),
        # round 9: the flagship alib lifecycle (chain + diff-audit
        # MERGE) on a manifest-versioned table — merged read-back
        # value-exact, pinned pre-merge reader proven intact
        "pl_chain_manifest": (
            ["__path"],
            [("title", "str"), ("subtitle", "str"), ("album", "str"),
             ("live", "str"), ("composer", "str"), ("genre", "str"),
             ("year", "str"), ("sqlmodded", "num")],
        ),
    },
    # the report family (92/94/95/96)
    "suite_reports": {
        "r92_album_stats": (
            ["album_root"],
            [("n_tracks", "num"), ("total_secs", "num"), ("avg_rating", "num"),
             ("is_compilation", "num"), ("acquired", "str")],
        ),
        "r92_format_mix": (
            ["quality_class", "filetype"],
            [("n_tracks", "num"), ("hours", "num"), ("pct_of_class", "num")],
        ),
        "r92_top_entities": (["producer"], [("n", "num")]),
        "r92_collab_pairs": (["producer", "engineer"], [("n_albums", "num")]),
        "r94_missing_critical": (
            ["album_root"],
            [("n_tracks", "num"), ("missing_title", "num"), ("missing_artist", "num"),
             ("missing_year", "num")],
        ),
        "r95_inconsistent_tags": (
            ["album_key"], [("n_variants", "num"), ("variants", "str")]
        ),
        "r96_duplicate_tracks": (
            ["scope", "sig", "folder"], [("n", "num"), ("keeper", "num")]
        ),
        "r92_replaygain": (
            ["album_root"],
            [("rg_album_gain_db", "num"), ("rg_album_peak", "num"),
             ("rg_album_gain_n", "num"), ("rg_album_peak_n", "num"),
             ("rg_track_gain_p90_p10_db", "num"), ("rg_album_peak_dbfs", "num"),
             ("rg_album_lufs", "num"), ("rg_album_plr", "num")],
        ),
        "r92_acquisition": (
            ["acquired_year", "acquired_decade"], [("albums", "num")]
        ),
        "r92_label_spread": (
            ["label_tok"], [("albums", "num"), ("artist_spread", "num")]
        ),
        "r92_genre_drift": (["decade", "bucket"], [("albums", "num")]),
        # second insights tranche (reports_insights2.py)
        "r92_artist_depth": (
            ["albumartist_tok"], [("albums", "num"), ("distinct_years", "num")]
        ),
        "r92_releasetype_mix": (
            ["albumartist_tok", "rtype"], [("n_albums", "num")]
        ),
        "r92_rating_artists": (
            ["albumartist_tok"], [("albums", "num"), ("avg_rating", "num")]
        ),
        "r92_va_share": (
            ["decade"], [("albums", "num"), ("va_albums", "num"), ("va_pct", "num")]
        ),
        "r92_studios": (["tok"], [("albums", "num"), ("artist_spread", "num")]),
        "r92_rg_trend": (
            ["album_year"], [("gain_med", "num"), ("dyn_med", "num"), ("albums", "num")]
        ),
        "r92_rg_by_genre": (
            ["bucket"], [("albums", "num"), ("gain_med", "num"), ("dyn_med", "num")]
        ),
        "r92_persona": (["persona"], [("score", "num"), ("selected", "num")]),
        "r92_genre_spotlight": (["composer_tok"], [("albums", "num")]),
        # third insights tranche (reports_insights3.py, round 8):
        # the residual card variants — timeline, RG extremes/dynamics,
        # genre-scoped role spotlights, most-performed compositions
        "r92_albums_timeline": (
            ["album_year"], [("decade", "num"), ("albums", "num")]
        ),
        "r92_rg_extremes": (
            ["side", "rank"],
            [("album_root", "str"), ("rg_album_gain_db", "num")],
        ),
        "r92_rg_dynamics": (
            ["meter", "side", "rank"],
            [("album_root", "str"), ("dyn_value", "num")],
        ),
        "r92_spotlight_roles": (
            ["scope", "rank"], [("tok", "str"), ("albums", "num")]
        ),
        "r92_most_instances": (
            ["scope", "rank"],
            [("composer_key", "str"), ("title_key", "str"),
             ("tracks", "num"), ("distinct_artists", "num")],
        ),
        # round 9: the last residual card variants — KPI header tiles,
        # album-count-by-artist bar, jazz/rockpop composer spotlights
        "r92_kpi_tiles": (["tile"], [("value", "num")]),
        "r92_albums_per_artist": (
            ["rank"], [("albumartist_tok", "str"), ("albums", "num")]
        ),
        "r92_genre_composers": (
            ["scope", "rank"], [("composer_tok", "str"), ("albums", "num")]
        ),
        # round 5: library-health card (keep-columns coverage + radar
        # missing-rate vector, compilation-aware albumartist denominators)
        "r92_health_radar": (
            ["section", "col_name"],
            [("track_pct", "num"), ("album_pct", "num")],
        ),
        "r91_snapshot_compare": (
            ["column"],
            [("track_before", "num"), ("track_after", "num"),
             ("track_delta", "num"), ("album_before", "num"),
             ("album_after", "num"), ("album_delta", "num")],
        ),
    },
}


def _base_registry() -> dict[str, tuple[QueryFn, str | None]]:
    """name -> (fn, sql) for every non-suite query module."""
    from tagminder_spark.queries import (  # noqa: PLC0415
        audit,
        curation_q,
        dedup,
        er_q,
        harvest_q,
        pipelinesteps,
        pipelinesteps_ext,
        pipelinesteps_grp,
        pipelinesteps_lookup,
        pipelinesteps_works,
        relational,
        relational_ext,
        rename_q,
        reports,
        reports_insights,
        reports_insights2,
        reports_insights3,
        scalarfns,
        scale_q,
        simsearch,
        sources_q,
        textops,
    )

    out: dict[str, tuple[QueryFn, str | None]] = {}
    for mod in (
        relational, relational_ext, scalarfns, curation_q, dedup, er_q, harvest_q, textops, simsearch,
        audit, pipelinesteps, pipelinesteps_ext, pipelinesteps_grp,
        pipelinesteps_lookup, pipelinesteps_works, reports, reports_insights,
        reports_insights2, reports_insights3, scale_q, sources_q, rename_q,
    ):
        out.update(mod.REGISTRY)
    return out


def _long_spark(df: DataFrame, part: str, keys: list[str], metrics) -> DataFrame:
    ent = (
        F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
        if keys
        else F.lit("")
    )
    pieces = []
    if not metrics:
        pieces.append(
            df.select(
                F.lit(part).alias("part"),
                ent.alias("entity"),
                F.lit("row").alias("metric"),
                F.lit(None).cast("string").alias("sval"),
                F.lit(None).cast("double").alias("dval"),
            )
        )
    for m, kind in metrics:
        pieces.append(
            df.select(
                F.lit(part).alias("part"),
                ent.alias("entity"),
                F.lit(m).alias("metric"),
                (
                    F.col(m).cast("string") if kind == "str" else F.lit(None).cast("string")
                ).alias("sval"),
                (
                    F.col(m).cast("double") if kind == "num" else F.lit(None).cast("double")
                ).alias("dval"),
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def _long_sql(sql: str, part: str, keys: list[str], metrics) -> str:
    ent = (
        "concat_ws('|', " + ", ".join(f'CAST("{k}" AS VARCHAR)' for k in keys) + ")"
        if keys
        else "''"
    )
    pieces = []
    if not metrics:
        pieces.append(
            f"SELECT '{part}' AS part, {ent} AS entity, 'row' AS metric,\n"
            f"       CAST(NULL AS VARCHAR) AS sval, CAST(NULL AS DOUBLE) AS dval\n"
            f"FROM (\n{sql}\n) AS __{part}"
        )
    for m, kind in metrics:
        sval = f'CAST("{m}" AS VARCHAR)' if kind == "str" else "CAST(NULL AS VARCHAR)"
        dval = f'CAST("{m}" AS DOUBLE)' if kind == "num" else "CAST(NULL AS DOUBLE)"
        pieces.append(
            f"SELECT '{part}' AS part, {ent} AS entity, '{m}' AS metric,\n"
            f"       {sval} AS sval, {dval} AS dval\n"
            f"FROM (\n{sql}\n) AS __{part}"
        )
    return "\nUNION ALL\n".join(pieces)


def _make_suite(suite_name: str, parts, base) -> None:
    def fn(spark: SparkSession, sf_dir: str, _parts=parts) -> DataFrame:
        out = None
        for name, (keys, metrics) in _parts.items():
            pfn, _ = base[name]
            piece = _long_spark(pfn(spark, sf_dir), name, keys, metrics)
            out = piece if out is None else out.unionByName(piece)
        return out

    fn.__name__ = suite_name
    fn.__doc__ = (
        f"Suite gate bundling {len(parts)} component queries into one "
        f"recorded correctness row: {', '.join(parts)}. Each part re-runs "
        "its registered query function and re-projects to the shared "
        "long format; the oracle unions the identically projected SQL."
    )
    sql = "\nUNION ALL\n".join(
        _long_sql(base[name][1], name, keys, metrics)
        for name, (keys, metrics) in parts.items()
    )
    REGISTRY[suite_name] = (fn, sql)


def _build() -> None:
    base = _base_registry()
    for suite_name, parts in SUITES.items():
        missing = [n for n in parts if n not in base or base[n][1] is None]
        if missing:
            raise ValueError(f"suite {suite_name}: parts missing or oracle-less: {missing}")
        _make_suite(suite_name, parts, base)


_build()

#!/bin/bash
# Resume of sf1_oracle_sweep.sh after the transient disk-full at
# pl_chain_e2e: re-runs the remaining queries, APPENDS to the log.
cd /root/repo
SF1="$(dirname "$0")/../.scaledata/sf1"
LOG="${1:-/root/repo/sf1_oracle_sweep.log}"
QUERIES=(
  pl_chain_e2e d_embedding_lsh d_ngram_jaccard_capped er_five_phase
  s98_rename_plan ann_ivf_trained h_works_role_pairs cur_repetition
  cur_decontaminate d_fuzzy_dedup_e2e d_incremental_dedup cur_dup_spans
  cur_pipeline_e2e cur_incremental_e2e cur_lm_perplexity
  d_lsh_roundtrip cur_artifact_roundtrip
)
# drop the FAIL line from the interrupted run
grep -v "^FAIL pl_chain_e2e: duckdb error: IO Error" "$LOG" > "$LOG.tmp" && mv "$LOG.tmp" "$LOG"
for q in "${QUERIES[@]}"; do
  timeout 1200 python tools/oracle_check.py "$SF1" "$q" 2>/dev/null \
    | grep -E "PASS|FAIL" >> "$LOG" || echo "TIMEOUT/ERR $q" >> "$LOG"
done
echo "sweep complete" >> "$LOG"

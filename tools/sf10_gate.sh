#!/usr/bin/env bash
# Reproducible sf10 SPOT oracle gate: the tractable-oracle picks (hash
# agg, window rank, MinHash signatures, HLL, equi-frequency bins, shard
# balance, global rank, CDC chunks, containment dedup under the absolute
# cap, and the DBSCAN eps-calibration profile) run through the engine
# (graft.Verify) and the DuckDB oracle (tools/compare.py) at sf10, and
# the per-query driver-format artifact lands in CORRECTNESS_sf10.json.
# The full board is gated at sf0.01 (driver, per round) and sf1
# (tools/sf1_gate.sh → CORRECTNESS_sf1.json); this pins the third scale
# point — 1000× the correctness SF — programmatically, not in prose.
#
# Usage: tools/sf10_gate.sh [sf10_dir] [out_dir]
set -euo pipefail
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
cd "$(dirname "$0")/.."
SF10=${1:-data/sf10}
OUT=${2:-/tmp/vout_sf10}
[ -d "$SF10" ] || { echo "no sf10 dir at $SF10 — run: python3 tools/gen_sf1.py $SF10 100"; exit 1; }

# Round-13 widening (verdict #6): the heavy graph tier (q202/q218/q210 —
# edge census rows over 600M lineitem joins, DuckDB-tractable because the
# oracle's recursive ladders are truncated at fixed hop counts), exact
# dedup (q40), text tokens (q30), CC over the near-dup graph (q46), and
# SemDeDup (q144) join the original ten.
# Round-14 widening: five more families at the third decade — bounded
# top-k aggregation (q27), tf-idf (q34), exact decontamination (q57),
# sequence packing (q66), and exact group medians via the integer-cents
# histogram walk (q91).
# Round-15 widening (verdict #4): the learned-index tier — IVF search
# (q52), PQ encode (q115), residual IVF-PQ (q137), and the exact-re-rank
# refinement (q140). The codebooks/centroids are Verify-exported to the
# _aux dir, so the DuckDB oracle rechecks assignment + ADC + re-rank
# under the exact model the Spark side trained.
QUERIES="q02_agg_groupby q12_window_rank q41_dedup_minhash q107_hll_distinct \
q128_eqfreq_bins q205_shard_balance q211_global_rank q217_cdc_chunks \
q78_containment_dedup q231_eps_calibration \
q30_text_tokens q40_dedup_exact q46_dedup_components q144_semdedup \
q202_bfs_khop q210_copurchase_topk q218_weighted_sssp \
q27_topk_agg q34_text_tfidf q57_decontam q66_sequence_pack q91_group_median \
q52_knn_ivf q115_pq_encode q137_ivfpq_residual q140_ivfpq_rerank"

rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF10 $OUT $QUERIES" 2>&1 | tail -2
python3 tools/compare.py "$OUT" "$SF10" --json CORRECTNESS_sf10.json

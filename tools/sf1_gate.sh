#!/usr/bin/env bash
# Reproducible sf1 oracle gate: runs the engine (graft.Verify) and the
# DuckDB oracle (tools/compare.py) at sf1 for the audited heavy tier —
# the 42 queries of SCALE.md's scaling-decade table, q225 included (its
# oracle CC is the unrolled hook+compress fold; the old recursive reach
# was quadratic and timed out at this scale).
#
# Usage: tools/sf1_gate.sh [sf1_dir] [out_dir]
# sf1_dir defaults to data/sf1 (generate with tools/gen_sf1.py).
set -euo pipefail
cd "$(dirname "$0")/.."
SF1=${1:-data/sf1}
OUT=${2:-/tmp/vout_sf1}
[ -d "$SF1" ] || { echo "no sf1 dir at $SF1 — run: python3 tools/gen_sf1.py $SF1 10"; exit 1; }

QUERIES="q108_bm25_rank q128_eqfreq_bins q12_window_rank q140_ivfpq_rerank \
q141_rrf_fusion q145_snapshot_diff q150_label_prop q160_crosskey_entities \
q198_spearman q200_curation_pipeline_v2 q201_bipartite_pagerank \
q202_bfs_khop q203_kmeans_lloyd q204_epoch_shuffle q205_shard_balance \
q206_tvd_drift q208_hits q210_copurchase_topk q211_global_rank \
q214_ks_test q215_kneser_ney q216_rolling_uniques q217_cdc_chunks \
q218_weighted_sssp q219_compaction_plan q220_bbit_minhash q221_pca_project \
q222_hll_rolling_uniques q223_bootstrap_ci q224_term_bursts \
q225_grid_dbscan q226_fs_linkage q227_margin_mining q228_knn_multiprobe \
q229_session_survival q230_cusum_shift q34_text_tfidf q70_curation_pipeline \
q73_ngram_novelty q76_collocations q78_containment_dedup q87_centroid_outliers"

rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF1 $OUT $QUERIES" 2>&1 | tail -2
python3 tools/compare.py "$OUT" "$SF1"

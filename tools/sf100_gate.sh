#!/usr/bin/env bash
# Reproducible sf100 SPOT oracle gate — the FOURTH scale point. Query
# picks are the sf10 gate's tractable-oracle set minus the two whose
# DuckDB side is super-linear in the corpus (q41's 5M-row signature
# recompute and q78's shingle self-join get slow past sf10 in the
# oracle, not the engine), so the gate stays a minutes-scale check:
# hash agg, window rank, HLL, equi-frequency bins (exercises the
# bucketed walk branch past the adaptive ceiling), shard balance,
# global rank over 600M lineitem rows, CDC chunks, and the DBSCAN
# eps-calibration profile (whose sf100 rung is the third-decade catch).
# With sf0.01 (full board), sf1 (full board), and sf10 (spot), this
# pins correctness at FOUR scale points spanning 10,000x.
#
# Usage: tools/sf100_gate.sh [sf100_dir] [out_dir]
set -euo pipefail
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
cd "$(dirname "$0")/.."
SF100=${1:-data/sf100}
OUT=${2:-/tmp/vout_sf100}
[ -d "$SF100" ] || { echo "no sf100 dir at $SF100 — run: python3 tools/gen_sf1.py $SF100 1000"; exit 1; }

# Round-14 widening: the same five families the sf10 gate gained —
# bounded top-k agg (q27), tf-idf (q34, documents stay sub-GB at
# sf100), exact decontam (q57), sequence packing (q66), and the
# integer-cents group-median walk (q91) — all DuckDB-tractable at the
# fourth decade.
QUERIES="q02_agg_groupby q12_window_rank q107_hll_distinct q128_eqfreq_bins \
q205_shard_balance q211_global_rank q217_cdc_chunks q231_eps_calibration \
q27_topk_agg q34_text_tfidf q57_decontam q66_sequence_pack q91_group_median"

rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF100 $OUT $QUERIES" 2>&1 | tail -2
python3 tools/compare.py "$OUT" "$SF100" --json CORRECTNESS_sf100.json

#!/usr/bin/env bash
# Round-14 phase 3: the remaining measured records —
#  - dedup11 blocked-mode sf30 (row mode validated by failure: killed
#    after 47 min without one sweep)
#  - DuckDB q04/q01 at sf10 (pairs for the bucketed table)
#  - full-suite sf0.1 bench (BENCH_r14 preview, honest)
#  - tracked sf10 heavyweight subset (now includes the graph family)
set -uo pipefail
cd /root/repo
R=tools/runs

echo "=== dedup13 sketch mode sf30, default maxResultSize (retry with fixed probe) ==="
SPARK_GRAFT_SF_DIR=/root/sfgen/sf30 \
  tools/run_main.sh graft.ProbeDedup13Stages 2>/dev/null | tee "$R/dedup13_sketch_sf30_r14.txt"

echo "=== dedup11 blocked sf30 ==="
SPARK_GRAFT_SF_DIR=/root/sfgen/sf30 SPARK_GRAFT_SWEEPS=2 SPARK_DRIVER_MEM=16g \
  tools/run_main.sh graft.ProbeDedup11 blocked 2>/dev/null | tee "$R/dedup11_sf30_r14.txt"

echo "=== duckdb q01/q04 sf10 (bucketed-pair window) ==="
python3 tools/baseline.py /root/sfgen/sf10 /tmp/oracle_q.json "$R/q_sf10_duck_r14.json" 300 2>/dev/null | tail -3

echo "=== full suite sf0.1 (BENCH_r14 preview) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  tools/run_main.sh graft.Bench 2>/dev/null | tail -1

echo "=== sf10 heavyweight subset (tracked record) ==="
# the r12/r13 tracked 33 + the round-14 graph family additions
# (diffable: the detail JSON now records the subset string)
HW="cat03_column_stats,dedup04_minhash_lsh,dedup08_cluster_resolve,dedup11_semantic,dedup12_incremental,dedup13_exact_substring,dedup15_contamination_report,emb02_pca_projection,evt02_sessionization,evt10_lateness_profile,graph06_pagerank,pipe02_weighted_corpus,pipe03_eval_suite,q01_pricing_summary,q04_order_priority,q10_returned_items,q18_large_orders,rel01_running_total,samp05_leakage_safe_split,samp07_soft_dedup,samp14_cluster_balance,sim06_ivf_trained,sim11_knn_graph_ann,sim13_pq_refine,sim14_ivf_pq,sim15_ivfpq_refine,txt15_unigram_logprob,txt23_bigram_logprob,txt24_quality_panel,xref02_unified_entities,xref08_bridges,xref10_upset_overlap,xref12_coverage_by_year,graph27_bfs_distances,graph30_shortest_paths,graph08_ancestor_paths"
SPARK_GRAFT_SF_DIR=/root/sfgen/sf10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_QUERIES="$HW" \
  tools/run_main.sh graft.Bench 2>/dev/null | tail -1

echo "=== DONE r14 phase3 ==="

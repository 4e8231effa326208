#!/usr/bin/env bash
# Round-15 measurement batch (VERDICT r14 items 1-4, 8):
#  1. standalone min-of-5 re-measures of the r14 drift set
#     (pipe02/pipe03/sim14/sim15) at sf0.1 — pin noise-not-regression
#  2. graph06 DuckDB pairs at sf3/sf10 (finish the iterative ladder)
#  3. sf10 subset re-pin at 8g heap (fixed basis for future diffs)
#  4. q04 countDistinct-free candidates over the bucketed layout at
#     sf10/sf30 (+ dedup13 sketch-vs-set interleaved pair at sf30)
#  8. sf30 Pregel ladder points (graph27/30/08/09) + same-window DuckDB
# Sequential on purpose: overlapping runs contend for the same 32
# threads and pollute both timings. No sbt compiles while this runs.
set -uo pipefail
cd /root/repo
R=tools/runs

echo "=== 1. noise re-measure sf0.1 (min-of-5) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SWEEPS=5 \
  tools/run_main.sh graft.BenchOne \
    pipe02_weighted_corpus pipe03_eval_suite sim14_ivf_pq sim15_ivfpq_refine \
    2>/dev/null | tee "$R/noise_sf0.1_r15.txt"
echo "=== 1b. same-window DuckDB for the noise set (context) ==="
python3 tools/baseline.py /root/testdata/sf0.1 /tmp/oracle_noise.json \
  "$R/noise_sf0.1_duck_r15.json" 150 2>/dev/null | tail -3

echo "=== 2. graph06 DuckDB pairs (300s cap) ==="
python3 tools/baseline.py /root/sfgen/sf3 /tmp/oracle_g6.json \
  "$R/g6_sf3_duck_r15.json" 300 2>/dev/null | tail -2
python3 tools/baseline.py /root/sfgen/sf10 /tmp/oracle_g6.json \
  "$R/g6_sf10_duck_r15.json" 300 2>/dev/null | tail -2
echo "=== 2b. graph06 graft same-window sf3/sf10 ==="
SPARK_GRAFT_SF_DIR=/root/sfgen/sf3 SPARK_GRAFT_SWEEPS=3 \
  tools/run_main.sh graft.BenchOne graph06_pagerank 2>/dev/null \
  | tee "$R/g6_sf3_graft_r15.txt"
SPARK_GRAFT_SF_DIR=/root/sfgen/sf10 SPARK_GRAFT_SWEEPS=3 SPARK_DRIVER_MEM=8g \
  tools/run_main.sh graft.BenchOne graph06_pagerank 2>/dev/null \
  | tee "$R/g6_sf10_graft_r15.txt"

echo "=== 3. sf10 subset re-pin at 8g ==="
SPARK_GRAFT_SF_DIR=/root/sfgen/sf10 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=8g \
SPARK_GRAFT_QUERIES="cat03_column_stats,dedup04_minhash_lsh,dedup08_cluster_resolve,dedup11_semantic,dedup12_incremental,dedup13_exact_substring,dedup15_contamination_report,emb02_pca_projection,evt02_sessionization,evt10_lateness_profile,graph06_pagerank,pipe02_weighted_corpus,pipe03_eval_suite,q01_pricing_summary,q04_order_priority,q10_returned_items,q18_large_orders,rel01_running_total,samp05_leakage_safe_split,samp07_soft_dedup,samp14_cluster_balance,sim06_ivf_trained,sim11_knn_graph_ann,sim13_pq_refine,sim14_ivf_pq,sim15_ivfpq_refine,txt15_unigram_logprob,txt23_bigram_logprob,txt24_quality_panel,xref02_unified_entities,xref08_bridges,xref10_upset_overlap,xref12_coverage_by_year,graph27_bfs_distances,graph30_shortest_paths,graph08_ancestor_paths" \
  tools/run_main.sh graft.Bench 2>/dev/null | tail -1 \
  | tee "$R/sf10_subset_8g_r15_summary.json"

echo "=== 4a. q04 bucketed candidates sf10 ==="
SPARK_GRAFT_SF_DIR=/root/sfgen/sf10 SPARK_GRAFT_SWEEPS=3 \
  tools/run_main.sh graft.ProbeBucketed 2>/dev/null \
  | tee "$R/bucketed_sf10_r15.txt"
echo "=== 4b. q04 bucketed candidates sf30 ==="
SPARK_GRAFT_SF_DIR=/root/sfgen/sf30 SPARK_GRAFT_SWEEPS=3 SPARK_DRIVER_MEM=16g \
  tools/run_main.sh graft.ProbeBucketed 2>/dev/null \
  | tee "$R/bucketed_sf30_r15.txt"

echo "=== 4c. dedup13 sketch-vs-set interleaved sf30 ==="
SPARK_GRAFT_SF_DIR=/root/sfgen/sf30 SPARK_DRIVER_MEM=16g \
  tools/run_main.sh graft.ProbeDedup13Mode 4 2>/dev/null \
  | tee "$R/dedup13_mode_sf30_r15.txt"

echo "=== 8. sf30 Pregel ladder ==="
SPARK_GRAFT_SF_DIR=/root/sfgen/sf30 SPARK_GRAFT_SWEEPS=3 SPARK_DRIVER_MEM=16g \
  tools/run_main.sh graft.BenchOne \
    graph27_bfs_distances graph30_shortest_paths graph08_ancestor_paths graph09_sparql_text \
    2>/dev/null | tee "$R/pregel_sf30_graft_r15.txt"
echo "=== 8b. same-window DuckDB (300s cap) ==="
python3 tools/baseline.py /root/sfgen/sf30 /tmp/oracle_pregel.json \
  "$R/pregel_sf30_duck_r15.json" 300 2>/dev/null | tail -3

echo "=== DONE r15 measure ==="

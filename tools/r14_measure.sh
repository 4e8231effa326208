#!/usr/bin/env bash
# Round-14 measurement batch (VERDICT r13 #1b/#2/#3/#4/#7):
#  - cleared-cache ladder for the cache()-using family, graft +
#    same-window DuckDB, at sf0.1/sf1/sf3/sf10
#  - q01 sf30 pair (the last >2x row with no largest-scale pair)
#  - dedup11 row-vs-blocked cutover pair at sf30
#  - q04/q10/q18 bucketed-layout probe at sf10/sf30
# Sequential on purpose: overlapping runs would contend for the same
# 32 threads and pollute both timings.
set -uo pipefail
cd /root/repo
R=tools/runs
FAM="graph02_transitive_closure graph08_ancestor_paths graph09_sparql_text graph20_sparql_path_star graph27_bfs_distances graph30_shortest_paths ing04_obo_closure dedup03_ngram_jaccard dedup04_minhash_lsh dedup10_containment dedup12_incremental samp05_leakage_safe_split samp07_soft_dedup"

echo "=== genscale sf3 ==="
if [ ! -d /root/sfgen/sf3 ]; then
  tools/run_main.sh graft.GenScale /root/testdata/sf0.1 /root/sfgen/sf3 30 2>/dev/null | tail -2
fi

for pair in "sf0.1:/root/testdata/sf0.1" "sf1:/root/sfgen/sf1" "sf3:/root/sfgen/sf3" "sf10:/root/sfgen/sf10"; do
  name="${pair%%:*}"; dir="${pair##*:}"
  echo "=== family graft $name ==="
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_SWEEPS=3 \
    tools/run_main.sh graft.BenchOne $FAM 2>/dev/null | tee "$R/fam_${name}_graft_r14.txt"
  echo "=== family duckdb $name (same window) ==="
  python3 tools/baseline.py "$dir" /tmp/oracle_fam.json "$R/fam_${name}_duck_r14.json" 150 2>/dev/null | tail -3
done

echo "=== q01 sf30 pair ==="
SPARK_GRAFT_SF_DIR=/root/sfgen/sf30 SPARK_GRAFT_SWEEPS=3 \
  tools/run_main.sh graft.BenchOne q01_pricing_summary q04_order_priority 2>/dev/null | tee "$R/q01_sf30_graft_r14.txt"
python3 tools/baseline.py /root/sfgen/sf30 /tmp/oracle_q.json "$R/q_sf30_duck_r14.json" 300 2>/dev/null | tail -3

echo "=== dedup11 cutover sf30 ==="
SPARK_GRAFT_SF_DIR=/root/sfgen/sf30 SPARK_GRAFT_SWEEPS=3 \
  tools/run_main.sh graft.ProbeDedup11 2>/dev/null | tee "$R/dedup11_sf30_r14.txt"

echo "=== bucketed sf10 ==="
SPARK_GRAFT_SF_DIR=/root/sfgen/sf10 SPARK_GRAFT_SWEEPS=3 \
  tools/run_main.sh graft.ProbeBucketed 2>/dev/null | tee "$R/bucketed_sf10_r14.txt"
echo "=== bucketed sf30 ==="
SPARK_GRAFT_SF_DIR=/root/sfgen/sf30 SPARK_GRAFT_SWEEPS=3 SPARK_DRIVER_MEM=16g \
  tools/run_main.sh graft.ProbeBucketed 2>/dev/null | tee "$R/bucketed_sf30_r14.txt"

echo "=== DONE r14 measure ==="

#!/usr/bin/env bash
# Round-14 phase 2 (after r14_measure.sh): re-measure the family
# ladder's graft side under the FINAL kernels (LongAdj-indexed
# graph27/30, Pregel closure), dedup13 sketch-mode sf30 under the
# default maxResultSize, clustered-corpus ANN recall, and the
# streaming file replay. Sequential — no contention.
set -uo pipefail
cd /root/repo
R=tools/runs
FAM="graph02_transitive_closure graph08_ancestor_paths graph09_sparql_text graph20_sparql_path_star graph27_bfs_distances graph30_shortest_paths ing04_obo_closure dedup03_ngram_jaccard dedup04_minhash_lsh dedup10_containment dedup12_incremental samp05_leakage_safe_split samp07_soft_dedup"

for pair in "sf0.1:/root/testdata/sf0.1" "sf1:/root/sfgen/sf1" "sf3:/root/sfgen/sf3" "sf10:/root/sfgen/sf10"; do
  name="${pair%%:*}"; dir="${pair##*:}"
  echo "=== family graft $name (final kernels) ==="
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_SWEEPS=3 \
    tools/run_main.sh graft.BenchOne $FAM 2>/dev/null | tee "$R/fam_${name}_graft_r14b.txt"
done

echo "=== dedup13 sketch mode sf30, default maxResultSize ==="
SPARK_GRAFT_SF_DIR=/root/sfgen/sf30 \
  tools/run_main.sh graft.ProbeDedup13Stages 2>/dev/null | tail -8 | tee "$R/dedup13_sketch_sf30_r14.txt"

echo "=== clustered embeddings gen (sf1c: 20k/64c, sf10c: 200k/200c) ==="
tools/run_main.sh graft.GenClusteredEmb /root/sfgen/sf1c 20000 64 0.35 2>/dev/null | tail -1
tools/run_main.sh graft.GenClusteredEmb /root/sfgen/sf10c 200000 200 0.35 2>/dev/null | tail -1

echo "=== recall uniform sf1 ==="
SPARK_GRAFT_SF_DIR=/root/sfgen/sf1 SPARK_GRAFT_NLIST=10,64,141 \
  tools/run_main.sh graft.ProbeRecall 2>/dev/null | tee "$R/recall_sf1_uniform_r14.txt"
echo "=== recall clustered sf1c ==="
SPARK_GRAFT_SF_DIR=/root/sfgen/sf1c SPARK_GRAFT_NLIST=10,64,141 \
  tools/run_main.sh graft.ProbeRecall 2>/dev/null | tee "$R/recall_sf1c_r14.txt"
echo "=== recall clustered sf10c ==="
SPARK_GRAFT_SF_DIR=/root/sfgen/sf10c SPARK_GRAFT_NLIST=14,200,447 \
  tools/run_main.sh graft.ProbeRecall 2>/dev/null | tee "$R/recall_sf10c_r14.txt"

echo "=== streaming replay sf1 (12 batches) ==="
SPARK_GRAFT_SF_DIR=/root/sfgen/sf1 \
  tools/run_main.sh graft.ProbeStreamReplay 12 2>/dev/null | grep -E "^\[" | tee "$R/stream_replay_sf1_r14.txt"

echo "=== DONE r14 phase2 ==="

#!/bin/bash
# Round-16 rung work, as executed (gates strictly sequential; engine
# runs may overlap ONE gate only when disk headroom allows — the one
# overlap this round cost a v19_s97 oracle retry when the gate's spill
# and a Spark run shared the same 43 GB of free disk):
#  A. sf1: the two new attestation twins (hg2_hnsw_s3 — hg2's walk over
#     the hg1_hnsw_s3 sliced graph; kg1_knn_s3 — the thresholdless kNN
#     graph on the vec_id%3 slice) verified + gated into the
#     full-registry artifact (259 -> 261 rows).
#  B. sf100 (fixture: make_sfN.py 1000): the pair/vector/hybrid
#     families gated at 1000x the driver SF — d4/d7 FULL, d6 FULL
#     (2M vectors, 6.19M pairs, oracle 596.8 s), d10_neardup_s3,
#     kg1_knn_s3, v19_hybrid_s97 (oracle needs GRAFT_GATE_MEM=100GB:
#     at 72GB its radix spill exceeded the node's free disk).
#  C. sf30: hg2_hnsw_s3 + kg1_knn_s3 gated (100GB oracle), closing the
#     r15 verdict's walk-attestation gap; tracked exclusions file
#     passed through, never overwritten.
set -u
cd "$(dirname "$0")/.."

cleanup_tmp() {
  rm -rf /tmp/blockmgr-* /tmp/spark-[0-9a-f]* /tmp/duckdb_gate_spill
}

echo "=== stage A: sf1 — gate the two new twins ==="
SPARK_DRIVER_MEM=16g SPARK_GRAFT_CPUS=24 \
  sbt "runMain graft.Verify /tmp/sf1 /tmp/verify_sf1_r16 hg2_hnsw_s3 kg1_knn_s3" || exit 1
python3 tools/gate_sf1.py /tmp/sf1 /tmp/verify_sf1_r16 CORRECTNESS_sf1.json || exit 1
python3 tools/artifact_lint.py || exit 1
cleanup_tmp

echo "=== stage B: sf100 — pair/vector/hybrid families at 1000x ==="
if [ ! -f /tmp/sf100/lineitem.parquet ]; then
  python3 tools/make_sfN.py 1000 /root/testdata/sf0.1 /tmp/sf100 || exit 1
fi
SPARK_DRIVER_MEM=16g SPARK_GRAFT_CPUS=24 SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  sbt "runMain graft.Verify /tmp/sf100 /tmp/verify_sf100_r16 d4_simhash d7_simhash_pairs d10_neardup_s3 kg1_knn_s3" || exit 1
GRAFT_GATE_MEM=72GB \
  python3 tools/gate_sf1.py /tmp/sf100 /tmp/verify_sf100_r16 CORRECTNESS_sf100.json || exit 1
SPARK_DRIVER_MEM=16g SPARK_GRAFT_CPUS=24 SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  sbt "runMain graft.Verify /tmp/sf100 /tmp/verify_sf100_r16b v19_hybrid_s97 d6_neardup_lsh" || exit 1
# 100GB: v19_s97's 5M-doc oracle agg spilled past free disk at 72GB;
# at 100GB it stays in RAM (peak RSS ~64GB observed)
GRAFT_GATE_MEM=100GB \
  python3 tools/gate_sf1.py /tmp/sf100 /tmp/verify_sf100_r16b CORRECTNESS_sf100.json || exit 1
python3 tools/artifact_lint.py || exit 1
cleanup_tmp

echo "=== stage C: sf30 — walk-twin attestation ==="
SPARK_DRIVER_MEM=16g SPARK_GRAFT_CPUS=24 SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  sbt "runMain graft.Verify /tmp/sf30 /tmp/verify_sf30_r16 hg2_hnsw_s3 kg1_knn_s3" || exit 1
GRAFT_GATE_MEM=100GB GRAFT_GATE_EXCLUSIONS=tools/exclusions_sf30.json \
  python3 tools/gate_sf1.py /tmp/sf30 /tmp/verify_sf30_r16 CORRECTNESS_sf30.json || exit 1
python3 tools/artifact_lint.py || exit 1
cleanup_tmp

echo "=== stage D: bench splices (run on an idle box) ==="
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/tmp/sf100 SPARK_GRAFT_CPUS=24 SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  SPARK_GRAFT_QUERIES=d4_simhash,d7_simhash_pairs,d10_neardup_s3,kg1_knn_s3,v19_hybrid_s97,d6_neardup_lsh \
  sbt "runMain graft.Bench" | grep '"metric"' | sed 's/^\[info\] //' \
  > /tmp/bench_sf100_r16.json || exit 1
python3 tools/splice_bench.py BENCH_sf100.json BENCH_DETAIL.json r16 || exit 1
cleanup_tmp
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/tmp/sf30 SPARK_GRAFT_CPUS=24 SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  SPARK_GRAFT_QUERIES=hg2_hnsw_s3,kg1_knn_s3 \
  sbt "runMain graft.Bench" | grep '"metric"' | sed 's/^\[info\] //' \
  > /tmp/bench_sf30_r16.json || exit 1
python3 tools/splice_bench.py BENCH_sf30.json BENCH_DETAIL.json r16 || exit 1
cleanup_tmp
echo "=== r16 rungs complete ==="

# === stage E (executed later in r16): fused-kernel re-splices ===
# After graft.functions.HyperplaneBuckets landed (bit-identical to the
# tree form — no re-gating; full sf0.01 gate re-run green 259+2), all
# hyperplane-LSH bench rows were re-measured and re-spliced:
#   sf100: d4,d7,d10_s3,kg1_s3,v19_s97,d6 (one JVM, quiet box)
#   sf30:  per-batch fresh JVMs — [d10,d10_s3,d6], [hg1,hg2],
#          [kg1,kg1_s3,hg1_s3,hg2_s3], v19 rows from the first pass.
#          RULE: one shared JVM retains every prior query's shuffle
#          files until GC; the 11-query single-JVM attempt filled the
#          disk mid-suite (hg1's build scratch) and poisoned 8 rows
#          with instant disk-full failures. Batch per family, cleanup
#          /tmp/blockmgr-* /tmp/spark-* between, keep >=70GB free for
#          hg1-full/kg1 at sf30 (delete /tmp/sf100 first if present).
#   sf10:  hg1,hg2,kg1,v19,v19_s97,v7,sem1 (one JVM, load 0.56)
#   sf1:   12-row family batch (warm artifacts, load 0.61)
# LatencyReport re-measured on the regenerated sf1 fixture:
# ivf_local nprobe 16->32 (measured knee: recall 0.938), hybrid cap
# 2048 tradeoff recorded (P99 9.0->2.3ms at agreement 1.0->0.886).

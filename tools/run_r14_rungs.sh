#!/bin/bash
# Round-14 rung completion: gate the rebuilt v19_hybrid_ann at sf10
# (the r13 run died in v19's fused-codegen stage — see
# CorpusQueries.v19HybridAnn's vixcb scaladoc), splice its bench row,
# then run the extended sf30 and broadened sf100 rungs (r12 verdict
# tasks 3/5, still open). d4/d7/m4/ix3 were re-gated at sf10 earlier
# this round (CORRECTNESS_sf10.json 63 rows / 60 pass).
# Gates strictly sequential; artifact headers recomputed by
# tools/artifact_lint.py on every mutation.
set -u
cd "$(dirname "$0")/.."

echo "=== stage 1: v19 at sf10 ==="
if [ ! -f /tmp/sf10/lineitem.parquet ]; then
  python3 tools/make_sfN.py 100 /root/testdata/sf0.1 /tmp/sf10 || exit 1
fi
SPARK_DRIVER_MEM=16g SPARK_GRAFT_CPUS=24 \
  sbt "runMain graft.Verify /tmp/sf10 /tmp/verify_sf10_v19b v19_hybrid_ann" || exit 1
GRAFT_GATE_EXCLUSIONS=tools/exclusions_sf10.json \
  python3 tools/gate_sf1.py /tmp/sf10 /tmp/verify_sf10_v19b CORRECTNESS_sf10.json || exit 1
# delta-bench the five refreshed rows; splice query_sec (sec - build_sec)
# so a cold artifact build never inflates the warm full-run artifact
# (r13 advice), and record build_sec per spliced row.
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_CPUS=24 \
  SPARK_GRAFT_QUERIES=d4_simhash,d7_simhash_pairs,m4_approx_pcts,v19_hybrid_ann,ix3_width_preflight \
  sbt "runMain graft.Bench" | grep '"metric"' | sed 's/^\[info\] //' \
  > /tmp/bench_sf10_delta.json || exit 1
# schema-preserving splice (r14 advice: the inline scalar splice broke
# the dict-rows artifact and TypeError'd on the value recompute)
python3 tools/splice_bench.py BENCH_sf10.json BENCH_DETAIL.json r14 || exit 1
rm -rf /tmp/blockmgr-* /tmp/spark-1* /tmp/spark-2* /tmp/spark-3* /tmp/spark-4* /tmp/spark-5* /tmp/spark-6* /tmp/spark-7* /tmp/spark-8* /tmp/spark-9* /tmp/spark-a* /tmp/spark-b* /tmp/spark-c* /tmp/spark-d* /tmp/spark-e* /tmp/spark-f*

echo "=== stage 2: sf30 extended ==="
tools/run_sf30.sh || exit 1
python3 tools/artifact_lint.py || exit 1
rm -rf /tmp/blockmgr-*

echo "=== stage 3: sf100 broadened ==="
rm -rf /tmp/sf30   # disk budget: the 17 GB sf100 fixture needs room
tools/run_sf100.sh || exit 1
python3 tools/artifact_lint.py || exit 1
rm -rf /tmp/blockmgr-*
echo "=== r14 rungs complete ==="

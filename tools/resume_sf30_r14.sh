#!/bin/bash
# Resume the r14 extended sf30 rung after the interrupted run
# (session died mid-q10_distinct; 12/29 query dumps completed with
# _SUCCESS markers in /tmp/verify_sf30). Verify only the missing
# queries, then gate/bench the full repr_sf30.txt set as usual.
set -u
cd "$(dirname "$0")/.."
SF30=${1:-/tmp/sf30}
OUT=/tmp/verify_sf30

if [ ! -f "$SF30/lineitem.parquet" ]; then
  python3 tools/make_sfN.py 300 /root/testdata/sf0.1 "$SF30" || exit 1
fi

ALL=$(grep -v '^#' tools/repr_sf30.txt | grep -v '^$')
REMAINING=""
for q in $ALL; do
  [ -f "$OUT/$q/_SUCCESS" ] || REMAINING="$REMAINING $q"
done
echo "resume: remaining =$REMAINING"

if [ -n "$REMAINING" ]; then
  SPARK_DRIVER_MEM=16g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} \
    sbt "runMain graft.Verify $SF30 $OUT $REMAINING" || exit 1
fi
# every row present and complete?
for q in $ALL; do
  [ -f "$OUT/$q/_SUCCESS" ] || { echo "MISSING $q after verify"; exit 1; }
done

GRAFT_GATE_EXCLUSIONS=tools/exclusions_sf30.json \
  python3 tools/gate_sf1.py "$SF30" "$OUT" CORRECTNESS_sf30.json || exit 1

SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR="$SF30" SPARK_GRAFT_SHUFFLE_PARTITIONS=256 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} \
  SPARK_GRAFT_QUERIES=$(grep -v '^#' tools/repr_sf30.txt | grep -v '^$' | paste -sd,) \
  sbt "runMain graft.Bench" | grep '"metric"' | sed 's/^\[info\] //' \
  > BENCH_sf30.json || exit 1
cat BENCH_sf30.json
python3 tools/artifact_lint.py || exit 1
echo "=== sf30 resume complete ==="

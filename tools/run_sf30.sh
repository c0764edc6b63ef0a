#!/bin/bash
# sf30 stretch rung (300x sf0.1): synthesize the fixture, verify the
# cheap-exponent subset (tools/repr_sf30.txt), gate it against DuckDB,
# and bench the same subset. Same resume semantics as run_sf10.sh.
#
# Usage: tools/run_sf30.sh [fixture_dir]
set -u
cd "$(dirname "$0")/.."
SF30=${1:-/tmp/sf30}

if [ ! -f "$SF30/lineitem.parquet" ]; then
  python3 tools/make_sfN.py 300 /root/testdata/sf0.1 "$SF30" || exit 1
fi

QUERIES=$(grep -v '^#' tools/repr_sf30.txt | grep -v '^$' | tr '\n' ' ')
# 16g heap (the run_sf10.sh lesson: big heaps buffer ~0.6*heap before
# spilling and full-GC pauses blow the executor heartbeat; early spill
# is the right behavior at rung scale)
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} \
  sbt "runMain graft.Verify $SF30 /tmp/verify_sf30 $QUERIES" || exit 1

GRAFT_GATE_EXCLUSIONS=tools/exclusions_sf30.json \
  python3 tools/gate_sf1.py "$SF30" /tmp/verify_sf30 CORRECTNESS_sf30.json || exit 1

SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR="$SF30" SPARK_GRAFT_SHUFFLE_PARTITIONS=256 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} \
  SPARK_GRAFT_QUERIES=$(grep -v '^#' tools/repr_sf30.txt | grep -v '^$' | paste -sd,) \
  sbt "runMain graft.Bench" | grep '"metric"' | sed 's/^\[info\] //' \
  > BENCH_sf30.json
cat BENCH_sf30.json

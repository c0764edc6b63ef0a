#!/bin/bash
# sf10 scale rung (100x sf0.1): synthesize the fixture, verify the
# representative subset (tools/repr50.txt), gate it against DuckDB,
# and bench the same subset. Everything is resumable: re-running skips
# recorded gate rows, and Verify only re-dumps the queries passed.
#
# Usage: tools/run_sf10.sh [fixture_dir]
set -u
cd "$(dirname "$0")/.."
SF10=${1:-/tmp/sf10}

if [ ! -f "$SF10/lineitem.parquet" ]; then
  python3 tools/make_sfN.py 100 /root/testdata/sf0.1 "$SF10" || exit 1
fi

# r12: the pair-LSH family is N-adaptive (pairBits ~ log2(N/32)), so
# kg1/hg1/hg2 run Spark-side within the node budget — no query skips.
QUERIES=$(grep -v '^#' tools/repr50.txt | grep -v '^$' | tr '\n' ' ')
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} \
  sbt "runMain graft.Verify $SF10 /tmp/verify_sf10 $QUERIES" || exit 1

GRAFT_GATE_EXCLUSIONS=tools/exclusions_sf10.json \
  python3 tools/gate_sf1.py "$SF10" /tmp/verify_sf10 CORRECTNESS_sf10.json

# 16g heap, NOT bigger: a large heap lets Spark's unified memory buffer
# ~0.6*heap before spilling, and full-GC pauses on a 70 GB heap exceed
# the 10 s executor heartbeat (observed: a1_asof GC death spiral at
# 72g; clean early-spill run at 16g).
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR="$SF10" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} \
  SPARK_GRAFT_QUERIES=$(grep -v '^#' tools/repr50.txt | grep -v '^$' | paste -sd,) \
  sbt "runMain graft.Bench" | grep '"metric"' | sed 's/^\[info\] //' \
  > BENCH_sf10.json
cat BENCH_sf10.json

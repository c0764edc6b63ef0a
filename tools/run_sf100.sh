#!/bin/bash
# sf100 probe (1000x sf0.1): the flattest-exponent subset
# (tools/repr_sf100.txt) verified, gated, benched. Run gates ALONE —
# two concurrent DuckDB gates have eaten this node's disk twice.
#
# Usage: tools/run_sf100.sh [fixture_dir]
set -u
cd "$(dirname "$0")/.."
SF100=${1:-/tmp/sf100}

if [ ! -f "$SF100/lineitem.parquet" ]; then
  python3 tools/make_sfN.py 1000 /root/testdata/sf0.1 "$SF100" || exit 1
fi

QUERIES=$(grep -v '^#' tools/repr_sf100.txt | grep -v '^$' | tr '\n' ' ')
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} \
  sbt "runMain graft.Verify $SF100 /tmp/verify_sf100 $QUERIES" || exit 1

# 72GB: d8's 5M-doc components oracle needs ~95GB working set; at the
# default 48GB it spills >42GB and outruns this node's free disk (r15,
# twice). 72GB in-RAM + ~24GB spill fits both budgets.
GRAFT_GATE_MEM=${GRAFT_GATE_MEM:-72GB} \
  python3 tools/gate_sf1.py "$SF100" /tmp/verify_sf100 CORRECTNESS_sf100.json || exit 1

SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR="$SF100" SPARK_GRAFT_SHUFFLE_PARTITIONS=256 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} \
  SPARK_GRAFT_QUERIES=$(grep -v '^#' tools/repr_sf100.txt | grep -v '^$' | paste -sd,) \
  sbt "runMain graft.Bench" | grep '"metric"' | sed 's/^\[info\] //' \
  > BENCH_sf100.json
cat BENCH_sf100.json

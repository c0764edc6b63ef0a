#!/bin/bash
# Round-13 rung refresh: re-gate the rows changed this round (60-bit
# simhash d4/d7, m4 NULL guard) and gate the new rows (v19_hybrid_ann,
# ix3_width_preflight) at sf1 and sf10, then extend sf30 with the
# N-adaptive pair/graph family and broaden sf100 to 22 rows.
# Gates are strictly SEQUENTIAL (two concurrent DuckDB gates ate the
# node's disk twice in r12). Resumable: recorded gate rows are skipped,
# so a crash costs wall-clock only.
set -u
cd "$(dirname "$0")/.."
CH_ROWS="d4_simhash d7_simhash_pairs m4_approx_pcts v19_hybrid_ann ix3_width_preflight"

echo "=== stage 1: sf1 refresh ==="
# invalidate the rows whose OUTPUT changed (60-bit simhash) or that are
# new this round; resumable gate re-checks exactly those
python3 - <<'EOF'
import json
for art in ["CORRECTNESS_sf1.json", "CORRECTNESS_sf10.json"]:
    d = json.load(open(art))
    for q in ["d4_simhash", "d7_simhash_pairs", "m4_approx_pcts"]:
        d["queries"].pop(q, None)
    json.dump(d, open(art, "w"), indent=1)
    print(art, "rows now", len(d["queries"]))
EOF
SPARK_DRIVER_MEM=16g sbt "runMain graft.Verify /tmp/sf1 /tmp/verify_sf1_r13 $CH_ROWS" || exit 1
python3 tools/gate_sf1.py /tmp/sf1 /tmp/verify_sf1_r13 CORRECTNESS_sf1.json || exit 1
rm -rf /tmp/blockmgr-* /tmp/spark-*

echo "=== stage 2: sf10 refresh ==="
if [ ! -f /tmp/sf10/lineitem.parquet ]; then
  python3 tools/make_sfN.py 100 /root/testdata/sf0.1 /tmp/sf10 || exit 1
fi
SPARK_DRIVER_MEM=16g SPARK_GRAFT_CPUS=24 \
  sbt "runMain graft.Verify /tmp/sf10 /tmp/verify_sf10_r13 $CH_ROWS" || exit 1
GRAFT_GATE_EXCLUSIONS=tools/exclusions_sf10.json \
  python3 tools/gate_sf1.py /tmp/sf10 /tmp/verify_sf10_r13 CORRECTNESS_sf10.json || exit 1
# delta-bench the changed/new rows and splice them into BENCH_sf10.json
# (r12's full 60-row artifact stays; spliced rows re-measured quiet)
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_CPUS=24 \
  SPARK_GRAFT_QUERIES=$(echo $CH_ROWS | tr ' ' ',') \
  sbt "runMain graft.Bench" | grep '"metric"' | sed 's/^\[info\] //' \
  > /tmp/bench_sf10_delta.json
python3 - <<'EOF'
import json
full = json.load(open("BENCH_sf10.json"))
delta = json.load(open("/tmp/bench_sf10_delta.json"))
det = json.load(open("BENCH_DETAIL.json"))  # full per-row map of the delta run
for q, row in det["queries"].items():
    full["queries"][q] = round(row["sec"], 2)
full["r13_respliced"] = sorted(det["queries"].keys())
full["value"] = round(sum(full["queries"].values()), 2)
json.dump(full, open("BENCH_sf10.json", "w"))
print("BENCH_sf10 spliced:", full["r13_respliced"])
EOF
rm -rf /tmp/blockmgr-* /tmp/spark-*

echo "=== stage 3: sf30 extended ==="
tools/run_sf30.sh || exit 1
rm -rf /tmp/blockmgr-* /tmp/spark-*

echo "=== stage 4: sf100 broadened ==="
rm -rf /tmp/sf10 /tmp/sf30   # disk budget: the 17 GB fixture needs room
tools/run_sf100.sh || exit 1
rm -rf /tmp/blockmgr-* /tmp/spark-*
echo "=== r13 rungs complete ==="

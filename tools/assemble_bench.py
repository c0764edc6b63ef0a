#!/usr/bin/env python3
"""Assemble a BENCH artifact from the bench run's stderr lines.

graft.Bench writes BENCH_DETAIL.json only at end-of-run; the per-query
`[bench] name   12.34s (build 1.2s)` stderr lines stream as it goes.
This reconstructs the same JSON shape from a (possibly truncated) log,
so a wall-clock-cut run still yields a committable artifact.

Usage: python3 tools/assemble_bench.py /tmp/bench_sf10.log /tmp/sf10 > BENCH_sf10.json
"""
import json
import re
import sys

LINE = re.compile(r"\[bench\] (\S+)\s+([0-9.]+)s(?: \(build ([0-9.]+)s\))?")


def main(log, sf):
    rows = {}
    for m in LINE.finditer(open(log).read()):
        name, sec, build = m.group(1), float(m.group(2)), float(m.group(3) or 0)
        rows[name] = {"sec": round(sec, 3), "build_sec": round(build, 3),
                      "query_sec": round(sec - build, 3)}
    total = round(sum(r["sec"] for r in rows.values()), 2)
    print(json.dumps({
        "metric": "total", "value": total, "unit": "sec", "n": len(rows),
        "build_sec_total": round(sum(r["build_sec"] for r in rows.values()), 2),
        "queries": rows, "sf": sf}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

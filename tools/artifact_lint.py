#!/usr/bin/env python3
"""Tripwire for CORRECTNESS_*.json header/rows consistency (r13 verdict
task 2): a partially-refreshed rung artifact must never ship a header
(n/pass/rows_only/excluded/fail) that disagrees with its queries map —
the r13 round committed CORRECTNESS_sf10.json claiming n=61/pass=58
while holding 59 rows after an interrupted refresh popped two rows.

Usage:
  python3 tools/artifact_lint.py          # check all CORRECTNESS_*.json, exit 1 on drift
  python3 tools/artifact_lint.py --fix    # rewrite drifting headers from the rows

Row-popping invalidation (tools/run_*_rungs.sh) must go through
pop_rows() below (python3 tools/artifact_lint.py --pop ART q1 q2 ...)
so the header is recomputed in the same write.
"""
import json
import sys
from pathlib import Path

FIELDS = ("n", "pass", "rows_only", "excluded", "fail")


def derive(queries: dict) -> dict:
    return {
        "n": len(queries),
        "pass": sum(1 for v in queries.values() if v.get("status") == "pass"),
        "rows_only": sum(1 for v in queries.values()
                         if v.get("status") == "rows_only"),
        "excluded": sum(1 for v in queries.values()
                        if v.get("status") == "excluded"),
        "fail": sum(1 for v in queries.values() if v.get("status") == "fail"),
    }


def rewrite(path: Path, d: dict) -> None:
    d.update(derive(d.get("queries", {})))
    # keep key order: meta first, queries last
    out = {k: d[k] for k in ("sf", *FIELDS) if k in d}
    out.update({k: v for k, v in d.items() if k not in out})
    tmp = path.with_suffix(".tmp")
    tmp.write_text(json.dumps(out, indent=1))
    tmp.replace(path)


def main(argv):
    root = Path(__file__).parent.parent
    if argv[:1] == ["--root"]:  # lint an alternate dir (ArtifactLintSpec)
        root = Path(argv[1])
        argv = argv[2:]
    if argv[:1] == ["--pop"]:
        art, names = Path(argv[1]), argv[2:]
        d = json.loads(art.read_text())
        popped = [q for q in names if d["queries"].pop(q, None) is not None]
        rewrite(art, d)
        print(f"{art}: popped {popped}, rows now {len(d['queries'])} "
              f"(header recomputed)")
        return 0
    fix = argv[:1] == ["--fix"]
    bad = 0
    for p in sorted(root.glob("CORRECTNESS_*.json")):
        d = json.loads(p.read_text())
        qs = d.get("queries")
        if qs is None:  # round artifacts (driver format) have no header
            continue
        want = derive(qs)
        got = {k: d.get(k) for k in FIELDS}
        if got != {k: want[k] for k in FIELDS}:
            bad += 1
            print(f"DRIFT {p.name}: header {got} != rows {want}")
            if fix:
                rewrite(p, d)
                print(f"  fixed -> {want}")
    # BENCH_* derived headers (r15 judge advice: splice left mean_sec /
    # queries_note computed from a pre-splice row count).
    for p in sorted(root.glob("BENCH_sf*.json")):
        d = json.loads(p.read_text())
        rows = d.get("queries")
        if not isinstance(rows, dict):
            continue
        def qsec(v):
            return v["sec"] - v.get("build_sec", 0.0) if isinstance(v, dict) else v
        want_val = round(sum(qsec(v) for v in rows.values()), 2)
        drift = []
        if d.get("n") != len(rows):
            drift.append(f"n {d.get('n')} != {len(rows)}")
        if abs(d.get("value", want_val) - want_val) > 0.02:
            drift.append(f"value {d.get('value')} != sum {want_val}")
        if "mean_sec" in d and abs(d["mean_sec"] - d["value"] / d["n"]) > 0.01:
            drift.append(f"mean_sec {d['mean_sec']} != {d['value']/d['n']:.3f}")
        if "queries_note" in d and f"{len(rows)}-query" not in d["queries_note"]:
            drift.append(f"queries_note row count != {len(rows)}")
        if drift:
            bad += 1
            print(f"DRIFT {p.name}: " + "; ".join(drift))
            if fix:
                d["n"] = len(rows)
                d["value"] = want_val
                if "mean_sec" in d:
                    d["mean_sec"] = round(want_val / len(rows), 3)
                if "queries_note" in d:
                    d["queries_note"] = (
                        f"full {len(rows)}-query map from BENCH_DETAIL "
                        "(stdout line carries slowest-25 only)")
                p.write_text(json.dumps(d))
                print(f"  fixed -> value={want_val} n={len(rows)}")
    if bad and not fix:
        print(f"{bad} artifact(s) drifted (run with --fix to rewrite)")
        return 1
    print("artifact headers consistent" if not bad else "fixed")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

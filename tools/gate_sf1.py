#!/usr/bin/env python3
"""sf1 (10x) scale gate: full-registry DuckDB compare with a JSON artifact.

Runs AFTER:
  python3 tools/make_sf1.py                      # /tmp/sf1 fixture
  sbt "runMain graft.Verify /tmp/sf1 /tmp/verify_sf1"

Then:
  python3 tools/gate_sf1.py /tmp/sf1 /tmp/verify_sf1 CORRECTNESS_sf1.json

Same comparison as tools/check.py (imported), plus:
  - a per-query status JSON artifact for the round record;
  - NAMED exclusions for oracles that exceed the sandbox's disk: the
    g1/v12 DuckDB recursive/hybrid SQL spills >79 GB temp at sf1 (the
    machine has 79 GB free; both queries are hash-green at sf0.01 and
    sf0.1, and their Spark side completes at sf1 — the exclusion is an
    oracle-resource limit, not an engine failure). Excluded oracles
    still get a rows-only check on the Spark output.
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
import check  # noqa: E402
import duckdb  # noqa: E402

# r10 carried 4 oracle-resource exclusions here (g1/v12/kc1/rk1: the
# 10x-verbatim-copy fixture squared the near-dup pair graph and their
# DuckDB oracles spilled past the sandbox's 79 GB temp disk). The r11
# fixture de-degeneration (make_sf1.py per-copy token suffixing) plus
# the MATERIALIZED-CTE oracle fixes close ALL of them at sf1, so the
# base set ships EMPTY. Per-rung exclusions (sf10's brute-force tiers)
# live in a JSON file passed as argv[4] — every entry must carry a
# named reason, and an excluded name with no Spark dump is still
# recorded (rows: null) so the artifact accounts for the full subset.
EXCLUDE: dict = {}


def main(sf_dir: str, out_dir: str, artifact: str,
         shard: int = 0, nshards: int = 1) -> int:
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    # per-rung named exclusions (env GRAFT_GATE_EXCLUSIONS = json file
    # of {query: reason}) merge into the base set
    excl_path = os.environ.get("GRAFT_GATE_EXCLUSIONS")
    if excl_path:
        EXCLUDE.update(json.loads(Path(excl_path).read_text()))
    con = duckdb.connect()
    # threads/memory tunable per rung: the v19 sf10 oracle's 426M-key
    # aggregate overshot the 48GB limit to ~100GB RSS (DuckDB's
    # high-cardinality agg accounting) and drew the kernel OOM killer —
    # a TIGHTER limit forces earlier radix spill and survives.
    con.execute(f"SET threads={os.environ.get('GRAFT_GATE_THREADS', '16')}")
    con.execute(f"SET memory_limit='{os.environ.get('GRAFT_GATE_MEM', '48GB')}'")
    con.execute("SET temp_directory='/tmp/duckdb_gate_spill'")
    con.execute("SET preserve_insertion_order=false")
    for t in check.TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    # resumable: re-running skips queries already recorded, so the gate
    # can chase a still-running Verify and only check new results
    statuses = {}
    if Path(artifact).exists():
        prior = json.loads(Path(artifact).read_text()).get("queries", {})
        statuses.update(prior)
    def flush():
        # concurrent-shard safe: re-read + merge the artifact under this
        # process's view before writing (two shards share one file; a
        # blind write would drop the other shard's rows), and write via
        # tmp+rename so a crash mid-flush never corrupts the resumable
        # artifact. Races between the read and the rename can still lose
        # a peer's LAST in-flight row, but re-running the gate is
        # idempotent and re-checks anything missing.
        try:
            on_disk = json.loads(Path(artifact).read_text()).get("queries", {})
            for k, v in on_disk.items():
                statuses.setdefault(k, v)
        except (FileNotFoundError, json.JSONDecodeError):
            pass
        n = len(statuses)
        summary = {
            "sf": sf_dir, "n": n,
            "pass": sum(1 for v in statuses.values() if v["status"] == "pass"),
            "rows_only": sum(1 for v in statuses.values()
                             if v["status"] == "rows_only"),
            "excluded": sum(1 for v in statuses.values()
                            if v["status"] == "excluded"),
            "fail": sum(1 for v in statuses.values() if v["status"] == "fail"),
            "queries": statuses}
        tmp = Path(artifact).with_suffix(".tmp")
        tmp.write_text(json.dumps(summary, indent=1))
        tmp.replace(Path(artifact))
        return summary

    for qdir in sorted(d for d in out.iterdir() if d.is_dir()):
        name = qdir.name
        if sum(ord(c) for c in name) % nshards != shard:
            continue
        prior = statuses.get(name)
        if prior is not None and prior.get("status") != "fail" and not (
                # a no-dump excluded backfill row (rows: null) upgrades
                # to a real rows count once its Spark dump lands — the
                # blanket resume skip used to freeze it at null forever
                prior.get("status") == "excluded"
                and prior.get("rows") is None):
            continue
        if not list(qdir.glob("*.parquet")):
            continue  # Verify may still be writing this one
        print(f"[gate] checking {name} ...", flush=True)
        t0 = time.time()
        sdf = con.execute(f"SELECT * FROM '{qdir}/*.parquet'").df()
        if name in EXCLUDE:
            ok = len(sdf) > 0
            statuses[name] = {
                "status": "excluded" if ok else "fail",
                "rows": len(sdf), "reason": EXCLUDE[name]}
            flush()
            print(f"[excluded] {name}: {len(sdf)} rows "
                  f"({'OK' if ok else 'EMPTY!'}) — {EXCLUDE[name][:60]}...")
            continue
        if name not in oracle:
            ok = len(sdf) > 0
            statuses[name] = {"status": "rows_only" if ok else "fail",
                              "rows": len(sdf)}
            flush()
            print(f"[rows-only] {name}: {len(sdf)} rows "
                  f"({'OK' if ok else 'EMPTY!'})")
            continue
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            statuses[name] = {"status": "fail",
                              "error": f"oracle error: {e}"[:300]}
            flush()
            print(f"[FAIL] {name}: oracle error: {e}")
            continue
        ok = check.compare(name, sdf, odf)
        statuses[name] = {"status": "pass" if ok else "fail",
                          "rows": len(sdf),
                          "oracle_sec": round(time.time() - t0, 1)}
        flush()

    # an excluded query whose Spark dump never materialized (e.g. the
    # run hit a node-resource limit) still gets a named row — the
    # artifact must account for the whole subset, not silently shrink
    for name, reason in EXCLUDE.items():
        if name not in statuses:
            statuses[name] = {"status": "excluded", "rows": None,
                              "reason": reason}
            print(f"[excluded] {name}: no dump — {reason[:70]}...")

    summary = flush()
    print(f"\n{summary['pass']}/{summary['n']} pass, "
          f"{summary['fail']} failure(s) -> {artifact}")
    return 1 if summary["fail"] else 0


if __name__ == "__main__":
    a = sys.argv[1:]
    sys.exit(main(a[0] if a else "/tmp/sf1",
                  a[1] if len(a) > 1 else "/tmp/verify_sf1",
                  a[2] if len(a) > 2 else "CORRECTNESS_sf1.json",
                  int(a[3]) if len(a) > 3 else 0,
                  int(a[4]) if len(a) > 4 else 1))

#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (SURVEY.md §6).

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query dir in <outDir>, read the Spark parquet result and run the
oracle SQL from oracle_sql.json in DuckDB against the same sf tables,
then compare (columns sorted by name, rows sorted, values compared with
exact equality for non-floats and 1e-9 rel tolerance for floats — the
driver hashes, so we flag ANY float mismatch loudly).

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def eq(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True, False  # equal, not fuzzy
        if abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b)):
            return True, True   # equal only under tolerance -> driver hash may differ!
        return False, False
    return a == b, False


def main(sf_dir: str, out_dir: str) -> int:
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = 0
    for qdir in sorted(d for d in out.iterdir() if d.is_dir()):
        name = qdir.name
        spark_rel = con.execute(f"SELECT * FROM '{qdir}/*.parquet'")
        spark_cols = [c[0] for c in spark_rel.description]
        spark_rows = spark_rel.fetchall()
        if name not in oracle:
            print(f"[rows-only] {name}: {len(spark_rows)} rows "
                  f"({'OK' if spark_rows else 'EMPTY!'})")
            if not spark_rows:
                failures += 1
            continue
        try:
            ora_rel = con.execute(oracle[name])
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            failures += 1
            continue
        ora_cols = [c[0] for c in ora_rel.description]
        ora_rows = ora_rel.fetchall()

        if sorted(spark_cols) != sorted(ora_cols):
            print(f"[FAIL] {name}: column mismatch spark={sorted(spark_cols)} "
                  f"oracle={sorted(ora_cols)}")
            failures += 1
            continue
        # reorder both to sorted column order, sort rows
        s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
        o_idx = [ora_cols.index(c) for c in sorted(ora_cols)]
        key = lambda r: tuple((x is None, str(norm(x))) for x in r)
        s_rows = sorted([tuple(r[i] for i in s_idx) for r in spark_rows], key=key)
        o_rows = sorted([tuple(r[i] for i in o_idx) for r in ora_rows], key=key)
        if len(s_rows) != len(o_rows):
            print(f"[FAIL] {name}: row count spark={len(s_rows)} oracle={len(o_rows)}")
            failures += 1
            continue
        bad = None
        fuzzy_count = 0
        for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
            for sv, ov in zip(sr, orow):
                ok, fuzzy = eq(sv, ov)
                if fuzzy:
                    fuzzy_count += 1
                if not ok:
                    bad = (i, sr, orow)
                    break
            if bad:
                break
        if bad:
            print(f"[FAIL] {name}: value mismatch at sorted row {bad[0]}:\n"
                  f"       spark : {bad[1]}\n       oracle: {bad[2]}")
            failures += 1
        elif fuzzy_count:
            print(f"[WARN] {name}: {len(s_rows)} rows equal but {fuzzy_count} "
                  f"float cells only under tolerance — driver hash may differ!")
            failures += 1
        else:
            print(f"[PASS] {name}: {len(s_rows)} rows, exact match")
    print(f"\n{failures} failure(s)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

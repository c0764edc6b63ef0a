#!/usr/bin/env python3
"""Synthesize a local sf1 (10x sf0.1) fixture for the scale gate.

The driver ships no sf1 testdata, so the gate builds one from sf0.1:
ten copies of every fact table, copy c's keys offset by c*10^8 so
joins stay within-copy (cardinalities scale linearly, never 10x-squared),
dims (region/nation) kept single-copy with FK columns untouched.

events.ts gets +c MICROseconds per copy so (event_type, ts) stays
unique across copies (several oracles order by ts within a type; an
exact tie would make row_number engine-dependent). The r8 gate run
caught exactly this with sub-microsecond jitter vanishing in a
nanos->micros conversion — microsecond-integer jitter survives any
timestamp encoding.

embeddings copy 0 keeps vec_id < 8 as the query set; offset copies
only ever enlarge the CORPUS side (vec_id >= 10^8 > 8).

Usage: python3 tools/make_sf1.py [src_dir] [dst_dir]
  defaults: /root/testdata/sf0.1 -> /tmp/sf1
"""
import re
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPIES = 10
OFFSET = 10**8

# Copied documents get every token suffixed with the copy number
# (deterministic, data-level — both engines read the same perturbed
# parquet, so no oracle mirroring is needed). Without this, 10x
# VERBATIM doc copies square the near-dup pair graph (~100x edges:
# every cross-copy pair of the same doc is an exact dup, and the tiny
# shared vocabulary makes cross-copy shingle buckets explode), which
# blew the g1/v12/kc1/rk1 DuckDB oracles past the sandbox's 79 GB
# temp disk at sf1. Suffixed copies have pairwise-DISJOINT
# vocabularies across copies, so pair volume scales ~linearly — the
# shape a real corpus has. Within-copy near-dup structure (what the
# dedup family actually measures) is untouched.
TOKEN_RE = re.compile(r"[A-Za-z0-9]+")

# per-table integer key columns to offset per copy (facts only; dims
# region/nation stay single-copy so FK columns remain valid everywhere)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE = ["region", "nation"]


def offset_copy(table: pa.Table, name: str, c: int) -> pa.Table:
    if c == 0:
        return table
    for col in KEYED[name]:
        i = table.schema.get_field_index(col)
        table = table.set_column(
            i, col, pc.add(table.column(col), c * OFFSET))
    if name == "events":
        i = table.schema.get_field_index("ts")
        ts_type = table.schema.field("ts").type
        ts = table.column("ts").cast(pa.int64())
        # +c MICROseconds per copy: unique (event_type, ts). cast(int64)
        # yields the column's NATIVE unit, so scale the offset by it —
        # adding a bare +c to a timestamp[ns] column is c NANOs, which
        # vanish in the engine's nanos->micros truncation and reintroduce
        # the engine-dependent row_number tie this jitter prevents.
        unit_scale = {"s": None, "ms": None, "us": 1, "ns": 1000}.get(
            getattr(ts_type, "unit", "us"))
        if unit_scale is None:
            raise SystemExit(
                f"events.ts unit {ts_type} too coarse for microsecond jitter")
        ts = pc.add(ts, c * unit_scale)
        table = table.set_column(i, "ts", ts.cast(ts_type))
    if name == "documents":
        suffix = str(c)
        texts = [TOKEN_RE.sub(lambda m: m.group(0) + suffix, t)
                 for t in table.column("text").to_pylist()]
        ti = table.schema.get_field_index("text")
        table = table.set_column(ti, "text", pa.array(texts, pa.string()))
        ni = table.schema.get_field_index("n_chars")
        table = table.set_column(
            ni, "n_chars", pa.array([len(t) for t in texts], pa.int64()))
    return table


def main(src: str, dst: str) -> None:
    import os
    os.makedirs(dst, exist_ok=True)
    for name in SINGLE:
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"),
                       f"{dst}/{name}.parquet")
        print(f"{name}: copied")
    for name in KEYED:
        base = pq.read_table(f"{src}/{name}.parquet")
        out = pa.concat_tables(
            [offset_copy(base, name, c) for c in range(COPIES)])
        pq.write_table(out, f"{dst}/{name}.parquet")
        print(f"{name}: {base.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    args = sys.argv[1:]
    main(args[0] if args else "/root/testdata/sf0.1",
         args[1] if len(args) > 1 else "/tmp/sf1")

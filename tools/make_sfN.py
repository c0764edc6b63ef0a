#!/usr/bin/env python3
"""Synthesize an sfN fixture (N x sf0.1) for the scale gates.

Generalizes make_sf1.py (10 copies) to any copy count — sf1 = 10
copies, sf10 = 100 copies. Per copy c:
  - fact-table integer keys offset by c*10^8 (joins stay within-copy:
    cardinalities scale linearly, never copies-squared);
  - events.ts gets +c MICROseconds, scaled to the column's native
    unit, so (event_type, ts) stays unique across copies (oracles
    that order by ts within a type would otherwise hit
    engine-dependent row_number ties);
  - copied documents get every token suffixed with the copy number:
    cross-copy vocabularies are pairwise disjoint, so near-dup pair
    volume scales linearly like a real corpus instead of
    copies-squared (the r10 degeneracy that blew the g1/v12/kc1/rk1
    DuckDB oracles past temp disk). n_chars is recomputed.
  - dims (region/nation) stay single-copy with FK columns untouched;
  - embeddings copy 0 keeps vec_id < 8 as the query set (offset
    copies only enlarge the corpus side);
  - copied embeddings are rotated by a deterministic per-copy
    orthogonal matrix (QR of seeded Gaussian): within-copy geometry
    (norms, cosines, near-dup pairs) is preserved up to float32
    re-quantization of the float64 rotation (~1e-7 per value — a
    within-copy cosine sitting exactly on a round(,6)/threshold
    boundary COULD flip vs copy 0; cross-engine gates are unaffected
    since both engines read the same stored float32s), while
    cross-copy cosines become near-orthogonal — so
    near-dup pair volume scales linearly like the token suffixing,
    instead of copies-squared (the r14 degeneracy: 300 VERBATIM
    vector copies made every copy-pair share every LSH bucket, d10's
    candidate multiset quadratic, and the sf30 pair-family exponents
    copy-multiplicity artifacts). Oracles are unaffected: both
    engines recompute from the stored float32 values.

Copies are streamed through one ParquetWriter per table, so peak
memory is one copy of one table — 100-copy lineitem (60M rows) never
materializes in RAM.

Usage: python3 tools/make_sfN.py [copies] [src_dir] [dst_dir]
  defaults: 10 /root/testdata/sf0.1 /tmp/sf1
"""
import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFFSET = 10**8

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

TOKEN_RE = re.compile(r"[A-Za-z0-9]+")


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
        # +c us in the column's NATIVE unit (a bare +c on timestamp[ns]
        # is c nanos, which vanish in nanos->micros truncation)
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
    if name == "embeddings":
        ei = table.schema.get_field_index("embedding")
        vecs = np.asarray(table.column("embedding").to_pylist(),
                          dtype=np.float64)
        rot = rotation(vecs.shape[1], c)
        out = (vecs @ rot.T).astype(np.float32)
        table = table.set_column(
            ei, "embedding",
            pa.array(list(out), type=table.schema.field("embedding").type))
    return table


def rotation(dim: int, c: int) -> "np.ndarray":
    """Deterministic orthogonal matrix for copy c (QR of seeded
    Gaussian, sign-canonicalized so the decomposition is unique)."""
    rng = np.random.default_rng(c)
    q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
    return q * np.sign(np.diag(r))


def main(copies: int, src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for name in SINGLE:
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"),
                       f"{dst}/{name}.parquet")
        print(f"{name}: copied")
    for name in KEYED:
        base = pq.read_table(f"{src}/{name}.parquet")
        writer = pq.ParquetWriter(f"{dst}/{name}.parquet", base.schema)
        n = 0
        for c in range(copies):
            out = offset_copy(base, name, c)
            writer.write_table(out)
            n += out.num_rows
        writer.close()
        print(f"{name}: {base.num_rows} -> {n}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 10,
         a[1] if len(a) > 1 else "/root/testdata/sf0.1",
         a[2] if len(a) > 2 else "/tmp/sf1")

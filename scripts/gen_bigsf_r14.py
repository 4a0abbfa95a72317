"""MEASUREMENT-ONLY scale-up of the sf0.1 fixtures (r14 A/B harness).

The driver ships sf0.001/0.01/0.1 only; at sf0.1 every bench query sits
at the fixed-overhead floor (VERDICT r13: 8 cores beat 32 on all 23
queries), so plan-level wins are invisible. This script derives a ~10x
dataset from sf0.1 — same schemas, same join topology — purely for
LOCAL before/after timing. It never feeds the oracle, never lands in
/root/testdata, and nothing in the library or bench reads it unless
$SPARK_GRAFT_SF_DIR points at it explicitly.

Construction: each fact table is replicated REPLICAS times with every
entity key shifted by a per-table stride (join consistency preserved;
nation/region stay as-is so FK ranges hold). Document text is
perturbed per replica (every 5th word suffixed) so replicas are NOT
near-duplicates of their originals — keeps the LSH candidate structure
corpus-like instead of exploding every bucket 10x.

Usage: python scripts/gen_bigsf_r14.py [out_dir] (default /tmp/sfbig/sf1)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

# key column -> shift stride (decimal, > max key in the base tables)
STRIDES = {
    "l_orderkey": 10_000_000,
    "o_orderkey": 10_000_000,
    "o_custkey": 1_000_000,
    "c_custkey": 1_000_000,
    "l_partkey": 1_000_000,
    "p_partkey": 1_000_000,
    "l_suppkey": 100_000,
    "s_suppkey": 100_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
}

SCALED = [
    "lineitem", "orders", "customer", "supplier", "part",
    "documents", "embeddings", "events",
]
VERBATIM = ["nation", "region"]


def perturb_text(arr: pa.ChunkedArray, i: int) -> pa.Array:
    """Deterministically suffix every 5th word with the replica id so
    replica pairs fall well under 0.5 Jaccard on 3-gram shingles."""
    out = []
    for chunk in arr.chunks if isinstance(arr, pa.ChunkedArray) else [arr]:
        for v in chunk.to_pylist():
            if v is None:
                out.append(None)
                continue
            ws = v.split(" ")
            for j in range(0, len(ws), 5):
                ws[j] = f"{ws[j]}x{i}"
            out.append(" ".join(ws))
    return pa.array(out, type=pa.string())


def replicate(name: str, tbl: pa.Table) -> pa.Table:
    parts = []
    for i in range(REPLICAS):
        cols = []
        for field in tbl.schema:
            col = tbl.column(field.name)
            if field.name in STRIDES and i > 0:
                col = pc.add(col, pa.scalar(i * STRIDES[field.name],
                                            type=field.type))
            if name == "documents" and field.name == "text" and i > 0:
                col = perturb_text(col, i)
            cols.append(col)
        parts.append(pa.table(dict(zip(tbl.schema.names, cols))))
    return pa.concat_tables(parts)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig/sf1"
    os.makedirs(out_dir, exist_ok=True)
    for name in SCALED + VERBATIM:
        tbl = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        if name in SCALED:
            tbl = replicate(name, tbl)
        pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"),
                       compression="zstd")
        print(f"{name}: {tbl.num_rows} rows")


if __name__ == "__main__":
    main()

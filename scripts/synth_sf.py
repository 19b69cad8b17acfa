#!/usr/bin/env python
"""Synthesize a larger bench dataset from sf0.1 by coherent k-way key-shifted
replication (round-8 scale validation; NOT driver data — the driver generates
its own escalated scale factors).

Each copy i shifts every int64 entity key by i*SHIFT so joins stay key-coherent
per copy (per-part/per-customer fanout is preserved, matching how the real
generator scales).  Two deliberate de-correlations keep dedup pair density
realistic instead of adversarial:

- documents: every word in copy i>0 gets an ``_i`` suffix, so shingle sets of
  copies never collide (within-copy near-dup structure is preserved);
- embeddings: copy i>0 flips the sign of dimensions where (dim % 16) < i, so
  cross-copy cosine is far from 1 while within-copy geometry is intact.

Usage: python scripts/synth_sf.py [K] [OUT_DIR]   (defaults: 10, /dev/shm/sf1.0-synth)
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SYNTH_SRC", "/root/testdata/sf0.1")
SHIFT = 1 << 33

# int64 key columns to shift per copy (join-coherent within a copy)
KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": None,  # dimension constants: copied once, unscaled
    "region": None,
}


def _shift_copy(tbl: pa.Table, name: str, i: int) -> pa.Table:
    for k in KEYS[name]:
        col = tbl[k]
        idx = tbl.schema.get_field_index(k)
        tbl = tbl.set_column(idx, k, pc.add(col, pa.scalar(i * SHIFT, type=col.type)))
    if name == "documents" and i > 0:
        texts = tbl["text"].to_pylist()
        suf = re.compile(r"([A-Za-z0-9]+)")
        texts = [None if t is None else suf.sub(rf"\g<1>_{i}", t) for t in texts]
        tbl = tbl.set_column(
            tbl.schema.get_field_index("text"), "text", pa.array(texts, type=pa.string())
        )
    if name == "embeddings" and i > 0:
        vecs = tbl["embedding"].combine_chunks()
        mat = np.asarray(vecs.values, dtype=np.float32).copy()
        dim = len(vecs[0])
        flip = np.where((np.arange(dim) % 16) < i, np.float32(-1.0), np.float32(1.0))
        mat = (mat.reshape(-1, dim) * flip).reshape(-1)
        new = pa.ListArray.from_arrays(vecs.offsets, pa.array(mat, type=pa.float32()))
        tbl = tbl.set_column(
            tbl.schema.get_field_index("embedding"), "embedding", new
        )
    return tbl


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/dev/shm/sf1.0-synth"
    os.makedirs(out, exist_ok=True)
    for name, keys in KEYS.items():
        src = os.path.join(SRC, f"{name}.parquet")
        tbl = pq.read_table(src)
        if keys is None:
            pq.write_table(tbl, os.path.join(out, f"{name}.parquet"))
            print(f"{name}: {tbl.num_rows} rows (unscaled)")
            continue
        copies = [_shift_copy(tbl, name, i) for i in range(k)]
        big = pa.concat_tables(copies)
        pq.write_table(big, os.path.join(out, f"{name}.parquet"), row_group_size=1 << 20)
        print(f"{name}: {tbl.num_rows} -> {big.num_rows} rows")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

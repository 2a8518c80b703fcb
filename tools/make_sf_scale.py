"""Build a larger profiling dataset by replicating an existing sf dir.

The driver's round-end bench may run at a larger, driver-generated scale
factor (BENCH_r05 ran sf=1.0). We cannot reproduce the driver's generator,
but for *profiling* what matters is table sizes and key-group shapes, so
this tool replicates every parquet K times with primary keys shifted by
copy * stride (stride = max_id + 1), keeping every other column verbatim.
Bucket/label distributions therefore scale the way the real generator's
do (10 labels at every sf; source mix preserved).

Known limitation: orders.o_custkey shifts by its OWN max+1, not
customer.c_custkey's, so when the two maxima differ the customer-orders
FK fan-out across copies is approximate — fine for the profiling purpose
(both the before- and after-measurements use the same replica), not for
semantic validation.

Usage: python tools/make_sf_scale.py SRC_DIR DST_DIR K
"""
from __future__ import annotations

import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# per-table columns that act as a unique key and must be shifted per copy
SHIFT = {
    "customer.parquet": ["c_custkey"],
    "documents.parquet": ["doc_id"],
    "embeddings.parquet": ["vec_id"],
    "events.parquet": ["event_id"],
    "lineitem.parquet": ["l_orderkey"],
    "nation.parquet": [],
    "orders.parquet": ["o_orderkey", "o_custkey"],
    "part.parquet": ["p_partkey"],
    "region.parquet": [],
    "supplier.parquet": ["s_suppkey"],
}


def main() -> None:
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os

    os.makedirs(dst, exist_ok=True)
    for fname, keys in SHIFT.items():
        t = pq.read_table(f"{src}/{fname}")
        if not keys or k == 1:
            copies = [t] * (1 if not keys else k)
            out = pa.concat_tables(copies) if keys else t
        else:
            strides = {
                c: pc.max(t.column(c)).as_py() + 1 for c in keys if c in t.schema.names
            }
            copies = []
            for i in range(k):
                cur = t
                for c, stride in strides.items():
                    idx = cur.schema.get_field_index(c)
                    typ = cur.schema.field(idx).type
                    shifted = pc.cast(
                        pc.add(cur.column(c), pa.scalar(i * stride, type=typ)), typ
                    )
                    cur = cur.set_column(idx, cur.schema.field(idx), shifted)
                copies.append(cur)
            out = pa.concat_tables(copies)
        pq.write_table(out, f"{dst}/{fname}", compression="zstd")
        print(fname, t.num_rows, "->", out.num_rows)
    open(f"{dst}/_DONE", "w").close()


if __name__ == "__main__":
    main()

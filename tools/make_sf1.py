#!/usr/bin/env python3
"""Build the deterministic sf1 (10x) scale fixture from sf0.1.

Usage: python3 tools/make_sf1.py <sf0.1 dir> <out dir> [replicas=10]

Each table is replicated N times with per-replica KEY OFFSETS: every
key column (primary and foreign alike) in the same key domain shifts by
the same per-replica stride (max value in the domain + 1), so joins and
group-bys line up within each replica and all join/group cardinalities
scale linearly — replica 0 is byte-identical to the source. Exactly one
`vec_id = 0` query vector is kept (the similarity queries' probe row).
Non-key columns (text, timestamps, vectors, prices) replicate verbatim,
which means EVERY document/vector has exactly N copies: near-dup pair
output on this fixture is ~N^2/2 per duplicate set BY CONSTRUCTION —
the documented pathological stress for the uncapped pair operators, and
exactly what `maxBucketSize` is for (see BASELINE.md sf1 notes).

pyarrow end to end: Spark's parquet writer would rewrite
events.ts TIMESTAMP(NANOS) as micros; writing the replicated batches
with pyarrow preserves the source's physical types byte-for-byte.
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

# column -> key domain; columns sharing a domain shift with one stride
KEYS = {
    "region": {"r_regionkey": "regionkey"},
    "nation": {"n_nationkey": "nationkey", "n_regionkey": "regionkey"},
    "customer": {"c_custkey": "custkey", "c_nationkey": "nationkey"},
    "supplier": {"s_suppkey": "suppkey", "s_nationkey": "nationkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}


def main(src: str, out: str, replicas: int = 10) -> None:
    tables = {t: pq.read_table(f"{src}/{t}.parquet") for t in KEYS}
    # per-domain stride = global max over every column in the domain + 1
    stride: dict[str, int] = {}
    for t, cols in KEYS.items():
        for col, dom in cols.items():
            mx = pc.max(tables[t][col]).as_py()
            stride[dom] = max(stride.get(dom, 0), int(mx) + 1)
    import os
    os.makedirs(out, exist_ok=True)
    for t, tbl in tables.items():
        batches = []
        for r in range(replicas):
            rep = tbl
            if t == "embeddings" and r > 0:
                # exactly one vec_id=0 probe vector in the fixture
                rep = rep.filter(pc.field("vec_id") != 0)
            if r > 0:
                for col, dom in KEYS[t].items():
                    idx = rep.schema.get_field_index(col)
                    typ = rep.schema.field(idx).type
                    shifted = pc.cast(
                        pc.add(pc.cast(rep[col], pa.int64()), r * stride[dom]), typ)
                    rep = rep.set_column(idx, rep.schema.field(idx), shifted)
            batches.append(rep)
        full = pa.concat_tables(batches)
        pq.write_table(full, f"{out}/{t}.parquet")
        print(f"  {t}: {tbl.num_rows} -> {full.num_rows} rows")


if __name__ == "__main__":
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    main(sys.argv[1], sys.argv[2], reps)

"""Scale-up fixture generator: replicate the driver's sf0.1 tables 10x
into a local sf1 directory (schema-identical at the arrow level), for
the per-decade differential + bench sweep (round-2 VERDICT next-steps
#3 — each decade so far has surfaced a new failure class).

/root/testdata is read-only, so output lands in <repo>/.localdata/sf1
(gitignored).  Replication is deterministic and preserves referential
integrity: copy i offsets every key column by i * (max_key + 1) stride,
consistently across fact and dimension tables, so joins land on the
copied dimensions.  Shared tiny dims (region, nation) are NOT
replicated — exactly like TPC-H, where they are scale-invariant.

Distribution notes:
* events: ts is offset by i microseconds per copy — key distributions
  and per-user densities survive, while exact cross-copy timestamp ties
  (which no real stream would produce at scale) stay rare.
* documents: text gets a length-preserving first-character substitution
  per copy (n_chars stays consistent); copies are thus near-duplicates
  of each other — realistic crawl-corpus shape for the dedup operators.
* embeddings: first component is nudged by i * 1e-3 so ANN neighbor
  sets are not 10-way ties.

Usage:  python tools/gen_sf1.py [src_dir] [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# key columns to offset, per table: {col: stride_table} where the stride
# is (max key of stride_table's key) + 1, computed from the source data
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "_events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

PRIMARY_KEY = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def _strides(tables: dict[str, pa.Table]) -> dict[str, int]:
    strides = {
        name: int(pc.max(tables[name][pk]).as_py()) + 1
        for name, pk in PRIMARY_KEY.items()
    }
    strides["_events_user"] = int(pc.max(tables["events"]["user_id"]).as_py()) + 1
    return strides


def _copy(table_name: str, t: pa.Table, i: int, strides: dict[str, int]) -> pa.Table:
    if i == 0:
        return t
    cols = {}
    for field in t.schema:
        col = t[field.name]
        key_of = KEYED.get(table_name, {}).get(field.name)
        if key_of is not None:
            col = pc.cast(
                pc.add(pc.cast(col, pa.int64()), i * strides[key_of]), field.type
            )
        elif table_name == "events" and field.name == "ts":
            col = pc.cast(
                pc.add(pc.cast(col, pa.int64()), i), pa.timestamp("us")
            )
        elif table_name == "documents" and field.name == "text":
            texts = col.to_pylist()
            mark = str(i % 10)
            col = pa.array(
                [mark + s[1:] if s else s for s in texts], type=field.type
            )
        elif table_name == "embeddings" and field.name == "embedding":
            vecs = col.to_pylist()
            eps = i * 1e-3
            col = pa.array(
                [([v[0] + eps] + v[1:]) if v else v for v in vecs], type=field.type
            )
        cols[field.name] = col
    return pa.table(cols, schema=t.schema)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata", "sf1")
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)

    tables = {t: pq.read_table(os.path.join(src, f"{t}.parquet")) for t in TABLES}
    strides = _strides(tables)
    for name, t in tables.items():
        if name in ("region", "nation"):
            scaled = t
        else:
            scaled = pa.concat_tables(
                [_copy(name, t, i, strides) for i in range(factor)]
            )
        # r10 (guide §6 / r9 verdict item 4): bounded row groups so the
        # scan can SPLIT.  The r1-r9 fixture wrote pyarrow's default
        # ~1M-row groups — lineitem landed as one 110 MB file of 6 row
        # groups inside a single 128 MB split, so every sf1 scan stage
        # ran 1-6 tasks on a 32-core box and the 32-vs-8-core bench
        # ratio could never exceed ~1.5x.  ~128k-row groups give the
        # scheduler 8-48 schedulable chunks per table (paired with
        # spark.sql.files.minPartitionNum = defaultParallelism in
        # session.py, which shrinks the advisory split below the file
        # size).  Row-group size changes bytes/layout only, never data.
        pq.write_table(
            scaled,
            os.path.join(out, f"{name}.parquet"),
            row_group_size=131072,
        )
        print(name, t.num_rows, "->", scaled.num_rows)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Generate a deterministic sf1 rung (10x sf0.1) for the scale bench.

Writes /root/repo/testdata-ext/sf1/*.parquet from /root/testdata/sf0.1
(read-only source), preserving every physical parquet schema. Ten
key-shifted replicas so row counts scale 10x while the join structure,
selectivities, and per-replica statistics match sf0.1 exactly:

- region/nation: fixed-cardinality dims, copied verbatim (as in TPC-H,
  where nation is 25 rows at every scale factor).
- customer/supplier/part/orders/lineitem/events: replica i shifts every
  key column by i*K (K > any key), so each replica is a disjoint,
  internally consistent sub-database; dates/values/priorities repeat.
- documents: replica i applies a rot-i letter cipher to `text`
  (bijective, length- and word-boundary-preserving), so WITHIN-replica
  near-dup structure is byte-for-byte isomorphic to sf0.1 while
  cross-replica shingles disagree — near-dup pair counts scale ~10x
  linearly instead of exploding quadratically as verbatim copies would.
  (Stopword-based stats like language ID shift for replicas 1-9; the
  sf1 rung is a throughput bench, not a correctness gate.)
- embeddings: replica i cyclically rotates each vector by i dimensions
  (bijective, norm- and within-replica-inner-product-preserving).

Deterministic: no RNG anywhere; re-runs are byte-identical.
"""
import os
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("GEN_SF1_DST", "/root/repo/testdata-ext/sf1")
K = 100_000_000
REPLICAS = 10

os.makedirs(DST, exist_ok=True)

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def shifted(table: pa.Table, cols, i: int) -> pa.Table:
    for c in cols:
        idx = table.schema.get_field_index(c)
        col = pc.add(table.column(c), pa.scalar(i * K, type=table.schema.field(c).type))
        table = table.set_column(idx, table.schema.field(c), col)
    return table


def rot_text(s: str, i: int) -> str:
    if s is None:
        return None
    out = []
    for ch in s:
        o = ord(ch)
        if 97 <= o <= 122:
            out.append(chr(97 + (o - 97 + i) % 26))
        elif 65 <= o <= 90:
            out.append(chr(65 + (o - 65 + i) % 26))
        else:
            out.append(ch)
    return "".join(out)


def replicate(name: str) -> None:
    src = pq.read_table(f"{SRC}/{name}.parquet")
    schema = pq.read_schema(f"{SRC}/{name}.parquet")
    parts = []
    for i in range(REPLICAS):
        t = shifted(src, SHIFT_COLS[name], i)
        if name == "documents" and i > 0:
            texts = [rot_text(v, i) for v in src.column("text").to_pylist()]
            idx = t.schema.get_field_index("text")
            t = t.set_column(idx, t.schema.field("text"),
                             pa.array(texts, type=t.schema.field("text").type))
        if name == "part" and i > 0:
            # cipher the free-text name too: verbatim 10x name copies would
            # make every fuzzy-match block quadratic in the replica count —
            # a generator artifact, not a property of a 10x corpus (real
            # generators draw NEW names at higher SF). Brand/type stay
            # verbatim: those are fixed-vocabulary dims, as in TPC-H.
            names = [rot_text(v, i) for v in src.column("p_name").to_pylist()]
            idx = t.schema.get_field_index("p_name")
            t = t.set_column(idx, t.schema.field("p_name"),
                             pa.array(names, type=t.schema.field("p_name").type))
        if name == "embeddings" and i > 0:
            vecs = [None if v is None else v[i:] + v[:i]
                    for v in src.column("embedding").to_pylist()]
            idx = t.schema.get_field_index("embedding")
            t = t.set_column(idx, t.schema.field("embedding"),
                             pa.array(vecs, type=t.schema.field("embedding").type))
        parts.append(t)
    out = pa.concat_tables(parts).cast(schema)
    pq.write_table(out, f"{DST}/{name}.parquet")
    print(f"{name}: {src.num_rows} -> {out.num_rows}")


for dim in ("region", "nation"):
    t = pq.read_table(f"{SRC}/{dim}.parquet")
    pq.write_table(t, f"{DST}/{dim}.parquet")
    print(f"{dim}: copied ({t.num_rows})")

for name in SHIFT_COLS:
    replicate(name)

# Manifest: per-table md5 + row count, so a regenerated rung is verifiably
# the SAME data across rounds (round-over-round sf1 comparisons are only
# meaningful on bit-identical input). graft.Bench refuses to label a run
# "sf1" unless the directory carries a manifest matching the committed
# copy at tools/sf1_manifest.txt.
import hashlib

with open(f"{DST}/MANIFEST.txt", "w") as mf:
    for name in sorted(os.listdir(DST)):
        if not name.endswith(".parquet"):
            continue
        h = hashlib.md5()
        with open(f"{DST}/{name}", "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        rows = pq.read_metadata(f"{DST}/{name}").num_rows
        mf.write(f"{h.hexdigest()}  {rows}  {name}\n")
print(f"manifest: {DST}/MANIFEST.txt")

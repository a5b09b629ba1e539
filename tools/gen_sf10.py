#!/usr/bin/env python3
"""Generate a deterministic sf10 rung (100x sf0.1 rows) for the scale bench.

Writes /root/repo/testdata-ext/sf10/*.parquet from /root/testdata/sf0.1
(read-only source). Same construction as tools/gen_sf1.py — N key-shifted
replicas so row counts scale Nx while join structure, selectivities, and
per-replica statistics match sf0.1 exactly — with the two per-replica
transforms upgraded for N=100 (where sf1's choices would repeat and
manufacture quadratic cross-replica duplicate structure that no real
100x corpus has):

- documents.text / part.p_name: an AFFINE letter cipher per replica,
  x -> (a*x + b) mod 26 with a coprime to 26, instead of sf1's rot-i
  (rot repeats at i=26: replicas 0/26/52/78 would be verbatim copies,
  so every near-dup pair would exist in C(4,2) cross-replica copies —
  a generator artifact, not a property of a 100x corpus). The affine
  (a_i, b_i) = (A[i % 12], i) is injective in i for i < 100·? — distinct
  for every replica because b_i = i already separates them — bijective
  on letters, case/word-boundary/length-preserving, identity at i=0.
  WITHIN-replica near-dup structure is byte-for-byte isomorphic to
  sf0.1; cross-replica letter shingles disagree. (Shingles made only of
  non-letters are invariant across replicas, same as at sf1 — that is
  what the df-capped posting lists are for.)
- embeddings.embedding: a signed-permutation orthogonal transform per
  replica — rotate by (i mod dim) dimensions, then flip the sign of
  dimension d iff bit (d mod 7) of i is set — instead of sf1's bare
  rotation (which repeats at i=dim=64). Distinct for every i < 128
  (the 7 sign bits separate same-rotation replicas), orthogonal (norms
  and within-replica inner products are preserved exactly), identity
  at i=0.
- keys shift by i*K exactly as at sf1 (max shift 9.9e9 — all key
  columns are int64).

Each replica is written as its own parquet row group through a streaming
ParquetWriter, so peak memory is one replica (sf0.1-sized), not the
concatenated sf10 table.

Deterministic: no RNG anywhere; re-runs are byte-identical. A MANIFEST.txt
(md5 + rows per file) is written alongside and committed as
tools/sf10_manifest.txt, so a regenerated rung is verifiably the same data.
"""
import hashlib
import os
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("GEN_SF10_DST", "/root/repo/testdata-ext/sf10")
K = 100_000_000
# GEN_SF10_REPLICAS overrides for intermediate rungs (e.g. 30 -> "sf3",
# the fallback for operators whose linearly-scaled scratch footprint
# exceeds this single VM's disk at 100x — a cluster would have 100x the
# aggregate scratch, a shared-nothing VM does not)
REPLICAS = int(os.environ.get("GEN_SF10_REPLICAS", "100"))
# the per-replica transforms are only pairwise-distinct for i < 128 (the
# embedding sign pattern uses i's low 7 bits); beyond that, replicas would
# silently repeat — exactly the cross-replica artifact this script avoids
assert 1 <= REPLICAS <= 128, "transforms repeat beyond 128 replicas"

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

# multipliers coprime to 26 (an affine cipher needs gcd(a, 26) = 1)
AFFINE_A = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]


def affine_table(i: int):
    """str.translate table for the replica-i affine letter cipher."""
    a, b = AFFINE_A[i % len(AFFINE_A)], i
    m = {}
    for base in (ord("a"), ord("A")):
        for x in range(26):
            m[base + x] = base + (a * x + b) % 26
    return m


def shifted(table: pa.Table, cols, i: int) -> pa.Table:
    for c in cols:
        idx = table.schema.get_field_index(c)
        col = pc.add(table.column(c), pa.scalar(i * K, type=table.schema.field(c).type))
        table = table.set_column(idx, table.schema.field(c), col)
    return table


def cipher_column(table: pa.Table, src: pa.Table, colname: str, i: int) -> pa.Table:
    tbl = affine_table(i)
    vals = [None if v is None else v.translate(tbl)
            for v in src.column(colname).to_pylist()]
    idx = table.schema.get_field_index(colname)
    return table.set_column(idx, table.schema.field(colname),
                            pa.array(vals, type=table.schema.field(colname).type))


def transform_embeddings(table: pa.Table, src: pa.Table, i: int) -> pa.Table:
    vecs = src.column("embedding").to_pylist()
    out = []
    for v in vecs:
        if v is None:
            out.append(None)
            continue
        dim = len(v)
        r = i % dim
        w = v[r:] + v[:r]
        out.append([-w[d] if (i >> (d % 7)) & 1 else w[d] for d in range(dim)])
    idx = table.schema.get_field_index("embedding")
    return table.set_column(idx, table.schema.field("embedding"),
                            pa.array(out, type=table.schema.field("embedding").type))


def replicate(name: str) -> None:
    src = pq.read_table(f"{SRC}/{name}.parquet")
    schema = pq.read_schema(f"{SRC}/{name}.parquet")
    path = f"{DST}/{name}.parquet"
    writer = pq.ParquetWriter(path, schema)
    total = 0
    for i in range(REPLICAS):
        t = shifted(src, SHIFT_COLS[name], i)
        if name == "documents" and i > 0:
            t = cipher_column(t, src, "text", i)
        if name == "part" and i > 0:
            # cipher the free-text name (sf1's rationale, gen_sf1.py):
            # verbatim name copies make every fuzzy block quadratic in
            # the replica count. Brand/type stay verbatim (fixed vocab).
            t = cipher_column(t, src, "p_name", i)
        if name == "embeddings" and i > 0:
            t = transform_embeddings(t, src, i)
        writer.write_table(t.cast(schema))
        total += t.num_rows
    writer.close()
    print(f"{name}: {src.num_rows} -> {total}", flush=True)


for dim in ("region", "nation"):
    t = pq.read_table(f"{SRC}/{dim}.parquet")
    pq.write_table(t, f"{DST}/{dim}.parquet")
    print(f"{dim}: copied ({t.num_rows})", flush=True)

for name in SHIFT_COLS:
    replicate(name)

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
print(f"manifest: {DST}/MANIFEST.txt", flush=True)

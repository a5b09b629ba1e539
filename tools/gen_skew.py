#!/usr/bin/env python3
"""Hot-key skew profile at the 10x rung (VERDICT r8 item 2): SURVEY §5
claims AQE skew-join handling and q27's salted join exists, but no rung
has ever had a genuinely hot key. This derives testdata-ext/sf1skew from
the committed sf1 rung (10x) by overwriting keys in place — row counts,
schemas, and all non-key statistics stay sf1 — so probe timings isolate
the SKEW effect, not a data-shape change:

- events:   user_id = 42 on every 10th row (~10% of 1M rows on one user
            — the hot-session / hot-account shape).
- orders:   o_custkey = first customer key on every 10th row (~10% of
            orders against one customer).
- lineitem: l_partkey = first part key on every 10th row (~10% of 6M
            lines on one part — the hot-SKU shape).
- documents: every 50th doc (~2%) replaced by a near-dup of doc 0
            (one appended distinct token each) — one giant LSH/shingle
            cluster, the template-spam shape that skews dedup shuffles.

Deterministic (pure row-index functions, no RNG). Key-overwrite targets
are EXISTING keys so joins hit; hot rows change partition assignment
only. A MANIFEST.txt (md5 + rows) is written alongside.
"""
import hashlib
import os
import shutil
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("GEN_SKEW_SRC", "/root/repo/testdata-ext/sf1")
DST = os.environ.get("GEN_SKEW_DST", "/root/repo/testdata-ext/sf1skew")
os.makedirs(DST, exist_ok=True)


def hot_key_overwrite(name, keycol, hot_value, every=10, offset=7):
    t = pq.read_table(f"{SRC}/{name}.parquet")
    n = t.num_rows
    mask = pa.array((np.arange(n) % every) == offset)
    idx = t.schema.get_field_index(keycol)
    field = t.schema.field(keycol)
    col = pc.if_else(mask, pa.scalar(hot_value, type=field.type), t.column(keycol))
    t = t.set_column(idx, field, col)
    pq.write_table(t, f"{DST}/{name}.parquet")
    print(f"  {name}: {n} rows, {keycol}={hot_value} on {(n + every - 1 - offset) // every} rows",
          flush=True)


def first_key(name, col):
    return pq.read_table(f"{SRC}/{name}.parquet", columns=[col]).column(col)[0].as_py()


print("sf1skew (hot keys over sf1):", flush=True)
hot_key_overwrite("events", "user_id", 42)
hot_key_overwrite("orders", "o_custkey", first_key("customer", "c_custkey"))
hot_key_overwrite("lineitem", "l_partkey", first_key("part", "p_partkey"))

# documents: template-spam cluster (~2% near-dups of doc 0)
docs = pq.read_table(f"{SRC}/documents.parquet").to_pylist()
base = docs[0]["text"]
n_hot = 0
for i, r in enumerate(docs):
    if i % 50 == 5:
        text = base + f" z{i}"
        r["text"] = text
        r["n_chars"] = len(text)
        n_hot += 1
schema = pq.read_schema(f"{SRC}/documents.parquet")
pq.write_table(pa.Table.from_pylist(docs, schema=schema), f"{DST}/documents.parquet")
print(f"  documents: {len(docs)} rows, {n_hot} near-dups of doc 0", flush=True)

for name in ["region", "nation", "customer", "supplier", "part", "embeddings"]:
    shutil.copyfile(f"{SRC}/{name}.parquet", f"{DST}/{name}.parquet")

with open(f"{DST}/MANIFEST.txt", "w") as mf:
    for name in sorted(os.listdir(DST)):
        if not name.endswith(".parquet"):
            continue
        hh = hashlib.md5()
        with open(f"{DST}/{name}", "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                hh.update(chunk)
        mf.write(f"{hh.hexdigest()}  {pq.read_metadata(f'{DST}/{name}').num_rows}  {name}\n")
print(f"manifest: {DST}/MANIFEST.txt", flush=True)

#!/usr/bin/env python3
"""Heavy-hitter shingle profile (round 13, VERDICT r12 item 5): q142's
round-12 rewrite marks duplicated 40-char window starts with one
`count(*) over (partition by s)` window, and AQE cannot split a window
partition the way it splits a skewed join — so a degenerate corpus where
ONE 40-char window value occurs millions of times turns one
WindowExec group into a potential spill wall. This profile manufactures
exactly that:

- 60% "hot" docs: a single long run of the SAME character 'a'
  (1000-4000 chars each), so every one of their ~len-40 window starts is
  the identical 40-char string — one shingle group carrying ~2M rows;
- 20% half-hot docs: a hot run prefixed by a unique word salt, so the
  group also contains rows from docs whose OTHER shingles are unique
  (the island-merge step still has per-doc work to do);
- 20% normal zipf-word docs (the gen_adversarial vocabulary) so the
  non-degenerate path stays exercised and dedup outputs are nonzero.

Deterministic (md5-driven like gen_adversarial.py). Writes
documents.parquet to GEN_ADV_DST and copies the remaining tables from
SRC so Verify + compare.py run unchanged against the directory.
"""
import hashlib
import os
import shutil
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("GEN_ADV_SRC", "/root/testdata/sf0.01")
DST = os.environ.get("GEN_ADV_DST", "/root/repo/testdata-ext/hotshingle")
N_DOCS = int(os.environ.get("GEN_ADV_DOCS", "1000"))

os.makedirs(DST, exist_ok=True)

def h(*parts) -> int:
    d = hashlib.md5(":".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(d[:8], "big")

VOCAB = [f"w{i}" + "abcdefgh"[: (i % 7)] for i in range(500)]
LANGS = ["en", "en", "en", "de", "fr", "ja"]
SOURCES = [f"src{k}" for k in range(1, 21)]

rows = []
for i in range(N_DOCS):
    m = i % 10
    if m < 6:                      # hot: one giant same-char run
        n = 1000 + h("hotlen", i) % 3000
        text = "a" * n
    elif m < 8:                    # half-hot: unique salt + hot run
        n = 1000 + h("hh", i) % 2000
        text = f"salt{i}x{h('s', i) % 997} " + "a" * n
    else:                          # normal zipf-word doc
        n_tok = 20 + h("nt", i) % 200
        text = " ".join(VOCAB[h("tok", i, j) % len(VOCAB)]
                        for j in range(n_tok))
    rows.append({
        "doc_id": i,
        "text": text,
        "lang": LANGS[h("lang", i) % len(LANGS)],
        "source": SOURCES[h("src", i) % len(SOURCES)],
        "n_chars": len(text),
    })

schema = pq.read_schema(f"{SRC}/documents.parquet")
table = pa.Table.from_pylist(rows, schema=schema)
pq.write_table(table, f"{DST}/documents.parquet")
hot_rows = sum(r["n_chars"] - 39 for r in rows if set(r["text"]) == {"a"})
print(f"documents: {table.num_rows} rows, "
      f"{sum(r['n_chars'] for r in rows)} chars, "
      f"~{hot_rows} rows in the hottest 40-char shingle group", flush=True)

for name in os.listdir(SRC):
    if name != "documents.parquet" and name.endswith(".parquet"):
        shutil.copyfile(f"{SRC}/{name}", f"{DST}/{name}")
print(f"copied non-document tables from {SRC} to {DST}", flush=True)

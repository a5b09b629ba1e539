#!/usr/bin/env python3
"""Adversarial documents profile (VERDICT r7 item 7): the catalog is 100%
green on a generator whose pathologies are well-mapped (20-word template
vocab, uniform ~300-char docs). This profile attacks the dedup/text family
oracles from the OTHER side:

- a genuine Zipf vocabulary (2000 word forms, P(rank r) proportional to
  1/r) instead of the 20-word template floor;
- heavy-tail doc lengths (Pareto alpha ~ 1.25, 20..3000 tokens) instead
  of uniform ~60-token docs;
- 1% giant docs (~30k tokens, ~200k chars) — the straggler/skew case;
- unicode-dense docs (CJK + emoji + combining marks + RTL) every 10th doc
  — exercises codepoint-vs-byte indexing on BOTH engines (Spark
  UTF8String and DuckDB are codepoint-based; any disagreement is exactly
  what this sweep exists to catch);
- planted near-dup clusters (runs of 3 docs at ~0.9 Jaccard) plus
  verbatim duplicates, so dedup queries emit nonzero results;
- empty-text docs (the degenerate-length edge).

Deterministic: all randomness is md5("adv:<i>:<field>") — byte-identical
re-runs, no RNG state. Writes documents.parquet to GEN_ADV_DST and COPIES
the remaining 9 tables from SRC so the full oracle sweep (Verify +
compare.py) runs unchanged against the directory.
"""
import hashlib
import os
import shutil
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("GEN_ADV_SRC", "/root/testdata/sf0.01")
DST = os.environ.get("GEN_ADV_DST", "/root/repo/testdata-ext/adv0.01")
N_DOCS = int(os.environ.get("GEN_ADV_DOCS", "500"))

os.makedirs(DST, exist_ok=True)

def h(*parts) -> int:
    """64-bit deterministic hash of the joined parts."""
    d = hashlib.md5(":".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(d[:8], "big")

def u(*parts) -> float:
    """Uniform (0,1] from the hash."""
    return (h(*parts) % (2**53) + 1) / 2.0**53

# --- vocabularies -----------------------------------------------------
VOCAB_N = 2000
# ascii zipf vocab: wordNNN padded forms give realistic length variety
ASCII_VOCAB = [f"w{i}" + "abcdefgh"[: (i % 7)] for i in range(VOCAB_N)]
# unicode vocab: CJK, emoji, combining marks, RTL, Greek — one "word"
# per entry so tokenization stays whitespace-clean
UNI_VOCAB = [
    "漢字語", "こんにちは",
    "한국어", "中文文本",
    "\U0001F600\U0001F680", "\U0001F4A9\U0001F409",
    "café", "naïve", "façade",
    "élève",  # combining acute/grave
    "שלום", "مرحبا",
    "αβγδ", "ΑΩσς",
    "Ümläutß", "đường",
] * 125  # 2000 entries, zipf ranks reuse the 16 stems

# zipf inverse-CDF table
_cum = []
_tot = 0.0
for r in range(1, VOCAB_N + 1):
    _tot += 1.0 / r
    _cum.append(_tot)
_CUM = [c / _tot for c in _cum]

def zipf_rank(x: float) -> int:
    lo, hi = 0, VOCAB_N - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if _CUM[mid] < x:
            lo = mid + 1
        else:
            hi = mid
    return lo

def doc_tokens(i: int) -> list:
    uni = (i % 10 == 3)
    vocab = UNI_VOCAB if uni else ASCII_VOCAB
    if i % 100 == 7:              # 1% giant docs
        n_tok = 30000
    else:                          # Pareto alpha=1.25, 20..3000 tokens
        n_tok = min(3000, int(20 * (1.0 / u("len", i)) ** 0.8))
    return [vocab[zipf_rank(u("tok", i, j))] for j in range(n_tok)]

LANGS = ["en", "en", "en", "de", "fr", "ja"]  # en-heavy like the base gen
SOURCES = [f"src{k}" for k in range(1, 21)]

rows = []
for i in range(N_DOCS):
    m = i % 20
    if m == 11 and rows:           # near-dup of doc i-1: ~1/37 tokens flipped
        base = rows[-1]["text"].split(" ")
        toks = [ASCII_VOCAB[zipf_rank(u("mut", i, j))] if j % 37 == 5 else t
                for j, t in enumerate(base)]
        text = " ".join(toks)
    elif m == 12 and len(rows) >= 2:  # near-dup of doc i-2 (3-doc cluster)
        base = rows[-2]["text"].split(" ")
        toks = [ASCII_VOCAB[zipf_rank(u("mut", i, j))] if j % 41 == 3 else t
                for j, t in enumerate(base)]
        text = " ".join(toks)
    elif m == 15 and rows:         # verbatim duplicate of doc i-1
        text = rows[-1]["text"]
    elif m == 19:                  # empty text — the degenerate edge
        text = ""
    else:
        text = " ".join(doc_tokens(i))
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
print(f"documents: {table.num_rows} rows, "
      f"{sum(r['n_chars'] for r in rows)} chars "
      f"(max {max(r['n_chars'] for r in rows)})", flush=True)

# --- adversarial embeddings (round-8 extension): the vector-family edge
# cases a 100 TB embedding table WILL contain — zero vectors (failed
# encoder outputs), exact duplicate vectors, and denormal-tiny norms —
# injected deterministically into the sf0.01 table (every 25th vector
# zeroed, every 25th+2 scaled by 1e-20, every 25th+13 duplicated from
# its UNMODIFIED predecessor — offset 13 keeps the duplicate pair away
# from the zeroed/tiny rows, so the corpus contains genuine NONZERO
# exact-dup pairs; the round-8 offset-1 version copied the just-zeroed
# row, so under the zero-norm contract cosine(0,0)=0 the "duplicate"
# case was never actually exercised — ADVICE r8), other rows unchanged.
emb = pq.read_table(f"{SRC}/embeddings.parquet")
vecs = emb.column("embedding").to_pylist()
out = []
for i, v in enumerate(vecs):
    if v is not None and i % 25 == 0:
        v = [0.0] * len(v)
    elif v is not None and i % 25 == 2:
        v = [x * 1e-20 for x in v]
    elif v is not None and i % 25 == 13 and i > 0 and vecs[i - 1] is not None:
        v = list(vecs[i - 1])  # nonzero exact duplicate of an unmodified row
    out.append(v)
idx = emb.schema.get_field_index("embedding")
emb = emb.set_column(idx, emb.schema.field("embedding"),
                     pa.array(out, type=emb.schema.field("embedding").type))
pq.write_table(emb.cast(pq.read_schema(f"{SRC}/embeddings.parquet")),
               f"{DST}/embeddings.parquet")
print(f"embeddings: {emb.num_rows} rows (zero/dup/tiny injected)", flush=True)

for name in ["region", "nation", "customer", "supplier", "part", "orders",
             "lineitem", "events"]:
    shutil.copyfile(f"{SRC}/{name}.parquet", f"{DST}/{name}.parquet")
    print(f"{name}: copied", flush=True)

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

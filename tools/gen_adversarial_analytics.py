#!/usr/bin/env python3
"""Adversarial ANALYTICS profiles (VERDICT r8 item 1): the r8 sweep
red-flagged 20 of 126 dedup/text/vector queries on first pass — a 16%
first-pass hit rate on families that were "100% correct" for six rounds.
The analytics/events/money families (~200 queries over events, orders,
lineitem, customer) have NEVER seen hostile data. These three profiles
attack them with the defect classes a 100 TB feed WILL contain:

advA0.01 — hostile values on the fact tables (sf0.01 base):
  events:   NULL user_id / event_type / props, DUPLICATE event_id,
            clock-skewed timestamps (1970 epoch-adjacent AND 2099
            far-future), NaN / +Inf / -Inf / negative `value`, and a hot
            key (user_id 42 holds ~10% of all rows).
  orders:   duplicate o_orderkey (PK violation), NULL o_custkey
            (dangling FK), 1970/2099 order dates, negative o_totalprice.
  lineitem: duplicate (l_orderkey, l_linenumber), NULL l_partkey,
            l_quantity = 0, l_discount = 1.5 (>100%), 1970/2099
            shipdates.
  customer: NULL c_nationkey, duplicate c_custkey.
advE0.01 — EMPTY fact tables (events/orders/lineitem/documents/
  embeddings at 0 rows, schemas preserved; dims intact): the
  first-delivery / post-outage shape. Every query must return an
  empty-or-degenerate result that the DuckDB oracle agrees with — no
  crashes, no divide-by-zero rows, no .first()-on-empty.
advD0.01 — SINGLE-DAY calendar (every events ts, o_orderdate and
  l_shipdate on 2024-03-15, time-of-day preserved): collapses every
  day-over-day / trend / seasonality / autocorrelation series to one
  point — the degenerate-variance edge.

Deterministic: mutations are pure functions of the row index (no RNG),
so re-runs are byte-identical and both engines read the same parquet.
Unmodified tables are copied so the full oracle sweep (Verify +
compare.py) runs unchanged against each directory.
"""
import datetime
import hashlib
import math
import os
import shutil
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("GEN_ADV_SRC", "/root/testdata/sf0.01")
BASE = os.environ.get("GEN_ADV_BASE", "/root/repo/testdata-ext")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
FACTS = ["events", "orders", "lineitem", "documents", "embeddings"]

EPOCH_DAY = datetime.datetime(1970, 1, 5)
FUTURE_DAY = datetime.datetime(2099, 6, 1)
SINGLE_DAY = datetime.datetime(2024, 3, 15)


def with_day(ts, day):
    """Replace the date part, keep time-of-day (preserves intra-day order
    statistics like sessions and minute-of-day profiles)."""
    if ts is None:
        return None
    return day.replace(hour=ts.hour, minute=ts.minute, second=ts.second,
                       microsecond=ts.microsecond)


def read_rows(name):
    return pq.read_table(f"{SRC}/{name}.parquet").to_pylist()


def write_rows(dst, name, rows):
    schema = pq.read_schema(f"{SRC}/{name}.parquet")
    table = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(table, f"{dst}/{name}.parquet")
    print(f"  {name}: {table.num_rows} rows", flush=True)


def copy_tables(dst, names):
    for name in names:
        shutil.copyfile(f"{SRC}/{name}.parquet", f"{dst}/{name}.parquet")


def manifest(dst):
    with open(f"{dst}/MANIFEST.txt", "w") as mf:
        for name in sorted(os.listdir(dst)):
            if not name.endswith(".parquet"):
                continue
            hh = hashlib.md5()
            with open(f"{dst}/{name}", "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    hh.update(chunk)
            nr = pq.read_metadata(f"{dst}/{name}").num_rows
            mf.write(f"{hh.hexdigest()}  {nr}  {name}\n")


# ---------------------------------------------------------------- advA
def gen_advA(dst):
    os.makedirs(dst, exist_ok=True)
    print("advA (hostile values):", flush=True)

    ev = read_rows("events")
    prev_eid = None
    for i, r in enumerate(ev):
        # hot key first: user 42 takes every 10th row (~10% of the table)
        if i % 10 == 7:
            r["user_id"] = 42
        if i % 50 == 21:
            r["user_id"] = None
        if i % 50 == 31:
            r["event_type"] = None
        if i % 50 == 41:
            r["props"] = None
        if i % 40 == 17 and prev_eid is not None:
            r["event_id"] = prev_eid          # duplicate key, other cols live
        if i % 100 == 3:
            r["ts"] = with_day(r["ts"], EPOCH_DAY)
        elif i % 100 == 53:
            r["ts"] = with_day(r["ts"], FUTURE_DAY)
        if r["value"] is not None:
            if i % 100 == 11:
                r["value"] = math.nan
            elif i % 100 == 61:
                r["value"] = math.inf
            elif i % 100 == 71:
                r["value"] = -math.inf
            elif i % 100 == 81:
                r["value"] = -abs(r["value"]) - 1.0
        prev_eid = r["event_id"]
    write_rows(dst, "events", ev)

    od = read_rows("orders")
    prev_okey = None
    for i, r in enumerate(od):
        if i % 100 == 13 and prev_okey is not None:
            r["o_orderkey"] = prev_okey        # PK violation
        if i % 100 == 23:
            r["o_custkey"] = None              # dangling FK
        if i % 200 == 43:
            r["o_orderdate"] = with_day(r["o_orderdate"], FUTURE_DAY)
        elif i % 200 == 143:
            r["o_orderdate"] = with_day(r["o_orderdate"], EPOCH_DAY)
        if i % 100 == 53 and r["o_totalprice"] is not None:
            r["o_totalprice"] = -r["o_totalprice"]
        prev_okey = r["o_orderkey"]
    write_rows(dst, "orders", od)

    li = read_rows("lineitem")
    prev_key = None
    for i, r in enumerate(li):
        if i % 200 == 7 and prev_key is not None:
            r["l_orderkey"], r["l_linenumber"] = prev_key   # dup composite key
        if i % 200 == 57:
            r["l_partkey"] = None
        if i % 200 == 107:
            r["l_quantity"] = 0.0
        if i % 200 == 157:
            r["l_discount"] = 1.5              # >100% discount
        if i % 500 == 3:
            r["l_shipdate"] = with_day(r["l_shipdate"], FUTURE_DAY)
        elif i % 500 == 253:
            r["l_shipdate"] = with_day(r["l_shipdate"], EPOCH_DAY)
        prev_key = (r["l_orderkey"], r["l_linenumber"])
    write_rows(dst, "lineitem", li)

    cu = read_rows("customer")
    prev_ckey = None
    for i, r in enumerate(cu):
        if i % 100 == 37:
            r["c_nationkey"] = None
        if i % 300 == 111 and prev_ckey is not None:
            r["c_custkey"] = prev_ckey         # duplicate dim key
        prev_ckey = r["c_custkey"]
    write_rows(dst, "customer", cu)

    copy_tables(dst, ["region", "nation", "supplier", "part",
                      "documents", "embeddings"])
    manifest(dst)


# ---------------------------------------------------------------- advE
def gen_advE(dst):
    os.makedirs(dst, exist_ok=True)
    print("advE (empty facts):", flush=True)
    for name in FACTS:
        schema = pq.read_schema(f"{SRC}/{name}.parquet")
        pq.write_table(schema.empty_table(), f"{dst}/{name}.parquet")
        print(f"  {name}: 0 rows", flush=True)
    copy_tables(dst, [t for t in TABLES if t not in FACTS])
    manifest(dst)


# ---------------------------------------------------------------- advD
def gen_advD(dst):
    os.makedirs(dst, exist_ok=True)
    print("advD (single-day calendar):", flush=True)
    ev = read_rows("events")
    for r in ev:
        r["ts"] = with_day(r["ts"], SINGLE_DAY)
    write_rows(dst, "events", ev)
    od = read_rows("orders")
    for r in od:
        r["o_orderdate"] = with_day(r["o_orderdate"], SINGLE_DAY)
    write_rows(dst, "orders", od)
    li = read_rows("lineitem")
    for r in li:
        r["l_shipdate"] = with_day(r["l_shipdate"], SINGLE_DAY)
    write_rows(dst, "lineitem", li)
    copy_tables(dst, [t for t in TABLES
                      if t not in ("events", "orders", "lineitem")])
    manifest(dst)


if __name__ == "__main__":
    # optional argv: profile names to generate (default: all three at the
    # sf0.01 base). GEN_ADV_SUFFIX names the dst for other rungs, e.g.
    #   GEN_ADV_SRC=testdata-ext/sf1 GEN_ADV_SUFFIX=1 python3 ... advA
    # -> testdata-ext/advA1 (the VERDICT r9 item-5 adversarial-at-rung
    # sweep: hostile VALUES at the scale where estimate-driven plan flips
    # actually manifest).
    import sys
    suffix = os.environ.get("GEN_ADV_SUFFIX", "0.01")
    which = sys.argv[1:] or ["advA", "advE", "advD"]
    gens = {"advA": gen_advA, "advE": gen_advE, "advD": gen_advD}
    for name in which:
        gens[name](f"{BASE}/{name}{suffix}")
    print("done", flush=True)

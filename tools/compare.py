#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle_sql in
DuckDB over the sf tables, compare to the Verify parquet dump (columns
sorted by name, rows sorted, exact values).

Ends with a NEGATIVE CONTROL: a deliberately perturbed oracle for
q03_daily_kpis (event_count + 1) is run through the SAME compare path and
MUST fail — a gate that can no longer catch a one-off integer drift would
otherwise rot silently while printing FAILS: 0."""
import sys, json, glob, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS FROM read_parquet('{sf_dir}/{t}.parquet')")

def diff_status(spark_df, ora_df):
    """The compare core (mirrors the driver): sorted columns, sorted rows,
    dtype + exact-value equality. Returns a list of mismatch strings."""
    status = []
    if list(spark_df.columns) != list(ora_df.columns):
        status.append(f"COLS spark={list(spark_df.columns)} ora={list(ora_df.columns)}")
    elif len(spark_df) != len(ora_df):
        status.append(f"ROWS spark={len(spark_df)} ora={len(ora_df)}")
    else:
        a = spark_df.sort_values(by=list(spark_df.columns)).reset_index(drop=True)
        b = ora_df.sort_values(by=list(ora_df.columns)).reset_index(drop=True)
        for c in a.columns:
            av, bv = a[c], b[c]
            if str(av.dtype) != str(bv.dtype):
                status.append(f"DTYPE {c}: {av.dtype} vs {bv.dtype}")
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = (~eq).idxmax()
                status.append(f"VAL {c}[{i}]: {av[i]!r} vs {bv[i]!r} ({int((~eq).sum())} diffs)")
    return status

def spark_dump(qdir):
    if not glob.glob(f"{qdir}/*.parquet"):
        # a 0-partition plan wrote a directory with only _SUCCESS — treat
        # as a zero-row frame with no columns (fails COLS loudly)
        import pandas as pd
        return pd.DataFrame()
    df = con.sql(f"FROM read_parquet('{qdir}/*.parquet')").df()
    return df.reindex(sorted(df.columns), axis=1)

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0

# STALE-DUMP TRAP, closed (round 9): a query that THROWS in Verify leaves
# no q* dir, and a dir-driven loop silently grades it absent — exactly how
# q65's empty-input crash hid behind "FAILS: 0" on the advE profile. Every
# oracle key must have a dump; a missing one is a hard FAIL here, not a
# skip. (oracle_sql.json is written by the same Verify run, so the key set
# is the catalog that was supposed to be dumped.)
dumped = {d.split("/")[-1] for d in glob.glob(f"{out_dir}/q*")}
for name in sorted(oracle):
    if name not in dumped:
        print(f"{name}: FAIL — NO DUMP (query threw in Verify; see its log)")
        fails += 1

for qdir in sorted(glob.glob(f"{out_dir}/q*")):
    name = qdir.split("/")[-1]
    spark_df = spark_dump(qdir)
    if name not in oracle:
        print(f"{name}: rows-only ({len(spark_df)} rows)" +
              ("  ** EMPTY **" if len(spark_df) == 0 else ""))
        fails += len(spark_df) == 0
        continue
    try:
        ora_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    ora_df = ora_df.reindex(sorted(ora_df.columns), axis=1)
    status = diff_status(spark_df, ora_df)
    if status:
        fails += 1
        print(f"{name}: FAIL {'; '.join(status[:4])}")
    else:
        print(f"{name}: OK ({len(spark_df)} rows)")

# ---- negative controls: the gate must still catch drifts of both kinds ----
# On an EMPTY base frame a perturbation has nothing to perturb (q03 is
# empty either way on the empty-facts profile) — the control is VACUOUS,
# not broken: it proves nothing but also breaks nothing. Skip with a note
# instead of counting a fail (round 9; this was the advE FAILS:2 the
# r9 sweep record adjudicated in prose).
def control_vacuous(name):
    if len(con.sql(oracle[name]).df()) == 0:
        print(f"negative_control({name}): vacuous on empty data — skipped")
        return True
    return False

# 1. value-level: q03's event_count + 1 must fail the VAL branch
ctrl = "q03_daily_kpis"
if ctrl in oracle and glob.glob(f"{out_dir}/{ctrl}") and not control_vacuous(ctrl):
    pert = (f"SELECT * EXCLUDE (event_count), event_count + 1 AS event_count "
            f"FROM ({oracle[ctrl]})")
    ora_df = con.sql(pert).df().pipe(
        lambda d: d.reindex(sorted(d.columns), axis=1))
    status = diff_status(spark_dump(f"{out_dir}/{ctrl}"), ora_df)
    if status:
        print(f"negative_control({ctrl}+1): OK — perturbed oracle correctly "
              f"FAILS ({status[0].split(':')[0]})")
    else:
        print(f"negative_control({ctrl}+1): ** GATE BROKEN ** perturbed "
              f"oracle passed the compare")
        fails += 1
# 2. set-level: dropping one emitted pair from q20's pair-set oracle must
#    fail the ROWS branch (a gate that only checks values row-by-row would
#    miss a silently shrunk result set)
ctrl2 = "q20_minhash_lsh_pairs"
if ctrl2 in oracle and glob.glob(f"{out_dir}/{ctrl2}") and not control_vacuous(ctrl2):
    pert2 = (f"SELECT * FROM ({oracle[ctrl2]}) "
             f"QUALIFY row_number() OVER (ORDER BY doc_id_1, doc_id_2) > 1")
    ora_df2 = con.sql(pert2).df().pipe(
        lambda d: d.reindex(sorted(d.columns), axis=1))
    status2 = diff_status(spark_dump(f"{out_dir}/{ctrl2}"), ora_df2)
    if status2:
        print(f"negative_control({ctrl2}-1row): OK — perturbed oracle "
              f"correctly FAILS ({status2[0].split(':')[0]})")
    else:
        print(f"negative_control({ctrl2}-1row): ** GATE BROKEN ** perturbed "
              f"oracle passed the compare")
        fails += 1

print("FAILS:", fails)
sys.exit(1 if fails else 0)

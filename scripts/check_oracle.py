#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, load the Spark parquet dump, sort columns by
name + rows, and compare values exactly. Usage:
    python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        fail += 1
        continue
    try:
        got = duckdb.sql(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
    except Exception as e:
        print(f"FAIL {name}: spark output missing {e}")
        fail += 1
        continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        fail += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
        fail += 1
        continue
    exp_s = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    got_s = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    mismatch = None
    for c in exp.columns:
        ev, gv = exp_s[c], got_s[c].astype(exp_s[c].dtype, errors="ignore")
        try:
            eq = (ev == gv) | (ev.isna() & gv.isna())
        except Exception:
            eq = ev.astype(str) == gv.astype(str)
        if not eq.all():
            i = int((~eq).idxmax())
            mismatch = f"col {c} row {i}: spark={gv[i]!r} oracle={ev[i]!r} dtypes {gv.dtype}/{ev.dtype}"
            break
    if mismatch:
        print(f"FAIL {name}: {mismatch}")
        fail += 1
    else:
        print(f"OK   {name}: {len(exp)} rows")
        ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)

#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, load the Spark parquet dump, sort columns by
name + rows, and compare values exactly.

Type sensitivity is calibrated to the driver's observed behavior
(r6 evidence): float32-vs-float64 and decimal(2,1)-vs-double both hash
EQUAL at the driver, while decimal128(38,0)-vs-int64 (DuckDB HUGEINT
from arithmetic over a windowed sum(BIGINT)) hashes DIFFERENT. The
consistent model is: values go through pandas conversion (HUGEINT and
DECIMAL become float64) and are hashed by string form — so int 12 vs
float 12.0 differ ("12" vs "12.0"), while f32/f64 of the same decimal
literal agree (shortest-repr printing). The r6 escape was this script's
`astype(oracle_dtype)` coercion, which silently cast Spark's int64 to
the oracle's float64 before comparing. No coercion here: stringify both
sides and require exact match.

Usage:
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
        # NO dtype coercion (the r6 q52 escape): stringify each side in its
        # NATIVE dtype (to_numpy() keeps f32 as f32; Series.map(str) would
        # box to Python float and widen), mirroring the driver's
        # type-sensitive value hash: shortest-repr makes f32 "0.2763" equal
        # f64 "0.2763", while int 12 vs HUGEINT-leaked 12.0 stays different.
        ev = [str(v) for v in exp_s[c].to_numpy()]
        gv = [str(v) for v in got_s[c].to_numpy()]
        if ev != gv:
            i = next(j for j, (a, b) in enumerate(zip(ev, gv)) if a != b)
            mismatch = (f"col {c} row {i}: spark={gv[i]!r} "
                        f"oracle={ev[i]!r} "
                        f"dtypes {got_s[c].dtype}/{exp_s[c].dtype}")
            break
    if mismatch:
        print(f"FAIL {name}: {mismatch}")
        fail += 1
    else:
        print(f"OK   {name}: {len(exp)} rows")
        ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)

#!/usr/bin/env python3
"""Dev-only crosscheck mimicking the driver's t2 gate: compare Verify's
parquet dumps against DuckDB runs of oracle_sql.json over the same tables.
(Not part of the Scala library; python/duckdb are driver-side tools.)

Usage: python3 tools/crosscheck.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    # multi-file fixtures (ScaleUp nFiles>1) are DIRECTORIES of part files
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, okays = [], []
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out_dir}/{name}"
    if not os.path.isdir(spark_dir):
        fails.append((name, "NO SPARK OUTPUT")); continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchdf()
    except Exception as e:
        fails.append((name, f"read spark output: {e}")); continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"ORACLE SQL ERROR: {str(e)[:300]}")); continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"columns: spark={list(got.columns)} oracle={list(exp.columns)}")); continue
    if got.dtypes.to_dict() != exp.dtypes.to_dict():
        d = {c: (str(got.dtypes[c]), str(exp.dtypes[c]))
             for c in got.columns if got.dtypes[c] != exp.dtypes[c]}
        fails.append((name, f"dtypes differ: {d}")); continue
    if len(got) != len(exp):
        fails.append((name, f"rows: spark={len(got)} oracle={len(exp)}")); continue
    gs = got.sort_values(by=list(got.columns), na_position='first').reset_index(drop=True)
    es = exp.sort_values(by=list(exp.columns), na_position='first').reset_index(drop=True)
    neq = (gs != es) & ~(gs.isna() & es.isna())
    if neq.any().any():
        bad_cols = [c for c in gs.columns if neq[c].any()]
        i = neq.any(axis=1).idxmax()
        fails.append((name, f"values differ in {bad_cols}; first bad row {i}: "
                            f"spark={gs.iloc[i].to_dict()} oracle={es.iloc[i].to_dict()}"))
        continue
    okays.append((name, len(got)))

for name, n in okays:
    print(f"  OK  {name} ({n} rows)")
for name, msg in fails:
    print(f" FAIL {name}: {msg}")
print(f"\n{len(okays)} ok, {len(fails)} fail")
sys.exit(1 if fails else 0)

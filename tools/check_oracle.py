#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same sf tables and value-compare against the parquet dumps
Verify.scala wrote. Usage: check_oracle.py <sfDir> <verifyOutDir>"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out_dir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        got = con.sql(
            f"SELECT * FROM parquet_scan('{spark_dir}/*.parquet')").df()
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}")
        fail += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}"); fail += 1
        continue
    gs = got.sort_values(list(got.columns)).reset_index(drop=True)
    ws = want.sort_values(list(want.columns)).reset_index(drop=True)
    ghash = [tuple(str(v) for v in r) for r in gs.itertuples(index=False)]
    whash = [tuple(str(v) for v in r) for r in ws.itertuples(index=False)]
    if ghash != whash:
        bad = next(i for i, (a, b) in enumerate(zip(ghash, whash)) if a != b)
        print(f"FAIL {name}: value mismatch at sorted row {bad}:")
        print(f"  spark : {ghash[bad]}")
        print(f"  oracle: {whash[bad]}")
        fail += 1; continue
    print(f"PASS {name} ({len(got)} rows)")
print(f"{'ALL PASS' if fail == 0 else f'{fail} FAILURES'} "
      f"/ {len(oracle)} queries")
sys.exit(1 if fail else 0)

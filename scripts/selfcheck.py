#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/selfcheck.py [sfdir] [outdir]
Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` has already run
(or pass --run to invoke it).

For each query in outdir/oracle_sql.json: run the SQL in DuckDB with views
over <sfdir>/*.parquet, load outdir/<name> parquet, sort columns by name,
sort rows, compare values exactly. Prints per-query PASS/FAIL + diffs.
"""
import json, sys, glob, os, subprocess

import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

if "--run" in sys.argv:
    subprocess.run(
        ["sbt", f'runMain graft.Verify {sfdir} {outdir}'],
        cwd="/root/repo", check=True)

con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
# --only a,b,c: restrict to named queries (fresh-process retries of rows
# a long sf1 sweep OOM'd in DuckDB's single shared connection)
only = None
for i, a in enumerate(sys.argv):
    if a == "--only" and i + 1 < len(sys.argv):
        only = set(sys.argv[i + 1].split(","))
if only is not None:
    oracle = {k: v for k, v in oracle.items() if k in only}
n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    spark_dir = os.path.join(outdir, name)
    try:
        got = pd.concat([pd.read_parquet(f) for f in
                         sorted(glob.glob(os.path.join(spark_dir, "*.parquet")))],
                        ignore_index=True)
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: error {e}")
        n_fail += 1
        continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    status = []
    if list(got.columns) != list(exp.columns):
        status.append(f"columns {list(got.columns)} vs {list(exp.columns)}")
    else:
        if [str(t) for t in got.dtypes] != [str(t) for t in exp.dtypes]:
            status.append(f"dtypes {list(map(str, got.dtypes))} vs {list(map(str, exp.dtypes))}")
        g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        if len(g) != len(e):
            status.append(f"rows {len(g)} vs {len(e)}")
        elif not g.equals(e):
            neq = (g != e) & ~(g.isna() & e.isna())
            bad = neq.any(axis=1)
            status.append(f"{bad.sum()} mismatched rows of {len(g)}")
            print(pd.concat([g[bad].head(5).add_suffix("_got"),
                             e[bad].head(5).add_suffix("_exp")], axis=1))
    if status:
        print(f"FAIL {name}: {'; '.join(status)}")
        n_fail += 1
    else:
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)

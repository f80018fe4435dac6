#!/usr/bin/env python3
"""Full-surface oracle sweep with a per-row JSON artifact.

Runs every oracle_sql.json row through scripts/selfcheck.py in CHUNKED
fresh processes (DuckDB 1.0 accumulates memory across a session — the r11
sf1 sweep OOM'd a single shared connection), collects per-row status into
one committed artifact, and records rows that are ORACLE-INFEASIBLE at
this scale as first-class statuses instead of SURVEY prose (VERDICT r11
next #8: the infeasibility note belongs in the correctness artifact
itself).

Usage:
  python3 scripts/sweep_sf1.py <sfdir> <verify_outdir> <artifact.json> [chunk]

Assumes `sbt "runMain graft.Verify <sfdir> <verify_outdir>"` already ran.
"""
import json, os, re, subprocess, sys

sfdir = sys.argv[1]
outdir = sys.argv[2]
artifact = sys.argv[3]
chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 8

# Rows whose DuckDB oracle cannot run at sf1: the sf documents' ~31-token
# vocabulary makes every doc collide in every PLAID centroid, so the
# oracle's candidate set is the whole corpus and the token-pair MaxSim
# expansion is ~queries x n_docs x 31^2 list ops — DuckDB 1.0 cannot
# spill it (OOMs even in a fresh process with temp_directory set). The
# Spark rows produce results fine and are hash-green at sf0.01/sf0.1;
# the realistic-vocabulary PLAID surface is separately verified at the
# 1M-token protocol (BENCH_LOCAL_r12_1m_plaid.json).
INFEASIBLE = {
    "maxsim_first_stage":
        "DuckDB oracle OOM at sf1: degenerate ~31-token vocab makes the "
        "PLAID candidate set the whole corpus (queries x n_docs x 31^2 "
        "token-pair expansion; DuckDB 1.0 cannot spill it). Row is "
        "hash-green at sf0.01/sf0.1.",
    "maxsim_first_served":
        "Same oracle as maxsim_first_stage (served variant) — same sf1 "
        "OOM. Row is hash-green at sf0.01/sf0.1.",
}

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
names = sorted(oracle.keys())
rows = {}
for name in names:
    if os.path.basename(sfdir).rstrip("/") == "sf1" and name in INFEASIBLE:
        rows[name] = {"status": "oracle_infeasible", "reason": INFEASIBLE[name]}
        print(f"SKIP {name}: oracle_infeasible")

todo = [n for n in names if n not in rows]
for i in range(0, len(todo), chunk):
    batch = todo[i:i + chunk]
    print(f"== chunk {i // chunk + 1}: {','.join(batch)}", flush=True)
    p = subprocess.run(
        [sys.executable, "scripts/selfcheck.py", sfdir, outdir,
         "--only", ",".join(batch)],
        cwd="/root/repo", capture_output=True, text=True)
    out = p.stdout
    sys.stdout.write(out)
    seen = set()
    for line in out.splitlines():
        m = re.match(r"(PASS|FAIL) (\S+)", line)
        if m and m.group(2) in batch:
            rows[m.group(2)] = {"status": m.group(1).lower()}
            seen.add(m.group(2))
    for name in batch:
        if name not in seen:
            # process died (OOM/crash) before printing this row
            rows[name] = {"status": "no_result",
                          "note": f"selfcheck exit {p.returncode}, row not reached"}
            print(f"NO_RESULT {name} (exit {p.returncode})")

summary = {
    "sfdir": sfdir,
    "total": len(names),
    "pass": sum(1 for r in rows.values() if r["status"] == "pass"),
    "fail": sum(1 for r in rows.values() if r["status"] == "fail"),
    "oracle_infeasible": sum(1 for r in rows.values()
                             if r["status"] == "oracle_infeasible"),
    "no_result": sum(1 for r in rows.values() if r["status"] == "no_result"),
    "rows": rows,
}
with open(artifact, "w") as f:
    json.dump(summary, f, indent=1, sort_keys=True)
    f.write("\n")
print(f"\n{summary['pass']} pass, {summary['fail']} fail, "
      f"{summary['oracle_infeasible']} oracle_infeasible, "
      f"{summary['no_result']} no_result -> {artifact}")

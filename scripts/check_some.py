#!/usr/bin/env python3
"""Run Verify for a subset (or all) queries already dumped to out_dir and
compare ONLY the names given on argv against the DuckDB oracle."""
import sys, json, os, threading
import duckdb

BUDGET_S = float(os.environ.get("ORACLE_QUERY_BUDGET_S", "120"))

sf_dir = sys.argv[1]
out_dir = sys.argv[2]
names = sys.argv[3:]

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name in names:
    sql = oracle.get(name)
    if sql is None:
        print(f"SKIP {name}: no oracle")
        continue
    try:
        # same per-query wall-time budget as oracle_check.py: one stalled
        # DuckDB twin fails only that query
        timer = threading.Timer(BUDGET_S, con.interrupt)
        timer.start()
        try:
            exp = con.execute(sql).fetchdf()
        finally:
            timer.cancel()
        got = duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {str(e)[:300]}")
        fail += 1
        continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
        fail += 1
        continue
    def canon(df):
        return sorted(tuple(repr(v) for v in row) for row in df.itertuples(index=False))
    ce, cg = canon(exp), canon(got)
    if ce != cg:
        diff = [(a, b) for a, b in zip(ce, cg) if a != b][:3]
        if not diff:  # counts differ but shared prefix matches after sort
            longer, tag = (ce, "missing") if len(ce) > len(cg) else (cg, "extra")
            diff = [(tag, r) for r in longer[min(len(ce), len(cg)):][:3]]
        print(f"FAIL {name}: rows {len(got)}/{len(exp)}, first diffs: {diff}")
        fail += 1
        continue
    print(f"OK   {name} ({len(got)} rows)")
    ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)

#!/usr/bin/env python3
"""Self-check: compare Verify parquet outputs against the DuckDB oracle SQL,
the same way the driver's correctness gate does (sort columns by name,
compare row multisets of stringified values)."""
import sys, json, glob, os, threading
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
# Per-query wall-time budget: one stalled DuckDB twin must fail THAT query,
# not hang the whole gate (r11 lesson: the round's signal zeroed).
budget_s = float(os.environ.get("ORACLE_QUERY_BUDGET_S", "120"))

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def run_with_budget(c, sql):
    """Execute sql on connection c; interrupt it after budget_s seconds."""
    timer = threading.Timer(budget_s, c.interrupt)
    timer.start()
    try:
        return c.execute(sql).fetchdf()
    finally:
        timer.cancel()

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = run_with_budget(con, sql)
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {str(e)[:200]}")
        fail += 1
        continue
    try:
        got = duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: spark output read error: {str(e)[:200]}")
        fail += 1
        continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
        fail += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
        fail += 1
        continue
    def canon(df):
        return sorted(tuple(repr(v) for v in row) for row in df.itertuples(index=False))
    ce, cg = canon(exp), canon(got)
    if ce != cg:
        diff = [(a, b) for a, b in zip(ce, cg) if a != b][:3]
        print(f"FAIL {name}: value mismatch, first diffs: {diff}")
        fail += 1
        continue
    # dtype note (driver may compare schemas)
    dt = [(c, str(exp[c].dtype), str(got[c].dtype)) for c in exp.columns
          if str(exp[c].dtype) != str(got[c].dtype)]
    note = f"  [dtype diff: {dt}]" if dt else ""
    print(f"OK   {name} ({len(got)} rows){note}")
    ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)

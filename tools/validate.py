#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare each
Verify-dumped parquet against the DuckDB oracle SQL, column-name-sorted,
exact value equality after row sort. Usage:

    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/validate.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails, passes, rows_only = [], [], []
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            fails.append((name, "no parquet written")); continue
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if name not in oracle:
            rows_only.append((name, len(got))); continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            fails.append((name, f"oracle SQL error: {e}")); continue
        g = got.reindex(sorted(got.columns), axis=1)
        e = exp.reindex(sorted(exp.columns), axis=1)
        if list(g.columns) != list(e.columns):
            fails.append((name, f"columns differ: got {list(g.columns)} vs oracle {list(e.columns)}")); continue
        if len(g) != len(e):
            fails.append((name, f"rowcount {len(g)} vs {len(e)}")); continue
        gs = g.sort_values(by=list(g.columns), na_position="first").reset_index(drop=True)
        es = e.sort_values(by=list(e.columns), na_position="first").reset_index(drop=True)
        # stringify for exact compare (mirrors a hash of rendered values)
        gs2, es2 = gs.astype(str), es.astype(str)
        if gs2.equals(es2):
            passes.append((name, len(g)))
        else:
            diff_cols = [c for c in gs2.columns if not gs2[c].equals(es2[c])]
            mask = (gs2[diff_cols] != es2[diff_cols]).any(axis=1)
            idx = gs2.index[mask][:3]
            detail = []
            for i in idx:
                detail.append({c: (gs2.at[i, c], es2.at[i, c]) for c in diff_cols})
            # dtype check too
            dt = {c: (str(gs[c].dtype), str(es[c].dtype)) for c in diff_cols}
            fails.append((name, f"{mask.sum()} differing rows in {diff_cols}; dtypes {dt}; sample {detail}"))
    print(f"== PASS ({len(passes)}):")
    for n, r in passes: print(f"   {n} ({r} rows)")
    print(f"== ROWS-ONLY ({len(rows_only)}):")
    for n, r in rows_only: print(f"   {n} ({r} rows)")
    print(f"== FAIL ({len(fails)}):")
    for n, why in fails: print(f"   {n}: {why}")
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

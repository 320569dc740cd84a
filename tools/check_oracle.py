#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>
Reads each <out>/<query>/ parquet (Spark result), runs the matching SQL
from <out>/oracle_sql.json in DuckDB with the testdata tables registered,
and compares: columns sorted by name, rows sorted, exact values.
"""
import sys, json, glob, os
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"[{name}] NO OUTPUT FILES")
            n_fail += 1
            continue
        got = con.execute(f"select * from read_parquet('{qdir}/*.parquet')").fetchdf()
        got = got.reindex(sorted(got.columns), axis=1)
        if name not in oracle:
            print(f"[{name}] rows-only: {len(got)} rows, cols={list(got.columns)}")
            continue
        want = con.execute(oracle[name]).fetchdf()
        want = want.reindex(sorted(want.columns), axis=1)
        ok = True
        if list(got.columns) != list(want.columns):
            print(f"[{name}] COLUMN MISMATCH got={list(got.columns)} want={list(want.columns)}")
            ok = False
        elif len(got) != len(want):
            print(f"[{name}] ROWCOUNT MISMATCH got={len(got)} want={len(want)}")
            ok = False
        else:
            g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
            w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
            # exact compare (hash-style); report first diff
            diff = (g.astype(str) != w.astype(str))
            if diff.any().any():
                idx = diff.any(axis=1).idxmax()
                print(f"[{name}] VALUE MISMATCH at sorted row {idx}:")
                print("  got :", g.iloc[idx].to_dict())
                print("  want:", w.iloc[idx].to_dict())
                ndiff = int(diff.any(axis=1).sum())
                print(f"  ({ndiff}/{len(g)} rows differ)")
                ok = False
        if ok:
            print(f"[{name}] OK ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

main()

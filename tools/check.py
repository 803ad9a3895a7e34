#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB with the
test tables registered as views, then compares: schema (column names),
row count, and cell-exact values after sorting columns by name and
rows canonically. Reports PASS/FAIL per query with first diffs.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
            got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
                if files else None
            if got is None:
                print(f"FAIL {name}: no spark output")
                n_fail += 1
                continue
            want = con.execute(sql).df()
            if sorted(got.columns) != sorted(want.columns):
                print(f"FAIL {name}: columns spark={sorted(got.columns)} oracle={sorted(want.columns)}")
                n_fail += 1
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
                n_fail += 1
                continue
            g, w = canon(got), canon(want)
            # exact compare; show dtype + first mismatches
            mism = []
            for c in g.columns:
                gv, wv = g[c], w[c]
                try:
                    eq = (gv.astype(str) == wv.astype(str)) | (gv.isna() & wv.isna())
                except Exception:
                    eq = gv.astype(str) == wv.astype(str)
                if not eq.all():
                    i = int((~eq).idxmax())
                    mism.append((c, str(gv.dtype), str(wv.dtype),
                                 gv.iloc[i], wv.iloc[i]))
            if mism:
                print(f"FAIL {name}: {len(mism)} mismatching cols")
                for c, gd, wd, gvv, wvv in mism[:4]:
                    print(f"   col {c}: spark({gd})={gvv!r} oracle({wd})={wvv!r}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: EXC {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: run the oracle SQL in DuckDB over
views named after the corpus tables, then compare against the Spark parquet
dump — columns sorted by name, rows sorted by all columns, exact values
(floats compared exactly after both sides' round()).
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
                lambda v: v is None or hasattr(v, "toordinal")).all():
            df[c] = pd.to_datetime(df[c])
        elif str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif str(df[c].dtype) == "dbdate":
            df[c] = pd.to_datetime(df[c])
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        na_position="first")
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    dumped = sorted(
        p.split("/")[-1] for p in glob.glob(f"{out_dir}/*") if "." not in p.split("/")[-1])
    n_pass = n_fail = 0
    for name in dumped:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet written"); n_fail += 1; continue
        got = pd.read_parquet(f"{out_dir}/{name}")
        if name not in oracle:
            print(f"okNR {name}: rows-only ({len(got)} rows)"); n_pass += 1
            continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:160]}")
            n_fail += 1; continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e).splitlines()[-1][:200]}")
            # show first mismatching row for debugging
            neq = (g != w) & ~(g.isna() & w.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                cols = [c for c in g.columns if neq.loc[i, c]]
                print(f"     row {i} cols {cols}")
                print(f"     got  {g.loc[i, cols].to_dict()}")
                print(f"     want {w.loc[i, cols].to_dict()}")
            n_fail += 1
    missing = set(oracle) - set(dumped)
    for m in sorted(missing):
        print(f"FAIL {m}: oracle present but no dump"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

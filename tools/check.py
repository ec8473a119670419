#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (NOT shipped code).

Runs DuckDB over the oracle_sql.json dumped by graft.Verify and compares
each result against the parquet the Spark side wrote. Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df):
    # driver compares after sorting columns by name; we also sort rows to
    # be robust to either row-order policy
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: cols {list(g.columns)} != {list(w.columns)}")
            n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}"); n_fail += 1; continue
        if [str(d) for d in g.dtypes] != [str(d) for d in w.dtypes]:
            # the driver gate fails on schema divergence — mirror that
            print(f"FAIL {name}: dtypes {dict(g.dtypes.astype(str))} != {dict(w.dtypes.astype(str))}")
            n_fail += 1; continue
        if not g.equals(w):
            neq = (g != w) & ~(g.isna() & w.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {bad.sum()} mismatched rows; first:")
            print(g[bad].head(3)); print(w[bad].head(3))
            n_fail += 1; continue
        print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

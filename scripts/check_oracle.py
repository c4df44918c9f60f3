#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each <outDir>/<name> parquet dir + oracle_sql.json entry, executes the
oracle SQL in DuckDB against the sfDir tables and compares row counts,
column names, and a sorted value hash.

Usage: python3 scripts/check_oracle.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import hashlib

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize values to strings; round floats to kill tiny fp noise
    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6f}"
        return str(v)
    rows = sorted(tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        pdir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pq.read_table(files).to_pandas()
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        ok_rows = len(got) == len(exp)
        ok_cols = sorted(got.columns) == sorted(exp.columns)
        ok_hash = ok_cols and canon(got) == canon(exp)
        if ok_rows and ok_cols and ok_hash:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}; cols spark={sorted(got.columns)} oracle={sorted(exp.columns)}; hash_ok={ok_hash}")
            if ok_cols and not ok_hash and len(got) < 50 and len(exp) < 50:
                print("  spark:", got.reindex(sorted(got.columns), axis=1).head(10).to_dict("records"))
                print("  oracle:", exp.reindex(sorted(exp.columns), axis=1).head(10).to_dict("records"))
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare (dev tooling only —
not part of the library). Usage:
  python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Reads each <name>/ parquet result plus oracle_sql.json, runs the SQL in
DuckDB with fixture tables registered under bare names, and compares
row counts, schema (column names), and sorted-row value hashes.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
            if files else pd.DataFrame()
        if name not in oracles:
            print(f"  {name}: rows={len(got)} (no oracle, rows-only)")
            if len(got) == 0:
                print(f"    WARN: zero rows")
            continue
        # Guard (round-4 lesson, e26/e38/e39): DuckDB window/group SUM
        # widens to HUGEINT, which pandas fetches as float64 while Spark
        # writes int64 — values match but the driver's hash differs.
        # Reject oracles whose result schema is wider than int64 so the
        # bug class fails HERE, not in the driver's round artifact.
        desc = con.execute("DESCRIBE " + oracles[name]).fetchdf()
        huge = [(c, t) for c, t in zip(desc["column_name"], desc["column_type"])
                if "HUGEINT" in str(t).upper()]
        want = con.execute(oracles[name]).fetchdf()
        g, w = canon(got), canon(want)
        ok_cols = list(g.columns) == list(w.columns)
        ok_rows = len(g) == len(w)
        # The driver hashes value REPRESENTATIONS, so kind drift (int64 vs
        # float64: "0" vs "0.0") fails its compare even when values are
        # equal — but width (int32 vs int64) and datetime unit (ns vs us)
        # do not (all r4-green queries differ there). Mirror the kind.
        ok_dtype = ok_cols and [t.kind for t in g.dtypes] == [t.kind for t in w.dtypes]
        ok_vals = False
        if ok_cols and ok_rows:
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
                ok_vals = True
            except AssertionError as e:
                ok_vals = False
                err = str(e).split("\n")[:6]
        status = "OK" if (ok_cols and ok_rows and ok_vals and ok_dtype
                          and not huge) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"  {name}: {status} cols={ok_cols} ({list(g.columns)} vs {list(w.columns)}) rows={len(g)}/{len(w)} dtype={ok_dtype}")
            if huge:
                print(f"    HUGEINT oracle columns (cast to BIGINT in the SQL): {huge}")
            if not ok_dtype and ok_cols:
                print(f"    spark={list(map(str, g.dtypes))} oracle={list(map(str, w.dtypes))}")
            if ok_cols and ok_rows and not ok_vals:
                print("    " + "\n    ".join(err))
        else:
            print(f"  {name}: OK ({len(g)} rows)")
    return failures

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local pre-flight mimic of the driver's correctness gate.

Usage: python3 tools/check_oracles.py <sfDir> <outDir>
(run after: sbt "runMain graft.Verify <sfDir> <outDir>")

Reads each query's parquet from outDir, runs the matching oracle SQL from
outDir/oracle_sql.json in DuckDB over the sfDir tables, and compares:
schema (column names sorted), row count, and cell values (rows sorted).
This is tooling only — not part of the shipped library.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_result(outdir, name):
    path = os.path.join(outdir, name + ".parquet")
    if not os.path.exists(path):
        path = os.path.join(outdir, name)
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        return None
    return pd.concat([pq.read_table(f).to_pandas() for f in files])


def normalize(df):
    df = df[sorted(df.columns)]
    # canonicalize types: decimals -> str, floats rounded repr
    out = df.copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].map(lambda v: str(v) if v is not None else None)
    rows = sorted(out.astype(str).itertuples(index=False, name=None))
    return rows


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    names = sorted(set(list(oracles.keys())) |
                   {os.path.basename(p).replace(".parquet", "")
                    for p in glob.glob(os.path.join(outdir, "*.parquet"))})
    n_pass = n_fail = n_rowsonly = 0
    for name in sorted(names):
        got = load_result(outdir, name)
        if got is None:
            print(f"FAIL  {name}: no spark output")
            n_fail += 1
            continue
        if name not in oracles:
            status = "rows-only" + (" OK" if len(got) > 0 else " EMPTY!")
            print(f"----  {name}: {status} ({len(got)} rows)")
            n_rowsonly += 1
            if len(got) == 0:
                n_fail += 1
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"FAIL  {name}: columns {gcols} vs oracle {ecols}")
            n_fail += 1
            continue
        g, e = normalize(got), normalize(exp)
        if len(g) != len(e):
            print(f"FAIL  {name}: rows {len(g)} vs oracle {len(e)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(g, e) if a != b]
        if bad:
            print(f"FAIL  {name}: {len(bad)}/{len(g)} cell mismatches; first: {bad[0]}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

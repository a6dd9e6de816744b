#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first
(`sbt "runMain graft.Verify <sfDir> <outDir>"`), then this script compares
each <outDir>/<name> parquet with DuckDB executing oracle_sql.json on the
raw parquet tables. Columns sorted by name, rows sorted, values stringified
(floats rounded) before hashing — approximating the driver's compare.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if v is None:
            return "NULL"
        import decimal
        if isinstance(v, (float, decimal.Decimal)):
            return f"{float(v):.6f}"
        try:
            import numpy as np
            if isinstance(v, np.floating):
                return f"{float(v):.6f}"
            if isinstance(v, np.integer):
                return str(int(v))
            if isinstance(v, np.ndarray):
                return str(list(v))
        except ImportError:
            pass
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        try:
            if pd.isna(v):
                return "NULL"
        except (TypeError, ValueError):
            pass
        return str(v)
    rows = [tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"  {name}: NO OUTPUT"); failures += 1; continue
        actual = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            print(f"  {name}: rows-only ({len(actual)} rows) "
                  + ("OK" if len(actual) > 0 else "EMPTY! FAIL"))
            failures += 0 if len(actual) > 0 else 1
            continue
        try:
            expected = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"  {name}: ORACLE SQL ERROR: {e}"); failures += 1; continue
        a, e = canon(actual), canon(expected)
        if sorted(actual.columns.str.lower()) != sorted(expected.columns.str.lower()):
            print(f"  {name}: SCHEMA MISMATCH spark={sorted(actual.columns)} "
                  f"duckdb={sorted(expected.columns)}")
            failures += 1
        elif a == e:
            print(f"  {name}: MATCH ({len(a)} rows)")
        else:
            print(f"  {name}: VALUE MISMATCH rows spark={len(a)} duckdb={len(e)}")
            diff_a = [r for r in a if r not in set(e)][:3]
            diff_e = [r for r in e if r not in set(a)][:3]
            print(f"    only-spark: {diff_a}")
            print(f"    only-duck : {diff_e}")
            failures += 1
    print(f"{'ALL MATCH' if failures == 0 else f'{failures} FAILURES'}")
    return failures

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)

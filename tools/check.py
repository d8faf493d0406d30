#!/usr/bin/env python3
"""Dev-only pre-flight of the driver's DuckDB-oracle compare (SURVEY §5.2).

Not part of the shipped library. Usage:
    python3 tools/check.py <sfDir> <verifyOutDir>

Replicates the driver's semantics: run each oracle_sql.json query in DuckDB
over views of the sf parquet tables, read Spark's parquet output for the
same query name, sort columns by name, and compare shape + values exactly.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out}/oracle_sql.json") as f:
        oracle = json.load(f)
    failures = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); failures += 1; continue
        try:
            got = norm(con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").fetchdf())
            want = norm(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); failures += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} oracle={list(want.columns)}")
            failures += 1; continue
        if got.shape != want.shape:
            print(f"FAIL {name}: shape spark={got.shape} oracle={want.shape}")
            failures += 1; continue
        # dtype parity mirrors the driver's TYPED hash: value-equal columns
        # with different types (e.g. DuckDB HUGEINT->float64 vs Spark int64
        # from an uncast SUM) still hash-mismatch driver-side.
        dt = [c for c in got.columns if str(got[c].dtype) != str(want[c].dtype)]
        if dt:
            failures += 1
            print(f"FAIL {name}: dtype mismatch " +
                  ", ".join(f"{c}: spark={got[c].dtype} oracle={want[c].dtype}" for c in dt))
            continue
        mism = []
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                # scalar columns; raises for cells that are numpy arrays
                # (elementwise == yields an array, ambiguous truth value)
                eq = (a == b) | (a.isna() & b.isna())
                if not eq.all():
                    mism.append(c)
            except Exception:
                # object/array columns: fall back to per-cell string compare
                if not (a.map(lambda v: str(list(v)) if hasattr(v, "__len__") and not isinstance(v, str) else str(v))
                        == b.map(lambda v: str(list(v)) if hasattr(v, "__len__") and not isinstance(v, str) else str(v))).all():
                    mism.append(c)
        if mism:
            failures += 1
            print(f"FAIL {name}: value mismatch in {mism}")
            for c in mism[:3]:
                bad = (got[c] != want[c]) & ~(got[c].isna() & want[c].isna())
                idx = bad[bad].index[:3]
                for i in idx:
                    print(f"   row {i} col {c}: spark={got[c][i]!r} oracle={want[c][i]!r}")
        else:
            print(f"OK   {name}: {got.shape[0]} rows x {got.shape[1]} cols")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Re-measure the BASELINE.md 10-query DuckDB suite on the current host.

The survey measured DuckDB 1.0.0 at 4 threads over parquet views at
sf0.1 (warm = min of runs 2..n). BASELINE's absolute numbers are only
meaningful in the host window they were measured in; this script
re-measures the identical suite (query text = the committed oracle SQL,
the same SQL the driver's correctness gate runs) so a degraded-host
BENCH artifact can be read as a RATIO against a same-window DuckDB
total rather than against a quiet-window constant.

Usage: python3 tools/duckdb_headline.py <sfdir> <oracle_sql.json> [iters]
Prints one JSON line: per-query warm seconds + total.
"""
import json
import sys
import time

import duckdb

HEADLINE = [
    "q1_pricing_summary", "q3_join_topk", "q5_multijoin", "window_rank",
    "distinct_users_daily", "sessionize", "json_extract_agg",
    "dedup_docs_exact", "knn_brute_force", "setop_except",
]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir = sys.argv[1]
    oracle = json.load(open(sys.argv[2]))
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    con = duckdb.connect()
    con.execute("PRAGMA threads=4")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    # events ts arrives as ns-int64 in DuckDB? The oracle SQL embeds its own
    # conversions exactly as the driver runs it, so no special handling here.
    out = {}
    for name in HEADLINE:
        sql = oracle[name]
        times = []
        for _ in range(iters + 1):  # run 1 = cold/warmup, excluded
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times.append(time.perf_counter() - t0)
        out[name] = round(min(times[1:]), 3)
    total = round(sum(out.values()), 3)
    print(json.dumps({"metric": "duckdb_headline_total", "value": total,
                      "unit": "sec", "queries": out, "sf": sfdir,
                      "threads": 4, "iters": iters}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Time the DuckDB oracle SQL for named queries over a fixture SF dir —
the single-node baseline column of SCALE.md's scale tables.

Usage: duck_bench.py SF_DIR ORACLE_JSON query [query ...]
"""
import json, os, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    oracles = json.load(open(oracle_json))
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(path):
            continue
        src = (f"read_parquet('{path}/*.parquet')" if os.path.isdir(path)
               else f"read_parquet('{path}')")
        # DESCRIBE probes the schema without rows (empty fixture safe).
        ts_is_long = t == "events" and any(
            r[0] == "ts" and r[1] == "BIGINT"
            for r in con.execute(f"DESCRIBE SELECT ts FROM {src}").fetchall())
        if ts_is_long:
            # old fixture layout: ts stored as raw ns-long (ScaleGen round-trip
            # of the INT64 TIMESTAMP(NANOS) files); truncate to us like Spark
            con.execute(f"CREATE VIEW {t} AS SELECT * REPLACE "
                        f"(make_timestamp(ts // 1000) AS ts) FROM {src}")
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    reps = int(os.environ.get("DUCK_BENCH_REPS", "3"))
    for name in names:
        sql = oracles[name]
        best = None
        for _ in range(reps):
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name:20s} {best:.3f} s")


if __name__ == "__main__":
    main()

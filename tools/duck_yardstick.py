#!/usr/bin/env python3
"""Same-moment DuckDB yardstick for graft.Bench (VERDICT r16 item 1).

BENCH_r16 inflated ~1.8x across every query INCLUDING the untouched micro
control, and the only exculpatory evidence (a pinned-binary replay) was
timed at a different moment — the round record could not adjudicate
itself. This script is the in-artifact fix: graft.Bench shells out to it
right after timing the batch set, so every BENCH_r*.json carries a
same-minute measurement of FIXED, code-independent work in a second
engine. If the engine numbers inflate together with this yardstick, the
box was slow; if the engine inflates alone, the code regressed.

The three queries are FROZEN — never edit them, or the round-over-round
ratios stop adjudicating. They cover the three cost shapes the batch set
exercises: scan+hash-agg, hash join+agg, partitioned window sort.

Usage: duck_yardstick.py SF_DIR      (prints ONE JSON line on stdout)
"""
import json
import os
import sys
import time

import duckdb

QUERIES = {
    "y_agg": (
        "SELECT l_returnflag, l_linestatus, sum(l_quantity), "
        "sum(l_extendedprice), avg(l_discount), count(*) "
        "FROM lineitem GROUP BY 1, 2"
    ),
    "y_join": (
        "SELECT c_mktsegment, count(*), sum(o_totalprice) "
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1"
    ),
    "y_window": (
        "SELECT max(r) FROM (SELECT row_number() OVER "
        "(PARTITION BY l_orderkey % 1024 ORDER BY l_extendedprice) AS r "
        "FROM lineitem)"
    ),
    # the heavy CPU gauge (~1 s at sf0.1): wide hash-distinct + row hash,
    # the cost shape most sensitive to co-tenant CPU pressure
    "y_distinct": (
        "SELECT count(DISTINCT l_partkey * 131071 + l_suppkey), "
        "sum(hash(l_orderkey, l_linenumber)) FROM lineitem"
    ),
}


def main():
    sf_dir = sys.argv[1]
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in ("lineitem", "orders", "customer"):
        path = os.path.join(sf_dir, f"{t}.parquet")
        src = (f"read_parquet('{path}/*.parquet')" if os.path.isdir(path)
               else f"read_parquet('{path}')")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    out = {}
    for name, sql in QUERIES.items():
        best = None
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    out["total"] = round(sum(out.values()), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

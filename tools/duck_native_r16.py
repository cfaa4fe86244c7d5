#!/usr/bin/env python3
"""r16 sf100 NATIVE-DuckDB baselines — the idiomatic spellings a DuckDB
user would run, as a fairness complement to the declared differential
oracles (which are written for bit-exactness, not speed: q_quantile's
oracle cross-joins 600M rows x 6 quantiles and took 1707 s at sf100).

- q_quantile native: quantile_cont with the q-list per group (computes
  the 'linear' interpolation only - 1 of the engine's 5 columns).
- q_rank native: the oracle's own window spelling (that IS idiomatic),
  wrapped in count+hash-sum so the 100M-row result is consumed inside
  DuckDB rather than fetched into Python (mirrors the engine's noop sink:
  full compute, no external materialization).

Usage: duck_native_r16.py SF_DIR [reps]
"""
import json, sys, time
import duckdb

sf = sys.argv[1]
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
con = duckdb.connect()
con.execute("SET threads TO 32")
con.execute("SET TimeZone='UTC'")
con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf}/lineitem.parquet/*.parquet')")
con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet/*.parquet')")

QUANTILE_NATIVE = """
SELECT l_returnflag, l_linestatus,
       quantile_cont(l_quantity, [0.0, 0.25, 0.5, 0.513, 0.75, 1.0]) qs
FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2
"""

oracles = json.load(open('/root/repo/tmp/r16_out_sf100/oracle_sql.json'))
RANK_NATIVE = ("SELECT count(*) c, sum(hash(event_id, r_avg, r_min, r_max, "
               "r_dense, r_first, r_pct, r_na_keep, r_na_bottom, r_desc)) h "
               f"FROM ({oracles['q_rank']}) t")

for name, sql in [("q_quantile_native", QUANTILE_NATIVE),
                  ("q_rank_native", RANK_NATIVE)]:
    best = None
    for _ in range(reps):
        t0 = time.time()
        con.execute(sql).fetchall()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:20s} {best:.3f} s")

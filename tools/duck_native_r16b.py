#!/usr/bin/env python3
"""r16 sf100 NATIVE-DuckDB baselines for the events-family headliners —
the idiomatic spellings a DuckDB user would run, as the fairness
complement to the declared differential oracles (same convention as
duck_native_r16.py; results consumed inside DuckDB by count+hash-sum,
mirroring the engine's noop sink: full compute, no external
materialization).

- q_asof native: DuckDB's own ASOF JOIN operator (the declared oracle
  spells the match with an IGNORE-NULLS window over a union for
  bit-exactness; ASOF JOIN is what a user would write).
- q_cumsum / q_session_window native: the declared oracle SQL IS the
  idiomatic window/gaps-and-islands spelling - reuse it verbatim from a
  Verify dump's oracle_sql.json, consumed in-DB.

Usage: duck_native_r16b.py SF_DIR ORACLE_JSON [reps] [only ...]
  `only`: run just the named natives (suffix-matched, e.g. asof session)
"""
import json, sys, time
import duckdb

sf = sys.argv[1]
oracle_json = sys.argv[2]
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
only = set(sys.argv[4:])
con = duckdb.connect()
con.execute("SET threads TO 32")
con.execute("SET TimeZone='UTC'")
con.execute(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf}/events.parquet/*.parquet')")

ASOF_NATIVE = """
SELECT count(*) c, sum(hash(p.event_id, p.user_id, p.value, c.value)) h
FROM (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""

oracles = json.load(open(oracle_json))
CUMSUM_NATIVE = ("SELECT count(*) c, sum(hash(event_id, user_id, cs_all, "
                 "cs_skipna, cs_noskip)) h "
                 f"FROM ({oracles['q_cumsum']}) t")
# same consume-in-DB shape as the other natives: one combined
# multi-arg row hash with the h alias (ADVICE r16 — COLUMNS(*)
# expanded to one sum per column, a different work shape)
SESSION_NATIVE = ("SELECT count(*) c, sum(hash(user_id, session_start, n, sum_value)) h "
                  f"FROM ({oracles['q_session_window']}) t")
RANK_NATIVE = ("SELECT count(*) c, sum(hash(event_id, r_avg, r_min, r_max, "
               "r_dense, r_first, r_pct, r_na_keep, r_na_bottom, r_desc)) h "
               f"FROM ({oracles['q_rank']}) t")

for name, sql in [("q_asof_native", ASOF_NATIVE),
                  ("q_cumsum_native", CUMSUM_NATIVE),
                  ("q_session_native", SESSION_NATIVE),
                  ("q_rank_native", RANK_NATIVE)]:
    if only and not any(o in name for o in only):
        continue
    best = None
    for _ in range(reps):
        t0 = time.time()
        con.execute(sql).fetchall()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        print(f"  [{name} rep {dt:.3f} s]", file=sys.stderr)
    print(f"{name:20s} {best:.3f} s")

#!/usr/bin/env python3
"""Local differential harness mimicking the driver's correctness gate:
runs each oracle SQL in DuckDB over the fixture parquet tables and compares
against the Spark results dumped by `graft.Verify` (sorted columns, sorted
rows, exact equality; near-miss detection to separate float jitter from
logic bugs).

Usage: check_oracle.py SF_DIR OUT_DIR [query ...]
"""
import json, sys, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name, spark_df, oracle_df):
    errs = []
    sc, oc = set(spark_df.columns), set(oracle_df.columns)
    if sc != oc:
        return [f"columns differ: spark-only={sorted(sc-oc)} oracle-only={sorted(oc-sc)}"]
    if len(spark_df) != len(oracle_df):
        errs.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
        return errs
    s, o = norm(spark_df), norm(oracle_df)
    for c in s.columns:
        a, b = s[c], o[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            av, bv = a.astype(float).values, b.astype(float).values
            both_nan = np.isnan(av) & np.isnan(bv)
            eq = (av == bv) | both_nan
            if not eq.all():
                close = np.isclose(av, bv, rtol=1e-9, atol=1e-12, equal_nan=True)
                n_bad, n_far = (~eq).sum(), (~close).sum()
                idx = np.where(~eq)[0][:3]
                errs.append(f"col {c}: {n_bad} unequal ({n_far} beyond 1e-9) "
                            f"e.g. {[(av[i], bv[i]) for i in idx]}")
        else:
            try:
                eq = (a.values == b.values) | (pd.isna(a).values & pd.isna(b).values)
            except Exception as e:
                errs.append(f"col {c}: compare error {e} (dtypes {a.dtype}/{b.dtype})")
                continue
            if not eq.all():
                idx = np.where(~eq)[0][:3]
                errs.append(f"col {c}: {(~eq).sum()} unequal "
                            f"e.g. {[(a.values[i], b.values[i]) for i in idx]}")
    return errs


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    import os
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Table-subset fixtures (ScaleGen's 4th arg, e.g. the lineitem-only
        # sf100 probe) ship only the tables their queries read — skip the
        # rest so their views simply don't exist (queries touching them
        # would fail loudly at SQL time).
        if not os.path.exists(path):
            # leave a trace so sweep logs distinguish an intentional
            # table-subset fixture from a broken one (ADVICE r15)
            print(f"[skip] table {t} missing in {sf_dir}", file=sys.stderr)
            continue
        # ScaleGen-produced SFs are directories of part files; the
        # driver-generated fixtures are single files. events written by
        src = f"read_parquet('{path}/*.parquet')" if os.path.isdir(path) \
          else f"read_parquet('{path}')"
        # Old-layout ScaleGen dirs carry ts as a raw ns BIGINT (the
        # nanosAsLong round trip) — rebuild the TIMESTAMP then; new-layout
        # fixtures already expose TIMESTAMP(MICROS) and pass through.
        # Probe the schema, not a row: DESCRIBE works on empty fixtures
        # where `SELECT typeof(ts) ... LIMIT 1` would fetchone() -> None.
        ts_is_long = t == "events" and any(
            r[0] == "ts" and r[1] == "BIGINT"
            for r in con.execute(f"DESCRIBE SELECT ts FROM {src}").fetchall())
        if ts_is_long:
            con.execute(f"CREATE VIEW {t} AS SELECT * REPLACE "
                        f"(make_timestamp(ts // 1000) AS ts) FROM {src}")
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            rel = con.sql(sql)
            # DuckDB sum(BIGINT) returns HUGEINT, which the driver's hasher
            # renders differently from Spark's LONG even when values are
            # identical (r8: q_attribution, q_audio_meta). Make the class
            # of bug unexpressible: any 128-bit column in a declared oracle
            # is a hard failure — cast it in the SQL.
            huge = [c for c, t in zip(rel.columns, map(str, rel.types))
                    if t in ("HUGEINT", "UHUGEINT")]
            if huge:
                print(f"FAIL {name}: oracle columns {huge} are "
                      f"HUGEINT/UHUGEINT — add CAST(... AS BIGINT)")
                n_fail += 1
                continue
            oracle_df = rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        errs = compare(name, spark_df, oracle_df)
        if errs:
            print(f"FAIL {name} ({len(spark_df)} rows):")
            for e in errs:
                print(f"    {e}")
            n_fail += 1
        else:
            print(f"OK   {name} ({len(spark_df)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

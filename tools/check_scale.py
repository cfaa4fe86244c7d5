#!/usr/bin/env python3
"""Scale-sweep differential check: exact, order-independent comparison of
a Spark result dump against its DuckDB oracle WITHOUT materializing either
side in pandas — at sf10 the similarity-family outputs are tens of millions
of pair rows, far past what check_oracle.py's DataFrame compare holds in
memory. Both sides are reduced inside DuckDB to
(row_count, sum(hash(cols)), xor-free dual checksum) over column-name-sorted
rows; equal multisets of rows give equal reductions, and a single changed
value changes the 128-bit combined checksum with overwhelming probability.

Float columns participate bitwise (no rounding): every oracle-paired query
in this repo engineers its doubles to be bit-identical across engines
(integer-exact accumulation, shared final formula), so a checksum mismatch
is a real divergence, not jitter. If a future query needs tolerance, use
check_oracle.py on a bounded sample instead.

Usage: check_scale.py SF_DIR OUT_DIR query [query ...]
"""
import json, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def make_views(con, sf_dir):
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(path):
            continue
        src = (f"read_parquet('{path}/*.parquet')" if os.path.isdir(path)
               else f"read_parquet('{path}')")
        ts_is_long = t == "events" and any(
            r[0] == "ts" and r[1] == "BIGINT"
            for r in con.execute(f"DESCRIBE SELECT ts FROM {src}").fetchall())
        if ts_is_long:
            con.execute(f"CREATE VIEW {t} AS SELECT * REPLACE "
                        f"(make_timestamp(ts // 1000) AS ts) FROM {src}")
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")


def reduce_rel(con, rel_sql, cols):
    # hash() each name-sorted row, then combine order-independently with
    # two moduli so collisions would have to align in both residues
    cols_sorted = ", ".join(f'"{c}"' for c in sorted(cols))
    q = (f"SELECT count(*), "
         f"sum(hash({cols_sorted}) % 9007199254740881), "
         f"sum(hash({cols_sorted}) % 4503599627370449) "
         f"FROM ({rel_sql})")
    return con.execute(q).fetchone()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    make_views(con, sf_dir)
    failures = 0
    for name in names:
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        scols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{spark_glob}')").fetchall()]
        # oracle column names, probed with LIMIT 0
        ocols = [d[0] for d in con.execute(
            f"SELECT * FROM ({oracles[name]}) LIMIT 0").description]
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} "
                  f"oracle={sorted(ocols)}")
            failures += 1
            continue
        s = reduce_rel(con, f"SELECT * FROM read_parquet('{spark_glob}')", scols)
        o = reduce_rel(con, oracles[name], ocols)
        if s == o:
            print(f"OK   {name} ({s[0]} rows, checksums match)")
        else:
            print(f"FAIL {name}: spark(count,sum1,sum2)={s} oracle={o}")
            failures += 1
    print(f"\n{len(names) - failures} ok, {failures} fail")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

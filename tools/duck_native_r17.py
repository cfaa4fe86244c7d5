#!/usr/bin/env python3
"""r17 contracted native-DuckDB baseline for q_neardup_lsh at the sf100
documents scale (VERDICT r16 what's-missing #3).

At 5M docs the DECLARED oracle (uncontracted: shingle all 5M docs, band
join, exact-Jaccard every candidate pair) exhausted the disk (>70 GB of
temp) and DNF'd — so the r16 row has an engine time (167 s) but no
ratio. The fair single-node baseline is the same algorithm the engine
runs (`DedupOps.contractExpand`), spelled the way a DuckDB user would:

  1. contract: group by content digest, keep min(doc_id) as the
     representative (the sf100 fixture is a x1000 replication of 5,000
     docs -> 4,992 unique texts);
  2. run the full banded MinHash pipeline over REPRESENTATIVES only
     (identical texts have identical shingle sets, so rep-level pairs
     determine all pairs);
  3. expand rep pairs to all cross-group member pairs plus all
     within-group pairs (jaccard 1.0, only for groups with a nonempty
     shingle set), consumed inside DuckDB by count + hash-sum
     (mirroring the engine's noop sink: full compute, no fetch).

Same shingling, same 16 minhash permutations, same 4x4 banding, same
0.6 threshold as the declared query (QueriesText.scala:31-33,
TextFunctions.scala:26-36).

Usage: duck_native_r17.py SF_DIR [reps]
"""
import sys
import time

import duckdb

MINHASH_AB = [
    (1299709, 104729), (15485863, 32452843), (49979687, 86028121),
    (67867967, 122949823), (160481183, 236887691), (314606869, 413158511),
    (533000389, 654188383), (776531401, 899809343),
    (1020379843, 1159512287), (1298074099, 1446236347),
    (1611623773, 1777772707), (1945898899, 2038074743),
    (104395301, 217645177), (334214459, 452930459), (575194001, 694847533),
    (817504243, 941083981)]
P32 = 4294967291
BANDS, ROWS, THRESHOLD = 4, 4, 0.6

mhs = ", ".join(
    f"min((h*{a} + {b}) % {P32}) AS mh{i}"
    for i, (a, b) in enumerate(MINHASH_AB))
band_keys = "\n      UNION ALL\n      ".join(
    "SELECT id, {b} AS band, {key} AS bkey FROM sigs".format(
        b=b, key=" || '_' || ".join(
            f"CAST(mh{b * ROWS + r} AS VARCHAR)" for r in range(ROWS)))
    for b in range(BANDS))

CONTRACTED = f"""
WITH ids AS (SELECT doc_id, md5(text) AS d FROM documents),
g AS (SELECT d, min(doc_id) AS rep, count(*) AS n FROM ids GROUP BY d),
m AS (SELECT ids.doc_id AS mid, g.rep FROM ids JOIN g USING (d)),
reps AS (SELECT doc_id AS id, text FROM documents
         WHERE doc_id IN (SELECT rep FROM g)),
-- rep-level pipeline: identical to the declared oracle, corpus = reps
w AS (SELECT id, string_split(text, ' ') ws FROM reps),
sh AS (SELECT id, unnest(list_transform(range(1, greatest(len(ws)-2,1)+1),
             i -> ws[CAST(i AS INT)] || ' ' || COALESCE(ws[CAST(i AS INT)+1],'')
                  || ' ' || COALESCE(ws[CAST(i AS INT)+2],''))) s FROM w),
h AS (SELECT DISTINCT id, ('0x'||substr(md5(s),1,8))::BIGINT h FROM sh),
sigs AS (SELECT id, {mhs} FROM h GROUP BY id),
banded AS (
  {band_keys}),
cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
         FROM banded x JOIN banded y
           ON x.band = y.band AND x.bkey = y.bkey AND x.id < y.id),
sz AS (SELECT id, count(*) AS sz FROM h GROUP BY id),
inter AS (SELECT id_a, id_b, count(*) AS inter
          FROM cand JOIN h sa ON id_a = sa.id
                    JOIN h sb ON id_b = sb.id AND sa.h = sb.h
          GROUP BY id_a, id_b),
jr AS (SELECT cand.id_a, cand.id_b, COALESCE(inter, 0) AS inter,
              x.sz AS sz_a, y.sz AS sz_b,
              CAST(COALESCE(inter, 0) AS DOUBLE) /
                CAST(x.sz + y.sz - COALESCE(inter, 0) AS DOUBLE) AS jaccard
       FROM cand LEFT JOIN inter USING (id_a, id_b)
                 JOIN sz x ON cand.id_a = x.id
                 JOIN sz y ON cand.id_b = y.id
       WHERE CAST(COALESCE(inter, 0) AS DOUBLE) /
             CAST(x.sz + y.sz - COALESCE(inter, 0) AS DOUBLE) >= {THRESHOLD}),
-- expansion: cross-group member pairs (oriented, sizes swapped with the
-- orientation) plus within-group pairs (jaccard 1, nonempty shingle set)
expanded AS (
  SELECT least(ma.mid, mb.mid) AS id_a, greatest(ma.mid, mb.mid) AS id_b,
         inter,
         CASE WHEN ma.mid < mb.mid THEN sz_a ELSE sz_b END AS sz_a,
         CASE WHEN ma.mid < mb.mid THEN sz_b ELSE sz_a END AS sz_b,
         jaccard
  FROM jr JOIN m ma ON jr.id_a = ma.rep
          JOIN m mb ON jr.id_b = mb.rep
  UNION ALL
  SELECT x.mid, y.mid, sz.sz, sz.sz, sz.sz, 1.0
  FROM m x JOIN m y ON x.rep = y.rep AND x.mid < y.mid
           JOIN sz ON x.rep = sz.id)
SELECT count(*) c, sum(hash(id_a, id_b, inter, sz_a, sz_b, jaccard)) h
FROM expanded
"""


def main():
    sf = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    import os
    path = f"{sf}/documents.parquet"
    src = (f"read_parquet('{path}/*.parquet')" if os.path.isdir(path)
           else f"read_parquet('{path}')")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM {src}")
    best = None
    for _ in range(reps):
        t0 = time.time()
        rows = con.execute(CONTRACTED).fetchall()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        print(f"q_neardup_lsh_contracted_native {dt:.1f} s  rows={rows}")
    print(f"best {best:.1f} s")


if __name__ == "__main__":
    main()

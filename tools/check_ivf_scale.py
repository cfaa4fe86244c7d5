#!/usr/bin/env python3
"""Scale check for q_ivf_recall that takes the ENGINE-TRAINED centroids as
input (r11 verdict item 5).

The declared oracle replays the KmIters Lloyd iterations relationally
(one unnest join per step); at sf1 that builds ~4B intermediate rows and
DuckDB DNFs, while the engine side runs without incident. Training
single-step equivalence is already oracle-verified (q_kmeans_iter), so
this harness verifies only what is NEW in q_ivf_recall — assignment,
probing, exact-rerank recall against brute force — over the trained
codebook the engine dumped (graft.IvfCentroids). The codebook is exact
integer arithmetic end to end (array<bigint>), so handing it across
engines loses nothing; all cosines below are integer-valued-double dots
with the identical final formula, hence bit-exact.

Usage:
  sbt "runMain graft.IvfCentroids SF_DIR CENT_DIR"
  sbt "runMain graft.Verify SF_DIR OUT_DIR q_ivf_recall"
  check_ivf_scale.py SF_DIR OUT_DIR CENT_DIR
"""
import os
import sys

import duckdb

QUERY_MOD = 20
K = 3
IVF_MOD, IVF_REM = 40, 7
NPROBE = 3
H1, H2 = 9007199254740881, 4503599627370449
COLS = '"hits_seed", "hits_trained", "query_id", "recall_seed", "recall_trained"'

SQL = """
WITH e AS (SELECT vec_id,
                  list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE)*1000) AS DOUBLE)) v
           FROM read_parquet('{emb}')),
n AS (SELECT vec_id, list_dot_product(v, v) n2 FROM e),
-- exact brute-force top-K per query
x AS (SELECT q.vec_id qid, c.vec_id nid,
             list_dot_product(q.v, c.v) / sqrt(nq.n2 * nc.n2) cos_sim
      FROM e q JOIN e c ON q.vec_id <> c.vec_id
      JOIN n nq ON q.vec_id = nq.vec_id JOIN n nc ON c.vec_id = nc.vec_id
      WHERE q.vec_id % {qmod} = 0),
ex AS (SELECT qid query_id, nid neighbor_id FROM (
         SELECT qid, nid, row_number() OVER (PARTITION BY qid
                  ORDER BY cos_sim DESC, nid) rk FROM x) WHERE rk <= {k}),
-- the two codebooks: raw subsample seeds, engine-trained (INPUT)
seedc AS (SELECT vec_id cid, v cv, list_dot_product(v, v) cn2
          FROM e WHERE vec_id % {imod} = {irem}),
trainc AS (SELECT cid,
                  list_transform(centv, x -> CAST(x AS DOUBLE)) cv
           FROM read_parquet('{cent}')),
trainc2 AS (SELECT cid, cv, list_dot_product(cv, cv) cn2 FROM trainc),
-- seed-arm assignment/probe/rerank
sr AS (SELECT e.vec_id, s.cid,
              row_number() OVER (PARTITION BY e.vec_id
                ORDER BY list_dot_product(e.v, s.cv) / sqrt(n.n2 * s.cn2)
                         DESC, s.cid) crn
       FROM e JOIN n ON e.vec_id = n.vec_id, seedc s),
scand AS (SELECT q.vec_id qid, c.vec_id nid
          FROM (SELECT vec_id, cid FROM sr
                WHERE crn <= {nprobe} AND vec_id % {qmod} = 0) q
          JOIN (SELECT vec_id, cid FROM sr WHERE crn = 1) c
            ON q.cid = c.cid AND q.vec_id <> c.vec_id),
ss AS (SELECT DISTINCT qid, nid FROM scand),
sx AS (SELECT s.qid, s.nid,
              list_dot_product(a.v, b.v) / sqrt(na.n2 * nb.n2) cos_sim
       FROM ss s JOIN e a ON s.qid = a.vec_id JOIN e b ON s.nid = b.vec_id
       JOIN n na ON s.qid = na.vec_id JOIN n nb ON s.nid = nb.vec_id),
sap AS (SELECT qid query_id, nid neighbor_id FROM (
          SELECT qid, nid, row_number() OVER (PARTITION BY qid
                   ORDER BY cos_sim DESC, nid) rk FROM sx) WHERE rk <= {k}),
shits AS (SELECT query_id, count(*) h FROM ex
          JOIN sap USING (query_id, neighbor_id) GROUP BY 1),
-- trained-arm assignment/probe/rerank (same machinery, input codebook)
tr AS (SELECT e.vec_id, t.cid,
              row_number() OVER (PARTITION BY e.vec_id
                ORDER BY list_dot_product(e.v, t.cv) / sqrt(n.n2 * t.cn2)
                         DESC, t.cid) crn
       FROM e JOIN n ON e.vec_id = n.vec_id, trainc2 t),
tcand AS (SELECT q.vec_id qid, c.vec_id nid
          FROM (SELECT vec_id, cid FROM tr
                WHERE crn <= {nprobe} AND vec_id % {qmod} = 0) q
          JOIN (SELECT vec_id, cid FROM tr WHERE crn = 1) c
            ON q.cid = c.cid AND q.vec_id <> c.vec_id),
tt AS (SELECT DISTINCT qid, nid FROM tcand),
tx AS (SELECT t.qid, t.nid,
              list_dot_product(a.v, b.v) / sqrt(na.n2 * nb.n2) cos_sim
       FROM tt t JOIN e a ON t.qid = a.vec_id JOIN e b ON t.nid = b.vec_id
       JOIN n na ON t.qid = na.vec_id JOIN n nb ON t.nid = nb.vec_id),
tap AS (SELECT qid query_id, nid neighbor_id FROM (
          SELECT qid, nid, row_number() OVER (PARTITION BY qid
                   ORDER BY cos_sim DESC, nid) rk FROM tx) WHERE rk <= {k}),
thits AS (SELECT query_id, count(*) h FROM ex
          JOIN tap USING (query_id, neighbor_id) GROUP BY 1),
out AS (
  SELECT e.vec_id AS query_id,
         CAST(COALESCE(sh.h, 0) AS BIGINT) AS hits_seed,
         CAST(COALESCE(th.h, 0) AS BIGINT) AS hits_trained,
         CAST(COALESCE(sh.h, 0) AS DOUBLE) / {k}.0 AS recall_seed,
         CAST(COALESCE(th.h, 0) AS DOUBLE) / {k}.0 AS recall_trained
  FROM e LEFT JOIN shits sh ON e.vec_id = sh.query_id
         LEFT JOIN thits th ON e.vec_id = th.query_id
  WHERE e.vec_id % {qmod} = 0)
SELECT count(*), sum(hash({cols}) % {h1}), sum(hash({cols}) % {h2})
FROM out
"""


def main():
    sf_dir, out_dir, cent_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    emb = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(emb):
        emb = os.path.join(emb, "*.parquet")
    cent = os.path.join(cent_dir, "ivf_centroids.parquet")
    if os.path.isdir(cent):
        cent = os.path.join(cent, "*.parquet")
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    o = con.execute(SQL.format(emb=emb, cent=cent, qmod=QUERY_MOD, k=K,
                               imod=IVF_MOD, irem=IVF_REM, nprobe=NPROBE,
                               cols=COLS, h1=H1, h2=H2)).fetchone()
    spark_glob = os.path.join(out_dir, "q_ivf_recall", "*.parquet")
    s = con.execute(
        f"SELECT count(*), sum(hash({COLS}) % {H1}), sum(hash({COLS}) % {H2}) "
        f"FROM read_parquet('{spark_glob}')").fetchone()
    if s == o:
        print(f"OK   q_ivf_recall ({s[0]} rows, checksums match)")
    else:
        print(f"FAIL q_ivf_recall: spark(count,sum1,sum2)={s} oracle={o}")
        sys.exit(1)


if __name__ == "__main__":
    main()

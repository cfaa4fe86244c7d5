#!/usr/bin/env python3
"""Full-exactness sf10 check for q_embed_topk, batched by query id.

The declared oracle unnests every embedding to (vec_id, i, x) rows and
joins query x corpus x dimension — at sf10 (10k queries x 200k vectors x
64 dims) that is ~128B intermediate rows and DuckDB DNFs. This harness
verifies the SAME query exactly by re-expressing the oracle list-natively
(list_dot_product on integer-scaled vectors, no dimension explosion) and
sweeping the query ids in NB disjoint batches, accumulating the same
order-independent dual checksum tools/check_scale.py uses.

Bit-exactness argument (mirrors the declared oracle and the engine):
elements |x| <= ~0.58 scale to integers <= ~580, so per-dimension
products <= ~3.4e5 and 64-dim dots <= ~2.2e7 — integer-valued doubles
summed exactly in any order. The final formula dot/sqrt(n2q*n2c) then
uses the identical IEEE operand values and operation sequence as both
the declared SQL oracle and SimilarityOps.cosineQ, so cos_sim is
bit-identical, not approximately equal.

Usage: check_topk_scale.py SF_DIR OUT_DIR [NB]
"""
import os
import sys

import duckdb

H1, H2 = 9007199254740881, 4503599627370449
# name-sorted columns of the q_embed_topk output, as check_scale.py sorts
COLS = '"cos_sim", "neighbor_id", "query_id", "rk"'

BATCH_SQL = """
WITH e AS (SELECT vec_id,
                  list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE)*1000) AS DOUBLE)) v
           FROM read_parquet('{emb}')),
q AS (SELECT vec_id qid, v qv FROM e
      WHERE vec_id % 20 = 0 AND (vec_id // 20) % {nb} = {b}),
c AS (SELECT vec_id nid, v cv, list_dot_product(v, v) n2 FROM e),
s AS (SELECT qid, nid,
             list_dot_product(qv, cv) / sqrt(qn2.n2 * c.n2) cos_sim
      FROM q JOIN c ON qid <> nid
      JOIN (SELECT nid id, n2 FROM c) qn2 ON qid = qn2.id),
r AS (SELECT qid query_id, nid neighbor_id, cos_sim,
             CAST(row_number() OVER (PARTITION BY qid
                    ORDER BY cos_sim DESC, nid) AS BIGINT) rk
      FROM s)
SELECT count(*),
       sum(hash({cols}) % {h1}),
       sum(hash({cols}) % {h2}),
       count(DISTINCT query_id)
FROM r WHERE rk <= 3
"""


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    nb = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    emb = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(emb):
        emb = os.path.join(emb, "*.parquet")
    con = duckdb.connect()
    con.execute("SET threads TO 32")

    n_queries = con.execute(
        f"SELECT count(*) FROM read_parquet('{emb}') WHERE vec_id % 20 = 0"
    ).fetchone()[0]

    cnt, s1, s2, qids = 0, 0, 0, 0
    for b in range(nb):
        row = con.execute(BATCH_SQL.format(
            emb=emb, nb=nb, b=b, cols=COLS, h1=H1, h2=H2)).fetchone()
        cnt += row[0]
        s1 += row[1] or 0
        s2 += row[2] or 0
        qids += row[3]
        print(f"  batch {b + 1}/{nb}: {row[0]} rows", flush=True)
    if qids != n_queries:
        print(f"FAIL coverage: batches covered {qids} of {n_queries} queries")
        sys.exit(1)

    spark_glob = os.path.join(out_dir, "q_embed_topk", "*.parquet")
    s = con.execute(
        f"SELECT count(*), sum(hash({COLS}) % {H1}), sum(hash({COLS}) % {H2}) "
        f"FROM read_parquet('{spark_glob}')").fetchone()
    if (cnt, s1, s2) == s:
        print(f"OK   q_embed_topk ({cnt} rows over {n_queries} queries, "
              f"checksums match)")
    else:
        print(f"FAIL q_embed_topk: oracle(count,sum1,sum2)={(cnt, s1, s2)} "
              f"spark={s}")
        sys.exit(1)


if __name__ == "__main__":
    main()

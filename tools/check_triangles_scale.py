#!/usr/bin/env python3
"""Contracted sf10 check for q_triangles.

The declared oracle closes wedges over the MEMBER-level near-dup graph;
the scale fixtures replicate each unique text ~10x per decade, so at
sf10 every replica family is a K~100 clique and the wedge join builds
billions of rows — DuckDB exhausts temp disk (same oracle-infeasibility
class as the r8 q_ngram_jaccard death, fixed then by contraction).

This harness contracts to FAMILY grain (one node per distinct text) and
expands per-doc triangle counts by exact combinatorics. Validity: a
doc's candidacy and Jaccard depend only on its shingle SET, identical
within a family, so the member graph is exactly the family graph blown
up with intra-family cliques. For doc d in family A (|A| = nA, neighbor
families N(A), family-level triangles through A):

  n_tri(d) = C(nA-1, 2)                      (both others in A)
           + (nA-1) * sum_{B in N(A)} nB     (one in A, one in B)
           + sum_{B in N(A)} C(nB, 2)        (both in the same B)
           + sum_{B<C in N(A), B~C} nB * nC  (family-level triangle)

Faithfulness: the family-grain candidate/Jaccard SQL is not
re-implemented — it is the DECLARED q_triangles oracle's own CTE chain
(sigs/banded/cand/inter/pairs), spliced by prefix surgery onto the
family-grain shingle block the q_stream_neardup_prod oracle already
declares (distinct-text digests). Counts are integers; the comparison
is the dual checksum of check_scale.py.

Usage: check_triangles_scale.py SF_DIR OUT_DIR
"""
import json
import os
import sys

import duckdb

H1, H2 = 9007199254740881, 4503599627370449
COLS = '"doc_id", "n_tri"'

CONTRACT_TAIL = """
    fam AS (SELECT doc_id, md5(text) AS dig FROM documents),
    fs AS (SELECT dig, CAST(count(*) AS BIGINT) AS n FROM fam GROUP BY dig),
    adj AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs),
    nbr AS (SELECT adj.a AS dig, sum(fs.n) AS s1,
                   sum(fs.n * (fs.n - 1) // 2) AS s2
            FROM adj JOIN fs ON adj.b = fs.dig GROUP BY adj.a),
    ftri AS (SELECT n1.a AS dig, sum(fb.n * fc.n) AS t
             FROM adj n1 JOIN adj n2 ON n1.a = n2.a AND n1.b < n2.b
             JOIN pairs e ON e.id_a = n1.b AND e.id_b = n2.b
             JOIN fs fb ON n1.b = fb.dig JOIN fs fc ON n2.b = fc.dig
             GROUP BY n1.a),
    perdoc AS (SELECT f.doc_id,
                      CAST((fs.n - 1) * (fs.n - 2) // 2
                           + (fs.n - 1) * COALESCE(nbr.s1, 0)
                           + COALESCE(nbr.s2, 0)
                           + COALESCE(ftri.t, 0) AS BIGINT) AS n_tri
               FROM fam f JOIN fs ON f.dig = fs.dig
               LEFT JOIN nbr ON f.dig = nbr.dig
               LEFT JOIN ftri ON f.dig = ftri.dig)
    SELECT count(*), sum(hash({cols}) % {h1}), sum(hash({cols}) % {h2})
    FROM perdoc WHERE n_tri > 0
"""


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    tri_sql = oracles["q_triangles"]
    prod_sql = oracles["q_stream_neardup_prod"]
    # family-grain shingle prefix (uo/w/sh/h over DISTINCT texts) from the
    # stream-prod oracle; candidate/Jaccard chain (sigs..pairs) verbatim
    # from the declared triangles oracle — both reference only h(id, h)
    prefix = prod_sql[prod_sql.index("WITH"):prod_sql.index("sigs AS")]
    mid = tri_sql[tri_sql.index("sigs AS"):tri_sql.index("tri AS")]
    sql = (prefix + mid
           + CONTRACT_TAIL.format(cols=COLS, h1=H1, h2=H2))

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    docs = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(docs):
        docs = os.path.join(docs, "*.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{docs}')")
    o = con.execute(sql).fetchone()
    glob = os.path.join(out_dir, "q_triangles", "*.parquet")
    s = con.execute(
        f"SELECT count(*), sum(hash({COLS}) % {H1}), sum(hash({COLS}) % {H2}) "
        f"FROM read_parquet('{glob}')").fetchone()
    if o == s:
        print(f"OK   q_triangles ({s[0]} rows, checksums match)")
    else:
        print(f"FAIL q_triangles: oracle(count,s1,s2)={o} spark={s}")
        sys.exit(1)


if __name__ == "__main__":
    main()

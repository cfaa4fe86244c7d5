#!/usr/bin/env python3
"""List-native, batched sf10 oracle harness for the embedding/ANN family.

The declared oracles for these queries unnest every embedding to
(vec_id, i, x) rows and join query x corpus x dimension (and the IVF
family additionally REPLAYS Lloyd training relationally) — at sf10
(200k vectors, nlist ~ 5k) that is 10s of billions of intermediate rows
and DuckDB DNFs. Each mode here verifies the SAME query exactly by
re-expressing its oracle list-natively (list_dot_product on
integer-scaled vectors — no dimension explosion) and sweeping the outer
side in disjoint batches, accumulating the order-independent dual
checksum tools/check_scale.py uses. The IVF modes take the
ENGINE-TRAINED codebook as input (graft.IvfCentroids dump — exact
integer arrays, nothing lost across engines; training-step equivalence
is oracle-verified by q_kmeans_iter), the same device as
tools/check_ivf_scale.py.

Bit-exactness argument (mirrors the declared oracles and the engine):
elements |x| <= ~0.58 scale to integers <= ~580, so 64-dim dots are
integer-valued doubles <= ~2.2e7, summed exactly in any order; plane
signs are +-1 so plane sums are exact integers and their >0 tests are
exact; every cosine is dot/sqrt(n2a*n2b) over the identical IEEE
operand values and operation order as the declared SQL — bit-identical,
not approximately equal.

Usage: check_embed_scale.py MODE SF_DIR OUT_DIR [CENT_DIR] [NB]
  MODE in: lsh | lsh_probe | ann_recall | kmeans | neardup
           | stream_embed_neardup | ivf | ivf_probe | ivf_index
           | ivf_append | ivf_stream_append | topk | diversity
           | ivf_recall
  (ivf modes require CENT_DIR; NB = batch count, default 40)
Run each mode in a FRESH process — concurrent/back-to-back modes in one
process compound DuckDB temp-storage pressure (the sweep_oracle lesson).
"""
import hashlib
import os
import sys

import duckdb

H1, H2 = 9007199254740881, 4503599627370449
QUERY_MOD, K = 20, 3
IVF_MOD, IVF_REM, NPROBE = 40, 7, 3
ND_BANDS, ND_PLANES_PER_BAND, ND_THRESHOLD = 8, 8, 0.4
LSH_PLANES, PROBE_PLANES = 4, 8
DIM = 64


def plane_sign(p, j):
    """Mirror of SimilarityOps.planeSignLocal / the oracle's
    ('0x'||substr(md5('plane<p>_<j>'),1,8))::BIGINT % 2 * 2 - 1."""
    d = hashlib.md5(f"plane{p}_{j}".encode()).digest()
    h = (d[0] << 24) | (d[1] << 16) | (d[2] << 8) | d[3]
    return (h % 2) * 2 - 1


def plane_list(p):
    return "[" + ",".join(f"{plane_sign(p, j)}.0" for j in range(DIM)) + "]"


def bucket_expr(planes, start=0):
    terms = " + ".join(
        f"(CASE WHEN list_dot_product(v, {plane_list(start + p)}) > 0 "
        f"THEN {1 << p} ELSE 0 END)" for p in range(planes))
    return f"CAST({terms} AS BIGINT)"


def hashes_sql(cols):
    return (f"count(*), sum(hash({cols}) % {H1}), sum(hash({cols}) % {H2})")


def spark_sums(con, out_dir, name, cols):
    glob = os.path.join(out_dir, name, "*.parquet")
    return con.execute(
        f"SELECT {hashes_sql(cols)} FROM read_parquet('{glob}')").fetchone()


def verdict(name, oracle, spark):
    if tuple(oracle) == tuple(spark):
        print(f"OK   {name} ({spark[0]} rows, checksums match)")
    else:
        print(f"FAIL {name}: oracle(count,s1,s2)={tuple(oracle)} "
              f"spark={tuple(spark)}")
        sys.exit(1)


CACHE = {"dir": None, "sf_fp": "nofp", "cent_fp": "nocent"}

# Which inputs each cached intermediate derives from: a cache entry is
# only valid for the exact input files that produced it, so the
# fingerprint of those inputs is embedded in the cache FILENAME —
# regenerating the sf data or retraining the codebook changes the
# fingerprint and the stale file is simply never matched (ADVICE r13:
# a name-only key silently replayed stale intermediates across
# regenerated inputs).
CACHE_DEPS = {"asg_trained": "sf+cent"}  # default: sf only


def input_fp(*paths):
    """Fingerprint of input files: absolute path + size + mtime_ns of
    every file under each path (stat only — no content reads)."""
    h = hashlib.sha256()
    for p in paths:
        if p is None:
            continue
        p = os.path.abspath(p)
        files = ([p] if os.path.isfile(p) else
                 sorted(os.path.join(r, f)
                        for r, _, fs in os.walk(p) for f in fs))
        for f in files:
            st = os.stat(f)
            h.update(f"{f}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    return h.hexdigest()[:12]


def cache_path(name):
    fp = CACHE["sf_fp"]
    if CACHE_DEPS.get(name) == "sf+cent":
        fp = f"{fp}_{CACHE['cent_fp']}"
    return os.path.join(CACHE["dir"], f"{name}.{fp}.parquet")


def have_cache(name):
    return CACHE["dir"] and os.path.exists(cache_path(name))


def save_cache(con, table, name):
    if CACHE["dir"]:
        os.makedirs(CACHE["dir"], exist_ok=True)
        # prune superseded generations of THIS intermediate (old input
        # fingerprints are unreachable by construction and would accrete
        # multi-hundred-MB orphans per fixture regeneration)
        import glob as _glob
        # the bare '{name}.parquet' covers LEGACY un-fingerprinted entries
        # (pre-fingerprint cache dirs), which the dotted glob misses
        stale_candidates = (
            _glob.glob(os.path.join(CACHE["dir"], f"{name}.*.parquet")) +
            _glob.glob(os.path.join(CACHE["dir"], f"{name}.parquet")))
        for stale in stale_candidates:
            if os.path.abspath(stale) != os.path.abspath(cache_path(name)):
                try:
                    os.remove(stale)
                except OSError:
                    pass
        # write-then-rename: concurrent checker processes share this cache
        # (atomic publish; a reader never sees a half-written file)
        tmp = cache_path(name) + f".{os.getpid()}.tmp"
        con.execute(f"COPY {table} TO '{tmp}' (FORMAT PARQUET)")
        os.replace(tmp, cache_path(name))


def load_cache(con, table, name):
    con.execute(f"CREATE TEMP TABLE {table} AS "
                f"SELECT * FROM read_parquet('{cache_path(name)}')")


def setup(con, sf_dir):
    emb = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(emb):
        emb = os.path.join(emb, "*.parquet")
    con.execute("SET threads TO 32")
    # quantized integer-valued-double vectors + exact norms, materialized
    # once (~200 MB at sf10)
    con.execute(f"""
        CREATE TEMP TABLE ev AS
        SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE)*1000) AS DOUBLE)) v
        FROM read_parquet('{emb}')""")
    # SLIM norm table — joining a (v, n2)-wide norm table attached extra
    # vector-list copies to every scored row and the window materialization
    # OOM-killed the process at sf10 (67 GB RSS); norms join slim, vectors
    # come only from ev where the dot needs them
    con.execute("""
        CREATE TEMP TABLE evn AS
        SELECT vec_id, list_dot_product(v, v) n2 FROM ev""")
    # spill instead of dying: the OOM killer took the first sf10 attempt
    con.execute("SET memory_limit = '40GB'")


def acc(con, sql, into):
    row = con.execute(sql).fetchone()
    into[0] += row[0]
    into[1] += row[1] or 0
    into[2] += row[2] or 0


def topk_from_cand(cand_sql, cols, k=K):
    """Wrap a (qid, nid) candidate SQL with the shared exact-rerank +
    per-query top-k tail every ANN oracle uses (dot/sqrt over exact
    integer-valued doubles; rank by cos DESC, nid)."""
    return f"""
    WITH cand AS ({cand_sql}),
    s AS (SELECT cand.qid, cand.nid,
                 list_dot_product(a.v, b.v) / sqrt(na.n2 * nb.n2) cos_sim
          FROM cand JOIN ev a ON cand.qid = a.vec_id
                    JOIN ev b ON cand.nid = b.vec_id
                    JOIN evn na ON cand.qid = na.vec_id
                    JOIN evn nb ON cand.nid = nb.vec_id),
    r AS (SELECT qid query_id, nid neighbor_id, cos_sim,
                 CAST(row_number() OVER (PARTITION BY qid
                        ORDER BY cos_sim DESC, nid) AS BIGINT) rk
          FROM s)
    SELECT {hashes_sql(cols)} FROM r WHERE rk <= {k}"""


def mode_lsh(con, out_dir, nb, planes, name, probe):
    cols = '"cos_sim", "neighbor_id", "query_id", "rk"'
    con.execute(f"""
        CREATE TEMP TABLE bk AS
        SELECT vec_id, {bucket_expr(planes)} bucket FROM ev""")
    sums = [0, 0, 0]
    for b in range(nb):
        if probe:
            cond = ("bit_count(xor(qb.bucket, cb.bucket)) <= 1 "
                    "AND qb.vec_id <> cb.vec_id")
        else:
            cond = "qb.bucket = cb.bucket AND qb.vec_id <> cb.vec_id"
        cand = f"""
            SELECT qb.vec_id qid, cb.vec_id nid
            FROM bk qb JOIN bk cb ON {cond}
            WHERE qb.vec_id % {QUERY_MOD} = 0
              AND (qb.vec_id // {QUERY_MOD}) % {nb} = {b}"""
        acc(con, topk_from_cand(cand, cols), sums)
        print(f"  batch {b + 1}/{nb}: cum {sums[0]} rows", flush=True)
    verdict(name, sums, spark_sums(con, out_dir, name, cols))


def build_exact_topk(con, nb):
    """Brute-force exact top-K per query into temp table ex(query_id,
    neighbor_id, cos_sim, rk) — the r10 check_topk_scale computation,
    shared by the topk/ann_recall/ivf_recall modes via the parquet cache
    (computing it once instead of once per mode; ~2B dots at sf10).
    Join orientation matters in DuckDB: the SMALL (batched query) side
    must be listed FIRST — flipping it serializes the nested-loop join
    to one thread (measured 7x slower at sf10)."""
    if have_cache("ex3"):
        load_cache(con, "ex", "ex3")
        print("  exact top-k loaded from cache", flush=True)
        return
    con.execute("CREATE TEMP TABLE ex (query_id BIGINT, neighbor_id BIGINT,"
                " cos_sim DOUBLE, rk BIGINT)")
    for b in range(nb):
        # the r10-proven batch shape: norms ride the per-side projections
        # (no extra norm JOINs multiplying list payloads through the join)
        con.execute(f"""
            INSERT INTO ex
            WITH c AS (SELECT e.vec_id nid, e.v cv, n.n2 cn2
                       FROM ev e JOIN evn n USING (vec_id)),
            q AS (SELECT e.vec_id qid, e.v qv, n.n2 qn2
                  FROM ev e JOIN evn n USING (vec_id)
                  WHERE e.vec_id % {QUERY_MOD} = 0
                    AND (e.vec_id // {QUERY_MOD}) % {nb} = {b}),
            s AS (SELECT qid, nid,
                         list_dot_product(qv, cv) / sqrt(qn2 * cn2) cos_sim
                  FROM q JOIN c ON qid <> nid)
            SELECT qid, nid, cos_sim,
                   CAST(row_number() OVER (PARTITION BY qid
                     ORDER BY cos_sim DESC, nid) AS BIGINT) rk
            FROM s QUALIFY rk <= {K}""")
        print(f"  exact batch {b + 1}/{nb}", flush=True)
    save_cache(con, "ex", "ex3")


def mode_topk(con, out_dir, nb):
    cols = '"cos_sim", "neighbor_id", "query_id", "rk"'
    build_exact_topk(con, nb)
    o = con.execute(f"""
        SELECT {hashes_sql(cols)} FROM
        (SELECT query_id, rk, neighbor_id, cos_sim FROM ex)""").fetchone()
    verdict("q_embed_topk", o, spark_sums(con, out_dir, "q_embed_topk", cols))


def mode_ann_recall(con, out_dir, nb):
    cols = '"hits", "query_id", "recall"'
    build_exact_topk(con, nb)
    con.execute(f"""
        CREATE TEMP TABLE bk AS
        SELECT vec_id, {bucket_expr(PROBE_PLANES)} bucket FROM ev""")
    con.execute("CREATE TEMP TABLE ap (query_id BIGINT, neighbor_id BIGINT)")
    for b in range(nb):
        con.execute(f"""
            INSERT INTO ap
            WITH cand AS (SELECT qb.vec_id qid, cb.vec_id nid
                          FROM bk qb JOIN bk cb
                            ON bit_count(xor(qb.bucket, cb.bucket)) <= 1
                           AND qb.vec_id <> cb.vec_id
                          WHERE qb.vec_id % {QUERY_MOD} = 0
                            AND (qb.vec_id // {QUERY_MOD}) % {nb} = {b}),
            s AS (SELECT cand.qid, cand.nid,
                         list_dot_product(a.v, b2.v) / sqrt(na.n2 * nb2.n2) cos_sim
                  FROM cand JOIN ev a ON cand.qid = a.vec_id
                            JOIN ev b2 ON cand.nid = b2.vec_id
                            JOIN evn na ON cand.qid = na.vec_id
                            JOIN evn nb2 ON cand.nid = nb2.vec_id)
            SELECT qid, nid FROM (
              SELECT qid, nid, row_number() OVER (PARTITION BY qid
                       ORDER BY cos_sim DESC, nid) rk FROM s)
            WHERE rk <= {K}""")
        print(f"  probe batch {b + 1}/{nb}", flush=True)
    o = con.execute(f"""
        WITH hits AS (SELECT query_id, count(*) h
                      FROM ex JOIN ap USING (query_id, neighbor_id)
                      GROUP BY 1),
        out AS (SELECT e.vec_id query_id,
                       CAST(COALESCE(h, 0) AS BIGINT) hits,
                       CAST(COALESCE(h, 0) AS DOUBLE) / {K}.0 recall
                FROM ev e LEFT JOIN hits ON e.vec_id = hits.query_id
                WHERE e.vec_id % {QUERY_MOD} = 0)
        SELECT {hashes_sql(cols)} FROM out""").fetchone()
    verdict("q_ann_recall", o, spark_sums(con, out_dir, "q_ann_recall", cols))


def build_assign(con, nb, cent_table, out_table, cache_name):
    """Nearest-centroid assignment (crn <= max_crn) of every vector
    against cent_table(cid, cv, cn2), batched by vec_id — the oracle's
    row_number(PARTITION BY vec_id ORDER BY ccs DESC, cid) with its
    zero-norm NULL guard."""
    # always computed to crn <= 3 (the superset every consumer filters
    # from), cached under a name that identifies the CENTROID SET — the
    # first cut keyed the cache by the temp-table name, so the kmeans
    # seed assignment poisoned the trained-codebook modes' cache
    if have_cache(cache_name):
        load_cache(con, out_table, cache_name)
        print(f"  assign[{out_table}] loaded from cache {cache_name}",
              flush=True)
        return
    con.execute(f"CREATE TEMP TABLE {out_table} "
                "(vec_id BIGINT, cid BIGINT, ccs DOUBLE, crn BIGINT)")
    # centroid side FIRST (small), batched corpus side SECOND: DuckDB
    # parallelizes the nested-loop over the right side's morsels, so the
    # right side must be the big one; a handful of large batches beats
    # many small ones (each right slice needs >~50k rows to fill 32
    # threads)
    anb = max(nb // 2, 20)
    for b in range(anb):
        con.execute(f"""
            INSERT INTO {out_table}
            WITH ew AS (SELECT e.vec_id, e.v, n.n2
                        FROM ev e JOIN evn n USING (vec_id)
                        WHERE e.vec_id % {anb} = {b}),
            s AS (SELECT e.vec_id, c.cid,
                         CASE WHEN e.n2 = 0 OR c.cn2 = 0 THEN NULL
                              ELSE list_dot_product(e.v, c.cv)
                                   / sqrt(e.n2 * c.cn2) END ccs
                       FROM {cent_table} c, ew e)
            SELECT vec_id, cid, ccs, crn FROM (
              SELECT vec_id, cid, ccs, row_number() OVER (PARTITION BY vec_id
                       ORDER BY ccs DESC, cid) crn FROM s)
            WHERE crn <= 3""")
        print(f"  assign[{out_table}] batch {b + 1}/{anb}", flush=True)
    save_cache(con, out_table, cache_name)


def load_trained(con, cent_dir):
    cent = os.path.join(cent_dir, "ivf_centroids.parquet")
    if os.path.isdir(cent):
        cent = os.path.join(cent, "*.parquet")
    con.execute(f"""
        CREATE TEMP TABLE tc AS
        SELECT cid, list_transform(centv, x -> CAST(x AS DOUBLE)) cv
        FROM read_parquet('{cent}')""")
    con.execute("""
        CREATE TEMP TABLE tcn AS
        SELECT cid, cv, list_dot_product(cv, cv) cn2 FROM tc""")


def mode_ivf(con, out_dir, cent_dir, nb, nprobe, name):
    cols = '"cos_sim", "neighbor_id", "query_id", "rk"'
    load_trained(con, cent_dir)
    build_assign(con, nb, "tcn", "asg", "asg_trained")
    # probe: query-side top-nprobe clusters join corpus-side crn=1 lists.
    # BATCHED by query id: Lloyd on a low-diversity corpus can collapse to
    # few live clusters (sf10 measured 50), making the candidate set
    # ~|Q|*nprobe*corpus/50 ~ 120M pairs — one unbatched rerank dragged
    # 40GB+ of list payloads into spill. The probe scoring mirrors
    # ivfTopKWithCentroids/the declared oracle tail: no zero-norm guard in
    # the rerank (assignment has it).
    sums = [0, 0, 0]
    for b in range(nb):
        cand = f"""
            SELECT q.vec_id qid, c.vec_id nid
            FROM (SELECT vec_id, cid FROM asg
                  WHERE crn <= {nprobe} AND vec_id % {QUERY_MOD} = 0
                    AND (vec_id // {QUERY_MOD}) % {nb} = {b}) q
            JOIN (SELECT vec_id, cid FROM asg WHERE crn = 1) c
              ON q.cid = c.cid AND q.vec_id <> c.vec_id"""
        acc(con, topk_from_cand(cand, cols), sums)
        print(f"  ivf batch {b + 1}/{nb}: cum {sums[0]} rows", flush=True)
    verdict(name, sums, spark_sums(con, out_dir, name, cols))


def mode_ivf_recall(con, out_dir, cent_dir, nb):
    cols = ('"hits_seed", "hits_trained", "query_id", '
            '"recall_seed", "recall_trained"')
    build_exact_topk(con, nb)
    # seed codebook = raw subsample; trained = engine dump
    con.execute(f"""
        CREATE TEMP TABLE scn AS
        SELECT e.vec_id cid, e.v cv, n.n2 cn2
        FROM ev e JOIN evn n USING (vec_id)
        WHERE e.vec_id % {IVF_MOD} = {IVF_REM}""")
    load_trained(con, cent_dir)
    build_assign(con, nb, "scn", "sasg", "asg_seed")
    build_assign(con, nb, "tcn", "tasg", "asg_trained")

    def arm(asg, out):
        # batched like mode_ivf (the collapsed-cluster candidate volume)
        con.execute(f"CREATE TEMP TABLE {out} "
                    "(query_id BIGINT, neighbor_id BIGINT)")
        for b in range(nb):
            con.execute(f"""
                INSERT INTO {out}
                SELECT qid, nid FROM (
                  SELECT s.qid, s.nid, row_number() OVER (PARTITION BY s.qid
                           ORDER BY s.cos_sim DESC, s.nid) rk
                  FROM (SELECT DISTINCT cand.qid, cand.nid,
                               list_dot_product(a.v, b.v)
                                 / sqrt(na.n2 * nb.n2) cos_sim
                        FROM (SELECT q.vec_id qid, c.vec_id nid
                              FROM (SELECT vec_id, cid FROM {asg}
                                    WHERE crn <= {NPROBE}
                                      AND vec_id % {QUERY_MOD} = 0
                                      AND (vec_id // {QUERY_MOD}) % {nb} = {b}) q
                              JOIN (SELECT vec_id, cid FROM {asg}
                                    WHERE crn = 1) c
                                ON q.cid = c.cid AND q.vec_id <> c.vec_id) cand
                        JOIN ev a ON cand.qid = a.vec_id
                        JOIN ev b ON cand.nid = b.vec_id
                        JOIN evn na ON cand.qid = na.vec_id
                        JOIN evn nb ON cand.nid = nb.vec_id) s)
                WHERE rk <= {K}""")
            print(f"  {out} batch {b + 1}/{nb}", flush=True)

    arm("sasg", "sap")
    arm("tasg", "tap")
    o = con.execute(f"""
        WITH sh AS (SELECT query_id, count(*) h FROM ex
               JOIN sap USING (query_id, neighbor_id) GROUP BY 1),
        th AS (SELECT query_id, count(*) h FROM ex
               JOIN tap USING (query_id, neighbor_id) GROUP BY 1),
        out AS (SELECT e.vec_id query_id,
                       CAST(COALESCE(sh.h, 0) AS BIGINT) hits_seed,
                       CAST(COALESCE(th.h, 0) AS BIGINT) hits_trained,
                       CAST(COALESCE(sh.h, 0) AS DOUBLE) / {K}.0 recall_seed,
                       CAST(COALESCE(th.h, 0) AS DOUBLE) / {K}.0 recall_trained
                FROM ev e LEFT JOIN sh ON e.vec_id = sh.query_id
                          LEFT JOIN th ON e.vec_id = th.query_id
                WHERE e.vec_id % {QUERY_MOD} = 0)
        SELECT {hashes_sql(cols)} FROM out""").fetchone()
    verdict("q_ivf_recall", o,
            spark_sums(con, out_dir, "q_ivf_recall", cols))


def mode_kmeans(con, out_dir, nb):
    cols = '"c0", "c1", "c2", "c3", "cluster_id", "n"'
    con.execute(f"""
        CREATE TEMP TABLE scn AS
        SELECT e.vec_id cid, e.v cv, n.n2 cn2
        FROM ev e JOIN evn n USING (vec_id)
        WHERE e.vec_id % {IVF_MOD} = {IVF_REM}""")
    build_assign(con, nb, "scn", "asg", "asg_seed")
    dims = ", ".join(
        f"CAST(CAST(sum(v[{d + 1}]) AS BIGINT) AS DOUBLE) / count(*) AS c{d}"
        for d in range(4))
    o = con.execute(f"""
        WITH out AS (SELECT a.cid cluster_id, count(*) n, {dims}
                     FROM asg a JOIN ev ON a.vec_id = ev.vec_id
                     WHERE a.crn = 1
                     GROUP BY a.cid)
        SELECT {hashes_sql(cols)} FROM out""").fetchone()
    verdict("q_kmeans_iter", o,
            spark_sums(con, out_dir, "q_kmeans_iter", cols))


def mode_diversity(con, out_dir, nb):
    cols = '"centrality", "cluster_id", "n_cluster", "rk", "vec_id"'
    con.execute(f"""
        CREATE TEMP TABLE scn AS
        SELECT e.vec_id cid, e.v cv, n.n2 cn2
        FROM ev e JOIN evn n USING (vec_id)
        WHERE e.vec_id % {IVF_MOD} = {IVF_REM}""")
    build_assign(con, nb, "scn", "asg", "asg_seed")
    o = con.execute(f"""
        WITH best AS (SELECT vec_id, cid cluster_id, ccs FROM asg
                      WHERE crn = 1),
        sizes AS (SELECT cluster_id, count(*) n_cluster FROM best GROUP BY 1),
        sel AS (SELECT cluster_id, vec_id, ccs,
                       CAST(row_number() OVER (PARTITION BY cluster_id
                         ORDER BY ccs DESC, vec_id) AS BIGINT) rk
                FROM best),
        out AS (SELECT sel.cluster_id, rk, vec_id, ccs centrality, n_cluster
                FROM sel JOIN sizes USING (cluster_id) WHERE rk <= 5)
        SELECT {hashes_sql(cols)} FROM out""").fetchone()
    verdict("q_diversity_sample", o,
            spark_sums(con, out_dir, "q_diversity_sample", cols))


def mode_neardup(con, out_dir, nb, name):
    cols = '"cos_sim", "id_a", "id_b"'
    band_cols = ", ".join(
        f"{bucket_expr(ND_PLANES_PER_BAND, k * ND_PLANES_PER_BAND)} b{k}"
        for k in range(ND_BANDS))
    con.execute(f"CREATE TEMP TABLE bnd AS SELECT vec_id, {band_cols} FROM ev")
    con.execute("CREATE TEMP TABLE candu (id_a BIGINT, id_b BIGINT)")
    # per-band equi-joins (never the OR-join of the declared oracle — an
    # OR of 8 equalities plans as a nested loop), batched by id_a,
    # distinct within the batch partition (id_a-disjoint across batches)
    for b in range(nb):
        union = " UNION ".join(
            f"SELECT a.vec_id id_a, n.vec_id id_b FROM bnd a JOIN bnd n "
            f"ON a.b{k} = n.b{k} AND a.vec_id < n.vec_id "
            f"WHERE a.vec_id % {nb} = {b}" for k in range(ND_BANDS))
        con.execute(f"INSERT INTO candu {union}")
        print(f"  cand batch {b + 1}/{nb}", flush=True)
    sums = [0, 0, 0]
    for b in range(nb):
        acc(con, f"""
            WITH s AS (SELECT c.id_a, c.id_b,
                         list_dot_product(a.v, bb.v) / sqrt(na.n2 * nb2.n2) cos_sim
                       FROM candu c JOIN ev a ON c.id_a = a.vec_id
                                    JOIN ev bb ON c.id_b = bb.vec_id
                                    JOIN evn na ON c.id_a = na.vec_id
                                    JOIN evn nb2 ON c.id_b = nb2.vec_id
                       WHERE c.id_a % {nb} = {b})
            SELECT {hashes_sql(cols)} FROM s
            WHERE cos_sim >= {ND_THRESHOLD}""", sums)
        print(f"  rerank batch {b + 1}/{nb}: cum {sums[0]} rows", flush=True)
    verdict(name, sums, spark_sums(con, out_dir, name, cols))


def main():
    mode, sf_dir, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    rest = sys.argv[4:]
    cent_dir = rest[0] if rest and not rest[0].isdigit() else None
    nb = int(rest[-1]) if rest and rest[-1].isdigit() else 40
    CACHE["dir"] = os.path.join(out_dir, ".oracle_cache")
    CACHE["sf_fp"] = input_fp(sf_dir)
    if cent_dir:
        CACHE["cent_fp"] = input_fp(cent_dir)
    con = duckdb.connect()
    setup(con, sf_dir)
    if mode == "topk":
        mode_topk(con, out_dir, nb)
    elif mode == "lsh":
        mode_lsh(con, out_dir, nb, LSH_PLANES, "q_embed_lsh", probe=False)
    elif mode == "lsh_probe":
        mode_lsh(con, out_dir, nb, PROBE_PLANES, "q_embed_lsh_probe",
                 probe=True)
    elif mode == "ann_recall":
        mode_ann_recall(con, out_dir, nb)
    elif mode == "kmeans":
        mode_kmeans(con, out_dir, nb)
    elif mode == "diversity":
        mode_diversity(con, out_dir, nb)
    elif mode == "neardup":
        mode_neardup(con, out_dir, nb, "q_embed_neardup")
    elif mode == "stream_embed_neardup":
        mode_neardup(con, out_dir, nb, "q_stream_embed_neardup")
    elif mode == "ivf":
        mode_ivf(con, out_dir, cent_dir, nb, 1, "q_embed_ivf")
    elif mode == "ivf_index":
        mode_ivf(con, out_dir, cent_dir, nb, 1, "q_embed_ivf_index")
    elif mode == "ivf_append":
        # the appended index probes identically to the one-shot index
        # (frozen codebook; build+append == build-all as a posting set)
        mode_ivf(con, out_dir, cent_dir, nb, 1, "q_ivf_index_append")
    elif mode == "ivf_stream_append":
        # same invariant with the appends delivered per micro-batch
        mode_ivf(con, out_dir, cent_dir, nb, 1, "q_stream_ivf_append")
    elif mode == "ivf_probe":
        mode_ivf(con, out_dir, cent_dir, nb, NPROBE, "q_embed_ivf_probe")
    elif mode == "ivf_recall":
        mode_ivf_recall(con, out_dir, cent_dir, nb)
    else:
        print(f"unknown mode {mode}")
        sys.exit(2)


if __name__ == "__main__":
    main()

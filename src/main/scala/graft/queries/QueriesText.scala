package graft.queries

import graft.Tables
import graft.functions.TextFunctions
import graft.functions.TextFunctions._
import graft.ops.{DedupOps, Phase}
import graft.ops.Phase._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pack D1 — text analysis + deduplication over `documents` (LLM-pipeline
  * extension; BASELINE.json north_star). Everything is engine-agnostic
  * integer/string arithmetic (md5-derived hashing, replace-count tricks) so
  * the DuckDB oracles compare exactly. The fixture is synthetic word salad
  * (shared 31-word vocabulary across langs) — the language-ID heuristic is
  * structurally real (marker-scoring + argmax) but its markers are fixture
  * vocabulary, not real language profiles.
  */
object QueriesText {

  // ---- shared constants (single source of truth for Spark AND oracle) ----
  val Stopwords: Seq[String]             = Seq("the", "a", "data")
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a"), "es" -> Seq("data", "row"),
    "zh" -> Seq("table", "scan"), "de" -> Seq("query", "batch"),
    "fr" -> Seq("join", "merge"))
  /** GPT-2-style pretokenizer shape: letter runs, single digits, other
    * symbols — identical semantics in Java regex and RE2. */
  val BpeRegex = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"
  val ShingleN = 5
  val Bands    = 4
  val Rows     = 4
  val JaccardThreshold = 0.6
  val SimhashBits      = 48

  private def padded            = concat(lit(" "), col("text"), lit(" "))
  private def paddedSql         = "' ' || text || ' '"
  private def occSql(w: String) =
    s"CAST((length($paddedSql) - length(replace($paddedSql, ' $w ', ''))) / ${w.length + 2} AS BIGINT)"

  /** Token counting + stopword/quality raw stats per document. */
  def qTextStats(spark: SparkSession, dir: String): DataFrame = {
    val wc = wordCount(col("text"))
    val stops = Stopwords.map(w => occurrences(padded, s" $w ")).reduce(_ + _)
    Tables.documents(spark, dir).select(
        col("doc_id"), col("lang"),
        wc.as("wc"),
        (length(translate(col("text"), " ", "")).cast("double") / wc.cast("double")).as("avg_wlen"),
        stops.as("n_stop"),
        (stops.cast("double") / wc.cast("double")).as("stop_ratio"),
        regexp_count(col("text"), lit(BpeRegex)).cast("long").as("bpe_tokens"))
      .orderBy("doc_id")
  }

  val qTextStatsOracle: String = {
    val wc    = "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)"
    val stops = Stopwords.map(occSql).mkString("(", " + ", ")")
    s"""
    SELECT doc_id, lang, $wc AS wc,
           CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST($wc AS DOUBLE) AS avg_wlen,
           $stops AS n_stop,
           CAST($stops AS DOUBLE) / CAST($wc AS DOUBLE) AS stop_ratio,
           CAST(len(regexp_extract_all(text, '$BpeRegex')) AS BIGINT) AS bpe_tokens
    FROM documents ORDER BY doc_id"""
  }

  /** Composite quality score + bucket (length, word-shape, stopword mix). */
  def qQuality(spark: SparkSession, dir: String): DataFrame = {
    val wc    = wordCount(col("text")).cast("double")
    val awl   = length(translate(col("text"), " ", "")).cast("double") / wc
    val stopr = Stopwords.map(w => occurrences(padded, s" $w ")).reduce(_ + _)
      .cast("double") / wc
    val score = least(lit(1.0), wc / 100.0) * 0.5 +
      (lit(1.0) - least(lit(1.0), abs(awl - 4.5) / 4.5)) * 0.3 +
      least(lit(1.0), stopr * 5.0) * 0.2
    Tables.documents(spark, dir).select(
        col("doc_id"), score.as("quality"),
        when(score >= 0.7, "hi").when(score >= 0.5, "mid").otherwise("lo").as("bucket"))
      .orderBy("doc_id")
  }

  val qQualityOracle: String = {
    val wc    = "CAST(CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS DOUBLE)"
    val awl   = s"(CAST(length(replace(text, ' ', '')) AS DOUBLE) / $wc)"
    val stopr = s"(CAST(${Stopwords.map(occSql).mkString("(", " + ", ")")} AS DOUBLE) / $wc)"
    val score = s"(least(1.0, $wc / 100.0) * 0.5 + (1.0 - least(1.0, abs($awl - 4.5) / 4.5)) * 0.3 + least(1.0, $stopr * 5.0) * 0.2)"
    s"""
    SELECT doc_id, $score AS quality,
           CASE WHEN $score >= 0.7 THEN 'hi' WHEN $score >= 0.5 THEN 'mid'
                ELSE 'lo' END AS bucket
    FROM documents ORDER BY doc_id"""
  }

  /** Language-ID by marker-word scoring with deterministic argmax. */
  def qLangId(spark: SparkSession, dir: String): DataFrame = {
    val scores: Seq[(String, Column)] = LangMarkers.map { case (lg, ws) =>
      lg -> ws.map(w => occurrences(padded, s" $w ")).reduce(_ + _)
    }
    val scoreCols = scores.map { case (lg, c) => c.as(s"s_$lg") }
    val base = Tables.documents(spark, dir).select(
      col("doc_id") +: col("lang") +: scoreCols: _*)
    // argmax as a CASE chain in declaration order, first satisfied wins —
    // deterministic tie-break, mirrored textually in the oracle
    val chain = LangMarkers.map(_._1).zipWithIndex.foldLeft(when(lit(false), lit(""))) {
      case (acc, (lg, _)) =>
        val others = LangMarkers.map(_._1).filterNot(_ == lg)
        acc.when(others.map(o => col(s"s_$lg") >= col(s"s_$o")).reduce(_ && _), lit(lg))
    }
    base.select(Seq(col("doc_id"), col("lang")) ++
        LangMarkers.map { case (lg, _) => col(s"s_$lg") } :+
        chain.otherwise(lit("und")).as("lang_pred"): _*)
      .orderBy("doc_id")
  }

  val qLangIdOracle: String = {
    val scoreDefs = LangMarkers.map { case (lg, ws) =>
      s"${ws.map(occSql).mkString("(", " + ", ")")} AS s_$lg"
    }.mkString(",\n           ")
    val langs = LangMarkers.map(_._1)
    val chain = langs.map { lg =>
      val cond = langs.filterNot(_ == lg).map(o => s"s_$lg >= s_$o").mkString(" AND ")
      s"WHEN $cond THEN '$lg'"
    }.mkString("\n           ")
    s"""
    WITH s AS (SELECT doc_id, lang, $scoreDefs FROM documents)
    SELECT doc_id, lang, ${langs.map(l => s"s_$l").mkString(", ")},
           CASE $chain ELSE 'und' END AS lang_pred
    FROM s ORDER BY doc_id"""
  }

  /** Content fingerprinting: md5 digest of whitespace-normalized text plus
    * a 32-bit integer fingerprint. */
  def qFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
        col("doc_id"),
        md5(lower(translate(col("text"), " ", ""))).as("fp"),
        md5Hash32(lower(translate(col("text"), " ", ""))).as("fp_int"),
        // polynomial rolling hash over word hashes: fold (acc*31 + h) mod P32
        aggregate(split(col("text"), " "),
          lit(0L), (acc, w) => (acc * 31 + md5Hash32(w)) % lit(P32))
          .as("rolling_fp"))
      .orderBy("doc_id")

  val qFingerprintOracle: String = s"""
    SELECT doc_id, md5(lower(replace(text, ' ', ''))) AS fp,
           ('0x' || substr(md5(lower(replace(text, ' ', ''))), 1, 8))::BIGINT AS fp_int,
           list_reduce(
             list_prepend(0::BIGINT, list_transform(string_split(text, ' '),
               w -> ('0x' || substr(md5(w), 1, 8))::BIGINT)),
             (acc, h) -> (acc * 31 + h) % ${TextFunctions.P32}) AS rolling_fp
    FROM documents ORDER BY doc_id"""

  /** Exact dedup by content digest (hash-groupBy; one shuffle). */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    DedupOps.exactDedup(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("keep_id")

  val qDedupExactOracle: String = """
    SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS n_dups
    FROM documents GROUP BY md5(text) ORDER BY keep_id"""

  // shared oracle CTE: distinct (doc_id, word-3-gram-hash) pairs
  private val shingleCte: String = """
    w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
    sh AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(ws)-2,1)+1),
                 i -> ws[CAST(i AS INT)] || ' ' || COALESCE(ws[CAST(i AS INT)+1],'')
                      || ' ' || COALESCE(ws[CAST(i AS INT)+2],''))) s FROM w),
    h AS (SELECT DISTINCT doc_id AS id, ('0x'||substr(md5(s),1,8))::BIGINT h FROM sh)"""

  private def minhashExprSql(i: Int): String = {
    val (a, b) = MinhashAB(i)
    s"min((h*$a + $b) % ${TextFunctions.P32}) AS mh$i"
  }

  /** MinHash signatures (k=${MinhashAB.size} permutations over word-3-gram
    * shingle sets). */
  def qMinhashSig(spark: SparkSession, dir: String): DataFrame =
    DedupOps.minhashSignatures(
        DedupOps.wordShingleHashes(Tables.documents(spark, dir), "doc_id", "text"))
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")

  val qMinhashSigOracle: String = {
    val mhs = MinhashAB.indices.map(minhashExprSql).mkString(",\n           ")
    s"""
    WITH $shingleCte
    SELECT id AS doc_id,
           $mhs
    FROM h GROUP BY id ORDER BY doc_id"""
  }

  /** Benchmark decontamination: every 17th document plays the held-out
    * eval set; each remaining (candidate) doc reports how many of its
    * distinct word-3-gram shingles also occur in ANY benchmark doc, plus
    * the contamination ratio and flag. Broadcast semi-join against the
    * (small) benchmark gram set — see
    * [[graft.ops.DedupOps.contaminationReport]] for the scale argument. */
  def qContam(spark: SparkSession, dir: String): DataFrame =
    DedupOps.contaminationReport(Tables.documents(spark, dir), "doc_id", "text",
        col("id") % 17 === 0)
      .orderBy("doc_id")

  val qContamOracle: String = s"""
    WITH $shingleCte,
    bench AS (SELECT DISTINCT h.h FROM h WHERE id % 17 = 0),
    cand AS (SELECT * FROM h WHERE id % 17 <> 0),
    tot AS (SELECT id, count(*) AS n_grams FROM cand GROUP BY 1),
    ov AS (SELECT id, count(*) AS n_shared FROM cand JOIN bench USING (h) GROUP BY 1)
    SELECT tot.id AS doc_id, n_grams,
           CAST(COALESCE(n_shared, 0) AS BIGINT) AS n_shared,
           CAST(COALESCE(n_shared, 0) AS DOUBLE) / CAST(n_grams AS DOUBLE)
             AS contam_ratio,
           COALESCE(n_shared, 0) > 0 AS contaminated
    FROM tot LEFT JOIN ov ON tot.id = ov.id ORDER BY doc_id"""

  /** MinHash + LSH banding near-dup detection with exact-Jaccard
    * verification on candidates only (no all-pairs join). */
  def qNearDupLsh(spark: SparkSession, dir: String): DataFrame =
    DedupOps.minhashNearDupsWords(Tables.documents(spark, dir), "doc_id", "text",
        Bands, Rows, JaccardThreshold)
      .orderBy("id_a", "id_b")

  val qNearDupLshOracle: String = {
    val mhs = MinhashAB.indices.map(minhashExprSql).mkString(", ")
    val bandKeys = (0 until Bands).map { b =>
      val key = (0 until Rows).map(r => s"CAST(mh${b * Rows + r} AS VARCHAR)")
        .mkString(" || '_' || ")
      s"SELECT id, $b AS band, $key AS bkey FROM sigs"
    }.mkString("\n      UNION ALL\n      ")
    s"""
    WITH $shingleCte,
    sigs AS (SELECT id, $mhs FROM h GROUP BY id),
    banded AS (
      $bandKeys),
    cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
             FROM banded x JOIN banded y
               ON x.band = y.band AND x.bkey = y.bkey AND x.id < y.id),
    sz AS (SELECT id, count(*) AS sz FROM h GROUP BY id),
    inter AS (SELECT id_a, id_b, count(*) AS inter
              FROM cand JOIN h sa ON id_a = sa.id
                        JOIN h sb ON id_b = sb.id AND sa.h = sb.h
              GROUP BY id_a, id_b),
    j AS (SELECT cand.id_a, cand.id_b, COALESCE(inter, 0) AS inter,
                 x.sz AS sz_a, y.sz AS sz_b,
                 CAST(COALESCE(inter, 0) AS DOUBLE) /
                   CAST(x.sz + y.sz - COALESCE(inter, 0) AS DOUBLE) AS jaccard
          FROM cand LEFT JOIN inter USING (id_a, id_b)
                    JOIN sz x ON cand.id_a = x.id
                    JOIN sz y ON cand.id_b = y.id)
    SELECT * FROM j WHERE jaccard >= $JaccardThreshold ORDER BY id_a, id_b"""
  }

  /** Sources treated as "today's crawl" for the incremental-dedup query. */
  val IncomingSources = Seq("src0", "src1")

  /** Incremental dedup — new docs vs the indexed corpus: per incoming
    * document, how many near-dup matches it has in the existing corpus
    * and the best Jaccard, via the cross-side band join
    * ([[DedupOps.minhashNearDupsAgainstWords]]). The admit/reject verdict
    * a crawl-ingest pipeline computes before a new document enters the
    * lake; left join keeps clean documents in the output with n_dups=0. */
  def qDedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val inc  = docs.where(col("source").isin(IncomingSources: _*))
    val cor  = docs.where(!col("source").isin(IncomingSources: _*))
    val pairs = DedupOps.minhashNearDupsAgainstWords(
      inc, cor, "doc_id", "text", Bands, Rows, JaccardThreshold)
    inc.select(col("doc_id"))
      .join(pairs.groupBy(col("id_a").as("doc_id"))
          .agg(count(lit(1)).as("n_dups"), max("jaccard").as("best_jaccard")),
        Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_dups"))
      .withColumn("is_dup", col("n_dups") > 0)
      .orderBy("doc_id")
  }

  /** Incremental dedup through the PERSISTED LSH index — the at-rest form
    * of [[qDedupIncremental]]: the corpus postings + shingle sets are built
    * ONCE into a bucketed table ([[DedupOps.writeLshIndex]], the one-time
    * shuffle), then today's crawl probes them exchange-free on the corpus
    * side ([[DedupOps.probeLshIndex]]). Output is provably identical to the
    * in-query cross-side join — same shingles, same signatures, same
    * build-time hot-bucket cap — so this row reuses
    * [[qDedupIncrementalOracle]] verbatim and a divergence between the
    * stored index and the inline plan hash-mismatches. The index tables are
    * staged under the per-JVM temp warehouse with a unique name, the result
    * is eagerly lineage-cut (a leaf scan that no longer references the
    * catalog), and the tables are dropped before returning — the same
    * stage-then-clean shape the streaming gate uses, so the side-effecting
    * build fits the pure-query Verify contract. */
  def qEmbedLshIndex(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val inc  = docs.where(col("source").isin(IncomingSources: _*))
    val cor  = docs.where(!col("source").isin(IncomingSources: _*))
    val table = s"lsh_idx_${java.util.UUID.randomUUID().toString.take(8)}"
    // the build runs INSIDE the try: a failure between the two table
    // writes must still hit the finally's DROP TABLEs, or the partial
    // index lingers in the warehouse for the rest of the JVM
    try {
      DedupOps.writeLshIndex(cor, "doc_id", "text", Bands, Rows, table)
      val pairs = DedupOps.probeLshIndex(
        inc, "doc_id", "text", Bands, Rows, JaccardThreshold, table)
      inc.select(col("doc_id"))
        .join(pairs.groupBy(col("id_a").as("doc_id"))
            .agg(count(lit(1)).as("n_dups"), max("jaccard").as("best_jaccard")),
          Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_dups"))
        .withColumn("is_dup", col("n_dups") > 0)
        .orderBy("doc_id")
        .phaseCut // materialize before the index tables are dropped
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${table}_postings")
      spark.sql(s"DROP TABLE IF EXISTS ${table}_shingles")
      spark.sql(s"DROP TABLE IF EXISTS ${table}_capped")
    }
  }

  /** Incremental dedup through a persisted LSH index built in TWO
    * generations — the index-maintenance path (r13 verdict item 3): the
    * corpus is split by doc_id parity, generation 1 builds the index on
    * the even half ([[DedupOps.writeLshIndex]]), generation 2 APPENDS
    * the odd half ([[DedupOps.appendLshIndex]] — assign with the same
    * fixed hash family, bucket-preserving append), then today's crawl
    * probes the combined index. Because `build(A); append(B)` equals
    * `build(A ∪ B)` as a posting row set (cap never binds on the
    * fixtures), the probe output is bit-identical to q_embed_lsh_index's
    * one-shot build and this row reuses [[qDedupIncrementalOracle]]
    * verbatim — a divergence anywhere in the append path (assignment,
    * bucket layout, shingle-set append) hash-mismatches. */
  def qLshIndexAppend(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val inc  = docs.where(col("source").isin(IncomingSources: _*))
    val cor  = docs.where(!col("source").isin(IncomingSources: _*))
    val table = s"lsh_apx_${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      DedupOps.writeLshIndex(cor.where(col("doc_id") % 2 === 0),
        "doc_id", "text", Bands, Rows, table)
      DedupOps.appendLshIndex(cor.where(col("doc_id") % 2 === 1),
        "doc_id", "text", Bands, Rows, table)
      val pairs = DedupOps.probeLshIndex(
        inc, "doc_id", "text", Bands, Rows, JaccardThreshold, table)
      inc.select(col("doc_id"))
        .join(pairs.groupBy(col("id_a").as("doc_id"))
            .agg(count(lit(1)).as("n_dups"), max("jaccard").as("best_jaccard")),
          Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_dups"))
        .withColumn("is_dup", col("n_dups") > 0)
        .orderBy("doc_id")
        .phaseCut // materialize before the index tables are dropped
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${table}_postings")
      spark.sql(s"DROP TABLE IF EXISTS ${table}_shingles")
      spark.sql(s"DROP TABLE IF EXISTS ${table}_capped")
    }
  }

  val qDedupIncrementalOracle: String = {
    val mhs = MinhashAB.indices.map(minhashExprSql).mkString(", ")
    val bandKeys = (0 until Bands).map { b =>
      val key = (0 until Rows).map(r => s"CAST(mh${b * Rows + r} AS VARCHAR)")
        .mkString(" || '_' || ")
      s"SELECT id, $b AS band, $key AS bkey FROM sigs"
    }.mkString("\n      UNION ALL\n      ")
    val incList = IncomingSources.map(s => s"'$s'").mkString(", ")
    s"""
    WITH $shingleCte,
    sigs AS (SELECT id, $mhs FROM h GROUP BY id),
    banded AS (
      $bandKeys),
    src AS (SELECT doc_id, source FROM documents),
    cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
             FROM banded x JOIN banded y
               ON x.band = y.band AND x.bkey = y.bkey
             JOIN src sx ON x.id = sx.doc_id
             JOIN src sy ON y.id = sy.doc_id
             WHERE sx.source IN ($incList) AND sy.source NOT IN ($incList)),
    sz AS (SELECT id, count(*) AS sz FROM h GROUP BY id),
    inter AS (SELECT id_a, id_b, count(*) AS inter
              FROM cand JOIN h sa ON id_a = sa.id
                        JOIN h sb ON id_b = sb.id AND sa.h = sb.h
              GROUP BY id_a, id_b),
    j AS (SELECT cand.id_a, COALESCE(inter, 0) AS inter,
                 CAST(COALESCE(inter, 0) AS DOUBLE) /
                   CAST(x.sz + y.sz - COALESCE(inter, 0) AS DOUBLE) AS jaccard
          FROM cand LEFT JOIN inter USING (id_a, id_b)
                    JOIN sz x ON cand.id_a = x.id
                    JOIN sz y ON cand.id_b = y.id),
    m AS (SELECT id_a, count(*) AS n_dups, max(jaccard) AS best_jaccard
          FROM j WHERE jaccard >= $JaccardThreshold GROUP BY 1)
    SELECT d.doc_id, CAST(COALESCE(n_dups, 0) AS BIGINT) AS n_dups,
           best_jaccard,
           COALESCE(n_dups, 0) > 0 AS is_dup
    FROM documents d LEFT JOIN m ON d.doc_id = m.id_a
    WHERE d.source IN ($incList) ORDER BY d.doc_id"""
  }

  /** Exact n-gram Jaccard near-dup pairs (no MinHash approximation): the
    * prefix-filtered similarity self-join (AllPairs/PPJoin family — see
    * DedupOps.ngramJaccardNearDups for the bound). The oracle states the
    * SEMANTICS the filter provably preserves — all pairs sharing ≥1
    * shingle, exact Jaccard ≥ t — so a prefix-filter bug that dropped a
    * true pair would hash-mismatch. */
  def qNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    DedupOps.ngramJaccardNearDupsContracted(
        Tables.documents(spark, dir), "doc_id", "text", JaccardThreshold)
      .orderBy("id_a", "id_b")

  /** The oracle applies the same exact-duplicate contraction the engine's
    * contractExpand documents (identical texts → identical shingle sets →
    * identical pairs and Jaccard, so computing rep-level pairs and
    * expanding to member pairs is provably output-identical): without it
    * the naive all-pairs-sharing-a-shingle join over a replicated corpus
    * (sf1 carries ~100 copies per unique text) exhausts DuckDB's temp
    * disk — the round-8 sweeps had to exclude this one query. Reps with
    * empty shingle sets drop out of both arms via the inner join against
    * the (nonempty) size table, exactly like the uncontracted SQL. */
  val qNgramJaccardOracle: String = s"""
    WITH g AS (SELECT md5(text) AS d, min(doc_id) AS rep
               FROM documents GROUP BY 1),
    mem AS (SELECT doc_id AS mid, rep
            FROM documents JOIN g ON md5(text) = g.d),
    rdoc AS (SELECT doc_id, text FROM documents JOIN g ON doc_id = g.rep),
    w AS (SELECT doc_id, string_split(text, ' ') ws FROM rdoc),
    sh AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(ws)-2,1)+1),
                 i -> ws[CAST(i AS INT)] || ' ' || COALESCE(ws[CAST(i AS INT)+1],'')
                      || ' ' || COALESCE(ws[CAST(i AS INT)+2],''))) s FROM w),
    h AS (SELECT DISTINCT doc_id AS id, ('0x'||substr(md5(s),1,8))::BIGINT h FROM sh),
    sz AS (SELECT id, count(*) AS sz FROM h GROUP BY id),
    cand AS (SELECT DISTINCT sa.id AS id_a, sb.id AS id_b
             FROM h sa JOIN h sb ON sa.h = sb.h AND sa.id < sb.id),
    inter AS (SELECT id_a, id_b, count(*) AS inter
              FROM cand JOIN h sa ON id_a = sa.id
                        JOIN h sb ON id_b = sb.id AND sa.h = sb.h
              GROUP BY id_a, id_b),
    j AS (SELECT cand.id_a, cand.id_b, inter,
                 x.sz AS sz_a, y.sz AS sz_b,
                 CAST(inter AS DOUBLE) /
                   CAST(x.sz + y.sz - inter AS DOUBLE) AS jaccard
          FROM cand JOIN inter USING (id_a, id_b)
                    JOIN sz x ON cand.id_a = x.id
                    JOIN sz y ON cand.id_b = y.id),
    jt AS (SELECT * FROM j WHERE jaccard >= $JaccardThreshold),
    xp AS (SELECT least(ma.mid, mb.mid) AS id_a,
                  greatest(ma.mid, mb.mid) AS id_b,
                  inter,
                  CASE WHEN ma.mid < mb.mid THEN sz_a ELSE sz_b END AS sz_a,
                  CASE WHEN ma.mid < mb.mid THEN sz_b ELSE sz_a END AS sz_b,
                  jaccard
           FROM jt JOIN mem ma ON jt.id_a = ma.rep
                   JOIN mem mb ON jt.id_b = mb.rep),
    intra AS (SELECT x.mid AS id_a, y.mid AS id_b,
                     s.sz AS inter, s.sz AS sz_a, s.sz AS sz_b,
                     CAST(1.0 AS DOUBLE) AS jaccard
              FROM mem x JOIN mem y ON x.rep = y.rep AND x.mid < y.mid
              JOIN sz s ON s.id = x.rep
              WHERE 1.0 >= $JaccardThreshold)
    SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter,
           CAST(sz_a AS BIGINT) AS sz_a, CAST(sz_b AS BIGINT) AS sz_b,
           jaccard
    FROM (SELECT * FROM xp UNION ALL SELECT * FROM intra)
    ORDER BY id_a, id_b"""

  /** TF-IDF top terms per document. The idf factor is the exact rational
    * N/df (score = tf·N/df with ONE float division) instead of a log —
    * same ranking monotonicity per document, and bitwise-identical across
    * engines, which a `ln()` would not guarantee. Scale shape: explode →
    * hash-agg tf → hash-agg df (tiny: one row per term, broadcast back) →
    * per-doc top-k window. */
  def qTfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nDocs = broadcast(docs.agg(count(lit(1)).as("n_docs")))
    val tf = Phase.fanout(docs)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), Seq("term")).crossJoin(nDocs)
      .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3)
      .select("doc_id", "rk", "term", "tf", "df", "score")
      .orderBy("doc_id", "rk")
  }

  val qTfidfOracle: String = """
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
               FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    s AS (SELECT doc_id, term, tf, df,
                 CAST(tf * n_docs AS DOUBLE) / df AS score
          FROM tf JOIN df USING (term) CROSS JOIN n),
    r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                           ORDER BY score DESC, term) AS BIGINT) AS rk
          FROM s)
    SELECT doc_id, rk, term, tf, df, score
    FROM r WHERE rk <= 3 ORDER BY doc_id, rk"""

  /** Deterministic stratified train/val/test split (80/10/10) by content-
    * independent id hash — the split every training pipeline needs, made
    * reproducible across engines/reruns (md5 of a salted id, not a RNG).
    * Stratum stats verify the split is balanced per language. */
  def qSplit(spark: SparkSession, dir: String): DataFrame = {
    val bkt = md5Hash32(concat(lit("split42_"), col("doc_id").cast("string"))) % 10
    Tables.documents(spark, dir)
      .withColumn("split",
        when(bkt < 8, "train").when(bkt === 8, "val").otherwise("test"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_doc"),
        sum(col("n_chars")).as("chars"))
      .orderBy("lang", "split")
  }

  val qSplitOracle: String = """
    WITH b AS (SELECT lang, doc_id, n_chars,
                      ('0x' || substr(md5('split42_' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10 AS bkt
               FROM documents)
    SELECT lang,
           CASE WHEN bkt < 8 THEN 'train' WHEN bkt = 8 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n, min(doc_id) AS min_doc,
           CAST(sum(n_chars) AS BIGINT) AS chars
    FROM b GROUP BY 1, 2 ORDER BY lang, split"""

  /** Deterministic stratified sample (pandas
    * `groupby('source').sample(n=k, random_state=…)`, the inspection /
    * eval-subset draw of a curation pipeline): exactly k docs per source,
    * ranked by a salted md5 of the doc id — reproducible across engines
    * and runs, uniform in expectation, and one window shuffle
    * (WindowGroupLimit keeps only k rows per group per partition before
    * it, so the sample never materializes the corpus). */
  def qSampleK(spark: SparkSession, dir: String): DataFrame = {
    val k = 5
    val rk = md5Hash32(concat(lit("sample42_"), col("doc_id").cast("string")))
    graft.ops.RelOps.topKPerGroup(
        Tables.documents(spark, dir).withColumn("rkh", rk),
        Seq("source"), Seq(col("rkh").asc, col("doc_id").asc), k)
      .select(col("source"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("source", "rk")
  }

  val qSampleKOracle: String = """
    WITH h AS (SELECT source, doc_id, lang, n_chars,
                      ('0x' || substr(md5('sample42_' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS rkh
               FROM documents),
    r AS (SELECT *, CAST(row_number() OVER (PARTITION BY source
                                            ORDER BY rkh, doc_id) AS BIGINT) rk
          FROM h)
    SELECT source, rk, doc_id, lang, n_chars
    FROM r WHERE rk <= 5 ORDER BY source, rk"""

  /** Text normalization (the cleaning pass that precedes dedup in an LLM
    * data pipeline): lowercase, strip non-alphanumerics, collapse runs of
    * spaces, trim — then digest + post-normalization stats. Pure codegen
    * projection; regex classes are chosen to mean the same thing in Java
    * regex and RE2. */
  def qNormalize(spark: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    Tables.documents(spark, dir).select(
        col("doc_id"),
        md5(norm).as("norm_digest"),
        length(norm).cast("long").as("n_chars_norm"),
        (length(norm) - length(translate(norm, " ", "")) + 1).cast("long")
          .as("n_words_norm"))
      .orderBy("doc_id")
  }

  val qNormalizeOracle: String = """
    WITH n AS (SELECT doc_id,
                      trim(regexp_replace(regexp_replace(lower(text),
                           '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) norm
               FROM documents)
    SELECT doc_id, md5(norm) AS norm_digest,
           CAST(length(norm) AS BIGINT) AS n_chars_norm,
           CAST(length(norm) - length(replace(norm, ' ', '')) + 1 AS BIGINT)
             AS n_words_norm
    FROM n ORDER BY doc_id"""

  /** Dedup clustering: connected components over the near-dup pairs,
    * cluster id = min doc id in the component (the doc that survives).
    * Oracle: rep-level LSH pairs + a recursive transitive closure over
    * unique texts only, expanded back through exact-dup membership. The
    * contraction is output-identical (same argument as q_ngram_jaccard's
    * oracle): identical texts have identical shingle sets, hence
    * identical MinHash signatures and band keys, so every copy of text A
    * is a candidate of every copy of text B exactly when their reps are,
    * with the same Jaccard — each uncontracted component is precisely
    * the membership expansion of one rep component. And because each rep
    * is the min doc_id of its copy group, min-over-reps IS
    * min-over-members, so the rep-level cluster label needs no re-min
    * after expansion. Without the contraction the closure runs over the
    * copies-inflated graph (component size × copies²) — the r9 sf10
    * sweep showed that formulation exhausting tens of GB of DuckDB
    * spill; the contracted one closes over ~1/100th the nodes. */
  def qDedupClusters(spark: SparkSession, dir: String): DataFrame =
    DedupOps.dedupClusters(
        DedupOps.minhashNearDupsWords(Tables.documents(spark, dir), "doc_id",
          "text", Bands, Rows, JaccardThreshold))
      .select(col("id").as("doc_id"), col("cluster_id"))
      .orderBy("doc_id")

  val qDedupClustersOracle: String = {
    val mhs = MinhashAB.indices.map(minhashExprSql).mkString(", ")
    val bandKeys = (0 until Bands).map { b =>
      val key = (0 until Rows).map(r => s"CAST(mh${b * Rows + r} AS VARCHAR)")
        .mkString(" || '_' || ")
      s"SELECT id, $b AS band, $key AS bkey FROM sigs"
    }.mkString("\n      UNION ALL\n      ")
    s"""
    WITH RECURSIVE
    g AS (SELECT md5(text) AS d, min(doc_id) AS rep
          FROM documents GROUP BY 1),
    mem AS (SELECT doc_id AS mid, rep
            FROM documents JOIN g ON md5(text) = g.d),
    rdoc AS (SELECT doc_id, text FROM documents JOIN g ON doc_id = g.rep),
    w AS (SELECT doc_id, string_split(text, ' ') ws FROM rdoc),
    sh AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(ws)-2,1)+1),
                 i -> ws[CAST(i AS INT)] || ' ' || COALESCE(ws[CAST(i AS INT)+1],'')
                      || ' ' || COALESCE(ws[CAST(i AS INT)+2],''))) s FROM w),
    h AS (SELECT DISTINCT doc_id AS id, ('0x'||substr(md5(s),1,8))::BIGINT h FROM sh),
    sigs AS (SELECT id, $mhs FROM h GROUP BY id),
    banded AS (
      $bandKeys),
    cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
             FROM banded x JOIN banded y
               ON x.band = y.band AND x.bkey = y.bkey AND x.id < y.id),
    sz AS (SELECT id, count(*) AS sz FROM h GROUP BY id),
    inter AS (SELECT id_a, id_b, count(*) AS inter
              FROM cand JOIN h sa ON id_a = sa.id
                        JOIN h sb ON id_b = sb.id AND sa.h = sb.h
              GROUP BY id_a, id_b),
    pairs AS (SELECT cand.id_a, cand.id_b
          FROM cand LEFT JOIN inter USING (id_a, id_b)
                    JOIN sz x ON cand.id_a = x.id
                    JOIN sz y ON cand.id_b = y.id
          WHERE CAST(COALESCE(inter, 0) AS DOUBLE) /
                  CAST(x.sz + y.sz - COALESCE(inter, 0) AS DOUBLE)
                >= $JaccardThreshold),
    edges AS (SELECT id_a a, id_b b FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    ccrep AS (SELECT a AS rep, least(a, min(b)) AS crep
              FROM reach GROUP BY a),
    grpsz AS (SELECT rep, count(*) AS copies FROM mem GROUP BY rep),
    allrep AS (SELECT rep, crep FROM ccrep
               UNION ALL
               SELECT gs.rep, gs.rep FROM grpsz gs
               WHERE gs.copies > 1
                 AND gs.rep NOT IN (SELECT rep FROM ccrep)),
    cc AS (SELECT m.mid AS doc_id, a.crep AS cluster_id
           FROM mem m JOIN allrep a ON m.rep = a.rep)
    SELECT doc_id, cluster_id FROM cc ORDER BY doc_id"""
  }

  /** Streaming MinHash near-dup candidates through the real engine: each
    * arriving document is banded per-row (no shuffle agg), bucket
    * posting lists live in transformWithState ListState
    * ([[graft.streaming.StreamOps.NearDupTtlProcessor]], run at an
    * infinite horizon), and a new member
    * emits a candidate per existing bucket member whose full-signature
    * agreement clears the threshold — the online counterpart of
    * q_neardup_lsh's candidate generator, now under the DuckDB oracle
    * (signature-level candidates, not the exact-Jaccard rerank: the
    * rerank is the batch path's job and idempotent per pair). One staged
    * file per micro-batch makes the collisions cross-batch state hits;
    * the candidate SET is arrival-order-independent, which is what makes
    * the gate deterministic. In production the posting lists carry a TTL
    * (the dedup horizon) and the batch contraction handles exact copies;
    * the fixture gate runs the raw corpus. */
  def qStreamNearDup(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamOps.nearDupViaStream(spark,
        Tables.documents(spark, dir).select(col("doc_id"), col("text")),
        Bands, Rows, JaccardThreshold)
      .distinct()
      .orderBy("id_a", "id_b")

  val qStreamNearDupOracle: String = {
    val mhs = MinhashAB.indices.map(minhashExprSql).mkString(", ")
    val bandKeys = (0 until Bands).map { b =>
      val key = (0 until Rows).map(r => s"CAST(mh${b * Rows + r} AS VARCHAR)")
        .mkString(" || '_' || ")
      s"SELECT id, $b AS band, $key AS bkey FROM sigs"
    }.mkString("\n      UNION ALL\n      ")
    val matches = MinhashAB.indices
      .map(i => s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val k = MinhashAB.size
    s"""
    WITH $shingleCte,
    sigs AS (SELECT id, $mhs FROM h GROUP BY id),
    banded AS (
      $bandKeys),
    cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
             FROM banded x JOIN banded y
               ON x.band = y.band AND x.bkey = y.bkey AND x.id < y.id),
    m AS (SELECT id_a, id_b, $matches AS matches
          FROM cand JOIN sigs a ON id_a = a.id JOIN sigs b ON id_b = b.id)
    SELECT id_a, id_b, CAST(matches AS DOUBLE) / $k.0 AS est_jaccard
    FROM m WHERE CAST(matches AS DOUBLE) / $k.0 >= $JaccardThreshold
    ORDER BY id_a, id_b"""
  }

  /** The PRODUCTION streaming near-dup pipeline (r10 verdict item 1):
    * content-digest compaction (`dropDuplicatesWithinWatermark`) chained
    * into the TTL'd posting-list LSH
    * ([[graft.streaming.StreamOps.nearDupProdViaStream]]) — both stages
    * through the real engine, one file per micro-batch, with a durable
    * parquet handoff between them. This is the shape a 100 TB crawl
    * runs: exact copies never reach the LSH state (the copies² cost the
    * raw q_stream_neardup gate measures — 476 s vs 7 s at sf1, SCALE.md
    * round 10 — collapses to O(uniques)), and postings are evicted a TTL
    * horizon behind the arriving event time, bounding state by
    * uniques-per-horizon instead of stream length.
    *
    * Event times are deterministic (doc_id seconds past a fixed epoch);
    * the gate's dedup watermark and TTL both exceed the fixture's whole
    * event-time span, so stage 1 keeps exactly one row per digest and
    * stage 2 evicts nothing — making the digest-grain candidate set equal
    * to the batch LSH candidates over UNIQUE texts, which is what the
    * oracle computes. TTL eviction itself is pinned deterministically in
    * StreamingSpec (a posting past the horizon stops pairing). */
  def qStreamNearDupProd(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamOps.nearDupProdViaStream(spark,
        Tables.documents(spark, dir).select(col("doc_id"), col("text"))
          .withColumn("ts",
            timestamp_seconds(lit(1704067200L) + col("doc_id"))),
        "ts", Bands, Rows, JaccardThreshold,
        dedupWatermark = "36500 days",
        ttlUs = 36500L * 86400L * 1000000L)
      .distinct()
      .orderBy("dig_a", "dig_b")

  val qStreamNearDupProdOracle: String = {
    val mhs = MinhashAB.indices.map(minhashExprSql).mkString(", ")
    val bandKeys = (0 until Bands).map { b =>
      val key = (0 until Rows).map(r => s"CAST(mh${b * Rows + r} AS VARCHAR)")
        .mkString(" || '_' || ")
      s"SELECT id, $b AS band, $key AS bkey FROM sigs"
    }.mkString("\n      UNION ALL\n      ")
    val matches = MinhashAB.indices
      .map(i => s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val k = MinhashAB.size
    s"""
    WITH uo AS (SELECT DISTINCT md5(text) AS dig, text FROM documents),
    w AS (SELECT dig, string_split(text, ' ') ws FROM uo),
    sh AS (SELECT dig, unnest(list_transform(range(1, greatest(len(ws)-2,1)+1),
                 i -> ws[CAST(i AS INT)] || ' ' || COALESCE(ws[CAST(i AS INT)+1],'')
                      || ' ' || COALESCE(ws[CAST(i AS INT)+2],''))) s FROM w),
    h AS (SELECT DISTINCT dig AS id, ('0x'||substr(md5(s),1,8))::BIGINT h FROM sh),
    sigs AS (SELECT id, $mhs FROM h GROUP BY id),
    banded AS (
      $bandKeys),
    cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
             FROM banded x JOIN banded y
               ON x.band = y.band AND x.bkey = y.bkey AND x.id < y.id),
    m AS (SELECT id_a, id_b, $matches AS matches
          FROM cand JOIN sigs a ON id_a = a.id JOIN sigs b ON id_b = b.id)
    SELECT id_a AS dig_a, id_b AS dig_b,
           CAST(matches AS DOUBLE) / $k.0 AS est_jaccard
    FROM m WHERE CAST(matches AS DOUBLE) / $k.0 >= $JaccardThreshold
    ORDER BY dig_a, dig_b"""
  }

  /** Triangle counts over the near-dup graph
    * ([[DedupOps.triangleCounts]]) — cluster-density audit on top of the
    * connected components: triangle-rich components are true duplicate
    * clusters, triangle-free chains are LSH transitivity noise. The
    * engine runs the degree-oriented wedge-close (out-degree bounded by
    * O(√|E|), never all-pairs); the oracle closes id-ordered pair joins
    * directly — same triangle set by symmetry of the undirected graph. */
  def qTriangles(spark: SparkSession, dir: String): DataFrame =
    DedupOps.triangleCounts(
        DedupOps.minhashNearDupsWords(Tables.documents(spark, dir), "doc_id",
          "text", Bands, Rows, JaccardThreshold))
      .orderBy("doc_id")

  val qTrianglesOracle: String = {
    val mhs = MinhashAB.indices.map(minhashExprSql).mkString(", ")
    val bandKeys = (0 until Bands).map { b =>
      val key = (0 until Rows).map(r => s"CAST(mh${b * Rows + r} AS VARCHAR)")
        .mkString(" || '_' || ")
      s"SELECT id, $b AS band, $key AS bkey FROM sigs"
    }.mkString("\n      UNION ALL\n      ")
    s"""
    WITH $shingleCte,
    sigs AS (SELECT id, $mhs FROM h GROUP BY id),
    banded AS (
      $bandKeys),
    cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
             FROM banded x JOIN banded y
               ON x.band = y.band AND x.bkey = y.bkey AND x.id < y.id),
    sz AS (SELECT id, count(*) AS sz FROM h GROUP BY id),
    inter AS (SELECT id_a, id_b, count(*) AS inter
              FROM cand JOIN h sa ON id_a = sa.id
                        JOIN h sb ON id_b = sb.id AND sa.h = sb.h
              GROUP BY id_a, id_b),
    pairs AS (SELECT cand.id_a, cand.id_b
          FROM cand LEFT JOIN inter USING (id_a, id_b)
                    JOIN sz x ON cand.id_a = x.id
                    JOIN sz y ON cand.id_b = y.id
          WHERE CAST(COALESCE(inter, 0) AS DOUBLE) /
                  CAST(x.sz + y.sz - COALESCE(inter, 0) AS DOUBLE)
                >= $JaccardThreshold),
    tri AS (SELECT p1.id_a x, p1.id_b y, p2.id_b z
            FROM pairs p1
            JOIN pairs p2 ON p1.id_b = p2.id_a
            JOIN pairs p3 ON p3.id_a = p1.id_a AND p3.id_b = p2.id_b),
    nodes AS (SELECT x AS doc_id FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri)
    SELECT doc_id, count(*) AS n_tri FROM nodes GROUP BY doc_id
    ORDER BY doc_id"""
  }

  /** SimHash signatures (word-level, ${SimhashBits}-bit). */
  def qSimhash(spark: SparkSession, dir: String): DataFrame =
    DedupOps.simhash(Tables.documents(spark, dir), "doc_id", "text", SimhashBits)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")

  val qSimhashOracle: String = {
    val bitSums = (0 until SimhashBits).map { b =>
      s"sum((h // ${1L << b}) % 2 * 2 - 1) AS b$b"
    }.mkString(",\n                  ")
    val sig = (0 until SimhashBits)
      .map(b => s"CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""
    WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS wd FROM documents),
    hh AS (SELECT doc_id, ('0x'||substr(md5(wd),1,8))::BIGINT h FROM w),
    bits AS (SELECT doc_id,
                  $bitSums
             FROM hh GROUP BY doc_id)
    SELECT doc_id, CAST($sig AS BIGINT) AS simhash FROM bits ORDER BY doc_id"""
  }

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1 shape):
    * duplicate-word fraction, most-frequent-word fraction, and
    * most-frequent-bigram fraction per document — the filters that drop
    * boilerplate/spam before training. All counts are integers; each
    * fraction is one final division, so the oracle compares exactly. */
  def qRepetition(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val wstats = Phase.fanout(docs)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("wc"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_word"))
    // token array bound once per row (r17 — the inline form re-split the
    // text twice per bigram; see TextFunctions.wordShingles3)
    val bigrams = flatten(transform(array(split(col("text"), " ")), ws =>
      transform(
        sequence(lit(1), greatest(size(ws) - 1, lit(1))),
        i => concat(element_at(ws, i), lit(" "),
          coalesce(try_element_at(ws, i + 1), lit(""))))))
    val bstats = Phase.fanout(docs)
      .select(col("doc_id"), explode(bigrams).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("nb"), max(col("c")).as("top_bigram"))
    wstats.join(bstats, Seq("doc_id"))
      .select(col("doc_id"), col("wc"), col("n_distinct"),
        (lit(1.0) - col("n_distinct").cast("double") / col("wc").cast("double"))
          .as("dup_word_frac"),
        col("top_word"),
        (col("top_word").cast("double") / col("wc").cast("double"))
          .as("top_word_frac"),
        col("top_bigram"),
        (col("top_bigram").cast("double") / col("nb").cast("double"))
          .as("top_bigram_frac"))
      .orderBy("doc_id")
  }

  val qRepetitionOracle: String = """
    WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
    wx AS (SELECT doc_id, unnest(ws) w FROM w),
    wcnt AS (SELECT doc_id, w, count(*) c FROM wx GROUP BY 1, 2),
    wst AS (SELECT doc_id, CAST(sum(c) AS BIGINT) wc,
                   count(*) n_distinct, CAST(max(c) AS BIGINT) top_word
            FROM wcnt GROUP BY 1),
    bg AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(ws)-1,1)+1),
                 i -> ws[CAST(i AS INT)] || ' '
                      || COALESCE(ws[CAST(i AS INT)+1],''))) b FROM w),
    bcnt AS (SELECT doc_id, b, count(*) c FROM bg GROUP BY 1, 2),
    bst AS (SELECT doc_id, CAST(sum(c) AS BIGINT) nb,
                   CAST(max(c) AS BIGINT) top_bigram
            FROM bcnt GROUP BY 1)
    SELECT doc_id, wc, n_distinct,
           1.0 - CAST(n_distinct AS DOUBLE) / CAST(wc AS DOUBLE) AS dup_word_frac,
           top_word,
           CAST(top_word AS DOUBLE) / CAST(wc AS DOUBLE) AS top_word_frac,
           top_bigram,
           CAST(top_bigram AS DOUBLE) / CAST(nb AS DOUBLE) AS top_bigram_frac
    FROM wst JOIN bst USING (doc_id) ORDER BY doc_id"""

  // ---- cross-document repeated-span mining (ExactSubstr-style) ----
  /** Duplicated-substring spans ACROSS documents — the exact-substring
    * dedup device of "Deduplicating Training Data Makes Language Models
    * Better" (Lee et al., 2022; suffix-array ExactSubstr), re-expressed
    * relationally: a positional k-gram (k=5) inverted index finds every
    * gram occurring in ≥2 DISTINCT docs; per doc, overlapping hit
    * intervals [i, i+k−1] merge into maximal duplicated spans. Because all
    * intervals have equal length k and arrive sorted by start, interval
    * merging reduces to the lag rule `start ≤ prev_start + k−1` (spans
    * sharing ≥1 token merge; abutting-but-disjoint spans stay separate —
    * they are distinct maximal duplicated substrings). Output is the
    * per-doc span profile a curation pipeline thresholds on
    * (`dup_tokens/n` or `longest_span`), complementing [[qRepetition]]
    * (intra-doc) and the MinHash family (whole-doc similarity): this is
    * the only operator that localizes WHICH tokens are shared.
    *
    * Physical shape (scale rationale): "gram in ≥2 distinct docs" is
    * `min(doc_id) ≠ max(doc_id)` — ONE map-side-combined hash-agg on `g`,
    * not a count-distinct (whose partial (g, doc_id) dedup would pay a
    * second full gram-relation exchange). The probe join of grams against
    * the surviving dup-gram set is left to AQE: a near-dup-free corpus
    * broadcasts it; a heavily-duplicated one falls back to a partitioned
    * equi-join on `g` — no static hint hardcodes either. The island merge
    * is a per-doc running window — parallelism = |docs|, state = one lag
    * value, group size bounded by DOC length, never corpus size. At
    * 100 TB the gram string would be xxhash64-compressed before the
    * shuffle (8-byte keys vs ~40-byte strings; a collision can only ever
    * MERGE spans, not drop one) — kept as the raw string here for
    * bit-exact oracle parity. */
  val DupSpanK = 5
  def qDupSpans(spark: SparkSession, dir: String): DataFrame = {
    val w    = org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    // token array bound once per row (r17 — the inline form re-split the
    // text once per emitted gram; see TextFunctions.wordShingles3).
    // Spark's sequence(1, n) DESCENDS when n < 1 (DuckDB's range is empty
    // there) — docs shorter than k tokens need the explicit guard
    val gramStructs = flatten(transform(array(split(col("text"), " ")), ws => {
      val starts = when(size(ws) >= DupSpanK,
        sequence(lit(1), size(ws) - (DupSpanK - 1)))
        .otherwise(array().cast("array<int>"))
      transform(starts,
        i => struct(i.as("i"),
          concat_ws(" ", slice(ws, i, lit(DupSpanK))).as("g")))
    }))
    val grams = Phase.fanout(docs)
      .select(col("doc_id"), explode(gramStructs).as("t"))
      .select(col("doc_id"), col("t.i").as("i"), col("t.g").as("g"))
    val dupg = grams.groupBy("g")
      .agg(min(col("doc_id")).as("__lo"), max(col("doc_id")).as("__hi"))
      .where(col("__lo") =!= col("__hi"))
      .select("g")
    val hits = grams.join(dupg, "g").select("doc_id", "i")
    val wDoc = w.partitionBy(col("doc_id")).orderBy(col("i"))
    val spans = hits
      .withColumn("__brk",
        when(col("i") <= lag(col("i"), 1).over(wDoc) + (DupSpanK - 1), lit(0))
          .otherwise(lit(1)))
      .withColumn("__gid", sum(col("__brk"))
        .over(wDoc.rowsBetween(w.unboundedPreceding, w.currentRow)))
      .groupBy(col("doc_id"), col("__gid"))
      .agg(min(col("i")).as("s"), (max(col("i")) + (DupSpanK - 1)).as("e"))
    spans.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("dup_tokens"),
        max(col("e") - col("s") + 1).cast("long").as("longest_span"))
      .orderBy("doc_id")
  }

  val qDupSpansOracle: String = """
    WITH d AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
    pos AS (SELECT doc_id, ws, unnest(range(1, greatest(len(ws)-4,0)+1)) i FROM d),
    grams AS (SELECT doc_id, i,
                     array_to_string(ws[CAST(i AS INT):CAST(i AS INT)+4], ' ') g
              FROM pos),
    df AS (SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
    hits AS (SELECT doc_id, i FROM grams WHERE g IN (SELECT g FROM df)),
    isl AS (SELECT doc_id, i,
                   CASE WHEN i <= lag(i) OVER (PARTITION BY doc_id ORDER BY i) + 4
                        THEN 0 ELSE 1 END brk FROM hits),
    grp AS (SELECT doc_id, i,
                   sum(brk) OVER (PARTITION BY doc_id ORDER BY i) gid FROM isl),
    spans AS (SELECT doc_id, gid, min(i) s, max(i)+4 e FROM grp GROUP BY 1, 2)
    SELECT doc_id, count(*) AS n_spans,
           CAST(sum(e-s+1) AS BIGINT) AS dup_tokens,
           CAST(max(e-s+1) AS BIGINT) AS longest_span
    FROM spans GROUP BY doc_id ORDER BY doc_id"""

  // ---- BM25 (Robertson/Spärck Jones) over a fixed query-term set ----
  /** Rational idf variant `(N − df + 0.5)/(df + 0.5)` — same ranking
    * monotonicity as the usual ln() form for df < N/2, chosen because
    * JVM ln and libm ln can differ in the last ulp (the engine/oracle
    * hash-match would be flaky; see q_tfidf's rational scoring). */
  val Bm25Terms = Seq("data", "table", "scan")
  val Bm25K1    = 1.2
  val Bm25B     = 0.75

  /** BM25 top-10 documents per query term: tf-idf with document-length
    * normalization — the retrieval baseline a data-curation stack uses
    * for corpus search / relevance dedup. One explode + two hash-aggs +
    * broadcast joins of tiny (df, corpus-stats) sides. */
  def qBm25(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tf = Phase.fanout(docs)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val corpus = broadcast(dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl")))
    val dfreq = tf.where(col("term").isin(Bm25Terms: _*))
      .groupBy("term").agg(count(lit(1)).as("df"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val tfd = col("tf").cast("double")
    // operand order mirrors the oracle SQL token-for-token (double ops are
    // deterministic only under identical association)
    val norm = tfd * lit(Bm25K1 + 1) /
      (tfd + lit(Bm25K1) * (lit(1 - Bm25B) +
        lit(Bm25B) * (col("dl").cast("double") / avgdl)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term")).orderBy(col("score").desc, col("doc_id").asc)
    tf.where(col("term").isin(Bm25Terms: _*))
      .join(dl, Seq("doc_id")).join(broadcast(dfreq), Seq("term"))
      .crossJoin(corpus)
      .withColumn("score", idf * norm)
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 10)
      .select("term", "rk", "doc_id", "tf", "dl", "df", "score")
      .orderBy("term", "rk")
  }

  val qBm25Oracle: String = {
    val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) term FROM documents),
    tf AS (SELECT doc_id, term, count(*) tf FROM t GROUP BY 1, 2),
    dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) dl FROM tf GROUP BY 1),
    corpus AS (SELECT count(*) n_docs, CAST(sum(dl) AS BIGINT) sum_dl FROM dl),
    df AS (SELECT term, count(*) df FROM tf WHERE term IN ($terms) GROUP BY 1),
    s AS (SELECT term, tf.doc_id, tf, dl, df,
            ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
             (CAST(df AS DOUBLE) + 0.5))
            * (CAST(tf AS DOUBLE) * ($Bm25K1 + 1) /
               (CAST(tf AS DOUBLE) + $Bm25K1 * ((1 - $Bm25B) + $Bm25B *
                 (CAST(dl AS DOUBLE) /
                  (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) score
          FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN corpus),
    r AS (SELECT *, CAST(row_number() OVER (PARTITION BY term
                           ORDER BY score DESC, doc_id) AS BIGINT) rk FROM s)
    SELECT term, rk, doc_id, tf, dl, df, score
    FROM r WHERE rk <= 10 ORDER BY term, rk"""
  }

  /** MinHash estimate vs exact Jaccard on every LSH candidate pair — the
    * sketch-accuracy audit (see DedupOps.minhashEstimateVsExact). */
  def qMinhashEst(spark: SparkSession, dir: String): DataFrame =
    DedupOps.minhashEstimateVsExact(
        DedupOps.wordShingleHashes(Tables.documents(spark, dir), "doc_id", "text"),
        Bands, Rows)
      .orderBy("id_a", "id_b")

  val qMinhashEstOracle: String = {
    val mhs = MinhashAB.indices.map(minhashExprSql).mkString(", ")
    val bandKeys = (0 until Bands).map { b =>
      val key = (0 until Rows).map(r => s"CAST(mh${b * Rows + r} AS VARCHAR)")
        .mkString(" || '_' || ")
      s"SELECT id, $b AS band, $key AS bkey FROM sigs"
    }.mkString("\n      UNION ALL\n      ")
    val matchSum = MinhashAB.indices
      .map(i => s"CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""
    WITH $shingleCte,
    sigs AS (SELECT id, $mhs FROM h GROUP BY id),
    banded AS (
      $bandKeys),
    cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
             FROM banded x JOIN banded y
               ON x.band = y.band AND x.bkey = y.bkey AND x.id < y.id),
    est AS (SELECT id_a, id_b,
                   CAST($matchSum AS DOUBLE) / ${MinhashAB.size}.0 est_jaccard
            FROM cand JOIN sigs a ON id_a = a.id JOIN sigs b ON id_b = b.id),
    sz AS (SELECT id, count(*) AS sz FROM h GROUP BY id),
    inter AS (SELECT id_a, id_b, count(*) AS inter
              FROM cand JOIN h sa ON id_a = sa.id
                        JOIN h sb ON id_b = sb.id AND sa.h = sb.h
              GROUP BY id_a, id_b),
    j AS (SELECT cand.id_a, cand.id_b,
                 CAST(COALESCE(inter, 0) AS DOUBLE) /
                   CAST(x.sz + y.sz - COALESCE(inter, 0) AS DOUBLE) AS jaccard
          FROM cand LEFT JOIN inter USING (id_a, id_b)
                    JOIN sz x ON cand.id_a = x.id
                    JOIN sz y ON cand.id_b = y.id)
    SELECT e.id_a, e.id_b, est_jaccard, jaccard,
           abs(est_jaccard - jaccard) AS abs_err
    FROM est e JOIN j USING (id_a, id_b) ORDER BY id_a, id_b"""
  }

  /** Blocklist content filter: per document, how many blocked terms appear
    * (non-overlapping whole-word occurrences) and whether the doc is
    * excluded — the URL/phrase-blocklist pass of a curation pipeline. */
  val Blocklist = Seq("slow", "error", "drop")

  def qBlocklist(spark: SparkSession, dir: String): DataFrame =
    blocklistCounts(Tables.documents(spark, dir), "doc_id", "text", Blocklist)
      .orderBy("doc_id")

  /** Per-document blocklist hit counts, split by term shape so list SIZE
    * never multiplies per-document work (VERDICT r7 item 4):
    *
    *   - SINGLE-WORD terms (the bulk of a real blocklist) never touch a
    *     per-(doc × term) product: the document is tokenized ONCE and
    *     token rows hash-equi-join the term relation — a million-entry
    *     list costs the same document-side work as a 3-entry list.
    *     Counting is run-length based because the query's contract is the
    *     `replace`-formula count (occurrences of " term " with
    *     non-overlapping delimiter consumption): inside a run of m
    *     consecutive equal tokens the scan consumes delimiters pairwise,
    *     yielding ⌈m/2⌉ — runs found per (doc, term) by gaps-and-islands
    *     (pos − row_number), one shuffle keyed (doc, term).
    *   - MULTI-WORD phrases can't tokenize to an equi-join key; they keep
    *     the broadcast replace-count arm, which is fine because phrase
    *     lists are the short tail of a blocklist.
    *
    * Output: (doc_id, terms_hit, total_hits, blocked) for EVERY document
    * (zero-hit docs included via the left join). */
  def blocklistCounts(docs: DataFrame, idCol: String, textCol: String,
                      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "blocklist must not be empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val (words, phrases) = terms.partition(!_.trim.contains(" "))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), col("term")).orderBy(col("pos"))
    val arms = Seq(
      if (words.isEmpty) None else Some {
        Phase.fanout(docs)
          .select(col(idCol).as("doc_id"),
            posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
          .join(broadcast(words.toDF("term")), col("tok") === col("term"))
          .withColumn("grp", col("pos") - row_number().over(w))
          .groupBy(col("doc_id"), col("term"), col("grp"))
          .agg(count(lit(1)).as("run"))
          .groupBy(col("doc_id"), col("term"))
          .agg(sum(expr("(run + 1) div 2")).as("n"))
      },
      if (phrases.isEmpty) None else Some {
        val pad = concat(lit(" "), col(textCol), lit(" "))
        val needle = concat(lit(" "), col("term"), lit(" "))
        val n = ((length(pad) -
          length(call_function("replace", pad, needle, lit("")))) /
          (length(col("term")) + lit(2))).cast("long")
        docs.crossJoin(broadcast(phrases.toDF("term")))
          .select(col(idCol).as("doc_id"), col("term"), n.as("n"))
          .where(col("n") > 0)
      }).flatten
    val hits = arms.reduce(_ unionByName _)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("h_terms"), sum(col("n")).as("h_total"))
    docs.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("h_terms"), lit(0L)).as("terms_hit"),
        coalesce(col("h_total"), lit(0L)).as("total_hits"),
        (coalesce(col("h_total"), lit(0L)) > 0).as("blocked"))
  }

  val qBlocklistOracle: String = {
    val vals = Blocklist.map(t => s"('$t')").mkString(", ")
    s"""
    WITH t(term) AS (VALUES $vals),
    x AS (SELECT doc_id, term,
            CAST((length($paddedSql) -
                  length(replace($paddedSql, ' ' || term || ' ', '')))
                 / (length(term) + 2) AS BIGINT) n
          FROM documents CROSS JOIN t)
    SELECT doc_id,
           CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT) terms_hit,
           CAST(sum(n) AS BIGINT) total_hits,
           CAST(sum(n) AS BIGINT) > 0 AS blocked
    FROM x GROUP BY doc_id ORDER BY doc_id"""
  }

  /** Edit-distance rerank of the LSH candidate pairs: levenshtein over
    * the first 40 characters — the fuzzy-key verification step (both
    * engines implement the standard Wagner–Fischer DP, so the integer
    * distances compare exactly). Candidates come from the band join only;
    * the quadratic-per-pair DP never runs on the full corpus product. */
  def qEditDist(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // signatures feed all 2·bands branches of the band self-join — eager
    // lineage cut per phase, same rationale as DedupOps.nearDupsOnShingles
    // (without it the shingle+minhash pipeline executes once per branch)
    val sigs = DedupOps.minhashSignatures(
        DedupOps.wordShingleHashes(docs, "doc_id", "text"))
      .phaseCut
    val cand = DedupOps.lshCandidates(sigs, Bands, Rows)
    val t = docs.select(col("doc_id"), substring(col("text"), 1, 40).as("prefix"))
    cand
      .join(t.select(col("doc_id").as("id_a"), col("prefix").as("pa")), Seq("id_a"))
      .join(t.select(col("doc_id").as("id_b"), col("prefix").as("pb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("pa"), col("pb")).cast("long").as("edit_dist"))
      .orderBy("id_a", "id_b")
  }

  val qEditDistOracle: String = {
    val mhs = MinhashAB.indices.map(minhashExprSql).mkString(", ")
    val bandKeys = (0 until Bands).map { b =>
      val key = (0 until Rows).map(r => s"CAST(mh${b * Rows + r} AS VARCHAR)")
        .mkString(" || '_' || ")
      s"SELECT id, $b AS band, $key AS bkey FROM sigs"
    }.mkString("\n      UNION ALL\n      ")
    s"""
    WITH $shingleCte,
    sigs AS (SELECT id, $mhs FROM h GROUP BY id),
    banded AS (
      $bandKeys),
    cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
             FROM banded x JOIN banded y
               ON x.band = y.band AND x.bkey = y.bkey AND x.id < y.id)
    SELECT c.id_a, c.id_b,
           CAST(levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS BIGINT)
             AS edit_dist
    FROM cand c JOIN documents a ON c.id_a = a.doc_id
                JOIN documents b ON c.id_b = b.doc_id
    ORDER BY id_a, id_b"""
  }

  /** Weighted per-source sampling ("data mixing"): every training corpus
    * is a weighted blend of sources; the keep decision is a pure
    * content-independent hash (reproducible across engines and reruns,
    * unlike RNG sampling), with per-source rates derived deterministically
    * here (in production they come from the mixing recipe). */
  def qMix(spark: SparkSession, dir: String): DataFrame = {
    val rate = md5Hash32(col("source")) % 60 + 20
    val bkt  = md5Hash32(concat(lit("mix7_"), col("doc_id").cast("string"))) % 100
    Tables.documents(spark, dir)
      .withColumn("keep", bkt < rate)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("n_chars")).otherwise(0L)).as("chars_kept"))
      .orderBy("source")
  }

  val qMixOracle: String = """
    WITH b AS (SELECT source, n_chars,
                 ('0x'||substr(md5(source),1,8))::BIGINT % 60 + 20 AS rate,
                 ('0x'||substr(md5('mix7_' || CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 100 AS bkt
               FROM documents)
    SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN bkt < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN bkt < rate THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept
    FROM b GROUP BY source ORDER BY source"""

  // ---- training-window chunking -------------------------------------
  val ChunkSize   = 32
  val ChunkStride = 24

  /** Sliding-window token chunking (context-window packing for LLM
    * training): each document's whitespace tokens are cut into
    * ChunkSize-token windows advancing by ChunkStride (overlap =
    * size − stride), the final window clamped at the document end. Pure
    * per-row Catalyst (split → sequence → explode → slice), so the plan
    * is a projection + generate that scales linearly with corpus bytes —
    * chunk count math is all integer, and chunk content is compared via
    * md5 so the oracle row stays narrow. */
  def qChunk(spark: SparkSession, dir: String): DataFrame = {
    val nChunks = greatest(lit(0),
      ((col("n_tok") - ChunkSize + (ChunkStride - 1)) / ChunkStride).cast("int"))
    val start = col("chunk_id") * ChunkStride + 1
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n_tok", size(col("toks")))
      .withColumn("chunk_id", explode(sequence(lit(0), nChunks)))
      .withColumn("chunk", slice(col("toks"), start, lit(ChunkSize)))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        size(col("chunk")).cast("long").as("chunk_tokens"),
        md5(array_join(col("chunk"), " ")).as("chunk_hash"))
      .orderBy("doc_id", "chunk_id")
  }

  val qChunkOracle: String = s"""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks,
                      len(str_split(text, ' ')) AS n FROM documents),
    k AS (SELECT doc_id, toks, n,
                 unnest(generate_series(0,
                   greatest(0, (n - $ChunkSize + ${ChunkStride - 1}) // $ChunkStride)))
                   AS chunk_id
          FROM t),
    c AS (SELECT doc_id, chunk_id,
                 toks[chunk_id*$ChunkStride + 1 :
                      least(chunk_id*$ChunkStride + $ChunkSize, n)] AS chunk
          FROM k)
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(len(chunk) AS BIGINT) AS chunk_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_hash
    FROM c ORDER BY doc_id, chunk_id"""

  // ---- PII redaction --------------------------------------------------
  /** Email/phone patterns valid in BOTH Java regex (Spark) and RE2
    * (DuckDB), greedy semantics identical on these shapes. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+1-555-[0-9]{4}"

  /** PII detection + redaction: every document is augmented with a
    * deterministic synthetic contact line (the fixture corpus carries no
    * real PII), then emails and phone numbers are counted and masked with
    * `<EMAIL>`/`<PHONE>` placeholders. One codegen'd projection —
    * regexp_count + regexp_replace — per row; no shuffle at all until the
    * driver-side ORDER BY. The redacted text is compared via md5. */
  def qPii(spark: SparkSession, dir: String): DataFrame = {
    val aug = concat(col("text"),
      lit(" contact user"), col("doc_id"),
      lit("@mail.example.com now or call +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    val redacted = regexp_replace(
      regexp_replace(aug, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        regexp_count(aug, lit(EmailRe)).cast("long").as("n_email"),
        regexp_count(aug, lit(PhoneRe)).cast("long").as("n_phone"),
        md5(redacted).as("redacted_hash"),
        length(redacted).cast("long").as("redacted_len"))
      .orderBy("doc_id")
  }

  val qPiiOracle: String = """
    WITH a AS (SELECT doc_id,
        text || ' contact user' || CAST(doc_id AS VARCHAR)
             || '@mail.example.com now or call +1-555-'
             || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
      FROM documents),
    r AS (SELECT doc_id, aug,
        regexp_replace(regexp_replace(aug,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS red
      FROM a)
    SELECT doc_id,
      CAST(len(regexp_extract_all(aug,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
      CAST(len(regexp_extract_all(aug, '\+1-555-[0-9]{4}')) AS BIGINT) AS n_phone,
      md5(red) AS redacted_hash,
      CAST(length(red) AS BIGINT) AS redacted_len
    FROM r ORDER BY doc_id"""

  /** Corpus bigram vocabulary: top-20 word bigrams corpus-wide (the
    * vocabulary-mining pass of tokenizer training / collocation
    * analysis). Bigram expansion is a per-row Catalyst lambda (transform
    * over the token index range, no join), the count is one hash-agg on
    * the bigram key, and the global top-20 plans as TakeOrderedAndProject
    * — per-partition heaps, never a full sort of the vocabulary. The
    * (count desc, bigram asc) total order makes the cut deterministic. */
  def qVocab(spark: SparkSession, dir: String): DataFrame = {
    // r17: bind the token array once (lambda-variable `let`) — the old
    // spelling re-split the text twice per bigram, O(words²) splits per
    // document — and fan the single-split fixture scan out before the
    // explode (same one-task serialization as the r16 streaming minhash)
    val bigrams = expr(
      """flatten(transform(array(split(text, ' ')), ws ->
           transform(sequence(1, size(ws) - 1),
             i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))))""")
    Phase.fanout(Tables.documents(spark, dir))
      .select(explode(bigrams).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)
  }

  val qVocabOracle: String = """
    WITH t AS (SELECT str_split(text, ' ') AS toks FROM documents),
    i AS (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM t),
    b AS (SELECT toks[i] || ' ' || toks[i + 1] AS bigram FROM i)
    SELECT bigram, count(*) AS n FROM b
    GROUP BY 1 ORDER BY n DESC, bigram LIMIT 20"""

  /** Unigram-LM rarity scoring (perplexity-proxy quality signal): corpus
    * unigram counts, then each document scored by the mean rarity of its
    * tokens. The per-token rarity is quantized to exact integer ppm
    * (`(N*1e6) div c_w` — floor division on both engines) so the per-doc
    * sum is order-independent integer arithmetic and the final mean is one
    * identical double division; a float `log p` sum would hash-diverge by
    * accumulation order. Shape: term-level tf (one shuffle on (doc,term)),
    * vocab rollup from tf (shuffle on term, vocab-sized), broadcast the
    * vocab back — at 100 TB the vocab join flips to shuffle automatically
    * if it outgrows the broadcast threshold. */
  def qDocLm(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // fanout tested and REJECTED here (r17): the token explode is one
    // split per row — cheap enough that the round-robin exchange cost
    // more than the one-core stage (calm-box paired runs 0.94 -> 1.15 s)
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy("term").agg(sum("tf").as("cw"))
    val nTotal = broadcast(vocab.agg(sum("cw").as("n_total")))
    tf.join(broadcast(vocab), Seq("term")).crossJoin(nTotal)
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tok"),
        sum(col("tf") * expr("(n_total * 1000000L) div cw")).as("rarity_ppm"))
      .withColumn("rarity",
        col("rarity_ppm").cast("double") / col("n_tok").cast("double") / 1e6)
      .orderBy("doc_id")
  }

  val qDocLmOracle: String = """
    WITH tok AS (SELECT doc_id, unnest(str_split(text, ' ')) AS term
                 FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    v AS (SELECT term, sum(tf) AS cw FROM tf GROUP BY 1),
    n AS (SELECT CAST(sum(cw) AS BIGINT) AS n_total FROM v),
    s AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tok,
                 CAST(sum(tf * ((n_total * 1000000) // cw)) AS BIGINT) AS rarity_ppm
          FROM tf JOIN v USING (term) CROSS JOIN n GROUP BY 1)
    SELECT doc_id, n_tok, rarity_ppm,
           CAST(rarity_ppm AS DOUBLE) / CAST(n_tok AS DOUBLE) / 1e6 AS rarity
    FROM s ORDER BY doc_id"""

  /** Sequence packing (training-batch assembly): documents fill a
    * token-budget batch greedily in doc_id order within each source shard;
    * a doc belongs to batch `floor(exclusive_prefix_tokens / budget)`.
    * The running sum is a window PARTITIONED by source — no global
    * unpartitioned window, so the sort distributes; rollup to per-batch
    * stats is one hash-agg. */
  def qPack(spark: SparkSession, dir: String): DataFrame = {
    val budget = 2000L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("batch_id", graft.ops.RelOps.fdiv(
        sum(col("n_tok")).over(w) - col("n_tok"), budget))
      .groupBy("source", "batch_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("source", "batch_id")
  }

  val qPackOracle: String = """
    WITH t AS (SELECT source, doc_id,
                      CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
               FROM documents),
    b AS (SELECT source, doc_id, n_tok,
                 (sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tok) // 2000
                   AS batch_id
          FROM t)
    SELECT source, CAST(batch_id AS BIGINT) AS batch_id,
           count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM b GROUP BY 1, 2 ORDER BY 1, 2"""

  /** pandas `duplicated(keep='first'/'last'/False)` tri-flag semantics
    * over exact content (md5 digest of text): occurrence index within the
    * duplicate group (doc_id order), plus all three pandas marker
    * variants. One digest-partitioned window — complements q_dedup_exact
    * (which maps docs to a canonical keep_id) by exposing the marker
    * surface a pandas user filters on. */
  def qDupKeep(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("digest")).orderBy(col("doc_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("digest"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("digest"))
      .withColumn("occ", row_number().over(w).cast("long"))
      .withColumn("grp_n", count(lit(1)).over(wAll))
      .select(col("doc_id"), col("digest"), col("occ"),
        (col("occ") > 1).as("dup_keep_first"),
        (col("occ") < col("grp_n")).as("dup_keep_last"),
        (col("grp_n") > 1).as("dup_keep_false"))
      .orderBy("doc_id")
  }

  val qDupKeepOracle: String = """
    WITH d AS (SELECT doc_id, md5(text) AS digest FROM documents),
    m AS (SELECT doc_id, digest,
                 CAST(row_number() OVER (PARTITION BY digest ORDER BY doc_id) AS BIGINT) AS occ,
                 count(*) OVER (PARTITION BY digest) AS grp_n
          FROM d)
    SELECT doc_id, digest, occ,
           occ > 1 AS dup_keep_first,
           occ < grp_n AS dup_keep_last,
           grp_n > 1 AS dup_keep_false
    FROM m ORDER BY doc_id"""

  /** pandas `.str` accessor surface (upper/lower/pad/slice/find/reverse/
    * repeat/replace/split_part/concat_ws/translate) as one codegen
    * projection — the string-kernel breadth a pandas user expects, each
    * picked to have identical semantics in Spark SQL and DuckDB (1-based
    * strpos/instr, left/right, lpad truncation). No shuffle except the
    * output orderBy. */
  def qStrOps(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        upper(expr("left(text, 10)")).as("head_upper"),
        expr("right(lang, 1)").as("lang_last"),
        lpad(col("lang"), 5, "*").as("lang_lpad"),
        rpad(col("source"), 8, ".").as("src_rpad"),
        reverse(col("lang")).as("lang_rev"),
        repeat(col("lang"), 2).as("lang_x2"),
        instr(col("text"), "data").cast("long").as("data_pos"),
        substring(col("text"), 5, 12).as("slice_5_12"),
        expr("split_part(source, 'c', 2)").as("src_num"),
        concat_ws("-", col("lang"), col("source")).as("lang_src"),
        translate(col("lang"), "aeiou", "AEIOU").as("lang_vowel_up"),
        expr("replace(left(text, 20), ' ', '_')").as("head_snake"))
      .orderBy("doc_id")

  val qStrOpsOracle: String = """
    SELECT doc_id,
           upper(left(text, 10)) AS head_upper,
           right(lang, 1) AS lang_last,
           lpad(lang, 5, '*') AS lang_lpad,
           rpad(source, 8, '.') AS src_rpad,
           reverse(lang) AS lang_rev,
           repeat(lang, 2) AS lang_x2,
           CAST(strpos(text, 'data') AS BIGINT) AS data_pos,
           substr(text, 5, 12) AS slice_5_12,
           split_part(source, 'c', 2) AS src_num,
           concat_ws('-', lang, source) AS lang_src,
           translate(lang, 'aeiou', 'AEIOU') AS lang_vowel_up,
           replace(left(text, 20), ' ', '_') AS head_snake
    FROM documents ORDER BY doc_id"""

  /** Class rebalancing by integer oversampling (the minority-upsampling
    * pass before training on imbalanced data): each lang is replicated
    * `max_n div n` times via an exploded copy index — a generated-column
    * explode, no self-join, rows scale with the OUTPUT size. The checksum
    * over (doc_id · copy) proves the explode materialized rather than
    * being constant-folded to arithmetic. */
  def qBalance(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.documents(spark, dir)
      .groupBy("lang").agg(count(lit(1)).as("n"))
    val mx = broadcast(per.agg(max("n").as("max_n")))
    val rep = per.crossJoin(mx)
      .withColumn("rep", expr("max_n div n"))
    Tables.documents(spark, dir)
      .join(broadcast(rep.select("lang", "rep")), Seq("lang"))
      .select(col("lang"), col("doc_id"),
        explode(expr("sequence(1L, rep)")).as("copy"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_balanced"),
        sum(col("doc_id") * col("copy")).as("chk"))
      .join(broadcast(rep), Seq("lang"))
      .select("lang", "n", "rep", "n_balanced", "chk")
      .orderBy("lang")
  }

  val qBalanceOracle: String = """
    WITH per AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
    mx AS (SELECT max(n) AS max_n FROM per),
    rep AS (SELECT lang, n, max_n // n AS rep FROM per CROSS JOIN mx),
    b AS (SELECT d.lang, d.doc_id,
                 unnest(generate_series(1, rep)) AS copy
          FROM documents d JOIN rep USING (lang)),
    agg AS (SELECT lang, count(*) AS n_balanced,
                   CAST(sum(doc_id * copy) AS BIGINT) AS chk
            FROM b GROUP BY 1)
    SELECT lang, n, CAST(rep AS BIGINT) AS rep, n_balanced, chk
    FROM agg JOIN rep USING (lang) ORDER BY lang"""

  /** Contingency table with lift (pandas crosstab + association signal):
    * one hash-agg for the cells, then per-lang / per-source marginals
    * rolled up FROM the cells (tiny aggregates, broadcast back) — the base
    * table is scanned once. Lift `n*N/(row_n*col_n)` is one double
    * division on exact integer products. */
  def qContingency(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(spark, dir)
      .groupBy("lang", "source").agg(count(lit(1)).as("n"))
    val rowTot = cells.groupBy("lang").agg(sum("n").as("row_n"))
    val colTot = cells.groupBy("source").agg(sum("n").as("col_n"))
    val total  = broadcast(cells.agg(sum("n").as("total_n")))
    cells.join(broadcast(rowTot), Seq("lang"))
      .join(broadcast(colTot), Seq("source")).crossJoin(total)
      .withColumn("lift", (col("n") * col("total_n")).cast("double") /
        (col("row_n") * col("col_n")).cast("double"))
      .select("lang", "source", "n", "row_n", "col_n", "total_n", "lift")
      .orderBy("lang", "source")
  }

  val qContingencyOracle: String = """
    WITH c AS (SELECT lang, source, count(*) AS n
               FROM documents GROUP BY 1, 2),
    r AS (SELECT lang, CAST(sum(n) AS BIGINT) AS row_n FROM c GROUP BY 1),
    k AS (SELECT source, CAST(sum(n) AS BIGINT) AS col_n FROM c GROUP BY 1),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total_n FROM c)
    SELECT lang, source, n, row_n, col_n, total_n,
           CAST(n * total_n AS DOUBLE) / CAST(row_n * col_n AS DOUBLE) AS lift
    FROM c JOIN r USING (lang) JOIN k USING (source) CROSS JOIN t
    ORDER BY lang, source"""

  /** Language-ID evaluation: confusion matrix of the marker-based
    * classifier (qLangId's exact prediction chain) against the labeled
    * `lang` column, with per-true-language recall and the global accuracy
    * as exact integer ppm. The eval pass every production classifier
    * needs — one scan scores + predicts, one (lang, pred) hash-agg, ppm
    * windows over the BOUNDED confusion grid. */
  def qLangConfusion(spark: SparkSession, dir: String): DataFrame = {
    val preds = qLangId(spark, dir).select("doc_id", "lang", "lang_pred")
    val w     = org.apache.spark.sql.expressions.Window
    val cells = preds.groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
    cells
      .withColumn("row_n", sum("n").over(w.partitionBy("lang")))
      .withColumn("total_n", sum("n").over(w.partitionBy()))
      .withColumn("recall_ppm", expr("n * 1000000L div row_n"))
      .withColumn("is_diag", (col("lang") === col("lang_pred")).cast("int"))
      .withColumn("accuracy_ppm",
        expr("sum(CASE WHEN lang = lang_pred THEN n ELSE 0L END) over ()" +
          " * 1000000L div total_n"))
      .select("lang", "lang_pred", "n", "row_n", "recall_ppm", "is_diag",
        "accuracy_ppm")
      .orderBy("lang", "lang_pred")
  }

  val qLangConfusionOracle: String = {
    val inner = qLangIdOracle.replace("ORDER BY doc_id", "")
    s"""
    WITH pred AS ($inner),
    c AS (SELECT lang, lang_pred, count(*) n FROM pred GROUP BY 1, 2),
    m AS (SELECT *, CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) row_n,
                 CAST(sum(n) OVER () AS BIGINT) total_n,
                 CAST(sum(CASE WHEN lang = lang_pred THEN n ELSE 0 END)
                      OVER () AS BIGINT) diag_n
          FROM c)
    SELECT lang, lang_pred, n, row_n,
           CAST(n * 1000000 // row_n AS BIGINT) recall_ppm,
           CAST(lang = lang_pred AS INT) is_diag,
           CAST(diag_n * 1000000 // total_n AS BIGINT) accuracy_ppm
    FROM m ORDER BY lang, lang_pred"""
  }

  /** Train/val/test leakage audit: MinHash+LSH near-duplicate pairs
    * (q_neardup_lsh's exact pipeline) joined against the q_split hash
    * assignment — a pair whose members land in different splits leaks
    * eval signal into training. Rolls up to (split_a, split_b) cells
    * with pair counts and a canonical example pair. The two tiny split
    * lookups broadcast onto the (already small) pair set; the heavy LSH
    * phase structure is unchanged. */
  def qSplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val bkt = md5Hash32(concat(lit("split42_"), col("doc_id").cast("string"))) % 10
    val splits = Tables.documents(spark, dir).select(col("doc_id"),
      when(bkt < 8, "train").when(bkt === 8, "val").otherwise("test")
        .as("split"))
    val pairs = DedupOps.minhashNearDupsWords(Tables.documents(spark, dir),
      "doc_id", "text", Bands, Rows, JaccardThreshold)
    pairs
      .join(broadcast(splits.select(col("doc_id").as("id_a"),
        col("split").as("split_a"))), Seq("id_a"))
      .join(broadcast(splits.select(col("doc_id").as("id_b"),
        col("split").as("split_b"))), Seq("id_b"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_pairs"),
        min(struct(col("id_a"), col("id_b"))).as("ex"))
      .select(col("split_a"), col("split_b"), col("n_pairs"),
        (col("split_a") =!= col("split_b")).cast("int").as("is_leak"),
        col("ex.id_a").as("ex_a"), col("ex.id_b").as("ex_b"))
      .orderBy("split_a", "split_b")
  }

  val qSplitLeakageOracle: String = {
    val base = qNearDupLshOracle
    val cut  = base.indexOf("SELECT * FROM j")
    base.substring(0, cut) + s""",
    p AS (SELECT id_a, id_b FROM j WHERE jaccard >= $JaccardThreshold),
    sp AS (SELECT doc_id, CASE
             WHEN ('0x' || substr(md5('split42_' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10 < 8 THEN 'train'
             WHEN ('0x' || substr(md5('split42_' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10 = 8 THEN 'val'
             ELSE 'test' END AS split FROM documents),
    lab AS (SELECT id_a, id_b, a.split split_a, b.split split_b
            FROM p JOIN sp a ON id_a = a.doc_id JOIN sp b ON id_b = b.doc_id),
    g AS (SELECT split_a, split_b, count(*) n_pairs,
                 min(struct_pack(id_a := id_a, id_b := id_b)) ex
          FROM lab GROUP BY 1, 2)
    SELECT split_a, split_b, n_pairs,
           CAST(split_a <> split_b AS INT) is_leak,
           CAST(ex.id_a AS BIGINT) ex_a, CAST(ex.id_b AS BIGINT) ex_b
    FROM g ORDER BY split_a, split_b"""
  }

  /** Tokenizer vocabulary coverage / OOV-rate audit: build the top-50
    * unigram vocabulary (count desc, token asc — deterministic), then per
    * source measure total tokens, in-vocab tokens, and the OOV rate in
    * exact ppm. The vocab cut is a TakeOrderedAndProject (per-partition
    * heaps) and rides back as a broadcast semi-joinable literal set; the
    * token pass is one explode + one hash-agg. */
  def qOov(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(50)
      .select(col("tok").as("vtok"))
    toks.join(broadcast(vocab), col("tok") === col("vtok"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        count(col("vtok")).as("n_invocab"))
      .withColumn("oov_ppm",
        expr("(n_tokens - n_invocab) * 1000000L div n_tokens"))
      .orderBy("source")
  }

  val qOovOracle: String = """
    WITH t AS (SELECT source, unnest(string_split(text, ' ')) tok
               FROM documents),
    v AS (SELECT tok FROM (SELECT tok, count(*) n FROM t GROUP BY 1)
          ORDER BY n DESC, tok LIMIT 50),
    j AS (SELECT source, t.tok, v.tok vtok
          FROM t LEFT JOIN v ON t.tok = v.tok)
    SELECT source, count(*) n_tokens, count(vtok) n_invocab,
           CAST((count(*) - count(vtok)) * 1000000 // count(*) AS BIGINT) oov_ppm
    FROM j GROUP BY source ORDER BY source"""

  /** Canonical-document selection for dedup clusters: every document maps
    * to its near-dup cluster (connected components over LSH pairs;
    * singletons stay their own cluster), and the KEPT document per
    * cluster is the highest-QUALITY member (q_quality's exact score,
    * doc_id tiebreak) — the real pipeline keeps the best duplicate, not
    * the smallest id. One window argmax over cluster grain. */
  def qCanonicalDedup(spark: SparkSession, dir: String): DataFrame = {
    val clusters = DedupOps.dedupClusters(
        DedupOps.minhashNearDupsWords(Tables.documents(spark, dir), "doc_id",
          "text", Bands, Rows, JaccardThreshold))
      .select(col("id").as("doc_id"), col("cluster_id"))
    val scored = qQuality(spark, dir).select("doc_id", "quality")
      .join(broadcast(clusters), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
    // Single-pass struct argmax instead of the two windows over (quality
    // desc, doc_id) (r18, guide §2.4: the window pair exchanged AND fully
    // sorted the corpus by (cluster, quality, doc_id); the argmax is one
    // hash aggregate on the same exchange — its join-back probe reuses
    // that partitioning — and no sort at any scale). Equivalence to the
    // former rn/first_value formulation, proven field by field:
    // max(struct(quality, -doc_id, doc_id)) picks the lexicographic max —
    // highest quality first (NaN, if it could occur, sorts greatest,
    // exactly like the window's DESC NaN-first), ties broken by the
    // SMALLEST doc_id via the negation ((quality, -doc_id) is unique, so
    // the payload field never reaches comparison) — which is precisely
    // first_value over (quality DESC, doc_id ASC); and rn = 1 held for
    // exactly that row, so is_kept = (doc_id = canonical_id).
    val canon = scored.groupBy("cluster_id")
      .agg(max(struct(col("quality"), (-col("doc_id")).as("nd"),
        col("doc_id").as("d"))).as("arg"))
      .select(col("cluster_id"), col("arg.d").as("canonical_id"))
    scored.join(canon, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("canonical_id"),
        (col("doc_id") === col("canonical_id")).cast("int").as("is_kept"))
      .orderBy("doc_id")
  }

  val qCanonicalDedupOracle: String = {
    val base = qDedupClustersOracle
    val cut  = base.indexOf("SELECT doc_id, cluster_id FROM cc")
    val wc    = "CAST(CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS DOUBLE)"
    val awl   = s"(CAST(length(replace(text, ' ', '')) AS DOUBLE) / $wc)"
    val stopr = s"(CAST(${Stopwords.map(occSql).mkString("(", " + ", ")")} AS DOUBLE) / $wc)"
    val score = s"(least(1.0, $wc / 100.0) * 0.5 + (1.0 - least(1.0, abs($awl - 4.5) / 4.5)) * 0.3 + least(1.0, $stopr * 5.0) * 0.2)"
    base.substring(0, cut) + s""",
    q AS (SELECT doc_id, $score AS quality FROM documents),
    full_map AS (SELECT q.doc_id, q.quality,
                        COALESCE(cc.cluster_id, q.doc_id) cluster_id
                 FROM q LEFT JOIN cc ON q.doc_id = cc.doc_id),
    rk AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
                       ORDER BY quality DESC, doc_id) rn,
                  first_value(doc_id) OVER (PARTITION BY cluster_id
                       ORDER BY quality DESC, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING) canonical_id
           FROM full_map)
    SELECT doc_id, cluster_id, canonical_id, CAST(rn = 1 AS INT) is_kept
    FROM rk ORDER BY doc_id"""
  }

  /** Asymmetric shingle containment (sub-document / quote detection):
    * Jaccard misses a short doc fully embedded in a long one (union
    * dominates), containment |A∩B|/|A| doesn't. Candidates come from the
    * same MinHash band join as q_neardup_lsh (never all-pairs); both
    * directions' containments are exact integer ppm and pairs with
    * max-containment ≥ 0.5 survive, ≥ 0.8 flagged as sub-documents. */
  def qContainment(spark: SparkSession, dir: String): DataFrame = {
    // r18 (VERDICT r17 item 5): the pipeline runs behind the same
    // exact-duplicate contraction as q_neardup_lsh. Output-identical by
    // the contractExpandWith argument — every emitted column (inter,
    // sz_a, sz_b and the ppm containments derived from them) is a pure
    // function of the two shingle SETS, identical texts have identical
    // sets, and the symmetric max-containment filter is orientation-
    // stable under the expansion's (min, max) reorientation. Intra-group
    // member pairs (inter = sz, cont = 1 000 000 ppm ≥ 500 000) are
    // exactly what the uncontracted band join emits for identical docs
    // at jaccard 1; the contraction threshold only gates the intra arm
    // (1.0 ≥ 0.5, always true — matching the always-passing intra
    // containment). The rep-level filter below IS the declared filter,
    // evaluated on the same (inter, sz) integers.
    val pairs = DedupOps.contractExpandWith(
      Tables.documents(spark, dir), "doc_id", "text", 0.5,
      d => DedupOps.wordShingleHashes(d, "doc_id", "text"),
      sh => {
        val cand = DedupOps.lshCandidates(
          DedupOps.minhashSignatures(sh).phaseCut, Bands, Rows)
        DedupOps.jaccardOnPairs(cand, sh)
          .where(greatest(expr("inter * 1000000L div sz_a"),
            expr("inter * 1000000L div sz_b")) >= 500000)
      })
    pairs
      .withColumn("cont_a_ppm", expr("inter * 1000000L div sz_a"))
      .withColumn("cont_b_ppm", expr("inter * 1000000L div sz_b"))
      .select(col("id_a"), col("id_b"), col("inter"), col("sz_a"), col("sz_b"),
        col("cont_a_ppm"), col("cont_b_ppm"),
        (greatest(col("cont_a_ppm"), col("cont_b_ppm")) >= 800000)
          .cast("int").as("is_subdoc"))
      .orderBy("id_a", "id_b")
  }

  val qContainmentOracle: String = {
    val base = qNearDupLshOracle
    val cut  = base.indexOf("j AS (SELECT cand.id_a")
    base.substring(0, cut) + """
    jj AS (SELECT cand.id_a, cand.id_b, COALESCE(inter, 0) inter,
                  x.sz sz_a, y.sz sz_b
           FROM cand LEFT JOIN inter USING (id_a, id_b)
                     JOIN sz x ON cand.id_a = x.id
                     JOIN sz y ON cand.id_b = y.id),
    cc AS (SELECT *, CAST(inter * 1000000 // sz_a AS BIGINT) cont_a_ppm,
                  CAST(inter * 1000000 // sz_b AS BIGINT) cont_b_ppm FROM jj)
    SELECT id_a, id_b, inter, sz_a, sz_b, cont_a_ppm, cont_b_ppm,
           CAST(greatest(cont_a_ppm, cont_b_ppm) >= 800000 AS INT) is_subdoc
    FROM cc WHERE greatest(cont_a_ppm, cont_b_ppm) >= 500000
    ORDER BY id_a, id_b"""
  }

  /** Boilerplate n-gram mining (C4/Gopher-style cleaning prep): per
    * source, the word-3-grams with the highest DOCUMENT frequency — a
    * gram appearing in a large share of a source's documents is
    * boilerplate (headers, footers, templates), not content. One
    * (source, doc, gram)-distinct pass, one hash-agg, top-10 per source
    * via WindowGroupLimit; shares exact ppm. */
  def qBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("dfreq").desc, col("gram"))
    val docs = Tables.documents(spark, dir)
    // fanout before the gram explode: the fixture arrives in one split
    // (r17 — the shingle stage otherwise runs on 1 of 32 cores)
    val grams = Phase.fanout(docs).select(col("source"), col("doc_id"),
        explode(graft.functions.TextFunctions.wordShingles3(col("text")))
          .as("gram"))
      .distinct()
    val nDocs = docs.groupBy("source")
      .agg(countDistinct("doc_id").as("n_docs"))
    grams.groupBy("source", "gram").agg(count(lit(1)).as("dfreq"))
      .join(broadcast(nDocs), Seq("source"))
      .withColumn("df_ppm", expr("dfreq * 1000000L div n_docs"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 10)
      .select("source", "rn", "gram", "dfreq", "df_ppm")
      .orderBy("source", "rn")
  }

  val qBoilerplateOracle: String = """
    WITH w2 AS (SELECT source, doc_id, string_split(text, ' ') ws
                FROM documents),
    g0 AS (SELECT source, doc_id,
             unnest(list_transform(range(1, greatest(len(ws)-2,1)+1),
               i -> ws[CAST(i AS INT)] || ' ' || COALESCE(ws[CAST(i AS INT)+1],'')
                    || ' ' || COALESCE(ws[CAST(i AS INT)+2],''))) gram
           FROM w2),
    g AS (SELECT DISTINCT source, doc_id, gram FROM g0),
    nd AS (SELECT source, count(DISTINCT doc_id) n_docs
           FROM documents GROUP BY 1),
    f AS (SELECT source, gram, count(*) dfreq FROM g GROUP BY 1, 2),
    r AS (SELECT f.source, f.gram, f.dfreq, nd.n_docs,
                 row_number() OVER (PARTITION BY f.source
                                    ORDER BY dfreq DESC, gram) rn
          FROM f JOIN nd ON f.source = nd.source)
    SELECT source, CAST(rn AS INT) rn, gram, dfreq,
           CAST(dfreq * 1000000 // n_docs AS BIGINT) df_ppm
    FROM r WHERE rn <= 10 ORDER BY source, rn"""

  /** Dataset card / datasheet rollup — the one-stop per-source summary a
    * dataset release ships: documents, exact-dup rate (md5 digests),
    * token and char volumes, language mix breadth, and mean quality
    * (q_quality's exact score). One scan computes every per-doc signal;
    * one hash-agg rolls it up (the dup rate needs a distinct-digest
    * count — Spark plans it in the same Expand-fed pass). */
  def qDatasetCard(spark: SparkSession, dir: String): DataFrame = {
    val wc    = graft.functions.TextFunctions.wordCount(col("text"))
    val awl   = length(translate(col("text"), " ", "")).cast("double") /
      wc.cast("double")
    val stopr = Stopwords.map(w => occurrences(padded, s" $w ")).reduce(_ + _)
      .cast("double") / wc.cast("double")
    val score = least(lit(1.0), wc.cast("double") / 100.0) * 0.5 +
      (lit(1.0) - least(lit(1.0), abs(awl - 4.5) / 4.5)) * 0.3 +
      least(lit(1.0), stopr * 5.0) * 0.2
    // the per-doc score quantizes to integer micro-units BEFORE the sum:
    // a raw double sum is accumulation-order-dependent (the sf1 sweep
    // measured a last-ulp divergence at 10× rows), while the long sum is
    // exact at any scale and any partitioning — one division at the end
    Tables.documents(spark, dir)
      .select(col("source"), col("lang"), col("n_chars"),
        md5(col("text")).as("digest"), wc.as("toks"),
        round(score * 1e6).cast("long").as("q_ppm"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("digest").as("n_unique"),
        countDistinct("lang").as("n_langs"),
        sum("toks").as("n_tokens"),
        sum("n_chars").as("n_chars"),
        sum("q_ppm").as("q_sum_ppm"))
      .select(col("source"), col("n_docs"), col("n_unique"), col("n_langs"),
        col("n_tokens"), col("n_chars"),
        expr("(n_docs - n_unique) * 1000000L div n_docs").as("dup_ppm"),
        (col("q_sum_ppm").cast("double") / 1e6 / col("n_docs").cast("double"))
          .as("mean_quality"))
      .orderBy("source")
  }

  val qDatasetCardOracle: String = {
    val wc    = "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)"
    val awl   = s"(CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST($wc AS DOUBLE))"
    val stopr = s"(CAST(${Stopwords.map(occSql).mkString("(", " + ", ")")} AS DOUBLE) / CAST($wc AS DOUBLE))"
    val score = s"(least(1.0, CAST($wc AS DOUBLE) / 100.0) * 0.5 + (1.0 - least(1.0, abs($awl - 4.5) / 4.5)) * 0.3 + least(1.0, $stopr * 5.0) * 0.2)"
    s"""
    WITH d AS (SELECT source, lang, n_chars, md5(text) digest,
                      $wc toks,
                      CAST(round($score * 1000000.0) AS BIGINT) q_ppm
               FROM documents)
    SELECT source, count(*) n_docs,
           count(DISTINCT digest) n_unique,
           count(DISTINCT lang) n_langs,
           CAST(sum(toks) AS BIGINT) n_tokens,
           CAST(sum(n_chars) AS BIGINT) n_chars,
           CAST((count(*) - count(DISTINCT digest)) * 1000000 // count(*)
                AS BIGINT) dup_ppm,
           CAST(sum(q_ppm) AS DOUBLE) / 1000000.0 / CAST(count(*) AS DOUBLE)
             mean_quality
    FROM d GROUP BY source ORDER BY source"""
  }

  /** Quality-vs-token-budget curve: split documents into quality deciles
    * and report each decile's token mass plus the running total — the
    * curve that answers "which quality cutoff fits an N-token budget".
    *
    * Decile semantics (round 10 — the last scale-killer plan class from
    * the r9 verdict): NOT `ntile(10)` — that is a single-task global sort
    * of the whole document table — but the counting-sort rank-edge cut
    * ([[graft.ops.QuantileOps.rankEdges]]) over the score quantized to
    * ppm (`round(q·1e6)` ≤ 1e6+1 distinct values, so the only serial step
    * is O(1e6) regardless of corpus size). Ties — docs with the same
    * ppm-resolution score — land in ONE decile (qcut semantics) instead
    * of being split arbitrarily by doc_id, so deciles are equal-frequency
    * up to tie mass. Decile 1 = highest quality, as before. */
  def qQualityCurve(spark: SparkSession, dir: String): DataFrame = {
    val wc    = graft.functions.TextFunctions.wordCount(col("text"))
    val awl   = length(translate(col("text"), " ", "")).cast("double") /
      wc.cast("double")
    val stopr = Stopwords.map(w => occurrences(padded, s" $w ")).reduce(_ + _)
      .cast("double") / wc.cast("double")
    val score = least(lit(1.0), wc.cast("double") / 100.0) * 0.5 +
      (lit(1.0) - least(lit(1.0), abs(awl - 4.5) / 4.5)) * 0.3 +
      least(lit(1.0), stopr * 5.0) * 0.2
    // two consumers (edge computation + binning) → phase-cut so the text
    // scoring pipeline runs once, not once per branch
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), wc.as("toks"), score.as("q"),
        round(score * 1e6).cast("long").as("qs"))
      .phaseCut
    val edges = graft.ops.QuantileOps.rankEdges(d, "qs", 10)
    val ranked = d.crossJoin(broadcast(edges))
      .withColumn("decile",
        lit(11) - graft.ops.QuantileOps.ascBin(col("qs"), 10))
    val w = org.apache.spark.sql.expressions.Window.orderBy("decile")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    ranked.groupBy("decile")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"),
        min("q").as("min_quality"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .orderBy("decile")
  }

  val qQualityCurveOracle: String = {
    val wc    = "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)"
    val awl   = s"(CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST($wc AS DOUBLE))"
    val stopr = s"(CAST(${Stopwords.map(occSql).mkString("(", " + ", ")")} AS DOUBLE) / CAST($wc AS DOUBLE))"
    val score = s"(least(1.0, CAST($wc AS DOUBLE) / 100.0) * 0.5 + (1.0 - least(1.0, abs($awl - 4.5) / 4.5)) * 0.3 + least(1.0, $stopr * 5.0) * 0.2)"
    s"""
    WITH d AS (SELECT doc_id, $wc toks, $score q,
                      CAST(round($score * 1000000) AS BIGINT) qs
               FROM documents),
    ${graft.ops.QuantileOps.rankEdgesSql("d", "qs", 10, "e")},
    r AS (SELECT d.*, 11 - ${graft.ops.QuantileOps.ascBinSql("qs", 10, "e")}
                 AS decile
          FROM d, ee),
    g AS (SELECT decile, count(*) n_docs, CAST(sum(toks) AS BIGINT) n_tokens,
                 min(q) min_quality
          FROM r GROUP BY 1)
    SELECT CAST(decile AS INT) decile, n_docs, n_tokens, min_quality,
           CAST(sum(n_tokens) OVER (ORDER BY decile
                ROWS UNBOUNDED PRECEDING) AS BIGINT) cum_tokens
    FROM g ORDER BY decile"""
  }

  /** Decile lift table (the standard classifier-evaluation report): rank
    * documents by the quality score as the "model score" with lang='en'
    * membership as the "label", split into score deciles, and report each
    * decile's positives, cumulative capture (ppm of all positives), and
    * lift vs the base rate in exact milli. All ratios integer-exact.
    * Deciles use the same counting-sort rank-edge cut as q_quality_curve
    * (ppm-quantized score, ties share a decile, decile 1 = top scores) —
    * never a fact-grain single-task `ntile` sort. */
  def qDecileLift(spark: SparkSession, dir: String): DataFrame = {
    val wc    = graft.functions.TextFunctions.wordCount(col("text"))
    val awl   = length(translate(col("text"), " ", "")).cast("double") /
      wc.cast("double")
    val stopr = Stopwords.map(w => occurrences(padded, s" $w ")).reduce(_ + _)
      .cast("double") / wc.cast("double")
    val score = least(lit(1.0), wc.cast("double") / 100.0) * 0.5 +
      (lit(1.0) - least(lit(1.0), abs(awl - 4.5) / 4.5)) * 0.3 +
      least(lit(1.0), stopr * 5.0) * 0.2
    // two consumers (edge computation + binning) → phase-cut, as in
    // qQualityCurve
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), (col("lang") === "en").cast("long").as("pos"),
        round(score * 1e6).cast("long").as("qs"))
      .phaseCut
    val edges = graft.ops.QuantileOps.rankEdges(d, "qs", 10)
    val ranked = d.crossJoin(broadcast(edges))
      .withColumn("decile",
        lit(11) - graft.ops.QuantileOps.ascBin(col("qs"), 10))
    val byDecile = ranked.groupBy("decile")
      .agg(count(lit(1)).as("n"), sum("pos").as("n_pos"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val wCum = org.apache.spark.sql.expressions.Window.orderBy("decile")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    byDecile
      .withColumn("tot", sum("n").over(wAll))
      .withColumn("tot_pos", sum("n_pos").over(wAll))
      .withColumn("cum_pos", sum("n_pos").over(wCum))
      .select(col("decile"), col("n"), col("n_pos"),
        expr("cum_pos * 1000000L div tot_pos").as("capture_ppm"),
        expr("n_pos * 1000L * tot div (n * tot_pos)").as("lift_x1000"))
      .orderBy("decile")
  }

  val qDecileLiftOracle: String = {
    val wc    = "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)"
    val awl   = s"(CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST($wc AS DOUBLE))"
    val stopr = s"(CAST(${Stopwords.map(occSql).mkString("(", " + ", ")")} AS DOUBLE) / CAST($wc AS DOUBLE))"
    val score = s"(least(1.0, CAST($wc AS DOUBLE) / 100.0) * 0.5 + (1.0 - least(1.0, abs($awl - 4.5) / 4.5)) * 0.3 + least(1.0, $stopr * 5.0) * 0.2)"
    s"""
    WITH d AS (SELECT doc_id,
                      CASE WHEN lang = 'en' THEN 1 ELSE 0 END pos,
                      CAST(round($score * 1000000) AS BIGINT) qs
               FROM documents),
    ${graft.ops.QuantileOps.rankEdgesSql("d", "qs", 10, "e")},
    r AS (SELECT d.*, 11 - ${graft.ops.QuantileOps.ascBinSql("qs", 10, "e")}
                 AS decile
          FROM d, ee),
    g AS (SELECT decile, count(*) n, CAST(sum(pos) AS BIGINT) n_pos
          FROM r GROUP BY 1),
    t AS (SELECT *, CAST(sum(n) OVER () AS BIGINT) tot,
                 CAST(sum(n_pos) OVER () AS BIGINT) tot_pos,
                 CAST(sum(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED
                      PRECEDING) AS BIGINT) cum_pos
          FROM g)
    SELECT CAST(decile AS INT) decile, n, n_pos,
           CAST(cum_pos * 1000000 // tot_pos AS BIGINT) capture_ppm,
           CAST(n_pos * 1000 * tot // (n * tot_pos) AS BIGINT) lift_x1000
    FROM t ORDER BY decile"""
  }

  /** Exact ROC AUC (Mann–Whitney with tie-aware average ranks) of the
    * quality score against lang='en' labels — completes the classifier
    * eval trio (decile lift, KS, AUC). Grouping by the score VALUE keeps
    * everything integer: per distinct score, 2·Σ(average ranks of
    * positives) = Σ pos·(2·cum_before + cnt + 1) is an exact long, so
    * 2U = that − n_pos·(n_pos+1) and AUC = U/(n_pos·n_neg) is one final
    * division.
    *
    * The score is quantized to ppm (`round(score·1e6)`) BEFORE grouping —
    * exactly like q_quality_curve/q_decile_lift — so the cumulative
    * window's domain is capped at ~1e6 distinct values regardless of
    * corpus size (the raw double's cardinality grows with distinct
    * (word-count, letter-count, stopword-count) triples, i.e. with the
    * corpus, which would make the single-task window a 100× scale
    * hazard). Ppm ties merge into one rank group on BOTH engine and
    * oracle, so the tie-aware statistic stays exact. */
  def qAuc(spark: SparkSession, dir: String): DataFrame = {
    val wc    = graft.functions.TextFunctions.wordCount(col("text"))
    val awl   = length(translate(col("text"), " ", "")).cast("double") /
      wc.cast("double")
    val stopr = Stopwords.map(w => occurrences(padded, s" $w ")).reduce(_ + _)
      .cast("double") / wc.cast("double")
    val score = least(lit(1.0), wc.cast("double") / 100.0) * 0.5 +
      (lit(1.0) - least(lit(1.0), abs(awl - 4.5) / 4.5)) * 0.3 +
      least(lit(1.0), stopr * 5.0) * 0.2
    val perScore = Tables.documents(spark, dir)
      .select((col("lang") === "en").cast("long").as("pos"),
        round(score * 1e6).cast("long").as("s"))
      .groupBy("s").agg(count(lit(1)).as("cnt"), sum("pos").as("np"))
    val wCum = org.apache.spark.sql.expressions.Window.orderBy("s")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    perScore
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("before", col("cum") - col("cnt"))
      .agg(sum("np").as("n_pos"),
        sum(col("cnt") - col("np")).as("n_neg"),
        sum(col("np") * (col("before") * 2 + col("cnt") + 1)).as("ranksum2"))
      .select(col("n_pos"), col("n_neg"),
        ((col("ranksum2") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
          (lit(2.0) * (col("n_pos") * col("n_neg")).cast("double"))).as("auc"))
  }

  val qAucOracle: String = {
    val wc    = "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)"
    val awl   = s"(CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST($wc AS DOUBLE))"
    val stopr = s"(CAST(${Stopwords.map(occSql).mkString("(", " + ", ")")} AS DOUBLE) / CAST($wc AS DOUBLE))"
    val score = s"(least(1.0, CAST($wc AS DOUBLE) / 100.0) * 0.5 + (1.0 - least(1.0, abs($awl - 4.5) / 4.5)) * 0.3 + least(1.0, $stopr * 5.0) * 0.2)"
    s"""
    WITH d AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END pos,
                      CAST(round($score * 1000000) AS BIGINT) s FROM documents),
    g AS (SELECT s, count(*) cnt, CAST(sum(pos) AS BIGINT) np
          FROM d GROUP BY 1),
    c AS (SELECT *, CAST(sum(cnt) OVER (ORDER BY s ROWS UNBOUNDED
                 PRECEDING) AS BIGINT) cum FROM g),
    a AS (SELECT CAST(sum(np) AS BIGINT) n_pos,
                 CAST(sum(cnt - np) AS BIGINT) n_neg,
                 CAST(sum(np * ((cum - cnt) * 2 + cnt + 1)) AS BIGINT) ranksum2
          FROM c)
    SELECT n_pos, n_neg,
           CAST(ranksum2 - n_pos*(n_pos+1) AS DOUBLE)
             / (2.0 * CAST(n_pos*n_neg AS DOUBLE)) AS auc
    FROM a"""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_auc", qAuc, Some(qAucOracle)),
    QueryDef("q_decile_lift", qDecileLift, Some(qDecileLiftOracle)),
    QueryDef("q_dataset_card", qDatasetCard, Some(qDatasetCardOracle)),
    QueryDef("q_quality_curve", qQualityCurve, Some(qQualityCurveOracle)),
    QueryDef("q_containment", qContainment, Some(qContainmentOracle)),
    QueryDef("q_boilerplate", qBoilerplate, Some(qBoilerplateOracle)),
    QueryDef("q_oov", qOov, Some(qOovOracle)),
    QueryDef("q_canonical_dedup", qCanonicalDedup, Some(qCanonicalDedupOracle)),
    QueryDef("q_split_leakage", qSplitLeakage, Some(qSplitLeakageOracle)),
    QueryDef("q_lang_confusion", qLangConfusion, Some(qLangConfusionOracle)),
    QueryDef("q_text_stats", qTextStats, Some(qTextStatsOracle)),
    QueryDef("q_quality", qQuality, Some(qQualityOracle)),
    QueryDef("q_langid", qLangId, Some(qLangIdOracle)),
    QueryDef("q_fingerprint", qFingerprint, Some(qFingerprintOracle)),
    QueryDef("q_dedup_exact", qDedupExact, Some(qDedupExactOracle)),
    QueryDef("q_minhash_sig", qMinhashSig, Some(qMinhashSigOracle)),
    QueryDef("q_neardup_lsh", qNearDupLsh, Some(qNearDupLshOracle)),
    QueryDef("q_stream_neardup", qStreamNearDup, Some(qStreamNearDupOracle)),
    QueryDef("q_stream_neardup_prod", qStreamNearDupProd,
      Some(qStreamNearDupProdOracle)),
    QueryDef("q_dedup_incremental", qDedupIncremental,
      Some(qDedupIncrementalOracle)),
    QueryDef("q_embed_lsh_index", qEmbedLshIndex,
      Some(qDedupIncrementalOracle)),
    QueryDef("q_lsh_index_append", qLshIndexAppend,
      Some(qDedupIncrementalOracle)),
    QueryDef("q_ngram_jaccard", qNgramJaccard, Some(qNgramJaccardOracle)),
    QueryDef("q_tfidf", qTfidf, Some(qTfidfOracle)),
    QueryDef("q_split", qSplit, Some(qSplitOracle)),
    QueryDef("q_dedup_clusters", qDedupClusters, Some(qDedupClustersOracle)),
    QueryDef("q_triangles", qTriangles, Some(qTrianglesOracle)),
    QueryDef("q_normalize", qNormalize, Some(qNormalizeOracle)),
    QueryDef("q_simhash", qSimhash, Some(qSimhashOracle)),
    QueryDef("q_repetition", qRepetition, Some(qRepetitionOracle)),
    QueryDef("q_dup_spans", qDupSpans, Some(qDupSpansOracle)),
    QueryDef("q_bm25", qBm25, Some(qBm25Oracle)),
    QueryDef("q_minhash_est", qMinhashEst, Some(qMinhashEstOracle)),
    QueryDef("q_blocklist", qBlocklist, Some(qBlocklistOracle)),
    QueryDef("q_mix", qMix, Some(qMixOracle)),
    QueryDef("q_editdist", qEditDist, Some(qEditDistOracle)),
    QueryDef("q_contam", qContam, Some(qContamOracle)),
    QueryDef("q_sample_k", qSampleK, Some(qSampleKOracle)),
    QueryDef("q_chunk", qChunk, Some(qChunkOracle)),
    QueryDef("q_pii", qPii, Some(qPiiOracle)),
    QueryDef("q_vocab", qVocab, Some(qVocabOracle)),
    QueryDef("q_doc_lm", qDocLm, Some(qDocLmOracle)),
    QueryDef("q_pack", qPack, Some(qPackOracle)),
    QueryDef("q_contingency", qContingency, Some(qContingencyOracle)),
    QueryDef("q_dup_keep", qDupKeep, Some(qDupKeepOracle)),
    QueryDef("q_str_ops", qStrOps, Some(qStrOpsOracle)),
    QueryDef("q_balance", qBalance, Some(qBalanceOracle)))
}

package graft.queries

import graft.Tables
import graft.functions.TextFunctions
import graft.functions.TextFunctions._
import graft.ops.DedupOps
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

  /** Exact n-gram Jaccard near-dup pairs (no MinHash approximation): the
    * prefix-filtered similarity self-join (AllPairs/PPJoin family — see
    * DedupOps.ngramJaccardNearDups for the bound). The oracle states the
    * SEMANTICS the filter provably preserves — all pairs sharing ≥1
    * shingle, exact Jaccard ≥ t — so a prefix-filter bug that dropped a
    * true pair would hash-mismatch. */
  def qNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    DedupOps.ngramJaccardNearDups(
        DedupOps.wordShingleHashes(Tables.documents(spark, dir), "doc_id", "text"),
        JaccardThreshold)
      .orderBy("id_a", "id_b")

  val qNgramJaccardOracle: String = s"""
    WITH $shingleCte,
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
                    JOIN sz y ON cand.id_b = y.id)
    SELECT * FROM j WHERE jaccard >= $JaccardThreshold ORDER BY id_a, id_b"""

  /** TF-IDF top terms per document. The idf factor is the exact rational
    * N/df (score = tf·N/df with ONE float division) instead of a log —
    * same ranking monotonicity per document, and bitwise-identical across
    * engines, which a `ln()` would not guarantee. Scale shape: explode →
    * hash-agg tf → hash-agg df (tiny: one row per term, broadcast back) →
    * per-doc top-k window. */
  def qTfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nDocs = broadcast(docs.agg(count(lit(1)).as("n_docs")))
    val tf = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
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
    * Oracle: the same pair CTE + a recursive transitive closure (fine at
    * oracle scale; the engine's label propagation is the scale path). */
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
    WITH RECURSIVE $shingleCte,
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
    cc AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
           FROM reach GROUP BY a)
    SELECT doc_id, cluster_id FROM cc ORDER BY doc_id"""
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

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_text_stats", qTextStats, Some(qTextStatsOracle)),
    QueryDef("q_quality", qQuality, Some(qQualityOracle)),
    QueryDef("q_langid", qLangId, Some(qLangIdOracle)),
    QueryDef("q_fingerprint", qFingerprint, Some(qFingerprintOracle)),
    QueryDef("q_dedup_exact", qDedupExact, Some(qDedupExactOracle)),
    QueryDef("q_minhash_sig", qMinhashSig, Some(qMinhashSigOracle)),
    QueryDef("q_neardup_lsh", qNearDupLsh, Some(qNearDupLshOracle)),
    QueryDef("q_ngram_jaccard", qNgramJaccard, Some(qNgramJaccardOracle)),
    QueryDef("q_tfidf", qTfidf, Some(qTfidfOracle)),
    QueryDef("q_split", qSplit, Some(qSplitOracle)),
    QueryDef("q_dedup_clusters", qDedupClusters, Some(qDedupClustersOracle)),
    QueryDef("q_normalize", qNormalize, Some(qNormalizeOracle)),
    QueryDef("q_simhash", qSimhash, Some(qSimhashOracle)))
}

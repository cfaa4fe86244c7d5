package graft

import graft.ops.DedupOps
import graft.queries.QueriesText
import org.apache.spark.sql.functions._

/** Round-4 curation operators: sketch-accuracy audit, funnel, repetition
  * signals, BM25 ranking, blocklist filter, weighted source mixing.
  * Crafted-input exactness where the logic is injectable; independent
  * driver-side replay or internal-consistency invariants where the query
  * is bound to the fixture tables (the DuckDB oracle is the primary
  * correctness gate for those). */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat"), // near dup
    (3L, "completely different content here entirely")
  ).toDF("doc_id", "text")

  test("minhashEstimateVsExact: est is the matching-component fraction; dup pair -> (1,1,0)") {
    val sh  = DedupOps.shingleHashes(docs, "doc_id", "text", 5)
    val got = DedupOps.minhashEstimateVsExact(sh, 4, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got((0L, 1L)) == ((1.0, 1.0, 0.0)))
    val sigs = DedupOps.minhashSignatures(sh).collect()
      .map(r => r.getLong(0) -> (1 to 16).map(r.getLong)).toMap
    got.foreach { case ((a, b), (est, j, err)) =>
      val frac = sigs(a).zip(sigs(b)).count { case (x, y) => x == y } / 16.0
      assert(est == frac, s"($a,$b): est $est != component fraction $frac")
      assert(err == math.abs(est - j))
    }
  }

  test("funnel matches a driver-side replay of first-at-or-after semantics") {
    val got = SparkEntry.queries("q_funnel")(spark, dir).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    val byUser = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    var n1, n2, n3, l2, l3 = 0L
    def first(es: Array[(Long, String, Long)], t: String, lo: Long): Option[Long] = {
      val hits = es.collect { case (_, `t`, us) if us >= lo => us }
      if (hits.isEmpty) None else Some(hits.min)
    }
    byUser.values.foreach { es =>
      first(es, "signup", Long.MinValue).foreach { t1 =>
        n1 += 1
        first(es, "view", t1).foreach { t2 =>
          n2 += 1; l2 += t2 - t1
          first(es, "purchase", t2).foreach { t3 => n3 += 1; l3 += t3 - t2 }
        }
      }
    }
    assert(got("signup") == ((n1, 0L)))
    assert(got("view") == ((n2, l2)))
    assert(got("purchase") == ((n3, l3)))
  }

  test("repetition fractions are internally consistent and bounded") {
    val rows = SparkEntry.queries("q_repetition")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (wc, nd, dupF) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      val (topW, topWF)  = (r.getLong(4), r.getDouble(5))
      val (topB, topBF)  = (r.getLong(6), r.getDouble(7))
      assert(nd <= wc && topW <= wc && topB <= wc)
      assert(dupF == 1.0 - nd.toDouble / wc.toDouble)
      assert(topWF == topW.toDouble / wc.toDouble)
      assert(topBF >= 0.0 && topBF <= 1.0)
    }
  }

  test("bm25: <=10 ranked rows per term, scores non-increasing, ties doc_id-broken") {
    val byTerm = SparkEntry.queries("q_bm25")(spark, dir).collect()
      .groupBy(_.getString(0))
    assert(byTerm.keySet == QueriesText.Bm25Terms.toSet)
    byTerm.values.foreach { rows =>
      assert(rows.length <= 10)
      val ordered = rows.sortBy(_.getLong(1))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          val (sa, sb) = (a.getDouble(6), b.getDouble(6))
          assert(sa > sb || (sa == sb && a.getLong(2) < b.getLong(2)))
        case _ =>
      }
    }
  }

  test("blocklist: blocked == (total_hits > 0), terms_hit bounded by list size") {
    val rows = SparkEntry.queries("q_blocklist")(spark, dir).collect()
    assert(rows.length == Tables.documents(spark, dir).count())
    rows.foreach { r =>
      val (hit, tot, blocked) = (r.getLong(1), r.getLong(2), r.getBoolean(3))
      assert(hit <= QueriesText.Blocklist.size && hit <= tot)
      assert(blocked == (tot > 0))
    }
    assert(rows.exists(_.getBoolean(3)), "fixture should contain blocked docs")
    assert(rows.exists(!_.getBoolean(3)), "fixture should contain clean docs")
  }

  test("blocklistCounts: token/phrase arms == naive replace formula (runs, phrases, clean docs)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "error error error at boot"),              // run of 3 -> ceil(3/2) = 2
      (2L, "slow connection timeout slow slow"),      // word runs + a phrase hit
      (3L, "clean text entirely"),
      (4L, ""),                                       // empty doc
      (5L, "drop drop slow drop")                     // interleaved runs
    ).toDF("doc_id", "text")
    val terms = Seq("error", "slow", "drop", "connection timeout")

    val got = QueriesText.blocklistCounts(docs, "doc_id", "text", terms)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))

    // naive oracle: the replace-count formula over the full doc × term
    // product, replayed on the driver
    def replCount(text: String, term: String): Long = {
      val padded = s" $text "
      val needle = s" $term "
      (padded.length - padded.replace(needle, "").length) / needle.length
    }
    val expected = docs.collect().map { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val ns = terms.map(replCount(text, _))
      (id, ns.count(_ > 0).toLong, ns.sum, ns.sum > 0)
    }.sortBy(_._1)
    assert(got.sameElements(expected), s"got=${got.mkString(",")}")
    // spot-check the run semantics the equi-join arm must reproduce
    assert(got(0) == ((1L, 1L, 2L, true)))  // "error error error" -> 2
    assert(got(1) == ((2L, 2L, 3L, true)))  // slow runs 2 + phrase 1
    assert(got(3) == ((4L, 0L, 0L, false)))
  }

  test("streaming funnel (transformWithState) matches a driver-side state-machine replay") {
    import org.apache.spark.sql.functions.unix_micros
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val expected = ev.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (u, es) =>
        var t1, t2, t3 = -1L
        es.sortBy(_._3).flatMap { case (_, tpe, ts) =>
          if (t1 < 0 && tpe == "signup") { t1 = ts; Some((u, 1, ts, 0L)) }
          else if (t1 >= 0 && t2 < 0 && tpe == "view" && ts >= t1) {
            t2 = ts; Some((u, 2, ts, ts - t1))
          } else if (t2 >= 0 && t3 < 0 && tpe == "purchase" && ts >= t2) {
            t3 = ts; Some((u, 3, ts, ts - t2))
          } else None
        }
      }.toSet
    ev.as[(Long, String, Long)].write.mode("overwrite")
      .parquet(tmpPath("graft_funnel_in"))
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = spark.readStream.schema(ev.schema)
      .parquet(tmpPath("graft_funnel_in")).as[(Long, String, Long)]
    val q = graft.streaming.StreamOps.streamingFunnel(stream)
      .toDF("user_id", "stage", "ts_us", "lag_us")
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("funnel_out").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expected)
      // and the stage totals agree with the declared batch query
      val batch = SparkEntry.queries("q_funnel")(spark, dir).collect()
        .map(r => r.getLong(0).toInt -> ((r.getLong(2), r.getLong(3)))).toMap
      (1 to 3).foreach { s =>
        val stage = got.filter(_._2 == s)
        assert(batch(s) == ((stage.size.toLong, stage.toSeq.map(_._4).sum)),
          s"stage $s")
      }
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming near-dup: per-row sigs == batch sigs; candidates == batch LSH set") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val sh   = DedupOps.wordShingleHashes(docs, "doc_id", "text")
    val sigs = DedupOps.minhashSignatures(sh).collect()
      .map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toVector).toMap
    val rowSigs = docs.select(col("doc_id"),
        graft.functions.TextFunctions.rowMinhashSig(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(rowSigs == sigs, "per-row signature formulation must equal the hash-agg one")
    val t = 0.6
    val expected = DedupOps.lshCandidates(DedupOps.minhashSignatures(sh), 4, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .map { case (a, b) =>
        val est = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toDouble / 16.0
        (a, b, est)
      }.filter(_._3 >= t).toSet
    docs.as[(Long, String)].write.mode("overwrite").parquet(tmpPath("graft_snd_in"))
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = spark.readStream.schema(docs.schema)
      .parquet(tmpPath("graft_snd_in")).as[(Long, String)]
    val q = graft.streaming.StreamOps.streamingNearDup(stream, 4, 4, t)
      .toDF("id_a", "id_b", "est")
      .writeStream.outputMode("append").format("memory")
      .queryName("snd_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("snd_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected)
      assert(got.nonEmpty, "fixture should contain near-dup candidates")
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("contamination: benchmark docs excluded, ratios bounded, flag consistent") {
    val rows = SparkEntry.queries("q_contam")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, nGrams, nShared) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (ratio, flag) = (r.getDouble(3), r.getBoolean(4))
      assert(id % 17 != 0, "benchmark docs must not appear as candidates")
      assert(nGrams > 0 && nShared >= 0 && nShared <= nGrams)
      assert(math.abs(ratio - nShared.toDouble / nGrams.toDouble) == 0.0)
      assert(flag == (nShared > 0))
    }
    // the shared-vocabulary fixture must actually exhibit contamination,
    // and clean docs must exist too or the query proves nothing
    assert(rows.exists(_.getBoolean(4)))
  }

  test("mix: kept counts bounded and non-trivial; deterministic across runs") {
    val a = SparkEntry.queries("q_mix")(spark, dir).collect()
    val b = SparkEntry.queries("q_mix")(spark, dir).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    a.foreach { r =>
      val (n, kept) = (r.getLong(1), r.getLong(2))
      assert(kept <= n)
    }
    val (tot, kept) = (a.map(_.getLong(1)).sum, a.map(_.getLong(2)).sum)
    assert(kept > 0 && kept < tot, s"mix rates should be partial: $kept/$tot")
  }

  test("dup_spans: overlap-merge, abutting spans stay separate, short/unique docs absent") {
    // k=5. Shared run S = s1..s8 (8 tokens) between docs 10 and 11: hit
    // starts 1..4 merge into ONE span of 8. Doc 12: shared 5-run A,
    // one unique token, shared 5-run B — hits at 1 and 7; 7 > 1+4 so TWO
    // disjoint maximal spans (abutting dup regions, not one substring).
    // Doc 14 (unique text) and doc 15 (< 5 tokens) produce no rows.
    val s = (1 to 8).map(i => s"s$i").mkString(" ")
    val a = (1 to 5).map(i => s"a$i").mkString(" ")
    val b = (1 to 5).map(i => s"b$i").mkString(" ")
    val planted = Seq(
      (10L, s),                    // whole doc = the 8-token shared run
      (11L, s"pre1 pre2 $s"),      // same run, offset by 2
      (12L, s"$a gap $b"),         // A + unique + B
      (13L, s"$a $b"),             // carries A and B so 12's hits duplicate
      (14L, "totally unique words only once here now"),
      (15L, "s1 s2 s3")            // shorter than k -> zero grams
    ).toDF("doc_id", "text")
    val dsDir = tmpPath("dupspans-docs")
    planted.write.mode("overwrite").parquet(s"$dsDir/documents.parquet")
    val got = SparkEntry.queries("q_dup_spans")(spark, dsDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(10L) == ((1L, 8L, 8L)), s"doc 10: ${got.get(10L)}")
    assert(got(11L) == ((1L, 8L, 8L)), s"doc 11: ${got.get(11L)}")
    assert(got(12L) == ((2L, 10L, 5L)), s"doc 12: ${got.get(12L)}")
    assert(!got.contains(14L) && !got.contains(15L), got.toString)
  }
}

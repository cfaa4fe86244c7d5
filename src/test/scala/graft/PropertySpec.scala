package graft

import graft.ops.{QuantileOps, WindowOps}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants (SURVEY.md §5): per-group sum equals the last
  * cumsum; min ≤ every quantile mode ≤ max; rank is a permutation.
  * Generated inputs include nulls, constant groups, and single-element
  * groups. Uses ScalaCheck's own runner (no scalatest bridge in deps). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, Option[Double])]] =
    Gen.choose(1, 120).flatMap { n =>
      Gen.listOfN(n, for {
        g <- Gen.choose(0L, 4L)
        v <- Gen.option(Gen.choose(-50, 50).map(_.toDouble))
      } yield (g, v))
    }

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("skyline window formulation == naive O(n²) dominance filter") {
    val ptsGen: Gen[List[(Long, Long, Long)]] = Gen.choose(1, 80).flatMap { n =>
      Gen.listOfN(n, for {
        g <- Gen.choose(0L, 2L)      // brand
        x <- Gen.choose(0L, 20L)     // price (minimize)
        y <- Gen.choose(0L, 20L)     // size (maximize)
      } yield (g, x, y))
    }
    check(Prop.forAll(ptsGen) { pts =>
      val ids = pts.zipWithIndex.map { case ((g, x, y), i) => (i.toLong, g, x, y) }
      val df = ids.toDF("id", "g", "x", "y")
      val wPrev = org.apache.spark.sql.expressions.Window
        .partitionBy($"g").orderBy($"x")
        .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val wPeer = org.apache.spark.sql.expressions.Window
        .partitionBy($"g").orderBy($"x")
        .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val got = df
        .withColumn("m1", max($"y").over(wPrev))
        .withColumn("m2", max($"y").over(wPeer))
        .where(!(coalesce($"m1" >= $"y", lit(false)) || $"m2" > $"y"))
        .select("id").as[Long].collect().toSet
      val want = ids.filter { case (_, g, x, y) =>
        !ids.exists { case (_, g2, x2, y2) =>
          g2 == g && ((x2 < x && y2 >= y) || (x2 <= x && y2 > y))
        }
      }.map(_._1).toSet
      got == want
    })
  }

  test("busday closed form == brute-force weekday count (any date pair 1990-2010)") {
    // b(d) counts weekdays in [1970-01-05, d); latency = b(d2) - b(d1)
    val dayGen = Gen.choose(7305L, 14610L) // days since epoch-Monday, ~1990..2010
    check(Prop.forAll(Gen.listOfN(20, Gen.zip(dayGen, dayGen))) { pairs =>
      def b(days: Long): Long = 5 * (days / 7) + math.min(days % 7, 5L)
      def brute(d1: Long, d2: Long): Long = {
        val (lo, hi) = (math.min(d1, d2), math.max(d1, d2))
        val n = (lo until hi).count(d => d % 7 < 5).toLong
        if (d2 >= d1) n else -n
      }
      pairs.forall { case (d1, d2) => b(d2) - b(d1) == brute(d1, d2) }
    })
  }

  test("pagerank integer flow == naive in-memory replay on random bipartite graphs") {
    val edgeGen: Gen[List[(Long, Long)]] = Gen.choose(1, 40).flatMap { n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0L, 7L), Gen.choose(0L, 4L)))
    }
    check(Prop.forAll(edgeGen) { raw =>
      val edges = raw.distinct
      val degP = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val degS = edges.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      def suppRound(rp: Map[Long, Long]): Map[Long, Long] =
        edges.groupBy(_._2).view.mapValues { es =>
          150000L + 85L * es.map { case (p, _) => rp(p) / degP(p) }.sum / 100L
        }.toMap
      def partRound(rs: Map[Long, Long]): Map[Long, Long] =
        edges.groupBy(_._1).view.mapValues { es =>
          150000L + 85L * es.map { case (_, s) => rs(s) / degS(s) }.sum / 100L
        }.toMap
      val r0 = degP.keys.map(_ -> 1000000L).toMap
      val want = partRound(suppRound(partRound(suppRound(r0))))

      val df = edges.toDF("p", "s")
      val dp = df.groupBy("p").agg(count(lit(1)).as("deg_p"))
      val ds = df.groupBy("s").agg(count(lit(1)).as("deg_s"))
      def sRound(pr: org.apache.spark.sql.DataFrame) =
        df.join(pr, Seq("p")).join(dp, Seq("p"))
          .groupBy("s").agg(sum(expr("rp div deg_p")).as("inflow"))
          .select($"s", (lit(150000L) + expr("(85 * inflow) div 100")).as("rs"))
      def pRound(sr: org.apache.spark.sql.DataFrame) =
        df.join(sr, Seq("s")).join(ds, Seq("s"))
          .groupBy("p").agg(sum(expr("rs div deg_s")).as("inflow"))
          .select($"p", (lit(150000L) + expr("(85 * inflow) div 100")).as("rp"))
      val r0df = dp.select($"p", lit(1000000L).as("rp"))
      val got = pRound(sRound(pRound(sRound(r0df))))
        .as[(Long, Long)].collect().toMap
      got == want
    })
  }

  test("zorder magic-number interleave == per-bit reference loop") {
    val xyGen = Gen.listOfN(50, Gen.zip(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L)))
    check(Prop.forAll(xyGen) { pts =>
      def naive(x: Long, y: Long): Long =
        (0 until 16).map { i =>
          (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
        }.reduce(_ | _)
      def spread(v0: Long): Long = {
        val v1 = (v0 | (v0 << 8)) & 16711935L
        val v2 = (v1 | (v1 << 4)) & 252645135L
        val v3 = (v2 | (v2 << 2)) & 858993459L
        (v3 | (v3 << 1)) & 1431655765L
      }
      pts.forall { case (x, y) => (spread(x) | (spread(y) << 1)) == naive(x, y) }
    })
  }

  test("sum == last non-null cumsum per group") {
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (i.toLong, g, v) }.toDF("pos", "g", "v")
      val sums = df.groupBy("g").agg(sum("v").as("s")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      val lastCs = df
        .select(col("g"), col("pos"),
          WindowOps.cumsum(col("v"), Seq(col("g")), Seq(col("pos"))).as("cs"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("g")
            .orderBy(col("cs").isNull.asc, col("pos").desc)))
        .where(col("rn") === 1)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      sums.forall { case (g, s) =>
        (s, lastCs.get(g).flatten) match {
          case (Some(a), Some(b)) => approx(a, b)
          case (a, b)             => a == b
        }
      }
    })
  }

  test("min <= every quantile mode <= max") {
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("g", "v")
      val mm = df.groupBy("g").agg(min("v").as("mn"), max("v").as("mx"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some((r.getDouble(1), r.getDouble(2))))).toMap
      QuantileOps.groupedQuantiles(df, Seq("g"), "v", Seq(0.25, 0.5, 0.9))
        .collect().forall { r =>
          val (mn, mx) = mm(r.getLong(0)).get
          (2 to 6).forall { i =>
            r.getDouble(i) >= mn - 1e-9 && r.getDouble(i) <= mx + 1e-9
          }
        }
    })
  }

  test("rolling(k) sum matches a reference loop; null until k rows") {
    check(Prop.forAll(rowsGen) { rows =>
      val k = 3
      val data = rows.zipWithIndex
        .map { case ((g, v), i) => (i.toLong, g, v.getOrElse(0.0)) }
      val df = data.toDF("pos", "g", "v")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy("pos").rowsBetween(-(k - 1), 0)
      val got = df.select(col("pos"),
          when(count(lit(1)).over(w) === k, sum("v").over(w)).as("rs"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      val byG = data.groupBy(_._2)
      byG.forall { case (_, rs0) =>
        val rs = rs0.sortBy(_._1)
        rs.indices.forall { i =>
          val expect = if (i < k - 1) None
            else Some(rs.slice(i - k + 1, i + 1).map(_._3).sum)
          (got(rs(i)._1), expect) match {
            case (Some(a), Some(b)) => approx(a, b)
            case (a, b)             => a == b
          }
        }
      }
    })
  }

  test("fixed-width bins partition the domain: every value lands in its bin") {
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.collect { case (g, Some(v)) => (g, v) }.toDF("g", "v")
      val width = 10.0
      df.select(col("v"), floor(col("v") / width).cast("long").as("bin"))
        .collect().forall { r =>
          val v = r.getDouble(0); val b = r.getLong(1)
          v >= b * width && v < (b + 1) * width
        }
    })
  }

  test("prefix-filtered similarity join equals the naive all-pairs join") {
    // the PPJoin-style bound must never drop a true pair: on random tiny
    // corpora the prefix-filtered result has to match the exhaustive
    // all-pairs exact-Jaccard join bit for bit
    import graft.ops.DedupOps
    val vocab = Vector("the", "quick", "brown", "fox", "data", "row",
      "scan", "query", "table", "merge")
    val corpusGen: Gen[List[(Long, String)]] =
      Gen.choose(3, 7).flatMap { n =>
        Gen.sequence[List[(Long, String)], (Long, String)]((0 until n).toList.map { id =>
          Gen.choose(3, 9).flatMap(len =>
            Gen.listOfN(len, Gen.oneOf(vocab)).map(ws => (id.toLong, ws.mkString(" "))))
        })
      }
    check(Prop.forAll(corpusGen, Gen.oneOf(0.3, 0.5, 0.6, 0.8)) { (docs, t) =>
      val df = docs.toDF("doc_id", "text")
      val sh = DedupOps.wordShingleHashes(df, "doc_id", "text")
      val filtered = DedupOps.ngramJaccardNearDups(sh, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5))).toSet
      val ids = docs.map(_._1)
      val allPairs = (for { a <- ids; b <- ids if a < b } yield (a, b))
        .toDF("id_a", "id_b")
      val naive = DedupOps.jaccardOnPairs(allPairs, sh)
        .where(col("jaccard") >= t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5))).toSet
      filtered == naive
    })
  }

  test("interpolateLinear == in-memory replay on random null patterns") {
    import graft.ops.WindowOps
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (i.toLong, g, v.map(_.toLong)) }
        .toDF("pos", "g", "v")
      val got = WindowOps
        .interpolateLinear(df, "vi", col("v"), Seq(col("g")), Seq(col("pos")))
        .collect().map(r => (r.getLong(1), r.getLong(0)) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      val expected = rows.zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v) }
        .groupBy(_._1).flatMap { case (g, grp) =>
          val ordered = grp.sortBy(_._2)
          val known = ordered.zipWithIndex.collect {
            case ((_, _, Some(v)), idx) => (idx, v.toLong)
          }
          ordered.zipWithIndex.map { case ((_, pos, v), idx) =>
            (g, pos) -> (v match {
              case Some(x) => Some(x.toDouble)
              case None =>
                val prev = known.filter(_._1 < idx).lastOption
                val next = known.find(_._1 > idx)
                (prev, next) match {
                  case (Some((px, py)), Some((nx, ny))) =>
                    Some(py + (ny - py) * ((idx - px).toDouble / (nx - px).toDouble))
                  case _ => None
                }
            })
          }
        }
      got == expected
    })
  }

  test("rangeJoin == naive theta join for random intervals and bin widths") {
    // completeness + exactly-once: binning must neither drop a qualifying
    // (point, range) pair (bin-boundary/off-by-one hazards) nor emit one
    // twice (a range covering a point's bin more than once is impossible,
    // but the property pins it). Negative ordinates included — they are
    // where truncating division would misalign bins.
    import graft.ops.RelOps
    val pointsGen: Gen[List[(Long, Long, Long)]] = // (pid, key, t)
      Gen.choose(1, 25).flatMap { n =>
        Gen.sequence[List[(Long, Long, Long)], (Long, Long, Long)](
          (0 until n).toList.map { pid =>
            for { k <- Gen.choose(0L, 2L); t <- Gen.choose(-40L, 40L) }
              yield (pid.toLong, k, t)
          })
      }
    val rangesGen: Gen[List[(Long, Long, Long, Long)]] = // (rid, key, lo, hi)
      Gen.choose(1, 15).flatMap { n =>
        Gen.sequence[List[(Long, Long, Long, Long)], (Long, Long, Long, Long)](
          (0 until n).toList.map { rid =>
            for {
              k <- Gen.choose(0L, 2L); lo <- Gen.choose(-40L, 40L)
              span <- Gen.choose(0L, 25L)
            } yield (rid.toLong, k, lo, lo + span)
          })
      }
    check(Prop.forAll(pointsGen, rangesGen, Gen.oneOf(1L, 3L, 7L, 10L)) {
      (ps, rs, w) =>
        val points = ps.toDF("pid", "k", "t")
        val ranges = rs.toDF("rid", "k", "lo", "hi")
        val got = RelOps.rangeJoin(points, "t", ranges, "lo", "hi", Seq("k"), w)
          .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
        val naive = for {
          (pid, pk, t) <- ps; (rid, rk, lo, hi) <- rs
          if pk == rk && t >= lo && t <= hi
        } yield (pid, rid)
        got.length == naive.length && got.toSet == naive.toSet
    })
  }

  test("overlapJoin == naive theta join for random interval pairs") {
    // completeness + exactly-once for the interval-interval form: the
    // first-shared-bin rule (bin == max of the two start bins) must emit
    // every overlapping pair exactly once, for touching endpoints,
    // nested/identical intervals, and negative ordinates alike.
    import graft.ops.RelOps
    val ivGen: Gen[List[(Long, Long, Long, Long)]] = // (id, key, lo, hi)
      Gen.choose(1, 15).flatMap { n =>
        Gen.sequence[List[(Long, Long, Long, Long)], (Long, Long, Long, Long)](
          (0 until n).toList.map { id =>
            for {
              k <- Gen.choose(0L, 2L); lo <- Gen.choose(-40L, 40L)
              span <- Gen.choose(0L, 25L)
            } yield (id.toLong, k, lo, lo + span)
          })
      }
    check(Prop.forAll(ivGen, ivGen, Gen.oneOf(1L, 3L, 7L, 10L)) {
      (ls, rs, w) =>
        val lefts  = ls.toDF("lid", "k", "llo", "lhi")
        val rights = rs.toDF("rid", "k", "rlo", "rhi")
        val got = RelOps
          .overlapJoin(lefts, "llo", "lhi", rights, "rlo", "rhi", Seq("k"), w)
          .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
        val naive = for {
          (lid, lk, llo, lhi) <- ls; (rid, rk, rlo, rhi) <- rs
          if lk == rk && llo <= rhi && rlo <= lhi
        } yield (lid, rid)
        got.length == naive.length && got.toSet == naive.toSet
    })
  }

  test("rank(first) is a permutation of 1..n_nonnull per group") {
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (i.toLong, g, v) }.toDF("pos", "g", "v")
      df.where(col("v").isNotNull)
        .select(col("g"),
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("g").orderBy(col("v"), col("pos"))).as("rk"))
        .collect().groupBy(_.getLong(0))
        .forall { case (_, rs) =>
          rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length)
        }
    })
  }

  test("asofJoin (all directions, with/without tolerance) == brute-force scan") {
    // left/right points per key with small integer ordinates so exact-tie
    // and out-of-tolerance arms are hit often
    val sideGen = Gen.choose(0, 15).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.choose(0L, 2L)
      t <- Gen.choose(0L, 40L)
    } yield (k, t)))
    check(Prop.forAll(sideGen, sideGen) { (ls, rsRaw) =>
      // distinct right ordinates per key: duplicate ordinates make the
      // matched PAYLOAD ambiguous (any of the tied rows is a valid as-of
      // match) — same contract as the fixture queries' unique (key, ts)
      val rs = rsRaw.distinct
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("lid", "k", "lt")
      val right = rs.zipWithIndex
        .map { case ((k, t), i) => (k, t, t * 31 + i) }.toDF("k", "rt", "pay")
      val rArr = rs.zipWithIndex.map { case ((k, t), i) => (k, t, t * 31 + i) }
      val tol = 5L
      Seq("backward", "forward", "nearest").forall { dir =>
        Seq(None, Some(lit(tol))).forall { tolOpt =>
          val got = graft.ops.RelOps.asofJoin(left, right, Seq("k"),
              "lt", "rt", "pay", "m", dir, tolOpt)
            .select("lid", "m").collect()
            .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
            .toMap
          ls.zipWithIndex.forall { case ((k, t), i) =>
            // brute force: candidates on the key, filtered by direction,
            // best by distance then by the engine's deterministic pick
            val cands = rArr.filter(_._1 == k)
            val inDir = dir match {
              case "backward" => cands.filter(_._2 <= t)
              case "forward"  => cands.filter(_._2 >= t)
              case _          => cands
            }
            val best = inDir.sortBy {
              case (_, rt, _) =>
                val d = math.abs(rt - t)
                // nearest breaks distance ties backward (<=); within a
                // side, later rows (larger rt backward / processed later)
                // win because last() takes the final peer in scan order
                dir match {
                  case "nearest" => (d, if (rt <= t) 0L else 1L)
                  case _         => (d, 0L)
                }
            }.headOption
            val expected = best.filter { case (_, rt, _) =>
              tolOpt.isEmpty || math.abs(rt - t) <= tol
            }.map(_._3)
            got(i.toLong) == expected
          }
        }
      }
    })
  }

  test("triangleCounts: degree-oriented close == naive close on random graphs") {
    val graphGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(2, 14) // vertices
      m <- Gen.choose(0, 30) // candidate edges
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L)
      } yield (math.min(a, b), math.max(a, b)))
    } yield es.filter { case (a, b) => a != b }.distinct
    check(Prop.forAll(graphGen) { edges =>
      val naive = {
        val es = edges.toSet
        val tris = for {
          (x, y) <- es.toSeq; z <- (y + 1) to edges.map(_._2).maxOption.getOrElse(0L)
          if es((y, z)) && es((x, z))
        } yield (x, y, z)
        tris.flatMap { case (x, y, z) => Seq(x, y, z) }
          .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      }
      val got =
        if (edges.isEmpty) Map.empty[Long, Long]
        else graft.ops.DedupOps.triangleCounts(edges.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == naive
    })
  }
}

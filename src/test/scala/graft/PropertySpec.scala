package graft

import graft.operators.{Cdc, ConnectedComponents, Sessionize}
import org.apache.spark.sql.functions._

/** Randomized-reference tests: distributed operators vs naive in-memory
  * references on seeded random inputs. Sizes stay small (the point is
  * semantic coverage of edge shapes — ties, empty groups, chains — not
  * volume). Seeded RNG keeps failures reproducible.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def trials[A](n: Int)(gen: scala.util.Random => A)(body: A => Unit): Unit = {
    val rng = new scala.util.Random(20260812L)
    (1 to n).foreach(_ => body(gen(rng)))
  }

  test("TopKAgg equals sort-take on random multisets") {
    trials(10)(r => List.fill(40)((r.nextInt(4) + 1L, r.nextLong() % 50))) { rows =>
      {
        val df = rows.toDF("g", "v")
        val got = df.groupBy($"g")
          .agg(graft.expressions.TopKAgg.topK($"v", 3).as("tk"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
        val want = rows.groupBy(_._1).map { case (g, vs) =>
          g -> vs.map(_._2).sorted(Ordering[Long].reverse).take(3)
        }
        assert(got == want)
      }
    }
  }

  test("WordNgrams equals naive sliding-window n-grams on random texts") {
    val vocab = Vector("aa", "b", "ccc", "dd", "e")
    trials(10) { r =>
      // random token counts incl. 0 and < n; occasional double spaces
      List.fill(6)((0 to 8).map(_ => vocab(r.nextInt(vocab.size)))
        .take(r.nextInt(9)).mkString(if (r.nextBoolean()) " " else "  "))
    } { texts =>
      for (n <- 1 to 3) {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        val got = graft.operators.Dedup.shingleRows(df, "id", "text", n)
          .collect().map(r => (r.getLong(0), r.getString(1))).toSet
        val want = texts.zipWithIndex.flatMap { case (t, i) =>
          t.split(" ").filter(_.nonEmpty).sliding(n).filter(_.length == n)
            .map(g => (i.toLong, g.mkString(" "))).toSet
        }.toSet
        assert(got == want, s"n=$n texts=$texts")
        // multiplicity form: counts must match, not just the set
        val gotAll = graft.operators.Dedup.shingleRowsAll(df, "id", "text", n)
          .collect().map(r => (r.getLong(0), r.getString(1))).toList
          .groupBy(identity).view.mapValues(_.size).toMap
        val wantAll = texts.zipWithIndex.flatMap { case (t, i) =>
          t.split(" ").filter(_.nonEmpty).sliding(n).filter(_.length == n)
            .map(g => (i.toLong, g.mkString(" "))).toList
        }.groupBy(identity).view.mapValues(_.size).toMap
        assert(gotAll == wantAll)
      }
    }
  }

  test("TokenStats equals naive per-token counting on random texts") {
    val vocab = Vector("the", "la", "42", "007", "x", "æble", "de", "")
    trials(8)(r => (0 until 10).map(i =>
      (i.toLong, List.fill(r.nextInt(12))(vocab(r.nextInt(vocab.size))).mkString(" ")))) { rows =>
      {
        val df = rows.toDF("id", "text")
        val stats = df.select($"id", graft.functions.Text.tokenStats($"text").as("ts"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        rows.foreach { case (id, text) =>
          val toks = text.split(" ").filter(_.nonEmpty).toSeq
          val got = stats(id)
          assert(got(0) == toks.length)
          assert(got(1) == toks.distinct.length)
          assert(got(2) == toks.count(t => t.forall(c => c >= '0' && c <= '9')))
          assert(got(3) == toks.map(t => t.codePointCount(0, t.length)).sum)
          assert(got(4) == toks.count(graft.functions.Text.Stopwords.contains))
          graft.functions.Text.LangProfiles.zipWithIndex.foreach { case ((_, words), i) =>
            assert(got(5 + i) == toks.count(words.contains))
          }
        }
      }
    }
  }

  test("native per-row SimHash equals the explode+SimHashAgg path on random texts") {
    val vocab = Vector("alpha", "beta", "42", "x", "delta", "æøå")
    trials(8)(r => (0 until 12).map(i =>
      (i.toLong, List.fill(r.nextInt(9))(vocab(r.nextInt(vocab.size))).mkString(" ")))) { rows =>
      {
        val df = rows.toDF("doc_id", "text")
        val perRow = graft.operators.Dedup.simhashSignatures(df, "doc_id", "text")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // the independent aggregate implementation: explode token hashes,
        // bit-vote via SimHashAgg, empty docs default 0 via left join
        val agg = df.select($"doc_id", explode(graft.functions.Text.tokens($"text")).as("tok"))
          .select($"doc_id",
            expr("CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)").as("h"))
          .groupBy($"doc_id")
          .agg(graft.expressions.MinHashExpressions.simHashAgg($"h").as("sig"))
        val viaAgg = df.select($"doc_id").join(agg, Seq("doc_id"), "left")
          .select($"doc_id", coalesce($"sig", lit(0L)))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(perRow == viaAgg)
      }
    }
  }

  test("grouped prefix sum equals a naive per-group scan on random data") {
    trials(8) { r =>
      // small group count (the cliff shape), random orders incl. ties in
      // weight, unique sort keys per group
      List.fill(60)((s"g${r.nextInt(3)}", r.nextLong() % 1000, r.nextInt(9).toLong))
        .groupBy(t => (t._1, t._2)).map(_._2.head).toList // unique (g, ord)
    } { rows =>
      val df = rows.toDF("grp", "ord", "w").repartition(7)
      val got = graft.operators.GlobalRank
        .withGroupedPrefixSum(df, Seq("grp"), Seq($"ord"), $"w")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(3), r.getLong(4)))
        .toMap
      val want = rows.groupBy(_._1).flatMap { case (_, grpRows) =>
        grpRows.sortBy(_._2).zipWithIndex.scanLeft(
          (("", 0L), (0L, 0L), 0L)) { case ((_, _, acc), ((g, o, w), i)) =>
          ((g, o), (i + 1L, acc), acc + w)
        }.drop(1).map { case (k, v, _) => k -> v }
      }
      assert(got == want, s"rows=$rows")
    }
  }

  test("grouped prefix sum rejects a high-cardinality group key loudly") {
    // every row its own group, one partition: the scalar pre-pass would
    // collect O(rows) — the guard must throw, not drift toward driver OOM
    val df = (0 until 50).map(i => (s"g$i", i.toLong, 1L)).toDF("grp", "ord", "w")
      .repartition(1)
    val ex = intercept[org.apache.spark.SparkException] {
      graft.operators.GlobalRank
        .withGroupedPrefixSum(df, Seq("grp"), Seq($"ord"), $"w",
          maxGroupsPerPartition = 10)
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(causes(ex).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("too high-cardinality")), ex.getMessage)
  }

  test("intervalCoverage equals a naive point-set union on random intervals") {
    trials(8) { r =>
      List.fill(50) {
        val s = r.nextInt(60).toLong
        (s"k${r.nextInt(4)}", s, s + 1 + r.nextInt(12))
      }
    } { rows =>
      val got = graft.operators.EtlOps.intervalCoverage(
        rows.toDF("k", "s0", "e0").repartition(5), "k", "s0", "e0")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = rows.groupBy(_._1).map { case (k, rs) =>
        k -> (rs.size.toLong,
          rs.flatMap { case (_, s, e) => s until e }.toSet.size.toLong)
      }
      assert(got == want, s"rows=$rows")
    }
  }

  test("prefixJaccardPairs equals brute-force Jaccard on random near-dup texts") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    def naiveShingles(t: String, n: Int): Set[String] =
      t.split(" ").filter(_.nonEmpty).sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSet
    trials(6) { r =>
      // clusters of mutated copies so near-dup pairs actually exist
      val bases = List.fill(4)((0 until 8).map(_ => vocab(r.nextInt(vocab.size))))
      (0 until 20).map { i =>
        val b = bases(r.nextInt(bases.size)).toArray
        if (r.nextBoolean()) b(r.nextInt(b.length)) = vocab(r.nextInt(vocab.size))
        (i.toLong, b.mkString(" "))
      }.toList
    } { docs =>
      for (tau <- Seq(0.5, 0.75)) {
        val got = graft.operators.Dedup.prefixJaccardPairs(
          docs.toDF("id", "text").repartition(4), "id", "text", n = 2, tau = tau)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val sh = docs.map { case (i, t) => i -> naiveShingles(t, 2) }
          .filter(_._2.nonEmpty)
        val want = (for {
          (a, sa) <- sh; (b, sb) <- sh if a < b
          i = (sa & sb).size
          if i.toDouble / (sa.size + sb.size - i) >= tau
        } yield (a, b)).toSet
        assert(got == want, s"tau=$tau docs=$docs")
      }
    }
  }

  test("sortedNeighborhoodPairs equals the naive rank-window method") {
    val vocab = Vector("aa", "bb", "cc", "dd")
    def naiveShingles(t: String): Set[String] =
      t.split(" ").filter(_.nonEmpty).sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toSet
    trials(6) { r =>
      (0 until 25).map { i =>
        (i.toLong, (0 until 2 + r.nextInt(5))
          .map(_ => vocab(r.nextInt(vocab.size))).mkString(" "))
      }.toList
    } { docs =>
      val w = 3
      val got = graft.operators.Dedup.sortedNeighborhoodPairs(
        docs.toDF("id", "text").repartition(4), "id", "text",
        sortKey = substring(col("text"), 1, 4), w = w, n = 2, tau = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ranked = docs.map { case (i, t) => (i, t, naiveShingles(t)) }
        .filter(_._3.nonEmpty)
        .sortBy { case (i, t, _) => (t.take(4), i) }
      val want = (for {
        ((a, _, sa), ai) <- ranked.zipWithIndex
        (b, _, sb) <- ranked.slice(ai + 1, ai + 1 + w)
        i = (sa & sb).size
        if i.toDouble / (sa.size + sb.size - i) >= 0.5
      } yield (a, b)).toSet
      assert(got == want, s"docs=$docs")
    }
  }

  test("skyline2D equals the naive dominance test on random points") {
    trials(10) { r =>
      // small value domain forces x-ties, y-ties, and exact duplicates
      List.fill(50)((r.nextInt(12).toLong, r.nextInt(12).toLong, r.nextLong()))
    } { rows =>
      val df = rows.toDF("x", "y", "id").repartition(7)
      val got = graft.operators.Skyline.skyline2D(df, "x", "y")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = rows.filter { case (x, y, _) =>
        !rows.exists { case (bx, by, _) =>
          bx >= x && by >= y && (bx > x || by > y)
        }
      }.toSet
      assert(got == want, s"rows=$rows")
    }
  }

  test("skyline2D: empty input, single row, total-tie input") {
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    assert(graft.operators.Skyline.skyline2D(empty, "x", "y").isEmpty)
    val one = Seq((3L, 4L)).toDF("x", "y")
    assert(graft.operators.Skyline.skyline2D(one, "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((3L, 4L)))
    // identical points never dominate each other: all survive
    val ties = Seq((5L, 5L), (5L, 5L), (5L, 5L)).toDF("x", "y")
    assert(graft.operators.Skyline.skyline2D(ties, "x", "y").count() == 3)
  }

  test("sessionize equals a naive per-user fold on random event times") {
    trials(10)(r => List.fill(30)((r.nextInt(3) + 1L, r.nextInt(501).toLong))) { raw =>
      {
        val rows = raw.zipWithIndex.map { case ((u, sec), i) => (u, sec, i.toLong) }
        val got = Sessionize.sessions(rows.toDF("user_id", "sec", "event_id"),
          "user_id", "sec", "event_id", gapSeconds = 60L)
          .select("user_id", "n_events", "start_sec", "end_sec").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        val want = rows.groupBy(_._1).flatMap { case (u, es) =>
          val secs = es.map(_._2).sorted
          val sessions = secs.foldLeft(List.empty[List[Long]]) {
            case (cur :: rest, s) if s - cur.head <= 60L => (s :: cur) :: rest
            case (acc, s) => List(s) :: acc
          }
          sessions.map(ss => (u, ss.length.toLong, ss.min, ss.max))
        }.toSet
        assert(got == want)
      }
    }
  }

  test("cdc merge equals a naive changelog fold") {
    trials(10)(r => List.fill(20)((r.nextInt(6) + 1L, if (r.nextBoolean()) "U" else "D"))) { ops =>
      val snap = (1L to 3L).map(k => (k, s"orig$k")).toDF("k", "name")
      val changes = ops.zipWithIndex.map { case ((k, op), i) =>
        (k, s"v$i", i.toLong, op)
      }
      val got = Cdc.applyChangelog(snap, changes.toDF("k", "name", "seq", "op"),
        "k", "seq", "op")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val latest = changes.groupBy(_._1).map { case (k, cs) => k -> cs.maxBy(_._3) }
      val want = ((1L to 3L).map(k => k -> s"orig$k").toMap ++
        latest.collect { case (k, (_, v, _, "U")) => k -> v })
        .filterNot { case (k, _) => latest.get(k).exists(_._4 == "D") }
      assert(got == want)
    }
  }

  test("connected components equal a naive union-find on random edge sets") {
    trials(6)(r => List.fill(15)((r.nextInt(10) + 1L, r.nextInt(10) + 1L))) { raw =>
      val pairs = raw.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.distinct
      if (pairs.nonEmpty) {
        // default path = driver union-find on small graphs
        val got = ConnectedComponents.labels(pairs.toDF("a_id", "b_id"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // distributed min-label propagation must agree exactly
        val gotDist = ConnectedComponents.labels(pairs.toDF("a_id", "b_id"),
          driverLimit = 0)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(gotDist == got)
        // naive union-find
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        pairs.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        val want = nodes.map(n => n -> find(n)).toMap
        assert(got == want)
      }
    }
  }

  test("semDedup equals a naive assign-then-drop on random unit-ish vectors") {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    trials(6)(r => (0 until 12).map(i =>
      (i.toLong, Array.fill(4)(r.nextInt(5).toFloat + (if (r.nextBoolean()) 0.5f else 0f) + 0.1f))).toList) { vecs =>
      val stride = 3L
      val tau = 0.98
      val got = graft.operators.Dedup.semDedup(
          vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", stride, tau)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // naive reference: nearest centroid (max cosine, min-id tie), then
      // drop any vector with a same-cluster >= tau neighbor of smaller id
      val cents = vecs.filter(_._1 % stride == 0)
      val asg = vecs.map { case (id, v) =>
        val best = cents.map { case (cid, cv) => (cid, cos(v, cv)) }
          .minBy { case (cid, c) => (-c, cid) }._1
        (id, best)
      }.toMap
      val dropped = vecs.collect { case (id, v) if vecs.exists { case (oid, ov) =>
        oid < id && asg(oid) == asg(id) && cos(ov, v) >= tau } => id }.toSet
      val want = vecs.collect { case (id, _) if !dropped(id) => id -> asg(id) }.toMap
      assert(got == want, s"vecs=${vecs.map(_._1)}")
    }
  }
}

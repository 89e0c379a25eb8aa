package graft

import org.apache.spark.sql.functions._

/** Property tests for the round-4 training-pipeline queries (packing,
  * mixture weighting, decontamination, composite quality rules). The value
  * oracle is DuckDB via Verify; these assert the semantic invariants that
  * an oracle hash can't explain when it breaks.
  */
class PipelineQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("pipe_pack_bins: bins start at 0 per lang, never decrease, and match a sequential fold") {
    val rows = SparkEntry.queries("pipe_pack_bins")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("n_tokens"), r.getAs[Long]("bin")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { gRows =>
      val g = gRows.sortBy(_._2)
      // sequential re-derivation: bin = floor(exclusive prefix / 256)
      var acc = 0L
      g.foreach { case (_, _, nt, bin) =>
        assert(bin == acc / 256, s"bin mismatch at prefix $acc")
        acc += nt
      }
      assert(g.head._4 == 0L)
      assert(g.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    }
  }

  test("pipe_tokenize_ids: ids dense in [-1, V), positions contiguous, id 0 is the modal token") {
    val rows = SparkEntry.queries("pipe_tokenize_ids")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos"), r.getAs[Int]("token_id")))
    val totalTokens = Tables.documents(spark, dir)
      .select(explode(graft.functions.Text.tokens(col("text")))).count()
    assert(rows.length.toLong == totalTokens)
    assert(rows.forall { case (_, _, id) => id >= -1 && id < 16 })
    // positions are 1..n per doc with no gaps
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sorted.toSeq == (1L to g.length).toSeq)
    }
    // id 0 must be the single most frequent token overall (ties broken by
    // token text, but a strict modal winner exists in this corpus)
    val counts = Tables.documents(spark, dir)
      .select(explode(graft.functions.Text.tokens(col("text"))).as("t"))
      .groupBy("t").count().orderBy(col("count").desc, col("t")).limit(1).collect()
    val modalCount = counts.head.getAs[Long]("count")
    assert(rows.count(_._3 == 0).toLong == modalCount)
  }

  test("pipe_mixture: shares sum to 1, rates bounded, sqrt damping flattens") {
    val rows = SparkEntry.queries("pipe_mixture")(spark, dir).collect()
    assert(rows.length > 1)
    val shares = rows.map(_.getAs[Double]("share"))
    assert(math.abs(shares.sum - 1.0) < 1e-12)
    assert(rows.forall { r =>
      val rate = r.getAs[Double]("rate")
      rate > 0.0 && rate <= 1.0
    })
    // α = 0.5 damping: every language's share is closer to uniform than its
    // raw token-mass proportion (the point of temperature sampling)
    val masses = rows.map(_.getAs[Long]("sum_tokens").toDouble)
    val uniform = 1.0 / rows.length
    rows.indices.foreach { i =>
      val raw = masses(i) / masses.sum
      assert(math.abs(shares(i) - uniform) <= math.abs(raw - uniform) + 1e-12,
        s"share ${shares(i)} further from uniform than raw $raw")
    }
  }

  test("pipe_decontam: only train docs flagged, hits bounded by the doc's own 8-grams") {
    val out = SparkEntry.queries("pipe_decontam")(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hits")))
    // held-out docs (doc_id % 50 == 0) must never appear as contaminated
    assert(out.forall { case (id, _) => id % 50 != 0 })
    val grams = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), size(graft.expressions.TextExpressions.wordNgrams(
        col("text"), 8, distinct = true)).as("ng"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("ng")).toMap
    assert(out.forall { case (id, hits) => hits >= 1 && hits <= grams(id) })
    // a held-out doc's own text must collide on every one of its 8-grams:
    // plant it by checking a known duplicate pair exists in the corpus —
    // the sf0.01 corpus has exact dups (dd_exact), so if any train doc
    // duplicates a held-out doc the hit count equals its full gram count
    val dupOfEval = out.filter { case (id, hits) => grams(id) == hits }
    assert(dupOfEval.forall { case (id, _) => grams(id) > 0 })
  }

  test("ta_quality_rules: pass is exactly the conjunction; ratios well-formed on empty docs") {
    val rows = SparkEntry.queries("ta_quality_rules")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val conj = r.getAs[Boolean]("r_len") && r.getAs[Boolean]("r_wlen") &&
        r.getAs[Boolean]("r_digit") && r.getAs[Boolean]("r_rep") &&
        r.getAs[Boolean]("r_stop")
      assert(r.getAs[Boolean]("pass") == conj)
      val (dr, rr) = (r.getAs[Double]("digit_ratio"), r.getAs[Double]("rep_ratio"))
      assert(dr >= 0.0 && dr <= 1.0 && rr >= 0.0 && rr <= 1.0)
      if (r.getAs[Int]("n_tokens") == 0)
        assert(r.getAs[Double]("mean_wlen") == 0.0 && !r.getAs[Boolean]("pass"))
    }
  }
}

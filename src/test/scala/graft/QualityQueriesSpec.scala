package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the data-quality / round-4 additions — the
  * properties a DuckDB hash match can't explain when it breaks.
  */
class QualityQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("dq_profile: one row per profiled column, bounds ordered, distinct <= non-null") {
    val rows = SparkEntry.queries("dq_profile")(spark, dir).collect()
    assert(rows.map(_.getAs[String]("col_name")).sorted.toSeq ==
      Seq("l_discount", "l_extendedprice", "l_quantity"))
    val n = Tables.lineitem(spark, dir).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("non_null") == n) // testdata has no nulls here
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("non_null"))
      assert(r.getAs[Double]("min_val") <= r.getAs[Double]("max_val"))
    }
  }

  test("dq_rules: violations bounded by checked; clean testdata passes integrity") {
    val rows = SparkEntry.queries("dq_rules")(spark, dir).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val v = r.getAs[Long]("n_violations")
      assert(v >= 0 && v <= r.getAs[Long]("n_checked"))
    }
    val byRule = rows.map(r => r.getAs[String]("rule") -> r.getAs[Long]("n_violations")).toMap
    // the generated tables are referentially intact and null-free
    assert(byRule("ri_lineitem_has_order") == 0L)
    assert(byRule("o_orderdate_not_null") == 0L)
    assert(byRule("l_shipdate_not_null") == 0L)
  }

  test("q38_corr_stats: matches Spark's own corr/stddev within float tolerance") {
    val ours = SparkEntry.queries("q38_corr_stats")(spark, dir).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("corr_qty_price"), r.getAs[Double]("stddev_qty"))).toMap
    val ref = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity").cast("double"), col("l_extendedprice").cast("double")).as("c"),
        stddev_samp(col("l_quantity").cast("double")).as("s"))
      .collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("c"), r.getAs[Double]("s"))).toMap
    assert(ours.keySet == ref.keySet)
    ours.foreach { case (k, (c, s)) =>
      assert(math.abs(c - ref(k)._1) < 1e-9, s"corr $k: $c vs ${ref(k)._1}")
      assert(math.abs(s - ref(k)._2) < 1e-9, s"stddev $k: $s vs ${ref(k)._2}")
      assert(c >= -1.0 && c <= 1.0)
    }
  }

  test("q39_funnel: stage counts are monotone non-increasing and bounded by users") {
    val r = SparkEntry.queries("q39_funnel")(spark, dir).collect().head
    val (s1, s2, s3, s4) = (r.getAs[Long]("n_signup"), r.getAs[Long]("n_viewed"),
      r.getAs[Long]("n_clicked"), r.getAs[Long]("n_purchased"))
    assert(s1 >= s2 && s2 >= s3 && s3 >= s4)
    val users = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(s1 <= users)
  }

  test("pipe_stratified: unsampled strata survive whole, sampled strata shrink") {
    val docs = Tables.documents(spark, dir)
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val kept = SparkEntry.queries("pipe_stratified")(spark, dir)
      .groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    perLang.keys.foreach { l =>
      if (l == "en" || l == "zh") assert(kept.getOrElse(l, 0L) < perLang(l))
      else assert(kept.getOrElse(l, 0L) == perLang(l), s"stratum $l must be untouched")
    }
  }

  test("ta_ngram_lm: conditional probabilities in (0,1], bigram count bounded by unigram") {
    val rows = SparkEntry.queries("ta_ngram_lm")(spark, dir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (c12, c1, p) = (r.getAs[Long]("c12"), r.getAs[Long]("c1"),
        r.getAs[Double]("p_cond"))
      assert(c12 <= c1, s"${r.getAs[String]("bigram")}: c12=$c12 > c1=$c1")
      assert(p > 0.0 && p <= 1.0)
      assert(math.abs(p - c12.toDouble / c1) < 1e-15)
    }
  }

  test("etl_pii_scan: every planted entity is found and masked, nothing leaks") {
    val rows = SparkEntry.queries("etl_pii_scan")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getAs[Long]("c_custkey") % 3
      val (ph, em, masked) = (r.getAs[String]("phone_found"),
        r.getAs[String]("email_found"), r.getAs[String]("masked"))
      if (k == 0) { assert(ph.nonEmpty && em.isEmpty) }
      else if (k == 1) { assert(ph.isEmpty && em.nonEmpty) }
      else { assert(ph.nonEmpty && em.nonEmpty) }
      assert(!masked.matches(".*[0-9]{2}-[0-9]{3}-[0-9]{4}.*"), s"phone leaked: $masked")
      assert(!masked.contains("@example.com"), s"email leaked: $masked")
      if (ph.nonEmpty) assert(masked.contains("<PHONE>"))
      if (em.nonEmpty) assert(masked.contains("<EMAIL>"))
    }
  }

  test("src_merge_schema: union of both epochs, NULL where history lacked the column") {
    val out = SparkEntry.queries("src_merge_schema")(spark, dir).collect()
    assert(out.length == Tables.orders(spark, dir).count())
    out.foreach { r =>
      val key = r.getAs[Long]("o_orderkey")
      if (key % 2 == 0) assert(r.isNullAt(r.fieldIndex("o_orderstatus")))
      else assert(!r.isNullAt(r.fieldIndex("o_orderstatus")))
    }
  }

  test("dq_anomaly: flags only above-mean hours, and only a minority of them") {
    val flagged = SparkEntry.queries("dq_anomaly")(spark, dir).collect()
    val hourly = Tables.events(spark, dir)
      .select(col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("h"))
      .groupBy("event_type", "h").count().collect()
      .groupBy(_.getAs[String]("event_type"))
    flagged.foreach { r =>
      val t = r.getAs[String]("event_type")
      val counts = hourly(t).map(_.getAs[Long]("count"))
      val mean = counts.sum.toDouble / counts.length
      assert(r.getAs[Long]("n_events") > mean, s"flagged hour not above mean for $t")
    }
    val totalHours = hourly.values.map(_.length).sum
    assert(flagged.length > 0 && flagged.length < totalHours / 4,
      s"${flagged.length} of $totalHours flagged — threshold not selective")
  }

  test("etl_quarantine: exactly the violating rows, with correct reasons") {
    val out = SparkEntry.queries("etl_quarantine")(spark, dir).collect()
    val direct = Tables.lineitem(spark, dir)
      .where(col("l_quantity") > 45 || col("l_discount") > 0.08 || col("l_tax") > 0.07)
      .count()
    assert(out.length.toLong == direct)
    out.foreach { r =>
      val reasons = r.getAs[String]("reasons").split(",").toSet
      assert(reasons.nonEmpty && reasons.subsetOf(Set("qty_high", "disc_high", "tax_high")))
    }
  }

  test("etl_incr_agg: folding batches one at a time equals the full recompute") {
    import graft.operators.IncrementalAgg
    val o = Tables.orders(spark, dir)
    def rollup(df: org.apache.spark.sql.DataFrame) = df.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(8,2)")).as("total"),
        max(col("o_totalprice").cast("decimal(8,2)")).as("max_price"))
    val ops = Seq("n_orders" -> IncrementalAgg.MergeSum,
      "total" -> IncrementalAgg.MergeSum, "max_price" -> IncrementalAgg.MergeMax)
    // three sequential deltas folded into state, vs one-shot recompute
    val folded = (1 until 4).map(i => rollup(o.where(col("o_orderkey") % 4 === i)))
      .foldLeft(rollup(o.where(col("o_orderkey") % 4 === 0))) { (st, dl) =>
        IncrementalAgg.merge(st, dl, Seq("o_custkey"), ops)
      }
    val full = rollup(o)
    // merge widens decimal precision per fold — compare on doubles
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("o_custkey"), col("n_orders"),
        col("total").cast("double"), col("max_price").cast("double"))
    assert(norm(folded).exceptAll(norm(full)).isEmpty)
    assert(folded.count() == full.count())
  }

  test("src_csv_malformed: bad rows keep parseable fields and capture the raw line") {
    val rows = SparkEntry.queries("src_csv_malformed")(spark, dir).collect()
    assert(rows.length == Tables.nation(spark, dir).count())
    val (bad, good) = rows.partition(r => !r.isNullAt(r.fieldIndex("bad_line")))
    assert(bad.nonEmpty && good.nonEmpty)
    bad.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("n_nationkey"))) // busted int field
      assert(r.isNullAt(r.fieldIndex("n_regionkey")))
      assert(r.getAs[String]("n_name") != null)       // parseable field survives
      assert(r.getAs[String]("bad_line").startsWith("notanint,"))
    }
    good.foreach(r => assert(!r.isNullAt(r.fieldIndex("n_nationkey"))))
  }

  test("src_xml_roundtrip: round-trips the region table exactly") {
    val out = SparkEntry.queries("src_xml_roundtrip")(spark, dir).collect()
      .map(r => (r.getAs[Int]("r_regionkey"), r.getAs[String]("r_name")))
    val ref = Tables.region(spark, dir).orderBy("r_regionkey").collect()
      .map(r => (r.getAs[Int]("r_regionkey"), r.getAs[String]("r_name")))
    assert(out.toSeq == ref.toSeq)
  }
}

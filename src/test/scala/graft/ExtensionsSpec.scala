package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot is SQL-callable after registration") {
    GraftExtensions.register(spark)
    Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b").createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT vec_dot(a, b) AS d FROM vecs").collect().head.getDouble(0)
    assert(r == 11.0)
  }

  test("vec_norm / vec_cosine / lsh_buckets are SQL-callable") {
    GraftExtensions.register(spark)
    Seq((Array(3.0, 4.0), Array(3.0, 4.0))).toDF("a", "b").createOrReplaceTempView("vecs2")
    val row = spark.sql(
      """SELECT vec_norm(a) AS n, vec_cosine(a, b) AS c,
        | lsh_buckets(a, 4, 6, 2, 42) AS bk FROM vecs2""".stripMargin).collect().head
    assert(row.getDouble(0) == 5.0)
    assert(row.getDouble(1) == 1.0)
    val buckets = row.getSeq[Long](2)
    assert(buckets.length == 4 && buckets.forall(b => b >= 0 && b < 64))
    // identical vector -> identical buckets (determinism across calls)
    val again = spark.sql("SELECT lsh_buckets(b, 4, 6, 2, 42) AS bk FROM vecs2")
      .collect().head.getSeq[Long](0)
    assert(again == buckets)
  }

  test("top_k_agg is SQL-callable as an aggregate") {
    GraftExtensions.register(spark)
    Seq((1L, 5L), (1L, 9L), (1L, 7L), (1L, 2L), (2L, 3L)).toDF("g", "v")
      .createOrReplaceTempView("tk")
    val rows = spark.sql("SELECT g, top_k_agg(v, 2) AS t FROM tk GROUP BY g ORDER BY g")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(rows(1L) == Seq(9L, 7L) && rows(2L) == Seq(3L))
  }

  test("freq_sketch is SQL-callable and exact on a small universe") {
    GraftExtensions.register(spark)
    (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(1)("c")).toDF("item")
      .createOrReplaceTempView("fs")
    val out = spark.sql("SELECT freq_sketch(item, 8) AS sk FROM fs")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1))
    assert(out == Seq("a" -> 5L, "b" -> 3L, "c" -> 1L)) // est desc, exact here
  }

  test("the reference extraction pipeline runs as pure SQL") {
    GraftExtensions.register(spark)
    Seq(("Sagen er Anbefalet af raadet", "Godkendt den 3. maj 2024",
        "Behandling med L01XC18 godkendt", "pr. 12.1.2024"))
      .toDF("card", "date_text", "atc_text", "fallback")
      .createOrReplaceTempView("cards_sql")
    val r = spark.sql(
      """SELECT classify_status(card) AS status,
        | CAST(danish_date(date_text) AS STRING) AS d,
        | extract_atc(atc_text) AS atc,
        | extract_date(fallback) AS fd,
        | text_fingerprint(card) AS fp FROM cards_sql""".stripMargin).collect().head
    assert(r.getString(0) == "Anbefalet")
    assert(r.getString(1) == "2024-05-03")
    assert(r.getString(2) == "L01XC18")
    assert(r.getString(3) == "12.1.2024")
    assert(r.getString(4).length == 32) // md5 hex
  }

  test("simhash is SQL-callable and matches the batch signature path") {
    GraftExtensions.register(spark)
    Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
      .createOrReplaceTempView("sh_docs")
    val viaSql = spark.sql("SELECT simhash(text) AS s FROM sh_docs")
      .collect().head.getLong(0)
    val viaBatch = graft.operators.Dedup.simhashSignatures(
      Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head.getLong(1)
    assert(viaSql == viaBatch && viaSql != 0L)
  }

  test("minhash_signature is SQL-callable and matches the Column API") {
    GraftExtensions.register(spark)
    Seq(("alpha beta gamma delta", 1)).toDF("text", "i")
      .createOrReplaceTempView("mh_docs")
    val viaSql = spark.sql(
      "SELECT minhash_signature(word_ngrams(text, 3, true), 16) AS sig FROM mh_docs")
      .collect().head.getSeq[Long](0)
    val viaCol = Seq(("alpha beta gamma delta", 1)).toDF("text", "i")
      .select(graft.expressions.MinHashExpressions.minHashSignature(
        graft.expressions.TextExpressions.wordNgrams($"text", 3, distinct = true), 16))
      .collect().head.getSeq[Long](0)
    assert(viaSql == viaCol && viaSql.length == 16)
    // default k
    assert(spark.sql(
      "SELECT size(minhash_signature(word_ngrams(text, 3, true))) FROM mh_docs")
      .collect().head.getInt(0) == 128)
  }

  test("word_ngrams is SQL-callable") {
    GraftExtensions.register(spark)
    Seq(("a b c d", 1)).toDF("s", "i").createOrReplaceTempView("wn")
    val rows = spark.sql(
      "SELECT word_ngrams(s, 2, true) AS g FROM wn").collect().head.getSeq[String](0)
    assert(rows == Seq("a b", "b c", "c d"))
  }

  test("split_first is SQL-callable with multiple separators") {
    GraftExtensions.register(spark)
    Seq(("Keytruda - pembrolizumab", 1), ("no separator here", 2))
      .toDF("s", "i").createOrReplaceTempView("sf")
    val rows = spark.sql(
      "SELECT i, split_first(s, ' - ', ': ').head AS h, split_first(s, ' - ', ': ').tail AS t FROM sf")
      .collect().map(r => r.getInt(0) -> (r.getString(1), Option(r.getString(2)))).toMap
    assert(rows(1) == (("Keytruda", Some("pembrolizumab"))))
    assert(rows(2) == (("no separator here", None)))
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    val restore = Seq(
      "spark.sql.adaptive.enabled", "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.skewJoin.enabled", "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // shrink the skew thresholds so test-sized data triggers the path
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      import spark.implicits._
      // one key carries ~90% of the fact side
      val large = (1 to 200000)
        .map(i => (if (i <= 180000) 7L else i.toLong, s"payload_$i")).toDF("k", "v")
      val small = (0 to 300000 by 7).map(i => (i.toLong, i * 2)).toDF("k", "w")
      val joined = large.join(small, "k")
      // execute THIS frame (count() plans a separate aggregate query and
      // the adaptive plan only finalizes on execution)
      val n = joined.collect().length
      assert(n == 180000 + (1 to 200000).count(i => i > 180000 && i % 7 == 0))
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), s"skew split did not fire:\n$finalPlan")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join equals plain join on skewed data") {
    // one hot key (90% of rows) + a tail
    val large = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i)).toDF("k", "v")
    val small = Seq((1L, "hot"), (950L, "cold")).toDF("k", "name")
    val plain = large.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedEquiJoin(large, small, "k", salt = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain && plain.size == 901)
    // left join keeps unmatched large-side rows exactly once
    val leftPlain = large.join(small, Seq("k"), "left").count()
    val leftSalted = SkewJoin.saltedEquiJoin(large, small, "k", salt = 8, "left").count()
    assert(leftSalted == leftPlain)
    // Spark's short aliases stay accepted
    assert(SkewJoin.saltedEquiJoin(large, small, "k", salt = 8, "semi").count() == 901)
    assert(SkewJoin.saltedEquiJoin(large, small, "k", salt = 8, "anti").count() == 99)
    // right/full outer would emit each unmatched small-side row `salt`
    // times — rejected up front
    intercept[IllegalArgumentException] {
      SkewJoin.saltedEquiJoin(large, small, "k", salt = 8, "right_outer")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedEquiJoin(large, small, "k", salt = 8, "full")
    }
  }
}

package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Batch-vs-corpus incremental dedup: exactness against brute force on the
  * real documents table, the corpus-only contract, and the append flow a
  * continuously-ingested corpus runs (index grows by each batch's
  * survivors; later batches dedup against it).
  */
class IncrementalDedupSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("survivors equal brute-force exact+hamming<=3 against the corpus") {
    val docs = Tables.documents(spark, dir)
    val corpus = docs.where(col("doc_id") % 5 =!= 0)
    val batch = docs.where(col("doc_id") % 5 === 0)
    val got = Dedup
      .incrementalSurvivors(batch, Dedup.dedupIndex(corpus, "doc_id", "text"),
        "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet

    val sig = Dedup.dedupIndex(docs, "doc_id", "text")
    val b = sig.where(col("id") % 5 === 0).select(col("id"), col("fp"), col("simhash"))
    val c = sig.where(col("id") % 5 =!= 0)
      .select(col("id").as("cid"), col("fp").as("cfp"), col("simhash").as("csh"))
    val dropped = b.crossJoin(c)
      .where(col("fp") === col("cfp") ||
        bit_count(col("simhash") bitwiseXOR col("csh")) <= 3)
      .select("id").as[Long].collect().toSet
    val expected =
      b.select("id").as[Long].collect().toSet -- dropped
    assert(got === expected)
    assert(got.nonEmpty, "degenerate test: no batch row survived")
  }

  test("within-batch duplicates are out of scope: both rows survive") {
    val corpus = Seq((1L, "entirely unrelated corpus writing sample")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over dogs"),
      (11L, "the quick brown fox jumps over dogs")).toDF("doc_id", "text")
    val out = Dedup.incrementalSurvivors(
      batch, Dedup.dedupIndex(corpus, "doc_id", "text"), "doc_id", "text")
    assert(out.select("doc_id").as[Long].collect().toSet === Set(10L, 11L))
  }

  test("bloom prefilter path equals the plain exact anti-join") {
    val docs = Tables.documents(spark, dir)
    val corpus = docs.where(col("doc_id") % 5 =!= 0)
    val batch = docs.where(col("doc_id") % 5 === 0)
    val corpusFps = corpus
      .select(graft.functions.Text.fingerprint(col("text")).as("fp"))
    val got = Dedup.bloomSurvivors(batch, corpusFps, "doc_id", "text",
      expectedItems = 10000L)
    // same columns, same rows as the naive anti-join on the fingerprint
    assert(got.columns.toSeq === batch.columns.toSeq)
    val expected = batch
      .withColumn("__fp", graft.functions.Text.fingerprint(col("text")))
      .join(corpusFps.withColumnRenamed("fp", "__fp"), Seq("__fp"), "left_anti")
      .drop("__fp")
      .select("doc_id").as[Long].collect().toSet
    assert(got.select("doc_id").as[Long].collect().toSet === expected)
    assert(expected.nonEmpty, "degenerate test: no batch row survived")
  }

  test("bloom prefilter with a tiny (high-fpp) sketch is still exact") {
    val docs = Tables.documents(spark, dir)
    val corpusFps = docs.where(col("doc_id") % 5 =!= 0)
      .select(graft.functions.Text.fingerprint(col("text")).as("fp"))
    val batch = docs.where(col("doc_id") % 5 === 0)
    // 64 bits for thousands of items: nearly every probe is a false
    // positive, so nearly every row takes the anti-join rescue path —
    // the answer must not change
    val tiny = Dedup.bloomSurvivors(batch, corpusFps, "doc_id", "text",
      expectedItems = 8L, numBits = 64L)
    val sized = Dedup.bloomSurvivors(batch, corpusFps, "doc_id", "text",
      expectedItems = 10000L)
    assert(tiny.select("doc_id").as[Long].collect().toSet ===
      sized.select("doc_id").as[Long].collect().toSet)
  }

  test("bloom prefilter: empty corpus lets the whole batch through") {
    val batch = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val noFps = spark.emptyDataFrame
      .select(lit("x").as("fp")).where(lit(false))
    val out = Dedup.bloomSurvivors(batch, noFps, "doc_id", "text",
      expectedItems = 10L)
    assert(out.select("doc_id").as[Long].collect().toSet === Set(1L, 2L))
  }

  test("bloom prefilter rejects a driver-hostile sketch size") {
    val batch = Seq((1L, "a")).toDF("doc_id", "text")
    val fps = Seq("f").toDF("fp")
    assertThrows[IllegalArgumentException] {
      Dedup.bloomSurvivors(batch, fps, "doc_id", "text",
        expectedItems = 1L, numBits = 8L * 300 * 1024 * 1024)
    }
  }

  test("bucketed stored index: anti-join leg never shuffles the index side") {
    // the production shape for continuous ingest: the (id, fp, simhash)
    // index lives as a table bucketed by fp, so every batch's exact-dup
    // anti-join reads co-located index buckets directly — one write-time
    // shuffle amortized over every subsequent ingest batch; only the
    // (small) batch side shuffles per batch
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS dd_index_bkt")
      val loc = new java.io.File(new java.net.URI(
        spark.conf.get("spark.sql.warehouse.dir") + "/dd_index_bkt"))
      if (loc.exists()) { loc.listFiles().foreach(_.delete()); loc.delete() }
      val docs = Tables.documents(spark, dir)
      val corpus = docs.where(col("doc_id") % 5 =!= 0)
      val batch = docs.where(col("doc_id") % 5 === 0)
      graft.sources.Sources.writeBucketed(
        Dedup.dedupIndex(corpus, "doc_id", "text"), "dd_index_bkt",
        Seq("fp"), 8, sortCols = Seq("fp"))
      val stored = spark.table("dd_index_bkt")

      // same survivors as the in-memory-index run
      val got = Dedup.incrementalSurvivors(batch, stored, "doc_id", "text")
        .select("doc_id").as[Long].collect().toSet
      val expected = Dedup.incrementalSurvivors(batch,
        Dedup.dedupIndex(corpus, "doc_id", "text"), "doc_id", "text")
        .select("doc_id").as[Long].collect().toSet
      assert(got === expected)

      // the exact-dup anti-join: exactly ONE shuffle (the batch side);
      // the index side must be the bucketed scan
      val leg = Dedup.dedupIndex(batch, "doc_id", "text")
        .join(stored.select($"fp"), Seq("fp"), "left_anti")
      leg.collect()
      def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          shuffles(a.executedPlan)
        // AQE wraps materialized stages: children is Nil, recurse via plan
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          shuffles(q.plan)
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
          1 + s.children.map(shuffles).sum
        case o => o.children.map(shuffles).sum
      }
      assert(shuffles(leg.queryExecution.executedPlan) === 1,
        s"expected only the batch-side shuffle:\n${leg.queryExecution.executedPlan}")
      val plan = leg.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"bucketed index scan not used:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("append flow: a later batch dedups against earlier survivors") {
    val corpus = Seq((1L, "seed corpus document number one")).toDF("doc_id", "text")
    val batch1 = Seq(
      (10L, "fresh novel batch-one writing example"),
      (11L, "Seed Corpus DOCUMENT number one")) // exact dup of 1 normalized
      .toDF("doc_id", "text")
    val idx1 = Dedup.dedupIndex(corpus, "doc_id", "text")
    val surv1 = Dedup.incrementalSurvivors(batch1, idx1, "doc_id", "text")
    assert(surv1.select("doc_id").as[Long].collect().toSet === Set(10L))

    // the index grows by the survivors' three columns — no text re-read
    val idx2 = idx1.unionByName(Dedup.dedupIndex(surv1, "doc_id", "text"))
    val batch2 = Seq(
      (20L, "fresh novel batch-one writing example"), // dup of survivor 10
      (21L, "completely different batch-two content")).toDF("doc_id", "text")
    val surv2 = Dedup.incrementalSurvivors(batch2, idx2, "doc_id", "text")
    assert(surv2.select("doc_id").as[Long].collect().toSet === Set(21L))
  }
}

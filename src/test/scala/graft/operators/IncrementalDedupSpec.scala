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

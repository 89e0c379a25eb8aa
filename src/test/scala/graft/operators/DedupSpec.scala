package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
    "lambda mu nu xi omicron pi rho sigma tau upsilon"

  // 3 planted near-dup pairs + unrelated docs
  private def corpus = Seq(
    (1L, base, "s1"), (2L, base + " phi", "s1"),                    // ~0.87 trigram j
    (3L, "one two three four five six seven eight nine ten", "s2"),
    (4L, "one two three four five six seven eight nine ten", "s2"), // exact dup
    (5L, "totally different words in this particular document here", "s3"),
    (6L, "x", "s3"), (7L, "", "s3")                                  // shorter than n
  ).toDF("doc_id", "text", "source")

  test("shingles: short/empty docs yield empty set instead of crashing") {
    val rows = corpus.select($"doc_id", Dedup.shingles("text", 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).length).toMap
    assert(rows(6L) == 0 && rows(7L) == 0)
    assert(rows(1L) == 18) // 20 tokens → 18 trigrams
  }

  test("exact dedup groups identical normalized text, keeps min id") {
    val r = Dedup.exact(corpus, "doc_id", "text")
      .where($"n_dups" > 1).collect()
    assert(r.length == 1 && r.head.getAs[Long]("keep_id") == 3L)
  }

  test("containment flags a short doc quoted in a long one that jaccard misses") {
    // doc 11 is the first quarter of doc 10: containment = 1.0, but the
    // size gap pins jaccard near |A|/|B| ≈ 0.2 — the asymmetric case
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val short = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq((10L, long, "s1"), (11L, short, "s1"),
      (12L, "unrelated other stuff entirely different", "s1"))
      .toDF("doc_id", "text", "source")
    val cont = Dedup.containmentPairsBlocked(docs, "doc_id", "text", "source",
      n = 3, minContainment = 0.9).collect()
    assert(cont.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((10L, 11L)))
    assert(cont.head.getAs[Double]("containment") == 1.0)
    val jac = Dedup.jaccardPairsBlocked(docs, "doc_id", "text", "source",
      n = 3, minJaccard = 0.5).collect()
    assert(jac.isEmpty, "jaccard should miss the asymmetric pair")
  }

  test("minhash LSH finds every planted pair a brute-force scan finds") {
    val brute = Dedup.jaccardPairsBlocked(
      corpus.withColumn("all", lit(1)), "doc_id", "text", "all", 3, 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(corpus, "doc_id", "text", tau = 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty && lsh == brute)
  }

  test("simhashPairs: finds near-identical pair, rejects maxDist > 3") {
    val pairs = Dedup.simhashPairs(corpus.where(length($"text") > 5), "doc_id", "text")
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((3L, 4L))) // identical docs → hamming 0
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(corpus, "doc_id", "text", maxDist = 4)
    }
  }

  test("embedding LSH pairs: exact precision, high recall vs brute force") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val tau = 0.4 // max pair cosine in this synthetic data is ~0.48
    // brute force = blocked path with a single constant block
    val brute = Dedup.embeddingPairsBlocked(
      emb.withColumn("all", lit(1)), "vec_id", "embedding", "all", tau)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingPairsLsh(emb, "vec_id", "embedding", tau)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision is exact by construction (cosine verified); recall < 1
    assert(lsh.subsetOf(brute), s"false positives: ${lsh -- brute}")
    assert(brute.nonEmpty)
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall=$recall over ${brute.size} true pairs")
  }

  test("embedding near-dup pairs respect block + threshold") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0), (2L, Array(0.99f, 0.1f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f, 0.0f), 0), (4L, Array(1.0f, 0.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingPairsBlocked(emb, "vec_id", "embedding", "label", 0.9)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L))) // 1-4 identical but cross-block; 1-3 orthogonal
  }

  test("semDedup drops the higher-id member of each in-cluster near-dup pair") {
    // stride=2 → centroids are the even ids. 1 is a near-dup of 0 (same
    // cluster), 3 of 2; 5 has no >= tau neighbor and must survive even
    // though it shares cluster 0 (cosine to centroids 0 and 2 ties at
    // 0.707 → smaller c_id wins)
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.98f, 0.15f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (5L, Array(0.5f, 0.5f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = Dedup.semDedup(emb, "vec_id", "embedding", stride = 2, tau = 0.95)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.keySet == Set(0L, 2L, 4L, 5L), s"survivors=${r.keySet}")
    assert(r(5L) == 0L, s"tie must break toward the smaller centroid: ${r(5L)}")
  }
}

package graft.operators

import graft.functions.{Text, Vectors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for document / embedding corpora.
  *
  * Scale contract: nothing here does a global cross join. Pairwise work is
  * bounded either by an explicit blocking key (source, label, ...) or by
  * MinHash-LSH banding, both of which shuffle linearly in corpus size and
  * only go quadratic inside a candidate bucket.
  */
object Dedup {

  /** Exact dedup on normalized text: one row per distinct fingerprint with
    * the surviving (minimum) id and the duplicate count.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(Text.fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Distinct word n-gram shingles of `textCol`. n=1 → token set. Docs
    * with fewer than n tokens (incl. empty text) yield an empty set — the
    * guard matters because sequence(0, size-n) would otherwise descend.
    */
  def shingles(textCol: String, n: Int): org.apache.spark.sql.Column = {
    val toks = Text.tokens(col(textCol))
    if (n == 1) array_distinct(toks)
    else array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
        .otherwise(array().cast("array<string>")))
  }

  /** Pairwise Jaccard ≥ minJaccard within blocks of `blockCol`. Output:
    * (a_id, b_id, jaccard), a_id < b_id. Jaccard is computed on distinct
    * n-gram shingle sets and rounded to 6 places.
    */
  def jaccardPairsBlocked(df: DataFrame, idCol: String, textCol: String,
                          blockCol: String, n: Int, minJaccard: Double): DataFrame = {
    // docs with an empty shingle set can't be near anything and would
    // divide by zero (ANSI) in the jaccard — drop them up front
    val sh = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
      shingles(textCol, n).as("sh"))
      .where(size(col("sh")) > 0)
    // distinct column names on the two sides: a self-join on a shared
    // lineage would resolve `blk === blk` to the SAME attribute
    // (trivially true) and silently degrade into a global cross join
    val a = sh.select(col("blk").as("a_blk"), col("id").as("a_id"), col("sh").as("a_sh"))
    val b = sh.select(col("blk").as("b_blk"), col("id").as("b_id"), col("sh").as("b_sh"))
    a.join(b, col("a_blk") === col("b_blk") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          size(array_union(col("a_sh"), col("b_sh")))).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** MinHash + LSH near-dup pairs, verified with exact Jaccard.
    *
    * k minhashes from salted xxhash64 over distinct `n`-gram shingles;
    * `bands` bands of k/bands rows; docs sharing any band bucket become
    * candidates; candidates are verified against exact Jaccard ≥ tau.
    * With (k=128, b=32, r=4), P(miss | j=0.8) = (1-0.8^4)^32 ≈ 5e-8 — the
    * verified output equals the brute-force pair set w.h.p., which is what
    * the oracle checks — while a j=0.1 pair is a candidate with p≈0.003,
    * keeping the verify stage linear-ish at corpus scale.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      tau: Double, n: Int = 3, k: Int = 128, bands: Int = 32): DataFrame = {
    require(k % bands == 0)
    val r = k / bands
    val toks = df.select(col(idCol).as("id"), shingles(textCol, n).as("sh"))
      .where(size(col("sh")) > 0)
    val sig = toks.select(col("id"), col("sh"),
      array((0 until k).map(i =>
        array_min(transform(col("sh"), t => xxhash64(lit(i), t)))): _*).as("sig"))
    val bandRows = sig.select(col("id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        j => struct(j.as("band"), xxhash64(slice(col("sig"), j * r + 1, lit(r))).as("bh"))))
        .as("b"))
      .select(col("id"), col("b.band"), col("b.bh"))
    val cand = bandRows.as("x").join(bandRows.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"))
      .distinct()
    cand.join(toks.select(col("id"), col("sh").as("a_sh")), col("a_id") === col("id")).drop("id")
      .join(toks.select(col("id"), col("sh").as("b_sh")), col("b_id") === col("id")).drop("id")
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          size(array_union(col("a_sh"), col("b_sh")))).as("jaccard"))
      .where(col("jaccard") >= tau)
  }

  /** Per-document 60-bit SimHash signatures (portable md5-based hashes). */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), expr(Text.simhashSql(textCol)).as("simhash"))

  /** SimHash near-dup pairs: Hamming distance ≤ maxDist, candidate-bounded
    * by matching on one of 4 15-bit signature quarters (any pair within
    * Hamming ≤ 3 must agree on at least one quarter).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    // 4 blocking quarters guarantee a shared quarter only for Hamming <= 3.
    require(maxDist <= 3, s"4-quarter blocking loses recall beyond Hamming 3 (got $maxDist)")
    val sigs = simhashSignatures(df, idCol, textCol)
      .select(col(idCol).as("id"), col("simhash"))
    val quarters = sigs.select(col("id"), col("simhash"),
      explode(array((0 until 4).map(q =>
        struct(lit(q).as("q"),
          (shiftright(col("simhash"), q * 15) bitwiseAND lit(0x7fffL)).as("qv"))): _*)).as("p"))
      .select(col("id"), col("simhash"), col("p.q"), col("p.qv"))
    val cand = quarters.as("x").join(quarters.as("y"),
        col("x.q") === col("y.q") && col("x.qv") === col("y.qv") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("x.simhash").as("a_sig"),
        col("y.id").as("b_id"), col("y.simhash").as("b_sig"))
      .distinct()
    cand.select(col("a_id"), col("b_id"),
        bit_count(col("a_sig") bitwiseXOR col("b_sig")).as("hamming"))
      .where(col("hamming") <= maxDist)
  }

  /** Embedding near-dup pairs: cosine ≥ tau within `blockCol` blocks. */
  def embeddingPairsBlocked(df: DataFrame, idCol: String, vecCol: String,
                            blockCol: String, tau: Double): DataFrame = {
    val v = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
      Vectors.toDoubleArray(col(vecCol)).as("v"))
    val a = v.select(col("blk").as("a_blk"), col("id").as("a_id"), col("v").as("a_v"))
    val b = v.select(col("blk").as("b_blk"), col("id").as("b_id"), col("v").as("b_v"))
    a.join(b, col("a_blk") === col("b_blk") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (Vectors.dot(col("a_v"), col("b_v")) /
          (Vectors.norm(col("a_v")) * Vectors.norm(col("b_v")))).as("cosine"))
      .where(col("cosine") >= tau)
  }
}

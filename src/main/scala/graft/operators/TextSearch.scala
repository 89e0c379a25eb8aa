package graft.operators

import graft.expressions.TextExpressions
import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over a document corpus: BM25 ranked search and exact
  * positional phrase search — the inverted-index query shapes, re-expressed
  * as linear posting shuffles instead of a posting-list server.
  *
  * Scale contract: the corpus token stream is filtered against the
  * (broadcast, tiny) query-term set BEFORE any shuffle, so the posting
  * shuffle carries only matching terms — at 100 TB the exchange is sized by
  * hits, not by the token stream. Corpus-level statistics (N, avgdl) ride
  * in as broadcast 1-row aggregates, never a driver-side count.
  */
object TextSearch {

  /** BM25 top-k retrieval for a small query set.
    *
    * `queries` is a tiny (query_id, term) table — one row per query term —
    * and is broadcast. Scoring uses the standard BM25 term saturation
    *   idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * with the RATIONAL idf (N − df + ½)/(df + ½): the classic ln() form
    * differs in the last ulp across engines (the SURVEY §6 rule), while
    * +,·,/ on doubles are IEEE-identical, so ranks are bit-reproducible.
    * The per-(query, doc) score is an order-pinned left fold over term
    * order — double addition does not associate (the q55/q52 rule).
    *
    * df(t) is document frequency among query terms only: the posting
    * stream is semi-joined to the term set before the df aggregation, so
    * no full-vocabulary aggregate ever materializes.
    *
    * Output: (query_id, doc_id, n_hit, score, rank ≤ topK).
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queries: DataFrame, k1: Double = 1.5, b: Double = 0.75,
           topK: Int = 10): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      Text.tokens(col(textCol)).as("__toks"))
    val dl = toks.select(col("doc_id"), size(col("__toks")).as("dl"))
    val termSet = queries.select(col("term")).distinct()
    // posting stream filtered to query terms BEFORE the (doc, term) shuffle
    val post = toks.select(col("doc_id"), explode(col("__toks")).as("term"))
      .join(broadcast(termSet), "term")
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    bm25FromIndex(post, dl, queries, k1, b, topK)
  }

  /** BM25 scoring from a MATERIALIZED lexical index — `post` (doc_id,
    * term, tf) already restricted to the query-term set, `dl` (doc_id,
    * dl). The streaming twin maintains exactly these two tables
    * incrementally (documents are append-only, so epoch postings just
    * union in) and scores from the index alone; [[bm25]] derives them
    * from the corpus in one pass. Same formula, same pinned fold, same
    * bit-reproducibility contract.
    */
  def bm25FromIndex(post: DataFrame, dl: DataFrame, queries: DataFrame,
                    k1: Double = 1.5, b: Double = 0.75,
                    topK: Int = 10): DataFrame = {
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    // df over the filtered postings: |terms| rows, broadcast back
    val dfreq = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val contrib = post
      .join(broadcast(queries), "term")
      .join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"), col("term"),
        ((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("c"))
    val scored = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_hit"),
        aggregate(
          transform(array_sort(collect_list(struct(col("term"), col("c")))),
            x => x.getField("c")),
          lit(0.0), (acc, x) => acc + x).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= topK)
  }

  /** Exact positional phrase search: every (phrase, doc) occurrence count
    * plus the first match position, for a literal set of 2- and 3-word
    * phrases.
    *
    * ONE corpus scan, ZERO pre-aggregation shuffle: both n-gram arrays come
    * from the native single-pass WordNgrams expression (order-preserving,
    * so the array index IS the token position), the phrase filter runs
    * inside an array `filter` lambda on the scan, and only surviving
    * (phrase, doc, pos) hits reach the groupBy. No posexplode-then-window
    * reconstruction of adjacency, no self-join on positions.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrases2: Seq[String], phrases3: Seq[String]): DataFrame = {
    def hits(n: Int, phrases: Seq[String]) =
      filter(
        transform(TextExpressions.wordNgrams(col(textCol), n, distinct = false),
          (g, i) => struct(i.as("pos"), g.as("phrase"))),
        s => s.getField("phrase").isin(phrases: _*))
    docs
      .select(col(idCol).as("doc_id"),
        explode(concat(hits(2, phrases2), hits(3, phrases3))).as("h"))
      .select(col("doc_id"), col("h.pos").cast("long").as("pos"),
        col("h.phrase").as("phrase"))
      .groupBy(col("phrase"), col("doc_id"))
      .agg(count(lit(1)).as("n_occ"), min(col("pos")).as("first_pos"))
  }
}

package graft.operators

import graft.functions.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column.
  *
  * Brute force is the correctness baseline (query set broadcast against the
  * full corpus — one scan, no shuffle of the big side). The LSH variant is
  * the scale path: corpus bucketed once by random-hyperplane signature, a
  * query only probes its own bucket.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query row. `queries` must be
    * small (it is broadcast). Output: (q_id, n_id, cosine, rank); the raw
    * IEEE cosine with id tiebreak makes the ranking deterministic (the
    * identical double arithmetic is reproducible across engines).
    */
  def topKCosine(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), Vectors.toDoubleArray(col(vecCol)).as("n_v"))
    val q = queries.select(col(idCol).as("q_id"), Vectors.toDoubleArray(col(vecCol)).as("q_v"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (Vectors.dot(col("q_v"), col("n_v")) /
          (Vectors.norm(col("q_v")) * Vectors.norm(col("n_v")))).as("cosine"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Approximate top-k via random-hyperplane LSH: corpus and queries get a
    * bucket signature; a query is compared only against its bucket.
    */
  def topKCosineLsh(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int, nPlanes: Int = 8,
                    dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = Vectors.makePlanes(nPlanes, dim, seed)
    val c = corpus.select(col(idCol).as("n_id"),
      Vectors.toDoubleArray(col(vecCol)).as("n_v"),
      Vectors.lshBucket(col(vecCol), planes).as("bucket"))
    val q = queries.select(col(idCol).as("q_id"),
      Vectors.toDoubleArray(col(vecCol)).as("q_v"),
      Vectors.lshBucket(col(vecCol), planes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (Vectors.dot(col("q_v"), col("n_v")) /
          (Vectors.norm(col("q_v")) * Vectors.norm(col("n_v")))).as("cosine"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}

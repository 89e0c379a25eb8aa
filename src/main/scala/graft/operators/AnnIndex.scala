package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PERSISTENT graph-ANN index — the build-once / probe-many half that
  * [[Similarity.nnDescentStep]] / [[Similarity.graphBeamSearch]] lack on
  * their own: those construct the k-NN graph INSIDE each query plan,
  * which at 100 TB means re-paying the (blocked-pairs + descent) build on
  * every search. Here the graph is materialized as a CATALOG history
  * table of directed edges (a_id, b_id, cosine, rank) — governed,
  * time-travelable, vacuumable like any table — and the search half reads
  * it: per-round probe work is Q·beam·degree rows against a TABLE SCAN,
  * independent of corpus size and of build cost.
  *
  * Incremental maintenance ([[refreshEdges]]) is the append path: rows
  * whose id the graph has never seen are positioned by a beam search over
  * the EXISTING graph (exactly how HNSW inserts — greedy placement via
  * the current structure), and land as forward edges (new → found
  * neighbors) plus reverse edges (neighbor → new), keeping the graph
  * navigable TOWARD the new nodes without touching any existing edge.
  * Cost per refresh is O(new · beam · degree), never a rebuild.
  */
object AnnIndex {

  /** Seed edges: block-local exact top-k ∪ deterministic pseudo-random
    * long links ((id·131 + t·9973) mod N) — the cross-block links descent
    * needs to propagate good neighbors (see [[Similarity.nnDescentStep]]).
    */
  def seedEdges(corpus: DataFrame, idCol: String, vecCol: String,
                blockCol: String, k: Int): DataFrame = {
    val blocked = Similarity.knnJoinBlocked(corpus, idCol, vecCol, blockCol, k)
      .select(col("a_id"), col("b_id"))
    val n = corpus.agg(count(lit(1)).as("__n"))
    val rand = corpus.select(col(idCol).as("a_id")).crossJoin(broadcast(n))
      .select(col("a_id"), explode(array((1 to k).map(t =>
        (col("a_id") * 131 + lit(t * 9973)) % col("__n")): _*)).as("b_id"))
      .where(col("b_id") =!= col("a_id"))
    blocked.unionAll(rand)
  }

  /** The full build: seed, then `iters` total NN-descent refinements
    * (≥ 1; the last one carries exact cosine + rank into the stored
    * edges). Output (a_id, b_id, cosine, rank) — k directed edges per
    * node. Each iteration's work is bounded by (2k)² candidates per node
    * (never corpus²); lineage is cut per iteration inside
    * nnDescentStep's checkpoint.
    */
  def buildEdges(corpus: DataFrame, idCol: String, vecCol: String,
                 blockCol: String, k: Int, iters: Int): DataFrame = {
    require(iters >= 1, "graph-ANN build: at least one descent iteration")
    var g = seedEdges(corpus, idCol, vecCol, blockCol, k)
    for (_ <- 1 until iters)
      g = Similarity.nnDescentStep(corpus, idCol, vecCol, g, k)
        .select(col("a_id"), col("b_id"))
    Similarity.nnDescentStep(corpus, idCol, vecCol, g, k)
  }

  /** Incremental edges for corpus rows the graph has never seen: each new
    * id is beam-searched over the EXISTING graph (entries = a small
    * deterministic sample of indexed nodes), its top-k become forward
    * edges, and the reverses keep it reachable. Returns the edge rows to
    * APPEND — existing edges are untouched. Reverse edges carry the same
    * exact cosine; their `rank` is the forward rank (a slot, not a claim
    * of being the neighbor's true k-NN — descent on the next full build
    * re-ranks them).
    */
  def refreshEdges(corpus: DataFrame, graph: DataFrame, idCol: String,
                   vecCol: String, k: Int, beamWidth: Int = 8,
                   rounds: Int = 3, entryMod: Long = 100L): DataFrame = {
    val indexed = graph.select(col("a_id")).distinct()
    val newNodes = corpus.join(indexed, corpus(idCol) === col("a_id"), "left_anti")
    val entries = corpus.join(indexed, corpus(idCol) === col("a_id"), "left_semi")
      .where(col(idCol) % entryMod === 0)
      .select(col(idCol))
    val found = Similarity.graphBeamSearch(corpus, newNodes, idCol, vecCol,
      graph.select(col("a_id"), col("b_id")), entries.toDF(idCol),
      beamWidth, rounds, topK = k)
    val fwd = found.select(col("q_id").as("a_id"), col("id").as("b_id"),
      col("cosine"), col("rank"))
    val rev = found.select(col("id").as("a_id"), col("q_id").as("b_id"),
      col("cosine"), col("rank"))
    fwd.unionAll(rev)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a pair graph — turns near-duplicate PAIRS
  * (from Dedup.*Pairs*) into duplicate CLUSTERS (one canonical id per
  * group), the final step of corpus dedup.
  *
  * Algorithm: min-label propagation to fixpoint. Each round every node
  * takes the minimum label among itself and its neighbors; rounds are
  * whole DataFrame joins (shuffle on node id — linear in edge count) and
  * the loop converges in O(component diameter) rounds. Near-dup graphs
  * have tiny components (dup groups), so a handful of rounds suffices;
  * for adversarial long-chain graphs the same loop accepts a higher
  * `maxIter` or the large-star/small-star variant (each round halves path
  * lengths) — the per-round plan is identical.
  *
  * The driver loop only reads ONE scalar per round (the changed-count
  * convergence check); all data stays distributed. Intermediate label
  * tables are persisted and explicitly unpersisted so lineage doesn't
  * grow across rounds.
  */
object ConnectedComponents {

  /** (a, b) pairs → (id, cluster_id) where cluster_id is the minimum node
    * id in the component. Nodes not appearing in any pair are absent (the
    * caller unions singletons if needed).
    *
    * Two paths, same semantics: edge sets at or under `driverLimit`
    * collapse via an in-driver union-find — after LSH/blocking dedup the
    * pair graph is TINY relative to the corpus (edges ∝ true duplicates),
    * and a multi-round distributed loop on a few thousand edges is pure
    * scheduling overhead. Larger graphs run min-label propagation fully
    * distributed. `driverLimit = 0` forces the distributed loop; the
    * default (1M edges ≈ 16 MB) is far below driver heap risk.
    */
  def labels(pairs: DataFrame, aCol: String = "a_id", bCol: String = "b_id",
             maxIter: Int = 20, driverLimit: Long = 1L << 20): DataFrame = {
    // materialize the pair set ONCE: the union below feeds it into two
    // differently-aliased branches, and exchange/subplan reuse does not
    // fire across those — without this the (expensive) pair pipeline
    // executes twice
    val raw = pairs.select(col(aCol).cast("long").as("u0"),
      col(bCol).cast("long").as("v0"))
      .localCheckpoint(eager = true)
    val nEdges = raw.count()
    if (nEdges <= driverLimit) return driverUnionFind(raw)
    // pairs come in deduplicated with a < b, so the two directed copies
    // are already distinct. Pre-partition by v BEFORE caching: the cached
    // relation keeps its hash partitioning, so the per-round labels join
    // shuffles only the label table (O(V)) — not the full edge list
    // (O(E)) every round.
    val edges = raw.select(col("u0").as("u"), col("v0").as("v"))
      .union(raw.select(col("v0").as("u"), col("u0").as("v")))
      .repartition(col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // seed with round 1 for free: lbl = min(self, all neighbors) is one
    // aggregate over the edge list (also yields the node set)
    var labels = edges.groupBy(col("u"))
      .agg(min(col("v")).as("min_nbr0"))
      .select(col("u").as("id"), least(col("u"), col("min_nbr0")).as("lbl"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // ONE hop per materialization. Measured dead end: batching two lazy
    // hops per persist/count (halving driver barriers) ran 0.59s → 0.73s
    // here — near-dup graphs converge in 2-3 hops, so the batched form's
    // extra post-convergence hop costs more shuffle work than the saved
    // barriers; revisit only for long-diameter graphs on real clusters.
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("id").as("v"), col("lbl").as("nbr_lbl")), "v")
        .groupBy(col("u"))
        .agg(min(col("nbr_lbl")).as("min_nbr"))
      // carry the old label so convergence needs no second join
      val next = labels
        .join(nbrMin.select(col("u").as("id"), col("min_nbr")), Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("min_nbr"), col("lbl"))).as("lbl"),
          col("lbl").as("old_lbl"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = next.where(col("lbl") =!= col("old_lbl")).count()
      labels.unpersist()
      labels = next
      iter += 1
    }
    edges.unpersist()
    // Returning non-converged labels would silently split long-chain
    // components into multiple clusters — fail loudly instead; the caller
    // raises maxIter (rounds needed = component diameter).
    if (changed > 0) {
      labels.unpersist()
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter iterations " +
          s"($changed labels still changing); raise maxIter — rounds needed " +
          "= largest component diameter")
    }
    // localCheckpoint: hand back a lineage-free result whose blocks the
    // ContextCleaner reclaims on GC, then drop the loop's persist — the
    // caller gets no hidden cache entry to leak (labels ≪ corpus, so the
    // momentary double-store is cheap)
    val out = labels.select(col("id"), col("lbl").as("cluster_id"))
      .localCheckpoint(eager = true)
    labels.unpersist()
    out
  }

  /** Small-graph path: classic union-find with path compression on the
    * collected edge list, min node id per component as the cluster id —
    * identical output to the propagation fixpoint.
    */
  private def driverUnionFind(raw: DataFrame): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    val es = raw.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    es.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(rv) = ru
    }
    val nodes = es.iterator.flatMap { case (u, v) => Iterator(u, v) }.toArray.distinct
    val minOfRoot = scala.collection.mutable.HashMap.empty[Long, Long]
    nodes.foreach { n =>
      val r = find(n)
      minOfRoot(r) = math.min(minOfRoot.getOrElse(r, n), n)
    }
    nodes.toSeq.map(n => (n, minOfRoot(find(n)))).toDF("id", "cluster_id")
  }
}

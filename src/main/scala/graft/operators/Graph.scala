package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Convergence-checked iterative graph operators — the unbounded-depth
  * complements of the fixed-iteration query twins (q55's two power steps,
  * q67's 3-hop BFS). The engineering content is the ITERATION DISCIPLINE,
  * which is what breaks first on deep graphs:
  *
  *   - per-round results are EAGERLY localCheckpoint'ed: each round's
  *     frontier/ranks feed 2+ consumers, and without cutting lineage the
  *     recomputation tree doubles per round (exponential) while the plan
  *     itself grows linearly until the optimizer dominates runtime — the
  *     q45 pointer-jumping discipline applied to the open-ended loop;
  *   - the big accumulated state (`reached`) checkpoints on a CADENCE:
  *     between cadence points it is a flat union of already-checkpointed
  *     per-round deltas, so plan depth is bounded by the cadence, and the
  *     checkpoint cost (a full rewrite of reached) amortizes over k rounds;
  *   - convergence is a per-round scalar job (empty frontier / max rank
  *     delta), so termination is DATA-driven, not a guessed constant.
  *
  * At cluster scale localCheckpoint becomes reliable checkpointing (or
  * persist + lineage truncation) and the adjacency is pre-partitioned on
  * the join key once, reused by every round — same shape, bigger blocks.
  * Proven in GraphSpec on a 1000-hop chain (lineage stays bounded; a
  * naive un-checkpointed loop stalls orders of magnitude earlier).
  */
object Graph {

  /** Min-hop BFS from `seeds` until the frontier empties (or `maxHops`).
    *
    * @param adj   directed adjacency (src, dst) — pass both directions for
    *              an undirected graph
    * @param seeds seed nodes (v)
    * @return (v, hop) for every reachable node, hop = min #edges from any seed
    */
  def bfsReach(adj: DataFrame, seeds: DataFrame, maxHops: Long = Long.MaxValue,
               checkpointEvery: Int = 20): DataFrame = {
    require(checkpointEvery >= 1)
    val adjC = adj.select(col("src"), col("dst")).localCheckpoint(eager = true)
    var reached = seeds.select(col("v"), lit(0L).as("hop"))
      .distinct().localCheckpoint(eager = true)
    val reachedParts = math.max(1, reached.rdd.getNumPartitions)
    var frontier = reached.select(col("v"))
    var h = 1L
    while (h <= maxHops && !frontier.isEmpty) {
      // eager per-round checkpoint: `next` feeds the union AND the next
      // join AND the emptiness probe — uncut, each round would recompute
      // the whole history (exponential)
      val next = adjC.join(frontier.withColumnRenamed("v", "src"), "src")
        .select(col("dst").as("v")).distinct()
        .join(reached.select(col("v")), Seq("v"), "left_anti")
        .select(col("v"), lit(h).as("hop"))
        .localCheckpoint(eager = true)
      reached = reached.unionAll(next)
      // cadence: reached is a flat union of checkpointed deltas between
      // cadence points — every k rounds COMPACT (coalesce: unions add the
      // delta's partitions each round, so without compaction round h scans
      // O(h) tiny partitions — O(h²) total on a 1000-hop chain) and
      // rewrite, so both plan depth and partition count stay bounded
      if (h % checkpointEvery == 0)
        reached = reached.coalesce(reachedParts)
          .localCheckpoint(eager = true)
      frontier = next.select(col("v"))
      h += 1
    }
    reached
  }

  /** Damped PageRank iterated to convergence: stops when the max absolute
    * per-node rank change drops below `tol` (or at `maxIters`, returning
    * the iteration count so callers can tell which).
    *
    * Uses the production shape — unordered double SUM of contributions
    * (map-side combinable, one (dst)-shuffle per round) — rather than the
    * oracle-pinned ordered fold of q55: a convergence loop tolerates ulp
    * drift by construction (that is what `tol` is).
    *
    * @param nodes (id); edges (src, dst). Dangling mass follows the
    *              standard per-node `0.15 + 0.85·sum(in)` form (q55's),
    *              so ranks match its fixed-step twin when iterations agree.
    * @return (ranks DataFrame (id, r), iterations run)
    */
  def pageRankConverged(nodes: DataFrame, edges: DataFrame,
                        damping: Double = 0.85, tol: Double = 1e-6,
                        maxIters: Int = 100): (DataFrame, Int) = {
    val nodesC = nodes.select(col("id")).localCheckpoint(eager = true)
    val edgesC = edges.select(col("src"), col("dst"))
      .join(nodesC.select(col("id").as("src")), "src") // degree via one agg
      .localCheckpoint(eager = true)
    val outDeg = edgesC.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(eager = true)
    var ranks = nodesC.withColumn("r", lit(1.0)).localCheckpoint(eager = true)
    var it = 0
    var delta = Double.MaxValue
    while (it < maxIters && delta > tol) {
      val contrib = edgesC.join(outDeg, "src")
        .join(ranks.select(col("id").as("src"), col("r")), "src")
        .select(col("dst"), (col("r") / col("deg")).as("c"))
      val sums = contrib.groupBy(col("dst")).agg(sum(col("c")).as("s"))
      val next = nodesC.join(sums, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("s"), lit(0.0))).as("r"))
        .localCheckpoint(eager = true) // feeds delta probe + next round
      delta = next.join(ranks.select(col("id"), col("r").as("r0")), "id")
        .agg(max(abs(col("r") - col("r0")))).head().getDouble(0)
      ranks = next
      it += 1
    }
    (ranks, it)
  }
}

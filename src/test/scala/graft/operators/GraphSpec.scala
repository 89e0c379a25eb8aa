package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Convergence-checked iterative graph operators: correctness vs in-memory
  * references, and the 1000-hop chain stress that proves the checkpoint
  * cadence actually bounds lineage (an un-checkpointed loop's recompute
  * tree doubles per round — it would not finish 1000 rounds).
  */
@org.scalatest.tags.Slow
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("bfsReach on a 1000-hop chain: data-driven termination, bounded lineage") {
    val n = 1000
    val adj = (0 until n).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst")
      .repartition(4)
    val seeds = Seq(0L).toDF("v")
    // 1-row frontiers: shuffle width just adds empty tasks per round
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    val t0 = System.nanoTime()
    val got =
      try Graph.bfsReach(adj, seeds, checkpointEvery = 25)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val secs = (System.nanoTime() - t0) / 1e9
    // every node reached at hop == its chain position; loop stopped on the
    // empty frontier, not a guessed constant
    assert(got.size == n + 1)
    assert((0 to n).forall(i => got(i.toLong) == i.toLong), "hop must equal chain depth")
    // generous bound: the point is that it FINISHES — exponential
    // recompute would blow this by orders of magnitude
    assert(secs < 600, f"1000-hop chain took $secs%.0f s — lineage not bounded?")
  }

  test("bfsReach matches in-memory BFS on a branching graph with cycles") {
    val edges = Seq(
      (0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 0L), // cycle back
      (2L, 5L), (5L, 6L), (7L, 8L) // 7,8 unreachable from 0
    )
    val adj = edges.toDF("src", "dst")
    val got = Graph.bfsReach(adj, Seq(0L).toDF("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference BFS
    val g = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val want = scala.collection.mutable.Map(0L -> 0L)
    var frontier = Set(0L)
    var h = 1L
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(v => g.getOrElse(v, Nil)).diff(want.keySet)
      next.foreach(v => want(v) = h)
      frontier = next; h += 1
    }
    assert(got == want.toMap)
    assert(!got.contains(7L) && !got.contains(8L))
  }

  test("bfsReach maxHops truncates to the bounded-radius variant") {
    val adj = (0 until 10).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst")
    val got = Graph.bfsReach(adj, Seq(0L).toDF("v"), maxHops = 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("pageRankConverged converges to the in-memory fixed point") {
    // two triangles joined by a bridge — converges well inside 100 iters
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 6L), (6L, 4L),
      (3L, 4L))
    val nodes = (1L to 6L).toDF("id")
    val (ranks, iters) = Graph.pageRankConverged(
      nodes, edges.toDF("src", "dst"), tol = 1e-9)
    assert(iters < 100, s"did not converge: $iters")
    val got = ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // in-memory power iteration to the same tolerance
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var r = (1L to 6L).map(_ -> 1.0).toMap
    var delta = 1.0
    while (delta > 1e-9) {
      val contrib = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      r.foreach { case (v, rv) =>
        val succ = out.getOrElse(v, Nil)
        succ.foreach(d => contrib(d) += rv / succ.size)
      }
      val next = (1L to 6L).map(v => v -> (0.15 + 0.85 * contrib(v))).toMap
      delta = next.map { case (v, x) => math.abs(x - r(v)) }.max
      r = next
    }
    (1L to 6L).foreach { v =>
      assert(math.abs(got(v) - r(v)) < 1e-6, s"node $v: ${got(v)} vs ${r(v)}")
    }
    // the bridge-fed triangle accumulates more mass than the feeding one
    assert(got(5L) > got(2L))
  }
}

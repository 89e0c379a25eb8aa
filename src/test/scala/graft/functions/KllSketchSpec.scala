package graft.functions

import graft.SparkSpec
import graft.expressions.KllSketchAgg
import graft.operators.IncrementalAgg
import org.apache.spark.sql.functions._

/** KLL quantile-sketch guarantees: exact-regime order statistics, the
  * normalized rank-error bound in the approximation regime, and merge
  * behavior under arbitrary partitioning (mergeable summaries).
  */
class KllSketchSpec extends SparkSpec {
  import spark.implicits._

  private def quantiles(df: org.apache.spark.sql.DataFrame, k: Int,
                        ranks: Seq[Double]): Seq[Double] = {
    val sk = df.agg(KllSketchAgg.kllSketch(col("v"), k).as("sk"))
    sk.select(ranks.map(r => KllSketchAgg.kllQuantile(col("sk"), r)): _*)
      .collect().head.toSeq.map(_.asInstanceOf[Double])
  }

  test("exact regime (n <= k): quantiles are the ceil(r*n) order statistics") {
    // deterministic shuffled values, n = 157 < k = 512, 6-partition merge
    val vals = (1 to 157).map(i => ((i * 7919) % 157).toDouble)
    val df = vals.toDF("v").repartition(6)
    val sorted = vals.sorted
    for (r <- Seq(0.01, 0.25, 0.5, 0.75, 0.95, 1.0)) {
      val expected = sorted(math.ceil(r * vals.size).toInt - 1)
      val got = quantiles(df, 512, Seq(r)).head
      assert(got == expected, s"rank $r: got $got expected $expected")
    }
  }

  test("approx regime: rank error within the sketch's published bound") {
    val n = 100000
    val k = 200
    val vals = (1 to n).map(i => ((i.toLong * 48271) % n).toDouble)
    val df = vals.toDF("v").repartition(16) // force a multi-way merge tree
    val sorted = vals.sorted.toArray
    val eps = org.apache.datasketches.kll.KllSketch.getNormalizedRankError(k, false)
    for (r <- Seq(0.1, 0.5, 0.9)) {
      val got = quantiles(df, k, Seq(r)).head
      // position of the returned value in the true sorted order
      val pos = java.util.Arrays.binarySearch(sorted, got).abs
      val rankErr = math.abs(pos.toDouble / n - r)
      assert(rankErr <= 2 * eps, // 2x: the bound is 99%-confidence, not worst-case
        s"rank $r: value $got at true rank ${pos.toDouble / n}, err $rankErr > 2*$eps")
    }
  }

  test("MergeKll rollup fold == one-shot recompute in the exact regime") {
    val rows = (1 to 300).map(i => (i % 5, ((i * 104729) % 997).toDouble))
    val df = rows.toDF("g", "v")
    def agg(d: org.apache.spark.sql.DataFrame) = d.groupBy("g")
      .agg(KllSketchAgg.kllSketch(col("v"), 1024).as("sk"))
    // fold two deltas through the incremental-maintenance path
    val merged = IncrementalAgg.merge(
      agg(df.where(col("v") < 500)), agg(df.where(col("v") >= 500)),
      Seq("g"), Seq("sk" -> IncrementalAgg.MergeKll))
    def readout(d: org.apache.spark.sql.DataFrame) = d.select(col("g"),
      KllSketchAgg.kllCount(col("sk")).as("n"),
      KllSketchAgg.kllQuantile(col("sk"), 0.5).as("p50"),
      KllSketchAgg.kllQuantile(col("sk"), 0.9).as("p90"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(readout(merged) == readout(agg(df)))
  }

  test("group with one side absent passes through the full-outer merge") {
    val a = Seq((1, 10.0), (1, 20.0)).toDF("g", "v").groupBy("g")
      .agg(KllSketchAgg.kllSketch(col("v"), 64).as("sk"))
    val b = Seq((2, 5.0)).toDF("g", "v").groupBy("g")
      .agg(KllSketchAgg.kllSketch(col("v"), 64).as("sk"))
    val m = IncrementalAgg.merge(a, b, Seq("g"),
      Seq("sk" -> IncrementalAgg.MergeKll))
    val out = m.select(col("g"), KllSketchAgg.kllCount(col("sk")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(1 -> 2L, 2 -> 1L))
  }
}

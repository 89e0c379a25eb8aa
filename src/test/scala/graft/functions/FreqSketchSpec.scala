package graft.functions

import graft.SparkSpec
import graft.expressions.FreqSketchAgg
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Misra–Gries guarantee tests: frequent-item membership and error bounds
  * must hold under ANY partitioning of the input (mergeable summaries).
  */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] =
    df.agg(FreqSketchAgg.freqSketch(col("item"), k).as("sk"))
      .collect().head.getSeq[Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("every item above N/(k+1) survives, estimates within the MG bound") {
    val k = 16
    val items = Seq.fill(3000)("hot") ++ Seq.fill(1000)("warm") ++
      (1 to 5000).map(i => s"tail_$i")
    val df = items.toDF("item").repartition(7) // force a multi-way merge tree
    val n = items.size.toLong
    val bound = n / (k + 1)
    val exact = items.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    val est = sketch(df, k)
    assert(est.size <= k)
    exact.filter(_._2 > bound).foreach { case (item, truth) =>
      assert(est.contains(item), s"heavy item $item (count $truth > $bound) missing")
      assert(est(item) <= truth, s"$item overestimated: ${est(item)} > $truth")
      assert(est(item) >= truth - bound,
        s"$item underestimated past the bound: ${est(item)} < $truth - $bound")
    }
  }

  test("exact counts when the distinct universe fits in k") {
    val items = (1 to 10).flatMap(i => Seq.fill(i * 3)(s"w$i"))
    val df = items.toDF("item").repartition(5)
    val exact = items.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    assert(sketch(df, 16) == exact)
  }

  test("grouped sketches stay per-group") {
    val df = (Seq.fill(50)(("a", "x")) ++ Seq.fill(30)(("b", "y")))
      .toDF("g", "item").repartition(3)
    val byG = df.groupBy("g")
      .agg(FreqSketchAgg.freqSketch(col("item"), 4).as("sk"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Row](1).map(e => e.getString(0) -> e.getLong(1)).toMap).toMap
    assert(byG("a") == Map("x" -> 50L))
    assert(byG("b") == Map("y" -> 30L))
  }
}

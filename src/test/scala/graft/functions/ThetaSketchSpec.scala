package graft.functions

import graft.SparkSpec
import graft.expressions.ThetaSketchAgg
import org.apache.spark.sql.functions._

/** Theta distinct-set sketches: exact below k (the value-oracle regime of
  * dq_overlap_sketch), bounded error above, idempotent union (replay-safe,
  * unlike KLL), and set algebra (intersection) over serialized state.
  */
class ThetaSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: counts and intersections are true cardinalities") {
    val a = spark.range(0, 1000).toDF("k")
    val b = spark.range(500, 1800).toDF("k")
    val sa = a.agg(ThetaSketchAgg.thetaSketch($"k", 4096).as("sk"))
      .withColumn("g", lit(1))
    val sb = b.agg(ThetaSketchAgg.thetaSketch($"k", 4096).as("sk"))
      .withColumn("g", lit(1))
    val row = sa.as("x").join(sb.as("y"), "g")
      .select(
        ThetaSketchAgg.thetaCount($"x.sk").as("na"),
        ThetaSketchAgg.thetaCount($"y.sk").as("nb"),
        ThetaSketchAgg.thetaIntersectCount($"x.sk", $"y.sk").as("nab"),
        ThetaSketchAgg.thetaCount(
          ThetaSketchAgg.thetaUnion($"x.sk", $"y.sk")).as("nu"))
      .head()
    assert(row.getLong(0) == 1000L && row.getLong(1) == 1300L)
    assert(row.getLong(2) == 500L, "intersection [500,1000) must be exact")
    assert(row.getLong(3) == 1800L, "union [0,1800) must be exact")
  }

  test("union is idempotent: replaying the same delta does not double-count") {
    val d = spark.range(0, 2000).toDF("k")
      .agg(ThetaSketchAgg.thetaSketch($"k", 4096).as("sk"))
    val once = d.select(ThetaSketchAgg.thetaCount($"sk")).head().getLong(0)
    val twice = d.withColumn("g", lit(1)).as("x")
      .join(d.withColumn("g", lit(1)).as("y"), "g")
      .select(ThetaSketchAgg.thetaCount(
        ThetaSketchAgg.thetaUnion($"x.sk", $"y.sk")))
      .head().getLong(0)
    assert(once == 2000L && twice == 2000L)
  }

  test("merge tree independence: partial merges equal the one-shot sketch") {
    val n = 50000L
    val whole = spark.range(0, n).toDF("k")
      .agg(ThetaSketchAgg.thetaSketch($"k", 4096).as("sk"))
      .select(ThetaSketchAgg.thetaCount($"sk")).head().getLong(0)
    // same data split into 7 shards, folded through the scalar union
    val shards = spark.range(0, n).toDF("k")
      .withColumn("shard", $"k" % 7)
      .groupBy("shard")
      .agg(ThetaSketchAgg.thetaSketch($"k", 4096).as("sk"))
      .agg(ThetaSketchAgg.thetaSketch(lit(null).cast("long"), 16).as("ignore"),
        collect_list($"sk").as("sks"))
    val merged = shards.select(explode($"sks").as("sk"))
      .agg(min(lit(1)).as("g"), collect_list($"sk").as("sks"))
      .select($"sks")
      .head().getSeq[Array[Byte]](0)
      .reduce { (x, y) =>
        val u = org.apache.datasketches.theta.SetOperation.builder().buildUnion()
        u.union(org.apache.datasketches.theta.Sketches.heapifySketch(
          org.apache.datasketches.memory.Memory.wrap(x)))
        u.union(org.apache.datasketches.theta.Sketches.heapifySketch(
          org.apache.datasketches.memory.Memory.wrap(y)))
        u.getResult.toByteArray
      }
    val mergedCount = Math.round(
      org.apache.datasketches.theta.Sketches.heapifySketch(
        org.apache.datasketches.memory.Memory.wrap(merged)).getEstimate)
    // both are estimates of the same 50k set at k=4096: identical hash
    // set, so the two paths agree with each other within the RSE bound
    // vs truth (~1/sqrt(4096) = 1.6%; assert 5%)
    assert(math.abs(whole - n).toDouble / n < 0.05,
      s"one-shot estimate $whole out of bounds for $n")
    assert(math.abs(mergedCount - n).toDouble / n < 0.05,
      s"merged estimate $mergedCount out of bounds for $n")
  }
}

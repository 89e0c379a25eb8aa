package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("intervalJoin equals naive range join, incl. chunk-boundary spans") {
    val points = (0L to 100L by 7).map(t => (t, t)).toDF("pid", "t")
    // intervals deliberately crossing chunk boundaries and zero-length
    val ivs = Seq((1L, 0L, 9L), (2L, 8L, 32L), (3L, 50L, 50L), (4L, 90L, 200L))
      .toDF("iv", "s", "e")
    val fast = RangeJoin.intervalJoin(points, ivs, "t", "s", "e", chunkSize = 10)
      .select("pid", "iv").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(ivs, $"t" >= $"s" && $"t" <= $"e")
      .select("pid", "iv").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive && naive.nonEmpty)
  }

  test("intervalJoinBroadcast equals naive, overlapping intervals, zero exchange") {
    val points = (0L to 100L by 7).map(t => (t, t)).toDF("pid", "t")
    // overlaps, containment, zero-length, and a gap (points matching nothing)
    val ivs = Seq((1L, 0L, 9L), (2L, 8L, 32L), (3L, 0L, 200L), (4L, 50L, 50L),
      (5L, 90L, 95L)).toDF("iv", "s", "e")
    val out = RangeJoin.intervalJoinBroadcast(points, ivs, "t", "s", "e")
    val got = out.select("pid", "iv").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(ivs, $"t" >= $"s" && $"t" <= $"e")
      .select("pid", "iv").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive && naive.nonEmpty)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"fact side shuffled:\n$plan")
    // NULL time / NULL bounds are unmatchable, not a crash
    val nullPts = Seq((1L, Some(5L)), (2L, None)).toDF("pid", "t")
    val nullIvs = Seq((1L, Some(0L), Some(9L)), (2L, None, Some(9L)))
      .toDF("iv", "s", "e")
    val nd = RangeJoin.intervalJoinBroadcast(nullPts, nullIvs, "t", "s", "e")
      .select("pid", "iv").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nd == Set((1L, 1L)))
  }

  test("intervalJoinBroadcast enforces the dim-size contract loudly") {
    val points = Seq((1L, 5L)).toDF("pid", "t")
    val big = (1L to 100L).map(i => (i, i, i + 1)).toDF("iv", "s", "e")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.intervalJoinBroadcast(points, big, "t", "s", "e",
        maxBroadcastRows = 50L)
    }
    assert(e.getMessage.contains("100 rows"))
    assert(RangeJoin.intervalJoinBroadcast(points, big, "t", "s", "e",
      maxBroadcastRows = 100L).count() >= 1L)
  }

  test("approx sketches land within tolerance of exact") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val r = ev.agg(
      countDistinct($"user_id").as("exact"),
      approx_count_distinct($"user_id", 0.02).as("approx"),
      expr("percentile(value, 0.5d)").as("p50_exact"),
      percentile_approx($"value", lit(0.5), lit(10000)).as("p50_approx")).collect().head
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"$approx vs $exact")
    assert(math.abs(r.getDouble(2) - r.getDouble(3)) / r.getDouble(2) < 0.05)
  }
}

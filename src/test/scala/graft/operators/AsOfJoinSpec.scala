package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asofLast: latest right row at or before left time, per key") {
    val trades = Seq((1L, 10L, "t1"), (1L, 20L, "t2"), (2L, 15L, "t3"), (3L, 5L, "t4"))
      .toDF("k", "t", "trade")
    val quotes = Seq((1L, 5L, 100.0), (1L, 15L, 200.0), (1L, 20L, 300.0), (2L, 99L, 900.0))
      .toDF("k", "qt", "px")
    val out = AsOfJoin.asofLast(trades, quotes, "k", "t", "qt")
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(out("t1") == Some(100.0))  // 5 <= 10 < 15
    assert(out("t2") == Some(300.0))  // equal time: quote at 20 visible
    assert(out("t3") == None)         // only future quote for key 2
    assert(out("t4") == None)         // no quotes at all for key 3
  }

  test("asofLast rejects overlapping value column names") {
    val l = Seq((1L, 1L, "x")).toDF("k", "t", "v")
    val r = Seq((1L, 1L, "y")).toDF("k", "qt", "v")
    intercept[IllegalArgumentException] { AsOfJoin.asofLast(l, r, "k", "t", "qt") }
  }
}

package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  test("native physical as-of join equals the composed operator on real events") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"),
        floor(unix_timestamp(col("ts"))).cast("long").as("sec"), col("value"))
    val dim = ev.where(col("event_id") % 50 === 0)
      .groupBy(col("user_id"), col("sec").as("dim_sec"))
      .agg(max(col("value")).as("rate"))
      .select(col("user_id"), col("dim_sec"), col("rate"))
    val leftSide = ev.select(col("event_id"), col("user_id"), col("sec"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "user_id", "sec", "rate").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    val composed = canon(AsOfJoin.asofLast(leftSide, dim, "user_id", "sec", "dim_sec"))
    val native = canon(graft.plans.AsOfJoinNative.asof(leftSide, dim, "user_id", "sec", "dim_sec"))
    assert(native == composed)
    assert(native.nonEmpty && native.exists(_._4.isDefined))
  }
  import spark.implicits._

  test("broadcast as-of equals the composed operator, with ZERO exchange in the plan") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"),
        floor(unix_timestamp(col("ts"))).cast("long").as("sec"))
    val dim = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .where(col("event_id") % 50 === 0)
      .select(col("user_id"),
        floor(unix_timestamp(col("ts"))).cast("long").as("dim_sec"))
      .groupBy(col("user_id"), col("dim_sec"))
      .agg(count(lit(1)).cast("double").as("rate"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "user_id", "sec", "rate").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    val broadcasted = AsOfJoin.asofBroadcast(ev, dim, "user_id", "sec", "dim_sec")
    assert(canon(broadcasted) ==
      canon(AsOfJoin.asofLast(ev, dim, "user_id", "sec", "dim_sec")))
    // the scale claim: the fact side never shuffles or sorts
    val plan = broadcasted.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"fact side shuffled:\n$plan")
    assert(!plan.toLowerCase.contains("sortexec"), "fact side sorted")
    // NULL key/time on either side: unmatchable (NULL-filled left), no crash
    val nl = Seq((Some(1L), Some(10L), "a"), (None, Some(10L), "b"),
      (Some(1L), None, "c")).toDF("k", "t", "lv")
    val nr = Seq((Some(1L), Some(5L), 1.0), (None, Some(5L), 2.0))
      .toDF("k", "t", "rate")
    val out = AsOfJoin.asofBroadcast(nl, nr, "k", "t", "t").collect()
      .map(r => (r.getAs[String]("lv"),
        if (r.isNullAt(r.fieldIndex("rate"))) None
        else Some(r.getDouble(r.fieldIndex("rate"))))).toSet
    assert(out == Set(("a", Some(1.0)), ("b", None), ("c", None)))
  }

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

  test("asofLast carries the latest right ROW atomically (legit NULLs survive)") {
    // latest quote for k=1 at/before t=20 is (qt=15, px=null, sz=7): the
    // output must surface that row's real NULL px, not mix in px=100 from
    // the older row (per-column ignoreNulls fill would)
    val trades = Seq((1L, 20L, "t1")).toDF("k", "t", "trade")
    val quotes = Seq((1L, 5L, Some(100.0), 3L), (1L, 15L, None, 7L))
      .toDF("k", "qt", "px", "sz")
    val r = AsOfJoin.asofLast(trades, quotes, "k", "t", "qt").collect().head
    assert(r.isNullAt(r.fieldIndex("px")))
    assert(r.getLong(r.fieldIndex("sz")) == 7L)
    // and the native physical operator agrees on the same null-bearing data
    val n = graft.plans.AsOfJoinNative.asof(trades, quotes, "k", "t", "qt")
      .collect().head
    assert(n.isNullAt(n.fieldIndex("px")))
    assert(n.getLong(n.fieldIndex("sz")) == 7L)
  }

  test("asofNearest: closest right in either direction, ties to the earlier row") {
    val trades = Seq(
      (1L, 10L, "back"),   // quotes at 5 (d=5) and 30 (d=20) -> back
      (1L, 28L, "fwd"),    // 5 (d=23) vs 30 (d=2) -> forward
      (1L, 17L, "tiebrk"), // wait: 5 (d=12) vs 30 (d=13) -> back
      (2L, 40L, "onlyfwd"),// key 2 has only a future quote
      (3L, 40L, "none"))   // key 3 has no quotes
      .toDF("k", "t", "trade")
    val quotes = Seq((1L, 5L, 100.0), (1L, 30L, 300.0), (2L, 99L, 900.0))
      .toDF("k", "qt", "px")
    val out = AsOfJoin.asofNearest(trades, quotes, "k", "t", "qt")
      .collect().map(r => r.getString(2) ->
        (Option(r.get(r.fieldIndex("matched_qt"))), Option(r.get(r.fieldIndex("px")))))
      .toMap
    assert(out("back") == (Some(5L), Some(100.0)))
    assert(out("fwd") == (Some(30L), Some(300.0)))
    assert(out("tiebrk") == (Some(5L), Some(100.0)))
    assert(out("onlyfwd") == (Some(99L), Some(900.0)))
    assert(out("none") == (None, None))
    // exact tie: distances equal -> earlier (backward) row wins
    val tie = Seq((1L, 15L, "tie")).toDF("k", "t", "trade")
    val q2 = Seq((1L, 10L, 1.0), (1L, 20L, 2.0)).toDF("k", "qt", "px")
    val r = AsOfJoin.asofNearest(tie, q2, "k", "t", "qt").collect().head
    assert(r.getLong(r.fieldIndex("matched_qt")) == 10L)
  }

  test("asofNearest plans ONE shuffle: no range join, both carries share the sort") {
    val trades = Seq((1L, 10L, "t1"), (2L, 20L, "t2")).toDF("k", "t", "trade")
    val quotes = Seq((1L, 5L, 1.0), (2L, 30L, 2.0)).toDF("k", "qt", "px")
    val q = AsOfJoin.asofNearest(trades, quotes, "k", "t", "qt")
    q.collect()
    // AQE echoes the initial plan below the final one — audit the final only
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nExchanges == 1, s"expected one key shuffle, plan:\n$plan")
    // and ONE Window node computes BOTH carries over that single sort
    assert("Window \\[".r.findAllIn(plan).length == 1)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), "range-join shape crept in")
  }

  test("asofNearest compares timestamps at MICROSECOND precision") {
    // quotes 400ms before and 900ms after: second-truncated distances are
    // 0 and 0 (tie → backward would also pick back here), so separate the
    // sub-second case where truncation flips the answer: back at -900ms,
    // fwd at +400ms — cast("long") sees d_back=0 < d_fwd=1 and picks back;
    // native micros must pick forward
    val ts = (ms: Long) => new java.sql.Timestamp(ms)
    val trades = Seq((1L, ts(10900L), "t1")).toDF("k", "t", "trade")
    val quotes = Seq((1L, ts(10000L), 1.0), (1L, ts(11300L), 2.0))
      .toDF("k", "qt", "px")
    val r = AsOfJoin.asofNearest(trades, quotes, "k", "t", "qt").collect().head
    assert(r.getDouble(r.fieldIndex("px")) == 2.0,
      "sub-second distances truncated: nearest-side pick is wrong")
  }

  test("asofBroadcast enforces the dim-size contract loudly") {
    val l = Seq((1L, 10L, "x")).toDF("k", "t", "v")
    val r = (1L to 100L).map(i => (i, i, i.toDouble)).toDF("k", "qt", "px")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofBroadcast(l, r, "k", "t", "qt", maxBroadcastRows = 50L)
    }
    assert(e.getMessage.contains("100 rows"))
    // at/below the cap it runs
    assert(AsOfJoin.asofBroadcast(l, r, "k", "t", "qt",
      maxBroadcastRows = 100L).count() == 1L)
  }

  test("asofLast rejects overlapping value column names") {
    val l = Seq((1L, 1L, "x")).toDF("k", "t", "v")
    val r = Seq((1L, 1L, "y")).toDF("k", "qt", "v")
    intercept[IllegalArgumentException] { AsOfJoin.asofLast(l, r, "k", "t", "qt") }
  }
}

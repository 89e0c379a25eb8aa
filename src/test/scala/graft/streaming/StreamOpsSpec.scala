package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamOps.{Event, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  // shared near-dup construction: 48 distinct tokens; appending one rare
  // token moves the md5-vote simhash by Hamming 1 (deterministic), while
  // the reversed-token doc sits at Hamming 28 from base
  private val nearDupWords = Seq("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lam", "mu", "nu", "xi",
    "omicron", "pi", "rho", "sigma", "tau", "upsilon", "phi", "chi", "psi",
    "omega", "red", "green", "blue", "cyan", "magenta", "yellow", "black",
    "white", "gray", "pink", "brown", "violet", "one", "two", "three",
    "four", "five", "six", "seven", "eight", "nine", "ten", "eleven",
    "twelve")
  private val nearDupBase = nearDupWords.mkString(" ")
  private val nearDupDoc = nearDupBase + " bonus"
  private val distinctDocText = nearDupWords.map(_.reverse).mkString(" ")

  test("hourlyAgg: windowed counts with watermark, finalized after horizon") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val agg = StreamOps.hourlyAgg(
      in.toDF().select($"ts", $"eventType".as("event_type"), $"value"))
    val q = agg.writeStream.format("memory").queryName("hourly").outputMode("append").start()
    try {
      in.addData(Event(1, ts(60), 1, "click", 1.0), Event(2, ts(120), 1, "click", 2.0),
        Event(3, ts(200), 2, "view", 5.0))
      q.processAllAvailable()
      // advance watermark way past hour 0 (2h watermark + 1h window)
      in.addData(Event(4, ts(3600 * 12), 1, "click", 0.5))
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .select($"window.start".cast("long").as("w"), $"event_type", $"n_events", $"sum_value")
        .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      assert(rows((0L, "click")) == ((2L, 3.0)))
      assert(rows((0L, "view")) == ((1L, 5.0)))
    } finally q.stop()
  }

  test("dedupStream drops duplicate event ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val dedup = StreamOps.dedupStream(in.toDF().withColumnRenamed("eventId", "event_id"))
    val q = dedup.writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      in.addData(Event(1, ts(0), 1, "a", 1.0), Event(1, ts(5), 1, "a", 1.0),
        Event(2, ts(10), 1, "b", 2.0))
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2)
    } finally q.stop()
  }

  test("nearDupPairsStream: near-dups across micro-batches pair up, distinct docs don't") {
    implicit val sqlCtx = spark.sqlContext
    // ground truth via the batch signature path: planted pair within 3
    val batchSigs = graft.operators.Dedup.simhashSignatures(
      Seq((1L, nearDupBase), (2L, distinctDocText), (3L, nearDupDoc)).toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(batchSigs(1L) ^ batchSigs(3L)) <= 3)
    assert(java.lang.Long.bitCount(batchSigs(1L) ^ batchSigs(2L)) > 3)
    val in = MemoryStream[(Long, String)]
    val pairs = StreamOps.nearDupPairsStream(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = pairs.writeStream.format("memory").queryName("neardup").outputMode("append").start()
    try {
      in.addData((1L, nearDupBase), (2L, distinctDocText))
      q.processAllAvailable()
      assert(spark.table("neardup").count() == 0) // no near-dups yet
      in.addData((3L, nearDupDoc))                // arrives a batch later
      q.processAllAvailable()
      // pair may appear once per shared quarter — distinct (aId, bId)
      val got = spark.table("neardup").select("aId", "bId").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 3L)))
    } finally q.stop()
  }

  test("nearDupPairsStreamWatermarked: in-horizon pairs emit, expired buckets forget") {
    implicit val sqlCtx = spark.sqlContext
    // REALISTIC epoch timestamps: a lease anchored to the previous-batch
    // watermark (instead of the batch's max event time) passes with
    // near-epoch-0 times but evicts first-batch buckets immediately here
    val t0 = 1765000000L
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val pairs = StreamOps.nearDupPairsStreamWatermarked(
      in.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text", "ts",
      watermark = "60 seconds")
    val q = pairs.writeStream.format("memory").queryName("neardup_wm")
      .outputMode("append").start()
    try {
      in.addData((1L, ts(t0), nearDupBase))
      q.processAllAvailable()
      in.addData((2L, ts(t0 + 20), nearDupDoc)) // within horizon -> pairs with 1
      q.processAllAvailable()
      // push the watermark far past t0+20 + 60s so the bucket expires
      in.addData((7L, ts(t0 + 100000), "unrelated filler tokens here"))
      q.processAllAvailable()
      in.addData((8L, ts(t0 + 100010), "unrelated filler tokens here two"))
      q.processAllAvailable()
      in.addData((3L, ts(t0 + 100020), nearDupDoc)) // bucket forgot 1 and 2 -> no pair
      q.processAllAvailable()
      val got = spark.table("neardup_wm").select("aId", "bId").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 2L)))
    } finally q.stop()
  }

  test("per-row MinHashSignature matches the batch aggregate bit-for-bit") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    // batch path: shingle rows -> fused MinHashAgg
    val m54 = lit((1L << 54) - 1)
    val batch = graft.operators.Dedup.shingleRows(docs, "doc_id", "text", 3)
      .groupBy($"id")
      .agg(graft.expressions.MinHashExpressions.minHashAgg(
        xxhash64($"s").bitwiseAND(m54),
        xxhash64(lit(1), $"s").bitwiseAND(m54).bitwiseOR(lit(1L)), 128).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    // per-row expression path
    val perRow = docs.select($"doc_id",
        graft.expressions.MinHashExpressions.minHashSignature(
          graft.expressions.TextExpressions.wordNgrams($"text", 3, distinct = true), 128).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    // batch path omits docs with zero shingles; every doc it covers must match
    assert(batch.nonEmpty)
    batch.foreach { case (id, sig) => assert(perRow(id) == sig, s"doc $id") }
  }

  test("minhashPairsStream: high-jaccard near-dups pair across batches, distinct docs don't") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val pairs = StreamOps.minhashPairsStream(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", tau = 0.8)
    val q = pairs.writeStream.format("memory").queryName("mh_stream")
      .outputMode("append").start()
    try {
      in.addData((1L, nearDupBase), (2L, distinctDocText))
      q.processAllAvailable()
      assert(spark.table("mh_stream").count() == 0)
      in.addData((3L, nearDupDoc)) // ~0.96 shingle jaccard with base
      q.processAllAvailable()
      val got = spark.table("mh_stream").select("aId", "bId").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 3L)))
      val est = spark.table("mh_stream").select("estJaccard")
        .collect().map(_.getDouble(0)).max
      assert(est >= 0.8 && est <= 1.0)
    } finally q.stop()
  }

  test("minhashPairsStream: shingle-less short docs never pair") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val pairs = StreamOps.minhashPairsStream(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", tau = 0.8)
    val q = pairs.writeStream.format("memory").queryName("mh_short")
      .outputMode("append").start()
    try {
      // all under n=3 tokens: sentinel signatures would otherwise collide
      // in every band and emit spurious estJaccard=1.0 pairs
      in.addData((1L, "hi"), (2L, "bye now"), (3L, ""), (4L, "one two"))
      q.processAllAvailable()
      assert(spark.table("mh_short").count() == 0)
    } finally q.stop()
  }

  test("minhashPairsStreamWatermarked: expired band buckets forget") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1765000000L
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val pairs = StreamOps.minhashPairsStreamWatermarked(
      in.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text", "ts",
      watermark = "60 seconds", tau = 0.8)
    val q = pairs.writeStream.format("memory").queryName("mh_wm")
      .outputMode("append").start()
    try {
      in.addData((1L, ts(t0), nearDupBase))
      q.processAllAvailable()
      in.addData((2L, ts(t0 + 20), nearDupDoc)) // in-horizon near-dup -> pair
      q.processAllAvailable()
      in.addData((7L, ts(t0 + 100000), "wholly unrelated filler text alpha"))
      q.processAllAvailable()
      in.addData((8L, ts(t0 + 100010), "different watermark advancing doc"))
      q.processAllAvailable()
      in.addData((3L, ts(t0 + 100020), nearDupDoc)) // buckets expired -> no pair
      q.processAllAvailable()
      val got = spark.table("mh_wm").select("aId", "bId").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 2L)))
    } finally q.stop()
  }

  test("streaming near-dup pairs equal the batch simhashPairs on real documents") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").where(length($"text") > 0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val batch = graft.operators.Dedup.simhashPairs(
      graft.Tables.documents(spark, "/root/testdata/sf0.001")
        .where(length($"text") > 0), "doc_id", "text")
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val in = MemoryStream[(Long, String)]
    val pairs = StreamOps.nearDupPairsStream(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = pairs.writeStream.format("memory").queryName("neardup_eq")
      .outputMode("append").start()
    try {
      // feed in three micro-batches to exercise cross-batch state
      docs.grouped(math.max(1, docs.length / 3)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("neardup_eq").select("aId", "bId").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == batch, s"stream-only: ${got -- batch}; batch-only: ${batch -- got}")
      assert(batch.nonEmpty) // the corpus plants real near-dups
    } finally q.stop()
  }

  test("streaming embedding pairs equal batch embeddingPairsLsh on real vectors") {
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val batch = graft.operators.Dedup.embeddingPairsLsh(
      emb, "vec_id", "embedding", tau = 0.4)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = emb.select($"vec_id",
        org.apache.spark.sql.functions.array_join($"embedding".cast("array<string>"), ","))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)]
    // rebuild array<float> from the csv payload (MemoryStream needs a
    // simple product encoder)
    val vecDf = in.toDF().toDF("vec_id", "csv")
      .select($"vec_id",
        org.apache.spark.sql.functions.split($"csv", ",").cast("array<float>").as("embedding"))
    val pairs = StreamOps.embeddingPairsStream(vecDf, "vec_id", "embedding", tau = 0.4)
    val q = pairs.writeStream.format("memory").queryName("emb_stream")
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 3)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("emb_stream").select("aId", "bId").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == batch, s"stream-only: ${got -- batch}; batch-only: ${batch -- got}")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("stream-static enrichment joins dims per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val dims = Seq((1L, "alice"), (2L, "bob")).toDF("userId", "name")
    val out = StreamOps.enrichWithStatic(in.toDF(), dims, Seq("userId"))
    val q = out.writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      in.addData(Event(1, ts(0), 1, "a", 1.0), Event(2, ts(1), 3, "b", 2.0))
      q.processAllAvailable()
      val rows = spark.table("enriched").select("userId", "name").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows(1L) == "alice" && rows(3L) == null)
    } finally q.stop()
  }

  test("runningTopK: custom heap aggregate holds streaming state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val topk = StreamOps.runningTopK(in.toDF().toDF("k", "v"), "k", "v", k = 2)
    val q = topk.writeStream.format("memory").queryName("rtopk")
      .outputMode("update").start()
    try {
      in.addData((1L, 5L), (1L, 9L), (2L, 3L))
      q.processAllAvailable()
      in.addData((1L, 7L)) // displaces 5 from key 1's heap
      q.processAllAvailable()
      val last = spark.table("rtopk").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toList)
        .groupBy(_._1).map { case (k, vs) => k -> vs.last._2 }
      assert(last(1L) == List(9L, 7L)) // state carried 9 across batches
      assert(last(2L) == List(3L))
    } finally q.stop()
  }

  test("runningHeavyHitters: MG sketch state accumulates across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val hh = StreamOps.runningHeavyHitters(in.toDF().toDF("k", "item"), "k", "item", k = 4)
    val q = hh.writeStream.format("memory").queryName("rhh")
      .outputMode("update").start()
    try {
      in.addData(Seq.fill(5)(1L -> "hot") ++ Seq((1L, "x"), (2L, "solo")): _*)
      q.processAllAvailable()
      in.addData(Seq.fill(4)(1L -> "hot"): _*) // state must carry the 5
      q.processAllAvailable()
      val last = spark.table("rhh").collect()
        .map(r => r.getLong(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(e => e.getString(0) -> e.getLong(1)).toMap)
        .groupBy(_._1).map { case (k, vs) => k -> vs.last._2 }
      assert(last(1L)("hot") == 9L) // 5 from batch 1 + 4 from batch 2
      assert(last(2L) == Map("solo" -> 1L))
    } finally q.stop()
  }

  test("runningTotals: update mode re-emits touched keys with new totals") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val totals = StreamOps.runningTotals(in.toDF().withColumnRenamed("userId", "user_id"),
      "user_id", "value")
    val q = totals.writeStream.format("memory").queryName("totals")
      .outputMode("update").start()
    try {
      in.addData(Event(1, ts(0), 1, "a", 1.0), Event(2, ts(1), 1, "a", 2.0),
        Event(3, ts(2), 2, "a", 5.0))
      q.processAllAvailable()
      in.addData(Event(4, ts(3), 1, "a", 4.0))
      q.processAllAvailable()
      val rows = spark.table("totals")
        .select("user_id", "n_events", "total").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // batch 1 emitted (1,2,3.0) and (2,1,5.0); batch 2 re-emitted user 1
      assert(rows.contains((1L, 3L, 7.0)), s"missing final total in $rows")
      assert(rows.contains((2L, 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming observability: per-batch input rows and state size in progress") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamOps.runningTotals(
      in.toDF().withColumnRenamed("userId", "user_id"), "user_id", "value")
      .writeStream.format("memory").queryName("obs_stream")
      .outputMode("update").start()
    try {
      in.addData(Event(1, ts(10), 1, "a", 1.0), Event(2, ts(20), 2, "a", 2.0))
      q.processAllAvailable()
      in.addData(Event(3, ts(30), 1, "a", 3.0))
      q.processAllAvailable()
      // the ops surface a production stream is monitored by: input volume
      // and state-store row counts per micro-batch, no extra query needed
      val progress = q.recentProgress.filter(_.numInputRows > 0)
      assert(progress.map(_.numInputRows).sum == 3)
      val lastState = progress.last.stateOperators
      assert(lastState.nonEmpty && lastState.head.numRowsTotal == 2) // 2 keys
    } finally q.stop()
  }

  test("transformWithState running totals equal the aggregate twin (RocksDB store)") {
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.KV
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[KV]
    val q = StreamOps.runningTotalsTws(in.toDS())
      .writeStream.format("memory").queryName("tws").outputMode("update").start()
    try {
      in.addData(KV(1L, 2.0), KV(1L, 3.0), KV(2L, 5.0))
      q.processAllAvailable()
      in.addData(KV(1L, 2.0), KV(3L, 1.0))
      q.processAllAvailable()
      // update mode: LAST emission per key is the running state
      val last = spark.table("tws").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).map { case (k, xs) =>
          k -> xs.map(_._2).maxBy(_._1) } // highest count = latest emission
      assert(last == Map(1L -> (3L, 7.0), 2L -> (1L, 5.0), 3L -> (1L, 1.0)))
      // and the per-batch emissions match the agg-based twin's semantics:
      // batch 1 emitted (1 -> 5.0), batch 2 the updated (1 -> 7.0)
      val key1 = spark.table("tws").collect().filter(_.getLong(0) == 1L)
        .map(r => (r.getLong(1), r.getDouble(2))).toSet
      assert(key1 == Set((2L, 5.0), (3L, 7.0)))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("joinWithinTime: stream-stream join pairs clicks within bound of views") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val joined = StreamOps.joinWithinTime(
      views.toDF().select($"eventId".as("view_id"), $"userId".as("view_user"), $"ts".as("view_ts")),
      clicks.toDF().select($"eventId".as("click_id"), $"userId".as("click_user"), $"ts".as("click_ts")),
      "view_user", "click_user", "view_ts", "click_ts",
      within = "60 seconds", watermark = "30 seconds")
    val q = joined.writeStream.format("memory").queryName("vc").outputMode("append").start()
    try {
      views.addData(Event(1, ts(100), 1, "view", 0), Event(2, ts(500), 2, "view", 0))
      clicks.addData(
        Event(10, ts(130), 1, "click", 0),  // within 60s of view 1 -> joins
        Event(11, ts(300), 1, "click", 0),  // too late for view 1 -> dropped
        Event(12, ts(490), 2, "click", 0))  // before view 2 -> dropped
      q.processAllAvailable()
      val rows = spark.table("vc").select("view_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((1L, 10L)))
    } finally q.stop()
  }

  test("joinWithinTime left_outer: unmatched views emit with null click after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val joined = StreamOps.joinWithinTime(
      views.toDF().select($"eventId".as("view_id"), $"userId".as("view_user"), $"ts".as("view_ts")),
      clicks.toDF().select($"eventId".as("click_id"), $"userId".as("click_user"), $"ts".as("click_ts")),
      "view_user", "click_user", "view_ts", "click_ts",
      within = "60 seconds", watermark = "30 seconds", joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("vc_outer").outputMode("append").start()
    try {
      views.addData(Event(1, ts(100), 1, "view", 0), Event(2, ts(100), 2, "view", 0))
      clicks.addData(Event(10, ts(130), 1, "click", 0)) // user 1 clicks, user 2 never does
      q.processAllAvailable()
      // advance BOTH watermarks far past view-time + within + watermark so
      // the unmatched view 2 is provably unmatchable and emitted
      views.addData(Event(3, ts(10000), 9, "view", 0))
      clicks.addData(Event(99, ts(10000), 9, "click", 0))
      q.processAllAvailable()
      val rows = spark.table("vc_outer").select("view_id", "click_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(rows(1L) == Some(10L))   // matched pair
      assert(rows.get(2L) == Some(None)) // unmatched view emitted with null click
    } finally q.stop()
  }

  test("joinWithinTime left_semi: views that clicked emit ONCE, others never") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val joined = StreamOps.joinWithinTime(
      views.toDF().select($"eventId".as("view_id"), $"userId".as("view_user"), $"ts".as("view_ts")),
      clicks.toDF().select($"eventId".as("click_id"), $"userId".as("click_user"), $"ts".as("click_ts")),
      "view_user", "click_user", "view_ts", "click_ts",
      within = "60 seconds", watermark = "30 seconds", joinType = "left_semi")
    val q = joined.writeStream.format("memory").queryName("vc_semi").outputMode("append").start()
    try {
      views.addData(Event(1, ts(100), 1, "view", 0), Event(2, ts(100), 2, "view", 0))
      // user 1 clicks TWICE in bound — semi join must still emit view 1 once
      clicks.addData(Event(10, ts(110), 1, "click", 0), Event(11, ts(130), 1, "click", 0))
      q.processAllAvailable()
      views.addData(Event(3, ts(10000), 9, "view", 0))
      clicks.addData(Event(99, ts(10000), 9, "click", 0))
      q.processAllAvailable()
      val got = spark.table("vc_semi").select("view_id").collect().map(_.getLong(0))
      assert(got.count(_ == 1L) == 1) // exactly once despite two matches
      assert(!got.contains(2L))       // never-clicked view never emits
      // semi join output carries ONLY left columns
      assert(spark.table("vc_semi").columns.toSeq ==
        Seq("view_id", "view_user", "view_ts"))
    } finally q.stop()
  }

  test("joinWithinTime full_outer: unmatched rows from BOTH sides emit after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val joined = StreamOps.joinWithinTime(
      views.toDF().select($"eventId".as("view_id"), $"userId".as("view_user"), $"ts".as("view_ts")),
      clicks.toDF().select($"eventId".as("click_id"), $"userId".as("click_user"), $"ts".as("click_ts")),
      "view_user", "click_user", "view_ts", "click_ts",
      within = "60 seconds", watermark = "30 seconds", joinType = "full_outer")
    val q = joined.writeStream.format("memory").queryName("vc_full").outputMode("append").start()
    try {
      views.addData(Event(1, ts(100), 1, "view", 0), Event(2, ts(100), 2, "view", 0))
      // user 1 clicks in-bound; user 3 clicks with NO view at all
      clicks.addData(Event(10, ts(130), 1, "click", 0), Event(11, ts(130), 3, "click", 0))
      q.processAllAvailable()
      // advance both watermarks so every unmatched row is provably final
      views.addData(Event(4, ts(10000), 9, "view", 0))
      clicks.addData(Event(99, ts(10000), 9, "click", 0))
      q.processAllAvailable()
      val rows = spark.table("vc_full")
        .select("view_id", "click_id").collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      assert(rows.contains((Some(1L), Some(10L)))) // matched pair
      assert(rows.contains((Some(2L), None)))      // view that never clicked
      assert(rows.contains((None, Some(11L))))     // click with no view
    } finally q.stop()
  }

  test("toPartitionedParquet writes a partitioned file sink with commit log") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val in = MemoryStream[Event]
    val q = StreamOps.toPartitionedParquet(
      in.toDF().withColumn("etype", $"eventType"),
      s"$base/data", s"$base/chk", Seq("etype"))
    try {
      in.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 2, "view", 2.0))
      q.processAllAvailable()
      in.addData(Event(3, ts(2), 1, "click", 3.0))
      q.processAllAvailable()
      val back = spark.read.parquet(s"$base/data")
      assert(back.count() == 3)
      // partition pruning works on the read-back path
      val clicks = back.where($"etype" === "click")
      assert(clicks.count() == 2)
      assert(new java.io.File(s"$base/data/etype=click").exists())
      assert(new java.io.File(s"$base/chk").exists()) // commit log present
    } finally q.stop()
  }

  test("file sink survives stop/restart exactly-once (checkpoint recovery)") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_restart").toString
    // phase 1: two batches, then stop
    val in1 = MemoryStream[Event]
    val q1 = StreamOps.toPartitionedParquet(
      in1.toDF().withColumn("etype", $"eventType"),
      s"$base/data", s"$base/chk", Seq("etype"))
    in1.addData(Event(1, ts(0), 1, "click", 1.0))
    q1.processAllAvailable()
    in1.addData(Event(2, ts(1), 1, "click", 2.0))
    q1.processAllAvailable()
    q1.stop()
    // phase 2: a NEW query against the SAME checkpoint continues the
    // sink. The replacement source must cover the committed offsets
    // (as a replayable source like Kafka would), so the recovered query
    // re-reads the last batch — the sink's commit log must dedupe it
    val in2 = MemoryStream[Event]
    in2.addData(Event(1, ts(0), 1, "click", 1.0))
    in2.addData(Event(2, ts(1), 1, "click", 2.0))
    val q2 = StreamOps.toPartitionedParquet(
      in2.toDF().withColumn("etype", $"eventType"),
      s"$base/data", s"$base/chk", Seq("etype"))
    try {
      in2.addData(Event(3, ts(2), 1, "view", 3.0))
      q2.processAllAvailable()
      // exactly the three committed events — the replayed batch must NOT
      // duplicate (count catches what a set would hide), none lost
      val back = spark.read.parquet(s"$base/data").collect()
        .map(r => (r.getAs[Long]("eventId"), r.getAs[String]("etype")))
      assert(back.length == 3, s"duplicate or lost rows: ${back.toSeq}")
      assert(back.toSet == Set((1L, "click"), (2L, "click"), (3L, "view")))
    } finally q2.stop()
  }

  test("applyChangelogStream folds micro-batches into the snapshot") {
    implicit val sqlCtx = spark.sqlContext
    case class Change(k: Long, name: String, seq: Long, op: String)
    val in = MemoryStream[(Long, String, Long, String)]
    val initial = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    @volatile var latest: org.apache.spark.sql.DataFrame = initial
    val q = StreamOps.applyChangelogStream(
      in.toDF().toDF("k", "name", "seq", "op"), initial, "k", "seq", "op")(
      snap => latest = snap)
    try {
      in.addData((1L, "a1", 1L, "U"), (3L, "c", 1L, "U"))
      q.processAllAvailable()
      in.addData((2L, "", 2L, "D"), (1L, "a2", 2L, "U"))
      q.processAllAvailable()
      val rows = latest.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(rows.toSeq == Seq((1L, "a2"), (3L, "c")))
    } finally q.stop()
  }

  test("scd2Stream chains versions across micro-batches, equals batch scd2History") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long, String)]
    @volatile var hist: org.apache.spark.sql.DataFrame = null
    val q = StreamOps.scd2Stream(
      in.toDF().toDF("k", "name", "seq", "op"), "k", "seq", "op")(h => hist = h)
    // key 1: versions open and close ACROSS batches; key 2: delete arrives a
    // batch after the upsert; key 3: born in the last batch
    val batches = Seq(
      Seq((1L, "a1", 1L, "U"), (2L, "b1", 2L, "U")),
      Seq((1L, "a2", 3L, "U"), (2L, "", 4L, "D")),
      Seq((1L, "a3", 5L, "U"), (3L, "c1", 6L, "U")))
    try batches.foreach { b => in.addData(b); q.processAllAvailable() }
    finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4))).toSet
    val got = canon(hist.select("k", "name", "valid_from", "valid_to", "is_current"))
    val batch = graft.operators.Cdc.scd2History(
      batches.flatten.toDF("k", "name", "seq", "op"), "k", "seq", "op")
    val want = canon(batch.select("k", "name", "valid_from", "valid_to", "is_current"))
    assert(got == want)
    assert(got == Set(
      (1L, "a1", 1L, Some(3L), false), (1L, "a2", 3L, Some(5L), false),
      (1L, "a3", 5L, None, true),
      (2L, "b1", 2L, Some(4L), false),
      (3L, "c1", 6L, None, true)))
  }

  test("asofJoinStream equals the batch as-of join under out-of-order delivery") {
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.{AsofLeft, AsofRight}
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val lIn = MemoryStream[AsofLeft]
    val rIn = MemoryStream[AsofRight]
    val q = StreamOps.asofJoinStream(lIn.toDS(), rIn.toDS(), "5 seconds")
      .writeStream.format("memory").queryName("asof").outputMode("append").start()
    // the real rows (key 1 and 2); key 99 only advances the watermark
    val lefts = Seq((1L, 5L, 10.0), (1L, 12L, 11.0), (1L, 20L, 12.0),
      (2L, 30L, 20.0), (1L, 25L, 13.0))
    val rights = Seq((1L, 10L, 1.0), (1L, 11L, 2.0), (2L, 15L, 9.0))
    try {
      rIn.addData(AsofRight(1L, ts(10), 1.0))
      lIn.addData(AsofLeft(1L, ts(5), 10.0), AsofLeft(1L, ts(12), 11.0))
      q.processAllAvailable()
      rIn.addData(AsofRight(1L, ts(11), 2.0), AsofRight(2L, ts(15), 9.0))
      lIn.addData(AsofLeft(1L, ts(20), 12.0))
      q.processAllAvailable()
      lIn.addData(AsofLeft(2L, ts(30), 20.0), AsofLeft(1L, ts(25), 13.0))
      q.processAllAvailable()
      // advance the watermark well past every left, twice (emission runs
      // the batch AFTER the watermark advances)
      Seq(1000L, 2000L).foreach { t =>
        lIn.addData(AsofLeft(99L, ts(t), 0.0))
        rIn.addData(AsofRight(99L, ts(t), 0.0))
        q.processAllAvailable()
      }
      val got = spark.table("asof").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .filter(_._1 != 99L).toSet
      val batchOut = graft.operators.AsOfJoin.asofLast(
        lefts.toDF("key", "sec", "value"), rights.toDF("key", "sec", "rate"),
        "key", "sec", "sec").collect()
        .map(r => (r.getLong(0), r.getLong(r.fieldIndex("sec")),
          r.getDouble(r.fieldIndex("value")),
          if (r.isNullAt(r.fieldIndex("rate"))) None
          else Some(r.getDouble(r.fieldIndex("rate"))))).toSet
      assert(got == batchOut, s"stream $got vs batch $batchOut")
      assert(got.exists(_._4.isEmpty)) // the pre-any-right left got NULL
    } finally q.stop()
  }

  test("forwardFillStream equals batch forwardFill under out-of-order delivery") {
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.FillIn
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val in = MemoryStream[FillIn]
    // 30s delay: the disorder below stays WITHIN the watermark bound —
    // rows older than the watermark are dropped upstream by contract
    // (same as any withWatermark operator), which is not what this test
    // is probing
    val q = StreamOps.forwardFillStream(in.toDS(), "30 seconds")
      .writeStream.format("memory").queryName("locf").outputMode("append").start()
    // key 1: null, 10.0, null, 20.0, null; key 2: all null; delivered
    // out of order across batches (the fill must come from EVENT order)
    val rows = Seq(
      FillIn(1L, ts(10), 1L, None), FillIn(2L, ts(20), 1L, Some(10.0)),
      FillIn(3L, ts(30), 1L, None), FillIn(4L, ts(40), 1L, Some(20.0)),
      FillIn(5L, ts(50), 1L, None),
      FillIn(6L, ts(15), 2L, None), FillIn(7L, ts(25), 2L, None))
    try {
      in.addData(rows(2), rows(0), rows(6)) // out of order
      q.processAllAvailable()
      in.addData(rows(1), rows(4), rows(3), rows(5))
      q.processAllAvailable()
      Seq(1000L, 2000L).foreach { t =>
        in.addData(FillIn(99L, ts(t), 99L, None))
        q.processAllAvailable()
      }
      val got = spark.table("locf").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
        .filter(_._1 != 99L).toSet
      import spark.implicits._
      val batch = graft.operators.EtlOps.forwardFill(
        rows.map(x => (x.key, x.ts.getTime / 1000, x.eventId, x.reading))
          .toDF("key", "sec", "event_id", "reading"),
        Seq("key"), Seq("sec", "event_id"), Seq("reading"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(2),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSet
      assert(got == batch, s"stream $got vs batch $batch")
      assert(got.contains((1L, 3L, Some(10.0)))) // gap actually repaired
      assert(got.contains((2L, 7L, None)))       // no-reading key stays null
    } finally q.stop()
  }

  test("maintainAggregateStream: folded state equals a one-shot recompute") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.IncrementalAgg
    val in = MemoryStream[(Long, Double)]
    def rollup(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.groupBy(col("k"))
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(8,2)")).cast("decimal(18,2)").as("total"),
          max(col("v").cast("decimal(8,2)")).cast("decimal(18,2)").as("mx"))
    val empty = rollup(Seq.empty[(Long, Double)].toDF("k", "v"))
    @volatile var state: org.apache.spark.sql.DataFrame = empty
    val q = StreamOps.maintainAggregateStream(
      in.toDF().toDF("k", "v"), empty, Seq("k"), rollup,
      Seq("n" -> IncrementalAgg.MergeSum, "total" -> IncrementalAgg.MergeSum,
        "mx" -> IncrementalAgg.MergeMax))(st => state = st)
    val all = Seq(1L -> 10.5, 2L -> 3.25, 1L -> 0.25, 3L -> 7.0,
      2L -> 100.0, 1L -> 2.0)
    try {
      all.grouped(2).foreach { chunk => in.addData(chunk); q.processAllAvailable() }
      val folded = state.orderBy("k").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          r.getDecimal(2).doubleValue(), r.getDecimal(3).doubleValue()))
      val full = rollup(all.toDF("k", "v")).orderBy("k").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          r.getDecimal(2).doubleValue(), r.getDecimal(3).doubleValue()))
      assert(folded.toSeq == full.toSeq)
      // schema must not widen across merges — the state keeps its types
      // (nullability legitimately relaxes through the full-outer merge)
      assert(state.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        empty.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    } finally q.stop()
  }

  test("streaming forward fill equals the batch twin on real event data") {
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.{FillIn, FillOut}
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .selectExpr("event_id AS eventId", "ts", "user_id AS key",
        "CASE WHEN event_id % 4 = 0 THEN value END AS reading")
      .as[FillIn].collect().sortBy(r => (r.ts.getTime, r.eventId))
    val batch = graft.operators.EtlOps.forwardFill(
      graft.Tables.events(spark, "/root/testdata/sf0.001")
        .selectExpr("event_id", "user_id",
          "CAST(FLOOR(unix_timestamp(ts)) AS LONG) AS sec",
          "CASE WHEN event_id % 4 = 0 THEN value END AS reading"),
      Seq("user_id"), Seq("sec", "event_id"), Seq("reading"))
      .select("event_id", "reading_filled").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val in = MemoryStream[FillIn]
    val q = StreamOps.forwardFillStream(in.toDS(), "60 seconds").writeStream
      .format("memory").queryName("locf_twin").outputMode("append").start()
    try {
      // chronological chunks keep delivery within the watermark bound;
      // intra-chunk arrival order is whatever MemoryStream does
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        in.addData(chunk.toSeq); q.processAllAvailable()
      }
      val flushTs = new java.sql.Timestamp(ev.last.ts.getTime + 3600 * 1000L)
      Seq(1, 2).foreach { i =>
        in.addData(FillIn(-i.toLong, flushTs, -1L, None)); q.processAllAvailable()
      }
      val stream = spark.table("locf_twin").as[FillOut].collect()
        .filter(_.eventId >= 0)
        .map(o => o.eventId -> o.filled).toMap
      assert(stream.size == batch.size)
      assert(stream == batch)
    } finally q.stop()
  }

  test("transformWithState timer sessionize equals the flatMapGroupsWithState twin") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def run(mk: org.apache.spark.sql.Dataset[Event] => org.apache.spark.sql.Dataset[StreamOps.SessionOut],
            name: String): Set[(Long, Long, Long, Long)] = {
      val in = MemoryStream[Event]
      val q = mk(in.toDS()).writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        in.addData(Event(1, ts(1000), 1, "a", 0), Event(2, ts(1100), 1, "a", 0))
        q.processAllAvailable()
        // gap > 1800 within one batch: in-batch session split
        in.addData(Event(3, ts(5000), 1, "a", 0), Event(4, ts(5100), 1, "a", 0),
          Event(5, ts(1050), 2, "a", 0))
        q.processAllAvailable()
        // push the watermark far out so every open session's timer fires
        Seq(100000L, 200000L).foreach { t =>
          in.addData(Event(99, ts(t), 99, "flush", 0)); q.processAllAvailable()
        }
        spark.table(name).as[StreamOps.SessionOut].collect()
          .filter(_.userId != 99L)
          .map(s => (s.userId, s.nEvents, s.startSec, s.endSec)).toSet
      } finally q.stop()
    }
    try {
      val tws = run(StreamOps.sessionizeTws(_, 1800L), "sess_tws")
      val fmgws = run(StreamOps.sessionize(_, 1800L), "sess_fmgws")
      assert(tws == fmgws, s"tws $tws vs fmgws $fmgws")
      assert(tws.contains((1L, 2L, 1000L, 1100L))) // split first session
      assert(tws.contains((1L, 2L, 5000L, 5100L))) // second session
      assert(tws.contains((2L, 1L, 1050L, 1050L)))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming sessionize equals the batch twin on real event data") {
    implicit val sqlCtx = spark.sqlContext
    val gap = 1800L
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .selectExpr("event_id AS eventId", "ts", "user_id AS userId",
        "event_type AS eventType", "value")
      .as[Event].collect().sortBy(_.ts.getTime)

    val batch = graft.operators.Sessionize.sessions(
      graft.Tables.events(spark, "/root/testdata/sf0.001")
        .selectExpr("user_id", "CAST(FLOOR(unix_timestamp(ts)) AS LONG) AS sec", "event_id"),
      "user_id", "sec", "event_id", gap)
      .select("user_id", "n_events", "start_sec", "end_sec").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val in = MemoryStream[Event]
    val q = StreamOps.sessionize(in.toDS(), gap).writeStream
      .format("memory").queryName("twin").outputMode("append").start()
    try {
      // feed chronologically in 3 chunks, then advance the watermark far
      // past every session end so all remaining state times out
      ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { chunk =>
        in.addData(chunk.toSeq); q.processAllAvailable()
      }
      val flushTs = new java.sql.Timestamp(ev.last.ts.getTime + gap * 1000 * 10)
      in.addData(Event(-1L, flushTs, -1L, "flush", 0.0))
      q.processAllAvailable()
      val stream = spark.table("twin").as[SessionOut].collect()
        .filter(_.userId >= 0)
        .map(s => (s.userId, s.nEvents, s.startSec, s.endSec)).toSet
      assert(stream == batch,
        s"missing=${(batch -- stream).take(5)} extra=${(stream -- batch).take(5)}")
    } finally q.stop()
  }

  test("sessionize: gap closes sessions; out-of-order event min-updates start") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val sessions = StreamOps.sessionize(in.toDS(), gapSeconds = 60)
    val q = sessions.writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      in.addData(Event(1, ts(100), 1, "a", 1.0), Event(2, ts(130), 1, "a", 1.0))
      q.processAllAvailable()
      // out-of-order but within watermark: must extend session start back
      in.addData(Event(3, ts(80), 1, "a", 1.0))
      q.processAllAvailable()
      // advance event time far enough to time the session out
      in.addData(Event(4, ts(10000), 2, "a", 1.0))
      q.processAllAvailable()
      val out = spark.table("sess").as[SessionOut].collect().filter(_.userId == 1L)
      assert(out.length == 1)
      assert(out.head == SessionOut(1L, 3L, 80L, 130L))
    } finally q.stop()
  }

  test("corpusCleanStream: quality gate + watermarked exact dedup equals the batch composition") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val out = StreamOps.corpusCleanStream(docs, minTokens = 5, watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("cclean").outputMode("append").start()
    try {
      val keepA = (1 to 6).map(i => s"tok$i").mkString(" ")   // 6 tokens, passes
      val keepB = (1 to 8).map(i => s"word$i").mkString(" ")
      val short = "too short"                                  // 2 tokens, gated
      val dupA = "  " + keepA + "  "                           // same fingerprint as keepA
      in.addData((1L, ts(3600), keepA), (2L, ts(3610), short))
      q.processAllAvailable()
      in.addData((3L, ts(3620), dupA), (4L, ts(3630), keepB))
      q.processAllAvailable()
      val got = spark.table("cclean").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_tokens")).toMap
      // short gated by quality; dupA dropped as an exact dup of keepA
      assert(got == Map(1L -> 6, 4L -> 8))
      // the batch composition on the same rows agrees
      val batch = Seq((1L, keepA), (2L, short), (3L, dupA), (4L, keepB))
        .toDF("doc_id", "text")
      val batchKept = graft.operators.Dedup.keepFirst(
        batch.where(size(graft.functions.Text.tokens($"text")) >= 5), "doc_id", "text")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got.keySet == batchKept)
    } finally q.stop()
  }

  test("incrementalDedupStream: batches dedup against corpus + earlier survivors") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((1L, "seed corpus document number one")).toDF("doc_id", "text")
    val idx0 = graft.operators.Dedup.dedupIndex(corpus, "doc_id", "text")
    val in = MemoryStream[(Long, String)]
    val survivorsByBatch = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = StreamOps.incrementalDedupStream(
      in.toDF().toDF("doc_id", "text"), idx0, "doc_id", "text") { surv =>
      survivorsByBatch += surv.select("doc_id").collect().map(_.getLong(0)).toSet
    }
    try {
      in.addData(
        (10L, "fresh novel batch-one writing example"),
        (11L, "Seed Corpus DOCUMENT number one"), // exact dup of corpus 1
        (12L, "fresh novel batch-one writing example")) // in-batch dup of 10
      q.processAllAvailable()
      in.addData(
        (20L, "fresh novel batch-one writing example"), // dup of survivor 10
        (21L, "completely different batch-two content"))
      q.processAllAvailable()
      assert(survivorsByBatch.toSeq == Seq(Set(10L), Set(21L)))
    } finally q.stop()
  }

  test("transitionsStream: pairs form across batch boundaries via the carry") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long, String)]
    @volatile var counts: org.apache.spark.sql.DataFrame = null
    val q = StreamOps.transitionsStream(
      in.toDF().toDF("user_id", "event_id", "sec", "event_type"))(df => counts = df)
    try {
      // user 1: a→b in batch 1, then (nothing in batch 2), then c in batch 3
      //   ⇒ b→c must form from a carry that SURVIVED an idle batch.
      // user 2: d at the end of batch 1, e at the start of batch 2
      //   ⇒ d→e is a plain boundary pair.
      in.addData((1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (2L, 3L, 30L, "d"))
      q.processAllAvailable()
      in.addData((2L, 4L, 40L, "e"))
      q.processAllAvailable()
      in.addData((1L, 5L, 50L, "c"))
      q.processAllAvailable()
      val got = counts.collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == Map(("a", "b") -> 1L, ("b", "c") -> 1L, ("d", "e") -> 1L))
    } finally q.stop()
  }
}

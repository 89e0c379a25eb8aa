package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming twins of the batch operators. State is always
  * bounded: watermarks cap the window state, and session state is per-key
  * with an event-time timeout.
  */
object StreamOps {

  case class Event(eventId: Long, ts: java.sql.Timestamp, userId: Long,
                   eventType: String, value: Double)
  case class SessionOut(userId: Long, nEvents: Long, startSec: Long, endSec: Long)
  // NOT private: Spark's state-encoder codegen needs public accessors
  case class SessionState(nEvents: Long, startSec: Long, endSec: Long)
  case class DocSig(id: Long, sig: Long)
  case class AsofLeft(key: Long, ts: java.sql.Timestamp, value: Double)
  case class AsofRight(key: Long, ts: java.sql.Timestamp, rate: Double)
  case class AsofOut(key: Long, sec: Long, value: Double, rate: Option[Double])
  case class AsofIn(side: Int, key: Long, ts: java.sql.Timestamp, v: Double)
  case class AsofJoinState(rights: List[(Long, Double)],
                           lefts: List[(Long, Double)])
  case class FillIn(eventId: Long, ts: java.sql.Timestamp, key: Long,
                    reading: Option[Double])
  case class FillOut(key: Long, eventId: Long, sec: Long,
                     reading: Option[Double], filled: Option[Double])
  case class FillState(carrySec: Long, carryId: Long, carry: Option[Double],
                       pending: List[(Long, Long, Option[Double])])
  case class DupPair(aId: Long, bId: Long, hamming: Int)
  case class MinHashPair(aId: Long, bId: Long, estJaccard: Double)
  case class CosinePair(aId: Long, bId: Long, cosine: Double)

  /** Tumbling-window counts/sums per event type with a watermark —
    * streaming twin of q13_events_hourly.
    */
  def hourlyAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** Streaming OHLC downsampling (q56's continuous twin): watermarked
    * tumbling windows with open/close as min_by/max_by on an exact packed
    * (sec, event_id) BIGINT order key — declarative aggregates, so the
    * state store holds one (value, key) pair per extreme per window, and
    * cross-batch merge keeps exact first/last semantics regardless of
    * arrival order within the watermark.
    */
  def hourlyOhlc(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val ord = unix_timestamp(col("ts")) * lit(10000000L) + col("event_id")
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(min_by(col("value"), ord).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), ord).as("close"),
        count(lit(1)).as("n_events"))
  }

  /** Stream-static enrichment join: each micro-batch joins the stream
    * against a static dimension; Spark re-plans the static side per batch
    * and broadcasts it when small. Left join keeps events with no match
    * (blank-fill happens downstream via EtlOps.conformSchema).
    */
  def enrichWithStatic(stream: DataFrame, static: DataFrame,
                       keys: Seq[String], joinType: String = "left"): DataFrame =
    stream.join(static, keys, joinType)

  /** Stream-stream inner join within an event-time bound — the
    * impression⋈click shape. Column names must be disjoint between the two
    * sides (rename before calling); watermarks on BOTH sides plus the time
    * range let Spark bound the join state: a left row is dropped once the
    * right watermark passes leftTs + within, and vice versa.
    */
  def joinWithinTime(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     leftTs: String, rightTs: String,
                     within: String, watermark: String,
                     joinType: String = "inner"): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"),
        // "left_outer" emits unmatched left rows (right side null) once
        // the watermark proves no match can still arrive — the funnel
        // "views that never clicked" shape; state stays bounded exactly
        // as in the inner case
        joinType)

  /** Unwindowed running totals per key, for Update output mode: each
    * micro-batch emits the keys it touched with their new running value.
    * State is one row per key (no watermark needed — the aggregate is
    * total-history by design; cap cardinality upstream if keys are
    * unbounded).
    */
  def runningTotals(events: DataFrame, keyCol: String,
                    valueCol: String): DataFrame =
    events.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("total"))

  case class KV(k: Long, v: Double)
  case class RunningTotal(k: Long, nEvents: Long, total: Double)

  /** [[runningTotals]] re-expressed on Spark 4's transformWithState — the
    * successor API to flatMapGroupsWithState: typed state variables
    * (ValueState/ListState/MapState) with per-variable TTL, backed by the
    * RocksDB state store (disk-spillable — keyed state is no longer bound
    * by executor heap, which is what changes at 100 TB key cardinality).
    * Queries using it must run with the RocksDB provider
    * (`spark.sql.streaming.stateStore.providerClass`); equality with the
    * aggregate-based twin is asserted in the spec.
    */
  def runningTotalsTws(events: Dataset[KV]): Dataset[RunningTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.k)
      .transformWithState(new RunningTotalProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  class RunningTotalProcessor
    extends StatefulProcessor[Long, KV, RunningTotal] {
    @transient private var st: ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double)]("totals",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaDouble),
        TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[KV],
                                 timerValues: TimerValues): Iterator[RunningTotal] = {
      val (n0, t0) = if (st.exists()) st.get() else (0L, 0.0)
      var n = n0
      var t = t0
      rows.foreach { r => n += 1; t += r.v }
      st.update((n, t))
      Iterator.single(RunningTotal(key, n, t))
    }
  }

  /** Update-mode running top-k per key via the native TopKAgg heap
    * aggregate — custom TypedImperativeAggregates serialize into the
    * streaming state store like any built-in, so the bounded per-group
    * heap (≤ k values per key, ever) works on streams unchanged.
    */
  def runningTopK(events: DataFrame, keyCol: String, valueCol: String,
                  k: Int): DataFrame =
    events.groupBy(col(keyCol))
      .agg(graft.expressions.TopKAgg.topK(col(valueCol), k).as("topk"))

  /** Update-mode running heavy hitters per key: the Misra–Gries sketch as
    * streaming state — ≤k counters per key in the state store regardless
    * of how many distinct items flow past (an exact streaming word count
    * would grow state with the vocabulary).
    */
  def runningHeavyHitters(events: DataFrame, keyCol: String, itemCol: String,
                          k: Int): DataFrame =
    events.groupBy(col(keyCol))
      .agg(graft.expressions.FreqSketchAgg.freqSketch(col(itemCol), k).as("hh"))

  /** Continuous CDC apply: fold a changelog STREAM into a keyed snapshot,
    * one micro-batch at a time, via foreachBatch + the batch Cdc operator.
    * `onUpdate` receives the new snapshot after each batch (in production
    * this is where a MERGE INTO a table format goes; the localCheckpoint
    * keeps the snapshot's lineage flat across unbounded batches).
    */
  def applyChangelogStream(changes: DataFrame, initial: DataFrame,
                           keyCol: String, seqCol: String, opCol: String)
                          (onUpdate: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var snapshot = initial.localCheckpoint(true)
    changes.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      snapshot = graft.operators.Cdc
        .applyChangelog(snapshot, batch, keyCol, seqCol, opCol)
        .localCheckpoint(true)
      onUpdate(snapshot)
    }.start()
  }

  /** Apply ONE micro-batch of keyed changes to a graft-catalog table via
    * SQL MERGE INTO, idempotently: a committed-batch watermark file inside
    * the table directory records the highest applied batch id, and a
    * replayed id ≤ watermark is skipped without touching the table.
    * Returns true if the batch was applied, false if skipped.
    *
    * Exactly-once argument (the Delta `txn` discipline, approximated with
    * a marker + an idempotent fold): Structured Streaming only ever
    * replays the LAST batch whose checkpoint commit did not land, and a
    * batch is first deduped to its latest change per key — so a re-MERGE
    * of that batch writes the exact same state (upserts set identical
    * values, deletes stay deleted). The marker makes the common replay a
    * metadata no-op and the observable table state equal to exactly-once
    * application even though delivery is at-least-once.
    */
  def catalogUpsertBatch(batch: DataFrame, batchId: Long, targetTable: String,
                         tableDir: String, keyCol: String, seqCol: String,
                         opCol: String): Boolean = {
    val spark = batch.sparkSession
    val dir = new org.apache.hadoop.fs.Path(tableDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new org.apache.hadoop.fs.Path(dir, "_graft_stream_commit")
    val applied =
      if (!fs.exists(marker)) -1L
      else {
        val in = fs.open(marker)
        try scala.io.Source.fromInputStream(in).mkString.trim.toLong
        finally in.close()
      }
    if (batchId <= applied) return false
    val latest = graft.operators.Cdc.latestChanges(batch, keyCol, seqCol, opCol)
    val dataCols = batch.columns.toSeq.filterNot(Set(keyCol, seqCol, opCol))
    val view = s"graft_upsert_src_${math.abs(targetTable.hashCode)}"
    latest.createOrReplaceTempView(view)
    val insCols = (keyCol +: dataCols).mkString(", ")
    val insVals = (keyCol +: dataCols).map(c => s"s.$c").mkString(", ")
    val setList = dataCols.map(c => s"t.$c = s.$c").mkString(", ")
    spark.sql(
      s"""MERGE INTO $targetTable t USING $view s ON t.$keyCol = s.$keyCol
         |WHEN MATCHED AND s.$opCol = '${graft.operators.Cdc.OpDelete}' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET $setList
         |WHEN NOT MATCHED AND s.$opCol <> '${graft.operators.Cdc.OpDelete}'
         |  THEN INSERT ($insCols) VALUES ($insVals)""".stripMargin)
    val out = fs.create(marker, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    true
  }

  /** Continuous streaming upsert into a graft-catalog table: foreachBatch
    * + `catalogUpsertBatch` — the production form of applyChangelogStream
    * where the snapshot is a real table instead of in-memory state. The
    * catalog's copy-on-write MERGE rewrites only files holding matched
    * keys (runtime group filtering), so per-batch write cost scales with
    * the batch's key spread, not the table.
    */
  def catalogUpsertStream(changes: DataFrame, targetTable: String,
                          tableDir: String, keyCol: String, seqCol: String,
                          opCol: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      catalogUpsertBatch(batch, batchId, targetTable, tableDir, keyCol, seqCol, opCol)
      ()
    }.start()

  /** Streaming APPEND into a graft-catalog table: each micro-batch lands
    * through the catalog's batch writer, so everything the table declares
    * applies per batch — bucket routing + per-file key sort on bucketed
    * tables (the landed table is storage-partitioned-join-ready the
    * moment the batch commits), partition-directory layout on partitioned
    * ones, manifest append-retry on history ones. Append-only sources
    * need no dedupe marker; a redelivering source pairs this with
    * `catalogUpsertBatch`'s committed-batch marker instead. At 100 TB the
    * per-batch small files are the trade — `compactBucketedTable` /
    * `compactTable` own the file-size invariant.
    */
  def catalogAppendStream(rows: DataFrame,
                          targetTable: String): org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      batch.writeTo(targetTable).append()
      ()
    }.start()

  /** Streaming type-2 SCD upkeep — the continuous form of
    * `Cdc.scd2History`: each micro-batch of keyed changes extends the
    * maintained version history. Closed versions are immutable — only the
    * OPEN (is_current) version of a key seen in the batch can change: it
    * is replayed as an upsert at its own valid_from and re-folded with the
    * batch through the batch operator, so the incremental fold equals a
    * one-shot scd2History over the whole changelog PROVIDED per-key
    * sequence numbers arrive monotonically across batches (the changelog
    * contract; within a batch any order is fine — the fold sorts).
    *
    * Scale shape: per batch, one semi-join of the history's open slice
    * against the batch's keys (AQE broadcasts the batch side — a
    * micro-batch is small by construction) + the batch-sized scd2 window.
    * History rows for untouched keys are never shuffled. In production
    * the history is a stored table MERGEd per batch; here it folds in
    * memory with flat lineage via localCheckpoint, as
    * applyChangelogStream does.
    */
  def scd2Stream(changes: DataFrame, keyCol: String, seqCol: String,
                 opCol: String)
                (onUpdate: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var history: DataFrame = null
    changes.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      history = if (history == null) {
        graft.operators.Cdc.scd2History(batch, keyCol, seqCol, opCol)
          .localCheckpoint(true)
      } else {
        val keys = batch.select(col(keyCol)).distinct()
          .withColumn("__affected", lit(true))
        val marked = history.join(keys, Seq(keyCol), "left")
        val keep = marked.where(!col("is_current") || col("__affected").isNull)
          .drop("__affected")
        val dataCols = history.columns.toSeq
          .filterNot(Set("valid_from", "valid_to", "is_current"))
        val replayedOpen = marked
          .where(col("is_current") && col("__affected").isNotNull)
          .select(dataCols.map(col) :+ col("valid_from").as(seqCol)
            :+ lit(graft.operators.Cdc.OpUpsert).as(opCol): _*)
        val refolded = graft.operators.Cdc.scd2History(
          replayedOpen.unionByName(
            batch.select(dataCols.map(col) :+ col(seqCol) :+ col(opCol): _*)),
          keyCol, seqCol, opCol)
        keep.unionByName(refolded).localCheckpoint(true)
      }
      onUpdate(history)
    }.start()
  }

  /** Streaming incremental ingest dedup — the continuous form of
    * `Dedup.incrementalSurvivors`: each micro-batch dedups within itself
    * (keepFirst), then against the GROWING corpus index; survivors go to
    * `onSurvivors` and their (id, fp, simhash) rows append to the index,
    * so later batches drop duplicates of earlier survivors. In production
    * the index is a stored table (the foreachBatch body reads/appends a
    * table format) and corpus text is never re-read — the index rows are
    * three small columns per document. Here the index folds in memory
    * with flat lineage via localCheckpoint, as applyChangelogStream does.
    */
  def incrementalDedupStream(docs: DataFrame, initialIndex: DataFrame,
                             idCol: String, textCol: String, maxDist: Int = 3)
                            (onSurvivors: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var index = initialIndex.localCheckpoint(true)
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val inBatch = graft.operators.Dedup.keepFirst(batch, idCol, textCol)
      val surv = graft.operators.Dedup
        .incrementalSurvivors(inBatch, index, idCol, textCol, maxDist)
        .localCheckpoint(true)
      index = index.unionByName(
        graft.operators.Dedup.dedupIndex(surv, idCol, textCol))
        .localCheckpoint(true)
      onSurvivors(surv)
    }.start()
  }

  /** Streaming materialized-view upkeep — the continuous form of
    * `IncrementalAgg.merge`: each micro-batch is reduced by `rollup`
    * (an aggregation to the state schema) and merged into the maintained
    * state measure-wise; history is never re-aggregated. Merged measures
    * are cast back to the state's declared types so the schema stays
    * fixed across unbounded batches (decimal sums would otherwise widen
    * one digit of precision per merge; size the state's decimals with
    * headroom — ANSI mode errors loudly if they ever overflow). In
    * production the state is a bucketed stored table (read + MERGE per
    * batch, delta-only shuffle); here it folds in memory with flat
    * lineage via localCheckpoint, as applyChangelogStream does.
    */
  /** Continuous first-order transition counts (the batch q62's streaming
    * twin): a foreachBatch fold that carries each key's LAST event across
    * micro-batches, so adjacent-event pairs FORM ACROSS batch boundaries —
    * the part a stateless per-batch lead() would silently drop.
    *
    * Contract: batches arrive in event-time order per key (a keyed Kafka
    * partition's delivery order; the harness feeds time-sorted slices).
    * State is two bounded tables: the (from, to) count matrix (type², a
    * dim) and ONE carry row per key — both localCheckpointed so lineage
    * stays flat over unbounded batches. `events` needs columns
    * (user_id, event_id, sec, event_type).
    */
  def transitionsStream(events: DataFrame)
                       (onUpdate: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.expressions.Window
    var counts: DataFrame = null
    var carry: DataFrame = null // (user_id, event_type) — last event seen
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val b = batch.localCheckpoint(true)
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
      val inBatch = b.withColumn("next_type", lead(col("event_type"), 1).over(w))
        .where(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val firsts = b.groupBy(col("user_id"))
        .agg(min_by(col("event_type"), struct(col("sec"), col("event_id")))
          .as("first_type"))
      val boundary =
        if (carry == null) inBatch.where(lit(false))
        else carry.join(firsts, Seq("user_id"))
          .groupBy(col("event_type").as("from_type"),
            col("first_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
      val delta = inBatch.unionByName(boundary)
        .groupBy(col("from_type"), col("to_type")).agg(sum(col("n")).as("n"))
      counts =
        (if (counts == null) delta
         else graft.operators.IncrementalAgg.merge(counts, delta,
           Seq("from_type", "to_type"),
           Seq("n" -> graft.operators.IncrementalAgg.MergeSum)))
          .select(col("from_type"), col("to_type"), col("n").cast("long").as("n"))
          .localCheckpoint(true)
      val lasts = b.groupBy(col("user_id"))
        .agg(max_by(col("event_type"), struct(col("sec"), col("event_id")))
          .as("event_type"))
      carry =
        (if (carry == null) lasts
         else lasts.unionByName(
           carry.join(lasts.select(col("user_id")), Seq("user_id"), "left_anti")))
          .localCheckpoint(true)
      onUpdate(counts)
    }.start()
  }

  def maintainAggregateStream(rows: DataFrame, initial: DataFrame,
                              keys: Seq[String],
                              rollup: DataFrame => DataFrame,
                              measures: Seq[(String, graft.operators.IncrementalAgg.MergeOp)])
                             (onUpdate: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = initial.schema
    var state = initial.localCheckpoint(true)
    rows.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val merged = graft.operators.IncrementalAgg
        .merge(state, rollup(batch), keys, measures)
      state = merged
        .select(schema.fields.map(f => col(f.name).cast(f.dataType)).toSeq: _*)
        .localCheckpoint(true)
      onUpdate(state)
    }.start()
  }

  /** Stream → partitioned parquet data lake: append sink with a
    * checkpoint (exactly-once via the file-sink commit log) partitioned
    * by `partitionCols`. The partition columns should be low-cardinality
    * derivations (date, hour, event type) or the sink degenerates to one
    * file per key per micro-batch.
    */
  def toPartitionedParquet(df: DataFrame, path: String, checkpoint: String,
                           partitionCols: Seq[String]): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy(partitionCols: _*)
      .outputMode("append")
      .start()

  /** Streaming exact dedup by event_id within the watermark horizon. */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming corpus clean — the training-feed composition as ONE
    * continuous query: quality gate (native TokenStats, stateless) →
    * exact-dup drop on the normalized-text fingerprint, state bounded by
    * the event-time watermark. Columns in: (doc_id, ts, text); out: the
    * surviving rows plus n_tokens. The stateless filters fuse into the
    * scan exactly like the batch twin; the ONE stateful stage is the
    * fingerprint dedup store.
    */
  def corpusCleanStream(docs: DataFrame, minTokens: Int = 30,
                        watermark: String = "2 hours"): DataFrame = {
    docs
      .withColumn("__stats", graft.functions.Text.tokenStats(col("text")))
      .withColumn("n_tokens",
        graft.functions.Text.ts(col("__stats"), graft.functions.Text.Ts.NTokens))
      .drop("__stats")
      .where(col("n_tokens") >= minTokens)
      .withColumn("fp", graft.functions.Text.fingerprint(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")
  }

  /** Streaming near-duplicate candidate pairs — the streaming twin of
    * Dedup.simhashPairs. Each document gets a per-row 60-bit simhash
    * (stateless expression — no windows/aggregates, so it composes with
    * the stateful stage); its 4 signature quarters key a
    * flatMapGroupsWithState bucket store, and a new document emits a pair
    * against every stored bucket member within Hamming `maxDist`. Any pair
    * within Hamming ≤ 3 shares at least one quarter, so recall matches the
    * batch operator; a pair sharing several quarters is emitted once per
    * shared quarter — downstream dedups (aId, bId), kept out of this
    * operator so the plan has ONE stateful stage.
    *
    * State shape at scale: buckets are per-(quarter, value) lists capped at
    * `maxBucket` members (beyond it, new docs still PAIR against stored
    * members but are not stored — a hot bucket degrades recall, never
    * memory). Production streams add an event-time timeout to age buckets
    * out, exactly as `sessionize` does; omitted here so the operator works
    * on processing-time streams too.
    */
  def nearDupPairsStream(docs: DataFrame, idCol: String, textCol: String,
                         maxDist: Int = 3, maxBucket: Int = 64): Dataset[DupPair] = {
    require(maxDist <= 3, s"4-quarter blocking loses recall beyond Hamming 3 (got $maxDist)")
    val spark = docs.sparkSession
    import spark.implicits._
    val quartered = docs
      .select(col(idCol).cast("long").as("id"),
        graft.functions.Text.simhash(textCol).as("sig"))
      .select(col("id"), col("sig"),
        explode(array((0 until 4).map(q => struct(lit(q).as("q"),
          shiftright(col("sig"), q * 15).bitwiseAND(lit(0x7fffL)).as("qv"))): _*)).as("p"))
      .select(col("id"), col("sig"), col("p.q").as("q"), col("p.qv").as("qv"))
      .as[(Long, Long, Int, Long)]
    quartered
      .groupByKey { case (_, _, q, qv) => (q, qv) }
      .flatMapGroupsWithState[List[DocSig], DupPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[List[DocSig]]) =>
          pairAndStore(rows.map { case (id, sig, _, _) => (id, sig) },
            state, maxDist, maxBucket)
      }
  }

  /** [[nearDupPairsStream]] with BOUNDED state: buckets idle longer than
    * the watermark horizon are evicted via event-time timeout — the 100 TB
    * shape, where dedup state must not grow with stream lifetime. Pairing
    * semantics are identical within the horizon; a duplicate arriving
    * after its bucket expired is missed by design (the same trade
    * `dropDuplicatesWithinWatermark` makes). `tsCol` must be a timestamp
    * column on `docs`.
    */
  def nearDupPairsStreamWatermarked(docs: DataFrame, idCol: String,
                                    textCol: String, tsCol: String,
                                    watermark: String, maxDist: Int = 3,
                                    maxBucket: Int = 64): Dataset[DupPair] = {
    require(maxDist <= 3, s"4-quarter blocking loses recall beyond Hamming 3 (got $maxDist)")
    val spark = docs.sparkSession
    import spark.implicits._
    val quartered = docs
      .withWatermark(tsCol, watermark)
      .select(col(idCol).cast("long").as("id"),
        graft.functions.Text.simhash(textCol).as("sig"), col(tsCol).as("ts"))
      .select(col("id"), col("sig"), col("ts"),
        explode(array((0 until 4).map(q => struct(lit(q).as("q"),
          shiftright(col("sig"), q * 15).bitwiseAND(lit(0x7fffL)).as("qv"))): _*)).as("p"))
      .select(col("id"), col("sig"), col("ts"), col("p.q").as("q"), col("p.qv").as("qv"))
      .as[(Long, Long, java.sql.Timestamp, Int, Long)]
    quartered
      .groupByKey { case (_, _, _, q, qv) => (q, qv) }
      .flatMapGroupsWithState[List[DocSig], DupPair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state: GroupState[List[DocSig]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // materialize before draining: `rows` is single-pass
            val batch = rows.toList
            val out = pairAndStore(batch.iterator.map { case (id, sig, _, _, _) => (id, sig) },
              state, maxDist, maxBucket)
            // lease = this batch's max EVENT time + horizon (the sessionize
            // pattern): evict only after a full horizon of event-time
            // inactivity. Basing the lease on the CURRENT watermark would
            // anchor first-batch buckets near epoch 0 and evict them one
            // batch later, silently dropping within-horizon pairs.
            val maxTsMs = batch.iterator.map(_._3.getTime).max
            state.setTimeoutTimestamp(
              math.max(maxTsMs, state.getCurrentWatermarkMs() + 1), watermark)
            out
          }
      }
  }

  /** Streaming MinHash-LSH near-dup candidate pairs — the minhash twin of
    * [[nearDupPairsStream]], for Jaccard-similarity dedup (vs simhash's
    * Hamming). Per row (stateless, so one stateful stage total): distinct
    * n-gram shingles via WordNgrams, a k-long signature via the
    * MinHashSignature expression (bit-identical to the batch operator's
    * hashes), and `bands` band hashes; a flatMapGroupsWithState bucket per
    * (band, bandhash) pairs new docs against stored members. EVERY
    * band-collision pair is emitted (the batch operator's candidate
    * contract — gating on the attached signature-agreement ESTIMATE
    * would silently drop pairs whose exact jaccard clears tau while the
    * estimate falls short of it, a real divergence caught at sf0.001),
    * with estJaccard (matching minhashes / k) attached for triage; the
    * exact verify against shingle sets is the downstream stage, exactly
    * as in batch. Pairs sharing several bands are emitted once per
    * band — dedup (aId, bId) downstream. `tau` documents the intended
    * verify threshold for that downstream stage; candidates below it in
    * ESTIMATE still flow (they may verify above it exactly).
    */
  def minhashPairsStream(docs: DataFrame, idCol: String, textCol: String,
                         tau: Double, n: Int = 3, k: Int = 128,
                         bands: Int = 32, maxBucket: Int = 64): Dataset[MinHashPair] = {
    require(k % bands == 0)
    val r = k / bands
    val spark = docs.sparkSession
    import spark.implicits._
    val sig = graft.expressions.MinHashExpressions.minHashSignature(
      graft.expressions.TextExpressions.wordNgrams(col(textCol), n, distinct = true), k)
    val banded = docs
      .select(col(idCol).cast("long").as("id"), sig.as("sig"))
      // shingle-less docs (< n tokens) keep the all-MaxValue sentinel
      // signature — they would ALL collide in every band and pair with
      // each other at estJaccard 1.0. The batch twin has no shingle rows
      // for them; drop them here too (sig(0) < MaxValue iff any shingle).
      .where(element_at(col("sig"), 1) =!= lit(Long.MaxValue))
      .select(col("id"), col("sig"),
        posexplode(graft.expressions.MinHashExpressions.bandHashes(col("sig"), bands, r))
          .as(Seq("band", "bh")))
      .as[(Long, Seq[Long], Int, Long)]
    banded
      .groupByKey { case (_, _, band, bh) => (band, bh) }
      .flatMapGroupsWithState[List[(Long, Array[Long])], MinHashPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[List[(Long, Array[Long])]]) =>
          minhashPairAndStore(
            rows.map { case (id, sigSeq, _, _) => (id, sigSeq.toArray) },
            state, tau, k, maxBucket)
      }
  }

  /** [[minhashPairsStream]] with BOUNDED state: band buckets idle past the
    * watermark horizon are evicted via event-time timeout, the same lease
    * pattern as [[nearDupPairsStreamWatermarked]] (lease = the batch's max
    * event time + horizon).
    */
  def minhashPairsStreamWatermarked(docs: DataFrame, idCol: String,
                                    textCol: String, tsCol: String,
                                    watermark: String, tau: Double,
                                    n: Int = 3, k: Int = 128, bands: Int = 32,
                                    maxBucket: Int = 64): Dataset[MinHashPair] = {
    require(k % bands == 0)
    val r = k / bands
    val spark = docs.sparkSession
    import spark.implicits._
    val sig = graft.expressions.MinHashExpressions.minHashSignature(
      graft.expressions.TextExpressions.wordNgrams(col(textCol), n, distinct = true), k)
    val banded = docs
      .withWatermark(tsCol, watermark)
      .select(col(idCol).cast("long").as("id"), sig.as("sig"), col(tsCol).as("ts"))
      // drop shingle-less docs — see minhashPairsStream
      .where(element_at(col("sig"), 1) =!= lit(Long.MaxValue))
      .select(col("id"), col("sig"), col("ts"),
        posexplode(graft.expressions.MinHashExpressions.bandHashes(col("sig"), bands, r))
          .as(Seq("band", "bh")))
      .as[(Long, Seq[Long], java.sql.Timestamp, Int, Long)]
    banded
      .groupByKey { case (_, _, _, band, bh) => (band, bh) }
      .flatMapGroupsWithState[List[(Long, Array[Long])], MinHashPair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state: GroupState[List[(Long, Array[Long])]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toList
            val out = minhashPairAndStore(
              batch.iterator.map { case (id, sigSeq, _, _, _) => (id, sigSeq.toArray) },
              state, tau, k, maxBucket)
            val maxTsMs = batch.iterator.map(_._3.getTime).max
            state.setTimeoutTimestamp(
              math.max(maxTsMs, state.getCurrentWatermarkMs() + 1), watermark)
            out
          }
      }
  }

  /** Shared bucket logic: pair each new doc against stored members within
    * Hamming `maxDist`, then store it (list capped at `maxBucket` — a hot
    * bucket degrades recall, never memory).
    */
  private def pairAndStore(rows: Iterator[(Long, Long)],
                           state: GroupState[List[DocSig]],
                           maxDist: Int, maxBucket: Int): Iterator[DupPair] =
    bucketPairs[DocSig, DupPair](rows.map { case (id, sig) => DocSig(id, sig) },
      state, _.id, (m, x) => {
        val h = java.lang.Long.bitCount(m.sig ^ x.sig)
        if (h <= maxDist)
          Some(DupPair(math.min(m.id, x.id), math.max(m.id, x.id), h))
        else None
      }, maxBucket)

  private def minhashPairAndStore(rows: Iterator[(Long, Array[Long])],
                                  state: GroupState[List[(Long, Array[Long])]],
                                  tau: Double, k: Int,
                                  maxBucket: Int): Iterator[MinHashPair] =
    bucketPairs[(Long, Array[Long]), MinHashPair](rows, state, _._1, (m, x) => {
      var matches = 0
      var i = 0
      while (i < k) {
        if (m._2(i) == x._2(i)) matches += 1
        i += 1
      }
      // NO estimate gate: the batch operator emits every band-collision
      // candidate and filters on EXACT jaccard downstream — an estimate
      // gate here drops pairs whose exact similarity clears tau while
      // the k-sample estimate lands below it (stddev ≈ √(τ(1−τ)/k), so
      // at k=128, τ=0.8 a true-0.82 pair misses ~30% of the time)
      val est = matches.toDouble / k
      Some(MinHashPair(math.min(m._1, x._1), math.max(m._1, x._1), est))
    }, maxBucket)

  /** Streaming embedding near-dup pairs — the vector twin of
    * [[minhashPairsStream]]. Each arriving embedding lands in one
    * random-hyperplane LSH bucket per table (the same LshBuckets
    * expression, planes and seed as the batch Dedup.embeddingPairsLsh, so
    * candidate generation is identical); a bucket store pairs it against
    * members by EXACT cosine ≥ tau (the vector travels with the row, so
    * unlike minhash the verify is exact, not an estimate). Pairs sharing
    * buckets in several tables are emitted once per table — dedup
    * (aId, bId) downstream.
    */
  def embeddingPairsStream(vecs: DataFrame, idCol: String, vecCol: String,
                           tau: Double, nTables: Int = 8, nPlanes: Int = 4,
                           dim: Int = 64, seed: Long = 42L,
                           maxBucket: Int = 256): Dataset[CosinePair] = {
    val planes = (0 until nTables)
      .map(t => graft.functions.Vectors.makePlanes(nPlanes, dim, seed + t)).toArray
    val spark = vecs.sparkSession
    import spark.implicits._
    val bucketed = vecs
      .select(col(idCol).cast("long").as("id"),
        graft.functions.Vectors.toDoubleArray(col(vecCol)).as("v"))
      .select(col("id"), col("v"),
        graft.functions.Vectors.norm(col("v")).as("nrm"),
        posexplode(graft.expressions.VectorExpressions.lshBuckets(col("v"), planes))
          .as(Seq("tbl", "bkt")))
      .as[(Long, Seq[Double], Double, Int, Long)]
    bucketed
      .groupByKey { case (_, _, _, tbl, bkt) => (tbl, bkt) }
      .flatMapGroupsWithState[List[(Long, Array[Double], Double)], CosinePair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[List[(Long, Array[Double], Double)]]) =>
          bucketPairs[(Long, Array[Double], Double), CosinePair](
            rows.map { case (id, v, nrm, _, _) => (id, v.toArray, nrm) },
            state, _._1, (m, x) => {
              val (mid, mv, mn) = m
              val (xid, xv, xn) = x
              var acc = 0.0
              var i = 0
              val n = math.min(mv.length, xv.length)
              while (i < n) { acc += mv(i) * xv(i); i += 1 }
              val cos = acc / (mn * xn)
              if (cos >= tau)
                Some(CosinePair(math.min(mid, xid), math.max(mid, xid), cos))
              else None
            }, maxBucket)
      }
  }

  /** Generic bucket-store pairing: each new member is paired against every
    * stored member via `pair`, then stored (list capped at `maxBucket` — a
    * hot bucket degrades recall, never memory).
    */
  private def bucketPairs[M, P](rows: Iterator[M], state: GroupState[List[M]],
                                idOf: M => Long, pair: (M, M) => Option[P],
                                maxBucket: Int): Iterator[P] = {
    var members = state.getOption.getOrElse(Nil)
    val out = scala.collection.mutable.ListBuffer[P]()
    rows.foreach { x =>
      val id = idOf(x)
      if (!members.exists(idOf(_) == id)) {
        members.foreach(m => pair(m, x).foreach(out += _))
        if (members.size < maxBucket) members = x :: members
      }
    }
    state.update(members)
    out.iterator
  }

  /** Streaming AS-OF join (stream-stream), which Spark has no native
    * operator for: each left event joins the LATEST right row with
    * right.ts <= left.ts for its key — the continuous form of
    * AsOfJoin.asofLast / the native batch operator.
    *
    * Correctness from the shared watermark: a left is emitted only once
    * the watermark passes its event time, at which point every right row
    * at-or-before that time has provably arrived — late-but-in-watermark
    * rows on either side reorder freely without changing the answer
    * (asserted equal to the batch twin in the spec).
    *
    * State per key: lefts not yet past the watermark (bounded by the
    * watermark horizon) + right rows newer than the watermark plus ONE
    * latest right at-or-before it (the as-of carry). The carry is the
    * inherent floor for as-of enrichment — one row per key, like any
    * keyed latest-value cache; everything else is watermark-pruned.
    */
  def asofJoinStream(lefts: Dataset[AsofLeft], rights: Dataset[AsofRight],
                     delay: String = "10 seconds"): Dataset[AsofOut] = {
    val spark = lefts.sparkSession
    import spark.implicits._
    val unioned = lefts.map(l => AsofIn(1, l.key, l.ts, l.value))
      .unionByName(rights.map(r => AsofIn(0, r.key, r.ts, r.rate)))
      .withWatermark("ts", delay)
    unioned.groupByKey(_.key)
      .flatMapGroupsWithState[AsofJoinState, AsofOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, it, state: GroupState[AsofJoinState]) =>
          val wmSec = state.getCurrentWatermarkMs() / 1000
          var st = state.getOption.getOrElse(AsofJoinState(Nil, Nil))
          if (!state.hasTimedOut) {
            it.foreach { x =>
              val sec = x.ts.getTime / 1000
              st = if (x.side == 1) st.copy(lefts = (sec, x.v) :: st.lefts)
              else st.copy(rights = (sec, x.v) :: st.rights)
            }
          }
          val (ready, pending) = st.lefts.partition(_._1 <= wmSec)
          val out = ready.sortBy(identity).map { case (lsec, lv) =>
            val matches = st.rights.filter(_._1 <= lsec)
            val rate = if (matches.isEmpty) None
            else Some(matches.maxBy(identity)._2) // latest; value-tiebroken
            AsofOut(key, lsec, lv, rate)
          }
          // prune rights to (latest at-or-before watermark) + in-flight
          val (past, future) = st.rights.partition(_._1 <= wmSec)
          val kept = (if (past.isEmpty) Nil else List(past.maxBy(identity))) ::: future
          if (pending.isEmpty && kept.isEmpty) state.remove()
          else {
            state.update(AsofJoinState(kept, pending))
            // wake this key when the watermark passes its oldest pending
            // left (pending secs are > wmSec, so the timestamp is legal)
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(pending.map(_._1).min * 1000 + 1)
          }
          out.iterator
      }
  }

  /** Streaming forward fill (LOCF) — the continuous twin of
    * `EtlOps.forwardFill`: each event emits with the latest non-NULL
    * reading at-or-before its event time for its key, correct under
    * out-of-order delivery within the watermark.
    *
    * Same discipline as [[asofJoinStream]] (LOCF IS a self as-of join):
    * events buffer per key until the watermark proves their prefix
    * complete, then emit in (sec, eventId) order folding the carry
    * forward. State per key = watermark-bounded pending buffer + ONE
    * carry value — the keyed latest-value cache any streaming gap-repair
    * needs, nothing more.
    */
  def forwardFillStream(events: Dataset[FillIn],
                        delay: String = "10 seconds"): Dataset[FillOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[FillState, FillOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, it, state: GroupState[FillState]) =>
          val wmSec = state.getCurrentWatermarkMs() / 1000
          var st = state.getOption.getOrElse(FillState(Long.MinValue, 0L, None, Nil))
          if (!state.hasTimedOut) {
            it.foreach { e =>
              st = st.copy(pending =
                (e.ts.getTime / 1000, e.eventId, e.reading) :: st.pending)
            }
          }
          val (ready, pending) = st.pending.partition(_._1 <= wmSec)
          var carrySec = st.carrySec
          var carryId = st.carryId
          var carry = st.carry
          val out = ready.sortBy(r => (r._1, r._2)).map { case (sec, id, reading) =>
            if (reading.isDefined) { carrySec = sec; carryId = id; carry = reading }
            FillOut(key, id, sec, reading, carry)
          }
          if (pending.isEmpty && carry.isEmpty) state.remove()
          else {
            state.update(FillState(carrySec, carryId, carry, pending))
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(pending.map(_._1).min * 1000 + 1)
          }
          out.iterator
      }
  }

  /** [[sessionize]] on transformWithState with EVENT-TIME TIMERS — the
    * timer half of the Spark 4 API ([[runningTotalsTws]] covers typed
    * state): instead of GroupStateTimeout, the processor registers an
    * explicit timer at session-end + gap and emits when the watermark
    * fires it; new activity deletes and re-arms the timer. Equality with
    * the flatMapGroupsWithState twin is asserted in the spec.
    */
  def sessionizeTws(events: Dataset[Event], gapSeconds: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.userId)
      .transformWithState(new SessionProcessorTws(gapSeconds),
        TimeMode.EventTime(), OutputMode.Append())
  }

  class SessionProcessorTws(gapSeconds: Long)
    extends StatefulProcessor[Long, Event, SessionOut] {
    @transient private var st: ValueState[SessionState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessionState]("session",
        org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[SessionOut] = {
      val secs = rows.map(_.ts.getTime / 1000).toSeq.sorted
      var closed = List.empty[SessionOut]
      var cur = if (st.exists()) Some(st.get()) else None
      secs.foreach { sec =>
        cur match {
          case Some(s) if sec - s.endSec <= gapSeconds =>
            cur = Some(SessionState(s.nEvents + 1,
              math.min(s.startSec, sec), math.max(s.endSec, sec)))
          case Some(s) =>
            closed ::= SessionOut(key, s.nEvents, s.startSec, s.endSec)
            cur = Some(SessionState(1, sec, sec))
          case None =>
            cur = Some(SessionState(1, sec, sec))
        }
      }
      cur.foreach { s =>
        st.update(s)
        // re-arm THE gap timer: one live timer per key, at end + gap
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
        getHandle.registerTimer((s.endSec + gapSeconds) * 1000 + 1)
      }
      closed.reverseIterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionOut] = {
      if (!st.exists()) Iterator.empty
      else {
        val s = st.get()
        st.clear()
        Iterator.single(SessionOut(key, s.nEvents, s.startSec, s.endSec))
      }
    }
  }

  /** Gap-based sessionization with flatMapGroupsWithState — streaming twin
    * of Sessionize.sessions. Emits a session when `gapSeconds` of event
    * time passes with no activity for the user (event-time timeout).
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.nEvents, s.startSec, s.endSec))
          } else {
            val secs = it.map(_.ts.getTime / 1000).toSeq.sorted
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            secs.foreach { sec =>
              cur match {
                case Some(s) if sec - s.endSec <= gapSeconds =>
                  // out-of-order (in-watermark) events can precede the
                  // session start — min-update start like the batch twin
                  cur = Some(SessionState(s.nEvents + 1,
                    math.min(s.startSec, sec), math.max(s.endSec, sec)))
                case Some(s) =>
                  closed ::= SessionOut(userId, s.nEvents, s.startSec, s.endSec)
                  cur = Some(SessionState(1, sec, sec))
                case None =>
                  cur = Some(SessionState(1, sec, sec))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.endSec + gapSeconds) * 1000 + 1)
            }
            closed.reverseIterator
          }
      }
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Empty-input robustness: a daily pipeline WILL eventually see an empty
  * partition (a quiet source, an over-selective filter). Every operator
  * must return an empty (or identity) result, not throw — an aborted DAG
  * at 3am over zero rows is the classic production page.
  */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
  private def someDocs = Seq((1L, "a b c d e f", "s1")).toDF("doc_id", "text", "source")

  test("dedup family: empty corpus yields empty results") {
    assert(Dedup.exact(emptyDocs, "doc_id", "text").isEmpty)
    assert(Dedup.keepFirst(emptyDocs, "doc_id", "text").isEmpty)
    assert(Dedup.jaccardPairsBlocked(emptyDocs, "doc_id", "text", "source", 3, 0.3).isEmpty)
    assert(Dedup.containmentPairsBlocked(emptyDocs, "doc_id", "text", "source", 3, 0.5).isEmpty)
    assert(Dedup.minhashLshPairs(emptyDocs, "doc_id", "text", 0.8).isEmpty)
    assert(Dedup.simhashPairs(emptyDocs, "doc_id", "text").isEmpty)
  }

  test("incremental dedup: empty batch against a real index, and vice versa") {
    val index = Dedup.dedupIndex(someDocs, "doc_id", "text")
    assert(Dedup.incrementalSurvivors(emptyDocs, index, "doc_id", "text").isEmpty)
    val emptyIndex = Dedup.dedupIndex(emptyDocs, "doc_id", "text")
    assert(Dedup.incrementalSurvivors(someDocs, emptyIndex, "doc_id", "text").count() == 1)
  }

  test("incremental join view: empty deltas contribute nothing, empty bases work") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "av")
    val b = Seq((1L, 10.0), (3L, 30.0)).toDF("k", "bv")
    val emptyA = Seq.empty[(Long, String)].toDF("k", "av")
    val emptyB = Seq.empty[(Long, Double)].toDF("k", "bv")
    // both deltas empty → no new view rows
    assert(EtlOps.incrementalJoinDelta(a, b, emptyA, emptyB, Seq("k")).isEmpty)
    // empty bases: the whole join comes from the deltas
    assert(EtlOps.incrementalJoinDelta(emptyA, emptyB, a, b, Seq("k")).count() == 1)
    // one-sided delta joins against base ∪ delta on the other side
    val da = Seq((3L, "z")).toDF("k", "av")
    assert(EtlOps.incrementalJoinDelta(a, b, da, emptyB, Seq("k")).count() == 1)
  }

  test("KLL: empty input and NULL-only input yield NULL quantiles, zero count") {
    import graft.expressions.KllSketchAgg
    val empty = Seq.empty[java.lang.Double].toDF("v")
    val r = empty.agg(KllSketchAgg.kllSketch(col("v"), 64).as("sk"))
      .select(KllSketchAgg.kllQuantile(col("sk"), 0.5).as("q"),
        KllSketchAgg.kllCount(col("sk")).as("n"))
      .collect().head
    assert(r.isNullAt(0) && r.getLong(1) == 0L)
    val nulls = Seq[java.lang.Double](null, null).toDF("v")
    val r2 = nulls.agg(KllSketchAgg.kllSketch(col("v"), 64).as("sk"))
      .select(KllSketchAgg.kllQuantile(col("sk"), 0.5).as("q"),
        KllSketchAgg.kllCount(col("sk")).as("n"))
      .collect().head
    assert(r2.isNullAt(0) && r2.getLong(1) == 0L)
  }

  test("semDedup: empty corpus yields empty survivors, singleton survives") {
    val emptyEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Dedup.semDedup(emptyEmb, "vec_id", "embedding", 2, 0.9).isEmpty)
    // a lone vector is its own centroid and must survive
    val one = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Dedup.semDedup(one, "vec_id", "embedding", 2, 0.9).count() == 1)
  }

  test("connected components: empty edge set yields empty labels") {
    val noPairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(ConnectedComponents.labels(noPairs, "a_id", "b_id").isEmpty)
  }

  test("as-of join: empty right side keeps lefts with NULL fills; empty left is empty") {
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "lv")
    val right = Seq.empty[(Long, Long, Double)].toDF("k", "t", "rv")
    val out = AsOfJoin.asofLast(left, right, "k", "t", "t").collect()
    assert(out.length == 1 && out.head.isNullAt(out.head.fieldIndex("rv")))
    val noLeft = Seq.empty[(Long, Long, String)].toDF("k", "t", "lv")
    val someRight = Seq((1L, 5L, 2.0)).toDF("k", "t", "rv")
    assert(AsOfJoin.asofLast(noLeft, someRight, "k", "t", "t").isEmpty)
  }

  test("CDC: empty changelog is identity; empty snapshot takes upserts") {
    val snap = Seq((1L, "a")).toDF("k", "name")
    val noChanges = Seq.empty[(Long, String, Long, String)].toDF("k", "name", "seq", "op")
    assert(Cdc.applyChangelog(snap, noChanges, "k", "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a")))
    val emptySnap = Seq.empty[(Long, String)].toDF("k", "name")
    val changes = Seq((2L, "b", 1L, "U")).toDF("k", "name", "seq", "op")
    assert(Cdc.applyChangelog(emptySnap, changes, "k", "seq", "op").count() == 1)
  }

  test("incremental agg: empty delta is identity; empty state takes the delta") {
    val state = Seq((1L, 2L, 30L)).toDF("k", "n", "total")
    val empty = Seq.empty[(Long, Long, Long)].toDF("k", "n", "total")
    val ops = Seq("n" -> IncrementalAgg.MergeSum, "total" -> IncrementalAgg.MergeSum)
    assert(IncrementalAgg.merge(state, empty, Seq("k"), ops)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 30L)))
    assert(IncrementalAgg.merge(empty, state, Seq("k"), ops).count() == 1)
  }

  test("sessionize and z-order survive empty inputs") {
    val noEvents = Seq.empty[(Long, Long, Long)].toDF("user_id", "sec", "event_id")
    assert(Sessionize.sessions(noEvents, "user_id", "sec", "event_id", 1800L).isEmpty)
    val noRows = Seq.empty[(Long, Long)].toDF("t", "u")
    assert(ZOrder.withZValue(noRows, Seq("t" -> col("t"), "u" -> col("u")), bits = 8).isEmpty)
  }

  test("NULL text: dedup and text functions drop or null out, never throw") {
    val docs = Seq((1L, "a b c d", "s1"), (2L, null, "s1"), (3L, "a b c d", "s1"))
      .toDF("doc_id", "text", "source")
    // NULL text can't fingerprint — exact dedup must still pair 1 and 3
    val kept = Dedup.keepFirst(docs, "doc_id", "text")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept.contains(1L) && !kept.contains(3L))
    val pairs = Dedup.jaccardPairsBlocked(docs, "doc_id", "text", "source", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 3L)))
    val stats = docs.select(graft.functions.Text.tokenStats(col("text")).as("ts"))
      .collect()
    assert(stats.length == 3) // null row evaluates to null stats, no crash
  }

  test("overwritePartitions rewrites only the touched partition") {
    import graft.sources.Sources
    val base = java.nio.file.Files.createTempDirectory("graft_dyn").toString
    val v1 = Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("p", "v")
    Sources.overwritePartitions(v1, base, Seq("p"))
    def filesOf(p: String) = new java.io.File(s"$base/p=$p").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
    val bBefore = filesOf("b")
    Thread.sleep(1100) // mtime resolution
    // reprocess ONLY partition a; b must remain byte-for-byte untouched
    Sources.overwritePartitions(Seq(("a", 99L)).toDF("p", "v"), base, Seq("p"))
    assert(filesOf("b") == bBefore, "untouched partition was rewritten")
    val back = spark.read.parquet(base).collect()
      .map(r => (r.getAs[String]("p"), r.getAs[Long]("v"))).toSet
    assert(back == Set(("a", 99L), ("b", 10L)))
  }

  test("global rank over an empty table is empty") {
    val noRows = Seq.empty[(Long, Double)].toDF("id", "v")
    assert(GlobalRank.withGlobalRank(noRows, Seq(col("v"), col("id"))).isEmpty)
  }

  test("pqSearchAdc: empty query set and empty corpus are empty, not a crash") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val noQ = emb.where(col("vec_id") < 0)
    assert(IvfIndex.pqSearchAdc(emb, noQ, "vec_id", "embedding",
      m = 8, dim = 64, stride = 16).isEmpty)
    // empty corpus: no codes, no codebook -> empty result for any queries
    assert(IvfIndex.pqSearchAdc(emb.where(col("vec_id") < 0),
      emb.where(col("vec_id") < 5), "vec_id", "embedding",
      m = 8, dim = 64, stride = 16).isEmpty)
  }

  test("ivfPqSearch and nnDescentStep: empty inputs are empty, not a crash") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val noQ = emb.where(col("vec_id") < 0)
    assert(IvfIndex.ivfPqSearch(emb, noQ, "vec_id", "embedding",
      m = 8, dim = 64, stride = 16).isEmpty)
    assert(IvfIndex.ivfPqSearch(noQ, emb.where(col("vec_id") < 5),
      "vec_id", "embedding", m = 8, dim = 64, stride = 16).isEmpty)
    val noEdges = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Similarity.nnDescentStep(emb, "vec_id", "embedding",
      noEdges, k = 3).isEmpty)
  }

  test("hierarchy: empty node set is empty on both paths") {
    val none = Seq.empty[(Long, Option[Long])].toDF("id", "parent")
    assert(Hierarchy.flatten(none, "id", "parent").isEmpty)
    assert(Hierarchy.flatten(none, "id", "parent", driverLimit = 0).isEmpty)
  }

  test("forwardFill / diffSnapshots / asofNearest tolerate empty inputs") {
    val noEv = Seq.empty[(Long, Long, Option[Double])].toDF("k", "seq", "v")
    assert(EtlOps.forwardFill(noEv, Seq("k"), Seq("seq"), Seq("v")).isEmpty)
    val some = Seq((1L, Some("a"))).toDF("id", "v")
    val none = Seq.empty[(Long, Option[String])].toDF("id", "v")
    val d = EtlOps.diffSnapshots(some, none, Seq("id"), Seq("v"))
      .select("change_type").collect().map(_.getString(0))
    assert(d.toSeq == Seq("deleted"))
    val d2 = EtlOps.diffSnapshots(none, some, Seq("id"), Seq("v"))
      .select("change_type").collect().map(_.getString(0))
    assert(d2.toSeq == Seq("added"))
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "lv")
    val noRight = Seq.empty[(Long, Long, Double)].toDF("k", "qt", "px")
    val out = AsOfJoin.asofNearest(left, noRight, "k", "t", "qt").collect()
    assert(out.length == 1 && out.head.isNullAt(out.head.fieldIndex("px")))
  }

  test("lloydStep over an empty corpus is empty") {
    val none = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(IvfIndex.lloydStep(none, "vec_id", "embedding", 4).isEmpty)
  }
}

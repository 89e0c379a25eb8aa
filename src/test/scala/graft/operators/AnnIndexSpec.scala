package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persistent graph-ANN index: graft_ann_build materializes the
  * NN-descent graph as a catalog table, graft_ann_refresh incrementally
  * indexes appended rows by beam-searching the EXISTING graph (the HNSW
  * insert shape) — build once, probe many, never rebuild on append.
  */
class AnnIndexSpec extends SparkSpec {

  private lazy val warehouse =
    Files.createTempDirectory("graft_ann_wh").toFile.getAbsolutePath

  private def sql(q: String) = spark.sql(q)

  /** 200 deterministic 4-dim vectors in 5 label blocks. */
  private def corpus = {
    import spark.implicits._
    (0L until 200L).map { i =>
      (i, i % 5, Array((i % 7).toFloat + 1f, (i % 11).toFloat,
        (i % 13).toFloat, (i % 3).toFloat))
    }.toDF("vec_id", "label", "embedding")
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.GraftExtensions.register(spark)
    spark.conf.set("spark.sql.catalog.graft_ann", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_ann.warehouse", warehouse)
    sql("CREATE NAMESPACE IF NOT EXISTS graft_ann.db")
  }

  test("build persists the descent graph; probe reads the table") {
    sql("""CREATE TABLE graft_ann.db.emb (vec_id BIGINT, label BIGINT,
          |embedding ARRAY<FLOAT>) TBLPROPERTIES('history'='true')""".stripMargin)
    corpus.writeTo("graft_ann.db.emb").append()
    val receipt = sql("""SELECT * FROM graft_ann_build('graft_ann', 'db.emb',
        |'db.knn', 'vec_id', 'embedding', 'label', 3, 1)""".stripMargin).collect()(0)
    assert(receipt.getLong(0) == 200, "every corpus node must be indexed")
    val g = spark.table("graft_ann.db.knn")
    assert(g.count() == receipt.getLong(1))
    // k directed edges per node, ranked, exact cosines present
    val perNode = g.groupBy("a_id").count().agg(min("count"), max("count")).collect()(0)
    assert(perNode.getLong(0) == 3 && perNode.getLong(1) == 3)
    // the persisted edges ARE the in-plan descent output
    val twin = AnnIndex.buildEdges(spark.table("graft_ann.db.emb"),
      "vec_id", "embedding", "label", k = 3, iters = 1)
      .select(col("a_id").cast("long"), col("b_id").cast("long"),
        col("cosine").cast("double"), col("rank").cast("int"))
    assert(g.exceptAll(twin).count() == 0 && twin.exceptAll(g).count() == 0)
    // probing READS the table: beam search over the persisted edges
    val got = Similarity.graphBeamSearch(spark.table("graft_ann.db.emb"),
      corpus.where(col("vec_id") < 5), "vec_id", "embedding",
      g.select("a_id", "b_id"),
      corpus.where(col("vec_id") % 50 === 0), beamWidth = 8, rounds = 3,
      topK = 5)
    assert(got.groupBy("q_id").count().collect().forall(_.getLong(1) == 5))
  }

  test("refresh indexes appended rows incrementally, existing edges untouched") {
    sql("""CREATE TABLE graft_ann.db.emb2 (vec_id BIGINT, label BIGINT,
          |embedding ARRAY<FLOAT>) TBLPROPERTIES('history'='true')""".stripMargin)
    corpus.where(col("vec_id") < 150).writeTo("graft_ann.db.emb2").append()
    sql("""SELECT * FROM graft_ann_build('graft_ann', 'db.emb2',
        |'db.knn2', 'vec_id', 'embedding', 'label', 3, 1)""".stripMargin).collect()
    val before = spark.table("graft_ann.db.knn2").localCheckpoint(true)
    val beforeCount = before.count()
    // append 50 new rows, refresh
    corpus.where(col("vec_id") >= 150).writeTo("graft_ann.db.emb2").append()
    val r = sql("""SELECT * FROM graft_ann_refresh('graft_ann', 'db.emb2',
        |'db.knn2', 'vec_id', 'embedding', 3)""".stripMargin).collect()(0)
    assert(r.getLong(0) == 50, s"50 new nodes, got ${r.getLong(0)}")
    assert(r.getLong(1) > 0)
    val after = spark.table("graft_ann.db.knn2")
    // every existing edge survived verbatim (append-only maintenance)
    assert(before.exceptAll(after).count() == 0)
    assert(after.count() == beforeCount + r.getLong(1))
    // every new node is now indexed (forward edges) AND reachable
    // (reverse edges from previously-indexed nodes)
    val newFwd = after.where(col("a_id") >= 150)
      .select("a_id").distinct().count()
    assert(newFwd == 50, s"every new node needs forward edges, got $newFwd")
    val newRev = after.where(col("a_id") < 150 && col("b_id") >= 150).count()
    assert(newRev > 0, "new nodes must be reachable from the old graph")
    // a probe over the refreshed graph can surface new nodes
    val got = Similarity.graphBeamSearch(spark.table("graft_ann.db.emb2"),
      corpus.where(col("vec_id").isin(160L, 170L)), "vec_id", "embedding",
      after.select("a_id", "b_id"),
      corpus.where(col("vec_id") % 50 === 0 && col("vec_id") < 150),
      beamWidth = 8, rounds = 3, topK = 5)
    assert(got.groupBy("q_id").count().collect().forall(_.getLong(1) == 5))
    // idempotent: a second refresh finds nothing to do
    val r2 = sql("""SELECT * FROM graft_ann_refresh('graft_ann', 'db.emb2',
        |'db.knn2', 'vec_id', 'embedding', 3)""".stripMargin).collect()(0)
    assert(r2.getLong(0) == 0 && r2.getLong(1) == 0)
    assert(spark.table("graft_ann.db.knn2").count() == beforeCount + r.getLong(1))
  }
}

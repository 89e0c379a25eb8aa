package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Streaming admission control (maxCommitsPerTrigger / maxFilesPerTrigger):
  * a deep commit log drains across bounded micro-batches, every row still
  * delivered exactly once; the change feed honors the same caps.
  */
class GraftStreamLimitsSpec extends SparkSpec {

  private lazy val warehouse =
    Files.createTempDirectory("graft_lim_wh").toFile.getAbsolutePath

  private def sql(q: String) = spark.sql(q)

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.graft_lim", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_lim.warehouse", warehouse)
    sql("CREATE NAMESPACE IF NOT EXISTS graft_lim.db")
  }

  private def drainBatches(df: org.apache.spark.sql.DataFrame,
                           name: String): Int = {
    val q = df.writeStream.format("memory").queryName(name)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_lim_ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      q.recentProgress.count(_.numInputRows > 0)
    } finally q.stop()
  }

  test("maxCommitsPerTrigger drains one commit per micro-batch") {
    sql("""CREATE TABLE graft_lim.db.t (id BIGINT)
          |TBLPROPERTIES('history'='true')""".stripMargin)
    sql("INSERT INTO graft_lim.db.t SELECT id FROM range(0, 10)")
    sql("INSERT INTO graft_lim.db.t SELECT id FROM range(10, 30)")
    sql("INSERT INTO graft_lim.db.t SELECT id FROM range(30, 60)")
    val batches = drainBatches(
      spark.readStream.option("maxCommitsPerTrigger", "1")
        .table("graft_lim.db.t"), "lim_commits")
    assert(batches >= 3,
      s"three append commits must drain across >=3 bounded batches, got $batches")
    val rows = spark.table("lim_commits").count()
    assert(rows == 60, s"every row exactly once, got $rows")
  }

  test("maxFilesPerTrigger bounds the admitted file count per batch") {
    sql("""CREATE TABLE graft_lim.db.f (id BIGINT)
          |TBLPROPERTIES('history'='true')""".stripMargin)
    (0 until 4).foreach(i =>
      sql(s"INSERT INTO graft_lim.db.f SELECT id FROM range(${i * 5}, ${i * 5 + 5})"))
    val batches = drainBatches(
      spark.readStream.option("maxFilesPerTrigger", "1")
        .table("graft_lim.db.f"), "lim_files")
    assert(batches >= 4,
      s"four single-file commits under a 1-file cap must take >=4 batches, got $batches")
    assert(spark.table("lim_files").count() == 20)
  }

  test("unlimited stays one batch; the change feed honors the cap") {
    sql("""CREATE TABLE graft_lim.db.u (id BIGINT)
          |TBLPROPERTIES('history'='true')""".stripMargin)
    sql("INSERT INTO graft_lim.db.u SELECT id FROM range(0, 10)")
    sql("INSERT INTO graft_lim.db.u SELECT id FROM range(10, 20)")
    val one = drainBatches(spark.readStream.table("graft_lim.db.u"), "lim_all")
    assert(one == 1, s"no cap → the retained log is one batch, got $one")
    assert(spark.table("lim_all").count() == 20)

    sql("DELETE FROM graft_lim.db.u WHERE id % 2 = 0") // COW commit
    val cdf = drainBatches(
      spark.readStream.option("maxCommitsPerTrigger", "1")
        .table("graft_lim.db.u.changes"), "lim_cdf")
    assert(cdf >= 3,
      s"two appends + one COW rewrite under a 1-commit cap: >=3 batches, got $cdf")
    // fold the streamed images: final state must match the table
    val t = spark.table("lim_cdf")
    val inserts = t.where("_change_type = 'insert'").count()
    val deletes = t.where("_change_type = 'delete'").count()
    assert(inserts - deletes == spark.table("graft_lim.db.u").count())
  }

  test("invalid limit values fail loudly") {
    intercept[Exception] {
      spark.readStream.option("maxCommitsPerTrigger", "0")
        .table("graft_lim.db.t").writeStream.format("memory")
        .queryName("lim_bad").start().processAllAvailable()
    }
    intercept[Exception] {
      spark.readStream.option("maxFilesPerTrigger", "abc")
        .table("graft_lim.db.t").writeStream.format("memory")
        .queryName("lim_bad2").start().processAllAvailable()
    }
  }
}

package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Write–Audit–Publish: staged batches are invisible until published,
  * audits see the would-be state, publish is one atomic manifest commit
  * enforcing declared CHECKs, abort leaves no trace.
  */
class GraftWapSpec extends SparkSpec {

  private lazy val warehouse =
    Files.createTempDirectory("graft_wap_wh").toFile.getAbsolutePath

  private def sql(q: String) = spark.sql(q)

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.graft_wap", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_wap.warehouse", warehouse)
    sql("CREATE NAMESPACE IF NOT EXISTS graft_wap.db")
    sql("""CREATE TABLE graft_wap.db.t (id BIGINT, qty BIGINT)
          |TBLPROPERTIES('history'='true', 'graft.check.pos'='qty > 0')
          |""".stripMargin)
    sql("INSERT INTO graft_wap.db.t VALUES (1, 10), (2, 20)")
  }

  private def version(): Long =
    graft.plans.MatView.currentVersion(spark, s"$warehouse/db/t")

  test("staged batch is invisible; audit sees the union; abort leaves no trace") {
    val v0 = version()
    val batch = spark.range(3, 6).selectExpr("id", "id * 10 AS qty")
    val token = GraftWap.stage(spark, "graft_wap", "db.t", batch)

    assert(sql("SELECT count(*) FROM graft_wap.db.t").collect().head.getLong(0) == 2L,
      "readers must not see staged rows")
    assert(version() == v0, "staging must not commit")
    // plain-parquet interop doesn't see the dot-dir either
    assert(spark.read.parquet(s"$warehouse/db/t").count() == 2L)

    assert(GraftWap.audit(spark, "graft_wap", "db.t", token).count() == 5L)
    assert(GraftWap.stagedBatch(spark, "graft_wap", "db.t", token)
      .orderBy("id").collect().toSeq ==
      Seq(Row(3L, 30L), Row(4L, 40L), Row(5L, 50L)))

    GraftWap.abort(spark, "graft_wap", "db.t", token)
    assert(version() == v0)
    assert(sql("SELECT count(*) FROM graft_wap.db.t").collect().head.getLong(0) == 2L)
  }

  test("publish refuses a batch violating declared CHECKs; clean publish is atomic and time-travel-consistent") {
    val v0 = version()
    val bad = spark.range(6, 9).selectExpr("id", "CAST(id - 7 AS BIGINT) AS qty") // qty -1,0,1
    val badToken = GraftWap.stage(spark, "graft_wap", "db.t", bad)
    assert(GraftWap.checkViolations(spark, "graft_wap", "db.t", badToken)
      .count() == 2L) // -1 and 0 violate qty > 0
    val e = intercept[IllegalArgumentException](
      GraftWap.publish(spark, "graft_wap", "db.t", badToken))
    assert(e.getMessage.contains("CHECK"))
    assert(version() == v0)
    GraftWap.abort(spark, "graft_wap", "db.t", badToken)

    val good = spark.range(6, 9).selectExpr("id", "id * 10 AS qty")
    val token = GraftWap.stage(spark, "graft_wap", "db.t", good)
    val v1 = GraftWap.publish(spark, "graft_wap", "db.t", token)
    assert(v1 == v0 + 1)
    assert(sql("SELECT count(*) FROM graft_wap.db.t").collect().head.getLong(0) == 5L)
    // the pre-publish snapshot still reads WITHOUT the batch
    assert(sql(s"SELECT count(*) FROM graft_wap.db.t VERSION AS OF $v0")
      .collect().head.getLong(0) == 2L)
    // staging DIR cleaned up (the landed files' checksum sidecars keep the
    // .wap- prefix in their names — only a directory would be a leak)
    assert(!new java.io.File(s"$warehouse/db/t").listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith(".wap-")))
  }

  test("stage rejects a mismatched batch shape") {
    val e = intercept[IllegalArgumentException](
      GraftWap.stage(spark, "graft_wap", "db.t",
        spark.range(1, 2).selectExpr("id AS other", "id AS qty")))
    assert(e.getMessage.contains("must match table"))
  }

  test("publish routes a staged batch into a days() layout; pruning survives") {
    spark.sql("""CREATE TABLE graft_wap.db.dayt (id BIGINT, ts TIMESTAMP)
                |PARTITIONED BY (days(ts))
                |TBLPROPERTIES('history'='true')""".stripMargin)
    spark.sql("""INSERT INTO graft_wap.db.dayt VALUES
                |(1, TIMESTAMP '2026-08-01 06:00:00'),
                |(2, TIMESTAMP '2026-08-02 06:00:00')""".stripMargin)
    val batch = spark.sql(
      """SELECT * FROM VALUES
        |(3, TIMESTAMP '2026-08-02 18:00:00'),
        |(4, TIMESTAMP '2026-08-03 06:00:00') AS t(id, ts)""".stripMargin)
    val token = GraftWap.stage(spark, "graft_wap", "db.dayt", batch)
    assert(spark.table("graft_wap.db.dayt").count() == 2,
      "staged rows must be invisible on a layout table too")
    GraftWap.publish(spark, "graft_wap", "db.dayt", token)
    assert(spark.table("graft_wap.db.dayt").count() == 4)
    // published rows live in their ts_day=N dirs, not flat at the root
    val dirs = new java.io.File(s"$warehouse/db/dayt").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("ts_day=")).map(_.getName)
    assert(dirs.length == 3, s"expected 3 day dirs, got ${dirs.mkString(",")}")
    val oneDay = spark.table("graft_wap.db.dayt")
      .where(org.apache.spark.sql.functions.col("ts") >=
        org.apache.spark.sql.functions.lit("2026-08-03 00:00:00").cast("timestamp"))
    assert(oneDay.rdd.getNumPartitions == 1,
      "a one-day filter must prune to the published batch's day dir")
    assert(oneDay.collect().map(_.getLong(0)).toSeq == Seq(4L))
  }

  test("publish routes a staged batch into a bucket layout; SPJ contract survives") {
    spark.sql("""CREATE TABLE graft_wap.db.bkt (k BIGINT, v BIGINT)
                |PARTITIONED BY (bucket(4, k))
                |TBLPROPERTIES('history'='true')""".stripMargin)
    spark.sql("INSERT INTO graft_wap.db.bkt SELECT id, id * 10 FROM range(0, 20)")
    val token = GraftWap.stage(spark, "graft_wap", "db.bkt",
      spark.range(20, 40).selectExpr("id AS k", "id * 10 AS v"))
    GraftWap.publish(spark, "graft_wap", "db.bkt", token)
    assert(spark.table("graft_wap.db.bkt").count() == 40)
    // every data file in the CURRENT manifest carries the bNNNNN- prefix
    // (a flat-published file would break the bucket placement contract)
    val fs = new org.apache.hadoop.fs.Path(s"$warehouse/db/bkt")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dir = new org.apache.hadoop.fs.Path(s"$warehouse/db/bkt")
    val v = GraftTable.manifestVersions(fs, dir).last
    val names = GraftTable.readManifest(fs, dir, v)
      .map(f => new org.apache.hadoop.fs.Path(f).getName)
    assert(names.nonEmpty && names.forall(GraftBucket.fileBucketId(_).isDefined),
      s"published files must keep bucket naming: $names")
  }
}

package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Atomic CTAS / RTAS through the StagingTableCatalog: create-as-select
  * with the full write stack, replace-as-select swaps, failed writes
  * leave no debris table, layouts and engine-computed columns compose.
  */
class GraftCtasSpec extends SparkSpec {

  private lazy val warehouse =
    Files.createTempDirectory("graft_ctas_wh").toFile.getAbsolutePath

  private def sql(q: String) = spark.sql(q)

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.graft_ct", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_ct.warehouse", warehouse)
    sql("CREATE NAMESPACE IF NOT EXISTS graft_ct.db")
  }

  test("CTAS lands atomically with layout and history") {
    spark.range(0, 100).toDF("id")
      .withColumn("seg", when(col("id") % 2 === 0, "a").otherwise("b"))
      .createOrReplaceTempView("graft_ct_src")
    sql("""CREATE TABLE graft_ct.db.t PARTITIONED BY (seg)
          |TBLPROPERTIES('history'='true')
          |AS SELECT * FROM graft_ct_src""".stripMargin)
    val t = spark.table("graft_ct.db.t")
    assert(t.count() == 100)
    // layout routed during the CTAS write itself
    val dirs = new java.io.File(s"$warehouse/db/t").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("seg="))
    assert(dirs == 2, s"CTAS must route the identity layout, got $dirs dirs")
    // it is a real history table from birth
    assert(sql("SELECT * FROM graft_ct.db.t VERSION AS OF 2").count() == 100)
    // and no staged debris is listed as a table
    assert(sql("SHOW TABLES IN graft_ct.db").collect()
      .map(_.getString(1)).forall(!_.startsWith(".")))
  }

  test("failed CTAS leaves the namespace unchanged") {
    intercept[Exception](sql(
      """CREATE TABLE graft_ct.db.boom
        |TBLPROPERTIES('history'='true', 'graft.check.pos'='id >= 0')
        |AS SELECT -1L AS id""".stripMargin))
    intercept[Exception](spark.table("graft_ct.db.boom").count())
    assert(!sql("SHOW TABLES IN graft_ct.db").collect()
      .map(_.getString(1)).contains("boom"))
  }

  test("REPLACE TABLE AS SELECT swaps atomically; CREATE OR REPLACE creates") {
    // RTAS on a missing table refuses; CREATE OR REPLACE admits
    intercept[Exception](sql(
      "REPLACE TABLE graft_ct.db.r AS SELECT 1L AS x"))
    sql("""CREATE OR REPLACE TABLE graft_ct.db.r TBLPROPERTIES('history'='true')
          |AS SELECT id, id * 2 AS y FROM range(10)""".stripMargin)
    assert(spark.table("graft_ct.db.r").count() == 10)
    // replace with a DIFFERENT schema — the swap is whole-table
    sql("""REPLACE TABLE graft_ct.db.r TBLPROPERTIES('history'='true')
          |AS SELECT CAST(id AS STRING) AS label FROM range(3)""".stripMargin)
    val r = spark.table("graft_ct.db.r")
    assert(r.columns.toSeq == Seq("label") && r.count() == 3)
    // the replaced table starts a fresh log (new-table verb, documented)
    assert(GraftTable.manifestVersions(
      new org.apache.hadoop.fs.Path(s"$warehouse/db/r")
        .getFileSystem(spark.sessionState.newHadoopConf()),
      new org.apache.hadoop.fs.Path(s"$warehouse/db/r")) == Seq(1L, 2L))
    // no trash dirs left behind
    assert(!new java.io.File(s"$warehouse/db").listFiles()
      .exists(_.getName.startsWith(".replaced-")))
  }

  test("CTAS composes with generated columns via explicit DDL first") {
    // generated/identity specs don't ride CTAS column lists (no DDL
    // surface for them there) — the two-step is CREATE then INSERT
    sql("""CREATE TABLE graft_ct.db.g
          |(ts TIMESTAMP, day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))
          |TBLPROPERTIES('history'='true')""".stripMargin)
    sql("""INSERT INTO graft_ct.db.g (ts)
          |SELECT TIMESTAMP '2024-05-01 12:00:00' + make_interval(0,0,0,0,id,0,0)
          |FROM range(48)""".stripMargin)
    assert(spark.table("graft_ct.db.g").select("day").distinct().count() == 3)
  }
}

package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The consistency-group verb family beyond what the driver-gate queries
  * assert: export-group aborts BEFORE the marker on a refusing table,
  * replicate-group lays out a warehouse whose old groups stay readable,
  * rollback by explicit id reaches past newer publishes.
  */
class GraftGroupVerbsSpec extends SparkSpec {

  private lazy val warehouse =
    Files.createTempDirectory("graft_gv_wh").toFile.getAbsolutePath
  private lazy val outside =
    Files.createTempDirectory("graft_gv_out").toFile.getAbsolutePath

  private def sql(q: String) = spark.sql(q)
  private def fs =
    new Path(warehouse).getFileSystem(spark.sessionState.newHadoopConf())

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.GraftExtensions.register(spark)
    spark.conf.set("spark.sql.catalog.graft_gv", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_gv.warehouse", warehouse)
    sql("CREATE NAMESPACE IF NOT EXISTS graft_gv.db")
  }

  private def publish(tables: Seq[String], extra: Long): Unit = {
    tables.foreach { t =>
      sql(s"SELECT * FROM graft_branch('graft_gv', 'db.$t', 'rel')").collect()
      sql(s"INSERT INTO graft_gv.db.$t.branch_rel VALUES ($extra, 'n')")
    }
    sql(s"""SELECT * FROM graft_publish_together('graft_gv',
           |'${tables.map("db." + _).mkString(",")}', 'rel')""".stripMargin)
      .collect()
  }

  private def mk(t: String, mor: Boolean = false): Unit = {
    val p = if (mor) ",'merge-on-read'='true'" else ""
    sql(s"""CREATE TABLE graft_gv.db.$t (k BIGINT, v STRING)
           |TBLPROPERTIES('history'='true'$p)""".stripMargin)
    sql(s"INSERT INTO graft_gv.db.$t SELECT id, 'base' FROM range(0, 20)")
  }

  test("export_group aborts before the marker when one table refuses") {
    mk("ea"); mk("eb", mor = true)
    publish(Seq("ea", "eb"), 100)
    sql("DELETE FROM graft_gv.db.eb WHERE k < 3") // live DV on eb
    // a second publish records the DV-carrying state as the LATEST group
    publish(Seq("ea", "eb"), 200)
    val dest = s"$outside/eg"
    val e = intercept[Exception](sql(
      s"SELECT * FROM graft_export_group('graft_gv', '$dest')").collect())
    assert(e.getMessage.contains("db.eb") &&
      e.getMessage.contains("no group marker"), e.getMessage)
    assert(!fs.exists(new Path(s"$dest/${GraftBranch.GroupsDirName}")),
      "a failed group export must not advertise a marker")
  }

  test("replicate_group mirrors EVERY group's versions; older groups " +
    "stay readable on the DR site by id") {
    mk("ra"); mk("rb")
    publish(Seq("ra", "rb"), 100) // group 1 (of this catalog's life)
    publish(Seq("ra", "rb"), 200) // group 2
    val dest = s"$outside/dr"
    sql(s"SELECT * FROM graft_replicate_group('graft_gv', '$dest')").collect()
    spark.conf.set("spark.sql.catalog.graft_gvm", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_gvm.warehouse", dest)
    val latest = sql("SELECT * FROM graft_group('graft_gvm')").collect()
      .map(r => r.getString(2) -> r.getLong(3)).toMap
    // replicate ships the FULL history, so any retained source version —
    // not just the latest group's — time-travels on the mirror
    val raNow = spark.table("graft_gvm.db.ra").count()
    val raAtGroup = sql(
      s"SELECT count(*) FROM graft_gvm.db.ra VERSION AS OF ${latest("db.ra")}")
      .collect()(0).getLong(0)
    assert(raNow == 22 && raAtGroup == 22)
    assert(sql(s"SELECT count(*) FROM graft_gvm.db.ra VERSION AS OF 2")
      .collect()(0).getLong(0) == 20,
      "pre-publish history must time-travel on the DR site")
  }

  test("rollback by explicit id reaches past newer publishes") {
    mk("ka"); mk("kb")
    publish(Seq("ka", "kb"), 100)
    val g1 = sql("SELECT * FROM graft_group('graft_gv')").collect()
      .head.getLong(0)
    publish(Seq("ka", "kb"), 200)
    assert(spark.table("graft_gv.db.ka").count() == 22)
    sql(s"SELECT * FROM graft_rollback_group('graft_gv', $g1)").collect()
    assert(spark.table("graft_gv.db.ka").count() == 21 &&
      spark.table("graft_gv.db.kb").count() == 21,
      "explicit-id rollback must land on the OLDER group's state")
  }
}

package graft.sources

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Clones: shallow (zero-copy reference) and deep (self-contained copy) —
  * isolation both ways, stats lift, identity watermark carry.
  */
class GraftCloneSpec extends SparkSpec {

  private lazy val warehouse =
    Files.createTempDirectory("graft_cl_wh").toFile.getAbsolutePath

  private def sql(q: String) = spark.sql(q)

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.GraftExtensions.register(spark)
    spark.conf.set("spark.sql.catalog.graft_cl", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_cl.warehouse", warehouse)
    sql("CREATE NAMESPACE IF NOT EXISTS graft_cl.db")
  }

  test("shallow clone: zero copy, isolated writes both ways") {
    sql("""CREATE TABLE graft_cl.db.src (id BIGINT, v STRING)
          |TBLPROPERTIES('history'='true')""".stripMargin)
    spark.range(0, 100).toDF("id").withColumn("v", lit("s"))
      .writeTo("graft_cl.db.src").append()
    val r = sql(
      "SELECT * FROM graft_clone('graft_cl', 'db.src', 'db.dev', 'shallow')")
      .collect().head
    assert(r.getLong(1) == 0L, "shallow clone must copy zero bytes")
    assert(spark.table("graft_cl.db.dev").count() == 100)
    // clone-side writes: appends AND deletes never touch source bytes
    spark.range(100, 120).toDF("id").withColumn("v", lit("c"))
      .writeTo("graft_cl.db.dev").append()
    sql("DELETE FROM graft_cl.db.dev WHERE id < 10")
    assert(spark.table("graft_cl.db.dev").count() == 110)
    assert(spark.table("graft_cl.db.src").count() == 100,
      "the source must be untouched by clone writes")
    // source-side writes don't appear in the clone (pinned snapshot)
    spark.range(500, 510).toDF("id").withColumn("v", lit("s2"))
      .writeTo("graft_cl.db.src").append()
    assert(spark.table("graft_cl.db.dev").count() == 110)
    // stats lifted: the metadata TVF serves row counts with zero IO
    val meta = sql("SELECT * FROM graft_files('graft_cl', 'db.dev')").collect()
    assert(meta.nonEmpty && meta.forall(!_.isNullAt(2)),
      "clone files must carry lifted stats")
  }

  test("deep clone survives source file destruction") {
    sql("""CREATE TABLE graft_cl.db.src2 (id BIGINT)
          |TBLPROPERTIES('history'='true')""".stripMargin)
    spark.range(0, 50).toDF("id").writeTo("graft_cl.db.src2").append()
    val r = sql(
      "SELECT * FROM graft_clone('graft_cl', 'db.src2', 'db.deep', 'deep')")
      .collect().head
    assert(r.getLong(1) > 0L, "deep clone must copy bytes")
    // destroy the source's data files outright
    val (fs, sdir) = {
      val p = new org.apache.hadoop.fs.Path(s"$warehouse/db/src2")
      (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
    }
    GraftTable.dataFiles(fs, sdir).foreach(f =>
      fs.delete(new org.apache.hadoop.fs.Path(f), false))
    assert(spark.table("graft_cl.db.deep").count() == 50,
      "a deep clone must be self-contained")
  }

  test("identity watermark rides the clone") {
    sql("""CREATE TABLE graft_cl.db.ids
          |(id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)
          |TBLPROPERTIES('history'='true')""".stripMargin)
    sql("INSERT INTO graft_cl.db.ids (v) VALUES ('a'), ('b'), ('c')")
    sql("SELECT * FROM graft_clone('graft_cl', 'db.ids', 'db.ids2', 'shallow')")
      .collect()
    sql("INSERT INTO graft_cl.db.ids2 (v) VALUES ('d')")
    val ids = spark.table("graft_cl.db.ids2").collect().map(_.getLong(0))
    assert(ids.distinct.length == 4,
      s"clone-side generation must continue past the source watermark: ${ids.toSeq}")
  }

  test("deep clone preserves identity-partition layout (col=value segments)") {
    sql("""CREATE TABLE graft_cl.db.psrc (id BIGINT, status STRING)
          |PARTITIONED BY (status) TBLPROPERTIES('history'='true')""".stripMargin)
    spark.range(0, 60).toDF("id")
      .withColumn("status", when(col("id") % 3 === 0, "a")
        .when(col("id") % 3 === 1, "b").otherwise("c"))
      .writeTo("graft_cl.db.psrc").append()
    sql("SELECT * FROM graft_clone('graft_cl', 'db.psrc', 'db.pdeep', 'deep')")
      .collect()
    // the layout survived: reads parse partition values from the copied
    // paths (a flattened copy throws 'lacks a status= partition segment')
    assert(spark.table("graft_cl.db.pdeep").count() == 60)
    assert(spark.table("graft_cl.db.pdeep")
      .where(col("status") === "a").count() == 20)
    assert(spark.table("graft_cl.db.pdeep").groupBy("status").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap ==
      Map("a" -> 20L, "b" -> 20L, "c" -> 20L))
    // and it IS the partitioned layout on disk, not re-derived metadata
    val files = Files.walk(java.nio.file.Paths.get(warehouse, "db", "pdeep"))
      .iterator().asScala.map(_.toString)
      .filter(_.endsWith(".parquet")).toSeq
    assert(files.nonEmpty && files.forall(_.contains("status=")),
      s"copied files must keep their status= segment: ${files.take(3).mkString(", ")}")
  }

  test("deep clone preserves day-partition layout (ts_day segments prune)") {
    sql("""CREATE TABLE graft_cl.db.dsrc (id BIGINT, ts TIMESTAMP)
          |PARTITIONED BY (days(ts)) TBLPROPERTIES('history'='true')""".stripMargin)
    spark.range(0, 48).toDF("id")
      .withColumn("ts", expr("timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,0,id)"))
      .writeTo("graft_cl.db.dsrc").append()
    sql("SELECT * FROM graft_clone('graft_cl', 'db.dsrc', 'db.ddeep', 'deep')")
      .collect()
    assert(spark.table("graft_cl.db.ddeep").count() == 48)
    val files = Files.walk(java.nio.file.Paths.get(warehouse, "db", "ddeep"))
      .iterator().asScala.map(_.toString)
      .filter(_.endsWith(".parquet")).toSeq
    assert(files.nonEmpty && files.forall(_.contains("ts_day=")),
      s"copied files must keep ts_day= segments: ${files.take(3).mkString(", ")}")
    // day pruning still works on the clone
    assert(spark.table("graft_cl.db.ddeep")
      .where(col("ts") < lit("2024-03-02").cast("timestamp")).count() == 24)
  }

  test("refusals: plain source, existing destination") {
    sql("CREATE TABLE graft_cl.db.plain (id BIGINT)")
    spark.range(0, 5).toDF("id").writeTo("graft_cl.db.plain").append()
    intercept[Exception](sql(
      "SELECT * FROM graft_clone('graft_cl', 'db.plain', 'db.x')").collect())
    intercept[Exception](sql(
      "SELECT * FROM graft_clone('graft_cl', 'db.src', 'db.dev')").collect())
  }
}

package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Generated columns: engine-computed derivations on every write path,
  * explicit-value equality enforcement, partition-layout composition,
  * rewrite recomputation, and the DDL guard matrix.
  */
class GraftGeneratedSpec extends SparkSpec {

  private lazy val warehouse =
    Files.createTempDirectory("graft_gen_wh").toFile.getAbsolutePath

  private def sql(q: String) = spark.sql(q)

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.graft_gen", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_gen.warehouse", warehouse)
    sql("CREATE NAMESPACE IF NOT EXISTS graft_gen.db")
  }

  test("computed on insert; omitted/NULL/matching-explicit all admitted") {
    sql("""CREATE TABLE graft_gen.db.t
          |(ts TIMESTAMP, cents BIGINT,
          | day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)),
          | eur BIGINT GENERATED ALWAYS AS (cents DIV 100))
          |TBLPROPERTIES('history'='true')""".stripMargin)
    sql("""INSERT INTO graft_gen.db.t (ts, cents) VALUES
          |(TIMESTAMP '2024-03-05 10:00:00', 1234),
          |(TIMESTAMP '2024-03-06 23:59:59', 99)""".stripMargin)
    // matching explicit value is admitted (Delta's rule)
    sql("""INSERT INTO graft_gen.db.t VALUES
          |(TIMESTAMP '2024-03-07 00:00:00', 500, DATE '2024-03-07', 5)""".stripMargin)
    val rows = spark.table("graft_gen.db.t").orderBy("ts").collect()
    assert(rows.map(_.getDate(2).toString).toSeq ==
      Seq("2024-03-05", "2024-03-06", "2024-03-07"))
    assert(rows.map(_.getLong(3)).toSeq == Seq(12L, 0L, 5L))
    // a MISmatching explicit value refuses loudly
    val e = intercept[Exception](sql(
      """INSERT INTO graft_gen.db.t VALUES
        |(TIMESTAMP '2024-03-08 00:00:00', 100, DATE '1999-01-01', 1)""".stripMargin))
    assert(e.getMessage != null)
    assert(spark.table("graft_gen.db.t").count() == 3,
      "failed write must leave the table unchanged (atomic commit)")
  }

  test("generated column drives identity PARTITIONING; pruning works") {
    sql("""CREATE TABLE graft_gen.db.p
          |(ts TIMESTAMP, v BIGINT,
          | day STRING GENERATED ALWAYS AS (CAST(CAST(ts AS DATE) AS STRING)))
          |PARTITIONED BY (day)
          |TBLPROPERTIES('history'='true')""".stripMargin)
    spark.range(0, 240).toDF("n")
      .select(
        (lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).cast("long") +
          col("n") * 3600).cast("timestamp").as("ts"),
        col("n").as("v"))
      .writeTo("graft_gen.db.p").append()
    val t = spark.table("graft_gen.db.p")
    assert(t.count() == 240)
    assert(t.select("day").distinct().count() == 10)
    // rows landed under day=<value>/ dirs and one-day scans prune
    val dirs = new java.io.File(s"$warehouse/db/p").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("day="))
    assert(dirs == 10, s"expected 10 day dirs, got $dirs")
    val one = t.where(col("day") === "2024-01-03")
    assert(one.count() == 24)
    assert(one.rdd.getNumPartitions < dirs,
      "partition filter on the generated column must prune directories")
  }

  test("COW UPDATE of a source column recomputes the derivation") {
    sql("""CREATE TABLE graft_gen.db.u
          |(cents BIGINT, eur BIGINT GENERATED ALWAYS AS (cents DIV 100))
          |TBLPROPERTIES('history'='true')""".stripMargin)
    spark.range(0, 50).toDF("n").select((col("n") * 100).as("cents"))
      .writeTo("graft_gen.db.u").append()
    sql("UPDATE graft_gen.db.u SET cents = cents + 1000 WHERE cents < 2000")
    val bad = spark.table("graft_gen.db.u")
      .where(col("eur") =!= col("cents") / 100).count()
    assert(bad == 0, "the derivation must never go stale through UPDATE")
    assert(spark.table("graft_gen.db.u").where(col("eur") < 10).count() == 0)
  }

  test("MOR delta inserts compute generated values too") {
    sql("""CREATE TABLE graft_gen.db.m
          |(k BIGINT, cents BIGINT,
          | eur BIGINT GENERATED ALWAYS AS (cents DIV 100))
          |TBLPROPERTIES('history'='true','merge-on-read'='true')""".stripMargin)
    spark.range(0, 20).toDF("k").withColumn("cents", col("k") * 100)
      .writeTo("graft_gen.db.m").append()
    spark.range(15, 30).toDF("k").withColumn("cents", col("k") * 200)
      .createOrReplaceTempView("graft_gen_chg")
    sql("""MERGE INTO graft_gen.db.m t USING graft_gen_chg s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET cents = s.cents
          |WHEN NOT MATCHED THEN INSERT (k, cents) VALUES (s.k, s.cents)""".stripMargin)
    val bad = spark.table("graft_gen.db.m")
      .where(col("eur") =!= col("cents") / 100).count()
    assert(bad == 0, "delta inserts and updates must recompute")
    assert(spark.table("graft_gen.db.m").count() == 30)
  }

  test("DDL guard matrix") {
    // unknown reference fails the CREATE, not the first insert
    intercept[Exception](sql(
      """CREATE TABLE graft_gen.db.bad1
        |(a BIGINT, b BIGINT GENERATED ALWAYS AS (nope + 1))
        |TBLPROPERTIES('history'='true')""".stripMargin))
    // generated-from-generated refuses
    intercept[Exception](sql(
      """CREATE TABLE graft_gen.db.bad2
        |(a BIGINT, b BIGINT GENERATED ALWAYS AS (a + 1),
        | c BIGINT GENERATED ALWAYS AS (b + 1))
        |TBLPROPERTIES('history'='true')""".stripMargin))
    // nondeterministic refuses
    intercept[Exception](sql(
      """CREATE TABLE graft_gen.db.bad3
        |(a BIGINT, b DOUBLE GENERATED ALWAYS AS (rand()))
        |TBLPROPERTIES('history'='true')""".stripMargin))
    // dropping/renaming a referenced source column refuses
    sql("""CREATE TABLE graft_gen.db.g
          |(a BIGINT, b BIGINT GENERATED ALWAYS AS (a + 1))
          |TBLPROPERTIES('history'='true')""".stripMargin)
    intercept[Exception](sql("ALTER TABLE graft_gen.db.g DROP COLUMN a"))
    intercept[Exception](sql("ALTER TABLE graft_gen.db.g RENAME COLUMN a TO a2"))
    intercept[Exception](sql("ALTER TABLE graft_gen.db.g RENAME COLUMN b TO b2"))
  }
}

package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Identity-partitioned catalog tables: Hive-style `col=value/` layout,
  * partition values from the PATH (never parquet bytes), partition-
  * directory pruning at planning (zero-IO, before footer checks), plain-
  * parquet partition-discovery interop, and the row-level verbs (COW +
  * merge-on-read DVs) composing with the layout.
  */
class GraftPartitionSpec extends SparkSpec {

  private lazy val warehouse =
    Files.createTempDirectory("graft_part_wh").toFile.getAbsolutePath

  private def sql(q: String) = spark.sql(q)

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.graft_part", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_part.warehouse", warehouse)
    sql("CREATE NAMESPACE IF NOT EXISTS graft_part.db")
  }

  private def dir(table: String) = new java.io.File(s"$warehouse/db/$table")

  private def mkTable(name: String, extra: String = ""): Unit = {
    sql(s"DROP TABLE IF EXISTS graft_part.db.$name")
    sql(s"""CREATE TABLE graft_part.db.$name (id BIGINT, day STRING, v BIGINT)
           |PARTITIONED BY (day) $extra""".stripMargin)
    sql(s"""INSERT INTO graft_part.db.$name VALUES
           |(1, '2024-01-01', 10), (2, '2024-01-01', 20),
           |(3, '2024-01-02', 30), (4, '2024-01-02', 40),
           |(5, '2024-01-03', 50), (6, NULL, 60)""".stripMargin)
  }

  test("partitioned layout: col=value dirs, values from path, round trip") {
    mkTable("p1")
    val dirs = dir("p1").listFiles().filter(f => f.isDirectory &&
      !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getName).sorted
    assert(dirs.toSeq == Seq("day=2024-01-01", "day=2024-01-02", "day=2024-01-03",
      "day=__HIVE_DEFAULT_PARTITION__"))
    val got = sql("SELECT id, day, v FROM graft_part.db.p1 ORDER BY id").collect()
    assert(got.toSeq == Seq(Row(1L, "2024-01-01", 10L), Row(2L, "2024-01-01", 20L),
      Row(3L, "2024-01-02", 30L), Row(4L, "2024-01-02", 40L),
      Row(5L, "2024-01-03", 50L), Row(6L, null, 60L)))
    // the day column is NOT in the parquet bytes (path is the value)
    val f = dir("p1").listFiles().filter(f => f.isDirectory &&
        !f.getName.startsWith("_") && !f.getName.startsWith(".")).head
      .listFiles().filter(_.getName.endsWith(".parquet")).head
    val phys = spark.read.parquet(f.getAbsolutePath).columns.toSeq
    assert(phys == Seq("id", "v"))
  }

  test("plain-parquet partition discovery sees the identical table") {
    mkTable("p2")
    // cast discovery's day column back to string: Spark's partition TYPE
    // INFERENCE reads date-shaped strings as DATE (a read-side config
    // choice, spark.sql.sources.partitionColumnTypeInference) — the
    // VALUES are identical either way, which is what interop promises
    val native = spark.read.parquet(dir("p2").getAbsolutePath)
      .selectExpr("id", "CAST(day AS STRING) AS day", "v").orderBy("id").collect()
    val cat = sql("SELECT id, day, v FROM graft_part.db.p2 ORDER BY id").collect()
    assert(native.toSeq == cat.toSeq)
  }

  test("partition pruning: a day-equality predicate plans only that dir's files") {
    mkTable("p3")
    def planned(pred: String): Int =
      sql(s"SELECT id FROM graft_part.db.p3 WHERE $pred")
        .rdd.getNumPartitions
    val all = planned("TRUE")
    assert(all >= 3, s"expected >=3 input files, got $all")
    assert(planned("day = '2024-01-02'") < all)
    assert(planned("day IN ('2024-01-01', '2024-01-03')") < all)
    assert(planned("day IS NULL") < all)
    // correctness under pruning
    val got = sql("SELECT id FROM graft_part.db.p3 WHERE day = '2024-01-02' ORDER BY id")
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(3L, 4L))
    assert(sql("SELECT id FROM graft_part.db.p3 WHERE day IS NULL").collect()
      .map(_.getLong(0)).toSeq == Seq(6L))
  }

  test("NOT on a partition predicate does not resurrect or over-prune") {
    mkTable("p4")
    val got = sql("""SELECT id FROM graft_part.db.p4
                    |WHERE NOT (day = '2024-01-01') ORDER BY id""".stripMargin)
      .collect().map(_.getLong(0))
    // SQL semantics: NULL day fails NOT(day='...') too
    assert(got.toSeq == Seq(3L, 4L, 5L))
  }

  test("COW DELETE/UPDATE on a partitioned table keeps the layout") {
    mkTable("p5")
    sql("DELETE FROM graft_part.db.p5 WHERE day = '2024-01-01' AND id = 1")
    sql("UPDATE graft_part.db.p5 SET v = v + 1 WHERE day = '2024-01-02'")
    val got = sql("SELECT id, day, v FROM graft_part.db.p5 ORDER BY id").collect()
    assert(got.toSeq == Seq(Row(2L, "2024-01-01", 20L),
      Row(3L, "2024-01-02", 31L), Row(4L, "2024-01-02", 41L),
      Row(5L, "2024-01-03", 50L), Row(6L, null, 60L)))
    // rewritten rows landed back under their partition dirs
    val stray = dir("p5").listFiles().filter(f =>
      f.isFile && f.getName.endsWith(".parquet"))
    assert(stray.isEmpty, "data files must live under col=value dirs")
  }

  test("MERGE INTO a partitioned merge-on-read table: DV + routed inserts") {
    mkTable("p6", "TBLPROPERTIES ('merge-on-read'='true')")
    import spark.implicits._
    Seq((2L, "U"), (5L, "D"), (9L, "I")).toDF("id", "op")
      .createOrReplaceTempView("part_changes")
    val before = dir("p6").listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length()).toMap
    sql("""MERGE INTO graft_part.db.p6 t USING part_changes c ON t.id = c.id
          |WHEN MATCHED AND c.op = 'D' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET v = t.v + 100
          |WHEN NOT MATCHED THEN INSERT (id, day, v) VALUES (c.id, '2024-01-09', 0)
          |""".stripMargin)
    val after = dir("p6").listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length()).toMap
    before.foreach { case (n, len) =>
      assert(after.get(n).contains(len), s"original $n was rewritten")
    }
    assert(new java.io.File(dir("p6"), "day=2024-01-09").exists())
    val got = sql("SELECT id, day, v FROM graft_part.db.p6 ORDER BY id").collect()
    assert(got.toSeq == Seq(Row(1L, "2024-01-01", 10L), Row(2L, "2024-01-01", 120L),
      Row(3L, "2024-01-02", 30L), Row(4L, "2024-01-02", 40L),
      Row(6L, null, 60L), Row(9L, "2024-01-09", 0L)))
  }

  test("partitioned history table: manifests carry subpaths, time travel works") {
    sql("DROP TABLE IF EXISTS graft_part.db.p7")
    sql("""CREATE TABLE graft_part.db.p7 (id BIGINT, day STRING, v BIGINT)
          |PARTITIONED BY (day) TBLPROPERTIES ('history'='true')""".stripMargin)
    sql("INSERT INTO graft_part.db.p7 VALUES (1, 'a', 1), (2, 'b', 2)")
    sql("INSERT INTO graft_part.db.p7 VALUES (3, 'b', 3)")
    val v2 = sql("SELECT id FROM graft_part.db.p7 VERSION AS OF 2").collect()
      .map(_.getLong(0)).sorted
    assert(v2.toSeq == Seq(1L, 2L))
    val now = sql("SELECT id FROM graft_part.db.p7").collect().map(_.getLong(0)).sorted
    assert(now.toSeq == Seq(1L, 2L, 3L))
  }

  test("special characters in partition values escape like Spark's own layout") {
    sql("DROP TABLE IF EXISTS graft_part.db.p8")
    sql("""CREATE TABLE graft_part.db.p8 (id BIGINT, k STRING, v BIGINT)
          |PARTITIONED BY (k)""".stripMargin)
    sql("""INSERT INTO graft_part.db.p8 VALUES
          |(1, 'a/b', 1), (2, 'x:y', 2), (3, 'space here', 3)""".stripMargin)
    val got = sql("SELECT id, k FROM graft_part.db.p8 ORDER BY id").collect()
    assert(got.toSeq == Seq(Row(1L, "a/b"), Row(2L, "x:y"), Row(3L, "space here")))
    // and Spark's native partition discovery decodes them identically
    val native = spark.read.parquet(dir("p8").getAbsolutePath)
      .select("id", "k").orderBy("id").collect()
    assert(native.toSeq == got.toSeq)
    // equality pruning on an escaped value still prunes + answers right
    assert(sql("SELECT id FROM graft_part.db.p8 WHERE k = 'a/b'").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("INSERT OVERWRITE resets the partition tree; integral partition cols work") {
    sql("DROP TABLE IF EXISTS graft_part.db.p9")
    sql("""CREATE TABLE graft_part.db.p9 (id BIGINT, bucket INT, v BIGINT)
          |PARTITIONED BY (bucket)""".stripMargin)
    sql("INSERT INTO graft_part.db.p9 VALUES (1, 7, 1), (2, 8, 2)")
    sql("INSERT OVERWRITE graft_part.db.p9 VALUES (3, 9, 3)")
    val dirs = dir("p9").listFiles().filter(f => f.isDirectory &&
      !f.getName.startsWith("_") && !f.getName.startsWith(".")).map(_.getName).sorted
    assert(dirs.toSeq == Seq("bucket=9"))
    assert(sql("SELECT id FROM graft_part.db.p9 WHERE bucket = 9").collect()
      .map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("rejections: non-identity transforms, bad types, dropping a partition col") {
    intercept[Exception] {
      sql("""CREATE TABLE graft_part.db.bad1 (id BIGINT, ts TIMESTAMP, v BIGINT)
            |PARTITIONED BY (ts)""".stripMargin)
    }
    mkTable("p10")
    val e = intercept[Exception] {
      sql("ALTER TABLE graft_part.db.p10 DROP COLUMN day")
    }
    assert(e.getMessage.contains("partition column"))
  }
}

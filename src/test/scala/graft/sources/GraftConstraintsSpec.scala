package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Write-time CHECK / NOT NULL enforcement: constraints validate at DDL
  * time, violations fail the WRITE loudly naming the constraint, and the
  * atomic commit guarantees a failed write leaves the table byte-for-byte
  * unchanged — on every write path (append, COW UPDATE, MOR MERGE).
  */
class GraftConstraintsSpec extends SparkSpec {

  private lazy val warehouse =
    Files.createTempDirectory("graft_ck_wh").toFile.getAbsolutePath

  private def sql(q: String) = spark.sql(q)

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.graft_ck", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_ck.warehouse", warehouse)
    sql("CREATE NAMESPACE IF NOT EXISTS graft_ck.db")
  }

  private def violationMessage(t: Throwable): String = {
    var c: Throwable = t
    while (c != null && !Option(c.getMessage).exists(_.contains("constraint")))
      c = c.getCause
    Option(c).flatMap(x => Option(x.getMessage)).getOrElse(t.toString)
  }

  test("a CHECK that does not resolve or is non-boolean fails the CREATE") {
    val e1 = intercept[Exception](sql(
      """CREATE TABLE graft_ck.db.bad1 (id BIGINT, qty BIGINT)
        |TBLPROPERTIES('graft.check.r'='quantity > 0')""".stripMargin))
    assert(e1.getMessage.contains("quantity") ||
      Option(e1.getCause).exists(_.getMessage.contains("quantity")))
    val e2 = intercept[Exception](sql(
      """CREATE TABLE graft_ck.db.bad2 (id BIGINT, qty BIGINT)
        |TBLPROPERTIES('graft.check.r'='qty + 1')""".stripMargin))
    assert(e2.getMessage.contains("BOOLEAN") ||
      Option(e2.getCause).exists(_.getMessage.contains("BOOLEAN")))
    // neither half-created table survives as a loadable table
    assert(intercept[Exception](sql("SELECT * FROM graft_ck.db.bad1")) != null)
  }

  test("violating append fails naming the constraint; atomic commit leaves the table unchanged") {
    sql("""CREATE TABLE graft_ck.db.t (id BIGINT, qty BIGINT, status STRING)
          |TBLPROPERTIES('graft.check.qty_range'='qty BETWEEN 0 AND 100',
          |              'graft.check.status_domain'='status IN (''O'',''F'')')
          |""".stripMargin)
    sql("INSERT INTO graft_ck.db.t VALUES (1, 5, 'O'), (2, 100, 'F')")
    val before = sql("SELECT * FROM graft_ck.db.t ORDER BY id").collect().toSeq

    val e = intercept[Exception](
      sql("INSERT INTO graft_ck.db.t VALUES (3, 7, 'O'), (4, 101, 'F')"))
    assert(violationMessage(e).contains("qty_range"))
    assert(sql("SELECT * FROM graft_ck.db.t ORDER BY id").collect().toSeq == before,
      "failed write must leave no partial state")

    val e2 = intercept[Exception](
      sql("INSERT INTO graft_ck.db.t VALUES (5, 7, 'X')"))
    assert(violationMessage(e2).contains("status_domain"))
  }

  test("SQL CHECK semantics: NULL (unknown) passes the check") {
    sql("INSERT INTO graft_ck.db.t VALUES (6, NULL, 'O')")
    assert(sql("SELECT qty FROM graft_ck.db.t WHERE id = 6").collect()
      .toSeq == Seq(Row(null)))
  }

  test("NOT NULL columns get an implicit check") {
    sql("""CREATE TABLE graft_ck.db.nn (id BIGINT NOT NULL, v STRING)""")
    sql("INSERT INTO graft_ck.db.nn VALUES (1, 'a')")
    val e = intercept[Exception](
      sql("INSERT INTO graft_ck.db.nn VALUES (CAST(NULL AS BIGINT), 'b')"))
    // Spark's own TableOutputResolver asserts non-nullable V2 columns
    // upstream of the writer (NOT_NULL_ASSERT_VIOLATION); the writer-side
    // implicit check is defense-in-depth for paths that bypass it
    val msg = violationMessage(e) + e.getMessage
    assert(msg.contains("NOT NULL id") || msg.contains("NOT_NULL"))
    assert(sql("SELECT count(*) FROM graft_ck.db.nn").collect().head.getLong(0) == 1L)
  }

  test("copy-on-write UPDATE cannot write a violating value; table stays intact") {
    val before = sql("SELECT * FROM graft_ck.db.t ORDER BY id").collect().toSeq
    val e = intercept[Exception](
      sql("UPDATE graft_ck.db.t SET qty = 9999 WHERE id = 1"))
    assert(violationMessage(e).contains("qty_range"))
    assert(sql("SELECT * FROM graft_ck.db.t ORDER BY id").collect().toSeq == before)
    // a LEGAL update still works (the constraint machinery isn't a wall)
    sql("UPDATE graft_ck.db.t SET qty = 42 WHERE id = 1")
    assert(sql("SELECT qty FROM graft_ck.db.t WHERE id = 1").collect()
      .head.getLong(0) == 42L)
  }

  test("merge-on-read MERGE insert path enforces checks too") {
    sql("""CREATE TABLE graft_ck.db.m (id BIGINT, qty BIGINT)
          |TBLPROPERTIES('merge-on-read'='true',
          |              'graft.check.pos'='qty > 0')""".stripMargin)
    sql("INSERT INTO graft_ck.db.m VALUES (1, 10)")
    sql("SELECT 2 AS id, -5 AS qty").createOrReplaceTempView("graft_ck_src")
    val e = intercept[Exception](sql(
      """MERGE INTO graft_ck.db.m t USING graft_ck_src s ON t.id = s.id
        |WHEN NOT MATCHED THEN INSERT (id, qty) VALUES (s.id, s.qty)
        |""".stripMargin))
    assert(violationMessage(e).contains("pos"))
    assert(sql("SELECT count(*) FROM graft_ck.db.m").collect().head.getLong(0) == 1L)
  }

  test("dropping a column a CHECK references fails the DDL") {
    val e = intercept[Exception](
      sql("ALTER TABLE graft_ck.db.t DROP COLUMN qty"))
    assert(e.getMessage.contains("CHECK") ||
      Option(e.getCause).exists(_.getMessage.contains("CHECK")))
    // an unreferenced column still drops fine... (id is referenced by no check)
    sql("ALTER TABLE graft_ck.db.t DROP COLUMN id")
    assert(!sql("SELECT * FROM graft_ck.db.t").columns.contains("id"))
  }
}

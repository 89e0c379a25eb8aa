package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Masking / row-filter policies: reads are governed (batch, streaming,
  * time travel), predicates cannot probe raw values, raw paths (row-level
  * rewrites, change feed) are refused outside the admin bypass, DDL
  * validates loudly, and RENAME re-keys mask declarations.
  */
class GraftGovernanceSpec extends SparkSpec {

  private lazy val warehouse =
    Files.createTempDirectory("graft_gov_wh").toFile.getAbsolutePath

  private def sql(q: String) = spark.sql(q)

  private def withBypass[T](body: => T): T = {
    spark.conf.set(GraftGovernance.BypassConf, "true")
    try body finally spark.conf.unset(GraftGovernance.BypassConf)
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.graft_gv", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_gv.warehouse", warehouse)
    sql("CREATE NAMESPACE IF NOT EXISTS graft_gv.db")
  }

  private def mkCust(): Unit = {
    sql("DROP TABLE IF EXISTS graft_gv.db.cust")
    sql("""CREATE TABLE graft_gv.db.cust
          |(id BIGINT, name STRING, email STRING, balance BIGINT, seg STRING)
          |TBLPROPERTIES('history'='true',
          | 'mask.col.name'='last4', 'mask.col.email'='hash',
          | 'mask.col.balance'='null', 'row.filter'='seg <> ''vip''')
          |""".stripMargin)
    sql("""INSERT INTO graft_gv.db.cust VALUES
          |(1, 'Alice Jensen', 'alice@example.com', 1200, 'std'),
          |(2, 'Bob', 'bob@example.com', 3400, 'std'),
          |(3, 'Carol Murphy', 'carol@example.com', 9999, 'vip')""".stripMargin)
  }

  test("reads are masked and row-filtered; bypass sessions read raw") {
    mkCust()
    val rows = sql("SELECT * FROM graft_gv.db.cust ORDER BY id").collect()
    // vip row filtered out
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // last4: keep last 4 chars ('Bob' is <=4 -> whole value)
    assert(rows(0).getString(1) == "****nsen")
    assert(rows(1).getString(1) == "****Bob")
    // hash: md5 hex of the raw value
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest("alice@example.com".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(rows(0).getString(2) == md5)
    // null: typed NULL, schema keeps BIGINT
    assert(rows(0).isNullAt(3))
    assert(sql("SELECT * FROM graft_gv.db.cust").schema("balance")
      .dataType.typeName == "long")
    // admin bypass: raw values, all rows
    withBypass {
      val raw = sql("SELECT * FROM graft_gv.db.cust ORDER BY id").collect()
      assert(raw.length == 3 && raw(0).getString(1) == "Alice Jensen" &&
        raw(0).getLong(3) == 1200L)
    }
  }

  test("predicates on masked columns compare MASKED values - no probing") {
    mkCust()
    // probing with the raw value finds nothing...
    assert(sql("SELECT count(*) FROM graft_gv.db.cust " +
      "WHERE email = 'alice@example.com'").collect()(0).getLong(0) == 0L)
    // ...the masked value is what the predicate sees
    assert(sql("SELECT count(*) FROM graft_gv.db.cust " +
      "WHERE email = md5('alice@example.com')").collect()(0).getLong(0) == 1L)
    // aggregates see masked values too
    assert(sql("SELECT sum(balance) FROM graft_gv.db.cust")
      .collect()(0).isNullAt(0))
    // the stats-log COUNT(*) pushdown must NOT bypass the row filter:
    // the governed Filter sits between Aggregate and relation, so the
    // count is computed over visible rows, not manifest row counts
    assert(sql("SELECT count(*) FROM graft_gv.db.cust")
      .collect()(0).getLong(0) == 2L)
  }

  test("time travel and SELECT via DataFrame API inherit the policies") {
    mkCust()
    val v1 = sql("SELECT max(version) FROM graft_history('graft_gv', 'db.cust')")
      .collect()(0).getLong(0)
    val tt = sql(s"SELECT * FROM graft_gv.db.cust VERSION AS OF $v1 ORDER BY id")
      .collect()
    assert(tt.length == 2 && tt(0).getString(1) == "****nsen")
    val api = spark.table("graft_gv.db.cust").orderBy("id").collect()
    assert(api.length == 2 && api(0).isNullAt(3))
  }

  test("streaming reads are governed too") {
    mkCust()
    val ck = Files.createTempDirectory("graft_gov_ck").toFile.getAbsolutePath
    val q = spark.readStream.table("graft_gv.db.cust")
      .writeStream.format("memory").queryName("gov_stream")
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = sql("SELECT * FROM gov_stream ORDER BY id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L), "row filter applies")
    assert(got(0).getString(1) == "****nsen" && got(0).isNullAt(3))
  }

  test("row-level rewrites and the change feed are refused outside the bypass") {
    mkCust()
    val e1 = intercept[Exception] {
      sql("UPDATE graft_gv.db.cust SET balance = 0 WHERE id = 1")
    }
    assert(e1.getMessage.contains("masking/row-filter"), e1.getMessage)
    val e2 = intercept[Exception] {
      sql("DELETE FROM graft_gv.db.cust WHERE id = 1")
    }
    assert(e2.getMessage.contains("masking/row-filter"), e2.getMessage)
    val e3 = intercept[Exception] {
      sql("SELECT * FROM graft_gv.db.cust.changes").collect()
    }
    assert(e3.getMessage.contains("masking/row-filter"), e3.getMessage)
    // the admin bypass opens the raw paths
    withBypass {
      sql("UPDATE graft_gv.db.cust SET balance = balance + 1 WHERE id = 1")
      assert(sql("SELECT balance FROM graft_gv.db.cust WHERE id = 1")
        .collect()(0).getLong(0) == 1201L)
    }
    // and the masked surface reflects the admin write, still masked
    assert(sql("SELECT balance FROM graft_gv.db.cust WHERE id = 1")
      .collect()(0).isNullAt(0))
  }

  test("DDL validates policies loudly") {
    val e1 = intercept[Exception] {
      sql("CREATE TABLE graft_gv.db.bad1 (k BIGINT) " +
        "TBLPROPERTIES('mask.col.k'='rot13')")
    }
    assert(e1.getMessage.contains("unknown policy"))
    val e2 = intercept[Exception] {
      sql("CREATE TABLE graft_gv.db.bad2 (k BIGINT) " +
        "TBLPROPERTIES('mask.col.k'='hash')")
    }
    assert(e2.getMessage.contains("STRING"))
    val e3 = intercept[Exception] {
      sql("CREATE TABLE graft_gv.db.bad3 (k BIGINT) " +
        "TBLPROPERTIES('mask.col.ghost'='null')")
    }
    assert(e3.getMessage.contains("no such column"))
    val e4 = intercept[Exception] {
      sql("CREATE TABLE graft_gv.db.bad4 (k BIGINT, p STRING) " +
        "PARTITIONED BY (p) TBLPROPERTIES('mask.col.p'='null')")
    }
    assert(e4.getMessage.contains("directory names"))
    val e5 = intercept[Exception] {
      sql("CREATE TABLE graft_gv.db.bad5 (k BIGINT) " +
        "TBLPROPERTIES('row.filter'='no_such + 1')")
    }
    assert(e5 != null)
    // ALTER SET validates too
    sql("CREATE TABLE graft_gv.db.ok1 (k BIGINT, s STRING)")
    val e6 = intercept[Exception] {
      sql("ALTER TABLE graft_gv.db.ok1 SET TBLPROPERTIES('mask.col.k'='last4')")
    }
    assert(e6.getMessage.contains("STRING"))
    sql("ALTER TABLE graft_gv.db.ok1 SET TBLPROPERTIES('mask.col.s'='hash')")
    sql("INSERT INTO graft_gv.db.ok1 VALUES (1, 'secret')")
    assert(sql("SELECT s FROM graft_gv.db.ok1").collect()(0).getString(0)
      != "secret")
    sql("ALTER TABLE graft_gv.db.ok1 UNSET TBLPROPERTIES('mask.col.s')")
    assert(sql("SELECT s FROM graft_gv.db.ok1").collect()(0).getString(0)
      == "secret")
  }

  test("RENAME re-keys a mask; DROP of a masked column fails the DDL") {
    sql("DROP TABLE IF EXISTS graft_gv.db.rn")
    sql("CREATE TABLE graft_gv.db.rn (k BIGINT, s STRING) " +
      "TBLPROPERTIES('mask.col.s'='hash')")
    sql("INSERT INTO graft_gv.db.rn VALUES (1, 'topsecret')")
    sql("ALTER TABLE graft_gv.db.rn RENAME COLUMN s TO secret_col")
    // mask followed its column: still masked under the new name
    assert(sql("SELECT secret_col FROM graft_gv.db.rn")
      .collect()(0).getString(0) != "topsecret")
    val e = intercept[Exception] {
      sql("ALTER TABLE graft_gv.db.rn DROP COLUMN secret_col")
    }
    assert(e.getMessage.contains("governance"), e.getMessage)
  }
}

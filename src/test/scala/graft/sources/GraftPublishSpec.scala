package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multi-table atomic publish (`graft_publish_together`): a two-phase
  * fast-forward of one branch name across N tables. Phase 1 validates
  * every table before any rename (one bad table vetoes the whole publish
  * with ZERO tables touched); phase 2 applies in the caller's
  * upstream-first order, so the only observable intermediate states are
  * list prefixes — a reader never sees a derived table's new snapshot
  * next to its source's old one.
  */
class GraftPublishSpec extends SparkSpec {

  private lazy val warehouse =
    Files.createTempDirectory("graft_pub_wh").toFile.getAbsolutePath

  private def sql(q: String) = spark.sql(q)

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.GraftExtensions.register(spark)
    spark.conf.set("spark.sql.catalog.graft_pub", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_pub.warehouse", warehouse)
    sql("CREATE NAMESPACE IF NOT EXISTS graft_pub.db")
  }

  private def mk(t: String, n: Int): Unit = {
    sql(s"CREATE TABLE graft_pub.db.$t (k BIGINT, v STRING) TBLPROPERTIES('history'='true')")
    sql(s"INSERT INTO graft_pub.db.$t SELECT id, 'base' FROM range(0, $n)")
  }

  test("publish-together moves every table's main, or none") {
    mk("bronze", 10); mk("silver", 5)
    sql("SELECT * FROM graft_branch('graft_pub', 'db.bronze', 'rel')").collect()
    sql("SELECT * FROM graft_branch('graft_pub', 'db.silver', 'rel')").collect()
    sql("INSERT INTO graft_pub.db.bronze.branch_rel SELECT id, 'new' FROM range(100, 120)")
    sql("INSERT INTO graft_pub.db.silver.branch_rel SELECT id, 'new' FROM range(100, 110)")
    // staged, not published: main sees neither
    assert(spark.table("graft_pub.db.bronze").count() == 10)
    assert(spark.table("graft_pub.db.silver").count() == 5)
    val rows = sql("""SELECT * FROM graft_publish_together('graft_pub',
        |'db.bronze,db.silver', 'rel')""".stripMargin).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(0)).toSeq == Seq("db.bronze", "db.silver"),
      "receipt rows follow the caller's upstream-first order")
    assert(rows.forall(r => r.getLong(2) > r.getLong(1)))
    assert(spark.table("graft_pub.db.bronze").count() == 30)
    assert(spark.table("graft_pub.db.silver").count() == 15)
    // branch records retired on both
    val fs = new org.apache.hadoop.fs.Path(warehouse)
      .getFileSystem(spark.sessionState.newHadoopConf())
    Seq("bronze", "silver").foreach { t =>
      assert(GraftBranch.readAll(fs,
        new org.apache.hadoop.fs.Path(s"$warehouse/db/$t")).isEmpty)
    }
  }

  test("one diverged table vetoes the publish with zero tables touched") {
    mk("b2", 10); mk("s2", 5)
    sql("SELECT * FROM graft_branch('graft_pub', 'db.b2', 'rel')").collect()
    sql("SELECT * FROM graft_branch('graft_pub', 'db.s2', 'rel')").collect()
    sql("INSERT INTO graft_pub.db.b2.branch_rel SELECT id, 'new' FROM range(100, 110)")
    sql("INSERT INTO graft_pub.db.s2.branch_rel SELECT id, 'new' FROM range(100, 105)")
    // a racing commit moves s2's MAIN past the fork point
    sql("INSERT INTO graft_pub.db.s2 VALUES (999, 'race')")
    val e = intercept[Exception](sql(
      """SELECT * FROM graft_publish_together('graft_pub',
        |'db.b2,db.s2', 'rel')""".stripMargin).collect())
    assert(e.getMessage.contains("ZERO tables published"), e.getMessage)
    // b2 was validated FIRST in list order, yet stays untouched: the
    // reader-visible state never mixed b2-new with s2-old
    assert(spark.table("graft_pub.db.b2").count() == 10)
    assert(spark.table("graft_pub.db.b2.branch_rel").count() == 20,
      "the vetoed publish must leave every branch intact for retry")
    // the un-diverged table still publishes alone afterwards
    sql("SELECT * FROM graft_fastforward('graft_pub', 'db.b2', 'rel')").collect()
    assert(spark.table("graft_pub.db.b2").count() == 20)
  }

  test("a missing branch on any table vetoes the publish") {
    mk("b3", 4); mk("s3", 4)
    sql("SELECT * FROM graft_branch('graft_pub', 'db.b3', 'rel')").collect()
    sql("INSERT INTO graft_pub.db.b3.branch_rel VALUES (7, 'x')")
    val e = intercept[Exception](sql(
      """SELECT * FROM graft_publish_together('graft_pub',
        |'db.b3,db.s3', 'rel')""".stripMargin).collect())
    assert(e.getMessage.contains("ZERO tables published"))
    assert(spark.table("graft_pub.db.b3").count() == 4)
  }

  test("each publish records a consistency group; old groups stay " +
    "readable after heads move on") {
    mk("b4", 6); mk("s4", 3)
    def stage(extra: Int): Unit = {
      sql("SELECT * FROM graft_branch('graft_pub', 'db.b4', 'rel')").collect()
      sql("SELECT * FROM graft_branch('graft_pub', 'db.s4', 'rel')").collect()
      sql(s"INSERT INTO graft_pub.db.b4.branch_rel VALUES ($extra, 'n')")
      sql(s"INSERT INTO graft_pub.db.s4.branch_rel VALUES ($extra, 'n')")
      sql("""SELECT * FROM graft_publish_together('graft_pub',
            |'db.b4,db.s4', 'rel')""".stripMargin).collect()
    }
    stage(100)
    val g1 = sql("SELECT * FROM graft_group('graft_pub')").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    assert(g1.map(_._2).toSet == Set("db.b4", "db.s4"))
    stage(200)
    val g2 = sql("SELECT * FROM graft_group('graft_pub')").collect()
    assert(g2.head.getLong(0) == g1.head._1 + 1,
      "the second publish must allocate the next group id")
    // the OLD group, read by id, pins the pre-second-publish state
    val old = sql(s"SELECT * FROM graft_group('graft_pub', ${g1.head._1})")
      .collect().map(r => r.getString(2) -> r.getLong(3)).toMap
    val b4old = spark.sql(
      s"SELECT count(*) FROM graft_pub.db.b4 VERSION AS OF ${old("db.b4")}")
      .collect()(0).getLong(0)
    assert(b4old == 7, s"group 1 must pin the first publish's state ($b4old)")
    assert(spark.table("graft_pub.db.b4").count() == 8)
  }
}

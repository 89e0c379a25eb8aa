package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Declared snapshot retention: the policy lives on the table, the verb
  * applies it — keep-last floor, max-age window, both combined, tag
  * survival, loud refusals.
  */
class GraftRetentionSpec extends SparkSpec {

  private lazy val warehouse =
    Files.createTempDirectory("graft_ret_wh").toFile.getAbsolutePath

  private def sql(q: String) = spark.sql(q)
  private def fsOf(t: String) = {
    val p = new org.apache.hadoop.fs.Path(s"$warehouse/db/$t")
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Backdate a commit by rewriting its `!ts=` meta stamp (round 13:
    * commit wall-clock rides the manifest bytes, so mtime edits no
    * longer age a snapshot — rewriting the stamp is how a test does).
    */
  private def backdate(fs: org.apache.hadoop.fs.FileSystem,
                       mp: org.apache.hadoop.fs.Path, toMillis: Long): Unit = {
    val in = fs.open(mp)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    val out = lines.map(l =>
      if (l.startsWith(s"!${GraftTable.TsMetaKey}=")) s"!${GraftTable.TsMetaKey}=$toMillis" else l)
    val os = fs.create(mp, true)
    try os.write(out.mkString("\n").getBytes("UTF-8")) finally os.close()
  }
  private def manifests(t: String): Seq[Long] = {
    val (fs, p) = fsOf(t)
    GraftTable.manifestVersions(fs, p)
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.GraftExtensions.register(spark)
    spark.conf.set("spark.sql.catalog.graft_rt", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_rt.warehouse", warehouse)
    sql("CREATE NAMESPACE IF NOT EXISTS graft_rt.db")
  }

  test("keep-last floor: the declared count survives, older history expires") {
    sql("CREATE TABLE graft_rt.db.kl (k BIGINT) TBLPROPERTIES(" +
      "'history'='true', 'retention.keep-last'='2')")
    (0 until 4).foreach(i =>
      sql(s"INSERT INTO graft_rt.db.kl VALUES ($i)"))
    assert(manifests("kl").size == 5) // v1 empty + 4 appends
    val r = sql("SELECT * FROM graft_apply_retention('graft_rt', 'db.kl')")
      .collect()(0)
    assert(r.getLong(0) == 2L && r.getInt(2) == 3,
      s"keep_last=2 over 5 manifests must expire 3, got $r")
    assert(manifests("kl").size == 2)
    // data intact: retention trims history, never the table
    assert(sql("SELECT count(*) FROM graft_rt.db.kl").collect()(0).getLong(0) == 4)
  }

  test("max-age window: backdated snapshots expire, the current survives") {
    sql("CREATE TABLE graft_rt.db.ma (k BIGINT) TBLPROPERTIES(" +
      "'history'='true', 'retention.max-age-ms'='3600000')") // 1 hour
    (0 until 3).foreach(i =>
      sql(s"INSERT INTO graft_rt.db.ma VALUES ($i)"))
    val (fs, p) = fsOf("ma")
    // backdate every manifest two hours: all outside the window — the
    // CURRENT snapshot must survive anyway
    manifests("ma").foreach { v =>
      backdate(fs, GraftTable.manifestPath(p, v),
        System.currentTimeMillis() - 7200000L)
    }
    sql("SELECT * FROM graft_apply_retention('graft_rt', 'db.ma')").collect()
    assert(manifests("ma").size == 1, "only the current snapshot survives")
    assert(sql("SELECT count(*) FROM graft_rt.db.ma").collect()(0).getLong(0) == 3)
  }

  test("both declared: a snapshot expires only when BOTH allow; tags survive") {
    sql("CREATE TABLE graft_rt.db.bt (k BIGINT) TBLPROPERTIES(" +
      "'history'='true', 'retention.keep-last'='2', " +
      "'retention.max-age-ms'='3600000')")
    (0 until 4).foreach(i =>
      sql(s"INSERT INTO graft_rt.db.bt VALUES ($i)"))
    val vs = manifests("bt")
    val (fs, p) = fsOf("bt")
    // backdate all but the last TWO manifests; the third-newest stays
    // young, so max-age protects it even though keep-last would drop it
    vs.dropRight(3).foreach { v =>
      backdate(fs, GraftTable.manifestPath(p, v),
        System.currentTimeMillis() - 7200000L)
    }
    // tag the OLDEST (backdated) snapshot: retention-proof by meaning
    sql(s"SELECT * FROM graft_tag('graft_rt', 'db.bt', 'golden', ${vs.head})")
      .collect()
    sql("SELECT * FROM graft_apply_retention('graft_rt', 'db.bt')").collect()
    val left = manifests("bt").toSet
    assert(left.contains(vs.head), "tagged snapshot must survive retention")
    assert(left.contains(vs.last) && left.contains(vs(vs.size - 2)) &&
      left.contains(vs(vs.size - 3)),
      s"young + keep-last snapshots must survive, left: $left of $vs")
    assert(!left.contains(vs(1)), "old, untagged, beyond-floor must expire")
  }

  test("DDL refusals and the no-declaration refusal are loud") {
    val e1 = intercept[Exception](sql(
      "CREATE TABLE graft_rt.db.bad1 (k BIGINT) TBLPROPERTIES(" +
        "'history'='true', 'retention.keep-last'='0')"))
    assert(e1.getMessage.contains("at least 1"))
    val e2 = intercept[Exception](sql(
      "CREATE TABLE graft_rt.db.bad2 (k BIGINT) TBLPROPERTIES(" +
        "'history'='true', 'retention.max-age-ms'='nope')"))
    assert(e2.getMessage.contains("not a long"))
    val e3 = intercept[Exception](sql(
      "CREATE TABLE graft_rt.db.bad3 (k BIGINT) TBLPROPERTIES(" +
        "'retention.keep-last'='2')"))
    assert(e3.getMessage.contains("history"))
    sql("CREATE TABLE graft_rt.db.nd (k BIGINT) TBLPROPERTIES('history'='true')")
    val e4 = intercept[Exception](
      sql("SELECT * FROM graft_apply_retention('graft_rt', 'db.nd')").collect())
    assert(e4.getMessage.contains("declares no retention"))
    // ALTER SET validates; UNSET leaves a policy-less table that refuses
    sql("ALTER TABLE graft_rt.db.nd SET TBLPROPERTIES('retention.keep-last'='3')")
    val e5 = intercept[Exception](sql(
      "ALTER TABLE graft_rt.db.nd SET TBLPROPERTIES('retention.keep-last'='-1')"))
    assert(e5.getMessage.contains("at least 1"))
    sql("ALTER TABLE graft_rt.db.nd UNSET TBLPROPERTIES('retention.keep-last')")
    intercept[Exception](
      sql("SELECT * FROM graft_apply_retention('graft_rt', 'db.nd')").collect())
  }
}

package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Aggregate pushdown to manifest stats: a global COUNT/MIN/MAX plans a
  * one-row metadata scan (no data-file tasks, no footer probes), and every
  * soundness gate falls back to the ordinary scan with the SAME answer.
  */
class GraftAggPushdownSpec extends SparkSpec {

  private lazy val warehouse =
    Files.createTempDirectory("graft_agg_wh").toFile.getAbsolutePath

  private def sql(q: String) = spark.sql(q)

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.graft_agg", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_agg.warehouse", warehouse)
    sql("CREATE NAMESPACE IF NOT EXISTS graft_agg.db")
  }

  private def isMetadataOnly(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("stats-aggregated")

  test("global COUNT/MIN/MAX answer from stats: no footers, no data tasks") {
    sql("""CREATE TABLE graft_agg.db.t (k BIGINT, s STRING, d DOUBLE,
          |dec DECIMAL(10,2), ts TIMESTAMP)""".stripMargin)
    sql("""INSERT INTO graft_agg.db.t SELECT id, concat('s', id % 7),
          |CAST(id AS DOUBLE) / 8, CAST(id AS DECIMAL(10,2)) / 4,
          |timestamp_micros(1700000000000000 + id * 1000000)
          |FROM range(0, 1000)""".stripMargin)
    sql("INSERT INTO graft_agg.db.t SELECT id, NULL, NULL, NULL, NULL " +
      "FROM range(5000, 5100)")

    val before = GraftParquetFilters.footerProbes.get()
    val q = sql("""SELECT count(*) AS n, count(s) AS ns, min(k) AS mnk,
                  |max(k) AS mxk, min(s) AS mns, max(s) AS mxs,
                  |min(d) AS mnd, max(dec) AS mxdec, max(ts) AS mxts
                  |FROM graft_agg.db.t""".stripMargin)
    assert(isMetadataOnly(q), q.queryExecution.executedPlan.toString)
    val r = q.collect().head
    assert(GraftParquetFilters.footerProbes.get() == before,
      "planning and execution must open zero parquet footers")
    assert(r.getLong(0) == 1100 && r.getLong(1) == 1000)
    assert(r.getLong(2) == 0 && r.getLong(3) == 5099)
    assert(r.getString(4) == "s0" && r.getString(5) == "s6")
    assert(r.getDouble(6) == 0.0)
    assert(r.getDecimal(7) == new java.math.BigDecimal("249.75"))
    assert(r.getTimestamp(8).getTime == 1700000999000L)
    // and the one-row scan matches a forced full recompute
    val full = spark.table("graft_agg.db.t")
      .agg(count(lit(1)), count(col("s")), min("k"), max("k"), min("s"),
        max("s"), min("d"), max("dec"), max("ts")).collect().head
    assert(full.toSeq.map(String.valueOf(_)) == r.toSeq.map(String.valueOf(_)))
  }

  test("filters, group-by, and expressions fall back to the ordinary scan") {
    val f = sql("SELECT count(*) FROM graft_agg.db.t WHERE k > 10")
    assert(!isMetadataOnly(f))
    assert(f.collect().head.getLong(0) == 1089)
    val g = sql("SELECT s, count(*) FROM graft_agg.db.t GROUP BY s")
    assert(!isMetadataOnly(g))
    assert(g.count() == 8) // 7 values + null group
    val e = sql("SELECT min(k + 1) FROM graft_agg.db.t")
    assert(!isMetadataOnly(e))
    assert(e.collect().head.getLong(0) == 1)
  }

  test("deletion-vector and equality masks refuse the pushdown") {
    sql("""CREATE TABLE graft_agg.db.m (k BIGINT, v BIGINT)
          |TBLPROPERTIES('merge-on-read'='true', 'history'='true')""".stripMargin)
    sql("INSERT INTO graft_agg.db.m SELECT id, id FROM range(0, 100)")
    val ok = sql("SELECT count(*) FROM graft_agg.db.m")
    assert(isMetadataOnly(ok) && ok.collect().head.getLong(0) == 100)
    sql("DELETE FROM graft_agg.db.m WHERE k % 10 = 0") // DV sidecar, no rewrite
    val masked = sql("SELECT count(*) FROM graft_agg.db.m")
    assert(!isMetadataOnly(masked),
      "a DV-masked table must not serve counts from stats")
    assert(masked.collect().head.getLong(0) == 90)

    sql("""CREATE TABLE graft_agg.db.e (k BIGINT, v STRING)
          |TBLPROPERTIES('history'='true')""".stripMargin)
    sql("INSERT INTO graft_agg.db.e SELECT id, 'a' FROM range(0, 50)")
    import spark.implicits._
    GraftEqDelete.upsert(spark, "graft_agg", "db.e",
      Seq((1L, "b")).toDF("k", "v"), Seq("k"))
    val eq = sql("SELECT count(*) FROM graft_agg.db.e")
    assert(!isMetadataOnly(eq),
      "an eq-masked table must not serve counts from stats")
    assert(eq.collect().head.getLong(0) == 50)

    // PLAIN (non-history) merge-on-read: DVs live in the directory
    // listing, not manifest entries — the refusal must check both
    sql("""CREATE TABLE graft_agg.db.pm (k BIGINT, v BIGINT)
          |TBLPROPERTIES('merge-on-read'='true')""".stripMargin)
    sql("INSERT INTO graft_agg.db.pm SELECT id, id FROM range(0, 40)")
    sql("DELETE FROM graft_agg.db.pm WHERE k < 4")
    val pm = sql("SELECT count(*) FROM graft_agg.db.pm")
    assert(!isMetadataOnly(pm),
      "a plain-MOR table with DV sidecars must not serve counts from stats")
    assert(pm.collect().head.getLong(0) == 36)
  }

  test("empty table and all-null columns: COUNT 0, MIN/MAX NULL") {
    sql("CREATE TABLE graft_agg.db.empty (k BIGINT, s STRING)")
    val r0 = sql("SELECT count(*) AS n, min(k) AS mn, max(s) AS mx " +
      "FROM graft_agg.db.empty")
    assert(isMetadataOnly(r0))
    val row0 = r0.collect().head
    assert(row0.getLong(0) == 0 && row0.isNullAt(1) && row0.isNullAt(2))

    sql("CREATE TABLE graft_agg.db.nulls (k BIGINT, s STRING)")
    sql("INSERT INTO graft_agg.db.nulls SELECT id, NULL FROM range(0, 10)")
    val rn = sql("SELECT count(s) AS ns, min(s) AS mn FROM graft_agg.db.nulls")
    assert(isMetadataOnly(rn))
    val rowN = rn.collect().head
    assert(rowN.getLong(0) == 0 && rowN.isNullAt(1))
  }

  test("NaN-poisoned double bounds refuse MIN/MAX but still serve COUNT") {
    sql("CREATE TABLE graft_agg.db.nan (k BIGINT, d DOUBLE)")
    sql("INSERT INTO graft_agg.db.nan VALUES (1, 1.5), (2, CAST('NaN' AS DOUBLE))")
    val c = sql("SELECT count(*) FROM graft_agg.db.nan")
    assert(isMetadataOnly(c) && c.collect().head.getLong(0) == 2)
    val m = sql("SELECT min(d) FROM graft_agg.db.nan")
    assert(!isMetadataOnly(m), "NaN poisons the recorded bounds — fall back")
    assert(m.collect().head.getDouble(0) == 1.5)
  }

  test("day-partitioned table serves global aggregates from stats") {
    sql("""CREATE TABLE graft_agg.db.days (k BIGINT, ts TIMESTAMP)
          |PARTITIONED BY (days(ts))""".stripMargin)
    sql("""INSERT INTO graft_agg.db.days SELECT id,
          |timestamp_micros(1700000000000000 + id * 3600000000)
          |FROM range(0, 96)""".stripMargin)
    val q = sql("SELECT count(*) AS n, max(k) AS mx FROM graft_agg.db.days")
    assert(isMetadataOnly(q), q.queryExecution.executedPlan.toString)
    val r = q.collect().head
    assert(r.getLong(0) == 96 && r.getLong(1) == 95)
    // a raw-ts filter keeps pruning + ordinary scan (no wrong metadata row)
    val f = sql("""SELECT count(*) FROM graft_agg.db.days
                  |WHERE ts >= timestamp_micros(1700086400000000)""".stripMargin)
    assert(!isMetadataOnly(f))
    assert(f.collect().head.getLong(0) == 72)
  }
}

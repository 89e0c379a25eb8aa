package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Optimistic concurrency on the history-table commit log: the exclusive
  * manifest create is the commit point; APPEND commits that lose the race
  * re-derive against the winner's snapshot and retry (additive updates
  * commute — the retry result is exactly the serial outcome), while
  * replace/truncate commits stay loud (their file list came from a
  * now-stale snapshot; blind retry is the lost-update bug).
  */
class GraftConcurrencySpec extends SparkSpec {

  private lazy val warehouse =
    Files.createTempDirectory("graft_conc_wh").toFile.getAbsolutePath

  private def sql(q: String) = spark.sql(q)

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.graft_cc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_cc.warehouse", warehouse)
    sql("CREATE NAMESPACE IF NOT EXISTS graft_cc.db")
  }

  private def fs(dir: Path) =
    dir.getFileSystem(spark.sessionState.newHadoopConf())

  test("append commit retries past a racing committer and loses nothing") {
    sql("""CREATE TABLE graft_cc.db.h (id BIGINT, v STRING)
          |TBLPROPERTIES ('history'='true')""".stripMargin)
    sql("INSERT INTO graft_cc.db.h SELECT id, concat('a', id) FROM range(0, 10)")
    val dir = new Path(s"$warehouse/db/h")
    val f = fs(dir)
    val v0 = GraftTable.manifestVersions(f, dir).last

    // simulate the race deterministically: between our read of the latest
    // manifest and our exclusive create, a "racing committer" wins the
    // next version with its own appended file
    var raced = false
    val committed = GraftTable.commitRetrying(f, dir) { old =>
      if (!raced) {
        raced = true
        GraftTable.writeManifest(f, dir, v0 + 1,
          old ++ Seq(new Path(dir, "part-racer.parquet").toString))
      }
      old ++ Seq(new Path(dir, "part-mine.parquet").toString)
    }
    assert(committed == v0 + 2,
      s"retry must land on the version AFTER the racer's, got $committed")
    val finalList = GraftTable.readManifest(f, dir, committed)
      .map(p => new Path(p).getName)
    assert(finalList.contains("part-racer.parquet") &&
      finalList.contains("part-mine.parquet"),
      s"both commits' files must survive: $finalList")
    // and the pre-race files are still there
    assert(finalList.count(_.startsWith("part-")) >= 3)
  }

  test("append retry gives up loudly after maxRetries") {
    val dir = new Path(s"$warehouse/db/h")
    val f = fs(dir)
    intercept[java.io.IOException] {
      GraftTable.commitRetrying(f, dir, maxRetries = 3) { old =>
        // a pathological racer that always wins: pre-create the version
        // we are about to target
        val v = GraftTable.manifestVersions(f, dir).last
        GraftTable.writeManifest(f, dir, v + 1, old)
        old
      }
    }
  }

  test("non-manifest IO errors are NOT retried") {
    // the "table dir" is a plain FILE: every write under it fails with a
    // genuine IO error, the target version never appears -> rethrow
    // immediately instead of spinning maxRetries times
    val dir = new Path(s"$warehouse/db/not_a_dir")
    val f = fs(dir)
    val out = f.create(dir, true); out.write(1); out.close()
    intercept[java.io.IOException] {
      GraftTable.commitRetrying(f, dir) { old => old }
    }
  }

  test("two genuinely concurrent INSERT streams both commit, nothing lost") {
    sql("""CREATE TABLE graft_cc.db.h2 (id BIGINT, src STRING)
          |TBLPROPERTIES ('history'='true')""".stripMargin)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val rounds = 6
    val fa = Future {
      (0 until rounds).foreach { i =>
        sql(s"INSERT INTO graft_cc.db.h2 SELECT id, 'A' FROM range(${i * 10}, ${i * 10 + 10})")
      }
    }
    val fb = Future {
      (0 until rounds).foreach { i =>
        sql(s"INSERT INTO graft_cc.db.h2 SELECT id, 'B' FROM range(${i * 10}, ${i * 10 + 10})")
      }
    }
    Await.result(fa, 120.seconds)
    Await.result(fb, 120.seconds)
    // every row from both writers is in the final snapshot
    val got = sql("SELECT src, count(*) FROM graft_cc.db.h2 GROUP BY src")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("A" -> (rounds * 10L), "B" -> (rounds * 10L)),
      s"no committed row may be lost: $got")
  }

  test("replace (row-level) commits do not silently retry") {
    // the low-level exclusive create stays loud on a version collision —
    // the VALIDATED retry above it (write-serializable replace) is the
    // only caller allowed to go around again, and only after proving the
    // racing commit left its read set untouched
    val dir = new Path(s"$warehouse/db/h")
    val f = fs(dir)
    val v = GraftTable.manifestVersions(f, dir).last
    GraftTable.writeManifest(f, dir, v + 1, Nil)
    intercept[java.io.IOException] {
      GraftTable.writeManifest(f, dir, v + 1, Nil)
    }
  }

  test("write-serializable replace: rebases across a racing pure append") {
    sql("""CREATE TABLE graft_cc.db.ws (id BIGINT, v STRING)
          |TBLPROPERTIES ('history'='true')""".stripMargin)
    sql("INSERT INTO graft_cc.db.ws SELECT id, 'base' FROM range(0, 100)")
    // interpose an APPEND inside the DELETE's scan→commit window — the
    // deterministic version of a streaming ingest racing a long rewrite.
    // The appended batch even matches the DELETE predicate: rows the
    // DELETE's snapshot never saw must SURVIVE (WriteSerializable)
    GraftBatchWrite.replaceInterposer = Some(() =>
      sql("INSERT INTO graft_cc.db.ws SELECT id, 'raced' FROM range(1000, 1020)"))
    sql("DELETE FROM graft_cc.db.ws WHERE id % 10 = 3")
    assert(GraftBatchWrite.replaceInterposer.isEmpty, "interposer must fire")
    val got = sql("SELECT v, count(*) FROM graft_cc.db.ws GROUP BY v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("base" -> 90L, "raced" -> 20L),
      s"the delete must apply to its snapshot AND the racing append must " +
        s"survive untouched: $got")
  }

  test("write-serializable replace: a racing rewrite of a read file fails loudly") {
    sql("""CREATE TABLE graft_cc.db.ws2 (id BIGINT, v STRING)
          |TBLPROPERTIES ('history'='true')""".stripMargin)
    sql("INSERT INTO graft_cc.db.ws2 SELECT id, 'base' FROM range(0, 100)")
    // the racing commit REWRITES rows in the same files the outer DELETE
    // read — committing the outer rewrite would resurrect them
    GraftBatchWrite.replaceInterposer = Some(() =>
      sql("UPDATE graft_cc.db.ws2 SET v = 'won' WHERE id % 10 = 7"))
    val e = intercept[Exception] {
      sql("DELETE FROM graft_cc.db.ws2 WHERE id % 10 = 3")
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("concurrent update conflict")),
      s"expected a loud conflict, got: ${chain(e).mkString(" | ")}")
    // the racing UPDATE's effect is intact; the refused DELETE applied
    // nothing
    val got = sql("SELECT v, count(*) FROM graft_cc.db.ws2 GROUP BY v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("base" -> 90L, "won" -> 10L),
      s"the losing rewrite must leave no effect: $got")
  }
}

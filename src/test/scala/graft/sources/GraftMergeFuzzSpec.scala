package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Randomized model check of the catalog's MERGE INTO: random initial
  * states and change sets (matched/unmatched keys, update/delete ops,
  * multi-file layouts) replayed against an in-memory reference model.
  * The deterministic specs prove each clause once; this sweeps the
  * combination space (empty changes, all-delete, insert-only, single-file
  * vs many-file targets) where rewrite planning differs.
  */
class GraftMergeFuzzSpec extends SparkSpec {

  private lazy val warehouse =
    Files.createTempDirectory("graft_fuzz_wh").toFile.getAbsolutePath

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.graft_fuzz", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_fuzz.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_fuzz.db")
  }

  test("MERGE INTO matches the in-memory model on random states") {
    val rnd = new scala.util.Random(20260814L)
    (0 until 8).foreach { trial =>
      val tbl = s"graft_fuzz.db.t$trial"
      spark.sql(s"CREATE TABLE $tbl (id BIGINT, amt BIGINT)")
      // 0-3 inserts of disjoint slices → 0-3 data files
      val nSlices = rnd.nextInt(4)
      val initial = scala.collection.mutable.Map.empty[Long, Long]
      (0 until nSlices).foreach { sl =>
        val lo = sl * 100
        val rows = (lo until lo + 20 + rnd.nextInt(30)).map(_.toLong)
        rows.foreach(id => initial(id) = id * 7)
        spark.sql(
          s"INSERT INTO $tbl SELECT id, id * 7 FROM range(${rows.head}, ${rows.last + 1}, 1, 1)")
      }
      // random changes: keys half-in half-out of the target id space
      val changes = (0 until rnd.nextInt(40)).map { _ =>
        val id = rnd.nextInt(400).toLong
        val op = if (rnd.nextBoolean()) "U" else "D"
        (id, op, rnd.nextInt(1000).toLong)
      }.distinct.groupBy(_._1).map(_._2.head).toSeq // one change per key
      val model = initial.clone()
      changes.foreach { case (id, op, amt) =>
        (op, model.contains(id)) match {
          case ("D", true) => model.remove(id)
          case ("U", true) => model(id) = amt
          case ("U", false) => model(id) = amt // not-matched insert
          case ("D", false) => // not-matched delete: no-op
        }
      }
      if (changes.nonEmpty) {
        changes.map { case (id, op, amt) => s"($id, '$op', $amt)" }
          .mkString("SELECT * FROM (VALUES ", ", ", ") AS c(id, op, amt)") match {
          case q => spark.sql(q).createOrReplaceTempView(s"fuzz_chg$trial")
        }
        spark.sql(
          s"""MERGE INTO $tbl t USING fuzz_chg$trial c ON t.id = c.id
             |WHEN MATCHED AND c.op = 'D' THEN DELETE
             |WHEN MATCHED THEN UPDATE SET amt = c.amt
             |WHEN NOT MATCHED AND c.op <> 'D' THEN INSERT (id, amt) VALUES (c.id, c.amt)
             |""".stripMargin)
      }
      val got = spark.sql(s"SELECT id, amt FROM $tbl ORDER BY id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == model.toMap,
        s"trial $trial: slices=$nSlices changes=${changes.size}\n" +
          s"extra=${(got.keySet -- model.keySet).toSeq.sorted.take(5)} " +
          s"missing=${(model.keySet -- got.keySet).toSeq.sorted.take(5)} " +
          s"diff=${got.collect { case (k, v) if model.get(k).exists(_ != v) => (k, v, model(k)) }.take(5)}")
      spark.sql(s"DROP TABLE $tbl")
    }
  }

  test("repeated MERGE rounds against one table stay consistent") {
    val rnd = new scala.util.Random(99L)
    val tbl = "graft_fuzz.db.multi"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, amt BIGINT)")
    spark.sql(s"INSERT INTO $tbl SELECT id, 0 FROM range(0, 100, 1, 1)")
    val model = scala.collection.mutable.Map((0L until 100L).map(_ -> 0L): _*)
    (0 until 5).foreach { round =>
      val changes = (0 until 20).map { _ =>
        (rnd.nextInt(150).toLong,
          if (rnd.nextInt(4) == 0) "D" else "U",
          round * 1000L + rnd.nextInt(1000))
      }.groupBy(_._1).map(_._2.head).toSeq
      changes.map { case (id, op, amt) => s"($id, '$op', $amt)" }
        .mkString("SELECT * FROM (VALUES ", ", ", ") AS c(id, op, amt)") match {
        case q => spark.sql(q).createOrReplaceTempView("fuzz_multi_chg")
      }
      spark.sql(
        s"""MERGE INTO $tbl t USING fuzz_multi_chg c ON t.id = c.id
           |WHEN MATCHED AND c.op = 'D' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET amt = c.amt
           |WHEN NOT MATCHED AND c.op <> 'D' THEN INSERT (id, amt) VALUES (c.id, c.amt)
           |""".stripMargin)
      changes.foreach { case (id, op, amt) =>
        (op, model.contains(id)) match {
          case ("D", true) => model.remove(id)
          case ("U", _) => model(id) = amt
          case _ =>
        }
      }
      val got = spark.sql(s"SELECT id, amt FROM $tbl").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == model.toMap, s"diverged at round $round")
    }
  }
}

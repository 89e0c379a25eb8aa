package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

class CsvBomSpec extends SparkSpec {
  import spark.implicits._

  test("writeCsvBom: every part file starts with the UTF-8 BOM; values round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bom").toString
    val df = Seq((1, "København"), (2, "Århus"), (3, "plain"))
      .toDF("id", "city").repartition(2) // multiple part files, each needs its BOM
    Sources.writeCsvBom(df, dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
    assert(parts.nonEmpty)
    for (p <- parts) {
      val head = java.nio.file.Files.readAllBytes(p.toPath).take(3)
      assert(head.sameElements(Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)),
        s"${p.getName} does not start with EF BB BF (utf-8-sig contract, main.py:330)")
    }
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("city", StringType)))
    val back = Sources.readCsv(spark, dir, schema)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(back == Set((1, "København"), (2, "Århus"), (3, "plain")))
  }
}

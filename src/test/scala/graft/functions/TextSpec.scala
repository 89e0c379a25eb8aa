package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, input: String): T =
    Seq(input).toDF("t").select(c.as("r")).collect().head.getAs[T]("r")

  test("classifyStatus: priority order, case-insensitivity, null on no match") {
    assert(one[String](Text.classifyStatus($"t"), "Delvist anbefalet i dag") == "Delvist anbefalet")
    // 'Ikke anbefalet' contains 'anbefalet' — priority must pick the longer
    assert(one[String](Text.classifyStatus($"t"), "blev IKKE ANBEFALET") == "Ikke anbefalet")
    assert(one[String](Text.classifyStatus($"t"), "anbefalet af raadet") == "Anbefalet")
    assert(one[String](Text.classifyStatus($"t"), "ingen beslutning") == null)
  }

  test("splitFirst: all three separators, earliest wins, no-sep → null tail") {
    val df = Seq("head - tail", "a – b", "x — y", "plain", "a - b – c").toDF("t")
      .select(Text.splitFirst($"t").as("s")).select($"s.head", $"s.tail")
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows(0) == ("head", "tail"))
    assert(rows(1) == ("a", "b"))
    assert(rows(2) == ("x", "y"))
    assert(rows(3) == ("plain", null))
    assert(rows(4) == ("a", "b – c")) // first separator wins
  }

  test("splitFirst: variable-length separators, longer wins at same position") {
    val df = Seq("k :: v", "k : v :: w", "k|v").toDF("t")
      .select(Text.splitFirst($"t", Seq(" : ", " :: ")).as("s"))
      .select($"s.head", $"s.tail")
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows(0) == ("k", "v"))      // " :: " matched as one separator
    assert(rows(1) == ("k", "v :: w")) // earliest position still wins
    assert(rows(2) == ("k|v", null))
  }

  test("rollingHash: deterministic, case-normalized, order-sensitive") {
    val df = Seq("alpha beta gamma", "Alpha BETA gamma", "gamma beta alpha").toDF("t")
      .select(Text.rollingHash($"t").as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs(0) == hs(1))  // lowercase normalization
    assert(hs(0) != hs(2))  // order matters (unlike the set fingerprint)
  }

  test("parseDanishDate: normal, unknown month defaults to January, no match → null") {
    assert(one[java.sql.Date](Text.parseDanishDate($"t"), "Godkendt den 12. januar 2026").toString == "2026-01-12")
    assert(one[java.sql.Date](Text.parseDanishDate($"t"), "3 maj 2024").toString == "2024-05-03")
    // unknown month name → January (reference main.py:230 behavior)
    assert(one[java.sql.Date](Text.parseDanishDate($"t"), "5. blurgh 2020").toString == "2020-01-05")
    assert(one[java.sql.Date](Text.parseDanishDate($"t"), "ingen dato") == null)
  }

  test("extractDate: d.m.y first, y-m-d fallback, null otherwise") {
    assert(one[String](Text.extractDate($"t"), "frist 12.01.2026 slut") == "12.01.2026")
    assert(one[String](Text.extractDate($"t"), "fra 2026-01-12") == "2026-01-12")
    assert(one[String](Text.extractDate($"t"), "nothing") == null)
  }

  test("extractAtc: matches ATC shape only") {
    assert(one[String](Text.extractAtc($"t"), "kode L01XC18 found") == "L01XC18")
    assert(one[String](Text.extractAtc($"t"), "L1XC18 is wrong") == null)
  }

  test("tokens + counts on empty and punctuated text") {
    assert(one[Int](size(Text.tokens($"t")), "") == 0)
    assert(one[Int](size(Text.tokens($"t")), "a  b") == 2)
    assert(one[Int](Text.bpeishTokenCount($"t"), "ab12,cd") == 4) // ab|12|,|cd
  }

  test("fingerprint is whitespace/case normalized; rollingHash is order-sensitive") {
    val fp = Seq(("A  b C", "a b c"), ("x y", "y x")).toDF("l", "r")
      .select(Text.fingerprint($"l") === Text.fingerprint($"r"),
        Text.rollingHash($"l") === Text.rollingHash($"r")).collect()
    assert(fp(0).getBoolean(0))  // same tokens → same fingerprint
    assert(!fp(1).getBoolean(1)) // swapped order → different rolling hash
  }

  test("tokenDiversity equals the relational explode-and-count on real docs") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val d = graft.expressions.TextExpressions.tokenDiversity($"text")
    val got = docs.select($"doc_id", d.as("d"))
      .select($"doc_id", $"d" (0).as("n"), $"d" (1).as("ty"), $"d" (2).as("s2"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val naive = docs
      .select($"doc_id", explode(Text.tokens($"text")).as("t"))
      .groupBy($"doc_id", $"t").count()
      .groupBy($"doc_id")
      .agg(sum($"count").as("n"), count(lit(1)).as("ty"),
        sum($"count" * $"count").as("s2"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.filter(_._2._1 > 0) === naive)
    assert(naive.nonEmpty)
  }

  test("tokenDiversity edges: empty, single token, all-same, all-distinct") {
    val d = graft.expressions.TextExpressions.tokenDiversity($"t")
    def div(t: String): Seq[Long] =
      Seq(t).toDF("t").select(d).head().getSeq[Long](0)
    assert(div("") === Seq(0L, 0L, 0L))
    assert(div("hello") === Seq(1L, 1L, 1L))
    assert(div("a a a a") === Seq(4L, 1L, 16L))
    assert(div("a b c d") === Seq(4L, 4L, 4L))
    assert(div("a  b a") === Seq(3L, 2L, 5L)) // double space: no empty token
  }

  test("simhash of identical texts equal; near texts within small hamming") {
    val df = Seq(("d1", "the quick brown fox jumps over the lazy dog today"),
      ("d2", "the quick brown fox jumps over the lazy dog today"),
      ("d3", "the quick brown fox jumps over the lazy cat today")).toDF("id", "text")
    val sigs = df.select($"id", Text.simhash("text").as("s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sigs("d1") == sigs("d2"))
    assert(java.lang.Long.bitCount(sigs("d1") ^ sigs("d3")) <= 20)
    // the relational SimHashAgg path must produce bit-identical signatures
    // to the single-expression SQL form (it is what oracles verify)
    val rel = graft.operators.Dedup.simhashSignatures(df, "id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rel == sigs)
  }
}

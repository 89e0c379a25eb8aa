package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Split on the first occurrence of any separator → struct(head, tail);
  * tail null when no separator matches; earliest match wins, longer
  * separator wins a position tie; both parts trimmed.
  *
  * Native because the composed form (`least` over per-separator structs,
  * then two getFields + a found-guard) re-evaluates the candidate struct —
  * and therefore every instr over the input — up to four times per row,
  * and codegen subexpression elimination does not reach across the
  * conditional branches. One scan per separator here. CodegenFallback is
  * fine: the eval is a few string scans, dwarfed by the duplicate
  * evaluation it replaces.
  */
case class SplitFirst(child: Expression, seps: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(seps.nonEmpty && seps.forall(_.nonEmpty), "separators must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"split_first requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("head", StringType, nullable = true),
    StructField("tail", StringType, nullable = true)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "split_first"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var bestPos = -1
    var bestLen = 0
    seps.foreach { sep =>
      val p = s.indexOf(sep)
      if (p >= 0 && (bestPos < 0 || p < bestPos ||
          (p == bestPos && sep.length > bestLen))) {
        bestPos = p
        bestLen = sep.length
      }
    }
    if (bestPos < 0) InternalRow(UTF8String.fromString(s.trim), null)
    else InternalRow(
      UTF8String.fromString(s.substring(0, bestPos).trim),
      UTF8String.fromString(s.substring(bestPos + bestLen).trim))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All word n-grams of a single-space-tokenized string in ONE pass —
  * tokens, n-gram concatenation, and (optionally) per-document dedup
  * inside one eval call.
  *
  * Native because the relational formulation (posexplode tokens → window
  * `lead` → concat_ws → distinct) shuffles the whole token stream twice
  * (by doc for the window sort, by (doc, shingle) for the distinct) just
  * to compute a value that is a pure function of ONE row. At 100 TB those
  * are the two largest shuffles of the dedup pipeline — gone. Token
  * semantics match Text.tokens exactly: split on single spaces, empty
  * tokens dropped; documents with fewer than n tokens yield an empty
  * array. CodegenFallback: one interpreted call per document, all the
  * work inside.
  */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"n-gram size must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString
      .split(" ").filter(_.nonEmpty)
    if (toks.length < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[AnyRef](toks.length - n + 1)
    val seen = if (distinct) new java.util.HashSet[String]() else null
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val s = sb.toString
      if (seen == null || seen.add(s)) out.add(UTF8String.fromString(s))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row 60-bit SimHash of a space-tokenized string: ONE tokenize, one
  * md5 per token, and a tight bit-vote loop. Replaces both the relational
  * explode→SimHashAgg build (a whole extra aggregate stage + join-back)
  * and the SQL-lambda fragment (which re-evaluates the interpreted
  * token-hash array once PER BIT — the measured 40× cliff).
  *
  * Bit-identical to both: h(token) = first 15 md5 hex chars as a 60-bit
  * int (= conv(substring(md5(t),1,15),16,10)); output bit i is set iff
  * Σ_tokens (+1 if (h>>i)&1 else −1) > 0. Empty input → 0L.
  */
case class SimHash(child: Expression, bits: Int = 60)
    extends UnaryExpression with CodegenFallback {

  require(bits > 0 && bits <= 60, s"simhash bits must be in (0, 60], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash"

  // one digest per deserialized (= per-task) instance; digest() resets it
  @transient private lazy val md5 = java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ")
    val votes = new Array[Int](bits)
    var t = 0
    while (t < toks.length) {
      val s = toks(t)
      if (s.nonEmpty) {
        val d = md5.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 15 hex chars = top 60 bits of the first 8 digest bytes
        var h = 0L
        var i = 0
        while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
        h >>>= 4
        var b = 0
        while (b < bits) {
          votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) out |= 1L << b; b += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  def splitFirst(c: Column, seps: Seq[String]): Column =
    Bridge.column(SplitFirst(Bridge.expression(c), seps))

  def simhash(c: Column): Column =
    Bridge.column(SimHash(Bridge.expression(c)))

  def wordNgrams(c: Column, n: Int, distinct: Boolean): Column =
    Bridge.column(WordNgrams(Bridge.expression(c), n, distinct))
}

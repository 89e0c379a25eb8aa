package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text extraction / analysis Column functions.
  *
  * Everything here composes built-in Spark SQL functions so the whole
  * pipeline stays inside whole-stage codegen — no UDFs on the hot path.
  *
  * The extraction functions re-express the reference pipeline's regex layer
  * (see /root/reference/main.py): status classification (L106-133), Danish
  * date parsing (L29-42, L217-232), generic date fallback (L246-256), ATC
  * code extraction (L234-244), and header splitting (L147-156).
  */
object Text {

  /** ATC code pattern, e.g. L01XC18 (main.py:242). */
  val AtcPattern = "[A-Z][0-9]{2}[A-Z]{2}[0-9]{2}"

  /** Whitespace tokens (text in the corpus is single-space separated). */
  def tokens(c: Column): Column = regexp_extract_all(c, lit("[^ ]+"), lit(0))

  /** BPE-ish sub-token pattern: letter runs, digit runs, single symbols. */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpeishPattern), lit(0)))

  /** Priority-ordered status classification (main.py:121-132). Most
    * specific pattern wins; case-insensitive; null when nothing matches.
    * (The reference's negative lookbehind is subsumed by the priority
    * ordering, which also keeps the logic RE2-compatible for oracles.)
    */
  def classifyStatus(c: Column): Column =
    when(c.rlike("(?i)Delvist\\s+anbefalet"), "Delvist anbefalet")
      .when(c.rlike("(?i)Ikke\\s+anbefalet"), "Ikke anbefalet")
      .when(c.rlike("(?i)Anbefalet"), "Anbefalet")
      .otherwise(lit(null))

  val ApprovedStatuses = Seq("Anbefalet", "Delvist anbefalet")

  private val danishMonths = Seq(
    "januar" -> 1, "februar" -> 2, "marts" -> 3, "april" -> 4,
    "maj" -> 5, "juni" -> 6, "juli" -> 7, "august" -> 8,
    "september" -> 9, "oktober" -> 10, "november" -> 11, "december" -> 12)

  /** Parse "12. januar 2026" / "Godkendt den 3 maj 2024" → DATE.
    * Unknown month names default to January like the reference
    * (main.py:230); no match at all → null.
    */
  def parseDanishDate(c: Column): Column = {
    val pat = "(\\d{1,2})\\.?\\s+([A-Za-zæøåÆØÅ]+)\\s+(\\d{4})"
    // BRANCH-FREE, single-reference form. The previous when(day =!= "", ...)
    // guard referenced the extracts across CASE WHEN branches, and codegen
    // subexpression elimination does not reach across conditional branches
    // — the physical plan inlined the whole input expression (construction
    // + full-text regex) FIVE times per row. Here:
    //  - get(regexp_extract_all(_, pat, g), 0) is null on no-match (vs the
    //    "" of regexp_extract), so make_date's null-intolerance replaces
    //    the guard branch;
    //  - greatest(pos, 1) replaces when(pos === 0, 1) for the reference's
    //    unknown-month→January default (main.py:230) without a second
    //    `pos` reference;
    //  - every regex value is referenced exactly once, so the input
    //    expression is CSE-shared across the three group extracts.
    // ONE scan of the input text extracts the whole match; the three group
    // extracts re-run the pattern over the ~16-char match only (the
    // identical `m` subtree is CSE-shared inside the projection — no
    // conditional branches). On the short synthetic inputs of the test
    // corpus this measures the same as three full scans; on real
    // document-length cards the input is scanned once instead of thrice.
    val m = get(regexp_extract_all(c, lit(pat), lit(0)), lit(0))
    val day = regexp_extract(m, pat, 1)
    val monName = lower(regexp_extract(m, pat, 2))
    val year = regexp_extract(m, pat, 3)
    val mon = greatest(array_position(
      array(danishMonths.map { case (n, _) => lit(n) }: _*), monName), lit(1L))
    make_date(year.cast("int"), mon.cast("int"), day.cast("int"))
  }

  /** Generic numeric date fallback (main.py:246-256): first d.m.y or y.m.d
    * styled substring, returned raw.
    */
  def extractDate(c: Column): Column = {
    // get(..., 0) is null on no-match, so coalesce chains the two styles
    // with ONE reference each (the when(p =!= "", p) form evaluated every
    // regex twice — CSE does not cross CASE WHEN branches)
    val p1 = get(regexp_extract_all(c, lit("\\d{1,2}[./\\-]\\d{1,2}[./\\-]\\d{4}"), lit(0)), lit(0))
    val p2 = get(regexp_extract_all(c, lit("\\d{4}[./\\-]\\d{1,2}[./\\-]\\d{1,2}"), lit(0)), lit(0))
    coalesce(p1, p2)
  }

  def extractAtc(c: Column): Column =
    get(regexp_extract_all(c, lit(AtcPattern), lit(0)), lit(0))

  /** Split on the first occurrence of any separator (main.py:147-156).
    * Returns struct(head, tail); tail null when no separator present.
    * Separators may have different lengths: the earliest match wins, ties
    * broken toward the longer separator (so " -- " beats " - " at the
    * same position when both are passed). Backed by the native SplitFirst
    * expression — the built-in composition re-evaluated every instr up to
    * 4× per row.
    */
  def splitFirst(c: Column, seps: Seq[String] = Seq(" - ", " – ", " — ")): Column =
    graft.expressions.TextExpressions.splitFirst(c, seps)

  // ---- text analysis -------------------------------------------------

  val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Count of tokens present in `set` (with multiplicity). */
  def countIn(toks: Column, set: Seq[String]): Column =
    size(filter(toks, t => t.isin(set: _*)))

  /** Quality scoring: token volume, punctuation ratio, stopword ratio.
    * Mirrors the shape of standard pretraining-corpus quality filters.
    * Ratios are raw IEEE doubles (no rounding): identical formulas over
    * exact integer inputs are bit-identical across engines, whereas round()
    * implementations differ at ties.
    */
  def qualityColumns(text: Column): Seq[Column] = {
    val toks = tokens(text)
    val nChars = length(text)
    val nTokens = size(toks)
    val punctRatio = (nChars - length(regexp_replace(text, "[.,!?;:]", ""))).cast("double") / nChars
    val stopRatio = countIn(toks, Stopwords).cast("double") / nTokens
    val quality = least(nTokens / lit(100.0), lit(1.0)) * (lit(1.0) - punctRatio) * (lit(0.5) + lit(0.5) * stopRatio)
    Seq(nTokens.as("n_tokens"), punctRatio.as("punct_ratio"),
      stopRatio.as("stop_ratio"), quality.as("quality"))
  }

  /** Stopword-profile language ID. Deterministic argmax with fixed
    * preference order on ties.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of", "and"),
    "es" -> Seq("el", "la", "de", "es", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("的", "是", "了"))

  def langScores(text: Column): Seq[Column] = {
    val toks = tokens(text)
    LangProfiles.map { case (l, words) => countIn(toks, words).as(s"s_$l") }
  }

  // ---- fused token statistics ---------------------------------------

  /** Layout of [[tokenStats]]: 4 fixed slots then one count per set
    * (Stopwords first, then the language profiles in order).
    */
  object Ts {
    val NTokens = 0; val NDistinct = 1; val NDigit = 2; val TokChars = 3
    val Stop = 4; val LangBase = 5
  }

  /** ONE native pass computing every per-token count the text-analysis
    * queries need: token/distinct/digit-token/char counts plus stopword
    * and language-profile hits. Project this ONCE into a column, then
    * derive scores from `at(stats, i)` — the composed `countIn` filters
    * interpret their lambda per token AND are excluded from codegen
    * subexpression elimination, so every structural reference re-counted.
    */
  def tokenStats(text: Column): Column =
    graft.expressions.TextExpressions.tokenStats(text,
      Stopwords +: LangProfiles.map(_._2))

  /** Integer element of a [[tokenStats]] column (original count columns
    * were int-typed; keep schemas identical).
    */
  def ts(stats: Column, idx: Int): Column = stats.getItem(idx).cast("int")

  /** Language score columns from a materialized [[tokenStats]] column. */
  def langScoresFrom(stats: Column): Seq[Column] =
    LangProfiles.zipWithIndex.map { case ((l, _), i) =>
      ts(stats, Ts.LangBase + i).as(s"s_$l")
    }

  /** [[qualityColumns]] with the token counts taken from a materialized
    * [[tokenStats]] column (identical formulas and output schema; the
    * punctuation ratio stays character-based over the raw text).
    */
  def qualityColumnsFrom(text: Column, stats: Column): Seq[Column] = {
    val nChars = length(text)
    val nTokens = ts(stats, Ts.NTokens)
    val punctRatio = (nChars - length(regexp_replace(text, "[.,!?;:]", ""))).cast("double") / nChars
    val stopRatio = ts(stats, Ts.Stop).cast("double") / nTokens
    val quality = least(nTokens / lit(100.0), lit(1.0)) * (lit(1.0) - punctRatio) * (lit(0.5) + lit(0.5) * stopRatio)
    Seq(nTokens.as("n_tokens"), punctRatio.as("punct_ratio"),
      stopRatio.as("stop_ratio"), quality.as("quality"))
  }

  /** Argmax over the profile scores; earlier profile wins ties. */
  def langPredict(scores: Seq[Column]): Column = {
    // branch-free argmax: array_position finds the FIRST index holding the
    // max, which reproduces the old priority chain's tie-break (earlier
    // language wins), with 2 structural references per score vs the old
    // chain's per-comparison-per-branch fan-out. (Lambda-bearing score
    // trees are EXCLUDED from codegen subexpression elimination, so
    // reference count — not CSE — is what bounds the interpreted stopword
    // counts here.)
    val langs = LangProfiles.map(_._1)
    val pos = array_position(array(scores: _*), array_max(array(scores: _*)))
    element_at(array(langs.map(lit): _*), pos.cast("int"))
  }

  /** Normalized-text md5 fingerprint (lowercase, collapsed whitespace). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(lower(text))))

  /** Polynomial rolling hash over tokens — order-sensitive fingerprint.
    * The accumulator and per-token hash are masked to 42 bits before the
    * multiply so the fold never overflows a signed long (ANSI mode errors
    * on overflow instead of wrapping).
    */
  def rollingHash(text: Column): Column = {
    val m = lit((1L << 42) - 1)
    aggregate(tokens(lower(text)), lit(1125899906842597L),
      (acc, t) => (acc.bitwiseAND(m)) * lit(1000003L) + (xxhash64(t).bitwiseAND(m)))
  }

  /** 60-bit SimHash over whitespace tokens of the named string column.
    * Per-token 60-bit hashes come from md5 hex (portable across engines for
    * oracle verification); bit i of the signature is set when the +1/-1
    * vote over tokens is positive. Backed by the native SimHash expression
    * — one tokenize + one md5 per token + a tight vote loop per row (the
    * earlier SQL-lambda fragment re-evaluated the interpreted token-hash
    * array once per bit, and the relational explode→SimHashAgg build paid
    * an aggregate stage + join-back).
    */
  def simhash(colName: String): Column =
    graft.expressions.TextExpressions.simhash(col(colName))
}

package graft.queries

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis over the documents table (SURVEY §2.C). */
object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_tokens" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), size(Text.tokens(col("text"))).as("n_ws_tokens"),
          Text.bpeishTokenCount(col("text")).as("n_bpeish_tokens"))
        .orderBy("doc_id")
    },

    // ONE native TokenStats pass per row feeds every count (the composed
    // filter() counts interpreted their lambda per token per reference)
    "ta_quality" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), Text.tokenStats(col("text")).as("__ts"))
        .select(col("doc_id") +: Text.qualityColumnsFrom(col("text"), col("__ts")): _*)
        .orderBy("doc_id")
    },

    "ta_langid" -> { (s, dir) =>
      val names = Text.LangProfiles.map { case (l, _) => col(s"s_$l") }
      Tables.documents(s, dir)
        .select(col("doc_id"), Text.tokenStats(col("text")).as("__ts"))
        .select(col("doc_id") +: Text.langScoresFrom(col("__ts")): _*)
        .select((col("doc_id") +: names) :+
          Text.langPredict(names).as("lang_pred"): _*)
        .orderBy("doc_id")
    },

    // language-ID confusion matrix (the classifier-quality audit run
    // before trusting ta_langid's labels for filtering): predicted vs
    // TRUE lang counts — the documents table carries ground truth, so the
    // heuristic's per-language precision/recall falls out of one bounded
    // (lang × lang) aggregation over the same one-pass TokenStats scores
    "ta_lang_confusion" -> { (s, dir) =>
      val names = Text.LangProfiles.map { case (l, _) => col(s"s_$l") }
      Tables.documents(s, dir)
        .select(col("lang"), Text.tokenStats(col("text")).as("__ts"))
        .select(col("lang") +: Text.langScoresFrom(col("__ts")): _*)
        .select(col("lang"), Text.langPredict(names).as("lang_pred"))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "lang_pred")
    },

    "ta_fingerprint" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    "ta_stats" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang"), col("n_chars"), size(Text.tokens(col("text"))).as("nt"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"),
          (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
          expr("percentile(nt, 0.5d)").as("p50_tokens"),
          expr("percentile(nt, 0.9d)").as("p90_tokens"))
        .orderBy("lang")
    },

    // TF-IDF top-3 terms per document. Postings + two linear aggregations
    // (term freq by (doc, term); doc freq by term) — the corpus size joins
    // in as a broadcast 1-row aggregate, never a driver-side count. At
    // 100 TB every step is a linear shuffle on its key; the final per-doc
    // top-k is a bounded window. IDF is the linear n_docs/df (not ln):
    // libm ln() differs in the last ulp across engines, and exact-integer
    // double division is the bit-reproducible choice per SURVEY §6.
    "ta_tfidf" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val tf = docs
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val total = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(dfreq, "term")
        .crossJoin(broadcast(total))
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          (col("tf") * (col("n_docs").cast("double") / col("df"))).as("tfidf"))
      val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
      scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"), col("rank"))
        .orderBy("doc_id", "rank")
    },

    // BM25 ranked retrieval (the inverted-index query shape, as linear
    // posting shuffles): three multi-term queries broadcast as a tiny
    // (query_id, term) table; the corpus token stream is semi-joined to
    // the term set BEFORE any shuffle so the posting exchange carries
    // hits, not tokens; N/avgdl ride in as a broadcast 1-row aggregate;
    // rational idf + an order-pinned per-doc score fold keep every double
    // bit-identical to the oracle. See TextSearch.bm25 for the scale notes.
    "ta_bm25" -> { (s, dir) =>
      import s.implicits._
      val q = Seq((1L, "fast"), (1L, "scan"), (2L, "merge"), (2L, "join"),
        (2L, "sort"), (3L, "stream"), (3L, "window"), (3L, "dup"))
        .toDF("query_id", "term")
      graft.operators.TextSearch.bm25(
          Tables.documents(s, dir), "doc_id", "text", q)
        .orderBy("query_id", "rank")
    },

    // exact positional phrase search: 2- and 3-word literal phrases, per
    // (phrase, doc) occurrence count + first token position. ONE scan —
    // the order-preserving WordNgrams arrays make the array index the
    // position and the phrase filter runs in an array lambda on the scan,
    // so only surviving hits reach the one groupBy shuffle (no
    // posexplode+window adjacency, no position self-join).
    "ta_phrase_search" -> { (s, dir) =>
      graft.operators.TextSearch.phraseSearch(
          Tables.documents(s, dir), "doc_id", "text",
          phrases2 = Seq("merge join", "batch batch"),
          phrases3 = Seq("key order sort"))
        .orderBy("phrase", "doc_id")
    },

    // the flagship training-data composition: quality filter -> language
    // filter -> exact dedup (keep first) -> surviving docs. Every stage is
    // a library operator; Catalyst fuses the three scalar filters into the
    // scan and the only shuffles are the dedup window and final sort.
    // the dataset card a corpus release ships with: per-(lang, source)
    // document counts, token mass, length extremes and the exact-dup rate
    // — ONE aggregation pass (count-distinct of the fingerprint is the
    // only two-stage agg; swap to approx_count_distinct at 100 TB and the
    // whole card is a single partial-agg scan)
    // URL-canonicalization dedup (the web-crawl staple: the same page
    // fetched as http/https, with/without www, mixed-case host, tracking
    // query params, fragments, trailing slashes — all one document).
    // URLs are synthesized deterministically from (source, doc_id) so the
    // CANONICALIZER is the unit under test: lowercase, strip scheme +
    // www. + query/fragment + trailing slash — an all-codegen
    // regexp_replace chain, then the dd_exact group-dedup shape (min-id
    // survivor, linear groupBy). The oracle replays the same chain.
    "pipe_url_dedup" -> { (s, dir) =>
      val raw = concat(
        when(col("doc_id") % 3 === 0, lit("http://WWW."))
          .otherwise(lit("https://")),
        col("source"), lit(".Example.com/page/"),
        (col("doc_id") % 50).cast("string"),
        when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
        lit("?utm_source=feed&id="), col("doc_id").cast("string"))
      val canon = regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(lower(raw),
          "^https?://", ""), "^www\\.", ""), "[?#].*$", ""), "/+$", "")
      Tables.documents(s, dir)
        .select(col("doc_id"), canon.as("canon_url"))
        .groupBy(col("canon_url"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("canon_url")
    },

    // PREFERENCE-PAIR construction (the RLHF/DPO data shape: per prompt,
    // one chosen and one rejected response with a positive margin).
    // Responses group by a synthetic prompt key; the ranking signal is
    // the document's length score — the point is the PAIRING operator:
    // two deterministic extremes per group (ties toward the smaller id),
    // degenerate groups (margin 0, i.e. no strict preference) dropped.
    // One groupBy-sized shuffle; windows are bounded per prompt group.
    "pipe_rlhf_pairs" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir)
        .select((col("doc_id") % 40).as("prompt_id"), col("doc_id"),
          col("n_chars"))
      val wUp = Window.partitionBy("prompt_id")
        .orderBy(col("n_chars").desc, col("doc_id"))
      val wDn = Window.partitionBy("prompt_id")
        .orderBy(col("n_chars").asc, col("doc_id"))
      val ranked = d
        .withColumn("r_best", row_number().over(wUp))
        .withColumn("r_worst", row_number().over(wDn))
      val chosen = ranked.where(col("r_best") === 1)
        .select(col("prompt_id"), col("doc_id").as("chosen_id"),
          col("n_chars").as("chosen_score"))
      val rejected = ranked.where(col("r_worst") === 1)
        .select(col("prompt_id"), col("doc_id").as("rejected_id"),
          col("n_chars").as("rejected_score"))
      chosen.join(rejected, "prompt_id")
        .withColumn("margin", col("chosen_score") - col("rejected_score"))
        .where(col("margin") > 0)
        .select(col("prompt_id"), col("chosen_id"), col("rejected_id"),
          col("margin"))
        .orderBy("prompt_id")
    },

    "pipe_dataset_card" -> { (s, dir) =>
      val nt = size(Text.tokens(col("text")))
      Tables.documents(s, dir)
        .select(col("lang"), col("source"), nt.as("nt"), md5(col("text")).as("fp"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nt")).as("sum_tokens"),
          min(col("nt")).as("min_tokens"), max(col("nt")).as("max_tokens"),
          countDistinct(col("fp")).as("n_unique"))
        .withColumn("n_dup_docs", col("n_docs") - col("n_unique"))
        .orderBy("lang", "source")
    },

    "pipe_corpus_clean" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val names = Text.LangProfiles.map { case (l, _) => col(s"s_$l") }
      val qual = docs
        .select(col("doc_id"), col("text"), Text.tokenStats(col("text")).as("__ts"))
        .select(Seq(col("doc_id"), col("text")) ++
          Text.qualityColumnsFrom(col("text"), col("__ts")) ++
          Text.langScoresFrom(col("__ts")): _*)
        .select(col("doc_id"), col("text"), col("n_tokens"), col("quality"),
          Text.langPredict(names).as("lang_pred"))
      val filtered = qual.where(
        col("n_tokens") >= 30 && col("lang_pred") === "en" && col("quality") > 0)
      graft.operators.Dedup.keepFirst(filtered, "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"), col("quality"))
        .orderBy("doc_id")
    },

    // temperature-scaled mixture smoothing (the multilingual up-sampling
    // rule): per-source share re-weighted as share^T with T = 0.5 — sqrt
    // exactly, because sqrt is IEEE-correctly-rounded in BOTH engines
    // while pow/ln are libm calls that drift an ulp (the pipe_lm_score
    // lesson: pick the exponent the hardware can do exactly). The weight
    // normalizer is an order-pinned fold over the bounded source dim
    "pipe_mixture_temp" -> { (s, dir) =>
      val per = Tables.documents(s, dir)
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      val tot = per.agg(sum(col("n_docs")).as("n_total"))
      val raw = per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"),
          (col("n_docs").cast("double") / col("n_total").cast("double")).as("share"))
        .withColumn("w_raw", sqrt(col("share")))
      val wtot = raw.agg(aggregate(
        transform(array_sort(collect_list(struct(col("source"), col("w_raw")))),
          x => x.getField("w_raw")),
        lit(0.0), (acc, x) => acc + x).as("w_sum"))
      raw.crossJoin(broadcast(wtot))
        .select(col("source"), col("n_docs"), col("share"),
          (col("w_raw") / col("w_sum")).as("weight"),
          floor(col("w_raw") / col("w_sum") * 100000).cast("long").as("per_100k"))
        .orderBy("source")
    },

    // the cleaning-funnel report: per-stage retention of the
    // pipe_corpus_clean rules, in pipeline order — the drop-accounting
    // every corpus release publishes ("which rule cost how many docs").
    // n_pass_alone is each rule independently, n_surviving is cumulative.
    // Doc-level counts are ONE conditional-sum aggregation pass; the two
    // dedup counts come from a fingerprint rollup (count-distinct via
    // groupBy, not a multi-distinct Expand — the dq_profile lesson), and
    // the two 1-row frames cross-join into the stacked report
    "pipe_clean_funnel" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val names = Text.LangProfiles.map { case (l, _) => col(s"s_$l") }
      val base = docs
        .select(col("doc_id"), col("text"), Text.tokenStats(col("text")).as("__ts"))
        .select(Seq(col("doc_id"), col("text")) ++
          Text.qualityColumnsFrom(col("text"), col("__ts")) ++
          Text.langScoresFrom(col("__ts")): _*)
        .select(col("doc_id"),
          graft.functions.Text.fingerprint(col("text")).as("fp"),
          (col("n_tokens") >= 30).cast("long").as("p1"),
          (Text.langPredict(names) === "en").cast("long").as("p2"),
          (col("quality") > 0).cast("long").as("p3"))
      val docCounts = base.agg(
        count(lit(1)).as("n_input"),
        sum(col("p1")).as("a1"), sum(col("p2")).as("a2"), sum(col("p3")).as("a3"),
        sum(col("p1") * col("p2")).as("c2"),
        sum(col("p1") * col("p2") * col("p3")).as("c3"))
      val dedupCounts = base.groupBy(col("fp"))
        .agg(max(col("p1") * col("p2") * col("p3")).as("anyPass"))
        .agg(count(lit(1)).as("dd_alone"), sum(col("anyPass")).as("dd_cum"))
      docCounts.crossJoin(dedupCounts)
        .selectExpr("stack(5, " +
          "0L, 'input', n_input, n_input, " +
          "1L, 'min_tokens', a1, a1, " +
          "2L, 'lang_en', a2, c2, " +
          "3L, 'quality_pos', a3, c3, " +
          "4L, 'dedup', dd_alone, dd_cum) " +
          "AS (stage_idx, stage, n_pass_alone, n_surviving)")
        .orderBy("stage_idx")
    },

    // top-10 bigram counts — the n-gram language-model counting shape,
    // reusing the relational (codegen) shingle path with n=2
    "ta_bigrams" -> { (s, dir) =>
      graft.operators.Dedup.shingleRowsAll(Tables.documents(s, dir), "doc_id", "text", 2)
        .groupBy(col("s").as("bigram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(10)
    },

    // collocation mining (PMI shape, log-free): bigram lift
    // P(w1w2)/(P(w1)P(w2)) = c12·N² / (B·c1·c2) with EXACT BIGINT numerator
    // and denominator (log-PMI is rejected for the same 1-ulp ln() drift
    // pipe_lm_score measured; the ratio ranks identically since log is
    // monotone). Two linear counting shuffles (unigrams, bigrams) + two
    // joins of the bigram table against the vocabulary — vocab-sized
    // sides, AQE broadcasts them when they fit; the 1-row totals broadcast
    // explicitly. Top-20 fully tie-broken. The exact integer products are
    // test-scale-bounded (< 2^53 so the DOUBLE division is exact); the
    // production form at 100 TB keeps only the double ratio
    "ta_pmi_lift" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val toks = docs.select(explode(Text.tokens(col("text"))).as("token"))
      val uni = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
      val n = toks.agg(count(lit(1)).as("n_tokens"))
      val bgc = graft.operators.Dedup.shingleRowsAll(docs, "doc_id", "text", 2)
        .select(split(col("s"), " ").as("p"))
        .select(col("p").getItem(0).as("w1"), col("p").getItem(1).as("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      val bt = bgc.agg(sum(col("c12")).as("n_bigrams"))
      bgc
        .join(uni.select(col("token").as("w1"), col("c").as("c1")), Seq("w1"))
        .join(uni.select(col("token").as("w2"), col("c").as("c2")), Seq("w2"))
        .crossJoin(broadcast(n)).crossJoin(broadcast(bt))
        .select(col("w1"), col("w2"), col("c12"),
          (col("c12") * col("n_tokens") * col("n_tokens")).as("num"),
          (col("n_bigrams") * col("c1") * col("c2")).as("den"))
        .withColumn("lift", col("num").cast("double") / col("den").cast("double"))
        .orderBy(col("lift").desc, col("w1"), col("w2"))
        .limit(20)
    },

    // hashing-trick featurization (the fixed-width bag-of-words encode
    // feeding a linear quality classifier): every token hashes into one of
    // 16 buckets via md5 — engine-portable and replay-stable like every
    // other sampling/sharding hash here (a JVM String.hashCode would pin
    // the oracle to Java). One explode + one (doc, bucket) hash count —
    // linear, and the output width is FIXED at the bucket count no matter
    // the vocabulary, which is the point of the trick at 100 TB
    "pipe_hash_features" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
        .withColumn("bucket",
          conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long") % 16)
        .groupBy(col("doc_id"), col("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("doc_id", "bucket")
    },

    "ta_wordcount" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(explode(Text.tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    },

    // vocabulary build + per-doc OOV rate: the tokenizer-coverage check a
    // training pipeline runs before committing to a vocab. Top-V by
    // (count desc, token) — fully tie-broken, so the V boundary is
    // deterministic in both engines; V=16 because the synthetic corpus
    // only has ~31 distinct tokens (a top-50k vocab would make OOV
    // degenerate-zero). The vocab is bounded ⇒ broadcast; the only wide
    // op is the token count shuffle, linear in corpus size.
    "ta_vocab_oov" -> { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
      val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(16)
        .select(col("token"), lit(1).as("__in"))
      toks.join(broadcast(vocab), Seq("token"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("doc_id"), col("n_tokens"), col("n_oov"),
          (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
        .orderBy("doc_id")
    },

    // tokenize-to-ids: the materialization step after the vocab commit —
    // every token becomes its vocab id (OOV = -1), exploded to
    // (doc, position, id) so every value is oracle-checked. The vocab is
    // bounded (top-V, fully tie-broken) and broadcasts; the token stream
    // maps in one linear pass — at 100 TB this is the id-corpus write
    // that feeds sequence packing (pipe_pack_bins)
    "pipe_tokenize_ids" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), posexplode(Text.tokens(col("text"))))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
          col("col").as("token"))
      val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(16)
      // 16-row window: the single-task sort is the bounded vocab, never data
      val vocab = counts
        .withColumn("token_id",
          (row_number().over(Window.orderBy(col("n").desc, col("token"))) - 1)
            .cast("int"))
        .select(col("token"), col("token_id"))
      toks.join(broadcast(vocab), Seq("token"), "left")
        .select(col("doc_id"), col("pos"),
          coalesce(col("token_id"), lit(-1)).as("token_id"))
        .orderBy("doc_id", "pos")
    },

    // one BPE merge step — the tokenizer-training primitive: count
    // adjacent character pairs across the corpus WEIGHTED by word
    // frequency and surface the top merge candidates. The pair scan runs
    // over the aggregated VOCABULARY (types × word length), not the raw
    // token stream — the classic BPE trick that makes each merge iteration
    // corpus-size-independent after one linear counting pass. Integer
    // counts end to end; `substring(tok, i, 2)` enumerates pairs without
    // an explode-to-chars blowup.
    "pipe_bpe_step" -> { (s, dir) =>
      val wc = Tables.documents(s, dir)
        .select(explode(Text.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      wc.where(length(col("tok")) >= 2)
        .select(col("tok"), col("c"),
          explode(sequence(lit(1), length(col("tok")) - 1)).as("i"))
        .select(expr("substring(tok, i, 2)").as("pair"), col("c"))
        .groupBy(col("pair")).agg(sum(col("c")).as("freq"))
        .orderBy(col("freq").desc, col("pair"))
        .limit(20)
    },

    // RAKE keyword extraction (Rose et al. 2010 — the classic unsupervised
    // keyword pass a corpus card runs): candidate phrases are maximal
    // stopword-free token runs (gaps-and-islands: run_id = running
    // stopword count per doc, a bounded per-doc window), word score =
    // degree/freq over the candidate set (exact integer sums, one double
    // division), phrase score = the pos-pinned fold of member scores,
    // identical phrase texts deduped (same words ⇒ same fold ⇒ MIN is
    // deterministic). The global top-15 is orderBy+limit — Spark's
    // distributed TakeOrdered, never a single-task global window.
    "ta_keywords" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val stops = Seq("the", "a", "of", "and", "to", "in", "is", "it")
      val pos = Tables.documents(s, dir)
        .select(col("doc_id"),
          posexplode(Text.tokens(col("text"))).as(Seq("pos0", "tok")))
        .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("tok"),
          col("tok").isin(stops: _*).as("stop"))
      val w = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val members = pos
        .withColumn("run_id",
          sum(when(col("stop"), 1L).otherwise(0L)).over(w))
        .where(!col("stop"))
        .select(col("doc_id"), col("run_id"), col("pos"), col("tok"))
      val phr = members.groupBy(col("doc_id"), col("run_id"))
        .agg(count(lit(1)).as("len"),
          array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")), " ").as("phrase"))
        .where(col("len").between(1, 4))
      val pw = members.join(phr, Seq("doc_id", "run_id"))
      val ws = pw.groupBy(col("tok"))
        .agg((sum(col("len")).cast("double") / count(lit(1))).as("score"))
      val ps = pw.join(ws, "tok")
        .groupBy(col("phrase"), col("doc_id"), col("run_id"))
        .agg(aggregate(transform(
            array_sort(collect_list(struct(col("pos"), col("score")))),
            x => x.getField("score")),
          lit(0.0), (acc, x) => acc + x).as("pscore"))
      val top = ps.groupBy(col("phrase"))
        .agg(count(lit(1)).as("n_occ"), min(col("pscore")).as("score"))
        .orderBy(col("score").desc, col("phrase")).limit(15)
      val wr = Window.orderBy(col("score").desc, col("phrase"))
      top.withColumn("rank", row_number().over(wr)).orderBy("rank")
    },

    // the full BPE TRAINING loop (round 9 — what pipe_bpe_step is one
    // scoring turn of): three merge rounds over the word-count table,
    // each picking the max-frequency adjacent symbol pair (ties to the
    // lexicographic smallest) and APPLYING it before recounting. Words
    // are boundary-encoded ('|' between symbols, wrapped) so a merge is
    // TWO nested non-overlapping replace() passes — pass 1 takes the
    // odd occurrences of a shared-boundary chain, pass 2 the now-isolated
    // rest, which equals the left-to-right BPE scan exactly (both engines
    // run the identical string algorithm, so the trace hash-matches).
    // Scale: every round is ONE pair-count shuffle over the VOCAB (not
    // the corpus — the corpus is read once into word counts), the chosen
    // pair is a broadcast 1-row join, and each round's lineage is cut.
    "pipe_bpe_train" -> { (s, dir) =>
      val wc0 = Tables.documents(s, dir)
        .select(explode(Text.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .select(concat(lit("|"),
          expr("array_join(transform(sequence(1, length(tok)), " +
            "i -> substring(tok, i, 1)), '|')"), lit("|")).as("seq"), col("c"))
        .localCheckpoint(eager = true)
      def step(wc: DataFrame, round: Int): (DataFrame, DataFrame) = {
        val best = wc
          .select(col("c"),
            expr("filter(split(seq, '\\\\|'), x -> x != '')").as("syms"))
          .where(size(col("syms")) >= 2)
          .select(col("c"), explode(expr(
            "transform(sequence(1, size(syms) - 1), " +
              "i -> struct(syms[i - 1] as a, syms[i] as b))")).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("c")).as("freq"))
          .orderBy(col("freq").desc, col("a"), col("b")).limit(1)
        val trace = best.select(lit(round).as("round"), col("a"), col("b"),
          concat(col("a"), col("b")).as("merged"), col("freq"))
        val applied = wc.crossJoin(broadcast(best))
          .select(expr(
            "replace(replace(seq, concat('|', a, '|', b, '|'), " +
              "concat('|', a, b, '|')), concat('|', a, '|', b, '|'), " +
              "concat('|', a, b, '|'))").as("seq"), col("c"))
          .localCheckpoint(eager = true)
        (trace, applied)
      }
      val (t1, w1) = step(wc0, 1)
      val (t2, w2) = step(w1, 2)
      val (t3, _) = step(w2, 3)
      t1.unionAll(t2).unionAll(t3).orderBy("round")
    },

    // the ENCODE half of the BPE story (round 9): re-run the 3-round
    // training loop carrying the raw token, then emit every vocab word's
    // final SEGMENTATION (symbols after the learned merges) — what a
    // tokenizer release ships next to its merge table. Same vocab-sized
    // shuffles as pipe_bpe_train; the corpus is touched once.
    "pipe_bpe_apply" -> { (s, dir) =>
      val wc0 = Tables.documents(s, dir)
        .select(explode(Text.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .select(col("tok"), concat(lit("|"),
          expr("array_join(transform(sequence(1, length(tok)), " +
            "i -> substring(tok, i, 1)), '|')"), lit("|")).as("seq"), col("c"))
        .localCheckpoint(eager = true)
      def step(wc: DataFrame): DataFrame = {
        val best = wc
          .select(col("c"),
            expr("filter(split(seq, '\\\\|'), x -> x != '')").as("syms"))
          .where(size(col("syms")) >= 2)
          .select(col("c"), explode(expr(
            "transform(sequence(1, size(syms) - 1), " +
              "i -> struct(syms[i - 1] as a, syms[i] as b))")).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("c")).as("freq"))
          .orderBy(col("freq").desc, col("a"), col("b")).limit(1)
        wc.crossJoin(broadcast(best))
          .select(col("tok"), expr(
            "replace(replace(seq, concat('|', a, '|', b, '|'), " +
              "concat('|', a, b, '|')), concat('|', a, '|', b, '|'), " +
              "concat('|', a, b, '|'))").as("seq"), col("c"))
          .localCheckpoint(eager = true)
      }
      step(step(step(wc0)))
        .select(col("tok"), col("c").as("n_occ"),
          expr("array_join(filter(split(seq, '\\\\|'), x -> x != ''), ' ')")
            .as("segmentation"),
          expr("size(filter(split(seq, '\\\\|'), x -> x != ''))")
            .cast("long").as("n_symbols"))
        .orderBy("tok")
    },

    // budget-constrained selection: per language, take documents in
    // lexical-diversity order until a fixed token budget fills (greedy,
    // boundary doc included) — the "best docs under an N-token budget"
    // mixture step. The order-then-prefix-sum is the range-partitioned
    // GlobalRank helper, NOT a per-lang window: a 5-value partition key
    // would funnel each language through one task at 100 TB. The order
    // key (n_types) is integral so the cross-engine sort is exact.
    "pipe_token_budget" -> { (s, dir) =>
      val d = graft.expressions.TextExpressions.tokenDiversity(col("text"))
      val base = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), d.as("__d"))
        .select(col("doc_id"), col("lang"),
          col("__d").getItem(0).as("n_tokens"),
          col("__d").getItem(1).as("n_types"))
        .where(col("n_tokens") > 0)
      graft.operators.GlobalRank.withGroupedPrefixSum(
          base, Seq("lang"), Seq(col("n_types").desc, col("doc_id")),
          col("n_tokens"), prefixCol = "pre")
        .where(col("pre") < 2000)
        .select(col("lang"), col("doc_id"), col("n_types"), col("n_tokens"),
          (col("pre") + col("n_tokens")).as("cum_tokens"))
        .orderBy(col("lang"), col("n_types").desc, col("doc_id"))
    },

    // CCNet-style quality tiers: per language, documents ranked by an
    // integral quality proxy (type count — the cross-engine-exact order
    // key) and cut into head/middle/tail TERCILES by pure rank arithmetic,
    // (3·(rank−1)) DIV n_lang. The per-lang rank is the range-partitioned
    // grouped rank (never a 5-value Window.partitionBy), per-lang totals
    // are a bounded dim broadcast back — so tiering 100 TB is one sort
    // shuffle plus arithmetic, no second pass over the corpus
    "pipe_quality_tiers" -> { (s, dir) =>
      val d = graft.expressions.TextExpressions.tokenDiversity(col("text"))
      val base = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), d.as("__d"))
        .select(col("doc_id"), col("lang"),
          col("__d").getItem(0).as("n_tokens"),
          col("__d").getItem(1).as("n_types"))
        .where(col("n_tokens") > 0)
        .drop("n_tokens")
      val ranked = graft.operators.GlobalRank.withGroupedPrefixSum(
        base, Seq("lang"), Seq(col("n_types").desc, col("doc_id")),
        lit(0L), rankCol = "lang_rank")
      val tot = base.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
      ranked.join(broadcast(tot), "lang")
        .select(col("doc_id"), col("lang"), col("n_types"), col("lang_rank"),
          expr("CASE (3 * (lang_rank - 1)) DIV n_lang WHEN 0 THEN 'head' " +
            "WHEN 1 THEN 'middle' ELSE 'tail' END").as("tier"))
        .orderBy("lang", "lang_rank")
    },

    // repeated-token ratio — the classic repetition quality signal for
    // training corpora (1 - distinct/total); narrow per-row map, no shuffle
    "ta_repetition" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), Text.tokenStats(col("text")).as("__ts"))
        .select(col("doc_id"), Text.ts(col("__ts"), Text.Ts.NTokens).as("n_tokens"),
          Text.ts(col("__ts"), Text.Ts.NDistinct).as("n_distinct"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          when(col("n_tokens") > 0,
            lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"))
            .otherwise(0.0).as("rep_ratio"))
        .orderBy("doc_id")
    },

    // token-length histogram buckets — the sequence-packing / batching
    // pre-step of a training pipeline (how much data sits at each length)
    "ta_length_buckets" -> { (s, dir) =>
      val nt = size(Text.tokens(col("text")))
      Tables.documents(s, dir)
        .select(floor(nt / 32).cast("long").as("bucket"), nt.as("nt"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("sum_tokens"),
          min(col("nt")).as("min_tokens"), max(col("nt")).as("max_tokens"))
        .orderBy("bucket")
    },

    // train-corpus materialization: quality filter → exact dedup →
    // deterministic hash sample → shard assignment. The sample and shard
    // derive from md5(doc_id) so the split is reproducible and portable
    // (no rand(), no engine-specific hash); each step is a linear pass or
    // one shuffle (the dedup window) at corpus scale
    // document chunking: overlapping fixed-size token windows (size 64,
    // stride 48) — the training-data packing / retrieval-chunking shape.
    // One explode per doc over codegen'd slice/array_join; chunk count =
    // floor((n_tokens-1)/stride)+1 so every token is covered and the last
    // chunk may run short
    // THE FLAGSHIP COMPOSITION: the full training-corpus build as ONE
    // declarative plan — quality/language gate → exact dedup (normalized
    // fingerprint) → near-dup removal (blocked 3-gram Jaccard pairs →
    // connected components → min-id representative) → contiguous 256-token
    // bin packing of the survivors. Every stage is an already-verified
    // operator; the composition itself is what a pipeline ships. Scale: the
    // gates fuse into the scan, pairs are postings-joined (never all-pairs),
    // packing range-partitions (GlobalRank) — no stage is single-task
    "pipe_corpus_e2e" -> { (s, dir) =>
      val names = Text.LangProfiles.map { case (l, _) => col(s"s_$l") }
      val qual = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("text"),
          Text.tokenStats(col("text")).as("__ts"))
        .select(Seq(col("doc_id"), col("source"), col("text")) ++
          Text.qualityColumnsFrom(col("text"), col("__ts")) ++
          Text.langScoresFrom(col("__ts")): _*)
        .select(col("doc_id"), col("source"), col("text"), col("n_tokens"),
          col("quality"), Text.langPredict(names).as("lang_pred"))
      val filtered = qual.where(
        col("n_tokens") >= 30 && col("lang_pred") === "en" && col("quality") > 0)
      val exact = graft.operators.Dedup.keepFirst(filtered, "doc_id", "text")
      val pairs = graft.operators.Dedup.jaccardPairsBlocked(exact, "doc_id", "text",
        blockCol = "source", n = 3, minJaccard = 0.3)
      val drop = graft.operators.ConnectedComponents.labels(pairs)
        .where(col("id") =!= col("cluster_id")).select(col("id"))
      val surv = exact.join(drop, exact("doc_id") === drop("id"), "left_anti")
        .select(col("doc_id"), col("n_tokens"))
      graft.operators.GlobalRank.withGroupedPrefixSum(
          surv.withColumn("g", lit("all")), Seq("g"), Seq(col("doc_id")),
          col("n_tokens"))
        .withColumn("bin", floor(col("grp_prefix") / lit(256.0)).cast("long"))
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"), col("bin"))
        .orderBy("doc_id")
    },

    // segment-level exact dedup across the CORPUS (the paragraph-dedup
    // step of RefinedWeb/Dolma-style pipelines, where repeated boilerplate
    // survives document-level dedup): docs split into non-overlapping
    // 32-token segments; a segment survives only at its FIRST corpus
    // occurrence (min (doc_id, seg_idx) — a map-side-combinable struct
    // min, no window); docs reassemble from surviving segments in order.
    // Scale shape: one linear shuffle on the segment text (high-cardinality
    // key), one per-doc reassembly groupBy — no low-cardinality stage
    "pipe_para_dedup" -> { (s, dir) =>
      val toks = Text.tokens(col("text"))
      val segs = Tables.documents(s, dir)
        .select(col("doc_id"), toks.as("toks"), size(toks).as("nt"))
        .where(col("nt") > 0)
        .select(col("doc_id"),
          explode(sequence(lit(0), floor((col("nt") - 1) / 32).cast("long"))).as("seg_idx"),
          col("toks"))
        .select(col("doc_id"), col("seg_idx"),
          array_join(slice(col("toks"), (col("seg_idx") * 32 + 1).cast("int"), lit(32)), " ")
            .as("seg_text"))
      val kept = segs.groupBy(col("seg_text"))
        .agg(min(struct(col("doc_id"), col("seg_idx"))).as("f"))
        .select(col("f.doc_id").as("doc_id"), col("f.seg_idx").as("seg_idx"),
          col("seg_text"))
      val tot = segs.groupBy(col("doc_id")).agg(count(lit(1)).as("n_segs"))
      val perDoc = kept.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_kept"),
          md5(array_join(expr(
            "transform(sort_array(collect_list(struct(seg_idx, seg_text))), x -> x.seg_text)"),
            " ").cast("binary")).as("kept_md5"))
      tot.join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_segs"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("kept_md5"))
        .orderBy("doc_id")
    },

    "ta_chunk" -> { (s, dir) =>
      val toks = Text.tokens(col("text"))
      Tables.documents(s, dir)
        .select(col("doc_id"), toks.as("toks"), size(toks).as("nt"))
        .where(col("nt") > 0)
        .select(col("doc_id"), col("toks"), col("nt"),
          explode(sequence(lit(0), floor((col("nt") - 1) / 48).cast("long"))).as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx"),
          array_join(slice(col("toks"), (col("chunk_idx") * 48 + 1).cast("int"), lit(64)), " ")
            .as("chunk_text"),
          least(col("nt") - col("chunk_idx") * 48, lit(64)).as("chunk_tokens"))
        .orderBy("doc_id", "chunk_idx")
    },

    // intra-document dedup: collapse repeated tokens to their first
    // occurrence, order preserved — the within-doc cleaning shape. The
    // whole transform is ONE WordNgrams(n=1, distinct) eval per row: the
    // expression's insertion-ordered dedup IS first-occurrence order; no
    // shuffle anywhere
    "ta_dedup_tokens" -> { (s, dir) =>
      def deduped = graft.expressions.TextExpressions.wordNgrams(
        col("text"), 1, distinct = true)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .orderBy("doc_id")
        .select(col("doc_id"),
          array_join(deduped, " ").as("deduped_text"),
          size(deduped).as("n_kept"))
      // no trailing orderBy — EliminateSorts would drop the INNER sort
      // instead and re-run the WordNgrams eval in the sampling pass
    },

    // importance (weighted) sampling: keep probability proportional to a
    // quality proxy, decided by a deterministic md5-uniform — reproducible
    // across engines and replays, unlike rand(); pure per-row map
    "pipe_sample_weighted" -> { (s, dir) =>
      val nt = size(Text.tokens(col("text")))
      val u = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int") / lit(65536.0)
      Tables.documents(s, dir)
        .select(col("doc_id"), nt.as("n_tokens"),
          least(nt / 200.0, lit(1.0)).as("w"))
        .where(u < col("w"))
        .orderBy("doc_id")
    },

    // stratified sampling: fixed per-language rates (downsample the
    // over-represented strata), decided by the same deterministic
    // md5-uniform as pipe_sample_weighted — replayable across engines,
    // retries and re-runs, unlike sampleBy's rand(). Pure scan-side
    // filter: no shuffle, no per-stratum pass
    "pipe_stratified" -> { (s, dir) =>
      val rate = when(col("lang") === "en", 0.5)
        .when(col("lang") === "zh", 0.25).otherwise(1.0)
      val u = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int") / lit(65536.0)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), rate.as("rate"))
        .where(u < col("rate"))
        .orderBy("doc_id")
    },

    // bigram language model: P(w2|w1) = c(w1 w2)/c(w1) for the top
    // bigrams. Two linear counting shuffles (bigrams, unigrams) + one
    // equi-join on the first word — the n-gram-LM estimation shape; at
    // 100 TB both counts are partial-agg friendly and the join shuffles
    // on vocabulary keys, never on documents
    "ta_ngram_lm" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val uni = docs.select(explode(Text.tokens(col("text"))).as("w1"))
        .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val bi = graft.operators.Dedup.shingleRowsAll(docs, "doc_id", "text", 2)
        .groupBy(col("s").as("bigram")).agg(count(lit(1)).as("c12"))
      bi.withColumn("w1", substring_index(col("bigram"), " ", 1))
        .join(uni, "w1")
        .select(col("bigram"), col("c12"), col("c1"),
          (col("c12").cast("double") / col("c1")).as("p_cond"))
        .orderBy(col("c12").desc, col("bigram"))
        .limit(20)
    },

    // LM-probability quality score — the determinism-safe stand-in for
    // perplexity filtering (CCNet-style): per doc, the position-ordered
    // fold-sum / mean / min of each bigram's corpus conditional
    // probability c(w1 w2)/c(w1). Log-space perplexity is NOT oracle-safe:
    // DuckDB's ln and Java's Math.log disagree by 1 ulp on ~0.05% of
    // rational inputs (measured over i/j, j <= 300), while division and a
    // fixed-order left fold are IEEE-exact in both engines. Scale shape:
    // two linear count aggregations build the LM, one shuffle join scores
    // doc bigrams, one per-doc aggregation folds — no window, no collect.
    "pipe_lm_score" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val bg = docs.select(col("doc_id"),
        posexplode(graft.expressions.TextExpressions.wordNgrams(
          col("text"), 2, distinct = false)).as(Seq("pos", "bigram")))
      val uni = docs.select(explode(Text.tokens(col("text"))).as("w1"))
        .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val lm = bg.groupBy(col("bigram")).agg(count(lit(1)).as("c12"))
        .withColumn("w1", substring_index(col("bigram"), " ", 1))
        .join(uni, "w1")
        .select(col("bigram"), (col("c12").cast("double") / col("c1")).as("pc"))
      bg.join(lm, "bigram")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          aggregate(
            transform(array_sort(collect_list(struct(col("pos"), col("pc")))),
              x => x.getField("pc")),
            lit(0.0), (acc, x) => acc + x).as("sum_p"),
          min(col("pc")).as("min_p"))
        .select(col("doc_id"), col("n_bigrams"), col("sum_p"),
          (col("sum_p") / col("n_bigrams")).as("mean_p"), col("min_p"))
        .orderBy("doc_id")
    },

    // lexical diversity (repetitiveness quality signal): type-token ratio
    // + Gini–Simpson index 1 − Σc²/n², from ONE native per-row pass
    // (TokenDiversity) — zero shuffles; the relational form would shuffle
    // the whole token stream twice for a per-document quantity. Integer
    // accumulators keep the doubles one IEEE division from exact, so the
    // DuckDB oracle matches bit-for-bit (Shannon entropy would not)
    "ta_diversity" -> { (s, dir) =>
      val d = graft.expressions.TextExpressions.tokenDiversity(col("text"))
      Tables.documents(s, dir)
        .select(col("doc_id"), d.as("__d"))
        .select(col("doc_id"),
          col("__d").getItem(0).as("n_tokens"),
          col("__d").getItem(1).as("n_types"),
          (col("__d").getItem(1).cast("double") /
            col("__d").getItem(0).cast("double")).as("ttr"),
          (lit(1.0) - col("__d").getItem(2).cast("double") /
            (col("__d").getItem(0) * col("__d").getItem(0)).cast("double"))
            .as("gini_simpson"))
        .where(col("n_tokens") > 0)
        .orderBy("doc_id")
    },

    // per-domain quality quota: keep the top-20 docs per source by the
    // ta_quality score (tiebreak doc_id) — the "cap any one domain's share
    // of the corpus" stage of a crawl pipeline. The per-source rank is the
    // range-partitioned grouped rank, NOT Window.partitionBy(source):
    // source cardinality is far below cluster parallelism, and the window
    // form would funnel each domain through one task at 100 TB
    "pipe_domain_cap" -> { (s, dir) =>
      val scored = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("text"),
          Text.tokenStats(col("text")).as("__ts"))
        .select(Seq(col("doc_id"), col("source")) ++
          Text.qualityColumnsFrom(col("text"), col("__ts")): _*)
        .select(col("doc_id"), col("source"), col("quality"))
      graft.operators.GlobalRank.withGroupedPrefixSum(
          scored, Seq("source"), Seq(col("quality").desc, col("doc_id")),
          lit(0L), rankCol = "src_rank")
        .where(col("src_rank") <= 20)
        .select(col("doc_id"), col("source"), col("quality"), col("src_rank"))
        .orderBy("source", "src_rank")
    },

    // contiguous sequence packing: docs in (lang, doc_id) order fill
    // 256-token bins; bin = floor(exclusive-prefix-tokens / cap), so a doc
    // straddling a boundary overflows its bin (greedy contiguous packing).
    // The per-lang ordered prefix sum is a range-partitioned sort +
    // per-partition offsets (GlobalRank.withGroupedPrefixSum) — 5 langs
    // over 100 TB still use EVERY partition, never one task per lang
    // T5/UL2-style span-corruption mask construction: ~15% of tokens in
    // length-3 spans per doc, span positions drawn DETERMINISTICALLY from
    // md5(doc_id:span_idx) — the md5-as-randomness rule, so retries and
    // replays mask identical spans. Strata (one span per equal slice of
    // the doc) guarantee non-overlap without any rejection loop. Pure
    // per-row arithmetic + a bounded explode; no shuffle at all
    "pipe_span_mask" -> { (s, dir) =>
      val spanLen = 3
      val nt = size(Text.tokens(col("text")))
      Tables.documents(s, dir)
        .select(col("doc_id"), nt.cast("long").as("n_tokens"))
        .where(col("n_tokens") >= 20)
        .withColumn("n_spans",
          floor(col("n_tokens") * 0.15 / spanLen).cast("long"))
        .where(col("n_spans") > 0)
        .select(col("doc_id"), col("n_tokens"), col("n_spans"),
          explode(sequence(lit(0L), col("n_spans") - 1)).as("span_idx"))
        .withColumn("stratum_len",
          floor(col("n_tokens") / col("n_spans")).cast("long"))
        .withColumn("offset",
          conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
            col("span_idx").cast("string"))), 1, 15), 16, 10).cast("long")
            % greatest(col("stratum_len") - (spanLen - 1), lit(1L)))
        .select(col("doc_id"), col("span_idx"),
          (col("span_idx") * col("stratum_len") + col("offset")).as("start_tok"),
          lit(spanLen.toLong).as("span_len"))
        .orderBy("doc_id", "span_idx")
    },

    // GPT-style sequence packing: the corpus is ONE token stream in doc
    // order, chunked at a fixed context length — documents SPLIT across
    // sequence boundaries (pipe_pack_bins never splits; real pretraining
    // packing does). Per doc the output is pure arithmetic over the
    // GLOBAL exclusive token prefix sum — computed range-partitioned
    // (one synthetic group spanning all partitions), so the "global
    // running total" that is a one-task window in the naive plan stays
    // partition-parallel at any scale
    "pipe_pack_split" -> { (s, dir) =>
      val nt = size(Text.tokens(col("text")))
      val base = Tables.documents(s, dir)
        .select(col("doc_id"), nt.cast("long").as("n_tokens"))
        .where(col("n_tokens") > 0)
        .withColumn("__g", lit(0))
      graft.operators.GlobalRank.withGroupedPrefixSum(
          base, Seq("__g"), Seq(col("doc_id")), col("n_tokens"),
          prefixCol = "prefix_tokens")
        .select(col("doc_id"), col("n_tokens"), col("prefix_tokens"),
          floor(col("prefix_tokens") / 512.0).cast("long").as("start_seq"),
          floor((col("prefix_tokens") + col("n_tokens") - 1) / 512.0).cast("long")
            .as("end_seq"))
        .withColumn("n_seqs", col("end_seq") - col("start_seq") + 1)
        .orderBy("doc_id")
    },

    // curriculum ordering: short-to-long buckets, deterministically
    // shuffled WITHIN each bucket by a content hash (reproducible across
    // retries/replays — the md5-as-randomness rule every sampling query
    // here follows). The global curriculum position comes from
    // GlobalRank's range-partitioned rank, not a one-task window
    "pipe_curriculum" -> { (s, dir) =>
      val nt = size(Text.tokens(col("text")))
      val base = Tables.documents(s, dir)
        .select(col("doc_id"), nt.cast("long").as("n_tokens"),
          md5(col("text")).as("shuffle_key"))
        .withColumn("bucket", floor(col("n_tokens") / lit(16.0)).cast("long"))
      graft.operators.GlobalRank.withGlobalRank(base,
          Seq(col("bucket"), col("shuffle_key"), col("doc_id")), rankCol = "pos")
        .select(col("doc_id"), col("n_tokens"), col("bucket"),
          col("shuffle_key"), col("pos"))
        .orderBy("pos")
    },

    "pipe_pack_bins" -> { (s, dir) =>
      val nt = size(Text.tokens(col("text")))
      val base = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), nt.as("n_tokens"))
      graft.operators.GlobalRank.withGroupedPrefixSum(
          base, Seq("lang"), Seq(col("doc_id")), col("n_tokens"))
        .withColumn("bin", floor(col("grp_prefix") / lit(256.0)).cast("long"))
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("bin"))
        .orderBy("lang", "doc_id")
    },

    // tokenizer fertility per language (tokens per character — the
    // standard tokenizer-efficiency metric a multilingual corpus card
    // reports; high fertility = the tokenizer fragments that language and
    // its docs pay more sequence length per content). Exact long sums in
    // one partial-agg pass; fertility is a single IEEE division
    "ta_fertility" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang"),
          size(Text.tokens(col("text"))).cast("long").as("nt"),
          length(col("text")).cast("long").as("nc"))
        .where(col("nc") > 0)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nt")).as("sum_tokens"), sum(col("nc")).as("sum_chars"),
          (sum(col("nt")).cast("double") / sum(col("nc")).cast("double"))
            .as("fertility"))
        .orderBy("lang")
    },

    // hashed-BoW document embedding (the text→vector bridge into the
    // similarity stack): md5-bucketed token counts as a 16-dim sparse
    // vector, L2-normalized. The norm comes from an EXACT integer Σcnt²
    // (int64→double conversion is uniquely defined), so val = cnt/√norm²
    // is one IEEE division both engines compute bit-identically — no
    // float accumulation anywhere. One explode + one (doc, bucket) count;
    // emitted sparse (doc_id, bucket, val), the layout a downstream
    // cosine join consumes directly
    "pipe_hash_embed" -> { (s, dir) =>
      val buckets = Tables.documents(s, dir)
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
        .select(col("doc_id"),
          (conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long") % 16)
            .as("bucket"))
        .groupBy(col("doc_id"), col("bucket"))
        .agg(count(lit(1)).as("cnt"))
      val norms = buckets.groupBy(col("doc_id"))
        .agg(sum(col("cnt") * col("cnt")).as("norm2"))
      buckets.join(norms, "doc_id")
        .select(col("doc_id"), col("bucket"),
          (col("cnt").cast("double") / sqrt(col("norm2").cast("double")))
            .as("val"))
        .orderBy("doc_id", "bucket")
    },

    // padding-waste audit: WHY length-ordered batching matters. Docs are
    // batched 32 at a time under two orders — length-sorted vs an
    // md5-shuffled baseline — and each batch pays max_len·n − Σlen of
    // padding; the report compares the two totals (all-integer, ppm by
    // integer division). Both orders are range-partitioned GlobalRanks;
    // the length sort is exactly the curriculum/bucketing pre-pass a
    // trainer runs, and the delta is the measured GPU-hours argument for
    // it. One corpus scan per strategy, batch rollups are linear
    "pipe_pad_waste" -> { (s, dir) =>
      val nt = size(Text.tokens(col("text")))
      val base = Tables.documents(s, dir)
        .select(col("doc_id"), nt.cast("long").as("n_tokens"))
        .where(col("n_tokens") > 0)
        .localCheckpoint(eager = true)
      def waste(ordered: DataFrame, label: String): DataFrame =
        ordered.withColumn("batch", expr("(rank - 1) DIV 32"))
          .groupBy(col("batch"))
          .agg(count(lit(1)).as("bn"), max(col("n_tokens")).as("mx"),
            sum(col("n_tokens")).as("toks"))
          .agg(count(lit(1)).as("n_batches"),
            sum(col("toks")).as("total_tokens"),
            sum(col("mx") * col("bn") - col("toks")).as("total_pad"))
          .select(lit(label).as("strategy"), col("n_batches"),
            col("total_tokens"),
            col("total_pad"),
            expr("(total_pad * 1000000) DIV (total_pad + total_tokens)")
              .as("pad_ppm"))
      val bySorted = graft.operators.GlobalRank.withGlobalRank(
        base, Seq(col("n_tokens"), col("doc_id")))
      val byShuffle = graft.operators.GlobalRank.withGlobalRank(
        base.withColumn("u", md5(col("doc_id").cast("string"))),
        Seq(col("u"), col("doc_id")))
      waste(bySorted, "length_sorted")
        .unionAll(waste(byShuffle, "shuffled"))
        .orderBy("strategy")
    },

    // fixed-size balanced eval sample: EXACTLY 20 docs per language,
    // chosen by md5(doc_id) order — the deterministic "random" draw
    // (replayable across engines/retries, unlike rand()) that a held-out
    // eval split wants when per-group RATES (pipe_stratified) would give
    // variable counts. The per-lang rank is the range-partitioned grouped
    // rank, never a 5-value window partition
    "pipe_eval_sample" -> { (s, dir) =>
      val u = md5(col("doc_id").cast("string"))
      val base = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), u.as("draw"))
      graft.operators.GlobalRank.withGroupedPrefixSum(
          base, Seq("lang"), Seq(col("draw"), col("doc_id")),
          lit(0L), rankCol = "draw_rank")
        .where(col("draw_rank") <= 20)
        .select(col("lang"), col("draw_rank"), col("doc_id"))
        .orderBy("lang", "draw_rank")
    },

    // packing-efficiency audit (measure the packer, don't trust it):
    // per-language bin-utilization histogram from the same greedy
    // pack_bins construction — bins bucketed by fill decile (bucket 10 =
    // overflow: a boundary doc pushed the bin past capacity, the greedy
    // rule's documented trade). Two bounded aggregations over the per-bin
    // rollup; all-integer arithmetic
    "pipe_pack_stats" -> { (s, dir) =>
      val nt = size(Text.tokens(col("text")))
      val base = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), nt.as("n_tokens"))
      graft.operators.GlobalRank.withGroupedPrefixSum(
          base, Seq("lang"), Seq(col("doc_id")), col("n_tokens"))
        .withColumn("bin", floor(col("grp_prefix") / lit(256.0)).cast("long"))
        .groupBy(col("lang"), col("bin"))
        .agg(sum(col("n_tokens")).as("bin_tokens"))
        .select(col("lang"),
          expr("least((bin_tokens * 10) DIV 256, 10)").as("util_bucket"),
          col("bin_tokens"))
        .groupBy(col("lang"), col("util_bucket"))
        .agg(count(lit(1)).as("n_bins"),
          min(col("bin_tokens")).as("min_tokens"),
          max(col("bin_tokens")).as("max_tokens"))
        .orderBy("lang", "util_bucket")
    },

    // the materialization step of pack_bins: concatenate each bin's docs
    // (doc_id order) into one training-sequence payload. collect_list is
    // shuffle-order-nondeterministic — sort_array over (doc_id, text)
    // structs restores a total order before the join
    "pipe_pack_payload" -> { (s, dir) =>
      val nt = size(Text.tokens(col("text")))
      val base = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("text"), nt.as("n_tokens"))
      graft.operators.GlobalRank.withGroupedPrefixSum(
          base, Seq("lang"), Seq(col("doc_id")), col("n_tokens"))
        .withColumn("bin", floor(col("grp_prefix") / lit(256.0)).cast("long"))
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"),
          array_join(expr(
            "transform(sort_array(collect_list(struct(doc_id, text))), x -> x.text)"),
            " ").as("payload"))
        .orderBy("lang", "bin")
    },

    // temperature-sampled mixture weights (α = 0.5): per-language token
    // mass → sqrt-damped share → sampling rate against a fixed token
    // budget (the domain-mixture reweighting step of a training pipeline).
    // The Σ sqrt(mass) normalizer is read from a lang-ORDERED cumulative
    // sum (its max), pinning the 5-double summation to the same
    // left-to-right fold in both engines — an unordered SUM is free to
    // associate differently and drift an ulp
    "pipe_mixture" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val nt = size(Text.tokens(col("text")))
      val wCum = Window.orderBy("lang")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.orderBy("lang")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(nt).as("sum_tokens"))
        .withColumn("w", sqrt(col("sum_tokens").cast("double")))
        .withColumn("z", max(sum(col("w")).over(wCum)).over(wAll))
        .withColumn("share", col("w") / col("z"))
        .select(col("lang"), col("n_docs"), col("sum_tokens"), col("share"),
          least(lit(100000.0) * col("share") / col("sum_tokens"), lit(1.0)).as("rate"))
        .orderBy("lang")
    },

    // vocab coverage curve for tokenizer sizing: what fraction of the
    // corpus token MASS do the top-k types cover, at k = 4/8/16? The
    // cumulative window runs over the k-row TOP PREFIX (bounded by max k,
    // never the vocabulary), after one linear count shuffle; the totals
    // row is a 1-row broadcast
    "ta_vocab_coverage" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.documents(s, dir)
        .select(explode(Text.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      val total = counts.agg(sum(col("n")).as("total"))
      val top = counts.orderBy(col("n").desc, col("tok")).limit(16)
        .withColumn("k", row_number().over(Window.orderBy(col("n").desc, col("tok"))))
        .withColumn("cum", sum(col("n")).over(Window.orderBy(col("n").desc, col("tok"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      top.where(col("k").isin(4, 8, 16))
        .crossJoin(broadcast(total))
        .select(col("k").cast("long").as("k"), col("cum").as("top_mass"),
          col("total"), (col("cum").cast("double") / col("total")).as("coverage"))
        .orderBy("k")
    },

    // deterministic round-robin interleave across sources — the training
    // ORDER a multi-source run reads: position = within-source rank ×
    // n_sources + source index, so consecutive reads rotate sources. The
    // within-source rank is the range-partitioned grouped rank (GlobalRank
    // helper), never a per-source window — the same de-cliffing as the
    // packing family. The distinct-source collect is a bounded dimension
    // (like a broadcast dim side), folded into a literal CASE at plan time
    "pipe_interleave" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
      val srcIdx = docs.select(col("source")).distinct()
        .orderBy("source").collect().map(_.getString(0)).zipWithIndex.toMap
      val nSrc = srcIdx.size
      val idxCol = srcIdx.foldLeft(lit(-1)) { case (acc, (s0, i)) =>
        when(col("source") === s0, lit(i)).otherwise(acc)
      }
      graft.operators.GlobalRank.withGroupedPrefixSum(
          docs, Seq("source"), Seq(col("doc_id")), lit(1L), rankCol = "rk")
        .select(col("doc_id"), col("source"),
          ((col("rk") - 1) * nSrc + idxCol).cast("long").as("pos"))
        .orderBy("pos")
    },

    // epoch planning for data-constrained training (the Muennighoff et al.
    // 2023 question: how many PASSES over each subset does the target
    // budget imply?): sqrt-weighted shares as pipe_mixture, then
    // epochs = budget·share / available tokens, ceil'd to whole passes,
    // with subsets needing > 4 epochs flagged (where repeating stops
    // helping). Same bounded 5-row post-aggregation window as the mixture
    "pipe_epoch_plan" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val nt = size(Text.tokens(col("text")))
      val wCum = Window.orderBy("lang")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.orderBy("lang")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(nt).as("sum_tokens"))
        .withColumn("w", sqrt(col("sum_tokens").cast("double")))
        .withColumn("z", max(sum(col("w")).over(wCum)).over(wAll))
        .withColumn("share", col("w") / col("z"))
        .withColumn("epochs",
          lit(500000.0) * col("share") / col("sum_tokens"))
        .select(col("lang"), col("n_docs"), col("sum_tokens"), col("share"),
          col("epochs"), ceil(col("epochs")).as("n_passes"),
          (col("epochs") > 4.0).as("data_constrained"))
        .orderBy("lang")
    },

    // benchmark decontamination: train docs sharing any 8-gram with the
    // held-out set (doc_id % 50 = 0 stands in for the benchmark corpus).
    // The benchmark shingle dictionary is tiny relative to the corpus →
    // broadcast; the corpus side is ONE WordNgrams eval + explode per doc,
    // so the whole check is a linear scan + broadcast semi-join at 100 TB
    "pipe_decontam" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      def grams(df: DataFrame) = df.select(col("doc_id"),
        explode(graft.expressions.TextExpressions.wordNgrams(
          col("text"), 8, distinct = true)).as("s"))
      val benchGrams = grams(docs.where(col("doc_id") % 50 === 0))
        .select(col("s")).distinct()
      grams(docs.where(col("doc_id") % 50 =!= 0))
        .join(broadcast(benchGrams), Seq("s"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
        .orderBy("doc_id")
    },

    // Zipf head of the corpus vocabulary: top-50 tokens by occurrence
    // count with their global rank and the rank×freq product (≈constant
    // under Zipf's law — the sanity plot every corpus card carries). One
    // linear token count (vocab-sized output), then the rank via the
    // range-partitioned GlobalRank — vocab ranking stays parallel where a
    // global Window.orderBy would funnel the whole vocabulary through one
    // task. All-integer output, nothing float to drift
    "ta_zipf" -> { (s, dir) =>
      val tf = graft.operators.Dedup
        .shingleRowsAll(Tables.documents(s, dir), "doc_id", "text", 1)
        .groupBy(col("s")).agg(count(lit(1)).as("freq"))
      graft.operators.GlobalRank.withGlobalRank(
          tf, Seq(col("freq").desc, col("s")), rankCol = "rank")
        .where(col("rank") <= 50)
        .select(col("rank"), col("s").as("token"), col("freq"),
          (col("rank") * col("freq")).as("rank_freq"))
        .orderBy("rank")
    },

    // deterministic global training shuffle (the most common corpus op of
    // all): every doc gets a replay-stable uniform position via the
    // md5-of-key order — GlobalRank range-partitions the sort, so the
    // "shuffle" is an ordinary parallel range exchange, never a
    // single-task Window.orderBy (and never rand(), which re-draws per
    // retry/engine). doc_id breaks md5 ties so the order is total
    "pipe_shuffle_order" -> { (s, dir) =>
      graft.operators.GlobalRank.withGlobalRank(
        Tables.documents(s, dir)
          .select(col("doc_id"),
            md5(col("doc_id").cast("string")).as("h")),
        Seq(col("h"), col("doc_id")), rankCol = "pos")
        .select(col("doc_id"), col("pos"))
        .orderBy("pos")
    },

    // per-source exact-duplicate rate (the dataset-card slice a crawl
    // pipeline watches per feed): a doc is "duplicated" when its
    // normalized fingerprint occurs on OTHER docs too. One fingerprint
    // rollup (linear), joined back, one per-source conditional count —
    // the fingerprint is the same single WordNgrams/md5 eval dd_exact
    // keys on, so dup semantics match the dedup pipeline exactly
    "pipe_dup_rate_by_source" -> { (s, dir) =>
      val fp = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          Text.fingerprint(col("text")).as("fp"))
      val occ = fp.groupBy(col("fp")).agg(count(lit(1)).as("n_occ"))
      fp.join(occ, Seq("fp"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_occ") > 1, 1L).otherwise(0L)).as("n_dup_docs"))
        .select(col("source"), col("n_docs"), col("n_dup_docs"),
          (col("n_dup_docs").cast("double") / col("n_docs").cast("double"))
            .as("dup_rate"))
        .orderBy("source")
    },

    // cross-source contamination matrix (pipe_decontam's census twin:
    // WHICH sources leak into which): distinct (source, 8-gram) postings
    // self-joined on the gram, shared-gram counts per source pair. Pair
    // work per gram is bounded by its SOURCE posting count (≤ n_sources,
    // a dim), never documents² — the same postings-join scale argument as
    // dd_ngram_jaccard; one WordNgrams eval per doc feeds everything
    "pipe_contam_matrix" -> { (s, dir) =>
      val sg = Tables.documents(s, dir)
        .select(col("source"), explode(
          graft.expressions.TextExpressions.wordNgrams(
            col("text"), 8, distinct = true)).as("g"))
        .distinct()
      sg.select(col("source").as("source_a"), col("g"))
        .join(sg.select(col("source").as("source_b"), col("g")), Seq("g"))
        .where(col("source_a") < col("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_shared_ngrams"))
        .orderBy("source_a", "source_b")
    },

    // Gopher-style composite quality rules: token-count bounds, mean word
    // length, numeral-token ratio, repetition, stopword floor — each rule
    // a named boolean plus the conjunction, all in one codegen'd pass
    "ta_quality_rules" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), Text.tokenStats(col("text")).as("__ts"))
        .select(col("doc_id"),
          Text.ts(col("__ts"), Text.Ts.NTokens).as("n_tokens"),
          Text.ts(col("__ts"), Text.Ts.TokChars).as("tok_chars"),
          Text.ts(col("__ts"), Text.Ts.NDigit).as("n_digit"),
          Text.ts(col("__ts"), Text.Ts.NDistinct).as("n_distinct"),
          Text.ts(col("__ts"), Text.Ts.Stop).as("n_stop"))
        .select(col("doc_id"), col("n_tokens"),
          when(col("n_tokens") > 0, col("tok_chars").cast("double") / col("n_tokens"))
            .otherwise(0.0).as("mean_wlen"),
          when(col("n_tokens") > 0, col("n_digit").cast("double") / col("n_tokens"))
            .otherwise(0.0).as("digit_ratio"),
          when(col("n_tokens") > 0,
            lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"))
            .otherwise(0.0).as("rep_ratio"),
          col("n_stop"))
        .select(col("doc_id"), col("n_tokens"), col("mean_wlen"),
          col("digit_ratio"), col("rep_ratio"), col("n_stop"),
          (col("n_tokens") >= 50 && col("n_tokens") <= 100000).as("r_len"),
          (col("mean_wlen") >= 3.0 && col("mean_wlen") <= 10.0).as("r_wlen"),
          (col("digit_ratio") < 0.2).as("r_digit"),
          (col("rep_ratio") < 0.3).as("r_rep"),
          (col("n_stop") >= 2).as("r_stop"))
        .withColumn("pass", col("r_len") && col("r_wlen") && col("r_digit") &&
          col("r_rep") && col("r_stop"))
        .orderBy("doc_id")
    },

    "pipe_train_shard" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val nt = size(Text.tokens(col("text")))
      val filtered = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("text"), nt.as("n_tokens"))
        .where(col("n_tokens") >= 30)
      val w = Window.partitionBy(Text.fingerprint(col("text"))).orderBy(col("doc_id"))
      val deduped = filtered.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
      val h = md5(col("doc_id").cast("string"))
      deduped
        .where(substring(h, 1, 1).isin("0", "1", "2", "3", "4", "5", "6", "7"))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          (ascii(substring(h, 2, 1)) % 4).as("shard"))
        .orderBy("doc_id")
    }
  )

  // DuckDB twin of Text.tokens: split on single spaces, drop empties.
  private[queries] val toksSql = "list_filter(string_split(text, ' '), t -> t != '')"

  /** One BPE training round for the pipe_bpe_train oracle: vocab pair
    * count, best pair (ties lexicographic), double-replace application.
    */
  private def bpeRoundSql(i: Int, prev: String,
                          carryTok: Boolean = false): String = {
    val tokCol = if (carryTok) "tok, " else ""
    s"""p$i AS (SELECT s.a, s.b, SUM(c)::BIGINT AS freq FROM (
       |  SELECT c, unnest([{'a': syms[j], 'b': syms[j + 1]}
       |    for j in generate_series(1, len(syms) - 1)]) AS s
       |  FROM (SELECT c, list_filter(string_split(seq, '|'), x -> x != '') AS syms
       |        FROM $prev) WHERE len(syms) >= 2)
       |  GROUP BY s.a, s.b),
       |best$i AS (SELECT a, b, freq FROM p$i ORDER BY freq DESC, a, b LIMIT 1),
       |w$i AS (SELECT ${tokCol}replace(replace(seq,
       |    '|' || best$i.a || '|' || best$i.b || '|',
       |    '|' || best$i.a || best$i.b || '|'),
       |    '|' || best$i.a || '|' || best$i.b || '|',
       |    '|' || best$i.a || best$i.b || '|') AS seq, c
       |  FROM $prev CROSS JOIN best$i)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "pipe_rlhf_pairs" ->
      """WITH d AS (SELECT doc_id % 40 AS prompt_id, doc_id, n_chars
        |  FROM documents),
        |r AS (SELECT prompt_id, doc_id, n_chars,
        |  ROW_NUMBER() OVER (PARTITION BY prompt_id
        |    ORDER BY n_chars DESC, doc_id) AS r_best,
        |  ROW_NUMBER() OVER (PARTITION BY prompt_id
        |    ORDER BY n_chars ASC, doc_id) AS r_worst
        | FROM d),
        |c AS (SELECT prompt_id, doc_id AS chosen_id, n_chars AS cs
        |  FROM r WHERE r_best = 1),
        |j AS (SELECT prompt_id, doc_id AS rejected_id, n_chars AS rs
        |  FROM r WHERE r_worst = 1)
        |SELECT c.prompt_id, chosen_id, rejected_id,
        |  (cs - rs)::BIGINT AS margin
        |FROM c JOIN j ON c.prompt_id = j.prompt_id
        |WHERE cs - rs > 0 ORDER BY c.prompt_id""".stripMargin,

    "pipe_url_dedup" ->
      """WITH raw AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 3 = 0 THEN 'http://WWW.' ELSE 'https://' END)
        |   || source || '.Example.com/page/' || CAST(doc_id % 50 AS VARCHAR)
        |   || (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END)
        |   || '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR) AS url
        | FROM documents),
        |canon AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    lower(url), '^https?://', ''), '^www\.', ''),
        |    '[?#].*$', ''), '/+$', '') AS canon_url
        | FROM raw)
        |SELECT canon_url, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM canon GROUP BY canon_url ORDER BY canon_url""".stripMargin,

    "ta_keywords" ->
      s"""WITH pos AS (
         |  SELECT doc_id, s.p AS pos, s.tok,
         |    s.tok IN ('the','a','of','and','to','in','is','it') AS stop
         |  FROM (SELECT doc_id, unnest([{'p': i, 'tok': tk[i]}
         |          for i in generate_series(1, len(tk))]) AS s
         |        FROM (SELECT doc_id, $toksSql AS tk FROM documents)) ),
         |runs AS (
         |  SELECT doc_id, pos, tok,
         |    SUM(CASE WHEN stop THEN 1 ELSE 0 END) OVER (
         |      PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id,
         |    stop
         |  FROM pos),
         |members AS (SELECT doc_id, run_id, pos, tok FROM runs WHERE NOT stop),
         |phr AS (
         |  SELECT doc_id, run_id, COUNT(*) AS len,
         |    array_to_string(list(tok ORDER BY pos), ' ') AS phrase
         |  FROM members GROUP BY doc_id, run_id
         |  HAVING COUNT(*) BETWEEN 1 AND 4),
         |pw AS (SELECT m.doc_id, m.run_id, m.pos, m.tok, p.len, p.phrase
         |  FROM members m JOIN phr p
         |  ON m.doc_id = p.doc_id AND m.run_id = p.run_id),
         |ws AS (SELECT tok, SUM(len)::DOUBLE / COUNT(*) AS score
         |  FROM pw GROUP BY tok),
         |ps AS (
         |  SELECT pw.phrase, pw.doc_id, pw.run_id,
         |    list_reduce(list_prepend(0.0::DOUBLE,
         |      list(ws.score ORDER BY pw.pos)), (x, y) -> x + y) AS pscore
         |  FROM pw JOIN ws ON pw.tok = ws.tok
         |  GROUP BY pw.phrase, pw.doc_id, pw.run_id),
         |agg AS (SELECT phrase, COUNT(*)::BIGINT AS n_occ, MIN(pscore) AS score
         |  FROM ps GROUP BY phrase),
         |r AS (SELECT phrase, n_occ, score,
         |  ROW_NUMBER() OVER (ORDER BY score DESC, phrase) AS rank FROM agg)
         |SELECT phrase, n_occ, score, rank FROM r WHERE rank <= 15
         |ORDER BY rank""".stripMargin,

    "pipe_bpe_apply" ->
      s"""WITH wc AS (SELECT tok, COUNT(*)::BIGINT AS c FROM (
         |  SELECT unnest($toksSql) AS tok FROM documents) GROUP BY tok),
         |w0 AS (SELECT tok, '|' || array_to_string(
         |  [tok[i] for i in generate_series(1, len(tok))], '|') || '|' AS seq, c
         | FROM wc),
         |${bpeRoundSql(1, "w0", carryTok = true)},
         |${bpeRoundSql(2, "w1", carryTok = true)},
         |${bpeRoundSql(3, "w2", carryTok = true)}
         |SELECT tok, c AS n_occ,
         |  array_to_string(list_filter(string_split(seq, '|'), x -> x != ''), ' ')
         |    AS segmentation,
         |  len(list_filter(string_split(seq, '|'), x -> x != ''))::BIGINT
         |    AS n_symbols
         |FROM w3 ORDER BY tok""".stripMargin,

    "pipe_bpe_train" ->
      s"""WITH wc AS (SELECT tok, COUNT(*)::BIGINT AS c FROM (
         |  SELECT unnest($toksSql) AS tok FROM documents) GROUP BY tok),
         |w0 AS (SELECT '|' || array_to_string(
         |  [tok[i] for i in generate_series(1, len(tok))], '|') || '|' AS seq, c
         | FROM wc),
         |${bpeRoundSql(1, "w0")},
         |${bpeRoundSql(2, "w1")},
         |${bpeRoundSql(3, "w2")}
         |SELECT 1 AS round, a, b, a || b AS merged, freq FROM best1
         |UNION ALL SELECT 2, a, b, a || b, freq FROM best2
         |UNION ALL SELECT 3, a, b, a || b, freq FROM best3
         |ORDER BY round""".stripMargin,

    "ta_bm25" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |dl AS (SELECT doc_id, len(tk) AS dl FROM t),
         |st AS (SELECT COUNT(*) AS n_docs, SUM(dl)::DOUBLE / COUNT(*) AS avgdl FROM dl),
         |qt(query_id, term) AS (VALUES (1,'fast'),(1,'scan'),(2,'merge'),(2,'join'),
         |  (2,'sort'),(3,'stream'),(3,'window'),(3,'dup')),
         |post AS (SELECT doc_id, term, COUNT(*) AS tf
         |  FROM (SELECT doc_id, unnest(tk) AS term FROM t)
         |  WHERE term IN (SELECT term FROM qt) GROUP BY doc_id, term),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM post GROUP BY term),
         |contrib AS (
         |  SELECT qt.query_id, p.doc_id, p.term,
         |    (st.n_docs - d.df + 0.5::DOUBLE) / (d.df + 0.5::DOUBLE)
         |      * (p.tf * 2.5::DOUBLE)
         |      / (p.tf + 1.5::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * dl.dl / st.avgdl)) AS c
         |  FROM post p JOIN qt ON p.term = qt.term JOIN dfreq d ON p.term = d.term
         |  JOIN dl ON p.doc_id = dl.doc_id CROSS JOIN st),
         |sc AS (SELECT query_id, doc_id, COUNT(*)::BIGINT AS n_hit,
         |  list_reduce(list_prepend(0.0::DOUBLE, list(c ORDER BY term)), (x, y) -> x + y) AS score
         |  FROM contrib GROUP BY query_id, doc_id),
         |r AS (SELECT query_id, doc_id, n_hit, score,
         |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank FROM sc)
         |SELECT query_id, doc_id, n_hit, score, rank FROM r WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin,

    "ta_phrase_search" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |g2 AS (SELECT doc_id, unnest([{'pos': i - 1,
         |    'ph': array_to_string(list_slice(tk, i, i + 1), ' ')}
         |    for i in generate_series(1, len(tk) - 1)]) AS s
         |  FROM t WHERE len(tk) >= 2),
         |g3 AS (SELECT doc_id, unnest([{'pos': i - 1,
         |    'ph': array_to_string(list_slice(tk, i, i + 2), ' ')}
         |    for i in generate_series(1, len(tk) - 2)]) AS s
         |  FROM t WHERE len(tk) >= 3),
         |hits AS (
         |  SELECT doc_id, s.pos AS pos, s.ph AS phrase FROM g2
         |  WHERE s.ph IN ('merge join', 'batch batch')
         |  UNION ALL
         |  SELECT doc_id, s.pos, s.ph FROM g3 WHERE s.ph IN ('key order sort'))
         |SELECT phrase, doc_id, COUNT(*)::BIGINT AS n_occ, MIN(pos)::BIGINT AS first_pos
         |FROM hits GROUP BY phrase, doc_id ORDER BY phrase, doc_id""".stripMargin,

    "ta_tokens" ->
      s"""SELECT doc_id, len($toksSql) AS n_ws_tokens,
         | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_bpeish_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,

    "ta_diversity" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS t
         |             FROM documents WHERE len($toksSql) > 0),
         |c AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t),
         |a AS (SELECT doc_id, SUM(c)::BIGINT AS n, COUNT(*) AS n_types,
         |        SUM(c * c)::BIGINT AS s2
         |      FROM c GROUP BY doc_id)
         |SELECT doc_id, n AS n_tokens, n_types,
         |  n_types::DOUBLE / n::DOUBLE AS ttr,
         |  1.0 - s2::DOUBLE / (n * n)::DOUBLE AS gini_simpson
         |FROM a ORDER BY doc_id""".stripMargin,

    "pipe_bpe_step" ->
      s"""WITH w AS (SELECT unnest($toksSql) AS tok FROM documents),
         |wc AS (SELECT tok, COUNT(*) AS c FROM w GROUP BY tok),
         |p AS (SELECT unnest([substring(tok, i, 2)
         |        for i in generate_series(1, length(tok) - 1)]) AS pair, c
         |      FROM wc WHERE length(tok) >= 2)
         |SELECT pair, SUM(c)::BIGINT AS freq FROM p GROUP BY pair
         |ORDER BY freq DESC, pair LIMIT 20""".stripMargin,

    // the window form here is the ORACLE ONLY — the engine side range-
    // partitions (see the query's comment); cum/pre are HUGEINT-cast per
    // the §6 rule
    "pipe_token_budget" ->
      s"""WITH tok AS (SELECT doc_id, lang, unnest($toksSql) AS t
         |             FROM documents WHERE len($toksSql) > 0),
         |c AS (SELECT doc_id, lang, t, COUNT(*) AS c FROM tok GROUP BY doc_id, lang, t),
         |a AS (SELECT doc_id, lang, SUM(c)::BIGINT AS n_tokens, COUNT(*) AS n_types
         |      FROM c GROUP BY doc_id, lang),
         |p AS (SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
         |        ORDER BY n_types DESC, doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
         |      FROM a)
         |SELECT lang, doc_id, n_types, n_tokens,
         | (pre + n_tokens)::BIGINT AS cum_tokens
         |FROM p WHERE pre < 2000 ORDER BY lang, n_types DESC, doc_id""".stripMargin,

    "pipe_quality_tiers" ->
      s"""WITH tok AS (SELECT doc_id, lang, unnest($toksSql) AS t
         |             FROM documents WHERE len($toksSql) > 0),
         |c AS (SELECT doc_id, lang, t FROM tok GROUP BY doc_id, lang, t),
         |a AS (SELECT doc_id, lang, COUNT(*) AS n_types
         |      FROM c GROUP BY doc_id, lang),
         |r AS (SELECT doc_id, lang, n_types,
         |  ROW_NUMBER() OVER (PARTITION BY lang
         |    ORDER BY n_types DESC, doc_id) AS lang_rank,
         |  COUNT(*) OVER (PARTITION BY lang) AS n_lang FROM a)
         |SELECT doc_id, lang, n_types, lang_rank,
         | CASE (3 * (lang_rank - 1)) // n_lang WHEN 0 THEN 'head'
         |   WHEN 1 THEN 'middle' ELSE 'tail' END AS tier
         |FROM r ORDER BY lang, lang_rank""".stripMargin,

    "pipe_domain_cap" ->
      s"""WITH t AS (SELECT doc_id, source, len($toksSql) AS n_tokens,
         |  (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE / length(text) AS punct_ratio,
         |  len(list_filter($toksSql, t -> t IN ('the','a','of','and','to','in','is','it')))::DOUBLE
         |    / len($toksSql) AS stop_ratio
         | FROM documents),
         |q AS (SELECT doc_id, source,
         |  least(n_tokens / 100.0, 1.0) * (1.0 - punct_ratio) * (0.5 + 0.5 * stop_ratio) AS quality
         | FROM t),
         |r AS (SELECT doc_id, source, quality,
         |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS src_rank
         | FROM q)
         |SELECT doc_id, source, quality, src_rank FROM r WHERE src_rank <= 20
         |ORDER BY source, src_rank""".stripMargin,

    "ta_quality" ->
      s"""WITH t AS (SELECT doc_id, len($toksSql) AS n_tokens,
         |  length(text) AS n_chars,
         |  (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE / length(text) AS punct_ratio,
         |  len(list_filter($toksSql, t -> t IN ('the','a','of','and','to','in','is','it')))::DOUBLE
         |    / len($toksSql) AS stop_ratio
         | FROM documents)
         |SELECT doc_id, n_tokens, punct_ratio, stop_ratio,
         | least(n_tokens / 100.0, 1.0) * (1.0 - punct_ratio) * (0.5 + 0.5 * stop_ratio) AS quality
         |FROM t ORDER BY doc_id""".stripMargin,

    "ta_langid" ->
      s"""WITH t AS (SELECT doc_id,
         |  len(list_filter($toksSql, t -> t IN ('the','a','is','of','and'))) AS s_en,
         |  len(list_filter($toksSql, t -> t IN ('el','la','de','es','y'))) AS s_es,
         |  len(list_filter($toksSql, t -> t IN ('der','die','das','und','ist'))) AS s_de,
         |  len(list_filter($toksSql, t -> t IN ('le','la','de','et','est'))) AS s_fr,
         |  len(list_filter($toksSql, t -> t IN ('的','是','了'))) AS s_zh
         | FROM documents)
         |SELECT doc_id, s_en, s_es, s_de, s_fr, s_zh,
         | CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |      WHEN s_es >= s_en AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |      WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |      WHEN s_fr >= s_en AND s_fr >= s_es AND s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
         |      ELSE 'zh' END AS lang_pred
         |FROM t ORDER BY doc_id""".stripMargin,

    "ta_lang_confusion" ->
      s"""WITH t AS (SELECT lang,
         |  len(list_filter($toksSql, t -> t IN ('the','a','is','of','and'))) AS s_en,
         |  len(list_filter($toksSql, t -> t IN ('el','la','de','es','y'))) AS s_es,
         |  len(list_filter($toksSql, t -> t IN ('der','die','das','und','ist'))) AS s_de,
         |  len(list_filter($toksSql, t -> t IN ('le','la','de','et','est'))) AS s_fr,
         |  len(list_filter($toksSql, t -> t IN ('的','是','了'))) AS s_zh
         | FROM documents),
         |p AS (SELECT lang,
         | CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |      WHEN s_es >= s_en AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |      WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |      WHEN s_fr >= s_en AND s_fr >= s_es AND s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
         |      ELSE 'zh' END AS lang_pred
         |FROM t)
         |SELECT lang, lang_pred, COUNT(*) AS n FROM p
         |GROUP BY lang, lang_pred ORDER BY lang, lang_pred""".stripMargin,

    "ta_fingerprint" ->
      s"""SELECT doc_id, md5(array_to_string(
         |  list_filter(string_split(lower(text), ' '), t -> t != ''), ' ')) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    "ta_stats" ->
      s"""WITH t AS (SELECT lang, n_chars, len($toksSql) AS nt FROM documents)
         |SELECT lang, COUNT(*) AS n_docs, MIN(n_chars) AS min_chars,
         | MAX(n_chars) AS max_chars,
         | CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
         | quantile_cont(nt, 0.5) AS p50_tokens, quantile_cont(nt, 0.9) AS p90_tokens
         |FROM t GROUP BY lang ORDER BY lang""".stripMargin,

    "ta_wordcount" ->
      s"""SELECT token, COUNT(*) AS n FROM (
         |  SELECT unnest($toksSql) AS token FROM documents)
         |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,

    "ta_vocab_oov" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS token FROM documents),
         |v AS (SELECT token FROM toks GROUP BY token
         |      ORDER BY COUNT(*) DESC, token LIMIT 16)
         |SELECT doc_id, COUNT(*) AS n_tokens,
         | SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
         | SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::DOUBLE / COUNT(*) AS oov_rate
         |FROM toks LEFT JOIN v ON toks.token = v.token
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "pipe_tokenize_ids" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS t FROM documents),
         |pt AS (SELECT doc_id,
         |  unnest([{'pos': i, 'tok': t[i]} for i in generate_series(1, len(t))]) AS s
         |  FROM tk),
         |toks AS (SELECT doc_id, s.pos AS pos, s.tok AS token FROM pt),
         |v AS (SELECT token,
         |  (ROW_NUMBER() OVER (ORDER BY n DESC, token) - 1)::INT AS token_id
         |  FROM (SELECT token, COUNT(*) AS n FROM toks GROUP BY token
         |        ORDER BY n DESC, token LIMIT 16))
         |SELECT toks.doc_id, toks.pos, COALESCE(v.token_id, -1) AS token_id
         |FROM toks LEFT JOIN v ON toks.token = v.token
         |ORDER BY doc_id, pos""".stripMargin,

    "pipe_dataset_card" ->
      s"""WITH t AS (SELECT lang, source, len($toksSql) AS nt, md5(text) AS fp
         |  FROM documents)
         |SELECT lang, source, COUNT(*) AS n_docs,
         | SUM(nt)::BIGINT AS sum_tokens, MIN(nt) AS min_tokens, MAX(nt) AS max_tokens,
         | COUNT(DISTINCT fp) AS n_unique,
         | COUNT(*) - COUNT(DISTINCT fp) AS n_dup_docs
         |FROM t GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "pipe_corpus_clean" ->
      s"""WITH q AS (SELECT doc_id, text, len($toksSql) AS n_tokens,
         |  (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE / length(text) AS punct_ratio,
         |  len(list_filter($toksSql, t -> t IN ('the','a','of','and','to','in','is','it')))::DOUBLE
         |    / len($toksSql) AS stop_ratio,
         |  len(list_filter($toksSql, t -> t IN ('the','a','is','of','and'))) AS s_en,
         |  len(list_filter($toksSql, t -> t IN ('el','la','de','es','y'))) AS s_es,
         |  len(list_filter($toksSql, t -> t IN ('der','die','das','und','ist'))) AS s_de,
         |  len(list_filter($toksSql, t -> t IN ('le','la','de','et','est'))) AS s_fr,
         |  len(list_filter($toksSql, t -> t IN ('的','是','了'))) AS s_zh
         | FROM documents),
         |s AS (SELECT doc_id, text, n_tokens,
         |  least(n_tokens / 100.0, 1.0) * (1.0 - punct_ratio) * (0.5 + 0.5 * stop_ratio) AS quality,
         |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |       WHEN s_es >= s_en AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |       WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |       WHEN s_fr >= s_en AND s_fr >= s_es AND s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
         |       ELSE 'zh' END AS lang_pred
         | FROM q),
         |f AS (SELECT * FROM s
         |      WHERE n_tokens >= 30 AND lang_pred = 'en' AND quality > 0),
         |k AS (SELECT doc_id, n_tokens, quality FROM f
         |      QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(array_to_string(
         |        list_filter(string_split(lower(text), ' '), t -> t != ''), ' '))
         |        ORDER BY doc_id) = 1)
         |SELECT doc_id, n_tokens, quality FROM k ORDER BY doc_id""".stripMargin,

    "ta_bigrams" ->
      s"""WITH b AS (
         |  SELECT [array_to_string(list_slice(t, i, i + 1), ' ')
         |          for i in generate_series(1, len(t) - 1)] AS bg
         |  FROM (SELECT $toksSql AS t FROM documents) WHERE len(t) >= 2)
         |SELECT unnested.bigram, COUNT(*) AS n
         |FROM (SELECT unnest(bg) AS bigram FROM b) unnested
         |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 10""".stripMargin,

    "pipe_hash_features" ->
      s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS token FROM documents)
         |SELECT doc_id,
         | ('0x' || substring(md5(token), 1, 15))::BIGINT % 16 AS bucket,
         | COUNT(*) AS cnt
         |FROM t GROUP BY doc_id, bucket ORDER BY doc_id, bucket""".stripMargin,

    "ta_pmi_lift" ->
      s"""WITH t AS (SELECT unnest($toksSql) AS token FROM documents),
         |uni AS (SELECT token, COUNT(*) AS c FROM t GROUP BY token),
         |n AS (SELECT COUNT(*) AS n_tokens FROM t),
         |b AS (
         |  SELECT [array_to_string(list_slice(tk, i, i + 1), ' ')
         |          for i in generate_series(1, len(tk) - 1)] AS bg
         |  FROM (SELECT $toksSql AS tk FROM documents) WHERE len(tk) >= 2),
         |bgc AS (
         |  SELECT string_split(bigram, ' ')[1] AS w1,
         |    string_split(bigram, ' ')[2] AS w2, COUNT(*) AS c12
         |  FROM (SELECT unnest(bg) AS bigram FROM b) GROUP BY w1, w2),
         |bt AS (SELECT CAST(SUM(c12) AS BIGINT) AS n_bigrams FROM bgc),
         |sel AS (
         |  SELECT g.w1, g.w2, g.c12,
         |    g.c12 * n.n_tokens * n.n_tokens AS num,
         |    bt.n_bigrams * u1.c * u2.c AS den
         |  FROM bgc g JOIN uni u1 ON u1.token = g.w1
         |    JOIN uni u2 ON u2.token = g.w2
         |    CROSS JOIN n CROSS JOIN bt)
         |SELECT w1, w2, c12, num, den, num::DOUBLE / den::DOUBLE AS lift
         |FROM sel ORDER BY lift DESC, w1, w2 LIMIT 20""".stripMargin,

    "ta_tfidf" ->
      s"""WITH tf AS (
         |  SELECT doc_id, term, COUNT(*) AS tf FROM (
         |    SELECT doc_id, unnest($toksSql) AS term FROM documents)
         |  GROUP BY doc_id, term),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         |total AS (SELECT COUNT(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT doc_id, tf.term, tf, df, tf * (n_docs::DOUBLE / df) AS tfidf
         |  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN total),
         |ranked AS (
         |  SELECT doc_id, term, tf, df, tfidf,
         |   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
         |  FROM scored)
         |SELECT doc_id, term, tf, df, tfidf, rank FROM ranked WHERE rank <= 3
         |ORDER BY doc_id, rank""".stripMargin,

    "ta_repetition" ->
      s"""SELECT doc_id, len($toksSql) AS n_tokens,
         | len(list_distinct($toksSql)) AS n_distinct,
         | CASE WHEN len($toksSql) > 0
         |  THEN 1.0 - CAST(len(list_distinct($toksSql)) AS DOUBLE) / len($toksSql)
         |  ELSE 0.0 END AS rep_ratio
         |FROM documents ORDER BY doc_id""".stripMargin,

    "ta_length_buckets" ->
      s"""SELECT CAST(FLOOR(len($toksSql) / 32) AS BIGINT) AS bucket,
         | COUNT(*) AS n_docs,
         | CAST(SUM(len($toksSql)) AS BIGINT) AS sum_tokens,
         | MIN(len($toksSql)) AS min_tokens, MAX(len($toksSql)) AS max_tokens
         |FROM documents GROUP BY bucket ORDER BY bucket""".stripMargin,

    "pipe_corpus_e2e" ->
      s"""WITH RECURSIVE q AS (SELECT doc_id, source, text, len($toksSql) AS n_tokens,
         |  (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE / length(text) AS punct_ratio,
         |  len(list_filter($toksSql, t -> t IN ('the','a','of','and','to','in','is','it')))::DOUBLE
         |    / len($toksSql) AS stop_ratio,
         |  len(list_filter($toksSql, t -> t IN ('the','a','is','of','and'))) AS s_en,
         |  len(list_filter($toksSql, t -> t IN ('el','la','de','es','y'))) AS s_es,
         |  len(list_filter($toksSql, t -> t IN ('der','die','das','und','ist'))) AS s_de,
         |  len(list_filter($toksSql, t -> t IN ('le','la','de','et','est'))) AS s_fr,
         |  len(list_filter($toksSql, t -> t IN ('的','是','了'))) AS s_zh
         | FROM documents),
         |sq AS (SELECT doc_id, source, text, n_tokens,
         |  least(n_tokens / 100.0, 1.0) * (1.0 - punct_ratio) * (0.5 + 0.5 * stop_ratio) AS quality,
         |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |       WHEN s_es >= s_en AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |       WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |       WHEN s_fr >= s_en AND s_fr >= s_es AND s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
         |       ELSE 'zh' END AS lang_pred
         | FROM q),
         |f AS (SELECT * FROM sq
         |      WHERE n_tokens >= 30 AND lang_pred = 'en' AND quality > 0),
         |k AS (SELECT doc_id, source, text, n_tokens FROM f
         |      QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(array_to_string(
         |        list_filter(string_split(lower(text), ' '), t -> t != ''), ' '))
         |        ORDER BY doc_id) = 1),
         |sh AS (SELECT doc_id, source,
         |  list_distinct(CASE WHEN len($toksSql) >= 3
         |    THEN [array_to_string(list_slice($toksSql, i + 1, i + 3), ' ')
         |          for i in generate_series(0, len($toksSql) - 3)]
         |    ELSE [] END) AS sh
         | FROM k),
         |shn AS (SELECT * FROM sh WHERE len(sh) > 0),
         |pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM shn a JOIN shn b ON a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
         |     / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.3),
         |edges AS (SELECT a_id AS u, b_id AS v FROM pairs
         |          UNION SELECT b_id, a_id FROM pairs),
         |nodes AS (SELECT DISTINCT u AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT reach.id, e.v FROM reach JOIN edges e ON reach.r = e.u),
         |labels AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
         |dropped AS (SELECT id FROM labels WHERE id != cluster_id),
         |surv AS (SELECT doc_id, n_tokens FROM k
         |         WHERE doc_id NOT IN (SELECT id FROM dropped)),
         |p AS (SELECT doc_id, n_tokens,
         |  COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
         | FROM surv)
         |SELECT doc_id, n_tokens::BIGINT AS n_tokens,
         | FLOOR(prefix / 256.0)::BIGINT AS bin
         |FROM p ORDER BY doc_id""".stripMargin,

    "pipe_para_dedup" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS l, len($toksSql) AS nt
         |           FROM documents WHERE len($toksSql) > 0),
         |c AS (SELECT doc_id, unnest(generate_series(0, ((nt - 1) // 32)::BIGINT)) AS seg_idx, l
         |      FROM t),
         |segs AS (SELECT doc_id, seg_idx,
         |  array_to_string(list_slice(l, (seg_idx * 32 + 1)::INT, (seg_idx * 32 + 32)::INT), ' ') AS seg_text
         | FROM c),
         |kept AS (SELECT doc_id, seg_idx, seg_text FROM segs
         | QUALIFY ROW_NUMBER() OVER (PARTITION BY seg_text ORDER BY doc_id, seg_idx) = 1),
         |tot AS (SELECT doc_id, COUNT(*) AS n_segs FROM segs GROUP BY doc_id),
         |ka AS (SELECT doc_id, COUNT(*) AS n_kept,
         |  md5(string_agg(seg_text, ' ' ORDER BY seg_idx)) AS kept_md5
         | FROM kept GROUP BY doc_id)
         |SELECT tot.doc_id, tot.n_segs, COALESCE(ka.n_kept, 0)::BIGINT AS n_kept, ka.kept_md5
         |FROM tot LEFT JOIN ka ON tot.doc_id = ka.doc_id
         |ORDER BY tot.doc_id""".stripMargin,

    "ta_chunk" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS l, len($toksSql) AS nt
         |           FROM documents WHERE len($toksSql) > 0),
         |c AS (SELECT doc_id, nt, unnest(generate_series(0, ((nt - 1) // 48)::BIGINT)) AS chunk_idx
         |      FROM t),
         |j AS (SELECT c.doc_id, c.chunk_idx,
         |  array_to_string(list_slice(t.l, (c.chunk_idx * 48 + 1)::INT,
         |                             (c.chunk_idx * 48 + 64)::INT), ' ') AS chunk_text,
         |  least(c.nt - c.chunk_idx * 48, 64) AS chunk_tokens
         | FROM c JOIN t ON c.doc_id = t.doc_id)
         |SELECT doc_id, chunk_idx, chunk_text, chunk_tokens FROM j
         |ORDER BY doc_id, chunk_idx""".stripMargin,

    "ta_dedup_tokens" ->
      s"""SELECT doc_id,
         | array_to_string([l[i] FOR i IN generate_series(1, len(l))
         |                  IF list_position(l, l[i]) = i], ' ') AS deduped_text,
         | len([l[i] FOR i IN generate_series(1, len(l))
         |      IF list_position(l, l[i]) = i]) AS n_kept
         |FROM (SELECT doc_id, $toksSql AS l FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "pipe_sample_weighted" ->
      s"""SELECT doc_id, len($toksSql) AS n_tokens,
         | least(len($toksSql) / 200.0, 1.0) AS w
         |FROM documents
         |WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT
         |      / 65536.0 < least(len($toksSql) / 200.0, 1.0)
         |ORDER BY doc_id""".stripMargin,

    "pipe_stratified" ->
      """SELECT doc_id, lang,
        | CAST(CASE WHEN lang = 'en' THEN 0.5 WHEN lang = 'zh' THEN 0.25
        |           ELSE 1.0 END AS DOUBLE) AS rate
        |FROM documents
        |WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT
        |      / 65536.0 < CASE WHEN lang = 'en' THEN 0.5
        |                       WHEN lang = 'zh' THEN 0.25 ELSE 1.0 END
        |ORDER BY doc_id""".stripMargin,

    "ta_ngram_lm" ->
      s"""WITH uni AS (
         |  SELECT unnest($toksSql) AS w1 FROM documents),
         |uc AS (SELECT w1, COUNT(*) AS c1 FROM uni GROUP BY w1),
         |b AS (
         |  SELECT [array_to_string(list_slice(t, i, i + 1), ' ')
         |          for i in generate_series(1, len(t) - 1)] AS bg
         |  FROM (SELECT $toksSql AS t FROM documents) WHERE len(t) >= 2),
         |bc AS (SELECT bigram, COUNT(*) AS c12
         |  FROM (SELECT unnest(bg) AS bigram FROM b) GROUP BY bigram)
         |SELECT bigram, c12, c1, c12::DOUBLE / c1 AS p_cond
         |FROM bc JOIN uc ON string_split(bigram, ' ')[1] = uc.w1
         |ORDER BY c12 DESC, bigram LIMIT 20""".stripMargin,

    // same LM as ta_ngram_lm, scored per document; the fold order is
    // pinned to bigram position in both engines (list(... ORDER BY pos)
    // here, array_sort of (pos, pc) structs in Spark)
    "pipe_lm_score" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS t FROM documents),
         |bg AS (SELECT doc_id,
         |  unnest([{'pos': i, 'bg': array_to_string(list_slice(t, i, i + 1), ' ')}
         |          for i in generate_series(1, len(t) - 1)]) AS s
         |  FROM tk WHERE len(t) >= 2),
         |db AS (SELECT doc_id, s.pos AS pos, s.bg AS bigram FROM bg),
         |uc AS (SELECT w1, COUNT(*) AS c1
         |  FROM (SELECT unnest(t) AS w1 FROM tk) GROUP BY w1),
         |bc AS (SELECT bigram, COUNT(*) AS c12 FROM db GROUP BY bigram),
         |lm AS (SELECT bc.bigram, bc.c12::DOUBLE / uc.c1 AS pc
         |  FROM bc JOIN uc ON string_split(bc.bigram, ' ')[1] = uc.w1),
         |p AS (SELECT db.doc_id, db.pos, lm.pc FROM db JOIN lm USING (bigram)),
         |f AS (SELECT doc_id, COUNT(*) AS n_bigrams,
         |  list_reduce(list_prepend(0.0, list(pc ORDER BY pos)), (x, y) -> x + y) AS sum_p,
         |  MIN(pc) AS min_p
         | FROM p GROUP BY doc_id)
         |SELECT doc_id, n_bigrams, sum_p, sum_p / n_bigrams AS mean_p, min_p
         |FROM f ORDER BY doc_id""".stripMargin,

    "pipe_mixture_temp" ->
      """WITH per AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
        |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM per),
        |raw AS (SELECT source, n_docs,
        |  n_docs::DOUBLE / n_total::DOUBLE AS share,
        |  sqrt(n_docs::DOUBLE / n_total::DOUBLE) AS w_raw
        | FROM per CROSS JOIN t),
        |w AS (SELECT list_reduce(list_prepend(0.0, list(w_raw ORDER BY source)),
        |  (a, b) -> a + b) AS w_sum FROM raw)
        |SELECT source, n_docs, share, w_raw / w_sum AS weight,
        | FLOOR(w_raw / w_sum * 100000)::BIGINT AS per_100k
        |FROM raw CROSS JOIN w ORDER BY source""".stripMargin,

    "pipe_clean_funnel" ->
      s"""WITH q AS (SELECT doc_id, text, len($toksSql) AS n_tokens,
         |  (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE / length(text) AS punct_ratio,
         |  len(list_filter($toksSql, t -> t IN ('the','a','of','and','to','in','is','it')))::DOUBLE
         |    / len($toksSql) AS stop_ratio,
         |  len(list_filter($toksSql, t -> t IN ('the','a','is','of','and'))) AS s_en,
         |  len(list_filter($toksSql, t -> t IN ('el','la','de','es','y'))) AS s_es,
         |  len(list_filter($toksSql, t -> t IN ('der','die','das','und','ist'))) AS s_de,
         |  len(list_filter($toksSql, t -> t IN ('le','la','de','et','est'))) AS s_fr,
         |  len(list_filter($toksSql, t -> t IN ('的','是','了'))) AS s_zh
         | FROM documents),
         |s AS (SELECT doc_id, text, n_tokens,
         |  least(n_tokens / 100.0, 1.0) * (1.0 - punct_ratio) * (0.5 + 0.5 * stop_ratio) AS quality,
         |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |       WHEN s_es >= s_en AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |       WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |       WHEN s_fr >= s_en AND s_fr >= s_es AND s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
         |       ELSE 'zh' END AS lang_pred
         | FROM q),
         |b AS (SELECT doc_id,
         |  md5(array_to_string(list_filter(string_split(lower(text), ' '), t -> t != ''), ' ')) AS fp,
         |  CASE WHEN n_tokens >= 30 THEN 1 ELSE 0 END AS p1,
         |  CASE WHEN lang_pred = 'en' THEN 1 ELSE 0 END AS p2,
         |  CASE WHEN quality > 0 THEN 1 ELSE 0 END AS p3
         | FROM s),
         |d AS (SELECT COUNT(*) AS n_input,
         |  CAST(SUM(p1) AS BIGINT) AS a1, CAST(SUM(p2) AS BIGINT) AS a2,
         |  CAST(SUM(p3) AS BIGINT) AS a3,
         |  CAST(SUM(p1 * p2) AS BIGINT) AS c2,
         |  CAST(SUM(p1 * p2 * p3) AS BIGINT) AS c3 FROM b),
         |dd AS (SELECT COUNT(*) AS dd_alone,
         |  CAST(SUM(anyPass) AS BIGINT) AS dd_cum FROM
         |  (SELECT fp, MAX(p1 * p2 * p3) AS anyPass FROM b GROUP BY fp))
         |SELECT stage_idx, stage, n_pass_alone, n_surviving FROM (
         |  SELECT 0::BIGINT AS stage_idx, 'input' AS stage,
         |    n_input AS n_pass_alone, n_input AS n_surviving FROM d
         |  UNION ALL SELECT 1, 'min_tokens', a1, a1 FROM d
         |  UNION ALL SELECT 2, 'lang_en', a2, c2 FROM d
         |  UNION ALL SELECT 3, 'quality_pos', a3, c3 FROM d
         |  UNION ALL SELECT 4, 'dedup', dd_alone, dd_cum FROM d, dd)
         |ORDER BY stage_idx""".stripMargin,

    "pipe_span_mask" ->
      s"""WITH t AS (SELECT doc_id, len($toksSql) AS n_tokens FROM documents
         |  WHERE len($toksSql) >= 20),
         |n AS (SELECT doc_id, n_tokens,
         |  FLOOR(n_tokens * 0.15::DOUBLE / 3)::BIGINT AS n_spans
         | FROM t),
         |x AS (SELECT doc_id, n_tokens, n_spans,
         |  UNNEST(generate_series(0, n_spans - 1)) AS span_idx
         | FROM n WHERE n_spans > 0),
         |y AS (SELECT doc_id, span_idx,
         |  FLOOR(n_tokens / n_spans)::BIGINT AS stratum_len
         | FROM x)
         |SELECT doc_id, span_idx,
         | span_idx * stratum_len +
         |   ('0x' || substring(md5(doc_id || ':' || span_idx), 1, 15))::BIGINT
         |     % GREATEST(stratum_len - 2, 1) AS start_tok,
         | 3::BIGINT AS span_len
         |FROM y ORDER BY doc_id, span_idx""".stripMargin,

    "pipe_pack_split" ->
      s"""WITH t AS (SELECT doc_id, len($toksSql) AS n_tokens FROM documents
         |  WHERE len($toksSql) > 0),
         |p AS (SELECT doc_id, n_tokens,
         |  CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS prefix_tokens
         | FROM t)
         |SELECT doc_id, n_tokens, prefix_tokens,
         | FLOOR(prefix_tokens / 512.0)::BIGINT AS start_seq,
         | FLOOR((prefix_tokens + n_tokens - 1) / 512.0)::BIGINT AS end_seq,
         | FLOOR((prefix_tokens + n_tokens - 1) / 512.0)::BIGINT
         |   - FLOOR(prefix_tokens / 512.0)::BIGINT + 1 AS n_seqs
         |FROM p ORDER BY doc_id""".stripMargin,

    "pipe_curriculum" ->
      s"""WITH b AS (SELECT doc_id, len($toksSql) AS n_tokens,
         |  md5(text) AS shuffle_key,
         |  FLOOR(len($toksSql) / 16.0)::BIGINT AS bucket FROM documents)
         |SELECT doc_id, n_tokens, bucket, shuffle_key,
         | ROW_NUMBER() OVER (ORDER BY bucket, shuffle_key, doc_id) AS pos
         |FROM b ORDER BY pos""".stripMargin,

    "pipe_pack_bins" ->
      s"""SELECT doc_id, lang, len($toksSql) AS n_tokens,
         | floor(COALESCE(SUM(len($toksSql)) OVER (PARTITION BY lang ORDER BY doc_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 256.0)::BIGINT AS bin
         |FROM documents ORDER BY lang, doc_id""".stripMargin,

    "ta_fertility" ->
      s"""WITH t AS (SELECT lang, len($toksSql)::BIGINT AS nt,
         |  length(text)::BIGINT AS nc FROM documents WHERE length(text) > 0)
         |SELECT lang, COUNT(*) AS n_docs,
         | SUM(nt)::BIGINT AS sum_tokens, SUM(nc)::BIGINT AS sum_chars,
         | SUM(nt)::BIGINT::DOUBLE / SUM(nc)::BIGINT::DOUBLE AS fertility
         |FROM t GROUP BY lang ORDER BY lang""".stripMargin,

    "pipe_hash_embed" ->
      s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS token FROM documents),
         |b AS (SELECT doc_id,
         |  ('0x' || substring(md5(token), 1, 15))::BIGINT % 16 AS bucket,
         |  COUNT(*) AS cnt FROM t GROUP BY doc_id, bucket),
         |n AS (SELECT doc_id, SUM(cnt * cnt)::BIGINT AS norm2
         |  FROM b GROUP BY doc_id)
         |SELECT b.doc_id, b.bucket,
         | b.cnt::DOUBLE / sqrt(n.norm2::DOUBLE) AS val
         |FROM b JOIN n ON n.doc_id = b.doc_id
         |ORDER BY b.doc_id, b.bucket""".stripMargin,

    "pipe_pad_waste" ->
      s"""WITH base AS (SELECT doc_id, len($toksSql)::BIGINT AS n_tokens
         |  FROM documents WHERE len($toksSql) > 0),
         |so AS (SELECT n_tokens, ((ROW_NUMBER() OVER (ORDER BY n_tokens, doc_id)
         |  - 1) // 32)::BIGINT AS batch FROM base),
         |sh AS (SELECT n_tokens, ((ROW_NUMBER() OVER (ORDER BY md5(doc_id::VARCHAR), doc_id)
         |  - 1) // 32)::BIGINT AS batch FROM base),
         |sob AS (SELECT batch, COUNT(*) AS bn, MAX(n_tokens) AS mx,
         |  SUM(n_tokens)::BIGINT AS toks FROM so GROUP BY batch),
         |shb AS (SELECT batch, COUNT(*) AS bn, MAX(n_tokens) AS mx,
         |  SUM(n_tokens)::BIGINT AS toks FROM sh GROUP BY batch),
         |soa AS (SELECT 'length_sorted' AS strategy, COUNT(*) AS n_batches,
         |  SUM(toks)::BIGINT AS total_tokens,
         |  SUM(mx * bn - toks)::BIGINT AS total_pad FROM sob),
         |sha AS (SELECT 'shuffled' AS strategy, COUNT(*) AS n_batches,
         |  SUM(toks)::BIGINT AS total_tokens,
         |  SUM(mx * bn - toks)::BIGINT AS total_pad FROM shb),
         |u AS (SELECT * FROM soa UNION ALL SELECT * FROM sha)
         |SELECT strategy, n_batches, total_tokens, total_pad,
         | ((total_pad * 1000000) // (total_pad + total_tokens))::BIGINT AS pad_ppm
         |FROM u ORDER BY strategy""".stripMargin,

    "pipe_eval_sample" ->
      """WITH r AS (SELECT doc_id, lang, md5(doc_id::VARCHAR) AS draw,
        |  ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY md5(doc_id::VARCHAR), doc_id) AS draw_rank
        | FROM documents)
        |SELECT lang, draw_rank, doc_id FROM r WHERE draw_rank <= 20
        |ORDER BY lang, draw_rank""".stripMargin,

    "pipe_pack_stats" ->
      s"""WITH b AS (SELECT doc_id, lang, len($toksSql) AS n_tokens,
         |  floor(COALESCE(SUM(len($toksSql)) OVER (PARTITION BY lang ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 256.0)::BIGINT AS bin
         | FROM documents),
         |bins AS (SELECT lang, bin, SUM(n_tokens)::BIGINT AS bin_tokens
         |  FROM b GROUP BY lang, bin)
         |SELECT lang, LEAST((bin_tokens * 10) // 256, 10)::BIGINT AS util_bucket,
         | COUNT(*) AS n_bins, MIN(bin_tokens)::BIGINT AS min_tokens,
         | MAX(bin_tokens)::BIGINT AS max_tokens
         |FROM bins GROUP BY 1, 2 ORDER BY lang, util_bucket""".stripMargin,

    "pipe_pack_payload" ->
      s"""WITH b AS (SELECT doc_id, lang, text, len($toksSql) AS n_tokens,
         |  floor(COALESCE(SUM(len($toksSql)) OVER (PARTITION BY lang ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 256.0)::BIGINT AS bin
         | FROM documents)
         |SELECT lang, bin, COUNT(*) AS n_docs,
         | CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
         | string_agg(text, ' ' ORDER BY doc_id) AS payload
         |FROM b GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,

    "pipe_mixture" ->
      s"""WITH s AS (SELECT lang, COUNT(*) AS n_docs, SUM(len($toksSql))::BIGINT AS sum_tokens
         |           FROM documents GROUP BY lang),
         |w AS (SELECT lang, n_docs, sum_tokens, sqrt(sum_tokens::DOUBLE) AS w FROM s),
         |c AS (SELECT *, SUM(w) OVER (ORDER BY lang
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM w),
         |z AS (SELECT *, MAX(cum) OVER () AS z FROM c)
         |SELECT lang, n_docs, sum_tokens, w / z AS share,
         | least(100000.0 * (w / z) / sum_tokens, 1.0) AS rate
         |FROM z ORDER BY lang""".stripMargin,

    "ta_vocab_coverage" ->
      s"""WITH c AS (SELECT tok, COUNT(*) AS n FROM (
         |  SELECT unnest($toksSql) AS tok FROM documents) GROUP BY tok),
         |t AS (SELECT SUM(n)::BIGINT AS total FROM c),
         |top AS (SELECT tok, n,
         |  ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS k,
         |  SUM(n) OVER (ORDER BY n DESC, tok
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
         | FROM c QUALIFY k <= 16)
         |SELECT k::BIGINT AS k, cum AS top_mass, total,
         | cum::DOUBLE / total AS coverage
         |FROM top, t WHERE k IN (4, 8, 16) ORDER BY k""".stripMargin,

    "pipe_interleave" ->
      """WITH si AS (SELECT source,
        |  ROW_NUMBER() OVER (ORDER BY source) - 1 AS sidx,
        |  COUNT(*) OVER () AS nsrc
        |  FROM (SELECT DISTINCT source FROM documents)),
        |r AS (SELECT doc_id, source,
        |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rk
        |  FROM documents)
        |SELECT r.doc_id, r.source, ((rk - 1) * nsrc + sidx)::BIGINT AS pos
        |FROM r JOIN si USING (source) ORDER BY pos""".stripMargin,

    "pipe_epoch_plan" ->
      s"""WITH s AS (SELECT lang, COUNT(*) AS n_docs, SUM(len($toksSql))::BIGINT AS sum_tokens
         |           FROM documents GROUP BY lang),
         |w AS (SELECT lang, n_docs, sum_tokens, sqrt(sum_tokens::DOUBLE) AS w FROM s),
         |c AS (SELECT *, SUM(w) OVER (ORDER BY lang
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM w),
         |z AS (SELECT *, MAX(cum) OVER () AS z FROM c),
         |e AS (SELECT lang, n_docs, sum_tokens, w / z AS share,
         |        500000.0 * (w / z) / sum_tokens AS epochs FROM z)
         |SELECT lang, n_docs, sum_tokens, share, epochs,
         | CEIL(epochs)::BIGINT AS n_passes, epochs > 4.0 AS data_constrained
         |FROM e ORDER BY lang""".stripMargin,

    "ta_zipf" ->
      """WITH f AS (SELECT unnest(list_filter(string_split(text, ' '),
        |    t -> t != '')) AS token FROM documents),
        |c AS (SELECT token, COUNT(*) AS freq FROM f GROUP BY token),
        |r AS (SELECT token, freq,
        |  ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rank FROM c)
        |SELECT rank, token, freq, rank * freq AS rank_freq
        |FROM r WHERE rank <= 50 ORDER BY rank""".stripMargin,

    "pipe_shuffle_order" ->
      """SELECT doc_id,
        | ROW_NUMBER() OVER (ORDER BY md5(doc_id::VARCHAR), doc_id) AS pos
        |FROM documents ORDER BY pos""".stripMargin,

    "pipe_dup_rate_by_source" ->
      """WITH fp AS (SELECT doc_id, source,
        |  md5(array_to_string(
        |    list_filter(string_split(lower(text), ' '), t -> t != ''), ' ')) AS fp
        | FROM documents),
        |occ AS (SELECT fp, COUNT(*) AS n_occ FROM fp GROUP BY fp)
        |SELECT source, COUNT(*) AS n_docs,
        | CAST(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
        | CAST(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)::DOUBLE
        |   / COUNT(*)::DOUBLE AS dup_rate
        |FROM fp JOIN occ USING (fp)
        |GROUP BY source ORDER BY source""".stripMargin,

    "pipe_contam_matrix" ->
      s"""WITH g0 AS (SELECT source, list_distinct(CASE WHEN len(t) >= 8
         |    THEN [array_to_string(list_slice(t, i + 1, i + 8), ' ')
         |          for i in generate_series(0, len(t) - 8)]
         |    ELSE [] END) AS gs
         |  FROM (SELECT source, $toksSql AS t FROM documents)),
         |sg AS (SELECT DISTINCT source, unnest(gs) AS g FROM g0)
         |SELECT a.source AS source_a, b.source AS source_b,
         |  COUNT(*) AS n_shared_ngrams
         |FROM sg a JOIN sg b ON a.g = b.g AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "pipe_decontam" ->
      s"""WITH g AS (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 8
         |    THEN [array_to_string(list_slice(t, i + 1, i + 8), ' ')
         |          for i in generate_series(0, len(t) - 8)]
         |    ELSE [] END) AS gs
         |  FROM (SELECT doc_id, $toksSql AS t FROM documents)),
         |e AS (SELECT DISTINCT unnest(gs) AS s FROM g WHERE doc_id % 50 = 0),
         |tr AS (SELECT doc_id, unnest(gs) AS s FROM g WHERE doc_id % 50 != 0)
         |SELECT tr.doc_id, COUNT(*) AS n_hits FROM tr JOIN e USING (s)
         |GROUP BY tr.doc_id ORDER BY doc_id""".stripMargin,

    "ta_quality_rules" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk,
         |  length(replace(text, ' ', '')) AS tok_chars FROM documents),
         |m AS (SELECT doc_id, len(tk) AS n_tokens, tok_chars,
         |  len(list_filter(tk, x -> regexp_matches(x, '^[0-9]+$$'))) AS n_digit,
         |  len(list_distinct(tk)) AS n_distinct,
         |  len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is','it'))) AS n_stop
         | FROM t),
         |r AS (SELECT doc_id, n_tokens,
         |  CASE WHEN n_tokens > 0 THEN tok_chars::DOUBLE / n_tokens ELSE 0.0 END AS mean_wlen,
         |  CASE WHEN n_tokens > 0 THEN n_digit::DOUBLE / n_tokens ELSE 0.0 END AS digit_ratio,
         |  CASE WHEN n_tokens > 0 THEN 1.0 - n_distinct::DOUBLE / n_tokens ELSE 0.0 END AS rep_ratio,
         |  n_stop FROM m)
         |SELECT doc_id, n_tokens, mean_wlen, digit_ratio, rep_ratio, n_stop,
         | (n_tokens >= 50 AND n_tokens <= 100000) AS r_len,
         | (mean_wlen >= 3.0 AND mean_wlen <= 10.0) AS r_wlen,
         | (digit_ratio < 0.2) AS r_digit,
         | (rep_ratio < 0.3) AS r_rep,
         | (n_stop >= 2) AS r_stop,
         | (n_tokens >= 50 AND n_tokens <= 100000 AND mean_wlen >= 3.0
         |  AND mean_wlen <= 10.0 AND digit_ratio < 0.2 AND rep_ratio < 0.3
         |  AND n_stop >= 2) AS pass
         |FROM r ORDER BY doc_id""".stripMargin,

    "pipe_train_shard" ->
      s"""WITH f AS (SELECT doc_id, lang, text, len($toksSql) AS n_tokens
         |           FROM documents WHERE len($toksSql) >= 30),
         |k AS (SELECT * FROM f
         |      QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(array_to_string(
         |        list_filter(string_split(lower(text), ' '), t -> t != ''), ' '))
         |        ORDER BY doc_id) = 1)
         |SELECT doc_id, lang, n_tokens,
         | ascii(substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) % 4 AS shard
         |FROM k
         |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
         |      IN ('0','1','2','3','4','5','6','7')
         |ORDER BY doc_id""".stripMargin
  )
}

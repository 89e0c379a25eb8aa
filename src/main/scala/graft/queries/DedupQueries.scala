package graft.queries

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication over documents / embeddings (SURVEY §2.D). */
object DedupQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_exact" -> { (s, dir) =>
      Dedup.exact(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("fp")
    },

    // exact substring dedup: pairs sharing a 15-token exact span, the
    // suffix-array pass re-expressed as a bounded postings join — every
    // emitted pair is exact (spans compared as strings, nothing to
    // re-verify), and the posting cap fails loudly instead of silently
    // losing pairs
    "pipe_substring_dedup" -> { (s, dir) =>
      Dedup.substringPairs(Tables.documents(s, dir), "doc_id", "text",
        window = 15, maxPosting = 64)
        .orderBy("a_id", "b_id")
    },

    "dd_ngram_jaccard" -> { (s, dir) =>
      Dedup.jaccardPairsBlocked(Tables.documents(s, dir), "doc_id", "text",
        blockCol = "source", n = 3, minJaccard = 0.3)
        .orderBy("a_id", "b_id")
    },

    // exact dedup from pure SQL via the graft_dedup_exact TVF
    // (GraftExtensions.tableFunctions); same oracle as dd_exact — the
    // SQL-only user reaches the identical operator
    "dedup_sql_surface" -> { (s, dir) =>
      graft.GraftExtensions.register(s)
      Tables.documents(s, dir).createOrReplaceTempView("graft_sql_docs")
      s.sql("""SELECT fp, keep_id, n_dups
              |FROM graft_dedup_exact('graft_sql_docs', 'doc_id', 'text')
              |ORDER BY fp""".stripMargin)
    },

    // entity-resolution match scoring (the Fellegi–Sunter shape, with
    // deterministic agreement weights): two customer feeds — B carries
    // planted perturbations (case-folded names, nudged balances) — are
    // blocked on (nation, coarse balance bucket) so candidates stay
    // bounded (Σ block² — never the N² cross join), then each candidate
    // pair scores integer field-agreement weights (name 50, balance-
    // within-1 30, segment 20) and pairs ≥ 70 link. All comparisons are
    // exact (integer weights, IEEE-identical float compare), so the
    // oracle replays bit-for-bit
    "dd_er_score" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val a = c.where(col("c_custkey") % 2 === 0).select(
        col("c_custkey").as("a_id"), col("c_name").as("a_name"),
        col("c_nationkey").as("nat"), col("c_acctbal").as("a_bal"),
        col("c_mktsegment").as("a_seg"))
        .withColumn("blk", floor(col("a_bal") / 1000).cast("long"))
      val b = c.select(
        (col("c_custkey") + 1000000L).as("b_id"),
        when(col("c_custkey") % 3 === 0, upper(col("c_name")))
          .otherwise(col("c_name")).as("b_name"),
        col("c_nationkey").as("nat"),
        when(col("c_custkey") % 5 === 0, col("c_acctbal") + 0.5)
          .otherwise(col("c_acctbal")).as("b_bal"),
        col("c_mktsegment").as("b_seg"))
        .withColumn("blk", floor(col("b_bal") / 1000).cast("long"))
      val name_m = lower(col("a_name")) === lower(col("b_name"))
      val bal_m = abs(col("a_bal") - col("b_bal")) <= 1.0
      val seg_m = col("a_seg") === col("b_seg")
      a.join(b, Seq("nat", "blk"))
        .select(col("a_id"), col("b_id"),
          (when(name_m, 50L).otherwise(0L)
            + when(bal_m, 30L).otherwise(0L)
            + when(seg_m, 20L).otherwise(0L)).as("score"),
          name_m.as("name_match"), bal_m.as("bal_match"), seg_m.as("seg_match"))
        .where(col("score") >= 70)
        .orderBy("a_id", "b_id")
    },

    // blocking-quality audit for the ER pipeline (the measure-don't-guess
    // twin of dd_er_score): TRUE matches are known by construction (B is
    // A's perturbed copy — b_id = a_id + 1e6), so pairs completeness
    // (share of true matches surviving the (nation, balance-bucket)
    // blocking) and the reduction ratio (candidates vs the full cross
    // product) are both exact integers. The audit every blocking scheme
    // needs: completeness says what recall costs, reduction says what it
    // buys
    "dd_er_blocking" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val a = c.where(col("c_custkey") % 2 === 0).select(
        col("c_custkey").as("a_id"), col("c_nationkey").as("nat"),
        col("c_acctbal").as("a_bal"))
        .withColumn("blk", floor(col("a_bal") / 1000).cast("long"))
      val b = c.select(
        (col("c_custkey") + 1000000L).as("b_id"),
        col("c_nationkey").as("nat"),
        when(col("c_custkey") % 5 === 0, col("c_acctbal") + 0.5)
          .otherwise(col("c_acctbal")).as("b_bal"))
        .withColumn("blk", floor(col("b_bal") / 1000).cast("long"))
      val cand = a.join(b, Seq("nat", "blk")).select(col("a_id"), col("b_id"))
      val nCand = cand.agg(count(lit(1)).as("n_cand"))
      val nTrue = a.agg(count(lit(1)).as("n_true"))
      val nA = a.agg(count(lit(1)).as("n_a"))
      val nB = b.agg(count(lit(1)).as("n_b"))
      val trueHit = cand.where(col("b_id") === col("a_id") + 1000000L)
        .agg(count(lit(1)).as("n_true_in_cand"))
      nTrue.crossJoin(trueHit).crossJoin(nCand).crossJoin(nA).crossJoin(nB)
        .select(col("n_true"), col("n_true_in_cand"), col("n_cand"),
          expr("n_true_in_cand * 1000000L div n_true").as("completeness_ppm"),
          expr("n_cand * 1000000L div (n_a * n_b)").as("candidate_share_ppm"))
    },

    "dd_minhash_lsh" -> { (s, dir) =>
      Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text", tau = 0.8)
        .orderBy("a_id", "b_id")
    },

    // asymmetric containment: |A∩B| / min(|A|,|B|) — flags a short doc
    // quoted inside a long one, which Jaccard structurally misses (see
    // Dedup.containmentPairsBlocked). Threshold below the jaccard query's
    // so the asymmetric pairs actually differ from dd_ngram_jaccard's set
    "dd_containment" -> { (s, dir) =>
      Dedup.containmentPairsBlocked(Tables.documents(s, dir), "doc_id", "text",
        blockCol = "source", n = 3, minContainment = 0.5)
        .orderBy("a_id", "b_id")
    },

    "dd_simhash" -> { (s, dir) =>
      Dedup.simhashSignatures(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    },

    // 4-quarter blocking guarantees every Hamming<=3 pair shares a
    // quarter, so the LSH-candidate path equals the brute-force pair set
    // EXACTLY and gets a full value oracle.
    "dd_simhash_pairs" -> { (s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text", maxDist = 3)
        .orderBy("a_id", "b_id")
    },

    "dd_keep_first" -> { (s, dir) =>
      Dedup.keepFirst(Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    },

    // incremental ingest: a 20% "new batch" deduped against the stored
    // (fp, simhash) index of the other 80% — exact + Hamming<=3 drops,
    // corpus text never re-read. Quarter blocking has guaranteed recall
    // at <=3, so the brute-force SQL twin matches EXACTLY
    "dd_incremental" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val corpus = docs.where(col("doc_id") % 5 =!= 0)
      val batch = docs.where(col("doc_id") % 5 === 0)
      val index = Dedup.dedupIndex(corpus, "doc_id", "text")
      Dedup.incrementalSurvivors(batch, index, "doc_id", "text", maxDist = 3)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    },

    // bloom-prefiltered incremental EXACT dedup: same batch/corpus split
    // as dd_incremental but exact-only, with a corpus-fingerprint bloom
    // sketch routing definite-novel rows around the anti-join shuffle
    // entirely (no false negatives ⇒ result exact; bloom-positive rows
    // are rescued by the exact anti-join)
    "dd_bloom_prefilter" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val corpusFps = docs.where(col("doc_id") % 5 =!= 0)
        .select(graft.functions.Text.fingerprint(col("text")).as("fp"))
      Dedup.bloomSurvivors(docs.where(col("doc_id") % 5 === 0), corpusFps,
        "doc_id", "text", expectedItems = 100000L)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    },

    // fuzzy-match verify: simhash candidates re-scored with exact edit
    // distance over a bounded prefix — levenshtein is O(len²) per pair, so
    // it only ever runs on the LSH-bounded candidate set, never pairwise
    "dd_editdist" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      // ASCII-restrict the prefix: DuckDB's levenshtein counts BYTES while
      // Spark's counts CODEPOINTS, so any multi-byte character in the diff
      // would break the exact-value oracle (today's corpus is ASCII; this
      // keeps the query correct if that changes)
      val prefix = docs.select(col("doc_id"),
        regexp_replace(substring(lower(col("text")), 1, 120),
          "[^\\x00-\\x7F]", "?").as("pref"))
      pairs
        .join(prefix.select(col("doc_id").as("a_id"), col("pref").as("a_p")), "a_id")
        .join(prefix.select(col("doc_id").as("b_id"), col("pref").as("b_p")), "b_id")
        .select(col("a_id"), col("b_id"), col("hamming"),
          levenshtein(col("a_p"), col("b_p")).as("editdist"))
        .orderBy("a_id", "b_id")
    },

    "dd_embed_cosine" -> { (s, dir) =>
      Dedup.embeddingPairsBlocked(Tables.embeddings(s, dir), "vec_id", "embedding",
        blockCol = "label", tau = 0.35)
        .orderBy("a_id", "b_id")
    },

    // SemDeDup: cluster-blocked semantic dedup for corpora with NO natural
    // blocking key — k-means-style assignment bounds the pair space where
    // dd_embed_cosine relies on `label` and dd_embed_lsh on hyperplane
    // buckets. Output is the surviving corpus with its cluster.
    "dd_semdedup" -> { (s, dir) =>
      Dedup.semDedup(Tables.embeddings(s, dir), "vec_id", "embedding",
        stride = 32, tau = 0.35)
        .select(col("id").as("vec_id"), col("c_id"))
        .orderBy("vec_id")
    },

    // near-dup pairs -> duplicate clusters via min-label propagation;
    // oracle is a DuckDB recursive-CTE transitive closure over the same
    // pair set, so cluster assignments are value-checked end to end.
    "dd_clusters" -> { (s, dir) =>
      val pairs = Dedup.jaccardPairsBlocked(Tables.documents(s, dir), "doc_id", "text",
        blockCol = "source", n = 3, minJaccard = 0.3)
      graft.operators.ConnectedComponents.labels(pairs)
        .orderBy("id")
    },

    // the dedup AUDIT report: duplicate-cluster size histogram over the
    // WHOLE corpus (docs in no pair are size-1 clusters), answering "how
    // duplicated is this corpus and in what shape" before any rows are
    // dropped. Labels come from the same CC as dd_clusters; the histogram
    // is two more bounded hash aggregations
    // postings-list size census over 3-gram shingles — the distribution
    // that GOVERNS every postings-join's cost (pair work = Σ p·(p−1)/2
    // per shingle): per posting-count magnitude (decimal digit count —
    // exact in both engines where floor(log2) would drift at powers),
    // how many shingles and how many candidate pairs they contribute.
    // This is the pre-flight "can we afford the pair join" answer, from
    // two linear aggregations — the "measure, don't guess" rule applied
    // to the dedup planner itself
    // EXACT global similarity self-join via prefix filtering (All-Pairs/
    // PPJoin): no block key, no w.h.p. caveat — rarest-first prefixes
    // bound the candidate join, exact Jaccard verifies. The deterministic
    // exact twin of dd_minhash_lsh (see Dedup.prefixJaccardPairs)
    "dd_prefix_join" -> { (s, dir) =>
      Dedup.prefixJaccardPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, tau = 0.5)
        .orderBy("a_id", "b_id")
    },

    // classic sorted-neighborhood blocking: total-order by a cheap key
    // (first 24 chars of lowercased text), compare each doc only with its
    // 5 successors, verify exact Jaccard. Candidates are w·N regardless
    // of key skew; the order is a range-partitioned GlobalRank and the
    // neighborhood band an equi-join on the rank bucket — no theta join
    "dd_sorted_neighborhood" -> { (s, dir) =>
      Dedup.sortedNeighborhoodPairs(Tables.documents(s, dir), "doc_id", "text",
        sortKey = substring(lower(col("text")), 1, 24), w = 5, n = 3, tau = 0.5)
        .orderBy("a_id", "b_id")
    },

    "dd_postings_census" -> { (s, dir) =>
      Dedup.shingleRows(Tables.documents(s, dir), "doc_id", "text", 3)
        .groupBy(col("s")).agg(count(lit(1)).as("p"))
        .select(col("p"), length(col("p").cast("string")).cast("long").as("mag"))
        .groupBy(col("mag"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(col("p")).as("n_postings"),
          sum(expr("p * (p - 1) div 2")).as("n_cand_pairs"))
        .orderBy("mag")
    },

    "dd_cluster_sizes" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.jaccardPairsBlocked(docs, "doc_id", "text",
        blockCol = "source", n = 3, minJaccard = 0.3)
      val labels = graft.operators.ConnectedComponents.labels(pairs)
      docs.select(col("doc_id"))
        .join(labels, col("doc_id") === col("id"), "left")
        .select(coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
        .select(col("cluster_size"), col("n_clusters"),
          (col("cluster_size") * col("n_clusters")).as("n_docs"))
        .orderBy("cluster_size")
    },

    // the full near-dedup composition, pairs → clusters → CLEANED CORPUS:
    // each duplicate cluster keeps its min-id representative and the rest
    // anti-join away. This is the query a training pipeline actually
    // ships — dd_clusters is its diagnostic view
    "dd_near_dedup_corpus" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.jaccardPairsBlocked(docs, "doc_id", "text",
        blockCol = "source", n = 3, minJaccard = 0.3)
      val labels = graft.operators.ConnectedComponents.labels(pairs)
      val drop = labels.where(col("id") =!= col("cluster_id")).select(col("id"))
      docs.join(drop, docs("doc_id") === drop("id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    },

    // keep-BEST near-dedup: same clusters as dd_near_dedup_corpus, but the
    // representative is the highest-quality member (lexical diversity,
    // min-id tie-break), not the min id — the policy a training pipeline
    // actually wants when duplicates differ in cleanliness. The per-cluster
    // choice is one map-side-combinable max_by(doc_id, (n_types, -doc_id))
    // — no window, no collect
    "pipe_dedup_best" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.jaccardPairsBlocked(docs, "doc_id", "text",
        blockCol = "source", n = 3, minJaccard = 0.3)
      val labels = graft.operators.ConnectedComponents.labels(pairs)
      val qual = docs.select(col("doc_id"),
        graft.expressions.TextExpressions.tokenDiversity(col("text"))
          .getItem(1).as("n_types"))
      val lab = qual.join(labels, qual("doc_id") === labels("id"))
        .select(col("doc_id"), col("cluster_id"), col("n_types"))
      val rep = lab.groupBy(col("cluster_id"))
        .agg(max_by(col("doc_id"),
          struct(col("n_types"), -col("doc_id"))).as("keep_id"))
      val dropIds = lab.join(rep, "cluster_id")
        .where(col("doc_id") =!= col("keep_id"))
        .select(col("doc_id").as("drop_id"))
      docs.join(dropIds, docs("doc_id") === dropIds("drop_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    },

    // leakage-aware train/val/test split: assignment hashes the near-dup
    // CLUSTER id (singletons are their own cluster), so no near-duplicate
    // pair ever straddles train and test — the eval-hygiene property a
    // doc-id hash split silently violates. Deterministic md5-uniform, no
    // rand(); one closure + one per-doc map beyond the pair join
    "pipe_leakage_split" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.jaccardPairsBlocked(docs, "doc_id", "text",
        blockCol = "source", n = 3, minJaccard = 0.3)
      val labels = graft.operators.ConnectedComponents.labels(pairs)
      val withCluster = docs.join(labels, docs("doc_id") === labels("id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      val u = conv(substring(md5(col("cluster_id").cast("string")), 1, 4), 16, 10)
        .cast("int") / lit(65536.0)
      withCluster
        .select(col("doc_id"), col("cluster_id"),
          when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test").as("split"))
        .orderBy("doc_id")
    },

    // value-oracled since round 4 (plane literals inlined in the SQL);
    // precision/recall vs the brute path additionally asserted in
    // DedupSpec.
    "dd_embed_lsh" -> { (s, dir) =>
      Dedup.embeddingPairsLsh(Tables.embeddings(s, dir), "vec_id", "embedding",
        tau = 0.4)
        .orderBy("a_id", "b_id")
    }
  )

  private val normToks = "list_filter(string_split(lower(text), ' '), t -> t != '')"
  private val rawToks = "list_filter(string_split(text, ' '), t -> t != '')"
  // distinct 3-gram shingles of the whitespace tokens
  private val triShingles =
    s"""list_distinct(CASE WHEN len($rawToks) >= 3
       | THEN [array_to_string(list_slice($rawToks, i + 1, i + 3), ' ')
       |       for i in generate_series(0, len($rawToks) - 3)]
       | ELSE [] END)""".stripMargin
  // left-fold double dot product of two double lists a, b (matches
  // Spark aggregate(zip_with(...)) evaluation order: 0.0 + x1 + x2 + ...)
  private def dotSql(a: String, b: String) =
    s"list_reduce(list_prepend(0.0, [$a[i] * $b[i] for i in generate_series(1, len($a))]), (x, y) -> x + y)"

  private val oracleBase: Map[String, String] = Map(
    // full replay of the 15-token-window postings join: distinct windows
    // per doc, equality self-join, pair counts
    "pipe_substring_dedup" ->
      s"""WITH toks AS (SELECT doc_id, $rawToks AS t FROM documents),
         |win AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+14], ' ') AS w
         |        FROM toks, UNNEST(generate_series(1, len(t) - 14)) AS g(i))
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_windows
         |FROM win a JOIN win b ON a.w = b.w AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "dd_er_blocking" ->
      """WITH a AS (SELECT c_custkey AS a_id, c_nationkey AS nat,
        |  CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS blk
        | FROM customer WHERE c_custkey % 2 = 0),
        |b AS (SELECT c_custkey + 1000000 AS b_id, c_nationkey AS nat,
        |  CAST(FLOOR(CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 0.5
        |    ELSE c_acctbal END / 1000) AS BIGINT) AS blk
        | FROM customer),
        |cand AS (SELECT a_id, b_id FROM a JOIN b ON a.nat = b.nat AND a.blk = b.blk),
        |m AS (SELECT
        |  (SELECT COUNT(*) FROM a) AS n_true,
        |  (SELECT COUNT(*) FROM cand WHERE b_id = a_id + 1000000) AS n_true_in_cand,
        |  (SELECT COUNT(*) FROM cand) AS n_cand,
        |  (SELECT COUNT(*) FROM a) AS n_a,
        |  (SELECT COUNT(*) FROM b) AS n_b)
        |SELECT n_true, n_true_in_cand, n_cand,
        |  n_true_in_cand * 1000000 // n_true AS completeness_ppm,
        |  n_cand * 1000000 // (n_a * n_b) AS candidate_share_ppm
        |FROM m""".stripMargin,

    "dd_er_score" ->
      """WITH a AS (SELECT c_custkey AS a_id, c_name AS a_name,
        |  c_nationkey AS nat, c_acctbal AS a_bal, c_mktsegment AS a_seg,
        |  CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS blk
        | FROM customer WHERE c_custkey % 2 = 0),
        |b AS (SELECT c_custkey + 1000000 AS b_id,
        |  CASE WHEN c_custkey % 3 = 0 THEN UPPER(c_name) ELSE c_name END AS b_name,
        |  c_nationkey AS nat,
        |  CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 0.5 ELSE c_acctbal END AS b_bal,
        |  c_mktsegment AS b_seg,
        |  CAST(FLOOR(CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 0.5
        |    ELSE c_acctbal END / 1000) AS BIGINT) AS blk
        | FROM customer),
        |s AS (SELECT a_id, b_id,
        |  (CASE WHEN LOWER(a_name) = LOWER(b_name) THEN 50 ELSE 0 END
        |   + CASE WHEN ABS(a_bal - b_bal) <= 1.0 THEN 30 ELSE 0 END
        |   + CASE WHEN a_seg = b_seg THEN 20 ELSE 0 END)::BIGINT AS score,
        |  LOWER(a_name) = LOWER(b_name) AS name_match,
        |  ABS(a_bal - b_bal) <= 1.0 AS bal_match,
        |  a_seg = b_seg AS seg_match
        | FROM a JOIN b ON a.nat = b.nat AND a.blk = b.blk)
        |SELECT * FROM s WHERE score >= 70 ORDER BY a_id, b_id""".stripMargin,

    "dd_exact" ->
      s"""SELECT md5(array_to_string($normToks, ' ')) AS fp,
         | MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
         |FROM documents GROUP BY fp ORDER BY fp""".stripMargin,

    "dd_ngram_jaccard" ->
      s"""WITH s AS (SELECT doc_id, source, $triShingles AS sh FROM documents
         |           WHERE len($triShingles) > 0)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         | len(list_intersect(a.sh, b.sh))::DOUBLE
         |   / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
         |FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
         |   / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.3
         |ORDER BY a_id, b_id""".stripMargin,

    "dd_containment" ->
      s"""WITH s AS (SELECT doc_id, source, $triShingles AS sh FROM documents
         |           WHERE len($triShingles) > 0)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         | len(list_intersect(a.sh, b.sh))::DOUBLE
         |   / least(len(a.sh), len(b.sh)) AS containment
         |FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
         |   / least(len(a.sh), len(b.sh)) >= 0.5
         |ORDER BY a_id, b_id""".stripMargin,

    // brute-force twin: LSH with (b=32, r=4) has ~1.0 recall at tau=0.8,
    // and the exact-Jaccard verify step makes precision exact.
    "dd_minhash_lsh" ->
      s"""WITH s AS (SELECT doc_id, $triShingles AS sh FROM documents WHERE len($triShingles) > 0)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         | len(list_intersect(a.sh, b.sh))::DOUBLE
         |   / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
         |FROM s a JOIN s b ON a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
         |   / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
         |ORDER BY a_id, b_id""".stripMargin,

    "dd_simhash" ->
      s"""SELECT doc_id, list_sum([
         |  CASE WHEN list_sum([
         |    CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END
         |    for h in [('0x' || substring(md5(t), 1, 15))::BIGINT for t in $rawToks]]) > 0
         |  THEN 1::BIGINT << i ELSE 0::BIGINT END
         |  for i in generate_series(0, 59)])::BIGINT AS simhash
         |FROM documents ORDER BY doc_id""".stripMargin,

    "dd_simhash_pairs" ->
      s"""WITH s AS (SELECT doc_id, list_sum([
         |  CASE WHEN list_sum([
         |    CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END
         |    for h in [('0x' || substring(md5(t), 1, 15))::BIGINT for t in $rawToks]]) > 0
         |  THEN 1::BIGINT << i ELSE 0::BIGINT END
         |  for i in generate_series(0, 59)])::BIGINT AS sh FROM documents)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         | bit_count(xor(a.sh, b.sh))::INT AS hamming
         |FROM s a JOIN s b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sh, b.sh)) <= 3
         |ORDER BY a_id, b_id""".stripMargin,

    "dd_keep_first" ->
      s"""SELECT doc_id, source, n_chars FROM documents
         |QUALIFY ROW_NUMBER() OVER (
         |  PARTITION BY md5(array_to_string($normToks, ' ')) ORDER BY doc_id) = 1
         |ORDER BY doc_id""".stripMargin,

    "dd_incremental" ->
      s"""WITH sig AS (SELECT doc_id,
         |  md5(array_to_string($normToks, ' ')) AS fp,
         |  list_sum([
         |   CASE WHEN list_sum([
         |     CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END
         |     for h in [('0x' || substring(md5(t), 1, 15))::BIGINT for t in $rawToks]]) > 0
         |   THEN 1::BIGINT << i ELSE 0::BIGINT END
         |   for i in generate_series(0, 59)])::BIGINT AS sh
         | FROM documents),
         |b AS (SELECT * FROM sig WHERE doc_id % 5 = 0),
         |c AS (SELECT * FROM sig WHERE doc_id % 5 != 0),
         |drops AS (
         |  SELECT b.doc_id FROM b JOIN c ON b.fp = c.fp
         |  UNION
         |  SELECT b.doc_id FROM b JOIN c ON bit_count(xor(b.sh, c.sh)) <= 3)
         |SELECT d.doc_id, d.source, d.n_chars FROM documents d
         |WHERE d.doc_id % 5 = 0
         |  AND d.doc_id NOT IN (SELECT doc_id FROM drops)
         |ORDER BY d.doc_id""".stripMargin,

    "dd_bloom_prefilter" ->
      s"""WITH fps AS (SELECT doc_id, md5(array_to_string($normToks, ' ')) AS fp
         |             FROM documents)
         |SELECT d.doc_id, d.source, d.n_chars
         |FROM documents d JOIN fps b ON d.doc_id = b.doc_id
         |WHERE d.doc_id % 5 = 0
         |  AND NOT EXISTS (SELECT 1 FROM fps c
         |                  WHERE c.doc_id % 5 != 0 AND c.fp = b.fp)
         |ORDER BY d.doc_id""".stripMargin,

    "dd_editdist" ->
      s"""WITH s AS (SELECT doc_id, list_sum([
         |  CASE WHEN list_sum([
         |    CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END
         |    for h in [('0x' || substring(md5(t), 1, 15))::BIGINT for t in $rawToks]]) > 0
         |  THEN 1::BIGINT << i ELSE 0::BIGINT END
         |  for i in generate_series(0, 59)])::BIGINT AS sh FROM documents),
         |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  bit_count(xor(a.sh, b.sh))::INT AS hamming
         | FROM s a JOIN s b ON a.doc_id < b.doc_id
         | WHERE bit_count(xor(a.sh, b.sh)) <= 3)
         |SELECT a_id, b_id, hamming,
         | levenshtein(
         |   regexp_replace(substring(lower(da.text), 1, 120), '[^\\x00-\\x7F]', '?', 'g'),
         |   regexp_replace(substring(lower(db.text), 1, 120), '[^\\x00-\\x7F]', '?', 'g')) AS editdist
         |FROM p JOIN documents da ON p.a_id = da.doc_id
         |       JOIN documents db ON p.b_id = db.doc_id
         |ORDER BY a_id, b_id""".stripMargin,

    "dd_clusters" ->
      s"""WITH RECURSIVE s AS (SELECT doc_id, source, $triShingles AS sh FROM documents
         |           WHERE len($triShingles) > 0),
         |pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
         |     / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.3),
         |edges AS (SELECT a_id AS u, b_id AS v FROM pairs
         |          UNION SELECT b_id, a_id FROM pairs),
         |nodes AS (SELECT DISTINCT u AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT reach.id, e.v FROM reach JOIN edges e ON reach.r = e.u)
         |SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id ORDER BY id""".stripMargin,

    // brute-force twin: the prefix filter is exact (zero false negatives),
    // so the full O(N²) pair scan at sf0.01 must match the filtered join
    // brute-force twin over the SAME portable md5-long shingle domain the
    // operator verifies in (both engines hash identically, so parity is
    // unconditional)
    "dd_prefix_join" ->
      s"""WITH t AS (SELECT doc_id, list_distinct(list_transform($triShingles,
         |    s -> ('0x' || substring(md5(s), 1, 15))::BIGINT)) AS tk
         |  FROM documents WHERE len($triShingles) > 0),
         |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  len(list_intersect(a.tk, b.tk)) AS i, len(a.tk) AS sa, len(b.tk) AS sb
         |  FROM t a JOIN t b ON a.doc_id < b.doc_id)
         |SELECT a_id, b_id, i::DOUBLE / (sa + sb - i) AS jaccard
         |FROM p WHERE i::DOUBLE / (sa + sb - i) >= 0.5
         |ORDER BY a_id, b_id""".stripMargin,

    "dd_sorted_neighborhood" ->
      s"""WITH t AS (SELECT doc_id, substring(lower(text), 1, 24) AS k,
         |             $triShingles AS tk
         |           FROM documents WHERE len($triShingles) > 0),
         |r AS (SELECT doc_id, tk,
         |  ROW_NUMBER() OVER (ORDER BY k, doc_id) AS rr FROM t),
         |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  len(list_intersect(a.tk, b.tk)) AS i, len(a.tk) AS sa, len(b.tk) AS sb
         |  FROM r a JOIN r b ON b.rr - a.rr BETWEEN 1 AND 5)
         |SELECT a_id, b_id, i::DOUBLE / (sa + sb - i) AS jaccard
         |FROM p WHERE i::DOUBLE / (sa + sb - i) >= 0.5
         |ORDER BY a_id, b_id""".stripMargin,

    "dd_postings_census" ->
      s"""WITH sh AS (SELECT doc_id, unnest($triShingles) AS s FROM documents),
         |p AS (SELECT s, COUNT(*) AS p FROM sh GROUP BY s),
         |m AS (SELECT p, LENGTH(p::VARCHAR)::BIGINT AS mag FROM p)
         |SELECT mag, COUNT(*) AS n_shingles,
         | CAST(SUM(p) AS BIGINT) AS n_postings,
         | CAST(SUM(p * (p - 1) // 2) AS BIGINT) AS n_cand_pairs
         |FROM m GROUP BY mag ORDER BY mag""".stripMargin,

    "dd_cluster_sizes" ->
      s"""WITH RECURSIVE s AS (SELECT doc_id, source, $triShingles AS sh FROM documents
         |           WHERE len($triShingles) > 0),
         |pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
         |     / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.3),
         |edges AS (SELECT a_id AS u, b_id AS v FROM pairs
         |          UNION SELECT b_id, a_id FROM pairs),
         |nodes AS (SELECT DISTINCT u AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT reach.id, e.v FROM reach JOIN edges e ON reach.r = e.u),
         |lab AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
         |alllab AS (SELECT COALESCE(lab.cluster_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN lab ON lab.id = d.doc_id),
         |cs AS (SELECT cluster_id, COUNT(*) AS cluster_size
         |  FROM alllab GROUP BY cluster_id)
         |SELECT cluster_size, COUNT(*) AS n_clusters,
         | CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
         |FROM cs GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,

    "dd_near_dedup_corpus" ->
      s"""WITH RECURSIVE s AS (SELECT doc_id, source, $triShingles AS sh FROM documents
         |           WHERE len($triShingles) > 0),
         |pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
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
         |dropped AS (SELECT id FROM labels WHERE id != cluster_id)
         |SELECT doc_id, lang, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM dropped)
         |ORDER BY doc_id""".stripMargin,

    // full value oracle: the 8×4 deterministic plane matrices are inlined
    // as SQL literals, so bucket collisions and the exact-cosine verify
    // are both value-checked (was rows-only before round 4)
    "dd_embed_lsh" -> {
      val planes = (0 until 8)
        .map(t => graft.functions.Vectors.makePlanes(4, 64, 42L + t)).toArray
      val bks = SimilarityQueries.bucketSqls("e", planes).zipWithIndex
        .map { case (b, i) => s"$b AS b$i" }.mkString(",\n  ")
      val anyMatch = (0 until 8).map(i => s"a.b$i = bb.b$i").mkString(" OR ")
      s"""WITH v AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS e FROM embeddings),
         |b AS (SELECT vec_id, e,
         |  $bks
         | FROM v),
         |p AS (SELECT a.vec_id AS a_id, bb.vec_id AS b_id,
         |  ${dotSql("a.e", "bb.e")} /
         |   (sqrt(${dotSql("a.e", "a.e")}) * sqrt(${dotSql("bb.e", "bb.e")})) AS cosine
         | FROM b a JOIN b bb ON a.vec_id < bb.vec_id AND ($anyMatch))
         |SELECT DISTINCT a_id, b_id, cosine FROM p WHERE cosine >= 0.4
         |ORDER BY a_id, b_id""".stripMargin
    },

    "dd_embed_cosine" ->
      s"""WITH v AS (SELECT vec_id, label, [x::DOUBLE for x in embedding] AS e FROM embeddings),
         |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  ${dotSql("a.e", "b.e")} /
         |   (sqrt(${dotSql("a.e", "a.e")}) * sqrt(${dotSql("b.e", "b.e")})) AS cosine
         | FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT a_id, b_id, cosine FROM p WHERE cosine >= 0.35 ORDER BY a_id, b_id""".stripMargin,

    "pipe_leakage_split" ->
      s"""WITH RECURSIVE s AS (SELECT doc_id, source, $triShingles AS sh FROM documents
         |           WHERE len($triShingles) > 0),
         |pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
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
         |d AS (SELECT doc_id, COALESCE(l.cluster_id, doc_id) AS cluster_id
         |      FROM documents LEFT JOIN labels l ON l.id = doc_id),
         |x AS (SELECT doc_id, cluster_id,
         |  ('0x' || substring(md5(CAST(cluster_id AS VARCHAR)), 1, 4))::INT::DOUBLE
         |    / 65536.0 AS u FROM d)
         |SELECT doc_id, cluster_id,
         | CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val'
         |      ELSE 'test' END AS split
         |FROM x ORDER BY doc_id""".stripMargin,

    "pipe_dedup_best" ->
      s"""WITH RECURSIVE s AS (SELECT doc_id, source, $triShingles AS sh FROM documents
         |           WHERE len($triShingles) > 0),
         |pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
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
         |t AS (SELECT doc_id, len(list_distinct($rawToks)) AS n_types FROM documents),
         |lab AS (SELECT l.id, l.cluster_id, t.n_types FROM labels l
         |        JOIN t ON t.doc_id = l.id),
         |rep AS (SELECT cluster_id, id AS keep_id FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
         |    ORDER BY n_types DESC, id) AS rn FROM lab) WHERE rn = 1),
         |dropped AS (SELECT lab.id FROM lab JOIN rep USING (cluster_id)
         |            WHERE lab.id != rep.keep_id)
         |SELECT doc_id, lang, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM dropped)
         |ORDER BY doc_id""".stripMargin,

    // full replay of SemDeDup: centroid pick, nearest-centroid assignment
    // (same IEEE cosine + tie-break as sim_ivf_assign's oracle), in-cluster
    // pair threshold, min-id survivor rule
    "dd_semdedup" ->
      s"""WITH v AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS e FROM embeddings),
         |c AS (SELECT vec_id AS c_id, e AS c_e FROM v WHERE vec_id % 32 = 0),
         |asg AS (SELECT id, c_id FROM (
         |  SELECT v.vec_id AS id, c.c_id,
         |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
         |      ORDER BY ${dotSql("v.e", "c.c_e")} /
         |        (sqrt(${dotSql("v.e", "v.e")}) * sqrt(${dotSql("c.c_e", "c.c_e")})) DESC,
         |        c.c_id) AS rn
         |  FROM v CROSS JOIN c) WHERE rn = 1),
         |dropped AS (SELECT DISTINCT b.id AS b_id
         |  FROM asg a JOIN asg b ON a.c_id = b.c_id AND a.id < b.id
         |  JOIN v va ON a.id = va.vec_id
         |  JOIN v vb ON b.id = vb.vec_id
         |  WHERE ${dotSql("va.e", "vb.e")} /
         |    (sqrt(${dotSql("va.e", "va.e")}) * sqrt(${dotSql("vb.e", "vb.e")})) >= 0.35)
         |SELECT id AS vec_id, c_id FROM asg
         |WHERE id NOT IN (SELECT b_id FROM dropped) ORDER BY vec_id""".stripMargin
    )

  val oracle: Map[String, String] = oracleBase +
    ("dedup_sql_surface" -> oracleBase("dd_exact"))
}

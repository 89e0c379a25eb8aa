package graft.operators

import graft.functions.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the classic
  * centroid-partitioned index (the structure behind FAISS's IVF family),
  * expressed relationally:
  *
  *   1. pick centroids (deterministic stride sample — at 100 TB this is a
  *      `TABLESAMPLE` + optional k-means refinement; stride keeps the
  *      pipeline reproducible for verification),
  *   2. assign every corpus vector to its max-cosine centroid — the
  *      "inverted lists", one linear pass over the corpus with the
  *      centroid set broadcast,
  *   3. a query probes only the `nProbe` centroids closest to it, and
  *      brute-forces the union of those lists.
  *
  * Scale shape: corpus-side work is O(N·C) dot products (C = #centroids,
  * typically √N) in one broadcast-join stage — no shuffle of the corpus;
  * the probe join shuffles only candidate lists for the probed centroids.
  * Complementary to `Similarity.topKCosineLsh`: IVF gives tunable
  * list-level pruning and a reusable materialized index; LSH avoids the
  * centroid-build pass.
  */
object IvfIndex {

  /** Per-subspace explode: (outId, sub_id, sv) — each vector split into `m`
    * contiguous `subDim`-slices. The single source of truth for the PQ
    * subvector layout shared by encode, ADC search and IVF-PQ: a drifted
    * copy would decode codes against a different slicing, a correctness
    * failure the compiler can't catch.
    */
  private def subvectors(df: DataFrame, idCol: String, vecCol: String,
                         outId: String, m: Int, subDim: Int): DataFrame =
    df.select(col(idCol).as(outId), Vectors.toDoubleArray(col(vecCol)).as("__v"))
      .select(col(outId), posexplode(array((0 until m).map(i =>
        slice(col("__v"), i * subDim + 1, subDim)): _*)).as(Seq("sub_id", "sv")))

  /** The PQ codebook: the deterministic stride subset
    * (id % stride == 0 && id < k·stride) sliced per subspace →
    * (c_id, c_sub, cv). Single source of truth for the codebook-selection
    * rule shared by [[pqEncode]], [[pqSearchAdc]] and [[ivfPqSearch]] — if
    * the rule changes, every ADC LUT follows automatically instead of
    * silently decoding against a different codebook.
    */
  private def pqCodebook(corpus: DataFrame, idCol: String, vecCol: String,
                         m: Int, subDim: Int, stride: Long, k: Int): DataFrame =
    subvectors(
        corpus.where(col(idCol) % stride === 0 && col(idCol) < k * stride),
        idCol, vecCol, "c_id", m, subDim)
      .select(col("c_id"), col("sub_id").as("c_sub"), col("sv").as("cv"))

  /** ‖a−b‖² as dot(a,a) − 2·dot(a,b) + dot(b,b): three native DotProduct
    * evaluations whose identical double arithmetic the DuckDB oracle
    * reproduces bit-for-bit.
    */
  private def sqDist(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Vectors.dot(a, a) - lit(2.0) * Vectors.dot(a, b) + Vectors.dot(b, b)

  /** Deterministic centroid subset: every `stride`-th id. Output:
    * (c_id, c_v, c_nrm), intended for broadcast.
    */
  def centroids(corpus: DataFrame, idCol: String, vecCol: String,
                stride: Long): DataFrame =
    corpus.where(col(idCol) % stride === 0)
      .select(col(idCol).as("c_id"), Vectors.toDoubleArray(col(vecCol)).as("c_v"))
      .withColumn("c_nrm", Vectors.norm(col("c_v")))

  /** Inverted-list assignment: each corpus vector to its single max-cosine
    * centroid (ties broken toward the smaller centroid id). Output:
    * (id, v, nrm, c_id, cosine).
    */
  def assign(corpus: DataFrame, cents: DataFrame, idCol: String,
             vecCol: String): DataFrame = {
    val v = corpus.select(col(idCol).as("id"), Vectors.toDoubleArray(col(vecCol)).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
    // score with the vector payload PROJECTED AWAY before any exchange
    // (guide: project before the exchange): the former row_number window
    // shuffled every (row x centroid) candidate WITH its full vector —
    // C x corpus bytes. Here the argmax runs over three scalars per
    // candidate as a partial-aggregating max over (cosine, -c_id), which
    // also collapses the C-way explosion map-side; the winning vector is
    // re-attached by one id-equi-join (the payload crosses the wire at
    // most once, and not at all when the narrow winner set broadcasts).
    // max(struct) reproduces the window's (cosine DESC, c_id ASC) choice
    // exactly, including NaN-sorts-largest.
    val winners = v.crossJoin(broadcast(cents))
      .select(col("id"),
        (Vectors.dot(col("v"), col("c_v")) / (col("nrm") * col("c_nrm"))).as("cosine"),
        col("c_id"))
      .groupBy(col("id"))
      .agg(max(struct(col("cosine"), (-col("c_id")).as("__negc"))).as("__m"))
      .select(col("id").as("__wid"), (-col("__m.__negc")).as("c_id"),
        col("__m.cosine").as("cosine"))
    v.join(winners, col("id") === col("__wid")).drop("__wid")
      .select(col("id"), col("v"), col("nrm"), col("c_id"), col("cosine"))
  }

  /** Product-quantization encode: split each vector into `m` contiguous
    * subvectors and snap each to its nearest codebook entry by squared L2
    * (ties toward the smaller code id). The codebook is the same
    * deterministic stride subset as [[centroids]], sliced per subspace —
    * at 100 TB it would be k-means-refined, but the assignment plan shape
    * is identical. Output: (id, sub_id, code, d2).
    *
    * Scale shape: the codebook is a FIXED m×k rows (k entries per
    * subspace, independent of corpus size — the defining property of PQ)
    * and broadcast; the corpus side is one linear pass emitting N·m
    * subvector rows, each scored against its subspace's codes — O(N·m·k)
    * codegen'd DotProduct loops, no corpus shuffle except the bounded
    * per-(id, sub) argmin window. ‖a−b‖² is computed as
    * dot(a,a) − 2·dot(a,b) + dot(b,b): three native DotProduct
    * evaluations whose identical double arithmetic the DuckDB oracle
    * reproduces bit-for-bit (a zip_with-difference lambda would interpret
    * per element AND have no oracle-stable ordering).
    */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               m: Int, dim: Int, stride: Long, k: Int = 16): DataFrame = {
    require(dim % m == 0, s"dim $dim must split into $m equal subspaces")
    val subDim = dim / m
    val corpusSubs = subvectors(corpus, idCol, vecCol, "id", m, subDim)
    val codebook = pqCodebook(corpus, idCol, vecCol, m, subDim, stride, k)
    val scored = corpusSubs.join(broadcast(codebook), col("sub_id") === col("c_sub"))
      .select(col("id"), col("sub_id"), col("c_id"),
        sqDist(col("sv"), col("cv")).as("d2"))
    // argmin per (id, sub) as a partial-aggregating min over (d2, c_id) —
    // same rationale as [[assign]]: collapse the k-way candidate explosion
    // map-side instead of shuffling it through a row_number window.
    // min(struct) reproduces (d2 ASC, c_id ASC) exactly (NaN sorts largest,
    // so it loses the min unless every candidate is NaN — as in the window).
    scored.groupBy(col("id"), col("sub_id"))
      .agg(min(struct(col("d2"), col("c_id"))).as("__m"))
      .select(col("id"), col("sub_id"), col("__m.c_id").as("code"),
        col("__m.d2").as("d2"))
  }

  /** ADC (asymmetric distance computation) top-k search over PQ codes —
    * the query path that completes the IVF/PQ compression story: the
    * corpus is represented ONLY by its m-byte codes ([[pqEncode]]); a
    * query precomputes a (sub_id, code) → squared-distance lookup table
    * against the codebook (Q·m·k doubles — broadcast), and each corpus
    * code row contributes one table lookup. approx_d2(q, x) =
    * Σ_sub ||q_sub − centroid(sub, code_x[sub])||².
    *
    * Scale shape: one broadcast-LUT join over the codes table (linear,
    * never touches the raw vectors), one partial-aggregated shuffle of
    * Q·N subspace rows, then a TWO-STAGE top-k — per-shuffle-partition
    * pruning before the per-query global rank — so no stage funnels a
    * query's full candidate stream through one task.
    *
    * Determinism: the per-(q, id) sum pivots the m subspace distances
    * into columns added in fixed left-to-right order (an unordered
    * SUM(double) is free to re-associate and drift ulps); ties rank by id.
    */
  def pqSearchAdc(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, m: Int, dim: Int, stride: Long,
                  k: Int = 16, topK: Int = 5): DataFrame = {
    require(dim % m == 0, s"dim $dim must split into $m equal subspaces")
    val subDim = dim / m
    val codes = pqEncode(corpus, idCol, vecCol, m, dim, stride, k)
      .select(col("id"), col("sub_id").as("x_sub"), col("code"))
    val codebook = pqCodebook(corpus, idCol, vecCol, m, subDim, stride, k)
    val lut = subvectors(queries, idCol, vecCol, "q_id", m, subDim)
      .join(codebook, col("sub_id") === col("c_sub"))
      .select(col("q_id"), col("sub_id"), col("c_id"),
        sqDist(col("sv"), col("cv")).as("d2q"))
    val perSub = codes.join(broadcast(lut),
        col("x_sub") === col("sub_id") && col("code") === col("c_id"))
      .where(col("id") =!= col("q_id"))
    // fixed-order sum: one column per subspace, added left to right
    val pivoted = perSub.groupBy(col("q_id"), col("id"))
      .pivot("sub_id", 0 until m).agg(first(col("d2q")))
    val adc = pivoted.select(col("q_id"), col("id"),
      (0 until m).map(i => col(i.toString)).reduceLeft(_ + _).as("adc_d2"))
    // stage 1: top-k within each shuffle partition (parallelism stays
    // partition-bound); stage 2: global rank over Q · partitions · topK
    // survivors — every global top-k row is in its partition's local top-k
    val wLocal = Window.partitionBy(col("q_id"), spark_partition_id())
      .orderBy(col("adc_d2").asc, col("id"))
    val wGlobal = Window.partitionBy(col("q_id"))
      .orderBy(col("adc_d2").asc, col("id"))
    adc.withColumn("__lr", row_number().over(wLocal)).where(col("__lr") <= topK)
      .withColumn("rank", row_number().over(wGlobal)).where(col("rank") <= topK)
      .select(col("q_id"), col("id").as("n_id"), col("adc_d2"), col("rank"))
  }

  /** IVF-PQ search — the two prunings composed, which is the FAISS
    * `IVFx,PQy` shape an actual 100 TB vector corpus runs: IVF probing
    * bounds WHICH corpus rows are scored (nProbe inverted lists per query,
    * never the full corpus) and PQ/ADC bounds WHAT is read per scored row
    * (the m-byte code, never the raw vector). [[pqSearchAdc]] alone still
    * scans every code row per query; [[topKCosineIvf]] alone still reads
    * full vectors for the probed lists — this is the missing quadrant.
    *
    * Scale shape: candidate build is inverted-lists ⋈ broadcast(probes) —
    * corpus-partition-local, no corpus shuffle; scoring joins the codes
    * table on id (both sides corpus-keyed; at scale the codes table is
    * bucketed by id and the join is exchange-free) with the broadcast
    * (q, sub, code) → d² LUT; the per-(q, id) sum is the fixed-order
    * pivot (unordered double SUMs re-associate), and the final top-k is
    * TWO-STAGE (per-partition prune, then the bounded global rank).
    */
  def ivfPqSearch(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, m: Int, dim: Int, stride: Long,
                  k: Int = 16, nProbe: Int = 8, topK: Int = 5): DataFrame = {
    require(dim % m == 0, s"dim $dim must split into $m equal subspaces")
    val subDim = dim / m
    val cents = centroids(corpus, idCol, vecCol, stride)
    val lists = assign(corpus, cents, idCol, vecCol)
      .select(col("id"), col("c_id"))
      .localCheckpoint(eager = true)
    val q = queries.select(col(idCol).as("q_id"),
        Vectors.toDoubleArray(col(vecCol)).as("q_v"))
      .withColumn("q_nrm", Vectors.norm(col("q_v")))
    val probeW = Window.partitionBy("q_id").orderBy(col("p_cos").desc, col("c_id"))
    val probes = q.crossJoin(broadcast(cents))
      .select(col("q_id"), col("c_id"),
        (Vectors.dot(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm"))).as("p_cos"))
      .withColumn("__pr", row_number().over(probeW))
      .where(col("__pr") <= nProbe)
      .select(col("q_id"), col("c_id"))
    val cand = lists.join(broadcast(probes), Seq("c_id"))
      .where(col("q_id") =!= col("id"))
      .select(col("q_id"), col("id"))
    val codes = pqEncode(corpus, idCol, vecCol, m, dim, stride, k)
      .select(col("id"), col("sub_id").as("x_sub"), col("code"))
    val codebook = pqCodebook(corpus, idCol, vecCol, m, subDim, stride, k)
    val lut = subvectors(queries, idCol, vecCol, "q_id", m, subDim)
      .join(codebook, col("sub_id") === col("c_sub"))
      .select(col("q_id").as("l_q"), col("sub_id"), col("c_id"),
        sqDist(col("sv"), col("cv")).as("d2q"))
    val perSub = codes.join(cand, Seq("id"))
      .join(broadcast(lut),
        col("x_sub") === col("sub_id") && col("code") === col("c_id")
          && col("q_id") === col("l_q"))
    val pivoted = perSub.groupBy(col("q_id"), col("id"))
      .pivot("sub_id", 0 until m).agg(first(col("d2q")))
    val adc = pivoted.select(col("q_id"), col("id"),
      (0 until m).map(i => col(i.toString)).reduceLeft(_ + _).as("adc_d2"))
    val wLocal = Window.partitionBy(col("q_id"), spark_partition_id())
      .orderBy(col("adc_d2").asc, col("id"))
    val wGlobal = Window.partitionBy(col("q_id"))
      .orderBy(col("adc_d2").asc, col("id"))
    adc.withColumn("__lr", row_number().over(wLocal)).where(col("__lr") <= topK)
      .withColumn("rank", row_number().over(wGlobal)).where(col("rank") <= topK)
      .select(col("q_id"), col("id").as("n_id"), col("adc_d2"), col("rank"))
  }

  /** One Lloyd (k-means) refinement step over the stride-seeded centroids:
    * assign every vector to its max-cosine centroid, then recompute each
    * centroid as the per-dimension mean of its members. Output exploded as
    * (c_id, pos, n_members, mean) so every recomputed coordinate is
    * oracle-checkable.
    *
    * Scale shape: the assignment is the same broadcast-centroid linear pass
    * as [[assign]]; the mean is a per-(centroid, dimension) sorted window —
    * each group holds one inverted list's coordinates, so the sort is a
    * bounded per-group pass after ONE shuffle on (c_id, pos). The sum is an
    * ORDERED left-to-right double fold (member-id order): pinning the
    * association is what makes the float mean reproducible across engines
    * and retries — an unordered SUM(double) is free to re-associate and
    * drift ulps per run. (A decimal-exact unordered sum was measured as a
    * dead end: decimal(38,15)→double conversion itself differs across
    * engines by 1 ulp, so exactness upstream doesn't survive the cast.)
    */
  def lloydStep(corpus: DataFrame, idCol: String, vecCol: String,
                stride: Long): DataFrame = {
    val wCum = Window.partitionBy("c_id", "pos").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    assign(corpus, centroids(corpus, idCol, vecCol, stride), idCol, vecCol)
      .select(col("id"), col("c_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .withColumn("__cum", sum(col("x")).over(wCum))
      .groupBy(col("c_id"), col("pos"))
      // max over (id, cum) structs picks the fold's FINAL value — ids are
      // unique so the struct max is the last-by-id row's cum
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("id"), col("__cum"))).getField("__cum").as("__sx"))
      .select(col("c_id"), col("pos"), col("n_members"),
        (col("__sx") / col("n_members")).as("mean"))
  }

  /** k-means TRAINING loop: `iters` Lloyd refinements from the stride
    * seeds, emitting a per-iteration convergence trace —
    * (iter, c_id, n_members, shift) where `shift` is ‖c_new − c_old‖²
    * (the quantity a production trainer thresholds to stop early).
    *
    * Scale shape per iteration: ONE broadcast-centroid linear pass over
    * the corpus (the [[assign]] shape — the corpus is prepared once and
    * localCheckpoint'd, so iterations re-read materialized blocks, not
    * the parquet scan), one (c_id, pos) shuffle for the ordered-fold
    * means, and centroid-sized (C rows, C ≈ √N) maintenance joins. The
    * recomputed centroid ARRAYS are reassembled with a bounded per-
    * centroid sort (dim entries) and checkpointed — each iteration's
    * lineage is cut, so the plan does not grow with `iters`.
    *
    * Determinism: means use the same member-id-pinned fold as
    * [[lloydStep]]; `shift` is a pos-pinned left fold of exact squared
    * differences; a centroid that loses every member simply drops out of
    * that iteration's trace and the following assignments (both engines
    * replay the same rule).
    */
  def lloydTrain(corpus: DataFrame, idCol: String, vecCol: String,
                 stride: Long, iters: Int = 3): DataFrame = {
    val wCum = Window.partitionBy("c_id", "pos").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val v = corpus
      .select(col(idCol).as("id"), Vectors.toDoubleArray(col(vecCol)).as("v"))
      .localCheckpoint(eager = true)
    var cents = centroids(corpus, idCol, vecCol, stride)
    val trace = (1 to iters).map { it =>
      val means = assign(v, cents, "id", "v")
        .select(col("id"), col("c_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .withColumn("__cum", sum(col("x")).over(wCum))
        .groupBy(col("c_id"), col("pos"))
        .agg(count(lit(1)).as("n_members"),
          max(struct(col("id"), col("__cum"))).getField("__cum").as("__sx"))
        .select(col("c_id"), col("pos"), col("n_members"),
          (col("__sx") / col("n_members")).as("mean"))
        .localCheckpoint(eager = true) // C·dim rows; cut the per-iter lineage
      val old = cents.select(col("c_id"), posexplode(col("c_v")).as(Seq("pos", "old_x")))
      val shifted = means.join(old, Seq("c_id", "pos"))
        .select(col("c_id"), col("pos"), col("n_members"),
          ((col("mean") - col("old_x")) * (col("mean") - col("old_x"))).as("d2"))
        .groupBy(col("c_id"))
        .agg(max(col("n_members")).as("n_members"),
          aggregate(
            transform(array_sort(collect_list(struct(col("pos"), col("d2")))),
              x => x.getField("d2")),
            lit(0.0), (acc, x) => acc + x).as("shift"))
        .select(lit(it).as("iter"), col("c_id"), col("n_members"), col("shift"))
      cents = means.groupBy(col("c_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mean")))),
          x => x.getField("mean")).as("c_v"))
        .withColumn("c_nrm", Vectors.norm(col("c_v")))
      shifted
    }
    trace.reduce(_ unionAll _)
  }

  /** Approximate top-k cosine neighbors via IVF probing. `queries` must be
    * small (broadcast). Output: (q_id, n_id, cosine, rank).
    */
  def topKCosineIvf(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int, stride: Long = 32,
                    nProbe: Int = 8): DataFrame = {
    val cents = centroids(corpus, idCol, vecCol, stride)
    // inverted lists, built once; reused across every query probe. Eager
    // localCheckpoint rather than persist: blocks are ContextCleaner-
    // reclaimed when the result is dropped, so repeated calls in one
    // session don't accumulate cache entries.
    val lists = assign(corpus, cents, idCol, vecCol)
      .select(col("id").as("n_id"), col("v").as("n_v"), col("nrm").as("n_nrm"),
        col("c_id"))
      .localCheckpoint(eager = true)
    val q = queries.select(col(idCol).as("q_id"), Vectors.toDoubleArray(col(vecCol)).as("q_v"))
      .withColumn("q_nrm", Vectors.norm(col("q_v")))
    // nProbe closest centroids per query
    val probeW = Window.partitionBy("q_id").orderBy(col("p_cos").desc, col("c_id"))
    val probes = q.crossJoin(broadcast(cents))
      .select(col("q_id"), col("q_v"), col("q_nrm"), col("c_id"),
        (Vectors.dot(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm"))).as("p_cos"))
      .withColumn("__pr", row_number().over(probeW))
      .where(col("__pr") <= nProbe)
      .select(col("q_id"), col("q_v"), col("q_nrm"), col("c_id"))
    // brute-force within the probed lists only
    val scored = lists.join(broadcast(probes), Seq("c_id"))
      .where(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (Vectors.dot(col("q_v"), col("n_v")) /
          (col("q_nrm") * col("n_nrm"))).as("cosine"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}

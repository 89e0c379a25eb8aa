package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality / profiling surface (SURVEY §2.B) — the pre-ingest checks a
  * production pipeline runs before trusting a feed (the Deequ/expectations
  * shape). Everything is partial-agg friendly: profiles and rule checks are
  * single aggregation passes, and the referential-integrity rule is a join
  * whose violation count folds into the same output schema.
  */
object QualityQueries {

  private val profileCols = Seq("l_quantity", "l_extendedprice", "l_discount")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-column profile as one union branch per column, NOT one wide agg:
    // N count(distinct)s in a single Aggregate plan one Expand (×N rows
    // through the partial agg — measured 1.5s), while a single-distinct
    // agg per column plans the two-stage distinct with no Expand, each
    // branch scans just its own pruned column, and the branches run as
    // parallel stages of one job (measured 1.1s). At 100 TB the same
    // trade holds: N pruned column scans beat ×N row inflation through
    // the shuffle, and approx_count_distinct would collapse it to one
    // pass anyway.
    "dq_profile" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      profileCols.map { c =>
        li.select(col(c))
          .agg(count(col(c)).as("non_null"),
            countDistinct(col(c)).as("n_distinct"),
            min(col(c)).cast("double").as("min_val"),
            max(col(c)).cast("double").as("max_val"))
          .select(lit(c).as("col_name"), col("non_null"), col("n_distinct"),
            col("min_val"), col("max_val"))
      }.reduce(_ unionByName _)
        .orderBy("col_name")
    },

    // rule-based expectations: per-rule (violations, checked) counts.
    // Each table contributes one conditional-sum aggregation pass; the
    // referential-integrity rule (every lineitem has its order) is a left
    // join + null-count — the join shuffles on the key like any fact-fact
    // join and AQE handles skew; nothing here collects to the driver.
    "dq_rules" -> { (s, dir) =>
      def viol(c: Column): Column = sum(when(c, 1L).otherwise(0L))
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val oAgg = o.agg(
        viol(col("o_totalprice") <= 0).as("v1"),
        viol(!col("o_orderstatus").isin("O", "F", "P")).as("v2"),
        viol(col("o_orderdate").isNull).as("v3"),
        count(lit(1)).as("n"))
        .selectExpr("stack(3, " +
          "'o_totalprice_positive', v1, n, " +
          "'o_status_domain', v2, n, " +
          "'o_orderdate_not_null', v3, n) AS (rule, n_violations, n_checked)")
      val lAgg = li.agg(
        viol(col("l_quantity") <= 0 || col("l_quantity") > 50).as("v1"),
        viol(col("l_discount") < 0 || col("l_discount") > 0.5).as("v2"),
        viol(col("l_shipdate").isNull).as("v3"),
        count(lit(1)).as("n"))
        .selectExpr("stack(3, " +
          "'l_quantity_range', v1, n, " +
          "'l_discount_range', v2, n, " +
          "'l_shipdate_not_null', v3, n) AS (rule, n_violations, n_checked)")
      val ri = li.select(col("l_orderkey"))
        .join(o.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left")
        .agg(viol(col("o_orderkey").isNull).as("v"), count(lit(1)).as("n"))
        .select(lit("ri_lineitem_has_order").as("rule"),
          col("v").as("n_violations"), col("n").as("n_checked"))
      oAgg.unionByName(lAgg).unionByName(ri).orderBy("rule")
    },

    // feed-volume anomaly detection: hours whose event count exceeds
    // mean + 2σ of that type's hourly counts. Counts and power sums are
    // exact LONGs (one partial-agg pass over the hourly rollup), the
    // threshold is per-group double arithmetic after — the q37/q38
    // determinism pattern on a time series. The per-type stats are a
    // bounded broadcast (one row per event type)
    "dq_anomaly" -> { (s, dir) =>
      val hourly = Tables.events(s, dir)
        .select(col("event_type"),
          unix_timestamp(date_trunc("hour", col("ts"))).as("hour_sec"))
        .groupBy(col("event_type"), col("hour_sec"))
        .agg(count(lit(1)).as("n_events"))
      val st = hourly.groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("n_events")).as("sx"),
          sum(col("n_events") * col("n_events")).as("sxx"))
      val dsx = col("sx").cast("double")
      val dsxx = col("sxx").cast("double")
      val thresh = dsx / col("cnt") +
        lit(2.0) * sqrt((dsxx - dsx * dsx / col("cnt")) / (col("cnt") - lit(1)))
      hourly.join(broadcast(st), Seq("event_type"))
        .where(col("n_events") > thresh)
        .select(col("event_type"), col("hour_sec"), col("n_events"))
        .orderBy("event_type", "hour_sec")
    },

    // distribution drift between two ingest epochs (the feed-changed-
    // under-us check): fixed price buckets, epoch histograms full-outer
    // joined, per-bucket L1 contribution |cnt_a·tot_b − cnt_b·tot_a| as
    // EXACT integer arithmetic — cross-multiplying by the totals instead
    // of comparing float shares means no float accumulation exists
    // anywhere, so distributed merge order can't move the score. The
    // share_diff double derives per row from two exact longs (single
    // IEEE division). Epoch B's price is shifted for every 3rd key so
    // the drift is real. Totals broadcast as a one-row cross join (q22)
    "dq_drift" -> { (s, dir) =>
      def bucketOf(c: Column): Column =
        least(floor(c / 20000).cast("long"), lit(9L))
      val o = Tables.orders(s, dir)
      val a = o.where(col("o_orderkey") % 2 === 0)
        .groupBy(bucketOf(col("o_totalprice")).as("bucket"))
        .agg(count(lit(1)).as("cnt_a"))
      val shifted = when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 10000)
        .otherwise(col("o_totalprice"))
      val b = o.where(col("o_orderkey") % 2 === 1)
        .groupBy(bucketOf(shifted).as("bucket"))
        .agg(count(lit(1)).as("cnt_b"))
      val j = a.join(b, Seq("bucket"), "full_outer")
        .select(col("bucket"), coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
          coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
      val tot = j.agg(sum(col("cnt_a")).as("tot_a"), sum(col("cnt_b")).as("tot_b"))
      j.crossJoin(broadcast(tot))
        .select(col("bucket"), col("cnt_a"), col("cnt_b"),
          abs(col("cnt_a") * col("tot_b") - col("cnt_b") * col("tot_a"))
            .as("l1_num"),
          (abs(col("cnt_a") * col("tot_b") - col("cnt_b") * col("tot_a"))
            .cast("double") / (col("tot_a") * col("tot_b")).cast("double"))
            .as("share_diff"))
        .orderBy("bucket")
    },

    // incrementally-maintained grouped percentiles: two epoch deltas each
    // aggregate a per-nation KLL quantile sketch (values never shuffle —
    // one ~O(k) sketch per group per partial), then IncrementalAgg.merge
    // folds delta into state with MergeKll exactly as a stored rollup
    // would, and p50/p95 read out of the MERGED sketch. Runs in the
    // sketch's EXACT regime (k=8192 ≥ any group size through sf1 — no
    // compaction ever happens), so merged quantiles ARE the order
    // statistics at rank ceil(r·n) and DuckDB replays them by ROW_NUMBER
    // pick; the approximation regime is bounds-asserted in KllSketchSpec
    // (mirrors dq_heavy_hitters' VALUE-gate split)
    // audience overlap via theta sketches (the set-algebra statistic HLL
    // cannot answer): per event_type, the distinct-user set of heavy
    // users (>=8 events of that type) as ONE mergeable sketch; every
    // pairwise intersection then reads from the 5-row rollup — at 100 TB
    // the raw-key re-shuffle per pair is replaced by kilobytes of stored
    // state. Runs in the theta EXACT regime (k >> users), so estimates
    // are true cardinalities and DuckDB replays them as exact counts
    "dq_overlap_sketch" -> { (s, dir) =>
      import graft.expressions.ThetaSketchAgg
      val heavy = Tables.events(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .where(col("n") >= 8)
      val sk = heavy.groupBy(col("event_type"))
        .agg(ThetaSketchAgg.thetaSketch(col("user_id"), 4096).as("sk"),
          count(lit(1)).as("n_users"))
        .localCheckpoint()
      sk.as("a").join(sk.as("b"),
          col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"),
          col("a.n_users").as("n_a"), col("b.n_users").as("n_b"),
          ThetaSketchAgg.thetaIntersectCount(col("a.sk"), col("b.sk"))
            .as("n_overlap"))
        .orderBy("type_a", "type_b")
    },

    "dq_quantile_rollup" -> { (s, dir) =>
      import graft.expressions.KllSketchAgg
      val c = Tables.customer(s, dir)
      def delta(p: Int): DataFrame = c.where(col("c_custkey") % 2 === p)
        .groupBy(col("c_nationkey").cast("long").as("nation"))
        .agg(KllSketchAgg.kllSketch(col("c_acctbal"), 8192).as("sk"))
      val merged = graft.operators.IncrementalAgg.merge(
        delta(0), delta(1), Seq("nation"),
        Seq("sk" -> graft.operators.IncrementalAgg.MergeKll))
      merged.select(col("nation"),
        KllSketchAgg.kllCount(col("sk")).as("n_vals"),
        KllSketchAgg.kllQuantile(col("sk"), 0.5).as("p50"),
        KllSketchAgg.kllQuantile(col("sk"), 0.95).as("p95"))
        .orderBy("nation")
    },

    // the same incremental-quantile fold authored as PURE SQL through the
    // GraftExtensions-registered kll_* functions (sketch, merge via
    // full-outer join, quantile/count read-out) — the SQL-only user
    // reaches the identical mergeable-percentiles machinery; same oracle
    // as dq_quantile_rollup
    // the theta set-algebra machinery reached from PURE SQL (the
    // GraftExtensions-registered theta_* functions): dq_overlap_sketch's
    // audience overlap authored as spark.sql text, PLUS the union
    // cardinality theta_count(theta_union(a,b)) — all four registered
    // functions in one statement. Exact regime (k >> users), so DuckDB
    // replays exact counts: n_union must equal n_a + n_b − n_overlap
    "theta_sql_surface" -> { (s, dir) =>
      graft.GraftExtensions.register(s)
      Tables.events(s, dir).createOrReplaceTempView("graft_theta_events")
      s.sql("""WITH heavy AS (SELECT event_type, user_id
              |  FROM graft_theta_events GROUP BY 1, 2 HAVING count(*) >= 8),
              |sk AS (SELECT event_type, theta_sketch(user_id, 4096) AS sk,
              |    count(*) AS n_users
              |  FROM heavy GROUP BY 1)
              |SELECT a.event_type AS type_a, b.event_type AS type_b,
              |  a.n_users AS n_a, b.n_users AS n_b,
              |  theta_intersect_count(a.sk, b.sk) AS n_overlap,
              |  theta_count(theta_union(a.sk, b.sk)) AS n_union
              |FROM sk a JOIN sk b ON a.event_type < b.event_type
              |ORDER BY 1, 2""".stripMargin)
    },

    "kll_sql_surface" -> { (s, dir) =>
      graft.GraftExtensions.register(s)
      Tables.customer(s, dir).createOrReplaceTempView("graft_kll_customer")
      s.sql("""WITH d0 AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
              |    kll_sketch(c_acctbal, 8192) AS sk
              |  FROM graft_kll_customer WHERE c_custkey % 2 = 0 GROUP BY 1),
              |d1 AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
              |    kll_sketch(c_acctbal, 8192) AS sk
              |  FROM graft_kll_customer WHERE c_custkey % 2 = 1 GROUP BY 1),
              |m AS (SELECT COALESCE(d0.nation, d1.nation) AS nation,
              |    kll_merge(d0.sk, d1.sk) AS sk
              |  FROM d0 FULL OUTER JOIN d1 ON d0.nation = d1.nation)
              |SELECT nation, kll_count(sk) AS n_vals,
              |  kll_quantile(sk, CAST(0.5 AS DOUBLE)) AS p50,
              |  kll_quantile(sk, CAST(0.95 AS DOUBLE)) AS p95
              |FROM m ORDER BY nation""".stripMargin)
    },

    // Kolmogorov–Smirnov drift statistic between the same two epochs as
    // dq_drift: max CDF gap over the bucketed distribution, kept EXACT by
    // cross-multiplied integers (|cum_a·tot_b − cum_b·tot_a| — no float
    // CDF anywhere, so merge order and engine cannot move the answer).
    // The cumulative runs over the FIXED bucket domain (≤10 rows — a
    // bounded rollup, not a data-sized window); ks_ppm fits a LONG
    // through ~sf10, widen to decimal beyond (same plan)
    "dq_ks" -> { (s, dir) =>
      def bucketOf(c: Column): Column =
        least(floor(c / 20000).cast("long"), lit(9L))
      val o = Tables.orders(s, dir)
      val a = o.where(col("o_orderkey") % 2 === 0)
        .groupBy(bucketOf(col("o_totalprice")).as("bucket"))
        .agg(count(lit(1)).as("cnt_a"))
      val shifted = when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 10000)
        .otherwise(col("o_totalprice"))
      val b = o.where(col("o_orderkey") % 2 === 1)
        .groupBy(bucketOf(shifted).as("bucket"))
        .agg(count(lit(1)).as("cnt_b"))
      val j = a.join(b, Seq("bucket"), "full_outer")
        .select(col("bucket"), coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
          coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val cum = j.select(col("bucket"),
        sum(col("cnt_a")).over(w).as("cum_a"),
        sum(col("cnt_b")).over(w).as("cum_b"))
      val tot = j.agg(sum(col("cnt_a")).as("tot_a"), sum(col("cnt_b")).as("tot_b"))
      cum.crossJoin(broadcast(tot))
        .agg(
          max(abs(col("cum_a") * col("tot_b") - col("cum_b") * col("tot_a")))
            .as("ks_num"),
          max(col("tot_a")).as("tot_a"), max(col("tot_b")).as("tot_b"))
        .select(col("ks_num"), col("tot_a"), col("tot_b"),
          expr("ks_num * 1000000L div (tot_a * tot_b)").as("ks_ppm"))
    },

    // ingestion freshness: per-event-type lag behind the stream head —
    // the "is a source stalled" monitor over a landed event table. The
    // head is a 1-row aggregate broadcast back (never a driver count);
    // one linear shuffle on event_type
    "dq_freshness" -> { (s, dir) =>
      val per = Tables.events(s, dir)
        .select(col("event_type"),
          floor(unix_timestamp(col("ts"))).cast("long").as("sec"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), max(col("sec")).as("latest_sec"))
      val head = per.agg(max(col("latest_sec")).as("head_sec"))
      per.crossJoin(broadcast(head))
        .select(col("event_type"), col("n_events"), col("latest_sec"),
          (col("head_sec") - col("latest_sec")).as("lag_sec"),
          (col("head_sec") - col("latest_sec") > 3600).as("stalled"))
        .orderBy("event_type")
    },

    // key-uniqueness expectations (the Deequ uniqueness shape): per
    // candidate key, total rows, duplicated key values, and rows involved
    // in a duplicate — declared PKs should report zeros, the weaker
    // business keys report their true collision mass. Each key is one
    // groupBy count + a filtered 1-row rollup; keys union into the report
    "dq_uniqueness" -> { (s, dir) =>
      def key(name: String, df: DataFrame, cols: Seq[String]): DataFrame = {
        val grouped = df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("cnt"))
        val dups = grouped.where(col("cnt") > 1)
          .agg(count(lit(1)).as("n_dup_keys"), sum(col("cnt")).as("n_dup_rows"))
        df.agg(count(lit(1)).as("n_rows")).crossJoin(dups)
          .select(lit(name).as("key_name"), col("n_rows"),
            coalesce(col("n_dup_keys"), lit(0L)).as("n_dup_keys"),
            coalesce(col("n_dup_rows"), lit(0L)).as("n_dup_rows"))
      }
      Seq(
        key("orders.pk", Tables.orders(s, dir), Seq("o_orderkey")),
        key("lineitem.pk", Tables.lineitem(s, dir),
          Seq("l_orderkey", "l_linenumber")),
        key("lineitem.order_part", Tables.lineitem(s, dir),
          Seq("l_orderkey", "l_partkey")),
        key("orders.cust_date", Tables.orders(s, dir),
          Seq("o_custkey", "o_orderdate")),
        key("events.pk", Tables.events(s, dir), Seq("event_id")))
        .reduce(_ unionAll _).orderBy("key_name")
    },

    // per-day completeness trend of a sparse measure (the "did a field
    // quietly stop arriving" monitor): one partial-agg pass over the feed,
    // grouped by UTC epoch day — count(col) vs count(*) gives the null
    // share without a second scan. The trend complements dq_anomaly
    // (volume) and dq_freshness (lag) as the third per-day health signal
    "dq_completeness" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(floor(unix_timestamp(col("ts")) / 86400).cast("long").as("day_num"),
          when(col("event_id") % 4 === 0, col("value")).as("reading"))
        .groupBy(col("day_num"))
        .agg(count(lit(1)).as("n_rows"), count(col("reading")).as("n_present"))
        .select(col("day_num"), col("n_rows"), col("n_present"),
          (col("n_present").cast("double") / col("n_rows").cast("double"))
            .as("completeness"))
        .orderBy("day_num")
    },

    // the Misra–Gries heavy-hitters aggregate under the VALUE gate: with
    // capacity (64) above the key cardinality (11 event types) the sketch
    // never decrements, so its estimates are exactly the true counts on
    // ANY merge tree and the custom TypedImperativeAggregate is
    // value-checked against a plain GROUP BY. At real cardinalities the
    // same plan ships k counters per partition instead of shuffling the
    // key stream — the approximation regime is bounds-asserted in
    // FreqSketchSpec.
    "dq_heavy_hitters" -> { (s, dir) =>
      Tables.events(s, dir)
        .agg(graft.expressions.FreqSketchAgg.freqSketch(col("event_type"), 64).as("sk"))
        .select(explode(col("sk")).as("s"))
        .select(col("s.item").as("event_type"), col("s.est").as("n_events"))
        .orderBy(col("n_events").desc, col("event_type"))
    },

    // referential-integrity sweep over the FK graph: per edge, total rows
    // and orphans (fact keys with no matching dimension row). Each edge is
    // one left-anti join — linear shuffles, no collect; the per-edge
    // 1-row aggregates union into the report. At 100 TB the big edges
    // (lineitem→orders) are plain shuffle joins AQE can re-plan; the small
    // dims broadcast automatically.
    "dq_referential" -> { (s, dir) =>
      def edge(name: String, fact: DataFrame, fk: Seq[String],
               dim: DataFrame, pk: Seq[String]): DataFrame = {
        // plain equality, not null-safe: a NULL fk matches nothing and
        // counts as an orphan, same as the oracle's NOT EXISTS
        val cond = fk.zip(pk).map { case (f, p) => fact(f) === dim(p) }
          .reduce(_ && _)
        val orphans = fact.join(dim, cond, "left_anti")
        fact.agg(count(lit(1)).as("n_rows"))
          .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
          .select(lit(name).as("fk"), col("n_rows"), col("n_orphans"))
      }
      val edges = Seq(
        edge("customer.nationkey", Tables.customer(s, dir), Seq("c_nationkey"),
          Tables.nation(s, dir), Seq("n_nationkey")),
        edge("lineitem.orderkey", Tables.lineitem(s, dir), Seq("l_orderkey"),
          Tables.orders(s, dir), Seq("o_orderkey")),
        edge("lineitem.partkey", Tables.lineitem(s, dir), Seq("l_partkey"),
          Tables.part(s, dir), Seq("p_partkey")),
        edge("lineitem.suppkey", Tables.lineitem(s, dir), Seq("l_suppkey"),
          Tables.supplier(s, dir), Seq("s_suppkey")),
        edge("nation.regionkey", Tables.nation(s, dir), Seq("n_regionkey"),
          Tables.region(s, dir), Seq("r_regionkey")),
        edge("orders.custkey", Tables.orders(s, dir), Seq("o_custkey"),
          Tables.customer(s, dir), Seq("c_custkey")),
        edge("supplier.nationkey", Tables.supplier(s, dir), Seq("s_nationkey"),
          Tables.nation(s, dir), Seq("n_nationkey")))
      edges.reduce(_ unionAll _).orderBy("fk")
    },

    // weekday seasonality profile (the expected-volume baseline the
    // anomaly monitor calibrates against): per day-of-week event counts +
    // exact ppm share. Day-of-week is pure integer arithmetic on the
    // epoch day ((day + 4) % 7, day 0 = Thursday) — engine dayofweek()
    // builtins disagree on 0- vs 1-based and week start, integer math
    // can't. One partial-agg pass + a broadcast 1-row total
    // join-key skew census (the "measure, don't guess" preflight for every
    // shuffle join on this key): the 10 heaviest l_partkey values with
    // their row share. One linear hash count, then a DISTRIBUTED top-k
    // (orderBy+limit plans TakeOrdered — per-partition heaps + driver
    // merge of 10 rows, never a global sort or single-task window). Total
    // via a 1-row broadcast; share = one IEEE division of exact longs.
    // A key landing here is the salting / skew-join candidate list
    "dq_key_skew" -> { (s, dir) =>
      val c = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
      val tot = c.agg(sum(col("cnt")).as("total"))
      c.crossJoin(broadcast(tot))
        .select(col("l_partkey"), col("cnt"),
          (col("cnt").cast("double") / col("total")).as("share"))
        .orderBy(col("cnt").desc, col("l_partkey"))
        .limit(10)
    },

    "dq_weekday_profile" -> { (s, dir) =>
      val d = Tables.events(s, dir)
        .select(expr("(unix_timestamp(ts) div 86400 + 4) % 7")
          .cast("long").as("dow"))
        .groupBy(col("dow"))
        .agg(count(lit(1)).as("n_events"))
      val tot = d.agg(sum(col("n_events")).as("total"))
      d.crossJoin(broadcast(tot))
        .select(col("dow"), col("n_events"),
          expr("(n_events * 1000000) div total").as("ppm"))
        .orderBy("dow")
    },

    // cross-table consistency rules (the expectations dq_rules can't see:
    // they need the JOINED pair). One fact-fact join on the order key —
    // shuffled, AQE-replannable, like any lineitem⋈orders — then one
    // conditional-sum pass stacked into per-rule rows. Exact integer day
    // diffs (q41's idiom); no second scan per rule
    "dq_cross_field" -> { (s, dir) =>
      def viol(c: Column): Column = sum(when(c, 1L).otherwise(0L))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship"),
          col("l_extendedprice"))
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), to_date(col("o_orderdate")).as("ordered"),
            col("o_totalprice")),
          col("l_orderkey") === col("o_orderkey"))
        .agg(
          viol(col("ship") < col("ordered")).as("v1"),
          viol(datediff(col("ship"), col("ordered")) > 60).as("v2"),
          viol(col("l_extendedprice") > col("o_totalprice")).as("v3"),
          count(lit(1)).as("n"))
        .selectExpr("stack(3, " +
          "'ship_before_order', v1, n, " +
          "'ship_over_60d', v2, n, " +
          "'line_exceeds_order_total', v3, n) AS (rule, n_violations, n_checked)")
        .orderBy("rule")
    },

    // Benford first-digit audit (the fabricated-feed smell test): observed
    // leading-digit distribution of order totals. The digit comes from the
    // DECIMAL STRING of exact integer cents — never floor(x/10^floor(log10 x)),
    // whose log10 drifts an ulp across engines at decade boundaries. Share
    // is exact parts-per-million integer division (single-pass counts + a
    // broadcast 1-row total); comparing against the Benford expectation is
    // the caller's last step
    "dq_benford" -> { (s, dir) =>
      val digits = Tables.orders(s, dir)
        .select(substring(floor(col("o_totalprice") * 100).cast("long")
          .cast("string"), 1, 1).as("digit"))
        .groupBy(col("digit"))
        .agg(count(lit(1)).as("n"))
      val tot = digits.agg(sum(col("n")).as("total"))
      digits.crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          expr("(n * 1000000) div total").as("ppm"))
        .orderBy("digit")
    },

    // per-user out-of-order arrival audit (the watermark-sizing input):
    // how disordered is the feed, per emitting key? lag() over the HIGH-
    // cardinality user key in arrival order (event_id) flags events whose
    // event time steps backwards, and the max backstep bounds the
    // watermark delay a streaming consumer needs. One window pass over a
    // per-user partition — the sessionize scaling contract, never a
    // global or low-cardinality window
    "dq_out_of_order" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          floor(unix_timestamp(col("ts"))).cast("long").as("sec"))
        .withColumn("prev_sec", lag(col("sec"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("sec") < col("prev_sec"), 1L).otherwise(0L))
            .as("n_backsteps"),
          max(when(col("sec") < col("prev_sec"), col("prev_sec") - col("sec")))
            .as("max_backstep_sec"))
        .select(col("user_id"), col("n_events"), col("n_backsteps"),
          coalesce(col("max_backstep_sec"), lit(0L)).as("max_backstep_sec"))
        .orderBy("user_id")
    },

    // equi-depth histogram (the ANALYZE-style stats a range partitioner
    // needs — q33 is the equi-WIDTH twin): 8 buckets of equal row count,
    // boundaries from exact rank arithmetic over the range-partitioned
    // GlobalRank (never a single-task ntile window); per-bucket min/max
    // ARE the split points, exact cents end to end
    "dq_equidepth" -> { (s, dir) =>
      val base = Tables.orders(s, dir)
        .select(floor(col("o_totalprice") * 100).cast("long").as("cents"),
          col("o_orderkey"))
      val ranked = graft.operators.GlobalRank.withGlobalRank(
        base, Seq(col("cents"), col("o_orderkey")), "r")
      val tot = base.agg(count(lit(1)).as("n"))
      ranked.crossJoin(broadcast(tot))
        .select(expr("((r - 1) * 8) DIV n").as("bucket"), col("cents"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("cents")).as("lo_cents"), max(col("cents")).as("hi_cents"))
        .orderBy("bucket")
    },

    // full pairwise correlation matrix of the feed's numeric columns in
    // ONE aggregation pass (the profiling matrix Deequ/EDA tools emit):
    // 4 columns → 14 exact DECIMAL power sums (n, Σx, Σx², Σxy per pair)
    // computed as independent map-side-combinable sums — no Expand, no
    // per-pair scan (6 corr() calls would plan 6 passes over the fact
    // table); the 1×1 result explodes into 6 pair rows and every r is the
    // same IEEE association as q38, so float arithmetic happens only
    // after aggregation on already-exact values
    "dq_corr_matrix" -> { (s, dir) =>
      val names = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      def dc(n: String): Column = col(n).cast("decimal(8,2)")
      val pairs = for {
        i <- names.indices; j <- names.indices if i < j
      } yield (names(i), names(j))
      // string-bridged casts: see Relational.dstr — native decimal→double
      // diverges by 1 ulp across engines past 2^53 unscaled
      def ds(c: Column): Column = c.cast("string").cast("double")
      val aggs = Seq(count(lit(1)).as("n")) ++
        names.map(n => ds(sum(dc(n))).as(s"s_$n")) ++
        names.map(n => ds(sum(dc(n) * dc(n))).as(s"ss_$n")) ++
        pairs.map { case (a, b) =>
          ds(sum(dc(a) * dc(b))).as(s"sp_${a}_$b")
        }
      val st = Tables.lineitem(s, dir).agg(aggs.head, aggs.tail: _*)
      val pairStructs = array(pairs.map { case (a, b) =>
        struct(lit(a).as("col_a"), lit(b).as("col_b"),
          col(s"s_$a").as("sx"), col(s"s_$b").as("sy"),
          col(s"ss_$a").as("sxx"), col(s"ss_$b").as("syy"),
          col(s"sp_${a}_$b").as("sxy"))
      }: _*)
      val nd = col("n").cast("double")
      st.select(col("n"), explode(pairStructs).as("p"))
        .select(col("p.col_a").as("col_a"), col("p.col_b").as("col_b"), col("n"),
          ((col("p.sxy") - col("p.sx") * col("p.sy") / nd) /
            (sqrt(col("p.sxx") - col("p.sx") * col("p.sx") / nd) *
              sqrt(col("p.syy") - col("p.sy") * col("p.sy") / nd))).as("corr"))
        .orderBy("col_a", "col_b")
    },

    // bad-row routing (the dead-letter-queue shape): rows failing any
    // expectation are materialized WITH their reasons — dq_rules counts
    // violations, this quarantines them. One codegen'd scan-transform
    // pass; concat_ws skips the NULL branches so reasons compose without
    // a per-rule pass
    "etl_quarantine" -> { (s, dir) =>
      val reasons = concat_ws(",",
        when(col("l_quantity") > 45, "qty_high"),
        when(col("l_discount") > 0.08, "disc_high"),
        when(col("l_tax") > 0.07, "tax_high"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), reasons.as("reasons"))
        .where(col("reasons") =!= "")
        .orderBy("l_orderkey", "l_linenumber")
    }
  )

  val oracle: Map[String, String] = Map(
    "dq_profile" ->
      """SELECT col_name, non_null, n_distinct, min_val, max_val FROM (
        |  SELECT 'l_quantity' AS col_name, count(l_quantity) AS non_null,
        |    count(DISTINCT l_quantity) AS n_distinct,
        |    CAST(min(l_quantity) AS DOUBLE) AS min_val,
        |    CAST(max(l_quantity) AS DOUBLE) AS max_val FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', count(l_extendedprice),
        |    count(DISTINCT l_extendedprice),
        |    CAST(min(l_extendedprice) AS DOUBLE),
        |    CAST(max(l_extendedprice) AS DOUBLE) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', count(l_discount),
        |    count(DISTINCT l_discount),
        |    CAST(min(l_discount) AS DOUBLE),
        |    CAST(max(l_discount) AS DOUBLE) FROM lineitem)
        |ORDER BY col_name""".stripMargin,

    "dq_equidepth" ->
      """WITH o AS (SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
        |  o_orderkey FROM orders),
        |r AS (SELECT cents,
        |  ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS rn,
        |  COUNT(*) OVER () AS n FROM o)
        |SELECT ((rn - 1) * 8) // n AS bucket, COUNT(*) AS n_rows,
        | MIN(cents) AS lo_cents, MAX(cents) AS hi_cents
        |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin,

    "dq_corr_matrix" ->
      """WITH st AS (SELECT COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS s_q,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS s_e,
        |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS s_d,
        |  CAST(CAST(SUM(CAST(l_tax AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS s_t,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_quantity AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS ss_q,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(8,2)) * CAST(l_extendedprice AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS ss_e,
        |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(8,2)) * CAST(l_discount AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS ss_d,
        |  CAST(CAST(SUM(CAST(l_tax AS DECIMAL(8,2)) * CAST(l_tax AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS ss_t,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_extendedprice AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS sp_qe,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_discount AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS sp_qd,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_tax AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS sp_qt,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(8,2)) * CAST(l_discount AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS sp_ed,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(8,2)) * CAST(l_tax AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS sp_et,
        |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(8,2)) * CAST(l_tax AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS sp_dt
        | FROM lineitem),
        |p AS (
        | SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, n,
        |   s_q AS sx, s_e AS sy, ss_q AS sxx, ss_e AS syy, sp_qe AS sxy FROM st
        | UNION ALL SELECT 'l_quantity', 'l_discount', n, s_q, s_d, ss_q, ss_d, sp_qd FROM st
        | UNION ALL SELECT 'l_quantity', 'l_tax', n, s_q, s_t, ss_q, ss_t, sp_qt FROM st
        | UNION ALL SELECT 'l_extendedprice', 'l_discount', n, s_e, s_d, ss_e, ss_d, sp_ed FROM st
        | UNION ALL SELECT 'l_extendedprice', 'l_tax', n, s_e, s_t, ss_e, ss_t, sp_et FROM st
        | UNION ALL SELECT 'l_discount', 'l_tax', n, s_d, s_t, ss_d, ss_t, sp_dt FROM st)
        |SELECT col_a, col_b, n,
        | (sxy - sx * sy / n) /
        |   (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) AS corr
        |FROM p ORDER BY col_a, col_b""".stripMargin,

    "dq_rules" ->
      """SELECT rule, n_violations, n_checked FROM (
        |  SELECT 'o_totalprice_positive' AS rule,
        |    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
        |    count(*) AS n_checked FROM orders
        |  UNION ALL
        |  SELECT 'o_status_domain',
        |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT),
        |    count(*) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate_not_null',
        |    CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(*) FROM orders
        |  UNION ALL
        |  SELECT 'l_quantity_range',
        |    CAST(sum(CASE WHEN l_quantity <= 0 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT),
        |    count(*) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount_range',
        |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.5 THEN 1 ELSE 0 END) AS BIGINT),
        |    count(*) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_shipdate_not_null',
        |    CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(*) FROM lineitem
        |  UNION ALL
        |  SELECT 'ri_lineitem_has_order',
        |    CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(*)
        |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |ORDER BY rule""".stripMargin,

    "dq_anomaly" ->
      """WITH hourly AS (
        |  SELECT event_type, FLOOR(epoch(date_trunc('hour', ts)))::BIGINT AS hour_sec,
        |    count(*) AS n_events
        |  FROM events GROUP BY event_type, hour_sec),
        |st AS (
        |  SELECT event_type, count(*) AS cnt,
        |    CAST(sum(n_events) AS BIGINT) AS sx,
        |    CAST(sum(n_events * n_events) AS BIGINT) AS sxx
        |  FROM hourly GROUP BY event_type)
        |SELECT h.event_type, h.hour_sec, h.n_events
        |FROM hourly h JOIN st USING (event_type)
        |WHERE h.n_events >
        |  CAST(sx AS DOUBLE) / cnt +
        |  2.0 * sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / cnt)
        |             / (cnt - 1))
        |ORDER BY event_type, hour_sec""".stripMargin,

    "dq_freshness" ->
      """WITH per AS (
        |  SELECT event_type, COUNT(*) AS n_events,
        |    MAX(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) AS latest_sec
        |  FROM events GROUP BY event_type),
        |h AS (SELECT MAX(latest_sec) AS head_sec FROM per)
        |SELECT event_type, n_events, latest_sec,
        |  head_sec - latest_sec AS lag_sec,
        |  (head_sec - latest_sec) > 3600 AS stalled
        |FROM per, h ORDER BY event_type""".stripMargin,

    "dq_uniqueness" -> {
      def k(name: String, table: String, cols: String) =
        s"""SELECT '$name' AS key_name,
           | (SELECT COUNT(*) FROM $table) AS n_rows,
           | COALESCE(COUNT(*), 0) AS n_dup_keys,
           | COALESCE(CAST(SUM(cnt) AS BIGINT), 0) AS n_dup_rows
           |FROM (SELECT $cols, COUNT(*) AS cnt FROM $table
           |      GROUP BY $cols HAVING COUNT(*) > 1)"""
          .stripMargin
      Seq(
        k("orders.pk", "orders", "o_orderkey"),
        k("lineitem.pk", "lineitem", "l_orderkey, l_linenumber"),
        k("lineitem.order_part", "lineitem", "l_orderkey, l_partkey"),
        k("orders.cust_date", "orders", "o_custkey, o_orderdate"),
        k("events.pk", "events", "event_id"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY key_name")
    },

    "dq_completeness" ->
      """SELECT FLOOR(FLOOR(EPOCH(ts)) / 86400)::BIGINT AS day_num,
        | COUNT(*) AS n_rows,
        | COUNT(CASE WHEN event_id % 4 = 0 THEN value END) AS n_present,
        | COUNT(CASE WHEN event_id % 4 = 0 THEN value END)::DOUBLE
        |   / COUNT(*)::DOUBLE AS completeness
        |FROM events GROUP BY day_num ORDER BY day_num""".stripMargin,

    "dq_heavy_hitters" ->
      """SELECT event_type, COUNT(*) AS n_events FROM events
        |GROUP BY event_type ORDER BY n_events DESC, event_type""".stripMargin,

    "dq_referential" -> {
      def e(name: String, fact: String, fk: String, dim: String, pk: String) =
        s"""SELECT '$name' AS fk,
           | (SELECT COUNT(*) FROM $fact) AS n_rows,
           | (SELECT COUNT(*) FROM $fact f
           |  WHERE NOT EXISTS (SELECT 1 FROM $dim d WHERE d.$pk = f.$fk)) AS n_orphans"""
          .stripMargin
      Seq(
        e("customer.nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
        e("lineitem.orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        e("lineitem.partkey", "lineitem", "l_partkey", "part", "p_partkey"),
        e("lineitem.suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        e("nation.regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
        e("orders.custkey", "orders", "o_custkey", "customer", "c_custkey"),
        e("supplier.nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY fk")
    },

    "dq_drift" ->
      """WITH a AS (
        |  SELECT LEAST(FLOOR(o_totalprice / 20000)::BIGINT, 9) AS bucket,
        |    count(*) AS cnt_a
        |  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY bucket),
        |b AS (
        |  SELECT LEAST(FLOOR(
        |    (CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10000
        |          ELSE o_totalprice END) / 20000)::BIGINT, 9) AS bucket,
        |    count(*) AS cnt_b
        |  FROM orders WHERE o_orderkey % 2 = 1 GROUP BY bucket),
        |j AS (SELECT COALESCE(a.bucket, b.bucket) AS bucket,
        |  COALESCE(cnt_a, 0) AS cnt_a, COALESCE(cnt_b, 0) AS cnt_b
        | FROM a FULL OUTER JOIN b ON a.bucket = b.bucket),
        |t AS (SELECT CAST(sum(cnt_a) AS BIGINT) AS tot_a,
        |  CAST(sum(cnt_b) AS BIGINT) AS tot_b FROM j)
        |SELECT bucket, cnt_a, cnt_b,
        | abs(cnt_a * tot_b - cnt_b * tot_a) AS l1_num,
        | CAST(abs(cnt_a * tot_b - cnt_b * tot_a) AS DOUBLE)
        |   / CAST(tot_a * tot_b AS DOUBLE) AS share_diff
        |FROM j CROSS JOIN t ORDER BY bucket""".stripMargin,

    "kll_sql_surface" ->
      """WITH v AS (SELECT CAST(c_nationkey AS BIGINT) AS nation, c_acctbal,
        |  ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal) AS rn,
        |  COUNT(*) OVER (PARTITION BY c_nationkey) AS n FROM customer)
        |SELECT nation, CAST(MAX(n) AS BIGINT) AS n_vals,
        |  MAX(CASE WHEN rn = CEIL(0.5 * n) THEN c_acctbal END) AS p50,
        |  MAX(CASE WHEN rn = CEIL(0.95 * n) THEN c_acctbal END) AS p95
        |FROM v GROUP BY nation ORDER BY nation""".stripMargin,

    "dq_quantile_rollup" ->
      """WITH v AS (SELECT CAST(c_nationkey AS BIGINT) AS nation, c_acctbal,
        |  ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal) AS rn,
        |  COUNT(*) OVER (PARTITION BY c_nationkey) AS n FROM customer)
        |SELECT nation, CAST(MAX(n) AS BIGINT) AS n_vals,
        |  MAX(CASE WHEN rn = CEIL(0.5 * n) THEN c_acctbal END) AS p50,
        |  MAX(CASE WHEN rn = CEIL(0.95 * n) THEN c_acctbal END) AS p95
        |FROM v GROUP BY nation ORDER BY nation""".stripMargin,

    "theta_sql_surface" ->
      """WITH s AS (SELECT event_type, user_id FROM events
        |  GROUP BY 1, 2 HAVING count(*) >= 8),
        |c AS (SELECT event_type, count(*) AS n FROM s GROUP BY 1),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*) AS n_overlap
        |  FROM s a JOIN s b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT ca.event_type AS type_a, cb.event_type AS type_b,
        |  ca.n AS n_a, cb.n AS n_b,
        |  CAST(COALESCE(p.n_overlap, 0) AS BIGINT) AS n_overlap,
        |  CAST(ca.n + cb.n - COALESCE(p.n_overlap, 0) AS BIGINT) AS n_union
        |FROM c ca JOIN c cb ON ca.event_type < cb.event_type
        |LEFT JOIN p ON p.type_a = ca.event_type AND p.type_b = cb.event_type
        |ORDER BY 1, 2""".stripMargin,

    "dq_overlap_sketch" ->
      """WITH s AS (SELECT event_type, user_id FROM events
        |  GROUP BY 1, 2 HAVING count(*) >= 8),
        |c AS (SELECT event_type, count(*) AS n FROM s GROUP BY 1),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*) AS n_overlap
        |  FROM s a JOIN s b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT ca.event_type AS type_a, cb.event_type AS type_b,
        |  ca.n AS n_a, cb.n AS n_b,
        |  CAST(COALESCE(p.n_overlap, 0) AS BIGINT) AS n_overlap
        |FROM c ca JOIN c cb ON ca.event_type < cb.event_type
        |LEFT JOIN p ON p.type_a = ca.event_type AND p.type_b = cb.event_type
        |ORDER BY 1, 2""".stripMargin,

    "dq_ks" ->
      """WITH a AS (
        |  SELECT LEAST(FLOOR(o_totalprice / 20000)::BIGINT, 9) AS bucket,
        |    count(*) AS cnt_a
        |  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY bucket),
        |b AS (
        |  SELECT LEAST(FLOOR(
        |    (CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10000
        |          ELSE o_totalprice END) / 20000)::BIGINT, 9) AS bucket,
        |    count(*) AS cnt_b
        |  FROM orders WHERE o_orderkey % 2 = 1 GROUP BY bucket),
        |j AS (SELECT COALESCE(a.bucket, b.bucket) AS bucket,
        |  COALESCE(cnt_a, 0) AS cnt_a, COALESCE(cnt_b, 0) AS cnt_b
        | FROM a FULL OUTER JOIN b ON a.bucket = b.bucket),
        |c AS (SELECT bucket,
        |  CAST(SUM(cnt_a) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_a,
        |  CAST(SUM(cnt_b) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_b
        | FROM j),
        |t AS (SELECT CAST(sum(cnt_a) AS BIGINT) AS tot_a,
        |  CAST(sum(cnt_b) AS BIGINT) AS tot_b FROM j),
        |k AS (SELECT CAST(MAX(ABS(cum_a * tot_b - cum_b * tot_a)) AS BIGINT) AS ks_num,
        |  MAX(tot_a) AS tot_a, MAX(tot_b) AS tot_b
        | FROM c CROSS JOIN t)
        |SELECT ks_num, tot_a, tot_b,
        |  ks_num * 1000000 // (tot_a * tot_b) AS ks_ppm
        |FROM k""".stripMargin,

    "dq_key_skew" ->
      """WITH c AS (SELECT l_partkey, COUNT(*) AS cnt FROM lineitem
        |  GROUP BY l_partkey),
        |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c)
        |SELECT l_partkey, cnt, cnt::DOUBLE / total AS share
        |FROM c CROSS JOIN t
        |ORDER BY cnt DESC, l_partkey LIMIT 10""".stripMargin,

    "dq_weekday_profile" ->
      """WITH d AS (SELECT ((FLOOR(EPOCH(ts))::BIGINT // 86400 + 4) % 7)::BIGINT AS dow,
        |  COUNT(*) AS n_events
        | FROM events GROUP BY dow),
        |t AS (SELECT CAST(SUM(n_events) AS BIGINT) AS total FROM d)
        |SELECT dow, n_events, (n_events * 1000000) // total AS ppm
        |FROM d CROSS JOIN t ORDER BY dow""".stripMargin,

    "dq_cross_field" ->
      """WITH j AS (SELECT CAST(l_shipdate AS DATE) AS ship,
        |  CAST(o_orderdate AS DATE) AS ordered, l_extendedprice, o_totalprice
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT rule, n_violations, n_checked FROM (
        |  SELECT 'ship_before_order' AS rule,
        |    CAST(SUM(CASE WHEN ship < ordered THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violations,
        |    COUNT(*) AS n_checked FROM j
        |  UNION ALL
        |  SELECT 'ship_over_60d',
        |    CAST(SUM(CASE WHEN date_diff('day', ordered, ship) > 60
        |      THEN 1 ELSE 0 END) AS BIGINT), COUNT(*) FROM j
        |  UNION ALL
        |  SELECT 'line_exceeds_order_total',
        |    CAST(SUM(CASE WHEN l_extendedprice > o_totalprice
        |      THEN 1 ELSE 0 END) AS BIGINT), COUNT(*) FROM j)
        |ORDER BY rule""".stripMargin,

    "dq_benford" ->
      """WITH d AS (
        |  SELECT substr(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS VARCHAR),
        |    1, 1) AS digit, count(*) AS n
        |  FROM orders GROUP BY digit),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM d)
        |SELECT digit, n, (n * 1000000) // total AS ppm
        |FROM d CROSS JOIN t ORDER BY digit""".stripMargin,

    "dq_out_of_order" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec,
        |    LAG(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) OVER
        |      (PARTITION BY user_id ORDER BY event_id) AS prev_sec
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_events,
        | CAST(SUM(CASE WHEN sec < prev_sec THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_backsteps,
        | COALESCE(MAX(CASE WHEN sec < prev_sec THEN prev_sec - sec END), 0)
        |   AS max_backstep_sec
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,

    "etl_quarantine" ->
      """SELECT l_orderkey, l_linenumber,
        | concat_ws(',',
        |   CASE WHEN l_quantity > 45 THEN 'qty_high' END,
        |   CASE WHEN l_discount > 0.08 THEN 'disc_high' END,
        |   CASE WHEN l_tax > 0.07 THEN 'tax_high' END) AS reasons
        |FROM lineitem
        |WHERE concat_ws(',',
        |   CASE WHEN l_quantity > 45 THEN 'qty_high' END,
        |   CASE WHEN l_discount > 0.08 THEN 'disc_high' END,
        |   CASE WHEN l_tax > 0.07 THEN 'tax_high' END) != ''
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}

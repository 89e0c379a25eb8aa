package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics core (SURVEY §2.B) — TPC-H-shaped queries.
  *
  * Determinism contract with the DuckDB oracle:
  *  - money/quantity aggregates run in exact DECIMAL and are cast to DOUBLE
  *    only at the end (sum order then cannot matter);
  *  - ratios/averages are DOUBLE divisions of exact values with identical
  *    association in both dialects (IEEE 754 ⇒ bit-identical);
  *  - timestamps are emitted as epoch seconds (BIGINT);
  *  - every query ends in a total ORDER BY (verification aid; at scale the
  *    sort is the caller's choice, not the operator's).
  */
object Relational {

  /** Exact decimal views of the 2-dp doubles in the test data.
    *
    * Precision 8, not 12: Catalyst's DecimalAggregates rule rewrites
    * sum(decimal(p,s)) into an unscaled-LONG sum only when p + 10 <= 18,
    * turning the aggregate into compact long math (q1's two plain sums go
    * from ~0.35s to ~0.05s at sf0.1). Values are data-domain bounded
    * (prices < 1e6 at ANY scale factor — magnitude doesn't grow with SF;
    * ANSI cast errors loudly if that ever breaks), and downstream
    * arithmetic only widens, so exact values — and the DuckDB oracle
    * hashes — are unchanged.
    */
  private def dec(c: Column): Column = c.cast("decimal(8,2)")
  private def dec4(c: Column): Column = c.cast("decimal(4,2)")
  private def d(c: Column): Column = c.cast("double")

  /** decimal → double through the decimal's EXACT string. The engines'
    * native decimal→double casts can differ by 1 ulp once the unscaled
    * value exceeds 2^53 (measured: q38's sxx at sf0.001 — Spark
    * -0.020151421273443982 vs DuckDB ...98), but string→double parsing
    * is correctly rounded in BOTH (Double.parseDouble / fast_float), and
    * the decimal's string is exact — so the bridged cast is bit-identical
    * cross-engine at any magnitude. Use for POWER sums (Σx², Σxy), whose
    * unscaled values blow past 2^53 long before the plain sums do.
    */
  private def dstr(c: Column): Column = c.cast("string").cast("double")

  // revenue item: extendedprice * (1 - discount), exact
  private def revItem: Column = dec(col("l_extendedprice")) * (lit(1) - dec4(col("l_discount")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") <= to_timestamp(lit("2000-12-01")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).as("dsq"),
          sum(dec(col("l_extendedprice"))).as("dsb"),
          sum(revItem).as("dsd"),
          // charge intermediate capped at decimal(12,4) (values < 1e8, so
          // lossless) × tax decimal(3,2): result precision 16 stays in
          // Spark's compact-long Decimal path — the former (18,4)×(4,2)
          // form produced precision > 18 and fell back to per-row
          // BigDecimal. Scales are unchanged, so the exact value (and the
          // DuckDB oracle's DECIMAL(18,4) twin) is identical.
          sum((revItem.cast("decimal(12,4)") *
            (lit(1) + col("l_tax").cast("decimal(3,2)")))).as("dsc"),
          count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"),
          d(col("dsq")).as("sum_qty"), d(col("dsb")).as("sum_base_price"),
          d(col("dsd")).as("sum_disc_price"), d(col("dsc")).as("sum_charge"),
          (d(col("dsq")) / col("count_order")).as("avg_qty"),
          (d(col("dsb")) / col("count_order")).as("avg_price"),
          col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    "q2_filtered_projection" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), unix_timestamp(col("l_shipdate")).as("ship_sec"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    "q3_top_revenue" -> { (s, dir) =>
      val cust = Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, dir).where(col("o_orderdate") < to_timestamp(lit("1998-07-01")))
      val li = Tables.lineitem(s, dir).where(col("l_shipdate") > to_timestamp(lit("1998-07-01")))
      // customer scales with SF — no broadcast hint; AQE broadcasts it at
      // small SF and shifts to shuffle join when it outgrows the threshold
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(revItem).as("rev"))
        .select(col("l_orderkey"), d(col("rev")).as("revenue"),
          unix_timestamp(col("o_orderdate")).as("order_sec"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    },

    "q4_region_revenue" -> { (s, dir) =>
      val dims = Tables.nation(s, dir)
        .join(Tables.region(s, dir).where(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
      val cust = Tables.customer(s, dir)
      val supp = Tables.supplier(s, dir)
      val ord = Tables.orders(s, dir)
        .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      // nation⋈region is a fixed-size dim → broadcast hint; supplier and
      // customer scale with SF → AQE picks the join strategy from stats
      Tables.lineitem(s, dir)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(cust, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(dims), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(revItem).as("rev"))
        .select(col("n_name"), d(col("rev")).as("revenue"))
        .orderBy("n_name")
    },

    "q5_window_topk" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rank_in_cust", row_number().over(w))
        .where(col("rank_in_cust") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rank_in_cust"))
        .orderBy("o_custkey", "rank_in_cust")
    },

    "q6_exists_semijoin" -> { (s, dir) =>
      val big = Tables.lineitem(s, dir).where(col("l_quantity") > 45)
      Tables.orders(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderkey")
    },

    "q7_not_exists_antijoin" -> { (s, dir) =>
      val open = Tables.orders(s, dir).where(col("o_orderstatus") === "O")
      Tables.customer(s, dir)
        .join(open, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    },

    "q8_distinct_count" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    "q9_rollup" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec(col("l_quantity"))).as("dsq"), count(lit(1)).as("n_rows"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          d(col("dsq")).as("sum_qty"), col("n_rows"))
        .orderBy("returnflag", "linestatus")
    },

    "q10_pivot" -> { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(sum(dec(col("o_totalprice"))))
        .select(col("o_orderstatus"),
          d(col("1-URGENT")).as("p_urgent"), d(col("2-HIGH")).as("p_high"),
          d(col("3-MEDIUM")).as("p_medium"),
          d(col("4-NOT SPECIFIED")).as("p_notspec"), d(col("5-LOW")).as("p_low"))
        .orderBy("o_orderstatus")
    },

    "q11_union_distinct" -> { (s, dir) =>
      val a = Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val b = Tables.customer(s, dir).where(col("c_acctbal") > 9000)
        .select(col("c_custkey"))
      a.union(b).distinct().orderBy("c_custkey")
    },

    "q12_events_json" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(get_json_object(col("props"), "$.k").cast("int").as("k_val"),
          dec(col("value")).as("v"))
        .groupBy(col("k_val"))
        .agg(count(lit(1)).as("n_events"), sum(col("v")).as("sv"))
        .select(col("k_val"), col("n_events"), d(col("sv")).as("sum_value"))
        .orderBy("k_val")
    },

    "q13_events_hourly" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_sec"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(dec(col("value"))).as("sv"))
        .select(col("hour_sec"), col("event_type"), col("n_events"),
          d(col("sv")).as("sum_value"))
        .orderBy("hour_sec", "event_type")
    },

    "q14_sessionize" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("user_id"), floor(unix_timestamp(col("ts"))).cast("long").as("sec"),
          col("event_id"))
      graft.operators.Sessionize.sessions(ev, "user_id", "sec", "event_id", 1800L)
        .select(col("user_id"), col("session_idx").cast("long").as("session_idx"),
          col("n_events"), col("start_sec"), col("end_sec"))
        .orderBy("user_id", "session_idx")
    },

    "q15_running_total" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          d(sum(dec(col("value"))).over(w)).as("running_value"))
        .orderBy("event_id")
    },

    "q17_group_collect" -> { (s, dir) =>
      // collect_list is order-nondeterministic after a shuffle — sort_array
      // restores determinism; emitted as a joined string for the oracle
      Tables.orders(s, dir)
        .where(col("o_totalprice") > 400000)
        .groupBy(col("o_custkey"))
        .agg(concat_ws(",", sort_array(collect_list(col("o_orderkey")))).as("big_orders"),
          count(lit(1)).as("n_big"))
        .orderBy("o_custkey")
    },

    "q18_asof_join" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          floor(unix_timestamp(col("ts"))).cast("long").as("sec"), col("value"))
      val dim = ev.where(col("event_id") % 50 === 0)
        .groupBy(col("user_id"), col("sec").as("dim_sec"))
        .agg(max(col("value")).as("rate"))
        .select(col("user_id"), col("dim_sec"), col("rate"))
      graft.operators.AsOfJoin.asofLast(
        ev.select(col("event_id"), col("user_id"), col("sec")), dim,
        "user_id", "sec", "dim_sec")
        .select(col("event_id"), col("user_id"), col("sec"), col("rate"))
        .orderBy("event_id")
    },

    // same semantics as q18 through the NATIVE physical operator
    // (custom LogicalPlan + Strategy + sort-merge SparkPlan)
    "q27_asof_native" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          floor(unix_timestamp(col("ts"))).cast("long").as("sec"), col("value"))
      val dim = ev.where(col("event_id") % 50 === 0)
        .groupBy(col("user_id"), col("sec").as("dim_sec"))
        .agg(max(col("value")).as("rate"))
        .select(col("user_id"), col("dim_sec"), col("rate"))
      graft.plans.AsOfJoinNative.asof(
        ev.select(col("event_id"), col("user_id"), col("sec")), dim,
        "user_id", "sec", "dim_sec")
        .select(col("event_id"), col("user_id"), col("sec"), col("rate"))
        .orderBy("event_id")
    },

    // the THIRD as-of tier: broadcast the dim history, binary-search per
    // fact row — zero exchange/sort on the fact side (plan asserted in
    // AsOfJoinSpec); same ASOF twin oracle as q18/q27
    "q42_asof_broadcast" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          floor(unix_timestamp(col("ts"))).cast("long").as("sec"), col("value"))
      val dim = ev.where(col("event_id") % 50 === 0)
        .groupBy(col("user_id"), col("sec").as("dim_sec"))
        .agg(max(col("value")).as("rate"))
        .select(col("user_id"), col("dim_sec"), col("rate"))
      graft.operators.AsOfJoin.asofBroadcast(
        ev.select(col("event_id"), col("user_id"), col("sec")), dim,
        "user_id", "sec", "dim_sec")
        .orderBy("event_id")
    },

    // the operator tier through PURE SQL: graft_asof_join is a registered
    // table-valued function (GraftExtensions.tableFunctions) resolving
    // temp-view names and returning AsOfJoin.asofLast's logical plan —
    // authored entirely as spark.sql text, hash-matched against the SAME
    // oracle as q18 (identical values = identical operator reached)
    "asof_sql_surface" -> { (s, dir) =>
      graft.GraftExtensions.register(s)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          floor(unix_timestamp(col("ts"))).cast("long").as("sec"), col("value"))
        .createOrReplaceTempView("graft_sql_ev")
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW graft_sql_facts AS
              |SELECT event_id, user_id, sec FROM graft_sql_ev""".stripMargin)
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW graft_sql_dim AS
              |SELECT user_id, sec AS dim_sec, MAX(value) AS rate
              |FROM graft_sql_ev WHERE event_id % 50 = 0
              |GROUP BY user_id, sec""".stripMargin)
      s.sql("""SELECT event_id, user_id, sec, rate
              |FROM graft_asof_join('graft_sql_facts', 'graft_sql_dim',
              |                     'user_id', 'sec', 'dim_sec')
              |ORDER BY event_id""".stripMargin)
    },

    // interval join from pure SQL via the graft_interval_join TVF; same
    // oracle as q19
    "interval_sql_surface" -> { (s, dir) =>
      graft.GraftExtensions.register(s)
      Tables.events(s, dir)
        .select(col("event_id"), floor(unix_timestamp(col("ts"))).cast("long").as("sec"))
        .createOrReplaceTempView("graft_sql_pts")
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW graft_sql_ivs AS
              |SELECT event_id AS iv_id, sec AS iv_start, sec + 600 AS iv_end
              |FROM graft_sql_pts WHERE event_id % 100 = 0""".stripMargin)
      s.sql("""SELECT event_id, iv_id
              |FROM graft_interval_join('graft_sql_pts', 'graft_sql_ivs',
              |                         'sec', 'iv_start', 'iv_end', 600)
              |ORDER BY event_id, iv_id""".stripMargin)
    },

    "q19_interval_join" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), floor(unix_timestamp(col("ts"))).cast("long").as("sec"))
      val iv = ev.where(col("event_id") % 100 === 0)
        .select(col("event_id").as("iv_id"), col("sec").as("iv_start"),
          (col("sec") + 600).as("iv_end"))
      graft.operators.RangeJoin.intervalJoin(ev, iv, "sec", "iv_start", "iv_end", 600L)
        .select(col("event_id"), col("iv_id"))
        .orderBy("event_id", "iv_id")
    },

    // broadcast tier of the interval join: the small intervals table
    // ships whole, points binary-search it — zero exchange on the fact
    // side (plan asserted in RangeJoinSpec); same result as q19
    "q43_interval_broadcast" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), floor(unix_timestamp(col("ts"))).cast("long").as("sec"))
      val iv = ev.where(col("event_id") % 100 === 0)
        .select(col("event_id").as("iv_id"), col("sec").as("iv_start"),
          (col("sec") + 600).as("iv_end"))
      graft.operators.RangeJoin
        .intervalJoinBroadcast(ev, iv, "sec", "iv_start", "iv_end")
        .select(col("event_id"), col("iv_id"))
        .orderBy("event_id", "iv_id")
    },

    "q20_cube" -> { (s, dir) =>
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(sum(dec(col("o_totalprice"))).as("dsp"), count(lit(1)).as("n_orders"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          d(col("dsp")).as("sum_price"), col("n_orders"))
        .orderBy("status", "priority")
    },

    "q21_except" -> { (s, dir) =>
      // customers with orders but none urgent: EXCEPT (left-anti on distinct)
      val all = Tables.orders(s, dir).select(col("o_custkey"))
      val urgent = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      all.except(urgent) // EXCEPT DISTINCT semantics
        .orderBy("o_custkey")
    },

    "q31_intersect" -> { (s, dir) =>
      // customers with BOTH an urgent and a low-priority order: INTERSECT
      // (left-semi on distinct — one shuffle per side, no pairwise blowup)
      val urgent = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val low = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "5-LOW")
        .select(col("o_custkey"))
      urgent.intersect(low) // INTERSECT DISTINCT semantics
        .orderBy("o_custkey")
    },

    // wide→long melt via the native unpivot API (stack); measures cast to
    // a common double, sums made exact through the decimal path first
    "q34_unpivot" -> { (s, dir) =>
      Tables.customer(s, dir)
        .groupBy(col("c_nationkey"))
        .agg(d(sum(dec(col("c_acctbal")))).as("total_bal"),
          count(lit(1)).cast("double").as("n_cust"),
          max(col("c_acctbal")).as("max_bal"))
        .unpivot(Array(col("c_nationkey")),
          Array(col("total_bal"), col("n_cust"), col("max_bal")),
          "measure", "value")
        .orderBy("c_nationkey", "measure")
    },

    // grouped outlier detection (data-quality gate shape): per-priority
    // mean/stddev from EXACT decimal sums (sx, sxx) cast to double at the
    // edge, threshold arithmetic written with the same association as the
    // oracle (sqrt is IEEE-exact, unlike ln). Stats are one partial agg
    // over 5 groups => broadcast join-back; no second scan of the facts
    "q37_outliers" -> { (s, dir) =>
      val price = dec(col("o_totalprice"))
      val stats = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          dstr(sum(price)).as("sx"),
          dstr(sum(price * price)).as("sxx"))
      // 1.5 sigma, not 2: the synthetic prices are uniform, whose support
      // ends at mean + 1.73 sigma - a 2 sigma gate would be vacuously empty
      val thresh = col("sx") / col("n") +
        lit(1.5) * sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - lit(1)))
      Tables.orders(s, dir)
        .join(broadcast(stats), Seq("o_orderpriority"))
        .where(col("o_totalprice") > thresh)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        .orderBy("o_orderkey")
    },

    // z-order layout: Morton code over (event time, user id) — the
    // multi-dimension clustering key a 100 TB table is written in so
    // row-group min/max stats prune scans on EITHER dimension. The query
    // checks the exact per-row z-value; the layout/skipping property
    // itself is asserted on real parquet file stats in ZOrderSpec
    "q36_zorder" -> { (s, dir) =>
      val e = Tables.events(s, dir)
        .select(col("event_id"), unix_timestamp(col("ts")).as("t"),
          col("user_id").as("u"))
      graft.operators.ZOrder
        .withZValue(e, Seq("t" -> col("t"), "u" -> col("u")), bits = 8)
        .select(col("event_id"), col("zval"))
        .orderBy("event_id")
    },

    // time-series gap fill: zero rows for hours with no events, per type.
    // The grid is (distinct keys) × (hour range) — bounded by key
    // cardinality times span, generated with sequence+explode, never
    // collected to the driver; counts join back on (type, hour)
    "q35_gapfill" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_type"),
          unix_timestamp(date_trunc("hour", col("ts"))).as("h"))
      val counts = ev.groupBy(col("event_type"), col("h"))
        .agg(count(lit(1)).as("n_events"))
      val bounds = ev.agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
      val grid = ev.select(col("event_type")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"),
          explode(sequence(col("mn"), col("mx"), lit(3600L))).as("h"))
      grid.join(counts, Seq("event_type", "h"), "left")
        .select(col("event_type"), col("h").as("hour_sec"),
          coalesce(col("n_events"), lit(0L)).as("n_events"))
        .orderBy("event_type", "hour_sec")
    },

    // day-N retention cohorts: of the users active on day D, how many
    // returned on D+1 / D+7. ONE distinct (user, day) pass, then a
    // self-join on user with day arithmetic — the cohort matrix shape;
    // both sides shuffle once on user_id, no per-day passes
    "q44_retention" -> { (s, dir) =>
      val days = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val ret = days.select(col("user_id"), col("day").as("d0"))
        .join(days.select(col("user_id"), col("day").as("dn")), Seq("user_id"))
        .groupBy(col("d0"))
        .agg(countDistinct(col("user_id")).as("cohort"),
          countDistinct(when(datediff(col("dn"), col("d0")) === 1,
            col("user_id"))).as("d1_retained"),
          countDistinct(when(datediff(col("dn"), col("d0")) === 7,
            col("user_id"))).as("d7_retained"))
      ret.select(unix_timestamp(col("d0").cast("timestamp")).as("d0_sec"),
          col("cohort"), col("d1_retained"), col("d7_retained"))
        .orderBy("d0_sec")
    },

    // hierarchy flattening (org chart / BOM / taxonomy): every node of a
    // parent-pointer tree resolved to its root + depth via POINTER
    // JUMPING — ceil(log2(depth)) self-joins instead of depth rounds, the
    // only transitive-closure shape that survives deep chains at 100 TB
    // (Spark has no recursive CTE; DuckDB's is the oracle). Tree
    // synthesized as parent = custkey div 2 over the dense customer keys
    "q45_hierarchy" -> { (s, dir) =>
      val nodes = Tables.customer(s, dir).select(
        col("c_custkey").as("id"),
        when(col("c_custkey") <= 1, lit(null))
          .otherwise(expr("c_custkey div 2")).as("parent"))
      graft.operators.Hierarchy.flatten(nodes, "id", "parent")
        .orderBy("id")
    },

    // the SCALE path for exact percentiles (q47's percentile() builds a
    // value→count map per group — heap-bound on high-cardinality
    // groups): rank arithmetic over a sorted window. r = 1 + p·(n−1);
    // the answer interpolates between the floor(r)-th and ceil(r)-th
    // values, so one sort + one conditional agg replaces the value map.
    // The per-group rank is GlobalRank.withGroupedPrefixSum — a range-
    // partitioned sort + offsets, so a ~6-value group key still uses
    // every partition (a hash-partitioned window would funnel each group
    // per-key EWMA (exponentially weighted moving average) — the
    // order-dependent time-series smoother: y = α·x + (1−α)·y_prev folded
    // over event order. The fold order is pinned by (sec, event_id) in
    // both engines, and α = 0.5 with identical op order makes every
    // intermediate IEEE-identical — a window can't express the recursion
    // and a UDAF would lose codegen; the sorted-collect fold is bounded
    // by each user's history
    // rolling 7-day active users per day (the WAU-per-day metric).
    // Rolling DISTINCT does not decompose — sum of dailies double-counts —
    // so presence rows explode to the ≤7 window-end days they support
    // (bounded constant fan-out, then distinct + count: two linear
    // shuffles), never a running count(distinct) window. Reported only
    // for days that exist in the feed
    "q58_rolling_active" -> { (s, dir) =>
      val presence = Tables.events(s, dir)
        .select(col("user_id"),
          floor(unix_timestamp(col("ts")) / 86400).cast("long").as("d"))
        .distinct()
      val days = presence.select(col("d").as("day_num")).distinct()
      presence
        .select(col("user_id"), explode(sequence(col("d"), col("d") + 6)).as("day_num"))
        .distinct()
        .join(days, Seq("day_num"), "left_semi")
        .groupBy(col("day_num"))
        .agg(count(lit(1)).as("active_users"))
        .orderBy("day_num")
    },

    // triangle census of the co-purchase graph (the community-structure
    // KPI over any entity graph): edges = part pairs co-bought in ≥2
    // orders (per-order local pair build, support threshold prunes the
    // hay). Counting uses DEGREE ORIENTATION — each edge directed from
    // its (deg, id)-smaller endpoint, so out-degree is O(√m) and wedge
    // generation is Σ out-deg² ≤ O(m^1.5) TOTAL, never Σ deg² (a hub's
    // deg² explodes; its out-deg² cannot). Wedge pairs keep the same
    // (deg, id) order, so the closing edge is always oriented v→w and the
    // triangle test is ONE equi-join. Clustering coeff = one IEEE
    // division of exact counts
    "q64_triangles" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val edges = li.select(col("l_orderkey"), col("l_partkey")).distinct()
        .groupBy(col("l_orderkey"))
        .agg(array_sort(collect_list(col("l_partkey"))).as("parts"))
        .select(explode(expr(
          "flatten(transform(parts, (x, i) -> " +
            "transform(slice(parts, i + 2, size(parts)), y -> struct(x AS a, y AS b))))"
        )).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n"))
        .where(col("n") >= 2)
        .select(col("a"), col("b"))
        .localCheckpoint(eager = true) // feeds degrees + both orientation lookups
      val deg = edges.select(col("a").as("v")).unionAll(edges.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val keyed = edges
        .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
      val aFirst = struct(col("da"), col("a")) < struct(col("db"), col("b"))
      val out = keyed.select(
          when(aFirst, col("a")).otherwise(col("b")).as("u"),
          when(aFirst, col("b")).otherwise(col("a")).as("v"),
          when(aFirst, col("db")).otherwise(col("da")).as("dv"))
        .localCheckpoint(eager = true) // feeds both wedge sides + closing probe
      val tri = out.as("e1").join(out.as("e2"),
          col("e1.u") === col("e2.u") &&
            (struct(col("e1.dv"), col("e1.v")) < struct(col("e2.dv"), col("e2.v"))))
        .select(col("e1.v").as("x"), col("e2.v").as("y"))
        .join(out.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
        .agg(count(lit(1)).as("n_triangles"))
      deg.agg(count(lit(1)).as("n_nodes"),
          expr("sum(deg) div 2").as("n_edges"),
          expr("sum((deg * (deg - 1)) div 2)").as("n_wedges"))
        .crossJoin(broadcast(tri))
        .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
          ((col("n_triangles") * 3).cast("double") / col("n_wedges")).as("global_cc"))
    },

    // month-over-month growth (the KPI-trend shape): exact-cent monthly
    // revenue rollup (one linear partial-agg shuffle on the fact table),
    // then lag + growth ratio over the MONTH rollup — a dim-sized input
    // (one row per month) where a global window is fine at any scale, the
    // q57 argument. Growth is one IEEE division of exact longs minus 1.0
    "q63_mom_growth" -> { (s, dir) =>
      val m = Tables.orders(s, dir)
        .select((year(to_date(col("o_orderdate"))) * 100 +
          month(to_date(col("o_orderdate")))).cast("long").as("ym"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy(col("ym"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("rev_cents"))
      val w = Window.orderBy("ym")
      m.withColumn("prev_cents", lag(col("rev_cents"), 1).over(w))
        .select(col("ym"), col("n_orders"), col("rev_cents"),
          (col("rev_cents").cast("double") / col("prev_cents").cast("double")
            - lit(1.0)).as("mom_growth"))
        .orderBy("ym")
    },

    // behavioral transition matrix (first-order Markov counts): adjacent
    // event-type pairs in each user's time-ordered stream via ONE lead()
    // pass over the high-cardinality user partition, then two bounded
    // hash aggregations (type², a dim); transition probability is a
    // single IEEE division of exact counts. The next-page / next-action
    // model a product-analytics pipeline feeds from the same events table
    "q62_transitions" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          floor(unix_timestamp(col("ts"))).cast("long").as("sec"),
          col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .where(col("next_type").isNotNull)
      val cnt = e.groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val tot = cnt.groupBy(col("from_type")).agg(sum(col("n")).as("n_from"))
      cnt.join(tot, Seq("from_type"))
        .select(col("from_type"), col("to_type"), col("n"),
          (col("n").cast("double") / col("n_from").cast("double")).as("p"))
        .orderBy("from_type", "to_type")
    },

    // interval-union coverage (time-on-site shape): each event opens a
    // 300 s attention interval; per user, the UNION length of those
    // overlapping intervals — the classic sweep: sort per user, carry the
    // running max end over PRIOR rows, clamp each interval's contribution
    // to what extends past that frontier. All integer-second arithmetic
    // (exact), one window pass over the HIGH-cardinality user partition
    "q61_interval_coverage" -> { (s, dir) =>
      graft.operators.EtlOps.intervalCoverage(
        Tables.events(s, dir)
          .select(col("user_id"),
            floor(unix_timestamp(col("ts"))).cast("long").as("s0"))
          .withColumn("e0", col("s0") + 300),
        "user_id", "s0", "e0")
        .withColumnRenamed("covered", "covered_sec")
        .orderBy("user_id")
    },

    // event-sequence pattern matching (the MATCH_RECOGNIZE shape): each
    // user's event history becomes one ordered type-letter string — built
    // by a single hash aggregation on the HIGH-cardinality user key (the
    // per-user payload is bounded by events-per-user, the same contract as
    // sessionization) — and behavioral patterns are then counted by plain
    // regex over that string: view→click ("vc") and the full
    // view→click→purchase path. Both engines scan regex matches
    // left-to-right non-overlapping on literal patterns, so counts agree
    // exactly; order inside the string is pinned by (sec, event_id)
    "q59_pattern_seq" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(col("user_id"),
          floor(unix_timestamp(col("ts"))).cast("long").as("sec"),
          col("event_id"), substring(col("event_type"), 1, 1).as("letter"))
        .groupBy(col("user_id"))
        .agg(concat_ws("", transform(
          array_sort(collect_list(struct(col("sec"), col("event_id"), col("letter")))),
          x => x.getField("letter"))).as("seq"))
        .select(col("user_id"), length(col("seq")).cast("long").as("n_events"),
          regexp_count(col("seq"), lit("vc")).cast("long").as("n_view_click"),
          regexp_count(col("seq"), lit("vcp")).cast("long").as("n_full_path"),
          (regexp_count(col("seq"), lit("vcp")) > 0).as("converted"))
        .orderBy("user_id")
    },

    // time-decayed rollup (decayed counters / trending-score shape): each
    // event's integer-cent value is halved once per whole day of age
    // relative to the stream head, then summed per type. The decay is
    // EXACT integer arithmetic end-to-end — floor-divide by 1<<age_days —
    // so the aggregate is merge-order-proof (an exp()/pow() decay would
    // re-associate float error per run and engine). The stream head is a
    // 1-row scalar aggregate broadcast back (q22/dq_freshness pattern);
    // everything else is one linear partial-agg pass
    "q60_decayed_sum" -> { (s, dir) =>
      val e = Tables.events(s, dir)
        .select(col("event_type"),
          floor(unix_timestamp(col("ts"))).cast("long").as("sec"),
          floor(col("value") * 100).cast("long").as("cents"))
      val head = e.agg(max(col("sec")).as("head_sec"))
      e.crossJoin(broadcast(head))
        .withColumn("age_days",
          expr("cast(least((head_sec - sec) div 86400, 62) as int)"))
        .withColumn("decayed", expr("cents div shiftleft(1L, age_days)"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("decayed")).as("decayed_cents"),
          sum(col("cents")).as("raw_cents"))
        .orderBy("event_type")
    },

    // cumulative distinct users per day (the growth-curve query): distinct
    // is resolved ONCE as min(first_day) per user — one hash shuffle on
    // the high-cardinality key — and the running total then runs over the
    // per-day rollup, a DIM-sized input (one row per day), where a window
    // is fine at any corpus scale. Never a running count(distinct) over
    // the fact table.
    "q57_cume_users" -> { (s, dir) =>
      val firstDay = Tables.events(s, dir)
        .select(col("user_id"),
          floor(unix_timestamp(col("ts")) / 86400).cast("long").as("day_num"))
        .groupBy(col("user_id"))
        .agg(min(col("day_num")).as("first_day"))
      val perDay = firstDay.groupBy(col("first_day").as("day_num"))
        .agg(count(lit(1)).as("n_new_users"))
      val w = Window.orderBy("day_num")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perDay.withColumn("cume_users", sum(col("n_new_users")).over(w))
        .orderBy("day_num")
    },

    // OHLC time-series rollup: per (type, hour) open/high/low/close —
    // the metrics-downsampling shape. open/close are min_by/max_by on an
    // exact integer (sec, event_id) order key (one partial-agg pass,
    // map-side combinable — never a per-group sort or window); high/low
    // are plain min/max. The composite key packs into one BIGINT so the
    // oracle's arg_min/arg_max compare the identical scalar
    "q56_ohlc" -> { (s, dir) =>
      val ord = col("sec") * lit(10000000L) + col("event_id")
      Tables.events(s, dir)
        .select(col("event_type"),
          floor(unix_timestamp(col("ts"))).cast("long").as("sec"),
          col("event_id"), col("value"))
        .withColumn("hour_sec", (floor(col("sec") / 3600) * 3600).cast("long"))
        .groupBy(col("event_type"), col("hour_sec"))
        .agg(min_by(col("value"), ord).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max_by(col("value"), ord).as("close"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type", "hour_sec")
    },

    // fixed-iteration PageRank over the q45 referral tree (child →
    // parent c//2): two damped power-iteration steps from uniform init.
    // Each step is ONE shuffle of (dst, contribution) — the iterative
    // join+agg pattern CC and pointer-jumping also use; at 100 TB edges
    // pre-partition on dst once and every iteration reuses that exchange.
    // The per-node contribution sum is an order-pinned left fold over
    // src order (collect_list is shuffle-order-nondeterministic and
    // double addition does not associate — the q52/pipe_lm_score rule),
    // so every intermediate is IEEE-identical to the oracle's
    // list_reduce. In-degree here is ≤ 2; for power-law graphs the fold
    // list is bounded by in-degree — production keeps the unordered sum
    // and a tolerance, the pinned fold is the exact-oracle trade.
    "q55_pagerank" -> { (s, dir) =>
      val nodes = Tables.customer(s, dir).select(col("c_custkey").as("id"))
      val edges = nodes.where(col("id") > 1)
        .select(col("id").as("src"), floor(col("id") / 2).cast("long").as("dst"))
        .localCheckpoint(true)
      def step(ranks: DataFrame): DataFrame = {
        val contrib = edges.join(ranks, col("src") === col("id"))
          .select(col("dst"), col("src"), col("r"))
        val sums = contrib.groupBy(col("dst"))
          .agg(aggregate(
            transform(array_sort(collect_list(struct(col("src"), col("r")))),
              x => x.getField("r")),
            lit(0.0), (acc, x) => acc + x).as("s"))
        nodes.join(sums, col("id") === col("dst"), "left")
          .select(col("id"),
            (lit(0.15) + lit(0.85) * coalesce(col("s"), lit(0.0))).as("r"))
      }
      val r2 = step(step(nodes.withColumn("r", lit(1.0))))
      r2.select(col("id").as("c_custkey"), col("r").as("pagerank"))
        .orderBy("c_custkey")
    },

    // 2-D skyline (Pareto frontier) over per-customer stats: customers no
    // other customer beats on BOTH total spend and order count. The oracle
    // is the O(n²) NOT EXISTS dominance test; the Spark plan is the
    // Skyline operator's sort-based frontier — per-x max, range-partitioned
    // DESC scan with a broadcast prior-partition max, then a join back
    // (see Skyline.scala for why that is the 100 TB shape). Spend is exact
    // cents so dominance never depends on float comparison
    "q53_skyline" -> { (s, dir) =>
      val agg = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("spend_cents"),
          count(lit(1)).as("n_orders"))
      graft.operators.Skyline.skyline2D(agg, "spend_cents", "n_orders")
        .orderBy("o_custkey")
    },

    // market-basket co-occurrence: part pairs appearing in the same order,
    // counted and ranked. The pair explosion is bounded by lines-per-order
    // (≤7 here, Σk² per order at scale) — a per-order local pair build,
    // NEVER a global self-join of lineitem against itself: distinct parts
    // per order are collected, sorted, and paired in-flight, then one hash
    // aggregation counts pairs. Ties at the cut rank are broken by the pair
    // key so the top-k is deterministic
    "q54_copurchase" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val pairs = li.select(col("l_orderkey"), col("l_partkey"))
        .distinct()
        .groupBy(col("l_orderkey"))
        .agg(array_sort(collect_list(col("l_partkey"))).as("parts"))
        .select(explode(expr(
          // all ordered pairs (i < j) from the sorted distinct-part array
          "flatten(transform(parts, (x, i) -> " +
            "transform(slice(parts, i + 2, size(parts)), y -> struct(x AS a, y AS b))))"
        )).as("p"))
      pairs.groupBy(col("p.a").as("part_a"), col("p.b").as("part_b"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
        .limit(20)
    },

    "q52_ewma" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(col("user_id"),
          floor(unix_timestamp(col("ts"))).cast("long").as("sec"),
          col("event_id"), col("value"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          aggregate(
            transform(
              array_sort(collect_list(struct(col("sec"), col("event_id"), col("value")))),
              x => x.getField("value")),
            lit(0.0), (acc, x) => lit(0.5) * x + lit(0.5) * acc).as("ewma"))
        .orderBy("user_id")
    },

    // grouped MODE: the most frequent priority per status via count-then-
    // argmax — two hash aggregations (both map-side combinable), never a
    // per-group sort. min_by over (−cnt, value) pins the tie toward the
    // lexicographically smaller value in both engines
    "q51_mode" -> { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("o_orderstatus"))
        .agg(min_by(struct(col("o_orderpriority"), col("cnt")),
          struct(-col("cnt"), col("o_orderpriority"))).as("m"))
        .select(col("o_orderstatus"),
          col("m.o_orderpriority").as("mode_priority"),
          col("m.cnt").as("n"))
        .orderBy("o_orderstatus")
    },

    // disjunctive multi-clause predicate (the TPC-H Q19 shape): an OR of
    // brand/size/quantity AND-clauses across the part join. The plan
    // property that matters: Catalyst's CNF conversion extracts the
    // single-side conjuncts (p_size >= 1, quantity bounds envelope) and
    // pushes them INTO each scan before the join, so the broadcast join
    // sees pre-filtered inputs instead of evaluating the full disjunction
    // post-join; exact cents end-to-end
    "q78_disjunctive" -> { (s, dir) =>
      val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast("long")
      val clause = (
        col("p_brand") === "Brand#1" && col("p_size").between(1, 10)
          && col("l_quantity").between(1, 20)) || (
        col("p_brand") === "Brand#2" && col("p_size").between(1, 20)
          && col("l_quantity").between(10, 30)) || (
        col("p_brand") === "Brand#3" && col("p_size").between(1, 30)
          && col("l_quantity").between(20, 40))
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .where(clause)
        .agg(sum(cents).as("revenue_cents"), count(lit(1)).as("n_items"))
    },

    // bitemporal as-of (valid time × transaction time — the feature-store
    // / audit double cut): each change carries WHEN it is business-
    // effective (valid_seq) and WHEN it was recorded (tx_seq, late for
    // some feed lags). "State as KNOWN at tx T, effective at V" = filter
    // tx_seq <= T, then latest valid_seq <= V per key — one codegen
    // filter + one map-side-combinable argmax (max_by over (valid_seq,
    // tx_seq), tie-pinned), never a window or range join. Late-recorded
    // rows (tx > T) correctly vanish from the reconstruction — the
    // lookahead-leakage mistake a plain as-of silently makes
    "q77_bitemporal" -> { (s, dir) =>
      val changes = Tables.orders(s, dir)
        .select(col("o_custkey").as("k"),
          col("o_orderkey").as("valid_seq"),
          (col("o_orderkey") + col("o_custkey") % 7 * 1000).as("tx_seq"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val (txT, validV) = (30000L, 25000L)
      changes
        .where(col("tx_seq") <= txT && col("valid_seq") <= validV)
        .groupBy(col("k"))
        .agg(max_by(
          struct(col("valid_seq"), col("tx_seq"), col("cents")),
          struct(col("valid_seq"), col("tx_seq"))).as("m"))
        .select(col("k"), col("m.valid_seq").as("valid_seq"),
          col("m.tx_seq").as("tx_seq"), col("m.cents").as("cents"))
        .orderBy("k")
    },

    // min-cost supplier per part (the TPC-H Q2 shape without partsupp:
    // observed unit cost from lineitem): two map-side-combinable hash
    // aggs — (part, supp) min cents, then per-part argmin via struct-min
    // (tie pinned to the smaller suppkey) — then broadcast joins to the
    // supplier/nation dims. Never a per-part sort; the correlated-subquery
    // formulation Q2 uses would re-scan per part
    "q72_min_cost_supplier" -> { (s, dir) =>
      val cost = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(floor(col("l_extendedprice") * 100).cast("long")).as("cost_cents"))
      val best = cost.groupBy(col("l_partkey"))
        .agg(min(struct(col("cost_cents"), col("l_suppkey"))).as("m"))
        .select(col("l_partkey").as("part_key"),
          col("m.cost_cents").as("cost_cents"),
          col("m.l_suppkey").as("supp_key"))
      best
        .join(broadcast(Tables.supplier(s, dir)), col("supp_key") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .select(col("part_key"), col("supp_key"), col("s_name"), col("n_name"),
          col("cost_cents"))
        .orderBy("part_key")
    },

    // market share (the TPC-H Q8 shape): per (order year, supplier
    // region), the revenue share contributed by one nation's suppliers.
    // Exact integer cents end-to-end; the share is ppm by integer
    // division so no float ratio crosses engines. Fact side shuffles once
    // for the orders join; supplier→nation→region are broadcast dims.
    // (num·1e6 fits a LONG through ~sf10; at 100 TB widen to decimal —
    // same plan shape)
    "q73_market_share" -> { (s, dir) =>
      val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast("long")
      val supNation = Tables.supplier(s, dir)
        .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey").as("sk"), col("n_name"), col("r_name"))
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supNation), col("l_suppkey") === col("sk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"), col("r_name"))
        .agg(
          sum(when(col("n_name") === "NATION_7", cents).otherwise(0L)).as("num_cents"),
          sum(cents).as("den_cents"))
        .select(col("o_year"), col("r_name"), col("num_cents"), col("den_cents"),
          expr("num_cents * 1000000L div den_cents").as("share_ppm"))
        .orderBy("o_year", "r_name")
    },

    // promo revenue share per ship month (the TPC-H Q14 shape): one
    // broadcast join to the part dim, one month rollup, exact cents and
    // a ppm integer share — the marketing KPI computed without a single
    // cross-engine float ratio
    "q74_promo_share" -> { (s, dir) =>
      val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast("long")
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy((year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
          .cast("long").as("ship_month"))
        .agg(
          sum(when(col("p_type") === "PROMO", cents).otherwise(0L)).as("promo_cents"),
          sum(cents).as("total_cents"))
        .select(col("ship_month"), col("promo_cents"), col("total_cents"),
          expr("promo_cents * 1000000L div total_cents").as("promo_ppm"))
        .orderBy("ship_month")
    },

    // RFM customer segmentation (the CRM staple): recency / frequency /
    // monetary per customer, each scored into quintiles by EXACT rank
    // arithmetic — three GlobalRank passes (range-partitioned, no
    // single-task global window) + per-row ((rank−1)·5) div n + 1, then
    // two hash joins reassemble the scores. Rows are bounded by
    // |customers|; ties pin on custkey so every rank is total-ordered
    "q76_rfm" -> { (s, dir) =>
      val base = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(
          max(floor(unix_timestamp(col("o_orderdate")) / 86400).cast("long")).as("recency_day"),
          count(lit(1)).as("frequency"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("monetary_cents"))
      val tot = base.agg(count(lit(1)).as("n_cust"))
      def quintile(metric: String, score: String): DataFrame =
        graft.operators.GlobalRank
          .withGlobalRank(base.select(col("o_custkey"), col(metric)),
            Seq(col(metric), col("o_custkey")), "__r")
          .crossJoin(broadcast(tot))
          .select(col("o_custkey"),
            expr("(__r - 1) * 5 div n_cust + 1").as(score))
      val r = quintile("recency_day", "r_score")
      val f = quintile("frequency", "f_score")
      val m = quintile("monetary_cents", "m_score")
      base.join(r, "o_custkey").join(f, "o_custkey").join(m, "o_custkey")
        .select(col("o_custkey"), col("recency_day"), col("frequency"),
          col("monetary_cents"), col("r_score"), col("f_score"), col("m_score"),
          (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).as("rfm_code"))
        .orderBy("o_custkey")
    },

    // late-order priority census (the TPC-H Q4 shape): orders with at
    // least one lineitem shipped >45 days after order date, counted per
    // priority. EXISTS compiles to ONE left-semi hash join on the order
    // key with the non-equi ship-lag residual evaluated in the join —
    // no distinct pass, each order emitted at most once, fact side
    // shuffles once on its natural key
    "q75_order_priority" -> { (s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate")),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 45 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // customer order-count distribution (the TPC-H Q13 shape): LEFT join
    // keeps order-less customers (their count 0 IS the interesting
    // bucket), then a second rollup over the per-customer counts — the
    // classic histogram-of-a-groupBy; both aggregations partial-combine
    "q79_cust_orders_dist" -> { (s, dir) =>
      Tables.customer(s, dir).select(col("c_custkey"))
        .join(Tables.orders(s, dir).select(col("o_custkey"), col("o_orderkey")),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("c_count"))
    },

    // parts-supplier relationship census (the TPC-H Q16 shape): distinct
    // (part, supplier) pairs from lineitem (the partsupp proxy), suppliers
    // in deficit excluded by a BROADCAST anti-join (the complaint list is
    // dim-sized), one excluded brand, then COUNT DISTINCT suppliers per
    // (brand, type, size). The distinct-pairs pass runs FIRST so the dim
    // joins and final rollup see |partsupp|, not |lineitem|, rows
    "q80_parts_supplier_cnt" -> { (s, dir) =>
      val deficitSupp = Tables.supplier(s, dir).where(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(broadcast(deficitSupp), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .join(Tables.part(s, dir).where(col("p_brand") =!= "Brand#1"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy("p_brand", "p_type", "p_size")
    },

    // waiting-supplier audit (the TPC-H Q21 shape, shipdate-adapted): on
    // finalized multi-supplier orders, count per supplier the lines no
    // OTHER supplier out-shipped. The doubly-correlated EXISTS/NOT EXISTS
    // is NOT executed as two self-joins at lineitem granularity — per
    // (order, supplier) maxima roll up first, then per order the top ship
    // date, its achiever count and the runner-up are enough to derive
    // max-over-OTHER-suppliers for every row: two partial-combinable
    // aggregations + joins back on the order key, no O(lines²-per-order)
    // pairing (the oracle replays the literal EXISTS form, proving the
    // aggregate derivation equivalent)
    "q81_waiting_supplier" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).where(col("o_orderstatus") === "F")
          .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val suppMax = li.groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("l_shipdate")).as("supp_max"))
      val top = suppMax.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"), max(col("supp_max")).as("m1"))
      val stats = suppMax.join(top, "l_orderkey")
        .groupBy(col("l_orderkey"), col("n_supp"), col("m1"))
        .agg(
          sum(when(col("supp_max") === col("m1"), 1L).otherwise(0L)).as("cnt_m1"),
          max(when(col("supp_max") < col("m1"), col("supp_max"))).as("m2"))
      val maxOther = when(col("supp_max") === col("m1") && col("cnt_m1") === 1L,
        col("m2")).otherwise(col("m1"))
      li.join(suppMax, Seq("l_orderkey", "l_suppkey"))
        .join(stats, "l_orderkey")
        .where(col("n_supp") >= 2 && col("l_shipdate") >= maxOther)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
    },

    // dormant high-balance customers per segment (the TPC-H Q22 shape):
    // customers above the average positive balance with no order since
    // 2000-01-01 (every synthetic customer has SOME order, so dormancy is
    // a recency window — the realistic churn-audit form anyway). The
    // scalar-subquery average is one broadcast row, and the threshold
    // compare is CROSS-MULTIPLIED integer cents (bal·n > sum) so no
    // float division crosses engines; the dormancy test is a left-anti
    // join against the date-filtered orders (filter pushed to the scan)
    "q82_idle_customers" -> { (s, dir) =>
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"),
          floor(col("c_acctbal") * 100).cast("long").as("bal_cents"))
      val thr = cust.where(col("bal_cents") > 0)
        .agg(sum(col("bal_cents")).as("sum_cents"), count(lit(1)).as("n_pos"))
      val recent = Tables.orders(s, dir)
        .where(col("o_orderdate") >= to_timestamp(lit("2000-01-01")))
        .select(col("o_custkey"))
      cust
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .crossJoin(broadcast(thr))
        .where(col("bal_cents") * col("n_pos") > col("sum_cents"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"), sum(col("bal_cents")).as("totbal_cents"))
        .orderBy("c_mktsegment")
    },

    // local-supplier volume (the TPC-H Q5 shape): revenue where the
    // customer and the supplier share a nation, per nation. The two fact
    // tables shuffle once each on their join keys; supplier/nation/region
    // are broadcast dims; the co-nation condition rides the supplier join
    // as an equi-key (no residual filter pass). Exact integer cents
    "q83_local_volume" -> { (s, dir) =>
      val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast("long")
      val supNation = Tables.supplier(s, dir)
        .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey").as("sk"), col("s_nationkey").as("snk"),
          col("n_name"), col("r_name"))
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
          .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supNation),
          col("l_suppkey") === col("sk") && col("c_nationkey") === col("snk"))
        .groupBy(col("n_name"))
        .agg(sum(cents).as("revenue_cents"), count(lit(1)).as("n_items"))
        .orderBy("n_name")
    },

    // returned-item revenue per customer (the TPC-H Q10 shape): who sent
    // the most money back. lineitem⋈orders on the natural key, one
    // customer join, nation broadcast — no top-k cutoff so the oracle is
    // tie-free; ordered by key
    "q84_returned_revenue" -> { (s, dir) =>
      val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast("long")
      Tables.lineitem(s, dir)
        .where(col("l_returnflag") === "R")
        .join(Tables.orders(s, dir)
          .where(col("o_orderdate") >= to_timestamp(lit("2000-01-01"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(cents).as("returned_cents"), count(lit(1)).as("n_returns"))
        .orderBy("c_custkey")
    },

    // top supplier by quarter revenue (the TPC-H Q15 shape): the MAX is a
    // one-row broadcast back over the supplier rollup — no global sort,
    // no window; ties all surface (the oracle is deterministic either way)
    "q85_top_supplier" -> { (s, dir) =>
      val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast("long")
      val rev = Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= to_timestamp(lit("2000-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("2000-04-01")))
        .groupBy(col("l_suppkey"))
        .agg(sum(cents).as("total_cents"))
      val mx = rev.agg(max(col("total_cents")).as("mx"))
      rev.crossJoin(broadcast(mx))
        .where(col("total_cents") === col("mx"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_cents"))
        .orderBy("s_suppkey")
    },

    // small-quantity revenue (the TPC-H Q17 shape): lineitems below 20%
    // of their part's average quantity, one brand. The correlated
    // average is a part-key rollup joined back; the 0.2·avg comparison is
    // EXACT integer arithmetic (qty·5·count < sum — l_quantity is
    // integral), so no float ratio crosses engines
    "q86_small_qty_revenue" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).where(col("p_brand") === "Brand#11")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
          floor(col("l_extendedprice") * 100).cast("long").as("cents"))
        .localCheckpoint()
      val avgq = li.groupBy(col("l_partkey"))
        .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("n_li"))
      li.join(avgq, "l_partkey")
        .where(col("qty") * 5 * col("n_li") < col("sum_qty"))
        .agg(sum(col("cents")).as("small_qty_cents"), count(lit(1)).as("n_small"))
        .select(col("small_qty_cents"), col("n_small"))
    },

    // large-order customers (the TPC-H Q18 shape): orders whose total
    // quantity exceeds the threshold, with their customer. The HAVING
    // rollup runs on the lineitem natural key (one shuffle), then two
    // key joins; quantities stay integral longs
    "q87_large_orders" -> { (s, dir) =>
      val qty = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
        .where(col("total_qty") > 150L)
      qty.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          floor(unix_timestamp(col("o_orderdate")) / 86400).cast("long")
            .as("order_day"),
          floor(col("o_totalprice") * 100).cast("long").as("price_cents"),
          col("total_qty"))
        .orderBy("o_orderkey")
    },

    // bilateral shipping volume (the TPC-H Q7 shape): revenue flowing
    // between two nations in both directions, per ship year. Supplier and
    // customer nations resolve through broadcast dims; the direction pair
    // is the group key so one aggregation serves both legs
    "q88_nation_volume" -> { (s, dir) =>
      val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast("long")
      // the two-nation filter lands on the DIMS, so the fact side drops
      // to the relevant ~2/|nations| slice inside the joins instead of
      // carrying every row to a residual filter
      val pair = Seq("NATION_1", "NATION_2")
      val supN = Tables.supplier(s, dir)
        .join(Tables.nation(s, dir).where(col("n_name").isin(pair: _*)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey").as("sk"), col("n_name").as("supp_nation"))
      val custN = Tables.customer(s, dir)
        .join(Tables.nation(s, dir).where(col("n_name").isin(pair: _*)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey").as("ck"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supN), col("l_suppkey") === col("sk"))
        .join(custN, col("o_custkey") === col("ck"))
        .where(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("ship_year"))
        .agg(sum(cents).as("volume_cents"), count(lit(1)).as("n_items"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    },

    // through ONE task). The interpolation arithmetic is replayed
    // verbatim in the oracle — bit-identical regardless of how
    // quantile_cont associates
    "q50_median_scale" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_extendedprice").as("v"))
      val counts = li.groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
      def r(p: Double) = lit(1.0) + lit(p) * (col("n") - 1).cast("double")
      def lo(p: Double) = floor(r(p)).cast("long")
      def hi(p: Double) = ceil(r(p)).cast("long")
      def interp(p: Double, loV: Column, hiV: Column) =
        loV + (hiV - loV) * (r(p) - floor(r(p)))
      graft.operators.GlobalRank.withGroupedPrefixSum(
          li, Seq("l_returnflag", "l_linestatus"), Seq(col("v")), lit(1L),
          rankCol = "rn")
        .drop("grp_prefix")
        .join(broadcast(counts), Seq("l_returnflag", "l_linestatus"))
        .groupBy(col("l_returnflag"), col("l_linestatus"), col("n"))
        .agg(max(when(col("rn") === lo(0.5), col("v"))).as("lo50"),
          max(when(col("rn") === hi(0.5), col("v"))).as("hi50"),
          max(when(col("rn") === lo(0.9), col("v"))).as("lo90"),
          max(when(col("rn") === hi(0.9), col("v"))).as("hi90"))
        .select(col("l_returnflag"), col("l_linestatus"), col("n"),
          interp(0.5, col("lo50"), col("hi50")).as("med_price"),
          interp(0.9, col("lo90"), col("hi90")).as("p90_price"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // sliding (hopping) time windows — the overlapping twin of
    // q13_events_hourly's tumbling windows: every event lands in 4
    // epoch-aligned 1h windows at 15min hops. One groupBy after a 4×
    // in-flight expand; measures are counts and min/max (order-free), no
    // float accumulation. Session TZ is UTC so window alignment matches
    // the oracle's epoch arithmetic exactly
    "q49_sliding_window" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("value")).as("min_v"), max(col("value")).as("max_v"))
        .select(unix_timestamp(col("window.start")).as("start_sec"),
          col("event_type"), col("n"), col("min_v"), col("max_v"))
        .orderBy("start_sec", "event_type")
    },

    // semi-structured ingest: a nested JSON order document (id + items
    // array) parsed with an EXPLICIT schema (from_json — schema-on-read,
    // no inference pass) and flattened to child rows via posexplode. The
    // document text is synthesized deterministically, and the oracle is
    // the construction GROUND TRUTH — so the parse+flatten path is
    // verified against an independent answer, not a JSON re-parse
    "q48_json_flatten" -> { (s, dir) =>
      val k = col("o_orderkey")
      val itemsJson = array_join(
        transform(sequence(lit(0L), k % 3),
          i => concat(lit("{\"p\":"), (k * 10 + i).cast("string"),
            lit(",\"q\":"), ((k + i) % 7).cast("string"), lit("}"))), ",")
      val doc = concat(lit("{\"id\":"), k.cast("string"),
        lit(",\"items\":["), itemsJson, lit("]}"))
      val schema = org.apache.spark.sql.types.DataType.fromDDL(
        "STRUCT<id: BIGINT, items: ARRAY<STRUCT<p: BIGINT, q: BIGINT>>>")
      Tables.orders(s, dir)
        .select(k)
        .orderBy("o_orderkey")
        .select(from_json(doc, schema).as("j"))
        .select(col("j.id").as("id"), posexplode(col("j.items")).as(Seq("pos", "item")))
        .select(col("id"), col("pos"), col("item.p").as("p"), col("item.q").as("q"))
    },

    // grouped EXACT medians/percentiles over doubles (the reporting twin
    // of the approx sketch path): percentile() sorts within each group —
    // bounded per-group work after one shuffle; at 100 TB swap to
    // percentile_approx and the sort disappears (bounds asserted in
    // RangeJoinSpec). Interpolation formula matches quantile_cont
    // bit-for-bit (same rank = p·(n−1) linear interpolation)
    "q47_median" -> { (s, dir) =>
      // both price percentiles from ONE aggregate buffer (array form):
      // each percentile() is an object aggregate holding a value->count
      // map, so asking twice doubles the heaviest buffer for nothing
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          expr("percentile(l_quantity, 0.5d)").as("med_qty"),
          expr("percentile(l_extendedprice, array(0.5d, 0.9d))").as("__p"))
        .select(col("l_returnflag"), col("l_linestatus"), col("n"),
          col("med_qty"), col("__p")(0).as("med_price"), col("__p")(1).as("p90_price"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // nearest-in-time join (sensor alignment): each click matched to the
    // CLOSEST purchase by the same user in EITHER direction (ties to the
    // earlier one) — where as-of's "latest before" is wrong because the
    // nearest reading may be just ahead. One (key, time) window pass
    // computes backward + forward carries, per-row arithmetic picks; no
    // range join. Purchases pre-aggregated per (user, sec) to satisfy
    // the right-side uniqueness contract
    "q46_asof_nearest" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("sec"), col("event_type"), col("value"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("sec"))
      val purchases = ev.where(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("sec").as("psec"))
        .agg(max(col("value")).as("amount"))
      graft.operators.AsOfJoin.asofNearest(clicks, purchases,
        "user_id", "sec", "psec")
        .orderBy("event_id")
    },

    // date arithmetic at scale: order→ship latency in days (datediff on
    // the joined fact pair), exact integer day counts aggregated per
    // priority; the shuffle is the fact-fact join on the order key, avg
    // derives from exact long sums
    "q41_ship_latency" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship"))
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("ordered"),
          col("o_orderpriority"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("ship"), col("ordered")).cast("long").as("lat"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          min(col("lat")).as("min_days"), max(col("lat")).as("max_days"),
          (sum(col("lat")).cast("double") / count(lit(1))).as("avg_days"))
        .orderBy("o_orderpriority")
    },

    // rank/dense_rank over genuine ties + navigation (lead, first_value):
    // the gap in the window surface the other queries don't hit. Ties
    // rank over the DATE ALONE (tied rows share the rank value, so the
    // result is deterministic); navigation uses the fully-tiebroken order
    "q40_rank_nav" -> { (s, dir) =>
      val wTies = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_orderdate"))
      val wFull = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          rank().over(wTies).as("rnk"),
          dense_rank().over(wTies).as("drnk"),
          lead(col("o_orderkey"), 1).over(wFull).as("next_key"),
          first(col("o_orderkey")).over(wFull).as("first_key"))
        .orderBy("o_orderkey")
    },

    // distributed statistical aggregates WITHOUT float merge-order drift:
    // corr/stddev over doubles hash-mismatch across engines because the
    // partial-merge tree orders the additions differently. Here the ONE
    // aggregation pass collects exact DECIMAL power sums (n, sx, sy, sxx,
    // syy, sxy) — associative in any merge order — and Pearson r / stddev
    // fall out as per-group double arithmetic afterwards (the q37 trick,
    // extended to two variables)
    "q38_corr_stats" -> { (s, dir) =>
      val x = dec(col("l_quantity"))
      val y = dec(col("l_extendedprice"))
      val st = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          dstr(sum(x)).as("sx"), dstr(sum(y)).as("sy"),
          dstr(sum(x * x)).as("sxx"), dstr(sum(y * y)).as("syy"),
          dstr(sum(x * y)).as("sxy"))
      val n = col("n").cast("double")
      st.select(col("l_returnflag"), col("n"),
        ((col("sxy") - col("sx") * col("sy") / n) /
          (sqrt(col("sxx") - col("sx") * col("sx") / n) *
            sqrt(col("syy") - col("sy") * col("sy") / n))).as("corr_qty_price"),
        sqrt((col("sxx") - col("sx") * col("sx") / n) / (n - lit(1.0)))
          .as("stddev_qty"))
        .orderBy("l_returnflag")
    },

    // funnel analysis: how many users progressed signup → view → click →
    // purchase IN ORDER. One conditional min-timestamp aggregation per
    // user (partial-agg friendly, shuffles once on user_id), stage depth
    // as pure arithmetic after — no self-joins, no per-stage passes
    "q39_funnel" -> { (s, dir) =>
      // epoch seconds, not raw ts: the determinism rule — parquet carries
      // nanos, Spark sees micros, so stage comparisons use a precision
      // both engines share
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          floor(unix_timestamp(col("ts"))).cast("long").as("sec"))
      def stageTs(t: String): Column = min(when(col("event_type") === t, col("sec")))
      val perUser = ev.groupBy(col("user_id"))
        .agg(stageTs("signup").as("t1"), stageTs("view").as("t2"),
          stageTs("click").as("t3"), stageTs("purchase").as("t4"))
      val s1 = col("t1").isNotNull
      val s2 = s1 && col("t2") > col("t1")
      val s3 = s2 && col("t3") > col("t2")
      val s4 = s3 && col("t4") > col("t3")
      perUser.select(
        sum(when(s1, 1L).otherwise(0L)).as("n_signup"),
        sum(when(s2, 1L).otherwise(0L)).as("n_viewed"),
        sum(when(s3, 1L).otherwise(0L)).as("n_clicked"),
        sum(when(s4, 1L).otherwise(0L)).as("n_purchased"))
    },

    "q33_histogram" -> { (s, dir) =>
      // fixed-width value histogram — one partial-agg pass; identical IEEE
      // double division in both engines keeps bucket edges deterministic
      Tables.orders(s, dir)
        .select(floor(col("o_totalprice") / 50000).cast("long").as("bucket"),
          col("o_totalprice"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("mn"),
          max(col("o_totalprice")).as("mx"),
          d(sum(dec(col("o_totalprice")))).as("sum_price"))
        .orderBy("bucket")
    },

    "q32_full_outer" -> { (s, dir) =>
      // FULL OUTER join: per-customer order counts vs the negative-balance
      // customer roster — unmatched rows survive from BOTH sides (active
      // customers in good standing left-only, inactive debtors right-only)
      val counts = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("ck")).agg(count(lit(1)).as("n_orders"))
      val debtors = Tables.customer(s, dir)
        .where(col("c_acctbal") < 0)
        .select(col("c_custkey"), col("c_name"))
      counts.join(debtors, col("ck") === col("c_custkey"), "full_outer")
        .select(coalesce(col("ck"), col("c_custkey")).as("custkey"),
          col("n_orders"), col("c_name"))
        .orderBy("custkey")
    },

    "q22_scalar_subquery" -> { (s, dir) =>
      // orders above the global average price: the scalar aggregate joins
      // in as a broadcast single-row cross join, never a driver round-trip
      val globalAvg = Tables.orders(s, dir)
        .agg((d(sum(dec(col("o_totalprice")))) / count(lit(1))).as("global_avg"))
      Tables.orders(s, dir)
        .crossJoin(broadcast(globalAvg))
        .where(col("o_totalprice") > col("global_avg"))
        .select(col("o_orderkey"), col("o_totalprice"), col("global_avg"))
        .orderBy("o_orderkey")
    },

    "q23_event_gaps" -> { (s, dir) =>
      // lead/lag navigation: inter-event gap per user, bucketed histogram
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          floor(unix_timestamp(col("ts"))).cast("long").as("sec"))
        .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
        .where(col("gap").isNotNull)
        .select(
          when(col("gap") < 60, "lt_1m").when(col("gap") < 600, "lt_10m")
            .when(col("gap") < 3600, "lt_1h").otherwise("ge_1h").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_gaps"))
        .orderBy("bucket")
    },

    // the aggregate top-k twin of q5: a bounded per-group heap with
    // map-side combine — the shuffle carries <= k values per group per
    // partition instead of sorting every row under a window
    "q24_topk_agg" -> { (s, dir) =>
      val cents = (dec(col("o_totalprice")) * 100).cast("long")
      Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(graft.expressions.TopKAgg.topK(cents, 3).as("tk"))
        .select(col("o_custkey"),
          concat_ws(",", transform(col("tk"), v => v.cast("string"))).as("top_cents"))
        .orderBy("o_custkey")
    },

    "q25_range_frame" -> { (s, dir) =>
      // RANGE frame: trailing 5-minute event-value sum per user — value-
      // based frames, not row counts (q15 covers the ROWS variant)
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
        .rangeBetween(-300L, Window.currentRow)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          floor(unix_timestamp(col("ts"))).cast("long").as("sec"),
          dec(col("value")).as("v"))
        .select(col("event_id"), col("user_id"), col("sec"),
          d(sum(col("v")).over(w)).as("trailing_5m"))
        .orderBy("event_id")
    },

    // FORWARD-looking RANGE frame (q25 is the trailing twin): events in
    // the next 10 minutes per user — the "what happens after X" feature
    // window a lookahead label builder uses. Same single (user, sec)
    // shuffle+sort; counts are exact longs
    "q71_forward_frame" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
        .rangeBetween(1L, 600L)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          floor(unix_timestamp(col("ts"))).cast("long").as("sec"))
        .select(col("event_id"), col("user_id"), col("sec"),
          coalesce(count(lit(1)).over(w), lit(0L)).as("next_10m_events"))
        .orderBy("event_id")
    },

    "q26_session_window" -> { (s, dir) =>
      // Spark's NATIVE session_window grouped aggregation — the built-in
      // twin of the custom Sessionize operator (q14); same output modulo
      // the session index
      Tables.events(s, dir)
        .select(col("user_id"),
          timestamp_seconds(floor(unix_timestamp(col("ts"))).cast("long")).as("tss"))
        .groupBy(col("user_id"), session_window(col("tss"), "1800 seconds"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("n_events"),
          unix_timestamp(col("session_window.start")).as("start_sec"),
          // session_window.end is exclusive: last event + gap
          (unix_timestamp(col("session_window.end")) - 1800L).as("last_sec"))
        .orderBy("user_id", "start_sec")
    },

    "q16_above_avg" -> { (s, dir) =>
      val avgs = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("ck"))
        .agg((d(sum(dec(col("o_totalprice")))) / count(lit(1))).as("cust_avg"))
      Tables.orders(s, dir)
        .join(avgs, col("o_custkey") === col("ck"))
        .where(col("o_totalprice") > col("cust_avg"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("cust_avg"))
        .orderBy("o_orderkey")
    },

    "q28_grouping_sets" -> { (s, dir) =>
      // explicit GROUPING SETS (neither rollup nor cube): per-status,
      // per-priority, and grand-total marginals in ONE pass over the fact
      // table — one shuffle, Spark expands the sets map-side
      Tables.orders(s, dir)
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping(col("o_orderstatus")).as("g_status"),
          grouping(col("o_orderpriority")).as("g_priority"),
          sum(dec(col("o_totalprice"))).as("dsp"), count(lit(1)).as("n_orders"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("g_status"), col("g_priority"),
          d(col("dsp")).as("sum_price"), col("n_orders"))
        .orderBy("status", "priority")
    },

    "q29_ntile" -> { (s, dir) =>
      // customer spend quartiles: ntile + the exact-rational rank ratios.
      // Built-in global window = ONE task — acceptable for a per-key
      // aggregate output (rows = |customers|); q30 is the scale path for
      // the same statistics
      val rev = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(dec(col("o_totalprice"))).as("drev"))
      val w = Window.orderBy(col("drev"), col("o_custkey"))
      rev.select(col("o_custkey"), d(col("drev")).as("revenue"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("o_custkey")
    },

    "q30_global_rank" -> { (s, dir) =>
      // the SCALE path for global ranking: range-partitioned sort +
      // per-partition offsets (GlobalRank) instead of the single-task
      // Window.orderBy; quartile/percent-rank become per-row arithmetic
      // over (rank, total) with the total as a broadcast 1-row aggregate
      // checkpoint rev so the orders scan + aggregation runs once, not
      // once per consumer (the rank pipeline executes it twice more via
      // zipWithIndex's offset job otherwise)
      val rev = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(dec(col("o_totalprice"))).as("drev"))
        .localCheckpoint(eager = true)
      val ranked = graft.operators.GlobalRank.withGlobalRank(
        rev, Seq(col("drev"), col("o_custkey")))
      val total = rev.agg(count(lit(1)).as("n_total"))
      ranked.crossJoin(broadcast(total))
        .select(col("o_custkey"), d(col("drev")).as("revenue"), col("rank"),
          (expr("((rank - 1) * 4) DIV n_total") + 1).cast("int").as("bucket4"),
          ((col("rank") - 1).cast("double") / (col("n_total") - 1)).as("pr"))
        .orderBy("o_custkey")
    },

    // Spark 4 VARIANT ingestion (the open-format answer to shredded
    // semi-structured columns): props parsed ONCE into the binary variant
    // encoding, fields then typed-accessed without re-parsing —
    // try_variant_get pushes the extraction into the scan stage, and at
    // 100 TB variant shredding stores hot fields columnar so the scan
    // prunes like any column. q12/q48 are the string-JSON twins; this is
    // the path a lakehouse actually lands event payloads on
    // RECURSIVE CTE (Spark 4's WITH RECURSIVE — the iterative-closure
    // surface q45_hierarchy/q67_bfs_reach hand-roll with driver loops,
    // expressed declaratively): customers form a deterministic binary
    // referral tree (parent(k) = k DIV 2), and the recursion walks each
    // seed's ancestor chain to the root. Spark executes each recursion
    // level as a DISTRIBUTED self-join union — the frontier shrinks
    // geometrically (≤ log₂ maxkey levels), so at 100 TB this is
    // iterative BFS with no driver-side row movement; termination is by
    // value (chain reaches key 1) with a depth guard. The oracle replays
    // the identical recursion in DuckDB.
    "q70_recursive_cte" -> { (s, dir) =>
      Tables.customer(s, dir).createOrReplaceTempView("q70_cust")
      s.sql("""WITH RECURSIVE chain(ck, root, depth, bal) AS (
              |  SELECT c_custkey, c_custkey, 0,
              |         CAST(FLOOR(c_acctbal * 100) AS BIGINT)
              |  FROM q70_cust WHERE c_custkey % 97 = 0
              |  UNION ALL
              |  SELECT c.c_custkey, ch.root, ch.depth + 1,
              |         CAST(FLOOR(c.c_acctbal * 100) AS BIGINT)
              |  FROM chain ch JOIN q70_cust c ON c.c_custkey = ch.ck DIV 2
              |  WHERE ch.ck > 1 AND ch.depth < 25
              |)
              |SELECT root, COUNT(*) AS chain_len, MAX(depth) AS max_depth,
              |       CAST(SUM(bal) AS BIGINT) AS chain_bal_cents
              |FROM chain GROUP BY root ORDER BY root""".stripMargin)
    },

    "q69_variant" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"), parse_json(col("props")).as("v"))
        .select(col("event_type"),
          expr("try_variant_get(v, '$.k', 'bigint')").as("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_k"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")
    },

    // peak concurrency (max interval overlap — the "how many sessions
    // were live at once" capacity query) by sweep line: each 300 s
    // activity interval contributes a +1 start and a −1 end point, the
    // running sum over (time, delta, id) order is the live count, its max
    // per type is the answer. The per-type running sum is the range-
    // partitioned grouped prefix sum (event_type is low-cardinality — a
    // per-type window would funnel each type through ONE task at 100 TB);
    // (t, delta, event_id) is a total order, and −1 sorting before +1 at
    // equal t gives half-open [s, s+300) semantics in both engines
    "q68_peak_concurrency" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_type"),
          floor(unix_timestamp(col("ts"))).cast("long").as("sec"),
          col("event_id"))
      val pts = ev.select(col("event_type"), col("sec").as("t"),
          lit(1L).as("delta"), col("event_id"))
        .unionAll(ev.select(col("event_type"), (col("sec") + 300).as("t"),
          lit(-1L).as("delta"), col("event_id")))
      graft.operators.GlobalRank.withGroupedPrefixSum(
          pts, Seq("event_type"),
          Seq(col("t"), col("delta"), col("event_id")), col("delta"),
          prefixCol = "pre")
        .select(col("event_type"), col("delta"),
          (col("pre") + col("delta")).as("concurrent"))
        .groupBy(col("event_type"))
        .agg(sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_intervals"),
          max(col("concurrent")).as("max_concurrent"))
        .orderBy("event_type")
    },

    // duplicate-payment audit (the double-charge reconciliation check):
    // customers with MULTIPLE orders on the same day, reported with their
    // exact-cent amount spread (spread 0 = identical amounts — the classic
    // double-submit). ONE hash aggregation on the composite key — the
    // pair/window formulations of this audit do strictly more work for
    // the same answer
    "dq_double_charge" -> { (s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_custkey"),
          floor(unix_timestamp(col("o_orderdate")) / 86400).cast("long")
            .as("day_num"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"),
          col("o_orderkey"))
        .groupBy(col("o_custkey"), col("day_num"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_orderkey")).as("first_ok"),
          max(col("o_orderkey")).as("last_ok"),
          (max(col("cents")) - min(col("cents"))).as("cents_spread"))
        .where(col("n_orders") > 1)
        .orderBy("o_custkey", "day_num")
    },

    // bounded-hop BFS reachability over the co-purchase graph (the
    // "blast radius" / related-items expansion shape): min-hop label for
    // every node within 3 hops of a seed set. Frontier-join BFS — each
    // round is ONE join of the (pre-partitioned, checkpointed) adjacency
    // against the CURRENT frontier plus an anti-join against the reached
    // set, so round cost tracks the frontier's edge boundary, not the
    // graph; rounds are a fixed constant (the bounded-hop contract), and
    // the seed predicate is arithmetic (v % 50), not a driver-side list.
    // Pointer-jumping (q45) is the unbounded-depth closure; this is the
    // bounded-radius twin every recommender/graph-feature pipeline runs
    "q67_bfs_reach" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val e = li.select(col("l_orderkey"), col("l_partkey")).distinct()
        .groupBy(col("l_orderkey"))
        .agg(array_sort(collect_list(col("l_partkey"))).as("parts"))
        .select(explode(expr(
          "flatten(transform(parts, (x, i) -> " +
            "transform(slice(parts, i + 2, size(parts)), y -> struct(x AS a, y AS b))))"
        )).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n"))
        .where(col("n") >= 2)
        .select(col("a"), col("b"))
      val adj = e.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
        .localCheckpoint(eager = true)
      val nodes = adj.select(col("src").as("v")).distinct()
      var reached = nodes.where(col("v") % 50 === 0)
        .select(col("v"), lit(0L).as("hop"))
        .localCheckpoint(eager = true)
      var frontier = reached.select(col("v"))
      for (h <- 1 to 3) {
        val next = adj.join(frontier.withColumnRenamed("v", "src"), "src")
          .select(col("dst").as("v")).distinct()
          .join(reached.select(col("v")), Seq("v"), "left_anti")
          .select(col("v"), lit(h.toLong).as("hop"))
          .localCheckpoint(eager = true)
        reached = reached.unionAll(next).localCheckpoint(eager = true)
        frontier = next.select(col("v"))
      }
      reached.orderBy("v")
    },

    // gaps-and-islands: per-user activity streaks over consecutive UTC
    // days (the engagement-streak shape). Island id = day − row_number in
    // day order, constant exactly across a consecutive run — two hash
    // aggregations plus ONE window partitioned on the high-cardinality
    // user key (each user's distinct-day list is tiny and bounded by the
    // calendar, so per-task work never concentrates). best_start picks
    // the longest streak's start in one map-side-combinable min_by on an
    // exact packed (−len, start) BIGINT key — no second per-user pass
    "q65_streaks" -> { (s, dir) =>
      val days = Tables.events(s, dir)
        .select(col("user_id"),
          floor(unix_timestamp(col("ts")) / 86400).cast("long").as("day_num"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day_num"))
      val streaks = days
        .withColumn("grp", col("day_num") - row_number().over(w))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"), min(col("day_num")).as("start_day"))
      streaks.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_streaks"),
          sum(col("len")).as("n_active_days"),
          max(col("len")).as("max_streak"),
          min_by(col("start_day"),
            col("start_day") - col("len") * lit(100000000L)).as("best_start"))
        .orderBy("user_id")
    },

    // weighted percentiles (median / p90 of price weighted by units sold):
    // the "which price point splits the VOLUME in half" query. Exact-cents
    // values first collapse to the (flag, value) DISTINCT domain — the
    // prefix sum then runs over value counts, not rows — and the per-flag
    // cumulative weight is GlobalRank.withGroupedPrefixSum (range-
    // partitioned, partition-bound parallelism; a Window.partitionBy on a
    // 3-value flag would funnel each group through one task at 100 TB).
    // Both thresholds resolve from ONE pass via conditional mins; ceil is
    // exact integer arithmetic, so no float ever decides a boundary
    "q66_weighted_median" -> { (s, dir) =>
      // checkpoint: byVal feeds both the prefix-sum pipeline and the
      // per-flag totals — without it the fact-table scan+agg runs twice
      val byVal = Tables.lineitem(s, dir)
        .select(col("l_returnflag").as("flag"),
          floor(col("l_extendedprice") * 100).cast("long").as("price_cents"),
          floor(col("l_quantity")).cast("long").as("w"))
        .groupBy(col("flag"), col("price_cents"))
        .agg(sum(col("w")).as("wsum"))
        .localCheckpoint(eager = true)
      val pre = graft.operators.GlobalRank.withGroupedPrefixSum(
        byVal, Seq("flag"), Seq(col("price_cents")), col("wsum"),
        rankCol = "vrank", prefixCol = "cum_before")
      val tot = byVal.groupBy(col("flag")).agg(sum(col("wsum")).as("wtot"))
      val cum = col("cum_before") + col("wsum")
      pre.join(broadcast(tot), "flag")
        .groupBy(col("flag"))
        .agg(min(col("wtot")).as("w_total"),
          min(when(cum >= expr("(wtot + 1) DIV 2"), col("price_cents")))
            .as("wmedian_cents"),
          min(when(cum >= expr("(9 * wtot + 9) DIV 10"), col("price_cents")))
            .as("wp90_cents"))
        .orderBy("flag")
    },

    // TPC-H Q6 shape (forecast revenue change): the pure scan-filter-agg
    // probe. The three predicates all push to the parquet scan (year
    // bounds as a shipdate range would at a real layout; discount/quantity
    // as row-group min/max prunes) and the whole plan is one codegen'd
    // stage with a partial+final agg — the shape that must stay
    // shuffle-free at 100 TB. Revenue is exact per-row cents.
    "q89_forecast_revenue" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .where(year(col("l_shipdate")) === 1996 &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(floor(col("l_extendedprice") * col("l_discount") * 100)
            .cast("long")).as("revenue_cents"),
          count(lit(1)).as("n_items"))
    },

    // TPC-H Q9 shape (product-type profit by nation and year), adapted to
    // the star schema at hand: no partsupp table, so unit supply cost is
    // half the part's retail price. Profit stays exact: both terms floor
    // to cents per row BEFORE the sum, so association can't drift. The
    // name-filtered part dim and the supplier→nation dim broadcast; the
    // fact table never shuffles until the final small groupBy.
    "q90_product_profit" -> { (s, dir) =>
      val widgetParts = Tables.part(s, dir)
        .where(col("p_name").contains("widget"))
        .select(col("p_partkey"), col("p_retailprice"))
      val supN = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey").as("sk"), col("n_name").as("nation"))
      val profit =
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long") -
        floor(col("p_retailprice") * col("l_quantity") * 50).cast("long")
      Tables.lineitem(s, dir)
        .join(broadcast(widgetParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supN), col("l_suppkey") === col("sk"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(profit).as("profit_cents"), count(lit(1)).as("n_items"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // TPC-H Q12 shape (shipmode × order-priority split), adapted: the
    // schema carries no l_shipmode, so the line's return flag plays the
    // class axis. One fact⋈fact-dim join and conditional counts — the
    // canonical "wide scan, narrow answer" report
    "q91_priority_lines" -> { (s, dir) =>
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, dir)
        .where(year(col("l_shipdate")) === 1997 && col("l_quantity") >= 25)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag").as("ship_class"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_lines"),
          sum(when(high, 0L).otherwise(1L)).as("low_lines"))
        .orderBy("ship_class")
    },

    // TPC-H Q20 shape (suppliers with excess stock of a part family),
    // adapted without partsupp: a supplier qualifies if, for some
    // 'large %' part, its own 1997 shipped volume exceeds 20% of that
    // part's total 1997 volume. Quantities compare as exact integer
    // cents ×5 — no float decides membership. The per-part total is a
    // RE-aggregate of the (part, supplier) rollup (tiny), joined back on
    // the partkey the rollup is already clustered by — the fact table is
    // scanned once and shuffled once.
    "q92_excess_suppliers" -> { (s, dir) =>
      val largeKeys = Tables.part(s, dir)
        .where(col("p_name").startsWith("large"))
        .select(col("p_partkey"))
      val perSupp = Tables.lineitem(s, dir)
        .where(year(col("l_shipdate")) === 1997)
        .join(broadcast(largeKeys), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(floor(col("l_quantity") * 100).cast("long")).as("qc"))
        .localCheckpoint(eager = true)
      val perPart = perSupp.groupBy(col("l_partkey"))
        .agg(sum(col("qc")).as("tc"))
      val excess = perSupp.join(perPart, "l_partkey")
        .where(col("qc") * 5 > col("tc"))
        .select(col("l_suppkey")).distinct()
      Tables.supplier(s, dir)
        .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
        .orderBy("s_suppkey")
    }
  )

  private val oracleBase: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_filtered_projection" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        | FLOOR(epoch(l_shipdate))::BIGINT AS ship_sec
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q3_top_revenue" ->
      """SELECT l_orderkey,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        | FLOOR(epoch(o_orderdate))::BIGINT AS order_sec
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q4_region_revenue" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q5_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rank_in_cust FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_cust
        | FROM orders)
        |WHERE rank_in_cust <= 3 ORDER BY o_custkey, rank_in_cust""".stripMargin,

    "q6_exists_semijoin" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |ORDER BY o_orderkey""".stripMargin,

    "q7_not_exists_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,

    "q8_distinct_count" ->
      """SELECT l_returnflag, l_linestatus,
        | COUNT(DISTINCT l_partkey) AS n_parts, COUNT(DISTINCT l_suppkey) AS n_supps,
        | COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q9_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        | COALESCE(l_linestatus, 'ALL') AS linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        | COUNT(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q10_pivot" ->
      """SELECT o_orderstatus,
        | CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS p_urgent,
        | CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS p_high,
        | CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS p_medium,
        | CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS p_notspec,
        | CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS p_low
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q11_union_distinct" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        |ORDER BY c_custkey""".stripMargin,

    "q12_events_json" ->
      """SELECT json_extract_string(props, '$.k')::INT AS k_val, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY k_val ORDER BY k_val""".stripMargin,

    "q13_events_hourly" ->
      """SELECT FLOOR(epoch(date_trunc('hour', ts)))::BIGINT AS hour_sec, event_type,
        | COUNT(*) AS n_events, CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY hour_sec, event_type ORDER BY hour_sec, event_type""".stripMargin,

    "q14_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, FLOOR(epoch(ts))::BIGINT AS sec, event_id FROM events),
        |x AS (
        |  SELECT user_id, sec, event_id,
        |   CASE WHEN LAG(sec) OVER w IS NULL OR sec - LAG(sec) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
        |y AS (
        |  SELECT user_id, sec,
        |   SUM(is_new) OVER (PARTITION BY user_id ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM x)
        |SELECT user_id, session_idx::BIGINT AS session_idx, COUNT(*) AS n_events,
        | MIN(sec) AS start_sec, MAX(sec) AS end_sec
        |FROM y GROUP BY user_id, session_idx ORDER BY user_id, session_idx""".stripMargin,

    "q15_running_total" ->
      """SELECT event_id, user_id,
        | CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
        |FROM events ORDER BY event_id""".stripMargin,

    "q17_group_collect" ->
      """SELECT o_custkey,
        | array_to_string(list_sort(list(o_orderkey)), ',') AS big_orders,
        | COUNT(*) AS n_big
        |FROM orders WHERE o_totalprice > 400000
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q18_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, FLOOR(epoch(ts))::BIGINT AS sec, value FROM events),
        |d AS (SELECT user_id, sec AS dim_sec, MAX(value) AS rate FROM e
        |      WHERE event_id % 50 = 0 GROUP BY user_id, sec)
        |SELECT e.event_id, e.user_id, e.sec, d.rate
        |FROM e ASOF LEFT JOIN d ON e.user_id = d.user_id AND e.sec >= d.dim_sec
        |ORDER BY event_id""".stripMargin,

    "q27_asof_native" ->
      """WITH e AS (SELECT event_id, user_id, FLOOR(epoch(ts))::BIGINT AS sec, value FROM events),
        |d AS (SELECT user_id, sec AS dim_sec, MAX(value) AS rate FROM e
        |      WHERE event_id % 50 = 0 GROUP BY user_id, sec)
        |SELECT e.event_id, e.user_id, e.sec, d.rate
        |FROM e ASOF LEFT JOIN d ON e.user_id = d.user_id AND e.sec >= d.dim_sec
        |ORDER BY event_id""".stripMargin,

    "q42_asof_broadcast" ->
      """WITH e AS (SELECT event_id, user_id, FLOOR(epoch(ts))::BIGINT AS sec, value FROM events),
        |d AS (SELECT user_id, sec AS dim_sec, MAX(value) AS rate FROM e
        |      WHERE event_id % 50 = 0 GROUP BY user_id, sec)
        |SELECT e.event_id, e.user_id, e.sec, d.rate
        |FROM e ASOF LEFT JOIN d ON e.user_id = d.user_id AND e.sec >= d.dim_sec
        |ORDER BY event_id""".stripMargin,

    "q19_interval_join" ->
      """WITH e AS (SELECT event_id, FLOOR(epoch(ts))::BIGINT AS sec FROM events),
        |iv AS (SELECT event_id AS iv_id, sec AS iv_start, sec + 600 AS iv_end
        |       FROM e WHERE event_id % 100 = 0)
        |SELECT e.event_id, iv.iv_id FROM e JOIN iv
        | ON e.sec >= iv.iv_start AND e.sec <= iv.iv_end
        |ORDER BY event_id, iv_id""".stripMargin,

    "q43_interval_broadcast" ->
      """WITH e AS (SELECT event_id, FLOOR(epoch(ts))::BIGINT AS sec FROM events),
        |iv AS (SELECT event_id AS iv_id, sec AS iv_start, sec + 600 AS iv_end
        |       FROM e WHERE event_id % 100 = 0)
        |SELECT e.event_id, iv.iv_id FROM e JOIN iv
        | ON e.sec >= iv.iv_start AND e.sec <= iv.iv_end
        |ORDER BY event_id, iv_id""".stripMargin,

    "q20_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        | COALESCE(o_orderpriority, 'ALL') AS priority,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
        | COUNT(*) AS n_orders
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q21_except" ->
      """SELECT o_custkey FROM orders
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_custkey""".stripMargin,

    "q22_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice, global_avg FROM orders
        |CROSS JOIN (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |             / COUNT(*) AS global_avg FROM orders)
        |WHERE o_totalprice > global_avg ORDER BY o_orderkey""".stripMargin,

    "q23_event_gaps" ->
      """WITH e AS (SELECT user_id, event_id, FLOOR(epoch(ts))::BIGINT AS sec FROM events),
        |g AS (SELECT sec - LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS gap FROM e)
        |SELECT CASE WHEN gap < 60 THEN 'lt_1m' WHEN gap < 600 THEN 'lt_10m'
        |            WHEN gap < 3600 THEN 'lt_1h' ELSE 'ge_1h' END AS bucket,
        | COUNT(*) AS n_gaps
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q24_topk_agg" ->
      """SELECT o_custkey,
        | array_to_string(list_slice(list_sort(
        |   list((CAST(o_totalprice AS DECIMAL(12,2)) * 100)::BIGINT), 'desc'), 1, 3), ',') AS top_cents
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q71_forward_frame" ->
      """WITH e AS (SELECT event_id, user_id,
        |  FLOOR(EPOCH(ts))::BIGINT AS sec FROM events)
        |SELECT event_id, user_id, sec,
        | COUNT(*) OVER (PARTITION BY user_id ORDER BY sec
        |   RANGE BETWEEN 1 FOLLOWING AND 600 FOLLOWING) AS next_10m_events
        |FROM e ORDER BY event_id""".stripMargin,

    "q25_range_frame" ->
      """WITH e AS (SELECT event_id, user_id, FLOOR(epoch(ts))::BIGINT AS sec,
        |  CAST(value AS DECIMAL(12,2)) AS v FROM events)
        |SELECT event_id, user_id, sec,
        | CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY sec
        |   RANGE BETWEEN 300 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_5m
        |FROM e ORDER BY event_id""".stripMargin,

    "q26_session_window" ->
      """WITH e AS (SELECT user_id, FLOOR(epoch(ts))::BIGINT AS sec FROM events),
        |x AS (SELECT user_id, sec,
        |  CASE WHEN LAG(sec) OVER w IS NULL OR sec - LAG(sec) OVER w >= 1800 THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec)),
        |y AS (SELECT user_id, sec,
        |  SUM(is_new) OVER (PARTITION BY user_id ORDER BY sec ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x)
        |SELECT user_id, COUNT(*) AS n_events, MIN(sec) AS start_sec, MAX(sec) AS last_sec
        |FROM y GROUP BY user_id, sid ORDER BY user_id, start_sec""".stripMargin,

    "q16_above_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, cust_avg FROM orders
        |JOIN (SELECT o_custkey AS ck,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS cust_avg
        |      FROM orders GROUP BY o_custkey) ON o_custkey = ck
        |WHERE o_totalprice > cust_avg ORDER BY o_orderkey""".stripMargin,

    "q28_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        | COALESCE(o_orderpriority, 'ALL') AS priority,
        | GROUPING(o_orderstatus) AS g_status,
        | GROUPING(o_orderpriority) AS g_priority,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
        | COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,

    "q29_ntile" ->
      """SELECT o_custkey, CAST(drev AS DOUBLE) AS revenue,
        | ntile(4) OVER w AS quartile,
        | percent_rank() OVER w AS pr,
        | cume_dist() OVER w AS cd
        |FROM (SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS drev
        |      FROM orders GROUP BY o_custkey)
        |WINDOW w AS (ORDER BY drev, o_custkey)
        |ORDER BY o_custkey""".stripMargin,

    "q31_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
        |ORDER BY o_custkey""".stripMargin,

    "q34_unpivot" ->
      """WITH m AS (SELECT c_nationkey,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(8,2))) AS DOUBLE) AS total_bal,
        |  CAST(COUNT(*) AS DOUBLE) AS n_cust, MAX(c_acctbal) AS max_bal
        | FROM customer GROUP BY c_nationkey)
        |SELECT c_nationkey, 'total_bal' AS measure, total_bal AS value FROM m
        |UNION ALL SELECT c_nationkey, 'n_cust', n_cust FROM m
        |UNION ALL SELECT c_nationkey, 'max_bal', max_bal FROM m
        |ORDER BY c_nationkey, measure""".stripMargin,

    "q37_outliers" ->
      """WITH st AS (SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS sx,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(8,2))
        |           * CAST(o_totalprice AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS sxx
        | FROM orders GROUP BY o_orderpriority)
        |SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice
        |FROM orders o JOIN st USING (o_orderpriority)
        |WHERE o.o_totalprice >
        |  sx / n + 1.5 * sqrt((sxx - sx * sx / n) / (n - 1))
        |ORDER BY o.o_orderkey""".stripMargin,

    "q44_retention" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
        |SELECT FLOOR(epoch(CAST(a.day AS TIMESTAMP)))::BIGINT AS d0_sec,
        | count(DISTINCT a.user_id) AS cohort,
        | count(DISTINCT CASE WHEN date_diff('day', a.day, b.day) = 1
        |                     THEN a.user_id END) AS d1_retained,
        | count(DISTINCT CASE WHEN date_diff('day', a.day, b.day) = 7
        |                     THEN a.user_id END) AS d7_retained
        |FROM days a JOIN days b ON a.user_id = b.user_id
        |GROUP BY a.day ORDER BY d0_sec""".stripMargin,

    "q45_hierarchy" ->
      """WITH RECURSIVE nodes AS (SELECT c_custkey AS id,
        |  CASE WHEN c_custkey <= 1 THEN NULL ELSE c_custkey // 2 END AS parent
        | FROM customer),
        |walk AS (
        |  SELECT id, id AS cur, 0 AS depth FROM nodes
        |  UNION ALL
        |  SELECT w.id, n.parent AS cur, w.depth + 1
        |  FROM walk w JOIN nodes n ON w.cur = n.id
        |  WHERE n.parent IS NOT NULL)
        |SELECT id, arg_max(cur, depth) AS root_id, max(depth) AS depth
        |FROM walk GROUP BY id ORDER BY id""".stripMargin,

    "q58_rolling_active" ->
      """WITH p AS (SELECT DISTINCT user_id,
        |  FLOOR(FLOOR(EPOCH(ts)) / 86400)::BIGINT AS d FROM events),
        |days AS (SELECT DISTINCT d AS day_num FROM p),
        |x AS (SELECT DISTINCT user_id, d + g.i AS day_num
        |  FROM p CROSS JOIN generate_series(0, 6) g(i))
        |SELECT x.day_num, COUNT(*) AS active_users
        |FROM x JOIN days USING (day_num)
        |GROUP BY x.day_num ORDER BY day_num""".stripMargin,

    // unoriented twin: edges stored a<b, so triangle a<b<c is counted
    // once by the two-hop join; orientation is a Spark-side execution
    // strategy, the count is the same
    "q64_triangles" ->
      """WITH dp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pc AS (SELECT a.l_partkey AS a, b.l_partkey AS b, COUNT(*) AS n
        |  FROM dp a JOIN dp b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2),
        |e AS (SELECT a, b FROM pc WHERE n >= 2),
        |d AS (SELECT v, COUNT(*) AS deg FROM
        |  (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) GROUP BY v),
        |tri AS (SELECT COUNT(*) AS n_triangles FROM e e1
        |  JOIN e e2 ON e2.a = e1.b
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |g AS (SELECT COUNT(*) AS n_nodes,
        |  CAST(SUM(deg) AS BIGINT) // 2 AS n_edges,
        |  CAST(SUM((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges FROM d)
        |SELECT n_nodes, n_edges, n_wedges, n_triangles,
        | (n_triangles * 3)::DOUBLE / n_wedges AS global_cc
        |FROM g, tri""".stripMargin,

    "q63_mom_growth" ->
      """WITH m AS (SELECT (year(CAST(o_orderdate AS DATE)) * 100 +
        |    month(CAST(o_orderdate AS DATE)))::BIGINT AS ym,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS rev_cents
        | FROM orders GROUP BY ym)
        |SELECT ym, n_orders, rev_cents,
        | rev_cents::DOUBLE / (LAG(rev_cents) OVER (ORDER BY ym))::DOUBLE - 1.0
        |   AS mom_growth
        |FROM m ORDER BY ym""".stripMargin,

    "q62_transitions" ->
      """WITH e AS (SELECT user_id, event_id,
        |  CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec, event_type FROM events),
        |x AS (SELECT user_id, event_type,
        |  LEAD(event_type) OVER (PARTITION BY user_id ORDER BY sec, event_id)
        |    AS next_type FROM e),
        |cnt AS (SELECT event_type AS from_type, next_type AS to_type,
        |  COUNT(*) AS n FROM x WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
        | FROM cnt GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n,
        | c.n::DOUBLE / t.n_from::DOUBLE AS p
        |FROM cnt c JOIN tot t USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,

    "q61_interval_coverage" ->
      """WITH iv AS (SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS s0,
        |  CAST(FLOOR(EPOCH(ts)) AS BIGINT) + 300 AS e0, event_id FROM events),
        |x AS (SELECT user_id, s0, e0,
        |  MAX(e0) OVER (PARTITION BY user_id ORDER BY s0, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        | FROM iv)
        |SELECT user_id, COUNT(*) AS n_intervals,
        | CAST(SUM(GREATEST(0, e0 - GREATEST(s0, COALESCE(prev_end, s0)))) AS BIGINT)
        |   AS covered_sec
        |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q59_pattern_seq" ->
      """WITH e AS (SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec,
        |  event_id, substr(event_type, 1, 1) AS letter FROM events),
        |s AS (SELECT user_id,
        |  string_agg(letter, '' ORDER BY sec, event_id) AS seq
        | FROM e GROUP BY user_id)
        |SELECT user_id, length(seq)::BIGINT AS n_events,
        | len(regexp_extract_all(seq, 'vc'))::BIGINT AS n_view_click,
        | len(regexp_extract_all(seq, 'vcp'))::BIGINT AS n_full_path,
        | len(regexp_extract_all(seq, 'vcp')) > 0 AS converted
        |FROM s ORDER BY user_id""".stripMargin,

    "q60_decayed_sum" ->
      """WITH e AS (SELECT event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec,
        |  CAST(FLOOR(value * 100) AS BIGINT) AS cents FROM events),
        |h AS (SELECT MAX(sec) AS head_sec FROM e),
        |d AS (SELECT event_type, cents,
        |  LEAST((head_sec - sec) // 86400, 62) AS age_days
        | FROM e CROSS JOIN h)
        |SELECT event_type, COUNT(*) AS n_events,
        | CAST(SUM(cents // (1::BIGINT << age_days)) AS BIGINT) AS decayed_cents,
        | CAST(SUM(cents) AS BIGINT) AS raw_cents
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q57_cume_users" ->
      """WITH f AS (SELECT user_id,
        |  MIN(FLOOR(FLOOR(EPOCH(ts)) / 86400)::BIGINT) AS first_day
        | FROM events GROUP BY user_id),
        |p AS (SELECT first_day AS day_num, COUNT(*) AS n_new_users
        | FROM f GROUP BY first_day)
        |SELECT day_num, n_new_users,
        | CAST(SUM(n_new_users) OVER (ORDER BY day_num
        |   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cume_users
        |FROM p ORDER BY day_num""".stripMargin,

    "q56_ohlc" ->
      """WITH e AS (SELECT event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec,
        |  event_id, value FROM events)
        |SELECT event_type,
        | (FLOOR(sec / 3600)::BIGINT * 3600) AS hour_sec,
        | arg_min(value, sec * 10000000 + event_id) AS open,
        | MAX(value) AS high, MIN(value) AS low,
        | arg_max(value, sec * 10000000 + event_id) AS close,
        | COUNT(*) AS n_events
        |FROM e GROUP BY event_type, hour_sec
        |ORDER BY event_type, hour_sec""".stripMargin,

    "q55_pagerank" ->
      """WITH n AS (SELECT c_custkey AS id FROM customer),
        |e AS (SELECT id AS src, id // 2 AS dst FROM n WHERE id > 1),
        |s1 AS (SELECT e.dst,
        |  list_reduce(list_prepend(0.0, list(1.0::DOUBLE ORDER BY e.src)),
        |    (a, b) -> a + b) AS s
        | FROM e GROUP BY e.dst),
        |r1 AS (SELECT n.id,
        |  0.15::DOUBLE + 0.85::DOUBLE * COALESCE(s1.s, 0.0::DOUBLE) AS r
        | FROM n LEFT JOIN s1 ON s1.dst = n.id),
        |s2 AS (SELECT e.dst,
        |  list_reduce(list_prepend(0.0, list(r1.r ORDER BY e.src)),
        |    (a, b) -> a + b) AS s
        | FROM e JOIN r1 ON r1.id = e.src GROUP BY e.dst),
        |r2 AS (SELECT n.id,
        |  0.15::DOUBLE + 0.85::DOUBLE * COALESCE(s2.s, 0.0::DOUBLE) AS r
        | FROM n LEFT JOIN s2 ON s2.dst = n.id)
        |SELECT id AS c_custkey, r AS pagerank FROM r2 ORDER BY c_custkey""".stripMargin,

    "q53_skyline" ->
      """WITH agg AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents,
        |    COUNT(*) AS n_orders
        |  FROM orders GROUP BY o_custkey)
        |SELECT a.o_custkey, a.spend_cents, a.n_orders
        |FROM agg a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM agg b
        |  WHERE b.spend_cents >= a.spend_cents AND b.n_orders >= a.n_orders
        |    AND (b.spend_cents > a.spend_cents OR b.n_orders > a.n_orders))
        |ORDER BY a.o_custkey""".stripMargin,

    "q54_copurchase" ->
      """WITH dp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        |  FROM dp a JOIN dp b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
        |SELECT part_a, part_b, COUNT(*) AS n_orders
        |FROM pairs GROUP BY part_a, part_b
        |ORDER BY n_orders DESC, part_a, part_b LIMIT 20""".stripMargin,

    "q52_ewma" ->
      """WITH e AS (SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec,
        |  event_id, value FROM events)
        |SELECT user_id, COUNT(*) AS n_events,
        | list_reduce(list_prepend(0.0, list(value ORDER BY sec, event_id)),
        |   (acc, x) -> 0.5 * x + 0.5 * acc) AS ewma
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q51_mode" ->
      """WITH c AS (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |  ORDER BY cnt DESC, o_orderpriority) AS rn FROM c)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt AS n
        |FROM r WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,

    "q78_disjunctive" ->
      """SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100)
        |  AS BIGINT)) AS BIGINT) AS revenue_cents,
        | COUNT(*) AS n_items
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
        |       AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
        |       AND l_quantity BETWEEN 20 AND 40)""".stripMargin,

    "q77_bitemporal" ->
      """WITH ch AS (SELECT o_custkey AS k, o_orderkey AS valid_seq,
        |  o_orderkey + (o_custkey % 7) * 1000 AS tx_seq,
        |  CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
        | FROM orders),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY k
        |  ORDER BY valid_seq DESC, tx_seq DESC) AS rn
        | FROM ch WHERE tx_seq <= 30000 AND valid_seq <= 25000)
        |SELECT k, valid_seq, tx_seq, cents FROM r WHERE rn = 1 ORDER BY k""".stripMargin,

    "q72_min_cost_supplier" ->
      """WITH c AS (SELECT l_partkey, l_suppkey,
        |  MIN(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS cost_cents
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_partkey
        |  ORDER BY cost_cents, l_suppkey) AS rn FROM c)
        |SELECT r.l_partkey AS part_key, r.l_suppkey AS supp_key,
        |  s.s_name, n.n_name, r.cost_cents
        |FROM r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE rn = 1 ORDER BY part_key""".stripMargin,

    "q73_market_share" ->
      """WITH f AS (SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
        |  n.n_name, rg.r_name,
        |  CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT) AS cents
        | FROM lineitem l
        | JOIN orders o ON l.l_orderkey = o.o_orderkey
        | JOIN supplier s ON l.l_suppkey = s.s_suppkey
        | JOIN nation n ON s.s_nationkey = n.n_nationkey
        | JOIN region rg ON n.n_regionkey = rg.r_regionkey),
        |g AS (SELECT o_year, r_name,
        |  CAST(SUM(CASE WHEN n_name = 'NATION_7' THEN cents ELSE 0 END) AS BIGINT) AS num_cents,
        |  CAST(SUM(cents) AS BIGINT) AS den_cents
        | FROM f GROUP BY 1, 2)
        |SELECT o_year, r_name, num_cents, den_cents,
        |  num_cents * 1000000 // den_cents AS share_ppm
        |FROM g ORDER BY o_year, r_name""".stripMargin,

    "q74_promo_share" ->
      """WITH f AS (SELECT
        |  CAST(YEAR(l_shipdate) * 100 + MONTH(l_shipdate) AS BIGINT) AS ship_month,
        |  p.p_type,
        |  CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT) AS cents
        | FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |g AS (SELECT ship_month,
        |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS BIGINT) AS promo_cents,
        |  CAST(SUM(cents) AS BIGINT) AS total_cents
        | FROM f GROUP BY 1)
        |SELECT ship_month, promo_cents, total_cents,
        |  promo_cents * 1000000 // total_cents AS promo_ppm
        |FROM g ORDER BY ship_month""".stripMargin,

    "q76_rfm" ->
      """WITH base AS (SELECT o_custkey,
        |  MAX(CAST(FLOOR(EPOCH(o_orderdate) / 86400) AS BIGINT)) AS recency_day,
        |  COUNT(*) AS frequency,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
        | FROM orders GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS n_cust FROM base),
        |r AS (SELECT o_custkey, (ROW_NUMBER() OVER (ORDER BY recency_day, o_custkey) - 1)
        |  * 5 // n_cust + 1 AS r_score FROM base CROSS JOIN tot),
        |f AS (SELECT o_custkey, (ROW_NUMBER() OVER (ORDER BY frequency, o_custkey) - 1)
        |  * 5 // n_cust + 1 AS f_score FROM base CROSS JOIN tot),
        |m AS (SELECT o_custkey, (ROW_NUMBER() OVER (ORDER BY monetary_cents, o_custkey) - 1)
        |  * 5 // n_cust + 1 AS m_score FROM base CROSS JOIN tot)
        |SELECT b.o_custkey, b.recency_day, b.frequency, b.monetary_cents,
        |  r.r_score, f.f_score, m.m_score,
        |  r.r_score * 100 + f.f_score * 10 + m.m_score AS rfm_code
        |FROM base b JOIN r ON b.o_custkey = r.o_custkey
        |JOIN f ON b.o_custkey = f.o_custkey
        |JOIN m ON b.o_custkey = m.o_custkey
        |ORDER BY b.o_custkey""".stripMargin,

    "q75_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q79_cust_orders_dist" ->
      """WITH pc AS (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY 1)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM pc GROUP BY 1 ORDER BY 1""".stripMargin,

    "q80_parts_supplier_cnt" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
        |FROM ps JOIN part p ON ps.l_partkey = p.p_partkey
        |WHERE p.p_brand <> 'Brand#1'
        |  AND ps.l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q81_waiting_supplier" ->
      """WITH li AS (SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderstatus = 'F')
        |SELECT s.s_name, COUNT(*) AS numwait
        |FROM li l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        |WHERE EXISTS (SELECT 1 FROM li l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM li l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY 1 ORDER BY numwait DESC, s_name""".stripMargin,

    "q82_idle_customers" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |    CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS bal_cents FROM customer),
        |t AS (SELECT CAST(SUM(bal_cents) AS BIGINT) AS sum_cents,
        |    COUNT(*) AS n_pos FROM c WHERE bal_cents > 0)
        |SELECT c_mktsegment, COUNT(*) AS numcust,
        |  CAST(SUM(bal_cents) AS BIGINT) AS totbal_cents
        |FROM c CROSS JOIN t
        |WHERE bal_cents * n_pos > sum_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q83_local_volume" ->
      """SELECT n_name,
        | CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        | COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q84_returned_revenue" ->
      """SELECT c_custkey, c_name, n_name,
        | CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS returned_cents,
        | COUNT(*) AS n_returns
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R' AND o_orderdate >= TIMESTAMP '2000-01-01'
        |GROUP BY 1, 2, 3 ORDER BY c_custkey""".stripMargin,

    "q85_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '2000-01-01'
        |    AND l_shipdate < TIMESTAMP '2000-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_cents
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_cents = (SELECT MAX(total_cents) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q86_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |         CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#11'),
        |a AS (SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS sum_qty,
        |             COUNT(*) AS n_li FROM li GROUP BY 1)
        |SELECT CAST(SUM(cents) AS BIGINT) AS small_qty_cents,
        |       COUNT(*) AS n_small
        |FROM li JOIN a USING (l_partkey)
        |WHERE qty * 5 * n_li < sum_qty""".stripMargin,

    "q87_large_orders" ->
      """WITH q AS (
        |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS BIGINT)) > 150)
        |SELECT c_custkey, c_name, o_orderkey,
        |  CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT) AS order_day,
        |  CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_cents,
        |  total_qty
        |FROM q JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q88_nation_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        | CAST(YEAR(l_shipdate) AS BIGINT) AS ship_year,
        | CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS volume_cents,
        | COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        |    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q50_median_scale" ->
"""WITH c AS (SELECT l_returnflag, l_linestatus, count(*) AS n
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT l_returnflag, l_linestatus, l_extendedprice AS v,
        |  ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
        |    ORDER BY l_extendedprice) AS rn
        | FROM lineitem),
        |j AS (SELECT r.*, c.n FROM r JOIN c USING (l_returnflag, l_linestatus)),
        |a AS (SELECT l_returnflag, l_linestatus, n,
        |  max(CASE WHEN rn = FLOOR(1.0::DOUBLE + 0.5::DOUBLE * (n - 1))::BIGINT THEN v END) AS lo50,
        |  max(CASE WHEN rn = CEIL(1.0::DOUBLE + 0.5::DOUBLE * (n - 1))::BIGINT THEN v END) AS hi50,
        |  max(CASE WHEN rn = FLOOR(1.0::DOUBLE + 0.9::DOUBLE * (n - 1))::BIGINT THEN v END) AS lo90,
        |  max(CASE WHEN rn = CEIL(1.0::DOUBLE + 0.9::DOUBLE * (n - 1))::BIGINT THEN v END) AS hi90
        | FROM j GROUP BY 1, 2, 3)
        |SELECT l_returnflag, l_linestatus, n,
        | lo50 + (hi50 - lo50) * (1.0::DOUBLE + 0.5::DOUBLE * (n - 1) - FLOOR(1.0::DOUBLE + 0.5::DOUBLE * (n - 1))) AS med_price,
        | lo90 + (hi90 - lo90) * (1.0::DOUBLE + 0.9::DOUBLE * (n - 1) - FLOOR(1.0::DOUBLE + 0.9::DOUBLE * (n - 1))) AS p90_price
        |FROM a ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q49_sliding_window" ->
      """SELECT (FLOOR(epoch(ts))::BIGINT // 900) * 900 - 900 * j AS start_sec,
        | event_type, count(*) AS n, min(value) AS min_v, max(value) AS max_v
        |FROM events, unnest([0, 1, 2, 3]) AS t(j)
        |GROUP BY start_sec, event_type
        |ORDER BY start_sec, event_type""".stripMargin,

    "q48_json_flatten" ->
      """SELECT o_orderkey AS id, i::INT AS pos,
        | o_orderkey * 10 + i AS p, (o_orderkey + i) % 7 AS q
        |FROM (SELECT o_orderkey,
        |  unnest(generate_series(0, (o_orderkey % 3)::INT)) AS i FROM orders)
        |ORDER BY id, pos""".stripMargin,

    "q47_median" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        | quantile_cont(l_quantity, 0.5) AS med_qty,
        | quantile_cont(l_extendedprice, 0.5) AS med_price,
        | quantile_cont(l_extendedprice, 0.9) AS p90_price
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q46_asof_nearest" ->
      """WITH l AS (SELECT event_id, user_id, FLOOR(epoch(ts))::BIGINT AS sec
        |  FROM events WHERE event_type = 'click'),
        |r AS (SELECT user_id, FLOOR(epoch(ts))::BIGINT AS psec,
        |  max(value) AS amount
        | FROM events WHERE event_type = 'purchase' GROUP BY user_id, psec),
        |best AS (SELECT l.event_id, r.psec, r.amount,
        |  ROW_NUMBER() OVER (PARTITION BY l.event_id
        |    ORDER BY abs(r.psec - l.sec), r.psec) AS rn
        | FROM l JOIN r USING (user_id))
        |SELECT l.user_id, l.event_id, l.sec, b.psec AS matched_psec, b.amount
        |FROM l LEFT JOIN (SELECT event_id, psec, amount FROM best WHERE rn = 1) b
        |  USING (event_id)
        |ORDER BY event_id""".stripMargin,

    "q41_ship_latency" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
        | CAST(min(date_diff('day', CAST(o_orderdate AS DATE),
        |                    CAST(l_shipdate AS DATE))) AS BIGINT) AS min_days,
        | CAST(max(date_diff('day', CAST(o_orderdate AS DATE),
        |                    CAST(l_shipdate AS DATE))) AS BIGINT) AS max_days,
        | CAST(sum(date_diff('day', CAST(o_orderdate AS DATE),
        |                    CAST(l_shipdate AS DATE))) AS DOUBLE) / COUNT(*) AS avg_days
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q40_rank_nav" ->
      """SELECT o_orderkey, o_orderpriority,
        | rank() OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate) AS rnk,
        | dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate) AS drnk,
        | lead(o_orderkey, 1) OVER (PARTITION BY o_orderpriority
        |   ORDER BY o_orderdate, o_orderkey) AS next_key,
        | first_value(o_orderkey) OVER (PARTITION BY o_orderpriority
        |   ORDER BY o_orderdate, o_orderkey) AS first_key
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q38_corr_stats" ->
      """WITH st AS (SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS sx,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS sy,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))
        |           * CAST(l_quantity AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS sxx,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(8,2))
        |           * CAST(l_extendedprice AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS syy,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))
        |           * CAST(l_extendedprice AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS sxy
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (sxy - sx * sy / n) /
        |    (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) AS corr_qty_price,
        |  sqrt((sxx - sx * sx / n) / (n - 1.0)) AS stddev_qty
        |FROM st ORDER BY l_returnflag""".stripMargin,

    "q39_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |  FLOOR(epoch(ts))::BIGINT AS sec FROM events),
        |pu AS (SELECT user_id,
        |  min(CASE WHEN event_type = 'signup' THEN sec END) AS t1,
        |  min(CASE WHEN event_type = 'view' THEN sec END) AS t2,
        |  min(CASE WHEN event_type = 'click' THEN sec END) AS t3,
        |  min(CASE WHEN event_type = 'purchase' THEN sec END) AS t4
        | FROM e GROUP BY user_id)
        |SELECT
        |  CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN t1 IS NOT NULL AND t2 > t1 THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
        |  CAST(sum(CASE WHEN t1 IS NOT NULL AND t2 > t1 AND t3 > t2 THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked,
        |  CAST(sum(CASE WHEN t1 IS NOT NULL AND t2 > t1 AND t3 > t2 AND t4 > t3 THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased
        |FROM pu""".stripMargin,

    "q36_zorder" -> {
      // bit-interleave replayed literally: bit b of bucket d lands at
      // position b*2+d (dims ordered t, u — same as the Spark fold)
      val interleave = (0 until 8).flatMap { b =>
        Seq(s"(((bt >> $b) & 1) << ${b * 2})",
          s"(((bu >> $b) & 1) << ${b * 2 + 1})")
      }.mkString(" + ")
      s"""WITH e AS (SELECT event_id, FLOOR(epoch(ts))::BIGINT AS t,
         |  user_id AS u FROM events),
         |bounds AS (SELECT MIN(t) AS mnt, MAX(t) AS mxt,
         |  MIN(u) AS mnu, MAX(u) AS mxu FROM e),
         |z AS (SELECT event_id,
         |  ((t - mnt) * 256) // (mxt - mnt + 1) AS bt,
         |  ((u - mnu) * 256) // (mxu - mnu + 1) AS bu
         |  FROM e CROSS JOIN bounds)
         |SELECT event_id, CAST($interleave AS BIGINT) AS zval
         |FROM z ORDER BY event_id""".stripMargin
    },

    "q35_gapfill" ->
      """WITH e AS (SELECT event_type,
        |  FLOOR(epoch(date_trunc('hour', ts)))::BIGINT AS h FROM events),
        |c AS (SELECT event_type, h, COUNT(*) AS n_events FROM e
        |      GROUP BY event_type, h),
        |b AS (SELECT MIN(h) AS mn, MAX(h) AS mx FROM e),
        |grid AS (SELECT t.event_type, u.h
        |         FROM (SELECT DISTINCT event_type FROM e) t
        |         CROSS JOIN b
        |         CROSS JOIN unnest(generate_series(b.mn, b.mx, 3600)) AS u(h))
        |SELECT grid.event_type, grid.h AS hour_sec,
        | COALESCE(c.n_events, 0) AS n_events
        |FROM grid LEFT JOIN c ON grid.event_type = c.event_type AND grid.h = c.h
        |ORDER BY grid.event_type, hour_sec""".stripMargin,

    "q33_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
        | COUNT(*) AS n, MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(8,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q32_full_outer" ->
      """SELECT COALESCE(ck, c_custkey) AS custkey, n_orders, c_name
        |FROM (SELECT o_custkey AS ck, COUNT(*) AS n_orders
        |      FROM orders GROUP BY o_custkey) co
        |FULL OUTER JOIN (SELECT c_custkey, c_name FROM customer
        |                 WHERE c_acctbal < 0) de
        |  ON ck = c_custkey
        |ORDER BY custkey""".stripMargin,

    "q30_global_rank" ->
      """WITH rev AS (SELECT o_custkey,
        |  SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS drev
        | FROM orders GROUP BY o_custkey),
        |r AS (SELECT o_custkey, drev,
        |  ROW_NUMBER() OVER (ORDER BY drev, o_custkey) AS rank,
        |  COUNT(*) OVER () AS n_total FROM rev)
        |SELECT o_custkey, CAST(drev AS DOUBLE) AS revenue, rank,
        | (((rank - 1) * 4) // n_total + 1)::INT AS bucket4,
        | CAST(rank - 1 AS DOUBLE) / (n_total - 1) AS pr
        |FROM r ORDER BY o_custkey""".stripMargin,

    "q70_recursive_cte" ->
      """WITH RECURSIVE chain(ck, root, depth, bal) AS (
        |  SELECT c_custkey, c_custkey, 0,
        |         CAST(FLOOR(c_acctbal * 100) AS BIGINT)
        |  FROM customer WHERE c_custkey % 97 = 0
        |  UNION ALL
        |  SELECT c.c_custkey, ch.root, ch.depth + 1,
        |         CAST(FLOOR(c.c_acctbal * 100) AS BIGINT)
        |  FROM chain ch JOIN customer c ON c.c_custkey = ch.ck // 2
        |  WHERE ch.ck > 1 AND ch.depth < 25
        |)
        |SELECT root, COUNT(*) AS chain_len, MAX(depth) AS max_depth,
        |       CAST(SUM(bal) AS BIGINT) AS chain_bal_cents
        |FROM chain GROUP BY root ORDER BY root""".stripMargin,

    "q69_variant" ->
      """WITH e AS (SELECT event_type,
        |  json_extract(props, '$.k')::BIGINT AS k FROM events)
        |SELECT event_type, COUNT(k) AS n_k, SUM(k)::BIGINT AS sum_k,
        | MIN(k) AS min_k, MAX(k) AS max_k
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q68_peak_concurrency" ->
      """WITH e AS (SELECT event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec,
        |  event_id FROM events),
        |pts AS (SELECT event_type, sec AS t, 1::BIGINT AS delta, event_id FROM e
        |  UNION ALL
        |  SELECT event_type, sec + 300, -1::BIGINT, event_id FROM e),
        |run AS (SELECT event_type, delta,
        |  SUM(delta) OVER (PARTITION BY event_type
        |    ORDER BY t, delta, event_id
        |    ROWS UNBOUNDED PRECEDING) AS concurrent FROM pts)
        |SELECT event_type,
        | SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END)::BIGINT AS n_intervals,
        | MAX(concurrent)::BIGINT AS max_concurrent
        |FROM run GROUP BY event_type ORDER BY event_type""".stripMargin,

    "dq_double_charge" ->
      """WITH o AS (SELECT o_custkey,
        |  FLOOR(FLOOR(EPOCH(o_orderdate)) / 86400)::BIGINT AS day_num,
        |  CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
        | FROM orders)
        |SELECT o_custkey, day_num, COUNT(*) AS n_orders,
        | MIN(o_orderkey) AS first_ok, MAX(o_orderkey) AS last_ok,
        | (MAX(cents) - MIN(cents))::BIGINT AS cents_spread
        |FROM o GROUP BY 1, 2 HAVING COUNT(*) > 1
        |ORDER BY o_custkey, day_num""".stripMargin,

    "q67_bfs_reach" ->
      """WITH dp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pc AS (SELECT a.l_partkey AS a, b.l_partkey AS b, COUNT(*) AS n
        |  FROM dp a JOIN dp b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2),
        |e AS (SELECT a, b FROM pc WHERE n >= 2),
        |adj AS (SELECT a AS src, b AS dst FROM e
        |        UNION ALL SELECT b AS src, a AS dst FROM e),
        |h0 AS (SELECT DISTINCT src AS v FROM adj WHERE src % 50 = 0),
        |h1 AS (SELECT DISTINCT adj.dst AS v FROM adj JOIN h0 ON adj.src = h0.v
        |       EXCEPT SELECT v FROM h0),
        |h2 AS (SELECT DISTINCT adj.dst AS v FROM adj JOIN h1 ON adj.src = h1.v
        |       EXCEPT (SELECT v FROM h0 UNION ALL SELECT v FROM h1)),
        |h3 AS (SELECT DISTINCT adj.dst AS v FROM adj JOIN h2 ON adj.src = h2.v
        |       EXCEPT (SELECT v FROM h0 UNION ALL SELECT v FROM h1
        |               UNION ALL SELECT v FROM h2))
        |SELECT v, 0::BIGINT AS hop FROM h0
        |UNION ALL SELECT v, 1::BIGINT FROM h1
        |UNION ALL SELECT v, 2::BIGINT FROM h2
        |UNION ALL SELECT v, 3::BIGINT FROM h3
        |ORDER BY v""".stripMargin,

    "q65_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |    FLOOR(FLOOR(EPOCH(ts)) / 86400)::BIGINT AS day_num FROM events),
        |isl AS (SELECT user_id, day_num,
        |  day_num - ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY day_num) AS grp FROM days),
        |streaks AS (SELECT user_id, grp, COUNT(*) AS len,
        |  MIN(day_num) AS start_day FROM isl GROUP BY user_id, grp)
        |SELECT user_id, COUNT(*) AS n_streaks,
        | SUM(len)::BIGINT AS n_active_days, MAX(len) AS max_streak,
        | arg_min(start_day, start_day - len * 100000000) AS best_start
        |FROM streaks GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q66_weighted_median" ->
      """WITH li AS (SELECT l_returnflag AS flag,
        |  CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS price_cents,
        |  CAST(FLOOR(l_quantity) AS BIGINT) AS w FROM lineitem),
        |v AS (SELECT flag, price_cents, SUM(w)::BIGINT AS wsum
        |  FROM li GROUP BY flag, price_cents),
        |p AS (SELECT flag, price_cents, wsum,
        |  COALESCE(SUM(wsum) OVER (PARTITION BY flag ORDER BY price_cents
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
        |  SUM(wsum) OVER (PARTITION BY flag) AS wtot FROM v)
        |SELECT flag, MIN(wtot)::BIGINT AS w_total,
        | MIN(CASE WHEN cum_before + wsum >= (wtot + 1) // 2
        |   THEN price_cents END) AS wmedian_cents,
        | MIN(CASE WHEN cum_before + wsum >= (9 * wtot + 9) // 10
        |   THEN price_cents END) AS wp90_cents
        |FROM p GROUP BY flag ORDER BY flag""".stripMargin,

    "q89_forecast_revenue" ->
      """SELECT
        | CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        | COUNT(*) AS n_items
        |FROM lineitem
        |WHERE YEAR(l_shipdate) = 1996
        |  AND l_discount >= CAST(0.05 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE)
        |  AND l_quantity < 24""".stripMargin,

    "q90_product_profit" ->
      """SELECT n_name AS nation,
        | CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
        | CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
        |        - CAST(FLOOR(p_retailprice * l_quantity * 50) AS BIGINT)) AS BIGINT) AS profit_cents,
        | COUNT(*) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q91_priority_lines" ->
      """SELECT l_returnflag AS ship_class,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_lines,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE YEAR(l_shipdate) = 1997 AND l_quantity >= 25
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q92_excess_suppliers" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS qc
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE YEAR(l_shipdate) = 1997 AND p_name LIKE 'large%'
        |  GROUP BY 1, 2),
        |pt AS (SELECT l_partkey, SUM(qc) AS tc FROM ps GROUP BY 1),
        |ex AS (SELECT DISTINCT l_suppkey FROM ps JOIN pt USING (l_partkey)
        |       WHERE qc * 5 > tc)
        |SELECT s_suppkey, s_name, s_acctbal
        |FROM supplier WHERE s_suppkey IN (SELECT l_suppkey FROM ex)
        |ORDER BY s_suppkey""".stripMargin
    )

  /** The *_sql_surface twins assert SQL-text authorship produces the
    * IDENTICAL values as the Scala operator API — same oracle, verbatim.
    */
  val oracle: Map[String, String] = oracleBase +
    ("asof_sql_surface" -> oracleBase("q18_asof_join")) +
    ("interval_sql_surface" -> oracleBase("q19_interval_join"))
}

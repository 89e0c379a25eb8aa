package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling/probe main — reshaped per investigation; not part
  * of the library surface.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.maxFields", "300")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"
    import org.apache.spark.sql.functions._
    val orders = Tables.orders(spark, dir)
    orders.count() // warm

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${ts.min}%.3f s")
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // connected components alone (pairs pre-built)
    locally {
      val docs0 = Tables.documents(spark, dir)
      val pairs = graft.operators.Dedup.jaccardPairsBlocked(docs0, "doc_id", "text",
        blockCol = "source", n = 3, minJaccard = 0.3).localCheckpoint(true)
      time("cc labels only") {
        noop(graft.operators.ConnectedComponents.labels(pairs))
        spark.sharedState.cacheManager.clearCache()
      }
    }

    // decomposition of dd_minhash_lsh
    val docs = Tables.documents(spark, dir)
    docs.count()
    time("minhash: shingleRows") {
      noop(graft.operators.Dedup.shingleRows(docs, "doc_id", "text", 3))
    }
    time("minhash: posts ckpt") {
      graft.operators.Dedup.shingleRows(docs, "doc_id", "text", 3)
        .localCheckpoint(true)
    }
    time("minhash: full") {
      noop(graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text", tau = 0.8))
      spark.sharedState.cacheManager.clearCache()
    }
    locally {
      val posts = graft.operators.Dedup.shingleRows(docs, "doc_id", "text", 3)
        .localCheckpoint(true)
      val m54 = lit((1L << 54) - 1)
      val k = 128
      def sigDf = posts.select(col("id"),
        graft.expressions.MinHashExpressions.twoHashFamily(
          xxhash64(col("s")).bitwiseAND(m54),
          xxhash64(lit(1), col("s")).bitwiseAND(m54).bitwiseOR(lit(1L)), k).as("hs"))
        .groupBy(col("id"))
        .agg(graft.expressions.MinHashExpressions.arrayMinAgg(col("hs"), k).as("sig"),
          count(lit(1)).as("sz"))
      time("minhash: sig from posts") { noop(sigDf) }
      val sig = sigDf.localCheckpoint(true)
      val bands = 32; val r = k / bands
      def bandRows = sig.select(col("id"),
        posexplode(array((0 until bands).map { j =>
          xxhash64(slice(col("sig"), j * r + 1, r))
        }: _*)).as(Seq("band", "bh")))
      time("minhash: cand join") {
        val candA = bandRows.select(col("band").as("a_band"), col("bh").as("a_bh"), col("id").as("a_id"))
        val candB = bandRows.select(col("band").as("b_band"), col("bh").as("b_bh"), col("id").as("b_id"))
        noop(candA.join(candB,
          col("a_band") === col("b_band") && col("a_bh") === col("b_bh") &&
            col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id")).distinct())
      }
    }

    // decomposition of q1_pricing_summary
    val li = Tables.lineitem(spark, dir)
    li.count()
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
    time("q1 scan+filter+count") {
      noop(li.where(col("l_shipdate") <= to_timestamp(lit("2000-12-01")))
        .groupBy(col("l_returnflag"), col("l_linestatus")).agg(count(lit(1))))
    }
    time("q1 + double sums") {
      noop(li.where(col("l_shipdate") <= to_timestamp(lit("2000-12-01")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
          count(lit(1))))
    }
    time("q1 + 2 decimal sums") {
      noop(li.where(col("l_shipdate") <= to_timestamp(lit("2000-12-01")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec(col("l_quantity"))), sum(dec(col("l_extendedprice"))),
          count(lit(1))))
    }
    time("q1 full decimal") {
      val revItem = dec(col("l_extendedprice")) * (lit(1) - col("l_discount").cast("decimal(4,2)"))
      noop(li.where(col("l_shipdate") <= to_timestamp(lit("2000-12-01")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec(col("l_quantity"))), sum(dec(col("l_extendedprice"))),
          sum(revItem),
          sum(revItem.cast("decimal(12,4)") * (lit(1) + col("l_tax").cast("decimal(3,2)"))),
          count(lit(1))))
    }

    time("q1 dec8 fast-path sums") {
      val revItem = col("l_extendedprice").cast("decimal(8,2)") * (lit(1) - col("l_discount").cast("decimal(4,2)"))
      noop(li.where(col("l_shipdate") <= to_timestamp(lit("2000-12-01")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("decimal(8,2)")),
          sum(col("l_extendedprice").cast("decimal(8,2)")),
          sum(revItem),
          sum(revItem.cast("decimal(12,4)") * (lit(1) + col("l_tax").cast("decimal(3,2)"))),
          count(lit(1))))
    }

    // decomposition of etl_danish_date
    val dText = {
      val monthNames = Seq("januar", "februar", "marts", "april", "maj",
        "juni", "juli", "august", "september", "oktober", "november", "december")
      val mon = element_at(array(monthNames.map(lit): _*), month(col("o_orderdate")))
      when(col("o_orderkey") % 7 === 0, "ingen dato")
        .otherwise(concat(lit("Godkendt den "),
          dayofmonth(col("o_orderdate")).cast("string"), lit(". "),
          mon, lit(" "), year(col("o_orderdate")).cast("string")))
    }
    time("construct only") { noop(orders.select(col("o_orderkey"), dText.as("t"))) }
    time("construct+1 extract") {
      noop(orders.select(col("o_orderkey"),
        regexp_extract(dText, "(\\d{1,2})\\.?\\s+([A-Za-zæøåÆØÅ]+)\\s+(\\d{4})", 1).as("d")))
    }
    time("full parse, no sort") {
      noop(orders.select(col("o_orderkey"),
        graft.functions.Text.parseDanishDate(dText).as("approval_date")))
    }
    time("full parse + orderBy") {
      noop(orders.select(col("o_orderkey"),
        graft.functions.Text.parseDanishDate(dText).as("approval_date"))
        .orderBy("o_orderkey"))
    }
    val sortFirst = orders.select(col("o_orderkey"), col("o_orderdate"))
      .orderBy("o_orderkey")
      .select(col("o_orderkey"),
        graft.functions.Text.parseDanishDate(dText).as("approval_date"))
    time("sort first, parse after") { noop(sortFirst) }
    sortFirst.explain("formatted")
    spark.stop()
  }
}

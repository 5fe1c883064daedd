package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.{Clustering, Corpus, Graph, Intervals, Quantiles, Skyline, Stats, TopK}

/** Round-3 additions: shuffle-bounded top-k, exact grouped model fits,
  * sketch gates, interval islands, retention cohorts. Same exactness
  * discipline as [[Queries]] — every computed numeric crossing the
  * oracle boundary is integer/decimal-exact.
  */
object QueriesMining {

  import Queries.{table, events}

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- bounded-buffer top-k per group: partial top-k on the map
    //      side, shuffle carries ≤ k rows per group per partition ----
    "q121_bounded_topk" -> ((s, dir) => {
      val o = table(s, dir, "orders").select(col("o_orderstatus"),
        (col("o_totalprice").cast(DecimalType(14, 2)) * 100).cast("long")
          .as("price_cents"),
        col("o_orderkey"))
      TopK.topKPerGroup(s, o, "o_orderstatus", "price_cents", "o_orderkey",
        k = 5)
    }),

    // ---- grouped least-squares fit (extendedprice vs quantity),
    //      moment sums in DECIMAL(38,0), ppm outputs ----
    "q122_linear_fit" -> ((s, dir) =>
      Stats.linearFit(
        table(s, dir, "lineitem").select(col("l_returnflag"),
          col("l_quantity").cast("long").as("x"),
          (col("l_extendedprice").cast(DecimalType(14, 2)) * 100)
            .cast("long").as("y")),
        "l_returnflag", "x", "y")),

    // ---- approx percentile beside the exact one, error asserted
    //      in-query (hard gate like q45's HLL bound) ----
    "q123_approx_percentile" -> ((s, dir) => {
      val exact = Quantiles.percentilesDisc(table(s, dir, "lineitem"),
        "l_returnflag", "l_quantity", Seq(("p50_exact", 1, 2)))
      val approx = table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_quantity"), lit(0.5), lit(10000))
          .as("__p50_approx"))
      // rank error ≤ n/accuracy ≪ per-value multiplicity here, so the
      // approximate median must land within one quantity unit
      exact.join(approx, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("p50_exact"),
          (abs(col("__p50_approx") - col("p50_exact")) <= 1.0)
            .as("approx_within_bound"))
    }),

    // ---- gaps-and-islands: merge per-customer 7-day order spans ----
    "q124_interval_islands" -> ((s, dir) => {
      val iv = table(s, dir, "orders").select(
        col("o_custkey"),
        to_date(col("o_orderdate")).as("s"),
        date_add(to_date(col("o_orderdate")), 7).as("e"))
      Intervals.mergeIntervals(iv, "o_custkey", "s", "e")
        .select(col("o_custkey"), col("island"),
          date_format(col("island_start"), "yyyy-MM-dd").as("island_start"),
          date_format(col("island_end"), "yyyy-MM-dd").as("island_end"),
          col("n_rows").as("n_orders"))
    }),

    // ---- weekly retention cohorts over the event stream ----
    "q125_retention_cohorts" -> ((s, dir) => {
      val e = events(s, dir)
      val cohort = e.groupBy(col("user_id"))
        .agg(min(col("ts")).as("__fts"))
        .select(col("user_id"),
          to_date(date_trunc("week", col("__fts"))).as("__cw"))
      val activity = e.select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("__aw")).distinct()
      activity.join(cohort, Seq("user_id"))
        .select(col("__cw"), col("user_id"),
          expr("datediff(__aw, __cw) div 7").cast("long").as("week_no"))
        .groupBy(col("__cw"), col("week_no"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(date_format(col("__cw"), "yyyy-MM-dd").as("cohort_week"),
          col("week_no"), col("n_users"))
    }),

    // ---- exact integer 3-sigma outliers (no floating point) ----
    "q126_sigma_outliers" -> ((s, dir) =>
      Stats.sigmaOutliers(
        events(s, dir).select(col("event_type"), col("event_id"),
          (col("value").cast(DecimalType(14, 2)) * 100).cast("long")
            .as("value_cents")),
        "event_type", "value_cents", "event_id", k = 3)),

    // ---- fixed-point PageRank on the part→supplier supply graph ----
    "q127_pagerank" -> ((s, dir) => {
      val edges = table(s, dir, "lineitem")
        .select((col("l_partkey") + 100000L).as("src"),
          col("l_suppkey").as("dst")).distinct()
      Graph.pageRank(edges, iters = 2)
    }),

    // ---- C4-style repeated-span removal (4-token blocks, ≥2 occ) ----
    "q128_span_dedup" -> ((s, dir) =>
      Corpus.dedupBlocks(table(s, dir, "documents"), "doc_id", "text",
        block = 4, maxOccurrences = 2L)),

    // ---- 3-day weighted moving average of daily order revenue ----
    "q129_weighted_ma" -> ((s, dir) => {
      val daily = table(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum((col("o_totalprice").cast(DecimalType(14, 2)) * 100)
          .cast("long")).as("total_cents"))
      daily
        .withColumn("wma3_cents", expr(
          """(3 * total_cents + 2 * coalesce(lag(total_cents, 1) over (order by d), 0)
              + coalesce(lag(total_cents, 2) over (order by d), 0)) div 6"""))
        .select(date_format(col("d"), "yyyy-MM-dd").as("d"),
          col("total_cents"), col("wma3_cents"))
    }),

    // ---- hashing-trick sparse features (256 md5 buckets) ----
    "q130_hash_features" -> ((s, dir) => {
      val toks = table(s, dir, "documents").select(col("doc_id"),
        explode(expr(
          "filter(split(trim(lower(text)), '\\\\s+'), x -> x != '')")).as("w"))
      toks
        .withColumn("__h", md5(col("w")))
        .withColumn("bucket", (
          (expr("instr('0123456789abcdef', substring(__h, 1, 1))") - 1) * 16 +
            expr("instr('0123456789abcdef', substring(__h, 2, 1))") - 1)
          .cast("long"))
        .groupBy(col("doc_id"), col("bucket"))
        .agg(count(lit(1)).as("n"))
    }),

    // ---- 2-D skyline: max p_size, min retail price ----
    "q131_skyline" -> ((s, dir) =>
      Skyline.pareto2d(
        table(s, dir, "part").select(col("p_partkey"),
          col("p_size").cast("long").as("p_size"),
          (col("p_retailprice").cast(DecimalType(14, 2)) * 100).cast("long")
            .as("price_cents")),
        // bucketSize 8 over p_size 1..50 → the bucketed sweep's seam
        // stitching is exercised under the hash gate, not just in specs
        "p_size", "price_cents", bucketSize = 8L)),

    // ---- exact mode per group (deterministic tie-break) ----
    "q132_mode" -> ((s, dir) =>
      Stats.modePerGroup(table(s, dir, "orders"),
        "o_orderstatus", "o_orderpriority")),

    // ---- naive-Bayes class-conditional token likelihood table ----
    "q133_class_likelihood" -> ((s, dir) =>
      graft.operators.TextStats.classTokenLikelihood(
        table(s, dir, "documents"), "lang", "text", minCount = 50L)),

    // ---- hierarchical percent-of-parent rollup (nation in region) ----
    "q134_parent_share" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val c = table(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val n = table(s, dir, "nation")
      val r = table(s, dir, "region")
      val g = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum((col("o_totalprice").cast(DecimalType(14, 2)) * 100)
          .cast("long")).as("rev_cents"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("r_name"))
      g.withColumn("region_cents", sum(col("rev_cents")).over(w))
        .withColumn("share_ppm", expr("rev_cents * 1000000 div region_cents"))
    }),

    // ---- declarative DQ constraint report (one scan, one agg) ----
    "q135_dq_report" -> ((s, dir) => {
      import graft.operators.DataQuality._
      report(table(s, dir, "orders"), Seq(
        NotNull("o_custkey"),
        Unique("o_orderkey"),
        Bounds("o_totalprice", 0.0, 400000.0),
        RefIntegrity("o_custkey", table(s, dir, "customer"), "c_custkey")))
    }),

    // ---- distributed sequence-gap finder (no global sort); holes
    //      punched deterministically since testdata keys are dense ----
    "q136_sequence_gaps" -> ((s, dir) =>
      Intervals.sequenceGaps(
        table(s, dir, "orders").filter(col("o_orderkey") % 7 =!= 0),
        "o_orderkey", bucketSize = 4096L)),

    // ---- incremental near-dup: new batch probes a MATERIALIZED
    //      signature index; corpus work ∝ collisions, not size ----
    "q137_incremental_dedup" -> ((s, dir) => {
      import graft.operators.Dedup
      val docs = table(s, dir, "documents")
      val work = graft.Scratch.dir("graft_inc")
      Dedup.minhashBands(docs.filter(col("doc_id") < 400), "doc_id", "text",
          shingleN = 2, bands = 4)
        .withColumnRenamed("doc_id", "id")
        .write.mode("overwrite").parquet(s"$work/idx")
      Dedup.shingleTerms(docs.filter(col("doc_id") < 400), "doc_id", "text", 2)
        .write.mode("overwrite").parquet(s"$work/terms")
      Dedup.incrementalNearDupes(docs.filter(col("doc_id") >= 400),
        "doc_id", "text",
        s.read.parquet(s"$work/idx"), s.read.parquet(s"$work/terms"),
        shingleN = 2, bands = 4, thresholdNum = 2, thresholdDen = 100)
    }),

    // ---- deterministic quality-weighted downsampling (no RNG) ----
    "q138_importance_sample" -> ((s, dir) =>
      Corpus.importanceSample(
        table(s, dir, "documents")
          .withColumn("w_ppm", least(lit(1000000L), col("n_chars") * 2000L)),
        "doc_id", "w_ppm")
        .select("doc_id", "lang", "n_chars", "w_ppm")),

    // ---- debounce: collapse same-type event bursts per user ----
    "q139_debounce" -> ((s, dir) => {
      import graft.operators.TimeSeries
      TimeSeries.debounce(events(s, dir), "user_id", "ts", "event_id",
          "event_type", gapSeconds = 600L)
        .select(col("event_id"), col("user_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
    }),

    // ---- exact rolling 7-day distinct active users per day ----
    "q140_rolling_distinct" -> ((s, dir) => {
      import graft.operators.TimeSeries
      TimeSeries.rollingDistinctDaily(events(s, dir), "user_id", "ts", 7)
        .select(date_format(col("d"), "yyyy-MM-dd").as("d"), col("n_7d"))
    }),

    // ---- hive-partitioned write + partition-pruned read-back ----
    "q141_hive_partitions" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_hive")
      table(s, dir, "orders")
        .write.mode("overwrite").partitionBy("o_orderstatus")
        .parquet(s"$work/orders_p")
      s.read.parquet(s"$work/orders_p")
        .filter(col("o_orderstatus") === "F") // prunes to one partition dir
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum((col("o_totalprice").cast(DecimalType(14, 2)) * 100)
            .cast("long")).as("rev_cents"))
    }),

    // ---- bottom-k (KMV) distinct sketch per lang + monoid merge ----
    "q142_bottomk_sketch" -> ((s, dir) =>
      graft.operators.Sketches.bottomKSketch(s,
        table(s, dir, "documents"), "lang", "doc_id", k = 8)),

    // ---- corpus rebalancing: equalize language strata by hash ----
    "q143_rebalance" -> ((s, dir) =>
      Corpus.rebalanceStrata(table(s, dir, "documents"), "doc_id", "lang")
        .select("doc_id", "lang", "n_chars")),

    // ---- per-dimension embedding calibration (min/max, 1e-7 exact) ----
    "q144_dim_calibration" -> ((s, dir) =>
      graft.operators.Similarity.dimCalibration(
        table(s, dir, "embeddings"), "embedding")),

    // ---- PPJoin-style set-similarity self-join (prefix filter) ----
    "q145_set_similarity" -> ((s, dir) =>
      graft.operators.Linkage.setSimilarityJoin(
        table(s, dir, "documents").filter(col("doc_id") < 300),
        "doc_id", "text", thresholdNum = 95, thresholdDen = 100)),

    // ---- grouped median imputation of injected nulls ----
    "q146_impute_median" -> ((s, dir) => {
      val e = events(s, dir).select(col("event_id"), col("event_type"),
        when(col("event_id") % 11 === 0, lit(null))
          .otherwise((col("value").cast(DecimalType(14, 2)) * 100)
            .cast("long")).as("v_cents"))
      Stats.imputeMedian(e, "event_type", "v_cents")
        .select("event_id", "event_type", "v_cents_filled", "was_null")
    }),

    // ---- time-weighted average value per user (irregular samples) ----
    "q147_time_weighted_avg" -> ((s, dir) => {
      import graft.operators.TimeSeries
      TimeSeries.timeWeightedAvg(
        events(s, dir).select(col("user_id"), col("ts"), col("event_id"),
          (col("value").cast(DecimalType(14, 2)) * 100).cast("long")
            .as("v_cents")),
        "user_id", "ts", "event_id", "v_cents")
    }),

    // ---- session path mining: top 3-step event-type sequences ----
    "q148_session_paths" -> ((s, dir) => {
      val e = events(s, dir)
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")), col("event_id"))
      val sess = e
        .withColumn("__gap",
          unix_micros(col("ts")) -
            lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("__new",
          when(col("__gap").isNull || col("__gap") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session", sum(col("__new")).over(
          byUser.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
      val bySess = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("session"))
        .orderBy(unix_micros(col("ts")), col("event_id"))
      val paths = sess
        .withColumn("__t2", lead(col("event_type"), 1).over(bySess))
        .withColumn("__t3", lead(col("event_type"), 2).over(bySess))
        .filter(col("__t3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("__t2"), col("__t3"))
          .as("path"))
      val counted = paths.groupBy(col("path")).agg(count(lit(1)).as("n"))
      val rk = org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("path"))
      counted.withColumn("rk", row_number().over(rk).cast("long"))
        .filter(col("rk") <= 20)
    }),

    // ---- lang × source contingency table with integer obs/exp ratio ----
    "q149_contingency" -> ((s, dir) => {
      val cells = table(s, dir, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"))
      val W = org.apache.spark.sql.expressions.Window
      cells
        .withColumn("row_n", sum(col("n")).over(W.partitionBy(col("lang"))))
        .withColumn("col_n", sum(col("n")).over(W.partitionBy(col("source"))))
        .withColumn("total", sum(col("n")).over(
          W.partitionBy(lit(1))))
        .withColumn("ratio_ppm",
          expr("n * total * 1000000L div (row_n * col_n)"))
        .select("lang", "source", "n", "row_n", "col_n", "ratio_ppm")
    }),

    // ---- distributed zipWithIndex: dense ids, no global sort ----
    "q150_dense_ids" -> ((s, dir) =>
      Intervals.denseIds(
        table(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice"),
        "o_custkey", "o_orderkey", bucketSize = 64L)
        .select(col("o_orderkey"), col("o_custkey"), col("seq_id"))),

    // ---- entity resolution end-to-end: fuzzy pairs → connected
    //      components → survivorship (canonical record per cluster) ----
    "q151_entity_clusters" -> ((s, dir) => {
      val parts = table(s, dir, "part").filter(col("p_partkey") <= 800)
        .select("p_partkey", "p_name", "p_brand")
      val pairs = graft.operators.Linkage.fuzzySelfJoin(parts, "p_partkey",
          "p_name", Seq("p_brand"), maxDist = 3)
        .select(col("id_a"), col("id_b"))
      val cc = Corpus.connectedComponents(
          parts.select(col("p_partkey").as("id")), pairs)
        .withColumnRenamed("label", "component")
      val labeled = parts
        .join(cc, parts("p_partkey") === cc("id")).drop("id")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("component"))
        .orderBy(length(col("p_name")).desc, col("p_partkey"))
      val canon = labeled.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("component"), col("p_partkey").as("canonical_id"))
      labeled.join(broadcast(canon), Seq("component"))
        .select(col("p_partkey"), col("component"), col("canonical_id"))
    }),

    // ---- co-bucketed storage join (pre-shuffled layout) ----
    "q152_bucketed_join" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_bkt")
      s.sql("DROP TABLE IF EXISTS g_bucket_orders")
      s.sql("DROP TABLE IF EXISTS g_bucket_cust")
      table(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$work/o").mode("overwrite")
        .saveAsTable("g_bucket_orders")
      table(s, dir, "customer").select("c_custkey", "c_mktsegment")
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$work/c").mode("overwrite")
        .saveAsTable("g_bucket_cust")
      s.table("g_bucket_orders")
        .join(s.table("g_bucket_cust"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum((col("o_totalprice").cast(DecimalType(14, 2)) * 100)
            .cast("long")).as("rev_cents"))
    }),

    // ---- association rules over order baskets (support ≥ 3) ----
    "q153_association_rules" -> ((s, dir) =>
      graft.operators.Rules.associationRules(
        table(s, dir, "lineitem").select("l_orderkey", "l_partkey"),
        "l_orderkey", "l_partkey", minSupport = 3L)),

    // ---- incremental SCD2 maintenance == full-history rebuild ----
    "q155_scd2_merge" -> ((s, dir) => {
      import graft.operators.Scd2
      val work = graft.Scratch.dir("graft_scd2")
      val cat = new graft.catalog.TableCatalog(s, work)
      val o = table(s, dir, "orders")
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
      val t = "D.S.SCD2DIM"
      // three date-disjoint batches → per key, batches arrive in order
      val cuts = Seq(("1900-01-01", "1995-01-01"),
        ("1995-01-01", "1996-07-01"), ("1996-07-01", "2100-01-01"))
      cuts.foreach { case (lo, hi) =>
        val b = o.filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
          col("o_orderdate") < lit(hi).cast("timestamp"))
        Scd2.mergeBatch(cat, t, b, "o_custkey", "o_orderdate",
          "o_orderkey", Seq("o_orderpriority"))
      }
      cat.read(t)
    }),

    // ---- log-line render + regex parse round trip ----
    "q156_log_parse" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_logs")
      val status = when(col("o_orderstatus") === "F", 200)
        .when(col("o_orderstatus") === "O", 404).otherwise(500)
      table(s, dir, "orders")
        .select(concat(
          lit("10.0.0."), (col("o_custkey") % 256).cast("string"),
          lit(" - - [1995-01-01] \"GET /order/"),
          col("o_orderkey").cast("string"),
          lit(" HTTP/1.1\" "), status.cast("string"), lit(" "),
          (col("o_totalprice").cast(DecimalType(14, 2)) * 100).cast("long")
            .cast("string")).as("value"))
        .write.mode("overwrite").text(s"$work/logs")
      val lines = s.read.text(s"$work/logs")
      val pat = """^(\S+) - - \[([^\]]+)\] "GET /order/(\d+) HTTP/1\.1" (\d+) (\d+)$"""
      lines
        .select(regexp_extract(col("value"), pat, 4).cast("long").as("status"),
          regexp_extract(col("value"), pat, 5).cast("long").as("bytes"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"), sum(col("bytes")).as("sum_bytes"))
    }),

    // ---- per-user event-type Markov transition matrix (ppm) ----
    "q157_transitions" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")), col("event_id"))
      val trans = events(s, dir)
        .withColumn("__next", lead(col("event_type"), 1).over(w))
        .filter(col("__next").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("__next").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val byFrom = org.apache.spark.sql.expressions.Window
        .partitionBy(col("from_type"))
      trans
        .withColumn("from_total", sum(col("n")).over(byFrom))
        .withColumn("p_ppm", expr("n * 1000000L div from_total"))
    }),

    // ---- month-over-month revenue deltas in basis points ----
    "q158_mom_growth" -> ((s, dir) => {
      val monthly = table(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(sum((col("o_totalprice").cast(DecimalType(14, 2)) * 100)
          .cast("long")).as("rev_cents"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("month"))
      monthly
        .withColumn("__prev", lag(col("rev_cents"), 1).over(w))
        .withColumn("mom_bps", when(col("__prev").isNull, lit(null))
          .otherwise(expr(
            """CASE WHEN rev_cents - __prev < 0
               THEN -((abs(rev_cents - __prev) * 10000L) div __prev)
               ELSE ((rev_cents - __prev) * 10000L) div __prev END""")))
        .select(col("month"), col("rev_cents"), col("mom_bps"))
    }),

    // ---- calendar dimension spanning the fact table's date range ----
    "q159_date_dim" -> ((s, dir) => {
      val mm = table(s, dir, "orders")
        .agg(min(to_date(col("o_orderdate"))).as("lo"),
          max(to_date(col("o_orderdate"))).as("hi"))
      mm.select(explode(sequence(col("lo"), col("hi"))).as("d"))
        .select(date_format(col("d"), "yyyy-MM-dd").as("d"),
          year(col("d")).cast("long").as("y"),
          quarter(col("d")).cast("long").as("q"),
          month(col("d")).cast("long").as("m"),
          dayofmonth(col("d")).cast("long").as("dom"),
          date_format(col("d"), "EEEE").as("dow_name"),
          date_format(col("d"), "EEEE").isin("Saturday", "Sunday")
            .as("is_weekend"),
          (col("d") === last_day(col("d"))).as("is_month_end"))
    }),

    // ---- k-means cluster purity vs ground-truth labels ----
    "q154_cluster_purity" -> ((s, dir) => {
      val assign = Clustering.kmeans(table(s, dir, "embeddings"),
          "vec_id", "embedding", k = 8, iters = 2)
        .select(col("vid").as("vec_id"), col("cid").as("cluster"))
      val lab = table(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"))
      val cells = assign.join(lab, Seq("vec_id"))
        .groupBy(col("cluster"), col("label"))
        .agg(count(lit(1)).as("n"))
      val W = org.apache.spark.sql.expressions.Window
      val byCluster = W.partitionBy(col("cluster"))
      cells
        .withColumn("n_total", sum(col("n")).over(byCluster))
        .withColumn("__rk", row_number().over(
          byCluster.orderBy(col("n").desc, col("label"))))
        .filter(col("__rk") === 1)
        .select(col("cluster"), col("label").as("majority_label"),
          col("n_total").cast("long").as("n_total"),
          col("n").as("n_majority"),
          expr("n * 1000000L div n_total").as("purity_ppm"))
    }))
}

object OraclesMining {

  val all: Map[String, String] = Map(
    "q121_bounded_topk" ->
      """SELECT o_orderstatus, CAST(rk AS BIGINT) AS rank, o_orderkey,
           price_cents FROM (
           SELECT o_orderstatus, o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
               AS price_cents,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
               ORDER BY CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) DESC,
                 o_orderkey) AS rk
           FROM orders) WHERE rk <= 5""",

    "q122_linear_fit" ->
      """WITH t AS (SELECT l_returnflag,
             CAST(l_quantity AS HUGEINT) AS x,
             CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS HUGEINT) AS y
           FROM lineitem),
         g AS (SELECT l_returnflag, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy
           FROM t GROUP BY l_returnflag),
         s AS (SELECT *,
             CASE WHEN (n * sxx - sx * sx) = 0 THEN NULL
               WHEN (n * sxy - sx * sy) < 0 AND (n * sxx - sx * sx) > 0
                    OR (n * sxy - sx * sy) > 0 AND (n * sxx - sx * sx) < 0
               THEN -(abs((n * sxy - sx * sy) * 1000000) // abs(n * sxx - sx * sx))
               ELSE abs((n * sxy - sx * sy) * 1000000) // abs(n * sxx - sx * sx)
             END AS slope_ppm
           FROM g)
         SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           CAST(sx AS BIGINT) AS sum_x, CAST(sy AS BIGINT) AS sum_y,
           CAST(slope_ppm AS BIGINT) AS slope_ppm,
           CAST(CASE WHEN slope_ppm IS NULL THEN NULL
             WHEN (sy * 1000000 - slope_ppm * sx) < 0
             THEN -(abs(sy * 1000000 - slope_ppm * sx) // n)
             ELSE abs(sy * 1000000 - slope_ppm * sx) // n
           END AS BIGINT) AS intercept_ppm
         FROM s""",

    "q123_approx_percentile" ->
      """SELECT l_returnflag,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS p50_exact,
           TRUE AS approx_within_bound
         FROM lineitem GROUP BY l_returnflag""",

    "q124_interval_islands" ->
      """WITH iv AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS s,
             CAST(o_orderdate AS DATE) + 7 AS e FROM orders),
         m AS (SELECT o_custkey, s, e,
             MAX(e) OVER (PARTITION BY o_custkey ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
           FROM iv),
         f AS (SELECT o_custkey, s, e,
             CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS ni
           FROM m),
         g AS (SELECT o_custkey, s, e,
             SUM(ni) OVER (PARTITION BY o_custkey ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
           FROM f)
         SELECT o_custkey, CAST(island AS BIGINT) AS island,
           strftime(MIN(s), '%Y-%m-%d') AS island_start,
           strftime(MAX(e), '%Y-%m-%d') AS island_end,
           COUNT(*) AS n_orders
         FROM g GROUP BY o_custkey, island""",

    "q125_retention_cohorts" ->
      """WITH f AS (SELECT user_id, MIN(ts) AS fts FROM events GROUP BY user_id),
         c AS (SELECT user_id, CAST(date_trunc('week', fts) AS DATE) AS cw FROM f),
         a AS (SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS aw FROM events)
         SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', cw, aw) // 7 AS BIGINT) AS week_no,
           COUNT(DISTINCT a.user_id) AS n_users
         FROM a JOIN c ON a.user_id = c.user_id
         GROUP BY cw, date_diff('day', cw, aw) // 7""",

    "q126_sigma_outliers" ->
      """WITH t AS (SELECT event_type, event_id,
             CAST(CAST(value AS DECIMAL(14,2)) * 100 AS HUGEINT) AS v
           FROM events),
         g AS (SELECT event_type, COUNT(*) AS n, SUM(v) AS sv,
             SUM(v * v) AS svv
           FROM t GROUP BY event_type)
         SELECT t.event_type, t.event_id, CAST(t.v AS BIGINT) AS value_cents,
           CAST(g.n AS BIGINT) AS n_group
         FROM t JOIN g ON t.event_type = g.event_type
         WHERE (g.n * t.v - g.sv) * (g.n * t.v - g.sv)
             > 9 * (g.n * g.svv - g.sv * g.sv)""",

    "q127_pagerank" ->
      """WITH e AS (SELECT DISTINCT l_partkey + 100000 AS src, l_suppkey AS dst
           FROM lineitem),
         nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         nv AS (SELECT COUNT(*) AS n FROM nodes),
         od AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
         r0 AS (SELECT node, 1000000000 // n AS r FROM nodes, nv),
         c1 AS (SELECT e.dst AS node, SUM(r0.r // od.outdeg) AS s
                FROM e JOIN r0 ON e.src = r0.node JOIN od ON e.src = od.src
                GROUP BY e.dst),
         r1 AS (SELECT nodes.node,
                  15000000000 // (100 * nv.n)
                    + (85 * COALESCE(c1.s, 0)) // 100 AS r
                FROM nodes CROSS JOIN nv LEFT JOIN c1 ON nodes.node = c1.node),
         c2 AS (SELECT e.dst AS node, SUM(r1.r // od.outdeg) AS s
                FROM e JOIN r1 ON e.src = r1.node JOIN od ON e.src = od.src
                GROUP BY e.dst),
         r2 AS (SELECT nodes.node,
                  15000000000 // (100 * nv.n)
                    + (85 * COALESCE(c2.s, 0)) // 100 AS r
                FROM nodes CROSS JOIN nv LEFT JOIN c2 ON nodes.node = c2.node)
         SELECT node, CAST(r AS BIGINT) AS rank_nano FROM r2""",

    "q128_span_dedup" ->
      """WITH t AS (SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
               x -> x <> '') AS tk
           FROM documents),
         idx AS (SELECT doc_id, tk,
             unnest(generate_series(1, (len(tk) + 3) // 4)) AS b FROM t),
         bl AS (SELECT doc_id, b,
             array_to_string(tk[(b-1)*4+1 : least(b*4, len(tk))], ' ') AS blk
           FROM idx),
         hot AS (SELECT blk FROM bl GROUP BY blk HAVING COUNT(*) >= 2),
         kept AS (SELECT bl.doc_id, bl.b, bl.blk FROM bl
                  ANTI JOIN hot USING (blk)),
         agg AS (SELECT doc_id, string_agg(blk, ' ' ORDER BY b) AS kept_text,
                  COUNT(*) AS n_kept FROM kept GROUP BY doc_id),
         tot AS (SELECT doc_id, COUNT(*) AS n_total FROM bl GROUP BY doc_id)
         SELECT tot.doc_id, COALESCE(agg.kept_text, '') AS kept_text,
           CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(tot.n_total - COALESCE(agg.n_kept, 0) AS BIGINT) AS n_removed
         FROM tot LEFT JOIN agg USING (doc_id)""",

    "q129_weighted_ma" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))
               AS BIGINT) AS total_cents
           FROM orders GROUP BY 1)
         SELECT strftime(d, '%Y-%m-%d') AS d, total_cents,
           CAST((3 * total_cents
             + 2 * COALESCE(LAG(total_cents, 1) OVER (ORDER BY d), 0)
             + COALESCE(LAG(total_cents, 2) OVER (ORDER BY d), 0)) // 6
             AS BIGINT) AS wma3_cents
         FROM daily""",

    "q130_hash_features" ->
      """WITH toks AS (SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
               x -> x <> '')) AS w
           FROM documents),
         h AS (SELECT doc_id,
             CAST((instr('0123456789abcdef', substring(md5(w), 1, 1)) - 1) * 16
               + instr('0123456789abcdef', substring(md5(w), 2, 1)) - 1
               AS BIGINT) AS bucket
           FROM toks)
         SELECT doc_id, bucket, COUNT(*) AS n FROM h GROUP BY doc_id, bucket""",

    "q131_skyline" ->
      """WITH p AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
             CAST(CAST(p_retailprice AS DECIMAL(14,2)) * 100 AS BIGINT)
               AS price_cents
           FROM part)
         SELECT p_size, price_cents, p_partkey FROM p a
         WHERE NOT EXISTS (SELECT 1 FROM p b
           WHERE b.p_size >= a.p_size AND b.price_cents <= a.price_cents
             AND (b.p_size > a.p_size OR b.price_cents < a.price_cents))""",

    "q132_mode" ->
      """SELECT o_orderstatus, o_orderpriority AS mode_value,
           CAST(n AS BIGINT) AS n_mode FROM (
           SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
               ORDER BY COUNT(*) DESC, o_orderpriority ASC) AS rk
           FROM orders GROUP BY o_orderstatus, o_orderpriority)
         WHERE rk = 1""",

    "q133_class_likelihood" ->
      """WITH toks AS (SELECT lang,
             unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
               x -> x <> '')) AS w
           FROM documents),
         wc AS (SELECT lang, w, COUNT(*) AS n_wc FROM toks GROUP BY lang, w),
         ct AS (SELECT lang, COUNT(*) AS n_c FROM toks GROUP BY lang),
         v AS (SELECT COUNT(DISTINCT w) AS vs FROM wc)
         SELECT wc.lang, wc.w, wc.n_wc,
           CAST((wc.n_wc + 1) * 1000000 // (ct.n_c + v.vs) AS BIGINT) AS p_ppm
         FROM wc JOIN ct USING (lang) CROSS JOIN v
         WHERE wc.n_wc >= 50""",

    "q134_parent_share" ->
      """WITH g AS (SELECT r_name, n_name,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))
               AS BIGINT) AS rev_cents
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY r_name, n_name)
         SELECT r_name, n_name, rev_cents,
           CAST(SUM(rev_cents) OVER (PARTITION BY r_name) AS BIGINT)
             AS region_cents,
           CAST(rev_cents * 1000000 //
             SUM(rev_cents) OVER (PARTITION BY r_name) AS BIGINT) AS share_ppm
         FROM g""",

    "q135_dq_report" ->
      """SELECT *, n_violations = 0 AS passed FROM (
           SELECT 'not_null' AS "check", 'o_custkey' AS "column",
             CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS n_violations
           FROM orders
           UNION ALL
           SELECT 'unique', 'o_orderkey',
             CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'bounds', 'o_totalprice',
             CAST(COALESCE(SUM(CASE WHEN o_totalprice < 0
               OR o_totalprice > 400000 THEN 1 ELSE 0 END), 0) AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'ref_integrity', 'o_custkey', CAST(COUNT(*) AS BIGINT)
           FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
           WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL)""",

    "q136_sequence_gaps" ->
      """WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders
           WHERE o_orderkey % 7 <> 0),
         l AS (SELECT k, LAG(k) OVER (ORDER BY k) AS pk FROM k)
         SELECT pk + 1 AS gap_start, k - 1 AS gap_end,
           k - pk - 1 AS gap_len
         FROM l WHERE k - pk > 1""",

    "q137_incremental_dedup" ->
      """WITH t AS (SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
           FROM documents),
         idx AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM t),
         sh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] AS shingle FROM idx),
         b AS (
           SELECT doc_id, 0 AS band, MIN(md5('0:' || shingle)) AS minhash FROM sh GROUP BY doc_id
           UNION ALL SELECT doc_id, 1, MIN(md5('1:' || shingle)) FROM sh GROUP BY doc_id
           UNION ALL SELECT doc_id, 2, MIN(md5('2:' || shingle)) FROM sh GROUP BY doc_id
           UNION ALL SELECT doc_id, 3, MIN(md5('3:' || shingle)) FROM sh GROUP BY doc_id),
         cand AS (SELECT DISTINCT n.doc_id AS id_new, o.doc_id AS id_old
                  FROM b n JOIN b o ON n.band = o.band AND n.minhash = o.minhash
                  WHERE n.doc_id >= 400 AND o.doc_id < 400),
         sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
         inter AS (SELECT cand.id_new, cand.id_old, COUNT(*) AS inter
                   FROM cand
                   JOIN sh sa ON sa.doc_id = cand.id_new
                   JOIN sh sb ON sb.doc_id = cand.id_old AND sb.shingle = sa.shingle
                   GROUP BY cand.id_new, cand.id_old)
         SELECT i.id_new, i.id_old, i.inter,
           za.sz AS size_a, zb.sz AS size_b
         FROM inter i
         JOIN sizes za ON za.doc_id = i.id_new
         JOIN sizes zb ON zb.doc_id = i.id_old
         WHERE i.inter * 100 >= (za.sz + zb.sz - i.inter) * 2""",

    "q138_importance_sample" ->
      """WITH d AS (SELECT doc_id, lang, n_chars,
             LEAST(1000000, n_chars * 2000) AS w_ppm,
             substring(md5('is:' || CAST(doc_id AS VARCHAR)), 1, 5) AS h5
           FROM documents),
         v AS (SELECT *,
             CAST((instr('0123456789abcdef', substring(h5, 1, 1)) - 1) AS BIGINT) * 65536
               + (instr('0123456789abcdef', substring(h5, 2, 1)) - 1) * 4096
               + (instr('0123456789abcdef', substring(h5, 3, 1)) - 1) * 256
               + (instr('0123456789abcdef', substring(h5, 4, 1)) - 1) * 16
               + (instr('0123456789abcdef', substring(h5, 5, 1)) - 1) AS draw
           FROM d)
         SELECT doc_id, lang, n_chars, CAST(w_ppm AS BIGINT) AS w_ppm
         FROM v WHERE draw * 1000000 < w_ppm * 1048576""",

    "q139_debounce" ->
      """SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
         FROM (SELECT *,
             LAG(event_type) OVER w AS pt, LAG(ts) OVER w AS pts
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
         WHERE pt IS NULL OR pt <> event_type
            OR epoch_us(ts) - epoch_us(pts) > 600000000""",

    "q140_rolling_distinct" ->
      """WITH ud AS (SELECT DISTINCT user_id,
             CAST(date_trunc('day', ts) AS DATE) AS d0 FROM events),
         active AS (SELECT DISTINCT d0 AS d FROM ud),
         fan AS (SELECT DISTINCT user_id, d0 + CAST(i AS INTEGER) AS d
                 FROM ud, generate_series(0, 6) AS t(i))
         SELECT strftime(fan.d, '%Y-%m-%d') AS d,
           COUNT(DISTINCT user_id) AS n_7d
         FROM fan JOIN active ON fan.d = active.d
         GROUP BY fan.d""",

    "q141_hive_partitions" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))
             AS BIGINT) AS rev_cents
         FROM orders WHERE o_orderstatus = 'F'
         GROUP BY o_orderpriority""",

    "q142_bottomk_sketch" ->
      """WITH h AS (SELECT DISTINCT lang,
             CAST((SELECT SUM((instr('0123456789abcdef',
                  substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)
                * (CAST(1 AS BIGINT) << (4 * (15 - i))))
              FROM generate_series(1, 15) AS t(i)) AS BIGINT) AS hv
           FROM documents),
         r AS (SELECT lang, hv,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv) AS rk,
             COUNT(*) OVER (PARTITION BY lang) AS nd
           FROM h),
         grp AS (SELECT lang AS g, hv, rk, nd FROM r WHERE rk <= 8),
         ga AS (SELECT g,
             MAX(CASE WHEN rk = LEAST(8, nd) THEN hv END) AS kth_hash,
             CAST(COUNT(*) AS BIGINT) AS n_sketch
           FROM grp GROUP BY g),
         allh AS (SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rk,
             COUNT(*) OVER () AS nd
           FROM (SELECT DISTINCT hv FROM grp)),
         am AS (SELECT '__all' AS g,
             MAX(CASE WHEN rk = LEAST(8, nd) THEN hv END) AS kth_hash,
             CAST(COUNT(*) AS BIGINT) AS n_sketch
           FROM allh WHERE rk <= 8),
         u AS (SELECT * FROM ga UNION ALL SELECT * FROM am)
         SELECT g AS lang, kth_hash, n_sketch,
           CAST(CASE WHEN n_sketch < 8 THEN n_sketch
             ELSE (CAST(7 AS BIGINT) * 1073741824) // ((kth_hash // 1073741824) + 1)
             END AS BIGINT) AS est_distinct
         FROM u""",

    "q143_rebalance" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
         m AS (SELECT MIN(n) AS mn FROM c),
         w AS (SELECT d.doc_id, d.lang, d.n_chars,
             (m.mn * 1000000) // c.n AS w_ppm,
             substring(md5('rb:' || CAST(d.doc_id AS VARCHAR)), 1, 5) AS h5
           FROM documents d JOIN c ON d.lang = c.lang CROSS JOIN m),
         v AS (SELECT *,
             CAST((instr('0123456789abcdef', substring(h5, 1, 1)) - 1) AS BIGINT) * 65536
               + (instr('0123456789abcdef', substring(h5, 2, 1)) - 1) * 4096
               + (instr('0123456789abcdef', substring(h5, 3, 1)) - 1) * 256
               + (instr('0123456789abcdef', substring(h5, 4, 1)) - 1) * 16
               + (instr('0123456789abcdef', substring(h5, 5, 1)) - 1) AS draw
           FROM w)
         SELECT doc_id, lang, n_chars FROM v
         WHERE draw * 1000000 < w_ppm * 1048576""",

    "q144_dim_calibration" ->
      """WITH e AS (SELECT embedding AS v FROM embeddings),
         x AS (SELECT unnest(generate_series(1, len(v))) AS i, v FROM e),
         q AS (SELECT CAST(i - 1 AS BIGINT) AS dim,
             CAST(round(CAST(v[i] AS DOUBLE) * 10000000) AS BIGINT) AS qv
           FROM x)
         SELECT dim, MIN(qv) AS lo_q, MAX(qv) AS hi_q, COUNT(*) AS n
         FROM q GROUP BY dim""",

    // plain all-pairs reference — doubles as the proof that the prefix
    // filter is lossless (zero false negatives)
    "q145_set_similarity" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
         tm AS (SELECT DISTINCT doc_id,
             unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
               x -> x <> '')) AS term
           FROM d),
         sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tm GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             COUNT(*) AS inter
           FROM tm a JOIN tm b ON a.term = b.term AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b, inter, za.sz AS size_a, zb.sz AS size_b
         FROM inter
         JOIN sizes za ON za.doc_id = id_a
         JOIN sizes zb ON zb.doc_id = id_b
         WHERE inter * 100 >= (za.sz + zb.sz - inter) * 95""",

    "q146_impute_median" ->
      """WITH e AS (SELECT event_id, event_type,
             CASE WHEN event_id % 11 = 0 THEN NULL
               ELSE CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)
             END AS v
           FROM events),
         m AS (SELECT event_type,
             CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS BIGINT)
               AS med
           FROM e WHERE v IS NOT NULL GROUP BY event_type)
         SELECT event_id, e.event_type,
           COALESCE(v, med) AS v_cents_filled,
           v IS NULL AS was_null
         FROM e JOIN m ON e.event_type = m.event_type""",

    "q147_time_weighted_avg" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
             CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) AS v
           FROM events),
         d AS (SELECT user_id, v,
             LEAD(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
               - tus AS dt
           FROM e)
         SELECT user_id, COUNT(*) AS n_intervals,
           CAST(CASE WHEN SUM(CAST(v AS HUGEINT) * dt) < 0
             THEN -(abs(SUM(CAST(v AS HUGEINT) * dt)) // SUM(CAST(dt AS HUGEINT)))
             ELSE SUM(CAST(v AS HUGEINT) * dt) // SUM(CAST(dt AS HUGEINT))
             END AS BIGINT) AS twa
         FROM d WHERE dt IS NOT NULL GROUP BY user_id""",

    "q148_session_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
           FROM events),
         g AS (SELECT *,
             tus - LAG(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
               AS gap
           FROM e),
         f AS (SELECT *,
             CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END AS ni
           FROM g),
         s AS (SELECT *,
             SUM(ni) OVER (PARTITION BY user_id ORDER BY tus, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session
           FROM f),
         p AS (SELECT event_type || '>' ||
             LEAD(event_type, 1) OVER w || '>' ||
             LEAD(event_type, 2) OVER w AS path,
             LEAD(event_type, 2) OVER w AS t3
           FROM s
           WINDOW w AS (PARTITION BY user_id, session
             ORDER BY tus, event_id)),
         c AS (SELECT path, COUNT(*) AS n FROM p WHERE t3 IS NOT NULL
           GROUP BY path)
         SELECT path, n,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, path) AS BIGINT) AS rk
         FROM c QUALIFY rk <= 20""",

    "q149_contingency" ->
      """WITH cells AS (SELECT lang, source, COUNT(*) AS n
           FROM documents GROUP BY lang, source)
         SELECT lang, source, n,
           CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS row_n,
           CAST(SUM(n) OVER (PARTITION BY source) AS BIGINT) AS col_n,
           CAST(n * SUM(n) OVER () * 1000000 //
             (SUM(n) OVER (PARTITION BY lang)
               * SUM(n) OVER (PARTITION BY source)) AS BIGINT) AS ratio_ppm
         FROM cells""",

    "q150_dense_ids" ->
      """SELECT o_orderkey, o_custkey,
           CAST(ROW_NUMBER() OVER (ORDER BY o_custkey, o_orderkey) - 1
             AS BIGINT) AS seq_id
         FROM orders""",

    "q151_entity_clusters" ->
      """WITH RECURSIVE p AS (SELECT p_partkey, p_name, p_brand FROM part
           WHERE p_partkey <= 800),
         cand AS (SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
           FROM p a JOIN p b
             ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
           WHERE levenshtein(a.p_name, b.p_name) <= 3),
         edges AS (SELECT id_a AS src, id_b AS dst FROM cand
                   UNION ALL SELECT id_b, id_a FROM cand),
         reach AS (SELECT p_partkey AS id, p_partkey AS r FROM p
           UNION
           SELECT e.dst AS id, reach.r AS r
           FROM reach JOIN edges e ON e.src = reach.id),
         comp AS (SELECT id AS p_partkey, MIN(r) AS component
           FROM reach GROUP BY id),
         lab AS (SELECT p.p_partkey, p.p_name, comp.component
           FROM p JOIN comp USING (p_partkey)),
         canon AS (SELECT component, p_partkey AS canonical_id FROM (
             SELECT component, p_partkey,
               ROW_NUMBER() OVER (PARTITION BY component
                 ORDER BY length(p_name) DESC, p_partkey) AS rk
             FROM lab) WHERE rk = 1)
         SELECT lab.p_partkey, lab.component, canon.canonical_id
         FROM lab JOIN canon USING (component)""",

    "q152_bucketed_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))
             AS BIGINT) AS rev_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",

    "q153_association_rules" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
           FROM lineitem),
         nb AS (SELECT COUNT(DISTINCT b) AS n FROM bi),
         isupp AS (SELECT i, COUNT(*) AS supp FROM bi GROUP BY i),
         pairs AS (SELECT x.i AS pa, y.i AS pb, COUNT(*) AS supp_pair
           FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i
           GROUP BY 1, 2 HAVING COUNT(*) >= 3),
         d AS (SELECT pa AS antecedent, pb AS consequent, supp_pair FROM pairs
               UNION ALL
               SELECT pb, pa, supp_pair FROM pairs)
         SELECT d.antecedent, d.consequent, d.supp_pair,
           sa.supp AS supp_ante, sc.supp AS supp_cons,
           CAST(d.supp_pair * 1000000 // sa.supp AS BIGINT)
             AS confidence_ppm,
           CAST(d.supp_pair * nb.n * 1000000 // (sa.supp * sc.supp)
             AS BIGINT) AS lift_ppm
         FROM d
         JOIN isupp sa ON sa.i = d.antecedent
         JOIN isupp sc ON sc.i = d.consequent
         CROSS JOIN nb""",

    "q155_scd2_merge" ->
      """SELECT o_custkey, o_orderkey, o_orderpriority,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS valid_from,
           COALESCE(strftime(LEAD(o_orderdate) OVER w, '%Y-%m-%d %H:%M:%S'),
             '9999-01-01 00:00:00') AS valid_to,
           CAST(CASE WHEN LEAD(o_orderdate) OVER w IS NULL THEN 1 ELSE 0 END
             AS BIGINT) AS is_current
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",

    "q156_log_parse" ->
      """SELECT CASE WHEN o_orderstatus = 'F' THEN 200
                     WHEN o_orderstatus = 'O' THEN 404 ELSE 500 END AS status,
           COUNT(*) AS n,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))
             AS BIGINT) AS sum_bytes
         FROM orders GROUP BY 1""",

    "q157_transitions" ->
      """WITH t AS (SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS nxt
           FROM events),
         c AS (SELECT event_type AS from_type, nxt AS to_type, COUNT(*) AS n
           FROM t WHERE nxt IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, n,
           CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS from_total,
           CAST(n * 1000000 // SUM(n) OVER (PARTITION BY from_type)
             AS BIGINT) AS p_ppm
         FROM c""",

    "q158_mom_growth" ->
      """WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
               AS BIGINT)) AS BIGINT) AS rev_cents
           FROM orders GROUP BY 1),
         l AS (SELECT month, rev_cents,
             LAG(rev_cents) OVER (ORDER BY month) AS prev
           FROM m)
         SELECT month, rev_cents,
           CASE WHEN prev IS NULL THEN NULL
                WHEN rev_cents - prev < 0
                  THEN -((abs(rev_cents - prev) * 10000) // prev)
                ELSE ((rev_cents - prev) * 10000) // prev END AS mom_bps
         FROM l""",

    "q159_date_dim" ->
      """WITH mm AS (SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
             CAST(MAX(o_orderdate) AS DATE) AS hi FROM orders),
         spine AS (SELECT CAST(unnest(generate_series(
             CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
             INTERVAL 1 DAY)) AS DATE) AS d FROM mm)
         SELECT strftime(d, '%Y-%m-%d') AS d,
           CAST(year(d) AS BIGINT) AS y,
           CAST(quarter(d) AS BIGINT) AS q,
           CAST(month(d) AS BIGINT) AS m,
           CAST(day(d) AS BIGINT) AS dom,
           strftime(d, '%A') AS dow_name,
           strftime(d, '%A') IN ('Saturday', 'Sunday') AS is_weekend,
           d = last_day(d) AS is_month_end
         FROM spine""",

    "q154_cluster_purity" -> {
      val kmeansSql = OraclesExtra.all("q71_kmeans")
      s"""WITH assign AS (
         $kmeansSql
         ),
         lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label
           FROM embeddings),
         cells AS (SELECT a.cluster, lab.label, COUNT(*) AS n
           FROM assign a JOIN lab ON a.vec_id = lab.vec_id
           GROUP BY a.cluster, lab.label),
         t AS (SELECT cluster, CAST(SUM(n) AS BIGINT) AS n_total
           FROM cells GROUP BY cluster),
         m AS (SELECT cluster, label AS majority_label, n AS n_majority
           FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster
               ORDER BY n DESC, label) AS rk FROM cells)
           WHERE rk = 1)
         SELECT t.cluster, m.majority_label, t.n_total,
           CAST(m.n_majority AS BIGINT) AS n_majority,
           CAST(m.n_majority * 1000000 // t.n_total AS BIGINT)
             AS purity_ppm
         FROM t JOIN m USING (cluster)"""
    })
}

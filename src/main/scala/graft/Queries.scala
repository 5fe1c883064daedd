package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.config._
import graft.operators.{CuratedOps, RefinedOps}

/** Registered query catalog: each entry is one operator from
  * SURVEY.md §2 exercised on the driver testdata, paired with an ANSI
  * SQL oracle (DuckDB) in [[Oracles]].
  *
  * Float discipline: raw parquet doubles pass through untouched (bit
  * identical in both engines); every COMPUTED aggregate over doubles is
  * done in exact decimal arithmetic and cast to double at the very end,
  * so Spark and DuckDB produce bit-identical results regardless of
  * accumulation order.
  */
object Queries {

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet has shipped `ts` under three physical types across
    * testdata generations; normalize all of them to session-TZ
    * TimestampType (micros) so every downstream query sees one type:
    *  - TIMESTAMP(NANOS) → LongType nanos-since-epoch under
    *    spark.sql.legacy.parquet.nanosAsLong: floor-divide to micros
    *    (the same truncation DuckDB applies reading nanos).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) → TimestampNTZType:
    *    cast to TimestampType. The session TZ is pinned to UTC, so the
    *    wall-clock field values are preserved exactly.
    *  - TimestampType: pass through. */
  def events(s: SparkSession, dir: String): DataFrame =
    normalizeEventTs(table(s, dir, "events"))

  /** See [[events]]; shared with the streaming read path so batch and
    * stream agree on the normalization for every physical generation.
    * Integer `div` (not `/`) for the nanos branch: nanos-since-epoch
    * (~1.7e18) exceeds double's 2^53 exact range. */
  def normalizeEventTs(df: DataFrame, colName: String = "ts"): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, timestamp_micros(expr(s"`$colName` div 1000")))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case _ => df
    }
  }

  /** sum over a double column, exact: cast to decimal, sum, back to double */
  private def dsum(c: Column, p: Int = 14, s: Int = 2): Column =
    sum(c.cast(DecimalType(p, s))).cast("double")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A1/A3: pricing summary (grouped aggregate, TPC-H Q1 shape) ----
    "q01_pricing_summary" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast(DecimalType(14, 2)) *
            (lit(1) - col("l_discount").cast(DecimalType(4, 2))))
            .cast("double").as("sum_disc_price"),
          (sum(col("l_discount").cast(DecimalType(4, 2))).cast("double") /
            count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // ---- P3/P4: filter + projection (predicate pushdown to parquet) ----
    "q02_filter_project" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    }),

    // ---- J1 at fact scale: join + grouped aggregate ----
    "q03_join_agg" -> ((s, dir) => {
      val o = table(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      val li = table(s, dir, "lineitem")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          countDistinct(col("o_orderkey")).as("n_orders"),
          sum(col("l_extendedprice").cast(DecimalType(14, 2)) *
            (lit(1) - col("l_discount").cast(DecimalType(4, 2))))
            .cast("double").as("revenue"))
    }),

    // ---- J2: small-dimension broadcast join chain ----
    "q04_dim_join" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val n = broadcast(table(s, dir, "nation"))
      val r = broadcast(table(s, dir, "region"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          dsum(col("c_acctbal")).as("sum_acctbal"))
    }),

    // ---- J3: self equi join + DISTINCT (bisbee query-source shape) ----
    "q05_self_join" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val a = li.filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"), col("l_partkey").as("p1"))
      val b = li.filter(col("l_linenumber") === 2)
        .select(col("l_orderkey"), col("l_partkey").as("p2"))
      a.join(b, "l_orderkey").distinct()
    }),

    // ---- A4: DISTINCT projection ----
    "q06_distinct" -> ((s, dir) =>
      table(s, dir, "lineitem").select("l_suppkey", "l_returnflag").distinct()),

    // ---- J1: lookup LEFT JOIN → NEW/UPDATE classification + A3 distribution ----
    "q07_record_type" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val lookup = table(s, dir, "customer").filter(col("c_custkey") % 5 === 0)
      val spec = LookupSpec("customer", "o_custkey", "c_custkey",
        "record_type", "UPDATE", "NEW")
      CuratedOps.lookupClassify(o, lookup, spec)
        .groupBy(col("record_type")).agg(count(lit(1)).as("n"))
    }),

    // ---- A2: conditional counts in one pass ----
    "q08_conditional_agg" -> ((s, dir) => {
      val e = events(s, dir)
      e.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        count(when(CuratedOps.presentAndNonBlank(col("props")), true)).as("n_props"),
        count(when(col("value") > 100.0, true)).as("n_big"),
        count(when(col("user_id") % 2 === 0, true)).as("n_even_user"))
    }),

    // ---- 2.6: chained conditional regex rewrite (REFINED rules) ----
    "q09_regex_rules" -> ((s, dir) => {
      val e = events(s, dir)
      val specs = Seq(RegexReplaceSpec("event_type", Seq(
        RegexRule(Some("pur"), "purchase", "PURCHASE_EVT"),
        RegexRule(None, "sign.p", "SIGNUP_EVT"))))
      RefinedOps.regexReplaceRules(e, specs)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    }),

    // ---- 2.6: split → reorder → join (werter provider reformat) ----
    "q10_split_reorder" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val spec = ReformatSpec("c_name", "#", Seq(1, 0), " ", trimParts = true)
      RefinedOps.splitReorder(c, Seq(spec)).select("c_custkey", "c_name")
    }),

    // ---- 2.6: character-class strip (adcs brace strip shape) ----
    "q11_char_strip" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      RefinedOps.columnStrip(c, Seq(StripSpec("c_name", "#0")))
        .select("c_custkey", "c_name")
    }),

    // ---- P2: mapping-driven projection (concat / fallback / null) ----
    "q12_mapping_projection" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val specs = Seq(
        MappingSpec("order_key", "o_orderkey", None, " ", None),
        MappingSpec("status_priority", "o_orderstatus", Some("o_orderpriority"), "/", None),
        MappingSpec("missing_col", "no_such_column", None, " ", None),
        MappingSpec("status_fb", "no_such_column", None, " ", Some("o_orderstatus")))
      CuratedOps.mappingProjection(o, specs)
    }),

    // ---- P5: config-driven WHERE compiler ----
    "q13_filter_compiler" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val specs = Seq(
        FilterSpec("o_orderstatus", "=", "F"),
        FilterSpec("o_totalprice", ">", "1000"),
        FilterSpec("o_orderpriority", "IN", "1-URGENT, 2-HIGH"),
        FilterSpec("o_orderstatus", "IS NOT NULL", ""))
      o.filter(CuratedOps.compileFilter(o, specs))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    }),

    // ---- P6: future-only filter over concat'd datetime strings ----
    "q14_future_filter" -> ((s, dir) => {
      val e = events(s, dir)
        .withColumn("evt_date", date_format(col("ts"), "yyyy-MM-dd"))
        .withColumn("evt_time", date_format(col("ts"), "HH:mm:ss"))
      val spec = FutureOnlySpec(Seq("evt_date", "evt_time"), " ")
      e.filter(CuratedOps.futureOnlyFilter(e, spec, lit("2024-01-03").cast("timestamp")))
        .select("event_id", "evt_date", "evt_time")
    }),

    // ---- 2.5 generalization: latest-record-per-key window dedup ----
    "q15_window_latest" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = events(s, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      e.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type", "value")
    }),

    // ---- 2.5: ORDER BY + LIMIT top-N (deterministic tiebreak) ----
    "q16_topn" -> ((s, dir) =>
      table(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")),

    // ---- 2.5: UNION ALL of heterogeneous slices (multi-file ingest shape) ----
    "q17_union" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val hi = li.filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_linenumber"), lit("HI").as("band"))
      val lo = li.filter(col("l_quantity") <= 5)
        .select(col("l_linenumber"), col("l_orderkey"), lit("LO").as("band"))
      hi.unionByName(lo.select("l_orderkey", "l_linenumber", "band"))
    }),

    // ---- W5: MERGE upsert (source wins, target anti-joined) ----
    "q18_merge_upsert" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val target = o.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
      val source = o.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), lit("M").as("o_orderstatus"), col("o_orderpriority"))
      graft.operators.MergeOps.upsert(target, source, Seq("o_orderkey"))
    }),

    // ---- P1: REFINED uppercase projection + metadata flags ----
    "q19_refined_project" -> ((s, dir) => {
      val raw = table(s, dir, "lineitem")
        .filter(col("l_linenumber") === 1)
        .withColumn("IS_NEW", lit(1))
        .select("l_orderkey", "l_partkey", "l_returnflag", "IS_NEW")
      RefinedOps.uppercaseProject(raw)
        .withColumn("IS_VALID", lit(1).cast("long"))
        .withColumn("REFINED_PARENT_RUN_ID", lit("RUN1"))
    }),

    // ---- S6/2.6: JSON path extraction ----
    "q20_json_extract" -> ((s, dir) => {
      events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
    }),

    // ---- time bucketing + exact decimal agg ----
    "q21_hourly_agg" -> ((s, dir) => {
      events(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd HH:00").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    }))
}

/** DuckDB oracle SQL — one per entry in [[Queries.all]]; written to
  * produce identical column names, types, and (exact) values. */
object Oracles {
  val all: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
         CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01'
           AND l_shipdate < TIMESTAMP '1996-01-01'
           AND l_returnflag = 'R'""",

    "q03_join_agg" ->
      """SELECT o_orderpriority,
         COUNT(DISTINCT o_orderkey) AS n_orders,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderdate >= TIMESTAMP '1995-01-01'
           AND o_orderdate < TIMESTAMP '1996-07-01'
         GROUP BY o_orderpriority""",

    "q04_dim_join" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS sum_acctbal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",

    "q05_self_join" ->
      """SELECT DISTINCT a.l_orderkey, a.l_partkey AS p1, b.l_partkey AS p2
         FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
         WHERE a.l_linenumber = 1 AND b.l_linenumber = 2""",

    "q06_distinct" ->
      "SELECT DISTINCT l_suppkey, l_returnflag FROM lineitem",

    "q07_record_type" ->
      """SELECT CASE WHEN lk.c_custkey IS NOT NULL THEN 'UPDATE' ELSE 'NEW' END AS record_type,
         COUNT(*) AS n
         FROM orders LEFT JOIN
           (SELECT DISTINCT c_custkey FROM customer WHERE c_custkey % 5 = 0) lk
           ON o_custkey = lk.c_custkey
         GROUP BY 1""",

    "q08_conditional_agg" ->
      """SELECT event_type, COUNT(*) AS n,
         COUNT(CASE WHEN props IS NOT NULL AND TRIM(props) != '' THEN 1 END) AS n_props,
         COUNT(CASE WHEN value > 100.0 THEN 1 END) AS n_big,
         COUNT(CASE WHEN user_id % 2 = 0 THEN 1 END) AS n_even_user
         FROM events GROUP BY event_type""",

    "q09_regex_rules" ->
      """WITH r1 AS (
           SELECT CASE WHEN contains(event_type, 'pur')
                       THEN regexp_replace(event_type, 'purchase', 'PURCHASE_EVT', 'g')
                       ELSE event_type END AS event_type
           FROM events),
         r2 AS (
           SELECT regexp_replace(event_type, 'sign.p', 'SIGNUP_EVT', 'g') AS event_type
           FROM r1)
         SELECT event_type, COUNT(*) AS n FROM r2 GROUP BY event_type""",

    "q10_split_reorder" ->
      """SELECT c_custkey,
         concat_ws(' ', TRIM(split_part(c_name, '#', 2)), TRIM(split_part(c_name, '#', 1))) AS c_name
         FROM customer""",

    "q11_char_strip" ->
      """SELECT c_custkey, regexp_replace(c_name, '[#0]', '', 'g') AS c_name
         FROM customer""",

    "q12_mapping_projection" ->
      """SELECT o_orderkey AS order_key,
         concat_ws('/', COALESCE(o_orderstatus, ''), COALESCE(o_orderpriority, '')) AS status_priority,
         CAST(NULL AS VARCHAR) AS missing_col,
         o_orderstatus AS status_fb
         FROM orders""",

    "q13_filter_compiler" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
         FROM orders
         WHERE o_orderstatus = 'F' AND o_totalprice > CAST('1000' AS DOUBLE)
           AND o_orderpriority IN ('1-URGENT', '2-HIGH')
           AND o_orderstatus IS NOT NULL""",

    "q14_future_filter" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d') AS evt_date,
                strftime(ts, '%H:%M:%S') AS evt_time
         FROM events
         WHERE strptime(concat_ws(' ', strftime(ts, '%Y-%m-%d'), strftime(ts, '%H:%M:%S')),
                        '%Y-%m-%d %H:%M:%S') > TIMESTAMP '2024-01-03'""",

    "q15_window_latest" ->
      """SELECT user_id, event_id, event_type, value FROM (
           SELECT user_id, event_id, event_type, value,
                  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1""",

    "q16_topn" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",

    "q17_union" ->
      """SELECT l_orderkey, l_linenumber, 'HI' AS band FROM lineitem WHERE l_quantity >= 45
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'LO' AS band FROM lineitem WHERE l_quantity <= 5""",

    "q18_merge_upsert" ->
      """WITH target AS (
           SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 2 = 0),
         source AS (
           SELECT o_orderkey, 'M' AS o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 3 = 0)
         SELECT * FROM source
         UNION ALL
         SELECT t.* FROM target t WHERE NOT EXISTS
           (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)""",

    "q19_refined_project" ->
      """SELECT l_orderkey AS "L_ORDERKEY", l_partkey AS "L_PARTKEY",
         l_returnflag AS "L_RETURNFLAG",
         CAST(1 AS BIGINT) AS "IS_VALID", 'RUN1' AS "REFINED_PARENT_RUN_ID"
         FROM lineitem WHERE l_linenumber = 1""",

    "q20_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n
         FROM events GROUP BY k""",

    "q21_hourly_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour, event_type,
         COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""")
}

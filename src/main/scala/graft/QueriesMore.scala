package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.expressions.GraftFunctions
import graft.operators.Dedup

/** Query wave 4: native-expression operators, sessionization, rollup. */
object QueriesMore {

  import Queries.{table, events}

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- SimHash near-dup via native codegen'd hamming distance ----
    "q36_simhash_neardup" -> ((s, dir) => {
      GraftFunctions.register(s)
      val sig = Dedup.simhashBits(
        table(s, dir, "documents").filter(col("doc_id") < 100), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
      val a = sig.select(col("doc_id").as("id_a"), col("simhash").as("sig_a"),
        substring(col("simhash"), 1, 8).as("blk"))
      val b = sig.select(col("doc_id").as("id_b"), col("simhash").as("sig_b"),
        substring(col("simhash"), 1, 8).as("blk"))
      a.join(b, "blk").filter(col("id_a") < col("id_b"))
        .withColumn("hamming", GraftFunctions.hamming(col("sig_a"), col("sig_b")))
        .filter(col("hamming") <= 24)
        .select("id_a", "id_b", "hamming")
    }),

    // ---- Karp–Rabin rolling-hash fingerprint (native expression;
    //      rows-only check — no portable SQL equivalent) ----
    "q37_rolling_fingerprint" -> ((s, dir) => {
      GraftFunctions.register(s)
      table(s, dir, "documents")
        .select(col("doc_id"), GraftFunctions.rollingHash(col("text")).as("fp"))
        .groupBy(col("fp")).agg(min(col("doc_id")).as("keeper_id"),
          count(lit(1)).as("n_docs"))
    }),

    // ---- gap-based sessionization (30-min inactivity boundary) ----
    "q38_sessionize" -> ((s, dir) => {
      val e = events(s, dir).withColumn("ts_us", unix_micros(col("ts")))
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val gapped = e.withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_us").isNull ||
            col("ts_us") - col("prev_us") > 30L * 60 * 1000000, 1L).otherwise(0L))
      val sessions = gapped.withColumn("session_id",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      sessions.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_us")).as("session_start_us"),
          max(col("ts_us")).as("session_end_us"))
    }),

    // ---- map-typed columns: per-user event_type→count map built with
    //      map_from_entries, probed with element_at (order-independent
    //      by construction — lookups by key, never by position) ----
    "q120_map_functions" -> ((s, dir) => {
      val perType = events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val m = perType.groupBy(col("user_id"))
        .agg(map_from_entries(
          collect_list(struct(col("event_type"), col("c")))).as("m"))
      m.select(col("user_id"),
        coalesce(element_at(col("m"), "click"), lit(0L)).as("clicks"),
        coalesce(element_at(col("m"), "purchase"), lit(0L)).as("purchases"),
        coalesce(element_at(col("m"), "signup"), lit(0L)).as("signups"),
        size(col("m")).as("n_types"))
    }),

    // ---- cumulative distinct users per day: the window-COUNT(DISTINCT)
    //      workaround — count first-seen dates, then a running sum
    //      (two narrow shuffles instead of an unsupported/quadratic
    //      distinct-within-frame) ----
    "q112_cumulative_users" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val firstSeen = events(s, dir)
        .groupBy(col("user_id"))
        .agg(min(date_format(col("ts"), "yyyy-MM-dd")).as("first_day"))
        .groupBy(col("first_day")).agg(count(lit(1)).as("new_users"))
      firstSeen.withColumn("cumulative_users",
        sum(col("new_users")).over(
          Window.orderBy(col("first_day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    }),

    // ---- item-item co-occurrence (CF matrix build): per-user distinct
    //      items, within-user pair expansion (bounded by per-user item
    //      count, never corpus-quadratic), pair-count shuffle, top-100 ----
    "q106_cooccurrence" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = events(s, dir).select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
        .filter(col("item").isNotNull).distinct()
      val a = e.select(col("user_id"), col("item").as("i"))
      val b = e.select(col("user_id"), col("item").as("j"))
      val pairs = a.join(b, Seq("user_id")).filter(col("i") < col("j"))
        .groupBy(col("i"), col("j")).agg(count(lit(1)).as("n_users"))
      val ord = Seq(col("n_users").desc, col("i"), col("j"))
      pairs.orderBy(ord: _*).limit(100)
        .withColumn("rk", row_number().over(Window.orderBy(ord: _*)))
    }),

    // ---- funnel conversion: signup → purchase within 7 days,
    //      cohorted by signup date (left join preserves non-converters;
    //      the time-band join is the bounded-state interval shape) ----
    "q105_funnel" -> ((s, dir) => {
      val e = events(s, dir).withColumn("ts_us", unix_micros(col("ts")))
      val signup = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("signup_us"))
      val purchase = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("p_us"))
      val sevenDaysUs = 7L * 86400L * 1000000L
      signup.join(purchase,
          signup("user_id") === purchase("user_id") &&
            col("p_us") >= col("signup_us") &&
            col("p_us") <= col("signup_us") + sevenDaysUs,
          "left")
        .groupBy(signup("user_id").as("uid"), col("signup_us"))
        .agg(max(when(col("p_us").isNotNull, 1L).otherwise(0L)).as("converted"))
        .groupBy(date_format(timestamp_micros(col("signup_us")), "yyyy-MM-dd")
          .as("cohort_date"))
        .agg(count(lit(1)).as("n_signups"),
          sum(col("converted")).as("n_converted"))
    }),

    // ---- ROLLUP multi-level aggregation ----
    "q39_rollup" -> ((s, dir) =>
      table(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(14, 2))).cast("double")
            .as("sum_price"))))
}

object OraclesMore {
  val all: Map[String, String] = Map(
    "q36_simhash_neardup" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
         t AS (SELECT DISTINCT doc_id, unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS tok FROM d),
         h AS (SELECT doc_id, md5(tok) AS h FROM t),
         c AS (SELECT doc_id, h, i AS j,
                 strpos('0123456789abcdef', substring(h, (i // 4) + 1, 1)) - 1 AS hexd
               FROM h, generate_series(0, 63) AS g(i)),
         bits AS (SELECT doc_id, j,
                 CASE j % 4 WHEN 0 THEN (hexd >> 3) % 2
                            WHEN 1 THEN (hexd >> 2) % 2
                            WHEN 2 THEN (hexd >> 1) % 2
                            ELSE hexd % 2 END AS bit
               FROM c),
         sums AS (SELECT doc_id, j, SUM(bit * 2 - 1) AS s FROM bits GROUP BY doc_id, j),
         sig AS (SELECT doc_id,
                   string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS simhash
                 FROM sums GROUP BY doc_id),
         pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     a.simhash AS sig_a, b.simhash AS sig_b
                   FROM sig a JOIN sig b
                     ON substring(a.simhash, 1, 8) = substring(b.simhash, 1, 8)
                    AND a.doc_id < b.doc_id),
         dist AS (SELECT id_a, id_b,
                    CAST(COUNT(CASE WHEN substring(sig_a, i + 1, 1) <> substring(sig_b, i + 1, 1) THEN 1 END) AS INTEGER) AS hamming
                  FROM pairs, generate_series(0, 63) AS g(i)
                  GROUP BY id_a, id_b, sig_a, sig_b)
         SELECT id_a, id_b, hamming FROM dist WHERE hamming <= 24""",

    // Karp–Rabin polynomial hash Σ byte_j·257^(n-1-j) mod 2^61−1,
    // rebuilt relationally: a recursive-CTE powers-of-257 table (one
    // row per exponent, HUGEINT intermediates) joined per character.
    // Valid because the sf0.01 corpus is pure ASCII (byte == code
    // point); the fold-with-mod and sum-then-mod forms are equal.
    "q37_rolling_fingerprint" ->
      """WITH RECURSIVE pw(k, p) AS (
           SELECT 0, CAST(1 AS BIGINT)
           UNION ALL
           SELECT k + 1, CAST((CAST(p AS HUGEINT) * 257) % 2305843009213693951 AS BIGINT)
           FROM pw WHERE k + 1 < (SELECT max(strlen(text)) FROM documents)),
         d AS (SELECT doc_id, text, strlen(text) AS n FROM documents),
         ch AS (SELECT doc_id, text, n, unnest(generate_series(1, n)) AS j
                FROM d WHERE n > 0),
         contrib AS (SELECT c.doc_id,
             CAST(ascii(substring(c.text, CAST(c.j AS INTEGER), 1)) AS HUGEINT)
               * CAST(pw.p AS HUGEINT) AS t
           FROM ch c JOIN pw ON pw.k = c.n - c.j),
         h AS (SELECT doc_id, CAST(SUM(t) % 2305843009213693951 AS BIGINT) AS fp
               FROM contrib GROUP BY doc_id),
         fps AS (SELECT d.doc_id, CAST(COALESCE(h.fp, 0) AS BIGINT) AS fp
                 FROM d LEFT JOIN h ON h.doc_id = d.doc_id)
         SELECT fp, MIN(doc_id) AS keeper_id, COUNT(*) AS n_docs
         FROM fps GROUP BY fp""",

    "q38_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
         g AS (SELECT user_id, event_id, ts_us,
                 LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us
               FROM e),
         m AS (SELECT user_id, event_id, ts_us,
                 CASE WHEN prev_us IS NULL OR ts_us - prev_us > 30 * 60 * 1000000
                      THEN 1 ELSE 0 END AS new_session
               FROM g),
         s AS (SELECT user_id, ts_us,
                 CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
               FROM m)
         SELECT user_id, session_id, COUNT(*) AS n_events,
           CAST(MIN(ts_us) AS BIGINT) AS session_start_us,
           CAST(MAX(ts_us) AS BIGINT) AS session_end_us
         FROM s GROUP BY user_id, session_id""",

    "q39_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""",

    "q120_map_functions" ->
      """SELECT user_id,
           CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS clicks,
           CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchases,
           CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signups,
           CAST(COUNT(DISTINCT event_type) AS INTEGER) AS n_types
         FROM events GROUP BY user_id""",

    "q112_cumulative_users" ->
      """WITH f AS (SELECT user_id, MIN(strftime(ts, '%Y-%m-%d')) AS first_day
           FROM events GROUP BY user_id),
         d AS (SELECT first_day, COUNT(*) AS new_users FROM f GROUP BY first_day)
         SELECT first_day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY first_day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cumulative_users
         FROM d""",

    "q106_cooccurrence" ->
      """WITH e AS (SELECT DISTINCT user_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
           FROM events
           WHERE json_extract_string(props, '$.k') IS NOT NULL),
         p AS (SELECT a.item AS i, b.item AS j FROM e a
               JOIN e b ON a.user_id = b.user_id AND a.item < b.item),
         c AS (SELECT i, j, COUNT(*) AS n_users FROM p GROUP BY i, j),
         r AS (SELECT i, j, n_users,
                 ROW_NUMBER() OVER (ORDER BY n_users DESC, i, j) AS rk
               FROM c)
         SELECT i, j, CAST(n_users AS BIGINT) AS n_users,
                CAST(rk AS INTEGER) AS rk
         FROM r WHERE rk <= 100""",

    "q105_funnel" ->
      """WITH s AS (SELECT user_id, MIN(epoch_us(ts)) AS signup_us
           FROM events WHERE event_type = 'signup' GROUP BY user_id),
         p AS (SELECT user_id, epoch_us(ts) AS p_us
           FROM events WHERE event_type = 'purchase'),
         u AS (SELECT s.user_id, s.signup_us,
             MAX(CASE WHEN p.p_us IS NOT NULL THEN 1 ELSE 0 END) AS converted
           FROM s LEFT JOIN p
             ON s.user_id = p.user_id
            AND p.p_us >= s.signup_us
            AND p.p_us <= s.signup_us + 604800000000
           GROUP BY s.user_id, s.signup_us)
         SELECT strftime(make_timestamp(signup_us), '%Y-%m-%d') AS cohort_date,
           COUNT(*) AS n_signups,
           CAST(SUM(converted) AS BIGINT) AS n_converted
         FROM u GROUP BY 1""")
}

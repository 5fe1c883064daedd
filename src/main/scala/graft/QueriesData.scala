package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.{Corpus, RangeJoin}

/** Round-2 corpus/engine operators: duplicate clustering,
  * decontamination, quota sampling, TF-IDF, chunking, PII scrub,
  * vocabulary stats, interval join, semi/anti joins, GROUPING SETS.
  * Same exactness discipline as [[Queries]]: every computed numeric
  * that crosses the oracle boundary is integer/decimal-exact.
  */
object QueriesData {

  import Queries.table

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- duplicate clusters: LSH pairs → connected components ----
    "q52_dedup_clusters" -> ((s, dir) => {
      val d = table(s, dir, "documents").filter(col("doc_id") < 200)
      Corpus.dedupClusters(d, "doc_id", "text", shingleN = 2, bands = 4)
        .select(col("id").as("doc_id"), col("label").as("component"))
    }),

    // ---- end-to-end near-dup pruning: the filtered corpus itself ----
    "q87_neardup_prune" -> ((s, dir) => {
      val d = table(s, dir, "documents").filter(col("doc_id") < 200)
      Corpus.pruneNearDuplicates(d, "doc_id", "text", shingleN = 3, bands = 4)
        .select("doc_id", "lang", "source")
    }),

    // ---- benchmark decontamination (eval = doc_id % 50 == 0) ----
    "q53_decontaminate" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      Corpus.decontaminate(
        d.filter(col("doc_id") % 50 =!= 0),
        d.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 3)
    }),

    // ---- deterministic stratified quota sampling ----
    "q54_quota_sample" -> ((s, dir) =>
      Corpus.quotaSample(table(s, dir, "documents"),
          Seq("lang", "source"), "doc_id", quota = 5)
        .select(col("lang"), col("source"), col("doc_id"), col("rk"))),

    // ---- integer-exact TF-IDF top terms per doc ----
    "q55_tfidf" -> ((s, dir) =>
      Corpus.tfidfTopTerms(table(s, dir, "documents"), "doc_id", "text", k = 3)),

    // ---- sliding-window chunking (width 20, stride 10) ----
    "q56_chunking" -> ((s, dir) =>
      Corpus.chunk(table(s, dir, "documents"), "doc_id", "text",
        width = 20, stride = 10)),

    // ---- PII scrub over deterministically augmented text ----
    "q57_pii_scrub" -> ((s, dir) => {
      val aug = table(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" contact user"),
          col("doc_id").cast("string"),
          lit("@mail.example.com or 123-45-6789 ref 12345678")).as("aug"))
      Corpus.scrubPii(aug, "doc_id", "aug")
    }),

    // ---- corpus vocabulary: top-20 tokens ----
    "q58_word_freq" -> ((s, dir) =>
      Corpus.wordFreq(table(s, dir, "documents"), "text", k = 20)),

    // ---- inverted-index conjunctive search (AND of terms) ----
    "q91_index_search" -> ((s, dir) =>
      Corpus.searchAll(table(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "merge", "vector"))),

    // ---- triangle enumeration over the LSH candidate graph ----
    "q107_triangles" -> ((s, dir) => {
      val d = table(s, dir, "documents").filter(col("doc_id") < 200)
      val pairs = graft.operators.Dedup.lshCandidates(
        graft.operators.Dedup.minhashBands(d, "doc_id", "text",
          shingleN = 2, bands = 4), "doc_id")
      // saltFactor 8 with a low hub threshold so the skew-split wedge
      // path (hot/cold union) is the shape the oracle hash-checks
      Corpus.triangles(pairs, saltFactor = 8, hubMinDegree = 16L)
    }),

    // ---- rate-based stratified sampling (cap over-represented langs) ----
    "q102_hash_sample" -> ((s, dir) =>
      Corpus.hashStratifiedSample(table(s, dir, "documents"),
          "doc_id", "lang", Map("en" -> 30, "zh" -> 80), defaultPct = 100)
        .select("doc_id", "lang", "source")),

    // ---- hourly gap fill + forward fill over the event stream ----
    "q92_gap_fill" -> ((s, dir) =>
      graft.operators.TimeSeries.gapFillHourly(
        Queries.events(s, dir).filter(col("user_id") < 100),
        "user_id", "ts", "event_type")),

    // ---- interval (range) join via bucketed equi-join ----
    "q59_range_join" -> ((s, dir) => {
      val iv = table(s, dir, "orders").filter(col("o_orderkey") < 400)
        .select(col("o_orderkey"), col("o_orderdate"),
          expr("o_orderdate + INTERVAL '90' DAY").as("end_ts"))
      val li = table(s, dir, "lineitem").select("l_shipdate", "l_quantity")
      RangeJoin.intervalJoin(li, "l_shipdate", iv, "o_orderdate", "end_ts",
          widthMicros = 90L * 86400L * 1000000L)
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast(DecimalType(14, 2)))
            .cast("double").as("sum_qty"))
    }),

    // ---- left-semi / left-anti joins ----
    "q60_semi_anti" -> ((s, dir) => {
      val c = table(s, dir, "customer").select("c_custkey", "c_name")
      val o = table(s, dir, "orders").select("o_custkey")
      val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .withColumn("status", lit("HAS_ORDERS"))
      val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .withColumn("status", lit("NO_ORDERS"))
      semi.union(anti)
    }),

    // ---- GROUPING SETS (completes the cube/rollup family) ----
    "q61_grouping_sets" -> ((s, dir) => {
      table(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql("""SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty,
          COUNT(*) AS n,
          CAST(grouping_id() AS INT) AS gid
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""")
    }))
}

object OraclesData {
  private val toks =
    "list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')"
  private val toksLower =
    "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')"

  val all: Map[String, String] = Map(
    "q52_dedup_clusters" ->
      s"""WITH RECURSIVE d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
         t AS (SELECT doc_id, $toks AS tk FROM d),
         idx AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM t),
         sh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] AS shingle FROM idx),
         b AS (
           SELECT doc_id, 0 AS band, MIN(md5('0:' || shingle)) AS minhash FROM sh GROUP BY doc_id
           UNION ALL SELECT doc_id, 1, MIN(md5('1:' || shingle)) FROM sh GROUP BY doc_id
           UNION ALL SELECT doc_id, 2, MIN(md5('2:' || shingle)) FROM sh GROUP BY doc_id
           UNION ALL SELECT doc_id, 3, MIN(md5('3:' || shingle)) FROM sh GROUP BY doc_id),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
                  FROM b a JOIN b c ON a.band = c.band AND a.minhash = c.minhash
                  WHERE a.doc_id < c.doc_id),
         edges AS (SELECT id_a AS src, id_b AS dst FROM cand
                   UNION ALL SELECT id_b, id_a FROM cand),
         reach AS (
           SELECT doc_id AS id, doc_id AS r FROM d
           UNION
           SELECT e.dst AS id, reach.r AS r FROM reach JOIN edges e ON e.src = reach.id)
         SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id""",

    "q87_neardup_prune" ->
      s"""WITH RECURSIVE d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
         t AS (SELECT doc_id, $toks AS tk FROM d),
         idx AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) AS i FROM t),
         sh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle FROM idx),
         b AS (
           SELECT doc_id, 0 AS band, MIN(md5('0:' || shingle)) AS minhash FROM sh GROUP BY doc_id
           UNION ALL SELECT doc_id, 1, MIN(md5('1:' || shingle)) FROM sh GROUP BY doc_id
           UNION ALL SELECT doc_id, 2, MIN(md5('2:' || shingle)) FROM sh GROUP BY doc_id
           UNION ALL SELECT doc_id, 3, MIN(md5('3:' || shingle)) FROM sh GROUP BY doc_id),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
                  FROM b a JOIN b c ON a.band = c.band AND a.minhash = c.minhash
                  WHERE a.doc_id < c.doc_id),
         edges AS (SELECT id_a AS src, id_b AS dst FROM cand
                   UNION ALL SELECT id_b, id_a FROM cand),
         reach AS (
           SELECT doc_id AS id, doc_id AS r FROM d
           UNION
           SELECT e.dst AS id, reach.r AS r FROM reach JOIN edges e ON e.src = reach.id),
         comp AS (SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id)
         SELECT c.doc_id, d2.lang, d2.source
         FROM comp c JOIN documents d2 ON d2.doc_id = c.doc_id
         WHERE c.component = c.doc_id""",

    "q53_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         idx AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) AS i FROM t),
         sh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle FROM idx),
         ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
         tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 50 <> 0),
         hits AS (SELECT tr.doc_id, COUNT(*) AS n_hits
                  FROM tr JOIN ev ON tr.shingle = ev.shingle GROUP BY tr.doc_id)
         SELECT d.doc_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           COALESCE(h.n_hits, 0) > 0 AS is_contaminated
         FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
         LEFT JOIN hits h ON h.doc_id = d.doc_id""",

    "q54_quota_sample" ->
      """WITH ranked AS (
           SELECT lang, source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang, source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
           FROM documents)
         SELECT lang, source, doc_id, CAST(rk AS INTEGER) AS rk
         FROM ranked WHERE rk <= 5""",

    "q55_tfidf" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksLower) AS term FROM documents),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
         dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         n AS (SELECT COUNT(*) AS n FROM documents),
         scored AS (SELECT doc_id, tf.term, tf.tf, dfreq.df,
             (tf.tf * 1000000 * n.n) // dfreq.df AS score_x1m
           FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n),
         ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
             ORDER BY score_x1m DESC, term) AS rk FROM scored)
         SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           CAST(score_x1m AS BIGINT) AS score_x1m, CAST(rk AS INTEGER) AS rk
         FROM ranked WHERE rk <= 3""",

    "q56_chunking" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         st AS (SELECT doc_id, tk,
             unnest(generate_series(1, greatest(len(tk), 1), 10)) AS start FROM t)
         SELECT doc_id, CAST(start AS BIGINT) AS start,
           CAST((start - 1) // 10 AS BIGINT) AS chunk_idx,
           CAST(len(list_slice(tk, start, least(start + 19, len(tk)))) AS BIGINT) AS n_chunk_tokens,
           array_to_string(list_slice(tk, start, least(start + 19, len(tk))), ' ') AS chunk_text
         FROM st""",

    "q57_pii_scrub" ->
      """WITH aug AS (SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR) ||
             '@mail.example.com or 123-45-6789 ref 12345678' AS aug
         FROM documents)
         SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(aug,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g'),
             '[0-9]{7,}', '<NUM>', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(aug, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS BIGINT) AS n_ssn,
           CAST(len(regexp_extract_all(aug, '[0-9]{7,}')) AS BIGINT) AS n_num
         FROM aug""",

    "q58_word_freq" ->
      s"""WITH toks AS (SELECT unnest($toksLower) AS token FROM documents),
         c AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token),
         r AS (SELECT token, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rk FROM c)
         SELECT token, CAST(cnt AS BIGINT) AS cnt, CAST(rk AS INTEGER) AS rk
         FROM r WHERE rk <= 20""",

    "q91_index_search" ->
      s"""WITH post AS (SELECT doc_id, unnest(list_distinct($toksLower)) AS term
           FROM documents)
         SELECT doc_id FROM post
         WHERE term IN ('spark', 'merge', 'vector')
         GROUP BY doc_id HAVING COUNT(*) = 3""",

    "q107_triangles" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
         t AS (SELECT doc_id, $toks AS tk FROM d),
         idx AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM t),
         sh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] AS shingle FROM idx),
         b AS (
           SELECT doc_id, 0 AS band, MIN(md5('0:' || shingle)) AS minhash FROM sh GROUP BY doc_id
           UNION ALL SELECT doc_id, 1, MIN(md5('1:' || shingle)) FROM sh GROUP BY doc_id
           UNION ALL SELECT doc_id, 2, MIN(md5('2:' || shingle)) FROM sh GROUP BY doc_id
           UNION ALL SELECT doc_id, 3, MIN(md5('3:' || shingle)) FROM sh GROUP BY doc_id),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
                  FROM b a JOIN b c ON a.band = c.band AND a.minhash = c.minhash
                  WHERE a.doc_id < c.doc_id)
         SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
         FROM cand e1
         JOIN cand e2 ON e2.id_a = e1.id_b
         JOIN cand e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b""",

    "q102_hash_sample" ->
      """SELECT doc_id, lang, source FROM documents
         WHERE (doc_id * 2654435761) % 4294967296 % 100 <
           CASE WHEN lang = 'en' THEN 30 WHEN lang = 'zh' THEN 80 ELSE 100 END""",

    "q92_gap_fill" ->
      """WITH e AS (SELECT user_id, date_trunc('hour', ts) AS hour, event_type
           FROM events WHERE user_id < 100),
         h AS (SELECT user_id, hour, COUNT(*) AS n, MAX(event_type) AS htype
           FROM e GROUP BY 1, 2),
         b AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM h GROUP BY 1),
         s AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
           FROM b),
         j AS (SELECT s.user_id, s.hour, h.n, h.htype
           FROM s LEFT JOIN h ON s.user_id = h.user_id AND s.hour = h.hour)
         SELECT user_id, strftime(j.hour, '%Y-%m-%d %H:00') AS hour,
           CAST(COALESCE(n, 0) AS BIGINT) AS n,
           LAST_VALUE(htype IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY j.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fill_type
         FROM j""",

    "q59_range_join" ->
      """SELECT o.o_orderkey, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty
         FROM orders o JOIN lineitem l
           ON l.l_shipdate >= o.o_orderdate
          AND l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
         WHERE o.o_orderkey < 400
         GROUP BY o.o_orderkey""",

    "q60_semi_anti" ->
      """SELECT c_custkey, c_name, 'HAS_ORDERS' AS status FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         UNION ALL
         SELECT c_custkey, c_name, 'NO_ORDERS' AS status FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",

    "q61_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""")
}

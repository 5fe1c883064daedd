package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.{Dedup, TopK}

/** Round-4 additions: bitmap-exact distinct counting, trailing-window
  * anomaly flags, containment (asymmetric) text dedup, bounded top-k
  * reuse on documents, and null-safe join semantics. Same exactness
  * discipline as [[Queries]]: every computed numeric crossing the
  * oracle boundary is integer/decimal-exact.
  */
object QueriesRound4 {

  import Queries.{table, events}

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- exact distinct-users-per-day via 64-bit bitmap words: the
    //      shuffle carries one OR-combined word per (day, id-bucket) —
    //      bounded by |id-space|/64 — instead of every (day, user)
    //      pair, and bitmap OR partial-aggregates map-side. The oracle
    //      computes COUNT(DISTINCT) the classic way: two different
    //      algorithms, hash-identical answers. ----
    "q161_bitmap_distinct" -> ((s, dir) =>
      events(s, dir)
        .select(date_format(col("ts"), "yyyy-MM-dd").as("d"),
          expr("user_id div 64").as("bucket"),
          expr("shiftleft(cast(1 as bigint), cast(user_id % 64 as int))")
            .as("bit"))
        .groupBy(col("d"), col("bucket"))
        .agg(expr("bit_or(bit)").as("w"))
        .groupBy(col("d"))
        .agg(sum(bit_count(col("w"))).cast("long").as("n_users"))),

    // ---- trailing-window anomaly flags: day's revenue vs its own
    //      trailing 7-day mean, compared by integer cross-
    //      multiplication (no division → no engine rounding drift).
    //      spike ⇔ cents · 10 · n_prev > sum_prev · 15 (i.e. > 1.5×
    //      the trailing mean, only once a history exists). ----
    "q162_trailing_anomaly" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("d"))
        .agg(sum((col("value").cast(DecimalType(14, 2)) * 100)
          .cast("long")).as("cents"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
        .rowsBetween(-7, -1)
      daily
        .withColumn("sum_prev", coalesce(sum(col("cents")).over(w), lit(0L)))
        .withColumn("n_prev", count(lit(1)).over(w))
        .withColumn("spike", col("n_prev") > 0 &&
          col("cents") * 10 * col("n_prev") > col("sum_prev") * 15)
    }),

    // ---- containment dedup (asymmetric near-dup): a pair survives
    //      when the shared char-trigrams cover ≥ 70% of the SMALLER
    //      doc — catches quotes/sub-documents that symmetric Jaccard
    //      (q30) misses. Same lang-blocked candidate generation +
    //      exact term-intersection verification machinery. ----
    "q163_containment" -> ((s, dir) => {
      val d = table(s, dir, "documents").filter(col("doc_id") < 200)
      val pairs = d.select(col("lang"), col("doc_id").as("id_a"))
        .join(d.select(col("lang"), col("doc_id").as("id_b")), Seq("lang"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      val terms = Dedup.charNgramTerms(d, "doc_id", "text", 3)
      Dedup.pairJaccardTerms(terms, pairs)
        .filter(col("inter") * 100 >=
          least(col("size_a"), col("size_b")) * 70)
        .select("id_a", "id_b", "inter", "size_a", "size_b")
    }),

    // ---- bounded top-k reuse beyond ANN: longest 3 documents per
    //      language through the partial-aggregating BoundedTopK (the
    //      oracle ranks with a window — two formulations, one answer) ----
    "q164_lang_topk" -> ((s, dir) =>
      TopK.topKPerGroup(s,
        table(s, dir, "documents").select(col("lang"), col("n_chars"),
          col("doc_id")),
        "lang", "n_chars", "doc_id", k = 3)),

    // ---- null-safe equi join (<=> / IS NOT DISTINCT FROM): NULL keys
    //      match each other — the semantics gap a plain equi join
    //      silently drops. Planted: every 10th event gets a NULL key. ----
    "q165_nullsafe_join" -> ((s, dir) => {
      val keyed = events(s, dir).select(
        when(col("event_id") % 10 === 0, lit(null))
          .otherwise(col("user_id")).cast("long").as("k"),
        col("event_id"))
      val dim = keyed.select(col("k").as("dk")).distinct()
      keyed.join(dim, col("k") <=> col("dk"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_id"))
    }))
}

/** DuckDB oracles for [[QueriesRound4.all]]. */
object OraclesRound4 {
  val all: Map[String, String] = Map(
    // classic COUNT(DISTINCT) vs Spark's bitmap-word aggregation
    "q161_bitmap_distinct" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS d,
           COUNT(DISTINCT user_id) AS n_users
         FROM events GROUP BY 1""",

    "q162_trailing_anomaly" ->
      """WITH daily AS (
           SELECT event_type, strftime(ts, '%Y-%m-%d') AS d,
             CAST(SUM(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT))
               AS BIGINT) AS cents
           FROM events GROUP BY 1, 2)
         SELECT event_type, d, cents,
           CAST(COALESCE(SUM(cents) OVER w, 0) AS BIGINT) AS sum_prev,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_prev,
           (COUNT(*) OVER w > 0 AND
            cents * 10 * COUNT(*) OVER w >
              COALESCE(SUM(cents) OVER w, 0) * 15) AS spike
         FROM daily
         WINDOW w AS (PARTITION BY event_type ORDER BY d
           ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)""",

    "q163_containment" ->
      """WITH d AS (SELECT doc_id, lang,
             array_to_string(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> ''), ' ') AS s
           FROM documents WHERE doc_id < 200),
         pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                   FROM d a JOIN d b ON a.lang = b.lang
                   WHERE a.doc_id < b.doc_id),
         idx AS (SELECT doc_id, s,
                   unnest(generate_series(1, length(s) - 2)) AS i FROM d),
         sh AS (SELECT DISTINCT doc_id, substring(s, i, 3) AS term FROM idx),
         sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
         inter AS (SELECT p.id_a, p.id_b, COUNT(*) AS inter
                   FROM pairs p
                   JOIN sh ta ON ta.doc_id = p.id_a
                   JOIN sh tb ON tb.doc_id = p.id_b AND tb.term = ta.term
                   GROUP BY p.id_a, p.id_b)
         SELECT i.id_a, i.id_b, i.inter, za.sz AS size_a, zb.sz AS size_b
         FROM inter i
         JOIN sizes za ON za.doc_id = i.id_a
         JOIN sizes zb ON zb.doc_id = i.id_b
         WHERE i.inter * 100 >= LEAST(za.sz, zb.sz) * 70""",

    "q164_lang_topk" ->
      """WITH r AS (SELECT lang, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(doc_id AS BIGINT) AS doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY n_chars DESC, doc_id) AS rank
           FROM documents)
         SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id, n_chars
         FROM r WHERE rank <= 3""",

    "q165_nullsafe_join" ->
      """WITH keyed AS (SELECT CASE WHEN event_id % 10 = 0 THEN NULL
                               ELSE user_id END AS k, event_id
                        FROM events),
         dim AS (SELECT DISTINCT k FROM keyed)
         SELECT keyed.k, COUNT(*) AS n,
           CAST(SUM(keyed.event_id) AS BIGINT) AS sum_id
         FROM keyed JOIN dim ON keyed.k IS NOT DISTINCT FROM dim.k
         GROUP BY keyed.k"""
  )
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Multimodal, Similarity}
import graft.streaming.EventStream

/** Training-data pipeline queries: text analysis, dedup family,
  * similarity search, multimodal plumbing, streaming parity. Same
  * float discipline as [[Queries]] — any computed numeric that crosses
  * the oracle boundary is integer/decimal-exact.
  */
object QueriesText {

  import Queries.table

  private val langMarkers = Seq(
    "en" -> Seq("the"),
    "fr" -> Seq("le", "la"),
    "es" -> Seq("el", "los"),
    "de" -> Seq("der", "die"))

  private val stopwords = Seq("the", "a")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- token statistics per language ----
    "q22_token_stats" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      d.select(col("lang"), TextFunctions.tokenCount(col("text")).cast("long").as("nt"),
          col("n_chars"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nt")).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"),
          max(col("nt")).as("max_tokens"))
    }),

    // ---- quality scoring (integer-exact signals + gate) ----
    "q23_quality" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      val (nt, ns, ml) = TextFunctions.qualitySignals(col("text"), stopwords)
      d.select(col("doc_id"), nt.as("n_tokens"), ns.as("n_stop"),
          ml.as("mean_len_x100"))
        .withColumn("is_quality", TextFunctions.qualityGate(
          col("n_tokens"), col("n_stop"), col("mean_len_x100")))
    }),

    // ---- language ID (marker argmax, deterministic tie-break) ----
    "q24_langid" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      d.select(col("doc_id"),
        TextFunctions.langId(col("text"), langMarkers).as("lang_pred"))
    }),

    // ---- exact dedup: keeper per normalized-text hash ----
    "q25_exact_dedup" -> ((s, dir) =>
      Dedup.exactDuplicates(table(s, dir, "documents"), "doc_id", "text")),

    // ---- order-insensitive bag fingerprint ----
    "q26_bag_fingerprint" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      d.select(col("doc_id"), TextFunctions.bagFingerprint(col("text")).as("bag_fp"))
    }),

    // ---- MinHash band signatures (portable md5-min permutations) ----
    "q27_minhash_bands" -> ((s, dir) =>
      Dedup.minhashBands(table(s, dir, "documents"), "doc_id", "text",
        shingleN = 2, bands = 4)),

    // ---- LSH candidates + exact Jaccard verification ----
    "q28_lsh_jaccard" -> ((s, dir) => {
      val d = table(s, dir, "documents").filter(col("doc_id") < 200)
      Dedup.nearDuplicates(d, "doc_id", "text", shingleN = 2, bands = 4,
        thresholdNum = 2, thresholdDen = 100)
    }),

    // ---- 64-bit SimHash signatures ----
    "q29_simhash" -> ((s, dir) =>
      Dedup.simhashBits(table(s, dir, "documents").filter(col("doc_id") < 100),
        "doc_id", "text").withColumnRenamed("id", "doc_id")),

    // ---- character-trigram Jaccard on language-blocked pairs ----
    "q30_ngram_jaccard" -> ((s, dir) => {
      val d = table(s, dir, "documents").filter(col("doc_id") < 100)
      val pairs = d.select(col("lang"), col("doc_id").as("id_a"))
        .join(d.select(col("lang"), col("doc_id").as("id_b")), Seq("lang"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      val terms = Dedup.charNgramTerms(d, "doc_id", "text", 3)
      Dedup.pairJaccardTerms(terms, pairs)
        .filter(col("inter") * 100 >= (col("size_a") + col("size_b") - col("inter")) * 55)
        .select(col("id_a"), col("id_b"), col("inter"), col("size_a"), col("size_b"))
    }),

    // ---- embedding similarity: exact brute-force top-k ----
    "q31_cosine_topk" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      Similarity.bruteForceTopKExact(
        e.filter(col("vec_id") >= 5), e.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 3)
    }),

    // ---- int8-quantized ANN: coarse integer scan + exact rerank ----
    "q94_int8_ann" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      Similarity.int8TopK(
        e.filter(col("vec_id") >= 5), e.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 3, oversample = 4)
    }),

    // ---- IVF ANN: centroid assignment + probe-1 search ----
    "q32_ivf_ann" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
      val corpus = Similarity.assignCentroids(
        e.filter(col("vec_id") >= 20), centroids, "vec_id", "embedding")
      val queries = Similarity.assignCentroids(
        e.filter(col("vec_id") >= 8 && col("vec_id") < 12), centroids,
        "vec_id", "embedding")
      Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", k = 2)
    }),

    // ---- embedding cosine near-dup (exact quantized arithmetic) ----
    "q33_cosine_neardup" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      // planes/bands pinned so the DuckDB oracle replicates the exact
      // single-band 4-plane blocking; production default (planes = 0)
      // auto-scales band width to the corpus size
      Similarity.cosineNearDupesExact(e, "vec_id", "embedding",
        threshold = 0.4, planes = 4, bands = 1)
    }),

    // ---- multimodal: binary payload + partition-batched stub decode ----
    "q34_multimodal" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      val bin = Multimodal.attachBinary(d, "doc_id", "text")
      Multimodal.decodeMeta(bin, batchSize = 32).toDF()
    }),

    // ---- streaming parity: hourly agg computed by Structured Streaming ----
    "q35_stream_hourly" -> ((s, dir) =>
      EventStream.runHourlyToCompletion(s, dir)),

    // ---- streaming gap sessionization (native session_window) ----
    "q93_stream_sessions" -> ((s, dir) =>
      EventStream.runSessionsToCompletion(s, dir)),

    // ---- stream-stream interval join (watermark-bounded state) ----
    "q99_stream_join" -> ((s, dir) =>
      EventStream.runPurchaseClickJoin(s, dir)),

    // ---- higher-order array functions over embeddings (codegen'd
    //      HOFs: transform/filter/exists/forall/slice, exact outputs) ----
    "q118_hof_suite" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val head3 = transform(slice(col("embedding"), 1, 3),
        x => round(x.cast("double") * lit(10000000L)).cast("long"))
      e.select(col("vec_id"),
        size(col("embedding")).as("dim"),
        size(filter(col("embedding"), x => x > 0f)).as("n_pos"),
        exists(col("embedding"), x => x > 0.99f).as("any_hi"),
        forall(col("embedding"), x => abs(x) <= 1f).as("all_unit"),
        head3.getItem(0).as("h1"), head3.getItem(1).as("h2"),
        head3.getItem(2).as("h3"))
    }),

    // ---- foreachBatch → catalog: idempotent latest-wins upsert ----
    "q116_stream_materialize" -> ((s, dir) =>
      graft.streaming.StreamMaterialize.runLatestToCatalog(s, dir,
        graft.Scratch.dir("graft_smat"))))
}

object OraclesText {
  // shared SQL fragments
  private val toks =
    "list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')"
  private val toksLower =
    "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')"

  val all: Map[String, String] = Map(
    "q22_token_stats" ->
      s"""WITH t AS (SELECT lang, n_chars, CAST(len($toks) AS BIGINT) AS nt FROM documents)
         SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MAX(nt) AS BIGINT) AS max_tokens
         FROM t GROUP BY lang""",

    "q23_quality" ->
      s"""WITH t AS (
           SELECT doc_id, $toks AS tk FROM documents),
         sig AS (
           SELECT doc_id,
             CAST(len(tk) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(tk, x -> x = 'the')) +
                  len(list_filter(tk, x -> x = 'a')) AS BIGINT) AS n_stop,
             CAST(CASE WHEN len(tk) > 0 THEN
               (list_sum(list_transform(tk, x -> length(x))) * 100) // len(tk)
               ELSE 0 END AS BIGINT) AS mean_len_x100
           FROM t)
         SELECT doc_id, n_tokens, n_stop, mean_len_x100,
           (n_tokens >= 10 AND n_stop * 1000 >= n_tokens * 10
            AND n_stop * 1000 <= n_tokens * 600
            AND mean_len_x100 BETWEEN 150 AND 1200) AS is_quality
         FROM sig""",

    "q24_langid" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         s AS (SELECT doc_id,
           len(list_filter(tk, x -> x = 'the')) AS s_en,
           len(list_filter(tk, x -> x = 'le')) + len(list_filter(tk, x -> x = 'la')) AS s_fr,
           len(list_filter(tk, x -> x = 'el')) + len(list_filter(tk, x -> x = 'los')) AS s_es,
           len(list_filter(tk, x -> x = 'der')) + len(list_filter(tk, x -> x = 'die')) AS s_de
           FROM t)
         SELECT doc_id, CASE
           WHEN greatest(s_en, s_fr, s_es, s_de) <= 0 THEN 'und'
           WHEN s_en = greatest(s_en, s_fr, s_es, s_de) THEN 'en'
           WHEN s_fr = greatest(s_en, s_fr, s_es, s_de) THEN 'fr'
           WHEN s_es = greatest(s_en, s_fr, s_es, s_de) THEN 'es'
           WHEN s_de = greatest(s_en, s_fr, s_es, s_de) THEN 'de'
           ELSE 'und' END AS lang_pred
         FROM s""",

    "q25_exact_dedup" ->
      s"""WITH t AS (SELECT doc_id,
           md5(array_to_string($toksLower, ' ')) AS fingerprint FROM documents)
         SELECT fingerprint, MIN(doc_id) AS keeper_id, COUNT(*) AS n_docs
         FROM t GROUP BY fingerprint""",

    "q26_bag_fingerprint" ->
      s"""SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct($toksLower)), ' ')) AS bag_fp
         FROM documents""",

    "q27_minhash_bands" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         idx AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM t),
         sh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] AS shingle FROM idx),
         b AS (
           SELECT doc_id, 0 AS band, MIN(md5('0:' || shingle)) AS minhash FROM sh GROUP BY doc_id
           UNION ALL
           SELECT doc_id, 1, MIN(md5('1:' || shingle)) FROM sh GROUP BY doc_id
           UNION ALL
           SELECT doc_id, 2, MIN(md5('2:' || shingle)) FROM sh GROUP BY doc_id
           UNION ALL
           SELECT doc_id, 3, MIN(md5('3:' || shingle)) FROM sh GROUP BY doc_id)
         SELECT doc_id, band, minhash FROM b""",

    "q28_lsh_jaccard" ->
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
                  WHERE a.doc_id < c.doc_id),
         sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
         inter AS (SELECT cand.id_a, cand.id_b, COUNT(*) AS inter
                   FROM cand
                   JOIN sh sa ON sa.doc_id = cand.id_a
                   JOIN sh sb ON sb.doc_id = cand.id_b AND sb.shingle = sa.shingle
                   GROUP BY cand.id_a, cand.id_b)
         SELECT i.id_a, i.id_b, i.inter,
           za.sz AS size_a, zb.sz AS size_b
         FROM inter i
         JOIN sizes za ON za.doc_id = i.id_a
         JOIN sizes zb ON zb.doc_id = i.id_b
         WHERE i.inter * 100 >= (za.sz + zb.sz - i.inter) * 2""",

    "q29_simhash" ->
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
         sums AS (SELECT doc_id, j, SUM(bit * 2 - 1) AS s FROM bits GROUP BY doc_id, j)
         SELECT doc_id,
           string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS simhash
         FROM sums GROUP BY doc_id""",

    "q30_ngram_jaccard" ->
      """WITH d AS (SELECT doc_id, lang,
             array_to_string(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> ''), ' ') AS s
           FROM documents WHERE doc_id < 100),
         idx AS (SELECT doc_id, s, unnest(generate_series(1, length(s) - 2)) AS i FROM d),
         terms AS (SELECT DISTINCT doc_id, substring(s, i, 3) AS term FROM idx),
         pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                   FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id),
         sizes AS (SELECT doc_id, COUNT(*) AS sz FROM terms GROUP BY doc_id),
         inter AS (SELECT p.id_a, p.id_b, COUNT(*) AS inter
                   FROM pairs p
                   JOIN terms ta ON ta.doc_id = p.id_a
                   JOIN terms tb ON tb.doc_id = p.id_b AND tb.term = ta.term
                   GROUP BY p.id_a, p.id_b)
         SELECT i.id_a, i.id_b, i.inter, za.sz AS size_a, zb.sz AS size_b
         FROM inter i
         JOIN sizes za ON za.doc_id = i.id_a
         JOIN sizes zb ON zb.doc_id = i.id_b
         WHERE i.inter * 100 >= (za.sz + zb.sz - i.inter) * 55""",

    "q31_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings WHERE vec_id >= 5),
         z AS (SELECT query_id, neighbor_id, unnest(qv) AS x, unnest(cv) AS y FROM q, c),
         dots AS (SELECT query_id, neighbor_id,
                    SUM(CAST(round(CAST(x AS DOUBLE)*10000000) AS BIGINT) * CAST(round(CAST(y AS DOUBLE)*10000000) AS BIGINT)) AS dot
                  FROM z GROUP BY query_id, neighbor_id),
         ranked AS (SELECT query_id, neighbor_id, dot,
                      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rank
                    FROM dots)
         SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
                CAST(dot AS DOUBLE) / 100000000000000.0 AS dot
         FROM ranked WHERE rank <= 3""",

    "q94_int8_ann" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings WHERE vec_id >= 5),
         q8 AS (SELECT query_id, qv,
                  list_transform(qv, x -> CAST(round(CAST(x AS DOUBLE) *
                    (CASE WHEN list_max(list_transform(qv, y -> abs(CAST(y AS DOUBLE)))) > 0
                          THEN 127.0 / list_max(list_transform(qv, y -> abs(CAST(y AS DOUBLE))))
                          ELSE 0.0 END)) AS BIGINT)) AS qq
                FROM q),
         c8 AS (SELECT neighbor_id, cv,
                  list_transform(cv, x -> CAST(round(CAST(x AS DOUBLE) *
                    (CASE WHEN list_max(list_transform(cv, y -> abs(CAST(y AS DOUBLE)))) > 0
                          THEN 127.0 / list_max(list_transform(cv, y -> abs(CAST(y AS DOUBLE))))
                          ELSE 0.0 END)) AS BIGINT)) AS cq
                FROM c),
         z AS (SELECT query_id, neighbor_id, qv, cv, unnest(qq) AS x, unnest(cq) AS y
               FROM q8, c8 WHERE query_id <> neighbor_id),
         coarse AS (SELECT query_id, neighbor_id, any_value(qv) AS qv, any_value(cv) AS cv,
                      SUM(x * y) AS cdot
                    FROM z GROUP BY query_id, neighbor_id),
         cand AS (SELECT query_id, neighbor_id, qv, cv,
                    ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cdot DESC, neighbor_id) AS crank
                  FROM coarse),
         kept AS (SELECT query_id, neighbor_id, qv, cv FROM cand WHERE crank <= 12),
         zr AS (SELECT query_id, neighbor_id, unnest(qv) AS x, unnest(cv) AS y FROM kept),
         dots AS (SELECT query_id, neighbor_id,
                    SUM(CAST(round(CAST(x AS DOUBLE)*10000000) AS BIGINT) *
                        CAST(round(CAST(y AS DOUBLE)*10000000) AS BIGINT)) AS dot
                  FROM zr GROUP BY query_id, neighbor_id),
         ranked AS (SELECT query_id, neighbor_id, dot,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY dot DESC, neighbor_id) AS rank
                    FROM dots)
         SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
                CAST(dot AS DOUBLE) / 100000000000000.0 AS dot
         FROM ranked WHERE rank <= 3""",

    "q32_ivf_ann" ->
      """WITH cent AS (SELECT vec_id AS centroid_id, embedding AS ctv FROM embeddings WHERE vec_id < 8),
         corp AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 20),
         qry AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 8 AND vec_id < 12),
         corp_d AS (SELECT c.vec_id, cent.centroid_id,
                      (SELECT SUM(CAST(round(CAST(x AS DOUBLE)*10000000) AS BIGINT) * CAST(round(CAST(y AS DOUBLE)*10000000) AS BIGINT))
                       FROM (SELECT unnest(c.embedding) AS x, unnest(cent.ctv) AS y) zz) AS dot
                    FROM corp c, cent),
         corp_a AS (SELECT vec_id, centroid_id FROM
                      (SELECT vec_id, centroid_id,
                         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot DESC, centroid_id) AS rn
                       FROM corp_d) WHERE rn = 1),
         qry_d AS (SELECT q.vec_id, cent.centroid_id,
                     (SELECT SUM(CAST(round(CAST(x AS DOUBLE)*10000000) AS BIGINT) * CAST(round(CAST(y AS DOUBLE)*10000000) AS BIGINT))
                      FROM (SELECT unnest(q.embedding) AS x, unnest(cent.ctv) AS y) zz) AS dot
                   FROM qry q, cent),
         qry_a AS (SELECT vec_id, centroid_id FROM
                     (SELECT vec_id, centroid_id,
                        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot DESC, centroid_id) AS rn
                      FROM qry_d) WHERE rn = 1),
         scored AS (SELECT qa.vec_id AS query_id, ca.vec_id AS neighbor_id,
                      (SELECT SUM(CAST(round(CAST(x AS DOUBLE)*10000000) AS BIGINT) * CAST(round(CAST(y AS DOUBLE)*10000000) AS BIGINT))
                       FROM (SELECT unnest(q.embedding) AS x, unnest(c.embedding) AS y) zz) AS dot
                    FROM qry_a qa JOIN corp_a ca ON qa.centroid_id = ca.centroid_id
                    JOIN qry q ON q.vec_id = qa.vec_id
                    JOIN corp c ON c.vec_id = ca.vec_id
                    WHERE qa.vec_id <> ca.vec_id),
         ranked AS (SELECT query_id, neighbor_id, dot,
                      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rank
                    FROM scored)
         SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
                CAST(dot AS DOUBLE) / 100000000000000.0 AS dot
         FROM ranked WHERE rank <= 2""",

    // exact quantized arithmetic end-to-end: xq = round(x·1e7) as
    // BIGINT, LCG-mix plane components, integer sums; the only doubles
    // are the final ÷/×/√ on exact integers (correctly rounded IEEE ops
    // — bit-identical across engines). 64 = embedding dims.
    "q33_cosine_neardup" ->
      """WITH u AS (SELECT vec_id, unnest(embedding) AS x,
             unnest(generate_series(0, len(embedding) - 1)) AS i
           FROM embeddings),
         q AS (SELECT vec_id, i,
             CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT) AS xq FROM u),
         bits AS (SELECT vec_id, p,
             CASE WHEN SUM(xq * ((CAST(1103515245 AS BIGINT) * (p * 64 + i) + 12345) % 2001 - 1000)) > 0
               THEN '1' ELSE '0' END AS bit
           FROM q CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS p) planes
           GROUP BY vec_id, p),
         sig AS (SELECT vec_id, string_agg(bit, '' ORDER BY p) AS bucket
                 FROM bits GROUP BY vec_id),
         n2 AS (SELECT vec_id, CAST(SUM(xq * xq) AS BIGINT) AS n2q FROM q GROUP BY vec_id),
         pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                   FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         dots AS (SELECT p.id_a, p.id_b, CAST(SUM(qa.xq * qb.xq) AS BIGINT) AS dotq
                  FROM pairs p
                  JOIN q qa ON qa.vec_id = p.id_a
                  JOIN q qb ON qb.vec_id = p.id_b AND qb.i = qa.i
                  GROUP BY p.id_a, p.id_b)
         SELECT d.id_a, d.id_b,
           CAST(d.dotq AS DOUBLE) /
             (sqrt(CAST(na.n2q AS DOUBLE)) * sqrt(CAST(nb.n2q AS DOUBLE))) AS sim
         FROM dots d
         JOIN n2 na ON na.vec_id = d.id_a
         JOIN n2 nb ON nb.vec_id = d.id_b
         WHERE CAST(d.dotq AS DOUBLE) /
             (sqrt(CAST(na.n2q AS DOUBLE)) * sqrt(CAST(nb.n2q AS DOUBLE))) >= 0.4""",

    "q34_multimodal" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len,
           CAST((strlen(text) % 640) + 16 AS INTEGER) AS width,
           CAST(((strlen(text) // 640) % 480) + 16 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CASE WHEN strlen(text) % 2 = 0 THEN 'fake/rgb' ELSE 'fake/bgr' END AS format
         FROM documents""",

    "q35_stream_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour, event_type,
         COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""",

    // session_window semantics: an event at exactly prev+gap is OUTSIDE
    // [start, maxTs+gap), hence `>=` on the boundary (q38's batch window
    // pass uses `>`; the two differ only on exact-microsecond gap hits)
    "q93_stream_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
         g AS (SELECT user_id, ts_us,
                 LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us
               FROM e),
         m AS (SELECT user_id, ts_us,
                 CASE WHEN prev_us IS NULL OR ts_us - prev_us >= 30 * 60 * 1000000
                      THEN 1 ELSE 0 END AS new_session
               FROM g),
         s AS (SELECT user_id, ts_us,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                   ROWS UNBOUNDED PRECEDING) AS sid
               FROM m)
         SELECT user_id,
           CAST(MIN(ts_us) AS BIGINT) AS session_start_us,
           CAST(MAX(ts_us) AS BIGINT) AS session_end_us,
           COUNT(*) AS n_events
         FROM s GROUP BY user_id, sid""",

    "q118_hof_suite" ->
      """SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
           len(list_filter(embedding, x -> x > CAST(0.99 AS FLOAT))) > 0 AS any_hi,
           len(list_filter(embedding, x -> abs(x) > CAST(1 AS FLOAT))) = 0 AS all_unit,
           CAST(round(CAST(embedding[1] AS DOUBLE) * 10000000) AS BIGINT) AS h1,
           CAST(round(CAST(embedding[2] AS DOUBLE) * 10000000) AS BIGINT) AS h2,
           CAST(round(CAST(embedding[3] AS DOUBLE) * 10000000) AS BIGINT) AS h3
         FROM embeddings""",

    "q116_stream_materialize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
           FROM events),
         r AS (SELECT user_id, event_id, ts_us, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts_us DESC, event_id DESC) AS rn
               FROM e)
         SELECT user_id, event_id, ts_us, event_type FROM r WHERE rn = 1""",

    "q99_stream_join" ->
      """SELECT a.event_id AS purchase_id, b.event_id AS click_id,
           a.user_id,
           epoch_us(a.ts) AS purchase_us, epoch_us(b.ts) AS click_us
         FROM events a JOIN events b
           ON a.user_id = b.user_id
          AND a.event_type = 'purchase' AND b.event_type = 'click'
          AND b.ts > a.ts
          AND b.ts <= a.ts + INTERVAL 30 MINUTE""")
}

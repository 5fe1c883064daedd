package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Queries.table

/** Round-6 queries: merge-on-read catalog mechanics (deletion vectors,
  * MoR update, manifest min/max data skipping) and the remaining
  * engine-ambition items from the round-5 verdict. Same contract as
  * [[Queries]]: every entry is oracle-gated in [[OraclesRound6]].
  */
object QueriesRound6 {

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- merge-on-read DELETE lifecycle: deleteWhereDV masks rows via
    //      a (file, row_index) sidecar WITHOUT rewriting any data file
    //      (the no-rewrite fact is part of the hashed answer), the
    //      masked read equals the oracle's NOT-filter, time travel to
    //      v0 still sees every row, then compact materializes the masks
    //      (dv_cleared) and vacuum retires the masked bytes. At 100 TB
    //      this is the difference between writing O(matched rows) and
    //      rewriting 128 MB per touched file on every point-delete. ----
    "q212_deletion_vectors" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_dv")
      val cat = new graft.catalog.TableCatalog(s, work)
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val t = "D.S.DV"
      // multiple files so carried-vs-rewritten is a real distinction
      cat.overwrite(t, o.repartition(8))
      val nTotal = cat.count(t)
      val filesBefore = cat.dataFilePaths(t)
      cat.deleteWhereDV(t, col("o_custkey") % 89 === 0)
      val filesAfter = cat.dataFilePaths(t)
      val noRewrite = filesAfter == filesBefore
      val dvRows = cat.deletionVectorRows(t)
      val v0Intact = cat.readVersion(t, 0).count() == nTotal
      cat.compact(t)
      cat.vacuum(t, keepVersions = 1)
      val dvCleared = cat.deletionVectorRows(t) == 0L
      cat.read(t)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(14, 2))).cast("double")
            .as("sum_price"))
        .withColumn("no_rewrite_at_delete", lit(noRewrite))
        .withColumn("dv_rows", lit(dvRows))
        .withColumn("v0_intact", lit(v0Intact))
        .withColumn("dv_cleared", lit(dvCleared))
    }),

    // ---- merge-on-read UPDATE: updateWhereDV masks the matching rows
    //      and appends their updated copies as NEW files — delete+
    //      reinsert, cost O(matched rows). Every pre-update data file
    //      survives untouched (files_preserved) and the delta adds
    //      files (files_grew); the masked read then equals the oracle's
    //      CASE projection. A second COW update over the DV'd table
    //      exercises the read-through-masks path (no resurrection). ----
    "q213_mor_update" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_mor")
      val cat = new graft.catalog.TableCatalog(s, work)
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val t = "D.S.MOR"
      cat.overwrite(t, o.repartition(8))
      val filesBefore = cat.dataFilePaths(t)
      cat.updateWhereDV(t, Map("o_orderstatus" -> lit("X")),
        col("o_custkey") % 101 === 0)
      val filesAfter = cat.dataFilePaths(t)
      val preserved = filesBefore.toSet.subsetOf(filesAfter.toSet)
      val grew = filesAfter.size > filesBefore.size
      // COW update over the DV'd table must read THROUGH the masks:
      // rows masked by the MoR update stay invisible in the rewrite
      cat.updateWhere(t, Map("o_orderstatus" -> lit("Y")),
        col("o_custkey") % 103 === 0 && col("o_orderstatus") =!= "X")
      cat.read(t)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(14, 2))).cast("double")
            .as("sum_price"))
        .withColumn("files_preserved", lit(preserved))
        .withColumn("files_grew", lit(grew))
    }),

    // ---- manifest min/max data skipping: every commit records its
    //      files' footer [min,max] in a `_STATS` sidecar; readBetween
    //      opens ONLY the files whose range can overlap the predicate.
    //      The table is range-laid-out (8 files over o_orderkey), the
    //      probe touches ~1/10 of the key space, and the fact that the
    //      scan opened fewer files than exist is baked into the hashed
    //      `files_skipped` column. This is the read-path half of the
    //      Delta/Iceberg stats story: partition pruning for tables
    //      nobody partitioned. ----
    "q214_minmax_skipping" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_skip")
      val cat = new graft.catalog.TableCatalog(s, work)
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val t = "D.S.SKIP"
      val maxKey = o.agg(max(col("o_orderkey"))).head().getLong(0)
      cat.overwrite(t, o.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions(col("o_orderkey")))
      val nFiles = cat.dataFilePaths(t).size
      val pruned = cat.readBetween(t, "o_orderkey", 1L, maxKey / 10)
      val skipped = pruned.inputFiles.length < nFiles
      pruned
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(14, 2))).cast("double")
            .as("sum_price"))
        .withColumn("files_skipped", lit(skipped))
    }),

    // ---- REAL image decode over a binary media column: per-doc PNGs
    //      (geometry + pixels are closed-form in doc_id) round-trip
    //      through javax.imageio in partition batches; width/height/
    //      channels come from the codec's IHDR parse and pixel_sum from
    //      the decoded raster, so the oracle's closed-form recompute
    //      fails unless the bytes were ACTUALLY decoded. The plumbing
    //      is the production shape: binary column in, typed metadata
    //      out, one vectorized-decoder call per batch. ----
    "q215_image_decode" -> ((s, dir) => {
      import graft.operators.Multimodal
      val d = table(s, dir, "documents").select(col("doc_id"))
      Multimodal.decodeImage(Multimodal.attachPng(d, "doc_id"),
        batchSize = 32).toDF()
    }),

    // ---- iterated BPE training loop (k=5): the real tokenizer-
    //      training inner loop — count adjacent symbol pairs weighted
    //      by word frequency, take the argmax merge (count DESC, pair
    //      ASC tie-break), APPLY it to the vocabulary, re-count. Words
    //      are symbol sequences encoded as '(sym)(sym)…' strings, so
    //      applying a merge is one codegen'd `replace` — left-to-right
    //      non-overlapping, exactly BPE's greedy single-pass merge
    //      (both engines' replace scans identically, which is what
    //      makes the oracle exact). The iterated frame is the |vocab|-
    //      sized word table, NOT the corpus: after the initial
    //      map-side-combined word count, each of the k iterations is
    //      one tiny agg + one narrow map over |vocab| rows with a
    //      localCheckpoint lineage cut — the kmeans/PageRank driver-
    //      loop shape, corpus-size-independent. ----
    "q216_bpe_train_loop" -> ((s, dir) => {
      val k = 5
      val words = table(s, dir, "documents")
        .select(explode(
          graft.functions.TextFunctions.tokens(lower(col("text")))).as("w"))
        .filter(col("w").rlike("^[a-z0-9]+$") && length(col("w")) >= 2)
        .groupBy(col("w")).agg(count(lit(1)).as("f"))
      var vocab = words.select(
          regexp_replace(col("w"), "(.)", "($1)").as("s"), col("f"))
        .localCheckpoint(true)
      val merges = scala.collection.mutable.ArrayBuffer
        .empty[(Int, String, String, String, Long)]
      for (step <- 1 to k) {
        val top = vocab
          .select(col("f"),
            split(expr("substring(s, 2, length(s) - 2)"), "\\)\\(").as("a"))
          .filter(size(col("a")) >= 2)
          .select(col("f"), explode(expr(
            "transform(sequence(1, size(a) - 1), " +
              "i -> struct(element_at(a, i) AS x, element_at(a, i + 1) AS y))"))
            .as("p"))
          .groupBy(col("p.x").as("x"), col("p.y").as("y"))
          .agg(sum(col("f")).as("cnt"))
          .orderBy(col("cnt").desc, col("x"), col("y"))
          .limit(1).collect()(0)
        val (a, b, c) = (top.getString(0), top.getString(1), top.getLong(2))
        merges += ((step, a, b, a + b, c))
        vocab = vocab.withColumn("s",
          expr(s"replace(s, '($a)($b)', '($a$b)')")).localCheckpoint(true)
      }
      import s.implicits._
      merges.toSeq.toDF("step", "lhs", "rhs", "merged", "cnt")
    }))
}

object OraclesRound6 {

  /** q216's oracle: the same k merge iterations unrolled as CTE stages
    * (the q191/q180 unrolling convention — DuckDB's recursive CTEs
    * disallow the per-iteration aggregate this loop needs). Stage N:
    * split v(N−1)'s symbol strings, count adjacent pairs weighted by f,
    * argmax with the (cnt DESC, x, y) tie-break, apply via the same
    * left-to-right non-overlapping `replace`. */
  private def bpeOracle(k: Int): String = {
    val stages = (1 to k).map { n =>
      s"""c$n AS (SELECT a[i] AS x, a[i + 1] AS y, SUM(f) AS cnt
           FROM (SELECT f, a, unnest(generate_series(1, len(a) - 1)) AS i
                 FROM (SELECT f, string_split(
                     substring(s, 2, length(s) - 2), ')(') AS a
                   FROM v${n - 1}))
           GROUP BY 1, 2),
         m$n AS (SELECT x, y, cnt FROM c$n
                 ORDER BY cnt DESC, x, y LIMIT 1),
         v$n AS (SELECT replace(v.s, '(' || m.x || ')(' || m.y || ')',
                   '(' || m.x || m.y || ')') AS s, v.f
                 FROM v${n - 1} v, m$n m)"""
    }.mkString(",\n         ")
    val rows = (1 to k).map(n =>
      s"""SELECT CAST($n AS INTEGER) AS step, x AS lhs, y AS rhs,
            x || y AS merged, CAST(cnt AS BIGINT) AS cnt FROM m$n""")
      .mkString("\n         UNION ALL ")
    s"""WITH tok AS (SELECT unnest(list_filter(
             string_split_regex(trim(lower(text)), '\\s+'),
             x -> x <> '')) AS w
           FROM documents),
         wf AS (SELECT w, COUNT(*) AS f FROM tok
                WHERE regexp_matches(w, '^[a-z0-9]+$$')
                GROUP BY w HAVING length(w) >= 2),
         v0 AS (SELECT regexp_replace(w, '(.)', '(\\1)', 'g') AS s, f
                FROM wf),
         $stages
         $rows"""
  }

  val all: Map[String, String] = Map(

    "q216_bpe_train_loop" -> bpeOracle(5),

    // evidence literals (no_rewrite/v0_intact/dv_cleared) are the
    // in-query catalog assertions; dv_rows is recomputed from the data
    "q212_deletion_vectors" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
             AS sum_price,
           TRUE AS no_rewrite_at_delete,
           (SELECT COUNT(*) FROM orders WHERE o_custkey % 89 = 0)
             AS dv_rows,
           TRUE AS v0_intact,
           TRUE AS dv_cleared
         FROM orders WHERE NOT (o_custkey % 89 = 0)
         GROUP BY o_orderstatus""",

    "q213_mor_update" ->
      """SELECT CASE WHEN o_custkey % 101 = 0 THEN 'X'
                WHEN o_custkey % 103 = 0 THEN 'Y'
                ELSE o_orderstatus END AS o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
             AS sum_price,
           TRUE AS files_preserved,
           TRUE AS files_grew
         FROM orders
         GROUP BY 1""",

    "q214_minmax_skipping" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
             AS sum_price,
           TRUE AS files_skipped
         FROM orders
         WHERE o_orderkey BETWEEN 1
           AND (SELECT MAX(o_orderkey) // 10 FROM orders)
         GROUP BY o_orderstatus""",

    // the closed-form recompute of what the codec must recover:
    // IHDR geometry and the raster checksum
    "q215_image_decode" ->
      """WITH d AS (SELECT doc_id,
             16 + (doc_id % 5) * 8 AS w,
             12 + (doc_id % 3) * 8 AS h
           FROM documents),
         xs AS (SELECT doc_id, w, h,
             unnest(generate_series(0, w - 1)) AS x FROM d),
         xy AS (SELECT doc_id, w, h, x,
             unnest(generate_series(0, h - 1)) AS y FROM xs)
         SELECT doc_id, CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           'png' AS format,
           CAST(SUM((7 * x + 13 * y + doc_id) % 256) AS BIGINT) AS pixel_sum
         FROM xy GROUP BY doc_id, w, h""")
}

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
      val words = table(s, dir, "documents")
        .select(explode(
          graft.functions.TextFunctions.tokens(lower(col("text")))).as("w"))
        .filter(col("w").rlike("^[a-z0-9]+$") && length(col("w")) >= 2)
        .groupBy(col("w")).agg(count(lit(1)).as("f"))
      val merges = graft.operators.Bpe.trainMerges(s, words, 5)
      import s.implicits._
      merges.map(m => (m.step, m.lhs, m.rhs, m.merged, m.cnt))
        .toDF("step", "lhs", "rhs", "merged", "cnt")
    }),

    // ---- BPE APPLICATION — the other half of the tokenizer loop:
    //      encode every document with the 5 merges q216 learns
    //      (retrained here for self-containment) and report per-doc
    //      post-merge token counts. Encoding is k chained scan-local
    //      `replace`s over the exploded word stream: corpus-sized work
    //      with ZERO shuffles beyond the final per-doc count — the
    //      shape a 100 TB tokenize-the-corpus job needs. ----
    "q220_bpe_encode" -> ((s, dir) => {
      import graft.operators.Bpe
      val docWords = table(s, dir, "documents")
        .select(col("doc_id"), explode(
          graft.functions.TextFunctions.tokens(lower(col("text")))).as("w"))
        .filter(col("w").rlike("^[a-z0-9]+$") && length(col("w")) >= 2)
      val words = docWords.groupBy(col("w")).agg(count(lit(1)).as("f"))
      val merges = Bpe.trainMerges(s, words, 5)
      Bpe.applyMerges(docWords.withColumn("s", Bpe.wrap(col("w"))), "s", merges)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(Bpe.symbolCount("s")).as("n_tokens"))
    }),

    // ---- chained time-window aggregations: 5-minute tumbling pre-agg
    //      re-windowed into hours in ONE streaming query (window over
    //      the window column) — the rollup-ladder member of Spark 4's
    //      multiple-stateful-operators family beside q218's dedup→
    //      sessions. Coarse state consumes pre-reduced rows: the
    //      map-side-combine idea applied ACROSS stateful operators. ----
    "q219_stream_chained_windows" -> ((s, dir) =>
      graft.streaming.EventStream.runChainedWindows(s, dir)),

    // ---- mergeable quantile sketch: HDR-style log-bucketed histogram
    //      (exponent + top-4 mantissa bits, ≤ 6.25% rel. err) — the
    //      deterministic-MONOID member of the quantile-sketch family
    //      (KLL/t-digest contents depend on merge order; this one is
    //      bit-identical at any parallelism, so grouped percentile
    //      monitoring over 100 TB needs one pass + 960 longs per group
    //      instead of q65/q79's exact sort). The '__all' row is merged
    //      FROM the per-group sketches, and the oracle rebuilds every
    //      bucket algebraically (printf('%b') bit length) — hash-exact,
    //      no tolerance band. ----
    "q217_quantile_sketch" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_returnflag"),
          (col("l_extendedprice").cast(DecimalType(14, 2)) * 100)
            .cast("long").as("cents"))
      graft.operators.Sketches.logHistQuantiles(s, li, "l_returnflag", "cents")
    }),

    // ---- chained stateful streaming: watermarked event_id dedup AND
    //      session-window aggregation in ONE query (Spark 4 multiple-
    //      stateful-operators) — the at-least-once-bus → sessions
    //      pipeline without an intermediate sink. Fixture delivers
    //      every event twice; a regressed dedup doubles n_events in
    //      every session row (hash-visible). See
    //      EventStream.runDedupThenSessions for the two-phase
    //      watermark-flush drive. ----
    "q218_stream_dedup_sessions" -> ((s, dir) =>
      graft.streaming.EventStream.runDedupThenSessions(s, dir)),

    // ---- metadata-only COUNT(*): fastCount answers from the per-file
    //      row counts `_STATS` recorded at commit, minus DV rows
    //      counted from the sidecars' own footers — zero Spark jobs
    //      across an overwrite+append+MoR-delete chain. The scan-based
    //      count is run once here as the in-query witness (`agrees`),
    //      and the oracle recomputes the same arithmetic from the
    //      data. ----
    "q221_metadata_count" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_fc")
      val cat = new graft.catalog.TableCatalog(s, work)
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val t = "D.S.FC"
      cat.overwrite(t, o.repartition(4))
      cat.append(t, o.filter(col("o_orderkey") % 7 === 0))
      cat.deleteWhereDV(t, col("o_custkey") % 91 === 0)
      val fc = cat.fastCount(t)
      val agrees = fc.contains(cat.count(t))
      import s.implicits._
      Seq((fc.getOrElse(-1L), fc.isDefined, agrees))
        .toDF("n", "fast_path", "agrees")
    }),

    // ---- per-file bloom index: the complement of q214's min/max
    //      skipping — a point lookup on a high-cardinality UNSORTED key
    //      overlaps every file's [min,max], so stats prune nothing; the
    //      ~10-bits/row bloom sidecars answer "definitely not here" per
    //      file BEFORE planning. An 8-file chain whose name ranges all
    //      overlap, one probe, and the files-opened count (hashed via
    //      files_skipped) shows the needle-in-the-table read schedules
    //      ~1 file instead of 8. Index build is incremental: appended
    //      files get blooms in one job, already-indexed files are never
    //      rehashed. ----
    "q222_bloom_point_lookup" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_bloom")
      val cat = new graft.catalog.TableCatalog(s, work)
      val c = table(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      val t = "D.S.BLOOM"
      cat.overwrite(t, c.filter(col("c_custkey") % 4 === 0).repartition(2))
      cat.append(t, c.filter(col("c_custkey") % 4 === 1).repartition(2))
      cat.buildBloomIndex(t, "c_name") // indexes the first 4 files…
      cat.append(t, c.filter(col("c_custkey") % 4 === 2).repartition(2))
      cat.append(t, c.filter(col("c_custkey") % 4 === 3).repartition(2))
      val delta = cat.buildBloomIndex(t, "c_name") // …this call only the 4 new
      val nFiles = cat.dataFilePaths(t).size
      val probe = cat.readPoint(t, "c_name", "Customer#000000042")
      val skipped = probe.inputFiles.length < nFiles
      probe.select(col("c_custkey"), col("c_name"), col("c_nationkey"))
        .withColumn("files_skipped", lit(skipped))
        .withColumn("incremental_build", lit(delta == 4))
    }),

    // ---- incremental change data feed: readChanges diffs MANIFESTS,
    //      not snapshots — appended files are inserts, DV sidecar deltas
    //      are deletes read from just the files they address, and a COW
    //      rewrite nets out through exceptAll to exactly the touched
    //      rows. The mutation mix covers all three change sources
    //      (append, MoR delete/update, COW update); the hashed
    //      scanned_only_changed witnesses that v0's untouched bulk was
    //      never opened — the property that makes a ten-file change feed
    //      over a 100 TB table a ten-file read. Oracle: the full-
    //      snapshot EXCEPT ALL diff, which the manifest diff must equal
    //      row-for-row. ----
    "q223_incremental_cdf" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_icdf")
      val cat = new graft.catalog.TableCatalog(s, work)
      val cust = table(s, dir, "customer").select(
        col("c_custkey").as("key"), col("c_name").as("name"),
        col("c_acctbal").cast(DecimalType(14, 2)).cast("double").as("acctbal"))
      val t = "D.S.ICDF"
      // range layout so the mutations below touch a KNOWN file subset
      cat.overwrite(t, cust.filter(col("key") <= 300)
        .repartitionByRange(6, col("key")))
      val v0 = cat.version(t).get
      val v0Names = cat.dataFilePaths(t).map(_.split('/').last).toSet
      cat.append(t, cust.filter(col("key").between(301, 350)))
      cat.deleteWhereDV(t, col("key") % 10 === 0 && col("key") <= 50)
      cat.updateWhereDV(t, Map("acctbal" ->
          (col("acctbal").cast(DecimalType(14, 2)) + 100).cast("double")),
        col("key").between(101, 120))
      cat.updateWhere(t, Map("acctbal" -> lit(-1.0)), col("key") === 200)
      val changes = cat.readChanges(t, v0, cat.version(t).get)
      val readNames = changes.inputFiles.map(_.split('/').last).toSet
      val skippedOld = (v0Names -- readNames).nonEmpty
      changes.withColumn("scanned_only_changed", lit(skippedOld))
    }),

    // ---- SemDeDup semantic near-dedup (Abbas et al. 2023): k-means
    //      partitions the embedding space, cosine-τ pairs are sought
    //      only WITHIN a cluster (n²/k candidate space — the published
    //      scale trick), and any doc with a more-canonical (lower-id)
    //      τ-neighbor is flagged. Decisions are integer-exact over the
    //      same quantized longs the assignment used (τ² = 49/400 ⇒
    //      τ = 0.35), so the DuckDB rebuild — kmeans CTEs + HUGEINT
    //      pairwise dots — hash-matches bit-for-bit. ----
    "q224_semantic_dedup" -> ((s, dir) =>
      graft.operators.Corpus.semanticDedup(
        table(s, dir, "embeddings"), "vec_id", "embedding",
        k = 8, iters = 2, tauSqNum = 49, tauSqDen = 400)),

    // ---- zero-copy SHALLOW CLONE: the clone's v0 references the
    //      source's data files AND DV masks by manifest — no bytes
    //      move (zero_copy hashes the fact that every clone data path
    //      lives under the SOURCE's tree). Source and clone then
    //      diverge: a COW update on the source after the clone and a
    //      MoR delete on the clone must not see each other — the
    //      groupBy would surface any leaked 'Z' rows or resurrected
    //      deletes straight into the hash. ----
    "q225_shallow_clone" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_clone")
      val cat = new graft.catalog.TableCatalog(s, work)
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val src = "D.S.CSRC"; val dst = "D.S.CDST"
      cat.overwrite(src, o.repartition(6))
      cat.deleteWhereDV(src, col("o_custkey") % 97 === 0) // DVs clone too
      cat.cloneTable(src, dst)
      val zeroCopy = cat.dataFilePaths(dst).nonEmpty &&
        cat.dataFilePaths(dst).forall(p => !p.contains("CDST"))
      // post-clone divergence, both directions
      cat.updateWhere(src, Map("o_orderstatus" -> lit("Z")),
        col("o_custkey") % 5 === 0)
      cat.deleteWhereDV(dst, col("o_custkey") % 7 === 0)
      cat.read(dst)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(14, 2))).cast("double")
            .as("sum_price"))
        .withColumn("zero_copy", lit(zeroCopy))
    }),

    // ---- integer-exact bigram LM scoring: per-doc Σ of
    //      bitlen(c(a·)) − bitlen(c(a,b)) over adjacent token pairs —
    //      the KenLM-perplexity slot of a quality pipeline with
    //      bit-length standing in for log2 so both engines agree
    //      bit-for-bit (a float log2 would hash-drift). Two map-side-
    //      combined corpus counts + two key-joins; no broadcast of
    //      corpus-sized state. ----
    "q226_bigram_surprise" -> ((s, dir) =>
      graft.operators.TextStats.bigramSurprise(
        table(s, dir, "documents"), "doc_id", "text")),

    // ---- hard-negative mining for contrastive training: per query,
    //      the k most-similar corpus vectors with a DIFFERENT label —
    //      near the boundary yet guaranteed negative. Exact quantized
    //      dots (q31 parity) keep ranks engine-portable; bounded top-k
    //      ships k rows per query into the shuffle. At 100 TB the IVF
    //      path (q32/q200) prunes cells before this scoring. ----
    "q234_hard_negatives" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      graft.operators.Similarity.hardNegatives(
        e.filter(col("vec_id") >= 10), e.filter(col("vec_id") < 10),
        "vec_id", "embedding", "label", k = 3)
    }))
}

object OraclesRound6 {

  /** The k BPE merge iterations unrolled as CTE stages (the q191/q180
    * unrolling convention — DuckDB's recursive CTEs disallow the
    * per-iteration aggregate this loop needs). Stage N: split v(N−1)'s
    * symbol strings, count adjacent pairs weighted by f, argmax with
    * the (cnt DESC, x, y) tie-break, apply via the same left-to-right
    * non-overlapping `replace`. `dw` carries doc_id for the encode
    * oracle; `tail` selects against the trained m1..mK. */
  private def bpeOracle(k: Int, tail: String): String = {
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
    s"""WITH tok AS (SELECT doc_id, unnest(list_filter(
             string_split_regex(trim(lower(text)), '\\s+'),
             x -> x <> '')) AS w
           FROM documents),
         dw AS (SELECT doc_id, w FROM tok
                WHERE regexp_matches(w, '^[a-z0-9]+$$')
                  AND length(w) >= 2),
         wf AS (SELECT w, COUNT(*) AS f FROM dw GROUP BY w),
         v0 AS (SELECT regexp_replace(w, '(.)', '(\\1)', 'g') AS s, f
                FROM wf),
         $stages
         $tail"""
  }

  /** q216's tail: the learned merges themselves. */
  private def bpeTrainTail(k: Int): String =
    (1 to k).map(n =>
      s"""SELECT CAST($n AS INTEGER) AS step, x AS lhs, y AS rhs,
            x || y AS merged, CAST(cnt AS BIGINT) AS cnt FROM m$n""")
      .mkString("\n         UNION ALL ")

  /** q220's tail: apply m1..mK in training order to every doc word
    * (nested replaces, innermost first) and count per-doc symbols. */
  private def bpeEncodeTail(k: Int): String = {
    val wrapped = "regexp_replace(w, '(.)', '(\\1)', 'g')"
    val nested = (1 to k).foldLeft(wrapped) { (inner, n) =>
      s"""replace($inner,
             '(' || m$n.x || ')(' || m$n.y || ')',
             '(' || m$n.x || m$n.y || ')')"""
    }
    val joins = (1 to k).map(n => s"m$n").mkString(", ")
    s""", enc AS (SELECT doc_id, $nested AS s FROM dw, $joins)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(length(s) - length(replace(s, '(', ''))) AS BIGINT)
             AS n_tokens
         FROM enc GROUP BY doc_id"""
  }

  val all: Map[String, String] = Map(

    "q234_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
                    FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS cl
               FROM embeddings WHERE vec_id >= 10),
         z AS (SELECT query_id, neighbor_id, unnest(qv) AS x, unnest(cv) AS y
               FROM q, c WHERE ql <> cl),
         dots AS (SELECT query_id, neighbor_id,
                    SUM(CAST(round(CAST(x AS DOUBLE)*10000000) AS BIGINT) *
                        CAST(round(CAST(y AS DOUBLE)*10000000) AS BIGINT)) AS dot
                  FROM z GROUP BY query_id, neighbor_id),
         ranked AS (SELECT query_id, neighbor_id, dot,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY dot DESC, neighbor_id) AS rank
                    FROM dots)
         SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
                CAST(dot AS DOUBLE) / 100000000000000.0 AS dot
         FROM ranked WHERE rank <= 3""",

    "q216_bpe_train_loop" -> bpeOracle(5, bpeTrainTail(5)),

    "q220_bpe_encode" -> bpeOracle(5, bpeEncodeTail(5)),

    // batch two-level rollup: 5-min buckets then hours; hours align to
    // 5-min boundaries so date_trunc and b5 // 12 group identically
    "q219_stream_chained_windows" ->
      """WITH b AS (SELECT event_type, date_trunc('hour', ts) AS hr,
             epoch_us(ts) // 300000000 AS b5,
             COUNT(*) AS n5, SUM(CAST(value AS DECIMAL(14,2))) AS v5
           FROM events GROUP BY 1, 2, 3)
         SELECT strftime(hr, '%Y-%m-%d %H:00') AS hour, event_type,
           CAST(SUM(n5) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(v5) AS DOUBLE) AS sum_value
         FROM b GROUP BY 1, 2""",

    // algebraic rebuild of the HDR buckets: idx = exponent (bit length
    // via printf('%b')) and top-5 bits; answers are ceil-rank bucket
    // lower bounds — the same integers the Scala aggregator emits
    "q217_quantile_sketch" ->
      """WITH v AS (SELECT l_returnflag AS g,
             CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c
           FROM lineitem),
         va AS (SELECT g, c FROM v UNION ALL SELECT '__all', c FROM v),
         b AS (SELECT g,
             CASE WHEN c < 32 THEN c
               ELSE (length(printf('%b', c)) - 5) * 16
                 + (c >> (length(printf('%b', c)) - 5))
             END AS idx, COUNT(*) AS n
           FROM va GROUP BY 1, 2),
         t AS (SELECT g, SUM(n) AS w FROM b GROUP BY 1),
         cu AS (SELECT g, idx,
             SUM(n) OVER (PARTITION BY g ORDER BY idx) AS cum FROM b),
         pick AS (SELECT cu.g, q.q, MIN(cu.idx) AS idx
           FROM cu JOIN t ON t.g = cu.g
           CROSS JOIN (VALUES (50), (95), (99)) AS q(q)
           WHERE cu.cum >= (q.q * t.w + 99) // 100
           GROUP BY cu.g, q.q),
         lb AS (SELECT g, q,
             CASE WHEN idx < 32 THEN idx
               ELSE ((idx % 16) + 16) << (idx // 16 - 1) END AS lb
           FROM pick)
         SELECT t.g AS l_returnflag, CAST(t.w AS BIGINT) AS w,
           CAST(MAX(CASE WHEN q = 50 THEN lb END) AS BIGINT) AS p50_lb,
           CAST(MAX(CASE WHEN q = 95 THEN lb END) AS BIGINT) AS p95_lb,
           CAST(MAX(CASE WHEN q = 99 THEN lb END) AS BIGINT) AS p99_lb
         FROM lb JOIN t ON t.g = lb.g GROUP BY t.g, t.w""",

    "q221_metadata_count" ->
      """WITH u AS (SELECT o_custkey FROM orders
           UNION ALL
           SELECT o_custkey FROM orders WHERE o_orderkey % 7 = 0)
         SELECT CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS fast_path, TRUE AS agrees
         FROM u WHERE NOT (o_custkey % 91 = 0)""",

    // DISTINCT-then-sessionize over the same user prefix (the ×2
    // delivery collapses to the original events); session boundary
    // follows session_window semantics (>= gap ⇒ new session, q93)
    "q218_stream_dedup_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
             FROM events WHERE user_id < 50),
         g AS (SELECT user_id, ts_us,
                 LAG(ts_us) OVER (PARTITION BY user_id
                   ORDER BY ts_us, event_id) AS prev_us
               FROM e),
         m AS (SELECT user_id, ts_us,
                 CASE WHEN prev_us IS NULL
                        OR ts_us - prev_us >= 30 * 60 * 1000000
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

    // clone = source at clone time (minus its own MoR delete); the
    // source's later 'Z' rewrite must be invisible
    "q225_shallow_clone" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
             AS sum_price,
           TRUE AS zero_copy
         FROM orders
         WHERE NOT (o_custkey % 97 = 0) AND NOT (o_custkey % 7 = 0)
         GROUP BY o_orderstatus""",

    "q226_bigram_surprise" ->
      """WITH t AS (SELECT doc_id, list_filter(
             string_split_regex(trim(lower(text)), '\s+'),
             x -> x <> '') AS tk FROM documents),
         idx AS (SELECT doc_id, tk,
             unnest(generate_series(1, len(tk) - 1)) AS i FROM t),
         bg AS (SELECT doc_id, tk[i] AS a,
             tk[i] || ' ' || tk[i + 1] AS big FROM idx),
         pc AS (SELECT big, COUNT(*) AS cab FROM bg GROUP BY big),
         mc AS (SELECT a, COUNT(*) AS ca FROM bg GROUP BY a),
         s AS (SELECT doc_id,
             length(printf('%b', ca)) - length(printf('%b', cab)) AS s
           FROM bg JOIN pc USING (big) JOIN mc USING (a))
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(s) AS BIGINT) AS surprise,
           CAST(SUM(s) * 1000 // COUNT(*) AS BIGINT) AS mean_permille
         FROM s GROUP BY doc_id""",

    "q222_bloom_point_lookup" ->
      """SELECT c_custkey, c_name, c_nationkey,
           TRUE AS files_skipped, TRUE AS incremental_build
         FROM customer WHERE c_name = 'Customer#000000042'""",

    // full-snapshot EXCEPT ALL diff — the ground truth the manifest
    // diff must reproduce while reading only changed files
    "q223_incremental_cdf" ->
      """WITH base AS (SELECT c_custkey AS key, c_name AS name,
             CAST(CAST(c_acctbal AS DECIMAL(14,2)) AS DOUBLE) AS acctbal
           FROM customer),
         old AS (SELECT * FROM base WHERE key <= 300),
         grown AS (SELECT * FROM base WHERE key <= 350),
         alive AS (SELECT * FROM grown
                   WHERE NOT (key % 10 = 0 AND key <= 50)),
         new AS (SELECT key, name,
             CASE WHEN key = 200 THEN -1.0
               WHEN key BETWEEN 101 AND 120
               THEN CAST(CAST(acctbal AS DECIMAL(14,2)) + 100 AS DOUBLE)
               ELSE acctbal END AS acctbal
           FROM alive),
         i AS (SELECT * FROM new EXCEPT ALL SELECT * FROM old),
         d AS (SELECT * FROM old EXCEPT ALL SELECT * FROM new)
         SELECT key, name, acctbal, 'insert' AS _change_type,
           TRUE AS scanned_only_changed FROM i
         UNION ALL
         SELECT key, name, acctbal, 'delete' AS _change_type,
           TRUE AS scanned_only_changed FROM d""",

    // kmeans CTEs (the q71 fixed-point construction: quantized longs,
    // seed = vec_id < 8, 2 Lloyd iterations) + HUGEINT pairwise dots
    // within clusters; τ² = 49/400 compared in exact integer arithmetic
    "q224_semantic_dedup" ->
      """WITH q AS (SELECT vec_id AS vid,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS qv
           FROM embeddings),
         c0 AS (SELECT vid AS cid, qv AS cv FROM q WHERE vid < 8),
         a1 AS (SELECT vid, cid FROM (
             SELECT q.vid, c0.cid, ROW_NUMBER() OVER (PARTITION BY q.vid ORDER BY
               (SELECT SUM((x - y) * (x - y))
                FROM (SELECT unnest(q.qv) AS x, unnest(c0.cv) AS y) z) ASC, c0.cid) AS rn
             FROM q, c0) WHERE rn = 1),
         d1 AS (SELECT a1.cid, q.qv, unnest(generate_series(1, len(q.qv))) AS i
                FROM a1 JOIN q USING (vid)),
         p1 AS (SELECT cid, i,
                  CAST(floor(CAST(SUM(qv[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cval
                FROM d1 GROUP BY cid, i),
         c1 AS (SELECT cid, list(cval ORDER BY i) AS cv FROM p1 GROUP BY cid),
         a2 AS (SELECT vid, cid FROM (
             SELECT q.vid, c1.cid, ROW_NUMBER() OVER (PARTITION BY q.vid ORDER BY
               (SELECT SUM((x - y) * (x - y))
                FROM (SELECT unnest(q.qv) AS x, unnest(c1.cv) AS y) z) ASC, c1.cid) AS rn
             FROM q, c1) WHERE rn = 1),
         m AS (SELECT a2.vid, a2.cid, q.qv FROM a2 JOIN q USING (vid)),
         pr AS (SELECT b.vid AS vb,
             (SELECT SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT))
              FROM (SELECT unnest(a.qv) AS x, unnest(b.qv) AS y) z) AS dot,
             (SELECT SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
              FROM (SELECT unnest(a.qv) AS x) z) AS n2a,
             (SELECT SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT))
              FROM (SELECT unnest(b.qv) AS y) z) AS n2b
           FROM m a JOIN m b ON a.cid = b.cid AND a.vid < b.vid),
         dropped AS (SELECT DISTINCT vb FROM pr
           WHERE dot >= 0 AND 400 * dot * dot >= 49 * n2a * n2b)
         SELECT m.vid AS vec_id, m.cid AS cluster,
           (m.vid IN (SELECT vb FROM dropped)) AS is_dup
         FROM m""",

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

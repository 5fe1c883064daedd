package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-level training-data operators: duplicate clustering,
  * benchmark decontamination, stratified quota sampling, TF-IDF term
  * scoring, document chunking, PII scrubbing, and corpus vocabulary
  * statistics. Extends the per-pair dedup family in [[Dedup]] to the
  * whole-corpus decisions an LLM data pipeline actually ships:
  * "which docs form one duplicate cluster", "which docs leak the eval
  * set", "keep at most N per stratum".
  *
  * Scale posture (100 TB): every operator is explode/groupBy/join
  * shaped. The one iterative algorithm (connected components) does
  * O(diameter) distributed passes with per-pass materialization —
  * near-dup graphs are overwhelmingly tiny star/clique clusters, so
  * diameter is small and the label frontier collapses after 2-3
  * passes. Decontamination broadcasts the eval-set shingles (eval
  * benchmarks are MBs, corpora are TBs). All numeric scoring is
  * integer-exact so results are independent of partitioning and
  * accumulation order.
  */
object Corpus {

  /** Connected components by iterative min-label propagation.
    *
    * `nodes`: one column `id`; `edges`: columns `id_a`, `id_b`
    * (undirected, any orientation). Returns (id, component) where
    * component = min id reachable. Each pass is one shuffle
    * (edge join + min-agg); iteration stops when no label changes.
    * Lineage is cut per pass via `ckpt` so the plan stays O(1) deep
    * regardless of iteration count ([[CheckpointStrategy.Local]] for
    * local mode; [[CheckpointStrategy.Dfs]] on a cluster, where
    * executor loss would otherwise kill the loop).
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 25,
      ckpt: CheckpointStrategy = CheckpointStrategy.Local): DataFrame = {
    val sym = ckpt.cut(
      edges.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(edges.select(col("id_b").as("src"), col("id_a").as("dst"))))
    var labels = ckpt.cut(nodes.select(col("id"), col("id").as("label")))
    // labels only ever decrease, so Σ label is a strictly decreasing
    // convergence witness: one decimal agg per pass instead of a
    // labels⋈labels comparison join (decimal sum — no 64-bit wrap at
    // any node count)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val viaEdges = labels.join(sym, labels("id") === sym("src"))
        .select(sym("dst").as("id"), col("label"))
      val next = ckpt.cut(labels.union(viaEdges)
        .groupBy(col("id")).agg(min(col("label")).as("label")))
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      i += 1
    }
    labels
  }

  /** Duplicate clusters: LSH near-dup candidate pairs → connected
    * components. Returns (id, component) for every doc in `df`
    * (singletons map to themselves). */
  def dedupClusters(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2, bands: Int = 4): DataFrame = {
    val cand = Dedup.lshCandidates(
      Dedup.minhashBands(df, idCol, textCol, shingleN, bands), idCol)
    connectedComponents(df.select(col(idCol).as("id")), cand)
  }

  /** Benchmark decontamination: count, per training doc, the distinct
    * word `n`-gram shingles it shares with the eval corpus. The eval
    * shingle vocabulary is broadcast — eval benchmarks are tiny next
    * to a training corpus, so the scan-side join is shuffle-free.
    * Returns (doc_id, n_hits, is_contaminated) for every train doc. */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val evalTerms = Dedup.shingleTerms(eval, idCol, textCol, n)
      .select(col("term")).distinct()
    val trainTerms = Dedup.shingleTerms(train, idCol, textCol, n)
    val hits = trainTerms.join(broadcast(evalTerms), "term")
      .groupBy(col("id")).agg(count(lit(1)).as("n_hits"))
    train.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("is_contaminated"))
  }

  /** Deterministic stratified quota sampling: keep at most `quota`
    * rows per stratum, chosen by a stable hash order (md5 of the id's
    * decimal string — engine-portable, uniform, reproducible). One
    * window shuffle keyed by the strata; no driver involvement. */
  def quotaSample(df: DataFrame, strata: Seq[String], idCol: String,
      quota: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= quota)
  }

  /** Integer-exact TF-IDF: score_x1m = (tf · 1 000 000 · N) div df,
    * all 64-bit integer arithmetic (portable across engines; the 1e6
    * scale keeps rank resolution). Returns the top `k` terms per doc
    * by (score desc, term asc). Two shuffles: (doc,term) counts and
    * the per-doc window. N (corpus size) rides a broadcast scalar. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("id"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.select(count(lit(1)).as("n"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("score_x1m", expr("(tf * 1000000 * n) div df"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score_x1m").desc, col("term"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("id").as(idCol), col("term"), col("tf"), col("df"),
        col("score_x1m"), col("rk"))
  }

  /** Sliding-window document chunking: token windows of `width` with
    * stride `stride` (last chunks may be shorter; blank docs yield one
    * empty chunk). Pure per-row explode — embarrassingly parallel. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      width: Int, stride: Int): DataFrame = {
    val tk = TextFunctions.tokens(col(textCol))
    df.select(col(idCol), tk.as("tk"))
      .withColumn("start",
        explode(sequence(lit(1L), greatest(size(col("tk")).cast("long"), lit(1L)),
          lit(stride.toLong))))
      .select(col(idCol), col("start"),
        expr(s"(start - 1) div $stride").as("chunk_idx"),
        size(slice(col("tk"), col("start").cast("int"), lit(width)))
          .cast("long").as("n_chunk_tokens"),
        concat_ws(" ", slice(col("tk"), col("start").cast("int"), lit(width)))
          .as("chunk_text"))
  }

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val SsnRe = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
  private val LongNumRe = "[0-9]{7,}"

  /** PII scrubbing: redact email / SSN / long-digit-run patterns with
    * typed placeholders and report per-pattern match counts (counted
    * on the original text). Regexes stay in the Java∩RE2 common
    * subset so any engine agrees on matches. Scan-local, no shuffle. */
  def scrubPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val scrubbed = regexp_replace(
      regexp_replace(
        regexp_replace(t, EmailRe, "<EMAIL>"),
        SsnRe, "<SSN>"),
      LongNumRe, "<NUM>")
    // typed regexp_extract_all, not expr(...): SQL string literals
    // eat backslashes, which would corrupt the patterns
    df.select(col(idCol),
      scrubbed.as("scrubbed"),
      size(regexp_extract_all(t, lit(EmailRe), lit(0)))
        .cast("long").as("n_email"),
      size(regexp_extract_all(t, lit(SsnRe), lit(0)))
        .cast("long").as("n_ssn"),
      size(regexp_extract_all(t, lit(LongNumRe), lit(0)))
        .cast("long").as("n_num"))
  }

  /** End-to-end near-duplicate pruning — the corpus-dedup deliverable
    * itself: cluster near-dups ([[dedupClusters]]) and keep exactly one
    * canonical document per cluster (the min id, which IS the cluster
    * label). Singleton docs are their own cluster, so they survive.
    * One equi-join on the id against the keeper set; everything
    * upstream is the bucketed LSH machinery (never all-pairs). */
  def pruneNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2, bands: Int = 8): DataFrame = {
    val keepers = dedupClusters(df, idCol, textCol, shingleN, bands)
      .filter(col("id") === col("label"))
      .select(col("id").as(idCol))
    df.join(keepers, idCol)
  }

  /** Deterministic train/val/test split by a Knuth multiplicative hash
    * of the id: bucket = (id · 2654435761) mod 2³² mod 100 against
    * cumulative percentage thresholds. No RNG, reproducible across
    * engines and runs, and stable under corpus growth (a doc's split
    * never changes when other docs arrive — unlike randomSplit, whose
    * assignment depends on partitioning). Scan-local: zero shuffles. */
  def hashSplit(df: DataFrame, idCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"invalid split percentages: $trainPct/$valPct")
    val bucket = (col(idCol).cast("long") * lit(2654435761L)) % lit(4294967296L) % 100
    df.withColumn("bucket", bucket.cast("int"))
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
  }

  /** Deterministic rate-based stratified sampling: keep a row when its
    * Knuth-hash bucket (same arithmetic as [[hashSplit]]) falls under
    * its stratum's percentage — `sampleBy` semantics but reproducible
    * on any engine and any run (no RNG state). Scan-local: no shuffle,
    * no per-stratum pass; rates ride a broadcast map literal. Use for
    * downsampling over-represented strata (e.g. capping English at the
    * corpus-mix target) where [[quotaSample]]'s exact per-stratum count
    * (one window shuffle) isn't needed. */
  def hashStratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      ratesPct: Map[String, Int], defaultPct: Int): DataFrame = {
    require((ratesPct.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      "rates must be percentages in [0,100]")
    val bucket = (col(idCol).cast("long") * lit(2654435761L)) %
      lit(4294967296L) % 100
    val rate = ratesPct.foldLeft(lit(defaultPct)) { case (acc, (k, p)) =>
      when(col(strataCol) === k, lit(p)).otherwise(acc)
    }
    df.filter(bucket < rate)
  }

  /** Concat-and-chunk sequence packing: documents concatenate in
    * deterministic `idCol` order within each group, and a doc's bin is
    * floor(tokens-before-it / budget) — the standard pretraining
    * packing layout (documents stream into fixed-size context windows;
    * a doc may straddle two bins). One window shuffle per group key;
    * only token COUNTS flow through the window, never the text. */
  def packSequences(df: DataFrame, groupCols: Seq[String], idCol: String,
      textCol: String, budget: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(idCol))
    df.select(groupCols.map(col) :+ col(idCol) :+
        size(TextFunctions.tokens(col(textCol))).cast("long").as("n_tokens"): _*)
      .withColumn("tokens_before",
        coalesce(sum(col("n_tokens"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin", floor(col("tokens_before") / budget).cast("long"))
  }

  /** Corpus vocabulary: top `k` lowercase tokens by frequency with a
    * deterministic (count desc, token asc) order. groupBy gets
    * map-side partial aggregation for free, so the shuffle carries the
    * vocabulary, not the corpus; sort+limit plans as a distributed
    * TakeOrdered (per-partition top-k, merged), and only the k
    * survivors see the single-partition ranking window. */
  /** Triangle enumeration over an undirected edge list (id_a < id_b
    * canonical form): the standard two-join expansion — wedges (a<b<c
    * via b) closed against the edge set. Both joins shuffle on a single
    * vertex key, so cost is Σ deg² (wedge count), never |V|³; with
    * `saltFactor > 1` the wedge join is skew-split for hub middle
    * vertices (degree ≥ `hubMinDegree`) via the [[Salting]] scheme.
    * Triangle density over the near-dup candidate graph separates
    * template families (dense cliques) from chance LSH collisions
    * (isolated edges). */
  def triangles(edges: DataFrame, saltFactor: Int = 1,
      hubMinDegree: Long = 1000L): DataFrame = {
    val e1 = edges.select(col("id_a").as("a"), col("id_b").as("b"))
    val e2 = edges.select(col("id_a").as("b"), col("id_b").as("c"))
    val e3 = edges.select(col("id_a").as("a"), col("id_b").as("c"))
    val wedges =
      if (saltFactor <= 1) e1.join(e2, "b")
      else {
        // a hub middle-vertex b concentrates deg(b)² wedges on one
        // reducer. Split the wedge join: middle keys with total degree
        // ≥ hubMinDegree (a tiny, broadcastable set) are spread
        // saltFactor ways — left side salted by a stable hash of its
        // other endpoint, right side replicated — the [[Salting]]
        // scheme applied to the self-join. Cold keys join plain. The
        // union is row-identical to the unsalted join.
        val hot = broadcast(
          e1.select(col("b")).unionAll(e2.select(col("b")))
            .groupBy(col("b")).agg(count(lit(1)).as("__d"))
            .filter(col("__d") >= hubMinDegree).select("b"))
        val hotWedges = e1.join(hot, Seq("b"), "left_semi")
          .withColumn("__salt", Salting.saltColumn(saltFactor, col("a")))
          .join(e2.join(hot, Seq("b"), "left_semi")
              .withColumn("__salt",
                explode(sequence(lit(0), lit(saltFactor - 1)))),
            Seq("b", "__salt"))
          .select("a", "b", "c")
        val coldWedges = e1.join(hot, Seq("b"), "left_anti").join(e2, "b")
          .select("a", "b", "c")
        hotWedges.unionByName(coldWedges)
      }
    wedges.join(e3, Seq("a", "c")).select(col("a"), col("b"), col("c"))
  }

  /** Inverted index: one posting row per (term, doc_id) over the
    * distinct lowercase whitespace tokens of each document. Scan-local
    * (explode, no shuffle); at 100 TB materialize it through
    * [[graft.catalog.TableCatalog]] hash-partitioned on `term` so a
    * search touches only the partitions its terms hash into. */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      explode(array_distinct(
        graft.functions.TextFunctions.tokens(lower(col(textCol))))).as("term"))

  /** Conjunctive (AND) keyword search: intersect posting lists by
    * counting matched distinct terms per doc. The `term IN (...)`
    * predicate is applied in the same stage as the explode, so only
    * postings for queried terms reach the single count shuffle —
    * equivalent to an index-bucket read when the index is materialized
    * term-partitioned. */
  def searchAll(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame =
    invertedIndex(df, idCol, textCol)
      .filter(col("term").isin(terms.map(_.toLowerCase): _*))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_terms"))
      .filter(col("n_terms") === terms.size)
      .select(col(idCol))

  /** Positional phrase search: occurrences of `phrase` as ADJACENT
    * tokens, via a positional posting list — the capability
    * [[searchAll]]'s bag-of-terms conjunction cannot express (it finds
    * docs containing both "merge" and "vector" anywhere; this finds
    * "merge vector" as a bigram, with its occurrence count).
    *
    * One posexplode carries (doc, pos) postings; the `tok IN (phrase)`
    * predicate rides the same stage, so only the queried terms' rows
    * reach any shuffle — term frequency, not corpus size, bounds the
    * join input. Each subsequent phrase term joins on (doc, pos − i):
    * k−1 sparse equi joins for a k-term phrase, all hash-partitioned
    * on the same (doc, pos) key. Output: (idCol, n_phrase) for docs
    * with ≥ 1 occurrence. */
  def phraseSearch(df: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "phrase needs at least two terms")
    val terms = phrase.map(_.toLowerCase)
    val toks = df.select(col(idCol),
        posexplode(graft.functions.TextFunctions.tokens(
          lower(col(textCol)))).as(Seq("pos", "tok")))
      .filter(col("tok").isin(terms.distinct: _*))
    val anchor = toks.filter(col("tok") === terms.head)
      .select(col(idCol), col("pos"))
    val matched = terms.zipWithIndex.tail.foldLeft(anchor) {
      case (acc, (t, i)) =>
        acc.join(toks.filter(col("tok") === t)
          .select(col(idCol), (col("pos") - i).as("pos")),
          Seq(idCol, "pos"))
    }
    matched.groupBy(col(idCol)).agg(count(lit(1)).as("n_phrase"))
  }

  /** C4/RefinedWeb-style repeated-span removal: split each document
    * into consecutive non-overlapping `block`-token blocks, drop every
    * block whose normalized text occurs ≥ `maxOccurrences` times
    * corpus-wide, and rebuild the document from the kept blocks.
    *
    * Plan shape: one explode (scan-local), one map-side-combining
    * count over block keys, an anti join (the hot-block set is tiny —
    * Spark broadcasts it when stats allow), and one per-doc rebuild
    * groupBy. Nothing is quadratic; block keys — not documents — cross
    * the counting shuffle, so at 100 TB the shuffle carries the
    * distinct-span vocabulary. Output: (idCol, kept_text, n_kept,
    * n_removed). Docs whose every block is hot survive with empty text
    * (caller decides whether to drop them). */
  def dedupBlocks(df: DataFrame, idCol: String, textCol: String,
      block: Int, maxOccurrences: Long): DataFrame = {
    val base = df.select(col(idCol),
      expr(s"filter(split(trim(lower($textCol)), '\\\\s+'), x -> x != '')")
        .as("__tk"))
    // sequence(1, 0) counts DOWN in Spark — guard the empty-doc case;
    // size(NULL) is -1, so `<= 0` makes null text behave like empty
    // text (DuckDB's generate_series(1, NULL) yields no rows either)
    val blocks = base.select(col(idCol), posexplode(expr(
        s"""CASE WHEN size(__tk) <= 0 THEN array()
            ELSE transform(sequence(1, (size(__tk) + ${block - 1}) div $block),
              b -> array_join(slice(__tk, (b - 1) * $block + 1, $block), ' '))
            END""")).as(Seq("__b", "blk")))
    val hot = blocks.groupBy(col("blk"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= maxOccurrences)
      .select("blk")
    val kept = blocks.join(hot, Seq("blk"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws(" ",
          expr("transform(array_sort(collect_list(struct(__b, blk))), s -> s.blk)"))
          .as("kept_text"),
        count(lit(1)).as("n_kept"))
    val totals = blocks.groupBy(col(idCol))
      .agg(count(lit(1)).as("__n_total"))
    totals.join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("kept_text"), lit("")).as("kept_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__n_total") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** Deterministic importance (quality-weighted) downsampling: keep a
    * row with probability `weightPpmCol`/10⁶, decided by hash — no RNG
    * state, bit-reproducible across runs/retries/engines, and
    * growth-stable (a doc's fate never changes when the corpus grows).
    * The coin is the first 5 hex digits of md5(salt:id) — a uniform
    * draw in [0, 16⁵); keep iff draw·10⁶ < w·16⁵, exact in integers.
    * Scan-local: zero shuffles, composes with any downstream op. */
  def importanceSample(df: DataFrame, idCol: String,
      weightPpmCol: String, salt: String = "is"): DataFrame =
    df.filter(
      expr(s"conv(substring(md5(concat('$salt:', cast($idCol as string))), 1, 5), 16, 10)")
        .cast("long") * 1000000L <
        col(weightPpmCol).cast("long") * 1048576L)

  /** Corpus rebalancing: downsample every stratum to (approximately)
    * the size of the smallest one, deterministically. The per-stratum
    * keep rate min_n·10⁶ div n becomes the [[importanceSample]] weight,
    * so the whole rebalance is one tiny aggregate (|strata| rows,
    * broadcast back) plus a scan-local hash filter — no shuffle of the
    * data itself, reproducible under retries and growth. */
  def rebalanceStrata(df: DataFrame, idCol: String,
      strataCol: String): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val minN = counts.agg(min(col("__n"))).head().getLong(0)
    val weighted = df.join(broadcast(counts), Seq(strataCol))
      .withColumn("__w_ppm", expr(s"${minN}L * 1000000L div __n"))
    importanceSample(weighted, idCol, "__w_ppm", salt = "rb")
      .drop("__n", "__w_ppm")
  }

  def wordFreq(df: DataFrame, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val top = counts.orderBy(col("cnt").desc, col("token")).limit(k)
    top.withColumn("rk",
      row_number().over(Window.orderBy(col("cnt").desc, col("token"))))
  }

  /** Content-defined chunking: cut after every position whose trailing
    * `w`-char window hashes ≡ 0 (mod `mod`) — expected chunk length
    * `mod`, boundaries anchored to CONTENT, so an edit shifts only the
    * chunks it touches and boundary streams re-synchronize `w` chars
    * later (fixed-size chunking shifts every later chunk — useless for
    * sub-document dedup). Windows come from the native [[CharNgrams]]
    * kernel in one scan-local pass; assembly is a doc-partitioned
    * window (per-doc state, never a global sort). The md5 window hash
    * keeps results engine-portable; production can swap the O(1)
    * [[RollingHash]] kernel without changing boundaries' distribution.
    *
    * @return (id, chunk_idx ≥ 1, chunk_len) with Σ chunk_len = doc len */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      w: Int = 8, mod: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.expressions.GraftFunctions
    val base = df.select(col(idCol).as("id"),
      length(col(textCol)).cast("long").as("len"), col(textCol).as("__t"))
    val cuts = base
      .select(col("id"),
        posexplode(GraftFunctions.charNgramsNative(col("__t"), w))
          .as(Seq("pos", "gram")))
      .filter(conv(substring(md5(col("gram")), 1, 8), 16, 10)
        .cast("long") % mod === 0)
      .select(col("id"), (col("pos") + w).cast("long").as("cut"))
    val allCuts = cuts
      .unionByName(base.filter(col("len") > 0)
        .select(col("id"), col("len").as("cut")))
      .distinct()
    val win = Window.partitionBy(col("id")).orderBy(col("cut"))
    allCuts
      .withColumn("chunk_idx", row_number().over(win).cast("long"))
      .withColumn("chunk_len",
        (col("cut") - coalesce(lag(col("cut"), 1).over(win), lit(0L)))
          .cast("long"))
      .select(col("id").as(idCol), col("chunk_idx"), col("chunk_len"))
  }

  /** Cross-document repeated-span detection WITH POSITIONS — the
    * ExactSubstr flavor of span dedup: q128's block dedup drops hot
    * fixed blocks; this reports, per document, the maximal token
    * intervals covered by any `window`-token span that occurs at least
    * `minOcc` times corpus-wide, so a removal pass can surgically cut
    * exactly the repeated text (and keep one canonical occurrence if
    * it wants — the intervals carry enough to decide).
    *
    * Shape: one windowed-shingle explode (scan-local fan-out ≈ token
    * count), one map-side-combined occurrence count, one semi join
    * back, and [[Intervals.mergeIntervals]] per doc — no pairwise doc
    * comparison anywhere, so cost is O(corpus tokens), not O(docs²).
    * Output: (doc_id, island, island_start, island_end, n_windows),
    * token-indexed [start, end] inclusive. */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
      window: Int, minOcc: Long): DataFrame = {
    val sh = df
      .select(col(idCol), TextFunctions.tokens(lower(col(textCol))).as("tk"))
      .filter(size(col("tk")) >= window)
      .select(col(idCol), explode(expr(
        s"""transform(sequence(0, size(tk) - $window),
            i -> struct(i AS start,
                        array_join(slice(tk, i + 1, $window), ' ') AS win))"""))
        .as("s"))
      .select(col(idCol), col("s.start").cast("long").as("start"),
        col("s.win").as("win"))
    val hot = sh.groupBy(col("win")).agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= minOcc).select("win")
    val rep = sh.join(hot, Seq("win"), "left_semi")
      .select(col(idCol), col("start"),
        (col("start") + (window - 1)).as("end"))
    Intervals.mergeIntervals(rep, idCol, "start", "end")
      .select(col(idCol), col("island"), col("island_start"),
        col("island_end"), col("n_rows").as("n_windows"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space with k-means, then
    * within each cluster mark as duplicate any doc whose cosine
    * similarity to a LOWER-ID cluster-mate reaches τ. The clustering is
    * the published algorithm's scale trick: pairwise comparison happens
    * only inside a cluster, so the candidate space is ~n²/k instead of
    * the all-pairs corpus join, and each cluster's block is an
    * independent shuffle partition (clusters that outgrow one are
    * sub-split upstream by IVF cells / LSH bands — [[Similarity]]).
    *
    * τ arrives as a rational τ² = tauSqNum/tauSqDen so the keep/drop
    * decision is integer-exact: cos(a,b) ≥ τ ⟺ dot ≥ 0 ∧
    * den·dot² ≥ num·‖a‖²·‖b‖², evaluated over the SAME quantized longs
    * the cluster assignment used (DECIMAL(38,0) products — headroom:
    * dot ≤ dim·10¹⁴ ⇒ den·dot² ≤ ~10³⁴) — no float comparison that
    * could drift between engines or accumulation orders.
    * Returns (idCol, cluster, is_dup). */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, tauSqNum: Int, tauSqDen: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val assigned = Clustering.kmeans(df, idCol, vecCol, k, iters)
    val vecs = df.select(col(idCol).as("vid"),
      Clustering.quantize(col(vecCol)).as("qv"))
    val members = assigned.join(vecs, "vid")
    def n2(c: Column) =
      aggregate(transform(c, x => x * x), lit(0L), _ + _)
    val dot = aggregate(
      zip_with(col("a.qv"), col("b.qv"), (x, y) => x * y), lit(0L), _ + _)
    val dropped = members.as("a")
      .join(members.as("b"),
        col("a.cid") === col("b.cid") && col("a.vid") < col("b.vid"))
      .select(col("b.vid").as("vid"),
        dot.cast(DecimalType(38, 0)).as("dot"),
        n2(col("a.qv")).cast(DecimalType(38, 0)).as("n2a"),
        n2(col("b.qv")).cast(DecimalType(38, 0)).as("n2b"))
      .filter(col("dot") >= 0 &&
        lit(tauSqDen) * col("dot") * col("dot") >=
          lit(tauSqNum) * col("n2a") * col("n2b"))
      .select("vid").distinct()
    members
      .join(dropped.withColumn("dup", lit(true)), Seq("vid"), "left")
      .select(col("vid").as(idCol), col("cid").as("cluster"),
        coalesce(col("dup"), lit(false)).as("is_dup"))
  }
}

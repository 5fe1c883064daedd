package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines, built for
  * shuffle-shaped scale:
  *
  *  - exact / bag dedup: one hash-groupBy (map-side partial agg)
  *  - MinHash + LSH banding: explode → per-band min-agg → bucket join;
  *    candidate verification joins only within colliding buckets, never
  *    all-pairs
  *  - SimHash: 64-bit signature from token hashes, Hamming-style
  *    banding
  *  - n-gram Jaccard: exact verification on blocked candidate pairs
  *
  * Everything is relational (explode/groupBy/join) — at 100 TB each
  * step is one shuffle keyed by doc/band/token, no driver materialization
  * and no all-pairs blowup: complexity is Σ bucket², controlled by band
  * width.
  */
object Dedup {

  /** Last incremental-probe cache generation — released on the next
    * call so repeated invocations in one session pin at most one. */
  private val incrementalCache =
    new java.util.concurrent.atomic.AtomicReference[Seq[DataFrame]](Nil)

  /** Exact dedup: canonical keeper (min id) per normalized-text hash. */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), exactFingerprint(col(textCol)).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_docs"))

  /** Distinct survivors after exact dedup (keeps the min-id doc). */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keepers = exactDuplicates(df, idCol, textCol)
      .select(col("keeper_id").as(idCol))
    df.join(keepers, idCol)
  }

  /** MinHash signatures: for each (doc, band) the lexicographic min of
    * the seeded md5 over the doc's shingle set. Computed PER ROW by the
    * native [[graft.functions.expressions.MinHashSignature]] expression —
    * no explode, no shuffle (the earlier relational formulation shuffled
    * ~|doc|·|shingles|·bands rows through a groupBy). Returns
    * (id, band, minhash), value-identical to the relational/oracle form. */
  def minhashBands(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2, bands: Int = 8): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(df.sparkSession)
    // a small-document table often arrives as one row group → one task;
    // spread the md5-heavy signature work across the cluster first.
    // Gated on the input's partition count: a well-partitioned 100 TB
    // corpus must NOT be shuffled just to hash it — only under-split
    // inputs (fewer partitions than half the cluster) pay the spread.
    val base = df.select(col(idCol), col(textCol))
    val par = df.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (base.rdd.getNumPartitions < par / 2) base.repartition(par)
      else base
    spread.select(col(idCol),
        posexplode(graft.functions.expressions.GraftFunctions.minhashSignature(
          array_distinct(shingles(tokens(col(textCol)), shingleN)), bands))
          .as(Seq("band", "minhash")))
  }

  /** LSH candidate pairs: docs sharing any band minhash. Pairs are
    * produced per colliding bucket only (groupBy band+minhash), with
    * id_a < id_b canonical order. */
  def lshCandidates(bandsDf: DataFrame, idCol: String): DataFrame = {
    val a = bandsDf.select(col("band"), col("minhash"), col(idCol).as("id_a"))
    val b = bandsDf.select(col("band"), col("minhash"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "minhash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard between candidate pairs over a (id, term) relation:
    * |A∩B| via a term-level join restricted to the candidate pairs,
    * |A∪B| = |A|+|B|−|A∩B|. Returns id_a, id_b, inter, size_a, size_b
    * (integer-exact; thresholding is the caller's cross-multiplication). */
  def pairJaccardTerms(terms: DataFrame, pairs: DataFrame): DataFrame = {
    // terms: (id, term) DISTINCT
    val sizes = terms.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val ta = terms.select(col("id").as("id_a"), col("term"))
    val tb = terms.select(col("id").as("id_b"), col("term"))
    val inter = pairs
      .join(ta, "id_a")
      .join(tb, Seq("id_b", "term"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("size_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("size_b")), "id_b")
  }

  /** (id, term) relation of distinct word-shingles. */
  def shingleTerms(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
      explode(array_distinct(shingles(tokens(col(textCol)), n))).as("term"))

  /** (id, term) relation of distinct character n-grams. */
  def charNgramTerms(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
      explode(array_distinct(charNgrams(col(textCol), n))).as("term"))

  /** Near-duplicate pairs at jaccard ≥ num/den (exact integer
    * comparison: den·inter ≥ num·union). */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2, bands: Int = 8,
      thresholdNum: Int = 6, thresholdDen: Int = 10): DataFrame = {
    val cand = lshCandidates(minhashBands(df, idCol, textCol, shingleN, bands), idCol)
    val terms = shingleTerms(df, idCol, textCol, shingleN)
    pairJaccardTerms(terms, cand)
      .filter(col("inter") * thresholdDen >=
        (col("size_a") + col("size_b") - col("inter")) * thresholdNum)
      .select(col("id_a"), col("id_b"), col("inter"), col("size_a"), col("size_b"))
  }

  /** Incremental near-duplicate detection: probe a MATERIALIZED
    * signature index with a new batch, instead of re-signing the
    * corpus. This is the steady-state shape of a 100 TB ingest: the
    * (id, band, minhash) index and the (id, term) shingle relation are
    * written once (e.g. by [[minhashBands]]/[[shingleTerms]] into the
    * catalog, partitioned by band); each day's batch — typically 10⁻³
    * of the corpus — is signed locally, bucket-joined against the
    * index, and only colliding candidates fetch corpus shingles for
    * exact verification. Corpus-side work is proportional to
    * collisions, not corpus size.
    *
    * @param corpusIndex (id, band, minhash) — existing signatures
    * @param corpusTerms (id, term) — existing distinct shingles
    * @return (id_new, id_old, inter, size_a, size_b) pairs with
    *         jaccard ≥ num/den (id_a = new, id_b = old in the sizes) */
  def incrementalNearDupes(newDocs: DataFrame, idCol: String, textCol: String,
      corpusIndex: DataFrame, corpusTerms: DataFrame,
      shingleN: Int, bands: Int,
      thresholdNum: Int, thresholdDen: Int): DataFrame = {
    val newBands = minhashBands(newDocs, idCol, textCol, shingleN, bands)
    // cand is consumed by three downstream joins (old-terms semi join,
    // pair probe, and its own distinct-id projection); without a cache
    // every consumer re-derives the collision join from the parquet
    // index scan (9 scans observed). The pair set is collision-bounded
    // — tiny at any corpus size — so cache it, and release the PREVIOUS
    // invocation's generation: a long-lived session (the bench runs the
    // registry hundreds of times) must not accumulate pinned blocks.
    val cand = newBands
      .select(col("band"), col("minhash"), col(idCol).as("id_a"))
      .join(corpusIndex.select(col("band"), col("minhash"),
        col("id").as("id_b")), Seq("band", "minhash"))
      .select("id_a", "id_b").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    incrementalCache.getAndSet(Seq(cand)).foreach { prev =>
      try prev.unpersist(false) catch { case _: Exception => () }
    }
    // fetch corpus shingles ONLY for colliding ids — the semi join is
    // what keeps corpus-side cost ∝ collisions at 100 TB
    val oldTerms = corpusTerms.join(
      cand.select(col("id_b").as("id")).distinct(), Seq("id"), "left_semi")
    val terms = shingleTerms(newDocs, idCol, textCol, shingleN)
      .unionByName(oldTerms)
    pairJaccardTerms(terms, cand)
      .filter(col("inter") * thresholdDen >=
        (col("size_a") + col("size_b") - col("inter")) * thresholdNum)
      .select(col("id_a").as("id_new"), col("id_b").as("id_old"),
        col("inter"), col("size_a"), col("size_b"))
  }

  /** 64-bit SimHash signature as a 64-char '0'/'1' string: bit j is the
    * sign of the sum over distinct tokens of (bit j of md5(token))·2−1.
    * Engine-portable: the bit source is hex-digit arithmetic on md5, the
    * aggregation an integer sum. */
  def simhashBits(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(array_distinct(tokens(lower(col(textCol))))).as("tok"))
      .withColumn("h", md5(col("tok").cast("binary")))
    val contrib = toks
      .select(col("id"), col("h"), explode(sequence(lit(0), lit(63))).as("j"))
      // hex digit j/4 of the md5, bit (3 - j%4) of that digit
      .withColumn("hexd", conv(substring(col("h"),
        (col("j").cast("int") / lit(4)).cast("int") + 1, lit(1)), 16, 10).cast("int"))
      .withColumn("bit",
        when(col("j") % 4 === 0, shiftright(col("hexd"), 3) % 2)
          .when(col("j") % 4 === 1, shiftright(col("hexd"), 2) % 2)
          .when(col("j") % 4 === 2, shiftright(col("hexd"), 1) % 2)
          .otherwise(col("hexd") % 2))
      .withColumn("delta", col("bit") * 2 - 1)
    val sums = contrib.groupBy(col("id"), col("j"))
      .agg(sum(col("delta")).as("s"))
      .withColumn("sigbit", when(col("s") > 0, lit("1")).otherwise(lit("0")))
    sums.groupBy(col("id"))
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("j"), col("sigbit")))),
        x => x.getField("sigbit"))).as("simhash"))
  }
}

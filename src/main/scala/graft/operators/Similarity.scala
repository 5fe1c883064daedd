package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two arithmetic modes:
  *  - FAST (production): double-precision `zip_with` + `aggregate`
  *    dot products — fully codegen'd, one pass, what you'd run on
  *    100 TB.
  *  - EXACT (oracle parity / tests): the same math in decimal so the
  *    result is bit-identical across engines and independent of
  *    accumulation order.
  *
  * Scale paths:
  *  - brute-force top-k is a broadcast of the (small) query set against
  *    the corpus — one scan, no shuffle of the corpus;
  *  - IVF: corpus pre-partitioned by nearest-centroid; queries probe
  *    only their centroid's partition — the 1/K search-cost reduction
  *    that matters when the corpus side is 10^9 vectors.
  */
object Similarity {

  import graft.functions.expressions.GraftFunctions

  /** Double-precision cosine similarity of two float arrays (native
    * dot-product kernel; left-to-right sums). Products are computed in
    * double — for float inputs this differs in the last ulp from a
    * zip_with float·float formulation; threshold-exact comparisons
    * should use the quantized-integer path below instead. */
  def cosine(a: Column, b: Column): Column = {
    val dot = GraftFunctions.arrayDot(a, b)
    val na = sqrt(GraftFunctions.arrayDot(a, a))
    val nb = sqrt(GraftFunctions.arrayDot(b, b))
    dot / (na * nb)
  }

  /** Exact quantized dot product (engine-portable, order-independent):
    * components round to integers at 1e-7 resolution (float32
    * precision), products and sums are 64-bit integer arithmetic —
    * exact in any engine, any accumulation order. Result is scaled by
    * 1e14; descale with [[descaleDot]]. Decimal-from-float casts are
    * deliberately avoided: engines disagree on that rounding path.
    * Native kernel ([[graft.functions.expressions.ArrayQuantDot]]) with
    * Spark-identical HALF_UP rounding. */
  def dotExact(a: Column, b: Column): Column =
    GraftFunctions.arrayQuantDot(a, b)

  def descaleDot(scaled: Column): Column =
    (scaled.cast("double") / 1e14)

  private def noVec: Column = lit(null).cast("array<float>")

  /** Brute-force top-k by cosine: broadcast the query set, then a
    * bounded top-k aggregator ([[TopK.BoundedTopKVec]]) ranks per query
    * with deterministic (sim desc, id) tie-break. The aggregator's
    * partial/final split means each map task ships at most k rows per
    * query into the shuffle — the `row_number` window formulation would
    * shuffle the entire scored corpus to one reducer per query. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    TopK.topKPerQuery(scored, lit(0L), col("sim"), col("neighbor_id"),
        noVec, k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("ordD").as("sim"))
  }

  /** Exact-arithmetic top-k by dot product (oracle-parity variant);
    * same bounded-top-k shuffle shape as [[bruteForceTopK]]. */
  def bruteForceTopKExact(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", dotExact(col("qv"), col("cv")))
    TopK.topKPerQuery(scored, col("dot"), lit(0.0), col("neighbor_id"),
        noVec, k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        descaleDot(col("ordL")).as("dot"))
  }

  /** Hard-negative mining for contrastive training: per query, the k
    * MOST similar corpus vectors carrying a DIFFERENT label — close to
    * the decision boundary (high dot) yet guaranteed negative (label
    * mismatch), the pairs a contrastive loss learns most from. Exact
    * quantized arithmetic ([[bruteForceTopKExact]] parity) so ranks are
    * engine-portable; same bounded top-k shuffle (k rows per query
    * cross the exchange, never the scored corpus). At 100 TB compose
    * with the IVF path (assignCentroids + probes prune cells before
    * scoring) — the label filter rides the scored join either way. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), col(labelCol).as("q_label")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      col(labelCol).as("n_label"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id") &&
        col("q_label") =!= col("n_label"))
      .withColumn("dot", dotExact(col("qv"), col("cv")))
    TopK.topKPerQuery(scored, col("dot"), lit(0.0), col("neighbor_id"),
        noVec, k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        descaleDot(col("ordL")).as("dot"))
  }

  /** Per-dimension calibration table for asymmetric quantization /
    * feature scaling: (dim, lo_q, hi_q, n) where lo/hi are the corpus
    * min/max of each embedding dimension, 1e-7-quantized to longs
    * (HALF_UP — engine-portable). One explode (scan-local, fan-out =
    * dim count) and one map-side-combining groupBy over `dims` keys:
    * the shuffle carries |dims|·|partitions| rows, not the corpus.
    * The resulting |dims|-row table broadcasts back for quantization. */
  def dimCalibration(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("dim", "__x")))
      .select(col("dim").cast("long").as("dim"),
        round(col("__x") * 1e7).cast("long").as("__q"))
      .groupBy(col("dim"))
      .agg(min(col("__q")).as("lo_q"), max(col("__q")).as("hi_q"),
        count(lit(1)).as("n"))

  /** Int8 scalar quantization with per-vector scale 127/max|x|: the
    * memory-bandwidth scale path for ANN — 4× smaller vectors (8× vs
    * double), integer dot products. Rounding is HALF_UP away from zero
    * (Spark `round`, identical in DuckDB), so the quantized codes are
    * engine-portable. Zero vectors quantize to all-zeros. */
  def quantizeInt8(vec: Column): Column = {
    val v = vec.cast("array<double>")
    val mx = array_max(transform(v, x => abs(x)))
    val s = when(mx > 0, lit(127.0) / mx).otherwise(lit(0.0))
    transform(v, x => round(x * s).cast("long"))
  }

  /** Quantized ANN: coarse int8 integer-dot scan keeps the top
    * k·oversample candidates per query, then the exact (1e-7-quantized)
    * dot reranks the survivors to the final top-k. At 10^9 vectors the
    * coarse pass streams 1/4 the bytes of a float scan and the exact
    * pass touches only k·oversample rows per query — the standard
    * SQ8-then-rerank shape. Fully deterministic (integer scores, id
    * tie-breaks), so exact-oracle-checkable end to end. */
  def int8TopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, oversample: Int = 4): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), quantizeInt8(col(vecCol)).as("q8")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), quantizeInt8(col(vecCol)).as("c8"))
    // native codegen'd kernel — the interpreted HOF formulation
    // (aggregate∘zip_with) costs ~µs/row on this all-pairs hot path
    val coarse = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cdot", graft.functions.expressions.GraftFunctions
        .longArrayDot(col("q8"), col("c8")))
    // bounded top-(k·oversample) with the candidate vector as payload:
    // the shuffle after the all-pairs scan carries k·oversample rows per
    // query, and the rerank needs no second corpus scan
    val cand = TopK.topKPerQuery(coarse, col("cdot"), lit(0.0),
      col("neighbor_id"), col("cv"), k * oversample)
    val qv = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")))
    val rerank = cand.join(qv, "query_id")
      .withColumn("dot", dotExact(col("qv"), col("vec")))
    TopK.topKPerQuery(rerank, col("dot"), lit(0.0), col("neighbor_id"),
        noVec, k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        descaleDot(col("ordL")).as("dot"))
  }

  /** Assign each vector to its nearest centroid by exact dot (IVF cell
    * assignment). Centroids must be small (broadcast). */
  def assignCentroids(corpus: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String, centroidIdCol: String = "centroid_id"): DataFrame = {
    val cts = broadcast(centroids.select(
      col(idCol).as(centroidIdCol), col(vecCol).as("ctv")))
    val scored = corpus.select(col(idCol), col(vecCol))
      .crossJoin(cts)
      .withColumn("dot", dotExact(col(vecCol), col("ctv")))
    // argmax via max(struct): (dot desc, centroid asc) — negating the
    // centroid id makes the struct max pick the smallest id on dot
    // ties, matching a (dot DESC, centroid_id ASC) rank. All K centroid
    // rows for a corpus row are map-local (broadcast cross join), so
    // partial aggregation collapses to one row per vector pre-shuffle —
    // the window formulation would shuffle all |corpus|·K scored rows.
    scored
      .groupBy(col(idCol))
      .agg(max(struct(col("dot"), (-col(centroidIdCol)).as("negc"),
        col(vecCol).as("v"))).as("best"))
      .select(col(idCol), col("best.v").as(vecCol),
        (-col("best.negc")).as(centroidIdCol))
  }

  /** Multi-probe centroid assignment for the QUERY side: each query
    * emits its `probes` nearest centroids (one row per probe), so the
    * downstream cell join searches that many cells. The q185 recall
    * harness is the sizing loop: probe-1 recall too low → raise
    * probes, paying probes/K of the corpus per query instead of 1/K.
    * All K centroid scores for a query are map-local (broadcast cross
    * join) and collapse to `probes` rows before any shuffle. */
  def assignCentroidsProbes(queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, probes: Int,
      centroidIdCol: String = "centroid_id"): DataFrame = {
    val cts = broadcast(centroids.select(
      col(idCol).as(centroidIdCol), col(vecCol).as("ctv")))
    queries.select(col(idCol), col(vecCol))
      .crossJoin(cts)
      .withColumn("dot", dotExact(col(vecCol), col("ctv")))
      .groupBy(col(idCol))
      // (dot desc, centroid asc) order via struct sort on (dot, -cid)
      .agg(slice(reverse(array_sort(collect_list(
          struct(col("dot"), (-col(centroidIdCol)).as("negc"))))),
          1, probes).as("top"),
        first(col(vecCol)).as(vecCol))
      .select(col(idCol), col(vecCol),
        explode(col("top")).as("probe"))
      .select(col(idCol), col(vecCol),
        (-col("probe.negc")).as(centroidIdCol))
  }

  /** IVF search, probe=1: rank only within the query's own cell. At
    * scale the corpus is written partitioned by centroid_id so a probe
    * reads 1/K of the data (partition pruning). */
  def ivfTopK(assignedCorpus: DataFrame, assignedQueries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroidIdCol: String = "centroid_id"): DataFrame = {
    val q = assignedQueries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), col(centroidIdCol))
    val c = assignedCorpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), col(centroidIdCol))
    val scored = q.join(c, Seq(centroidIdCol))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", dotExact(col("qv"), col("cv")))
    TopK.topKPerQuery(scored, col("dot"), lit(0.0), col("neighbor_id"),
        noVec, k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        descaleDot(col("ordL")).as("dot"))
  }

  /** Exact quantized squared L2 distance between two float arrays:
    * Σ (aq−bq)² over 1e-7-quantized integer components, expanded as
    * qd(a,a) − 2·qd(a,b) + qd(b,b) so it reuses the [[dotExact]]
    * kernel — exact 64-bit integers, engine-portable. */
  def l2Exact(a: Column, b: Column): Column =
    dotExact(a, a) - lit(2L) * dotExact(a, b) + dotExact(b, b)

  /** Product-quantization ANN with asymmetric distance computation
    * (ADC) — the memory-compression scale path: each corpus vector is
    * stored as `m` small codes (one per contiguous subspace of
    * `subDim` dims) instead of `m·subDim` floats, a ~32× shrink at
    * byte codes. Search never touches corpus floats: per query a tiny
    * m×numCodes distance table is precomputed against the codebook,
    * and each corpus row is scored by `m` integer array lookups.
    *
    * Scale shape: encoding is one broadcast join over the corpus
    * (O(n·m·numCodes) subspace distances, map-local); scoring is a
    * broadcast of the per-query tables against the packed codes — one
    * corpus pass, no shuffle of the corpus, and the bounded top-k
    * aggregator ships k rows per query into the final shuffle. All
    * arithmetic is exact quantized integers ([[l2Exact]]), so the
    * result is oracle-checkable end to end.
    *
    * The codebook is supplied (same given-centroids protocol as
    * [[assignCentroids]]); its `idCol` values must be the dense code
    * ids 0..numCodes−1 — they index the ADC table. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String, m: Int, subDim: Int, numCodes: Int,
      k: Int): DataFrame = {
    val cbs = pqSubvecs(codebook, idCol, vecCol, m, subDim)
    val codesArr = pqCodes(corpus, cbs, idCol, vecCol, m, subDim)
    val dtab = pqDistTables(queries, cbs, idCol, vecCol, m, subDim)
    // ADC scoring: m integer lookups per corpus row, zero float math
    val scored = codesArr.crossJoin(broadcast(dtab))
      .withColumn("adc_d2", adcLookup(m, numCodes))
    TopK.topKPerQuery(scored.withColumn("neg", -col("adc_d2")),
        col("neg"), lit(0.0), col("neighbor_id"), noVec, k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        (-col("ordL")).as("adc_d2"))
  }

  /** IVF-PQ: the two ANN scale mechanisms composed the way a
    * production vector index runs them — the coarse quantizer (IVF
    * cell assignment, [[assignCentroids]]) prunes the CANDIDATE SET to
    * the query's cell (1/K of the corpus per probe), and product
    * quantization compresses the SCORING inside the cell (m code
    * lookups per candidate, no corpus floats). Inputs are
    * pre-assigned corpus/queries (so multi-probe query assignment via
    * [[assignCentroidsProbes]] composes directly); the codebook here
    * encodes raw vectors — a production IVF-PQ encodes residuals
    * (x − centroid), same pipeline shape with a subtraction folded
    * into the encode/table steps. */
  def ivfPqTopK(assignedCorpus: DataFrame, assignedQueries: DataFrame,
      codebook: DataFrame, idCol: String, vecCol: String, m: Int,
      subDim: Int, numCodes: Int, k: Int,
      centroidIdCol: String = "centroid_id"): DataFrame = {
    val cbs = pqSubvecs(codebook, idCol, vecCol, m, subDim)
    val codesArr = pqCodes(assignedCorpus, cbs, idCol, vecCol, m, subDim)
      .join(assignedCorpus.select(col(idCol).cast("long").as("neighbor_id"),
        col(centroidIdCol)), "neighbor_id")
    val dtab = pqDistTables(assignedQueries, cbs, idCol, vecCol, m, subDim)
      .join(assignedQueries.select(col(idCol).cast("long").as("query_id"),
        col(centroidIdCol)), "query_id")
    // cell-restricted ADC: only same-cell (query, candidate) pairs form
    val scored = codesArr.join(broadcast(dtab), Seq(centroidIdCol))
      .withColumn("adc_d2", adcLookup(m, numCodes))
    TopK.topKPerQuery(scored.withColumn("neg", -col("adc_d2")),
        col("neg"), lit(0.0), col("neighbor_id"), noVec, k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        (-col("ordL")).as("adc_d2"))
  }

  /** Codebook subvectors: (code_id, sub, cbsub) — m·numCodes rows. */
  private def pqSubvecs(codebook: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int): DataFrame =
    codebook.select(col(idCol).cast("long").as("code_id"),
        col(vecCol).as("cbv"))
      .withColumn("sub", explode(sequence(lit(0), lit(m - 1))))
      .withColumn("cbsub", slice(col("cbv"), col("sub") * subDim + 1,
        lit(subDim)))
      .select("code_id", "sub", "cbsub")

  /** PQ encode: nearest codeword per (vector, subspace) — min-(d2,
    * code) argmin via struct min, map-local after the broadcast join so
    * partial aggregation collapses to one row per (vector, sub) — then
    * the m codes packed into one array per vector (ordered by sub).
    * The packed array IS the compressed index a production run would
    * persist: (neighbor_id, codes). */
  private def pqCodes(corpus: DataFrame, cbs: DataFrame, idCol: String,
      vecCol: String, m: Int, subDim: Int): DataFrame =
    corpus.select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).as("cv"))
      .withColumn("sub", explode(sequence(lit(0), lit(m - 1))))
      .withColumn("vsub", slice(col("cv"), col("sub") * subDim + 1,
        lit(subDim)))
      .join(broadcast(cbs), Seq("sub"))
      .withColumn("d2", l2Exact(col("vsub"), col("cbsub")))
      .groupBy(col("neighbor_id"), col("sub"))
      .agg(min(struct(col("d2"), col("code_id"))).as("best"))
      .select(col("neighbor_id"), col("sub"), col("best.code_id").as("code"))
      .groupBy(col("neighbor_id"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
        e => e.getField("code")).as("codes"))

  /** Per-query ADC distance tables, flattened ordered by (sub,
    * code_id) so entry [sub·numCodes + code] is that subspace's
    * distance: (query_id, dtab). */
  private def pqDistTables(queries: DataFrame, cbs: DataFrame, idCol: String,
      vecCol: String, m: Int, subDim: Int): DataFrame =
    queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).as("qv"))
      .withColumn("sub", explode(sequence(lit(0), lit(m - 1))))
      .withColumn("qsub", slice(col("qv"), col("sub") * subDim + 1,
        lit(subDim)))
      .join(broadcast(cbs), Seq("sub"))
      .withColumn("d2", l2Exact(col("qsub"), col("cbsub")))
      .groupBy(col("query_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code_id"), col("d2")))),
        e => e.getField("d2")).as("dtab"))

  /** Σ over subspaces of the query's table entry for the candidate's
    * code — the ADC inner loop, exact 64-bit integers. */
  private def adcLookup(m: Int, numCodes: Int): Column = expr(
    s"aggregate(sequence(0, ${m - 1}), cast(0 as bigint), " +
      s"(acc, sb) -> acc + dtab[cast(sb * $numCodes + codes[sb] as int)])")

  /** Band width (bits per LSH band) scaled to the corpus size: bucket
    * count per band is 2^width, so width grows with log2(n) and the
    * expected bucket occupancy — the Σ bucket² pair cost — stays
    * bounded as the corpus grows. Floor 8 (tiny corpora), cap 16
    * (4 bands × 16 fit the 64-plane signature). */
  def autoBandWidth(n: Long): Int = {
    val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(math.max(n, 1L))
    math.min(16, math.max(8, bitlen - 4))
  }

  /** planes per call: explicit `planes` wins (must divide into bands);
    * `planes = 0` scales band width to the corpus via [[autoBandWidth]]
    * (one count job — cheap, parquet row-count metadata). */
  private def resolvePlanes(df: DataFrame, planes: Int, bands: Int): Int = {
    require(bands >= 1 && bands <= 64, s"bands must be in [1,64], got $bands")
    val p = if (planes > 0) planes
      else bands * math.min(autoBandWidth(df.count()), 64 / bands)
    require(p % bands == 0, s"planes ($p) must be a multiple of bands ($bands)")
    require(p <= 64, s"planes must fit the 64-plane signature, got $p")
    p
  }

  /** Banded LSH candidate pairs: the `planes`-bit sign signature splits
    * into `bands` sub-signatures; a pair is a candidate when it shares
    * ANY band's bucket (the MinHash-LSH composition). Only ids ride the
    * ×bands explode — vectors join back per-candidate, so the shuffle
    * carries the corpus once per side, not once per band. */
  private def bandedCandidates(withSig: DataFrame, idCol: String,
      width: Int, bands: Int): DataFrame = {
    val keyed = withSig.select(col(idCol), posexplode(array(
        (0 until bands).map(b => substring(col("sig"), b * width + 1, width)): _*))
      .as(Seq("band", "bucket")))
    val a = keyed.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val b = keyed.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold,
    * LSH-blocked by sign-signature over `planes` pseudo-random
    * hyperplanes (deterministic: plane p component i derives from
    * md5-free integer mixing so both engines can reproduce it), split
    * into `bands` sub-signatures — candidates share any band bucket.
    * `planes = 0` (default) sizes the band width to the corpus so
    * bucket count grows with n instead of capping at 2^8. */
  def cosineNearDupes(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 0, bands: Int = 4): DataFrame = {
    val nPlanes = resolvePlanes(df, planes, bands)
    // precompute each vector's norm once (N evaluations) so the pair
    // stage runs a single dot product per candidate instead of three
    val withSig = df.select(col(idCol), col(vecCol),
      signSignature(col(vecCol), nPlanes).as("sig"),
      sqrt(GraftFunctions.arrayDot(col(vecCol), col(vecCol))).as("norm"))
    val cand = bandedCandidates(withSig, idCol, nPlanes / bands, bands)
    cand
      .join(withSig.select(col(idCol).as("id_a"), col(vecCol).as("va"),
        col("norm").as("norm_a")), "id_a")
      .join(withSig.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
        col("norm").as("norm_b")), "id_b")
      .withColumn("sim",
        GraftFunctions.arrayDot(col("va"), col("vb")) /
          (col("norm_a") * col("norm_b")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** Exact-arithmetic near-duplicate pairs (oracle-parity variant):
    * the quantized dot Σ round(aᵢ·1e7)·round(bᵢ·1e7) and squared norms
    * are exact 64-bit integers, and the similarity
    * dotq / (√n2aq · √n2bq) applies only correctly-rounded IEEE ops
    * (÷, ×, √) to those exact integers — so the doubles, and the
    * threshold comparison, are bit-identical in any engine. The 1e7
    * quantization scale cancels in the ratio. Same banded blocking as
    * [[cosineNearDupes]]. */
  def cosineNearDupesExact(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 0, bands: Int = 4): DataFrame = {
    val nPlanes = resolvePlanes(df, planes, bands)
    val withSig = df.select(col(idCol), col(vecCol),
      signSignature(col(vecCol), nPlanes).as("sig"),
      dotExact(col(vecCol), col(vecCol)).as("n2q"))
    val cand = bandedCandidates(withSig, idCol, nPlanes / bands, bands)
    cand
      .join(withSig.select(col(idCol).as("id_a"), col(vecCol).as("va"),
        col("n2q").as("n2_a")), "id_a")
      .join(withSig.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
        col("n2q").as("n2_b")), "id_b")
      .withColumn("sim",
        dotExact(col("va"), col("vb")).cast("double") /
          (sqrt(col("n2_a").cast("double")) * sqrt(col("n2_b").cast("double"))))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** Sign signature over `planes` deterministic hyperplanes: plane p's
    * component i = ((1103515245·(p·dim+i) + 12345) mod 2001) − 1000,
    * an LCG-style integer mix, applied to 1e-7-quantized components in
    * 64-bit integer arithmetic — engine-portable and
    * accumulation-order-independent.
    * Native kernel ([[graft.functions.expressions.SignSignature]]). */
  def signSignature(vec: Column, planes: Int): Column =
    GraftFunctions.signSignature(vec, planes)
}
